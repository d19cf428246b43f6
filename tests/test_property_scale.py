"""Property-based tests: sessionize and asof_join against pure-Python
reference implementations over hypothesis-generated inputs."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.asof import asof_join
from genetics_spark_coloc_spark.operators.sessions import sessionize

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=100_000),  # ts seconds
    ),
    min_size=1,
    max_size=40,
)


def _py_sessionize(rows, gap):
    by_user = defaultdict(list)
    for u, t in rows:
        by_user[u].append(t)
    out = {}
    for u, ts in by_user.items():
        ts.sort()
        ordinal = 0
        prev = None
        counts = defaultdict(list)
        for t in ts:
            if prev is None or t - prev > gap:
                ordinal += 1
            counts[ordinal].append(t)
            prev = t
        for o, members in counts.items():
            out[(u, o)] = (len(members), float(max(members) - min(members)))
    return out


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_sessionize_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [(u, float(t), 1.0) for u, t in rows], "user_id int, tsec double, value double"
    ).select(
        "user_id", F.timestamp_seconds(F.col("tsec")).alias("ts"), "value"
    )
    got = {
        (r.userId, r.sessionOrdinal): (r.nEvents, r.durationS)
        for r in sessionize(df, gap_seconds=600).collect()
    }
    assert got == _py_sessionize(rows, 600)


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),  # left ts
    st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=15),  # right ts
)


def _py_asof(left_ts, right_rows):
    # right_rows: list of (ts, eid); pick max (ts, eid) with ts <= t
    out = {}
    for i, t in enumerate(left_ts):
        candidates = [(ts, eid) for ts, eid in right_rows if ts <= t]
        out[i] = max(candidates)[1] if candidates else None
    return out


@settings(max_examples=8, deadline=None)
@given(asof_strategy)
def test_asof_matches_reference(spark, data):
    left_ts, right_ts = data
    left = spark.createDataFrame(
        [("k", float(t), i) for i, t in enumerate(left_ts)], "k string, t double, idx int"
    )
    right_rows = [(float(t), i) for i, t in enumerate(right_ts)]
    expected = _py_asof([float(t) for t in left_ts], right_rows)
    if not right_rows:
        right = spark.createDataFrame([], "k string, t double, eid int")
    else:
        right = spark.createDataFrame(
            [("k", t, eid) for t, eid in right_rows], "k string, t double, eid int"
        )
    got = {
        r.idx: r.asof_eid
        for r in asof_join(
            left, right, on=["k"], ts_col="t", payload_cols=["eid"], tiebreak_col="eid"
        ).collect()
    }
    assert got == expected
