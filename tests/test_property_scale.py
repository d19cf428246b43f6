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


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-3.0, max_value=3.0, allow_nan=False),
            st.floats(min_value=0.05, max_value=2.0, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_susie_reduced_kernel_matches_closed_form(stats):
    """The reduced study-locus SuSiE kernel (the susie_credible_sets
    oracle configuration) equals its closed form on arbitrary
    (beta, se) loci — not just the testdata shapes."""
    import numpy as np
    import pandas as pd

    from genetics_spark_coloc_spark.operators.finemapping import (
        susie_study_locus_reduced_kernel,
    )

    pdf = pd.DataFrame(
        {
            "studyLocusId": "P1",
            "variantId": [f"v{i:03d}" for i in range(len(stats))],
            "beta": [b for b, _ in stats],
            "standardError": [s for _, s in stats],
        }
    )
    row = susie_study_locus_reduced_kernel(pdf).iloc[0]
    n, ssq = 100_000.0, 0.2
    omega = n + 1.0 / ssq
    z = np.array([b / s for b, s in stats])
    lbf = n * z * z / (2.0 * omega) - 0.5 * np.log(omega * ssq)
    mx = lbf.max()
    pip = np.exp(lbf - mx) / np.exp(lbf - mx).sum()
    cs_lbf = mx - np.log(len(z)) + np.log(np.exp(lbf - mx).sum())
    order = np.lexsort(
        (pdf["variantId"].to_numpy(),
         -(np.floor(np.abs(pip) * 1e6 + 0.5) / 1e6 * np.sign(pip)))
    )
    cum = np.cumsum(pip[order])
    k = int(np.argmax(cum >= 0.99))
    if cum[-1] < 0.99:
        k = len(cum) - 1
    members = order[: k + 1]
    assert abs(row["credibleSetLog10BF"] - cs_lbf / np.log(10)) < 1e-9
    assert len(row["locus"]) == len(members)
    assert row["leadVariantId"] == pdf["variantId"].to_numpy()[members[0]]
    assert abs(row["purityMeanR2"] - 1.0 / len(members)) < 1e-12


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-3.0, max_value=3.0, allow_nan=False),
            st.floats(min_value=0.1, max_value=1.0, allow_nan=False),
        ),
        min_size=1,
        max_size=3,
    )
)
def test_carma_identity_powerset_matches_closed_form(stats):
    """carma_ld_kernel on identity LD with p<=3 variants (the
    finemap_carma_ld oracle configuration) equals the explicit
    powerset enumeration for arbitrary (beta, se)."""
    from itertools import combinations
    from math import lgamma

    import numpy as np
    import pandas as pd

    from genetics_spark_coloc_spark.operators.finemapping import carma_ld_kernel

    p = len(stats)
    pdf = pd.DataFrame(
        {
            "studyLocusId": "C1",
            "variantId": [f"v{i}" for i in range(p)],
            "beta": [b for b, _ in stats],
            "standardError": [s for _, s in stats],
        }
    )
    res = carma_ld_kernel(pdf)
    tau = 0.04
    z = np.array([b / s for b, s in stats])
    A = 0.5 * np.log(tau) - 0.5 * np.log(1 + tau) + z * z / (2.0 * (1.0 + tau))
    subsets = [()]
    for k in range(1, min(3, p) + 1):
        subsets += list(combinations(range(p), k))
    scores = {
        s: sum(A[list(s)]) + lgamma(p - len(s) + 1) - lgamma(p + 1)
        for s in subsets
    }
    mxs = max(scores.values())
    w = {s: np.exp(v - mxs) for s, v in scores.items()}
    tot = sum(w.values())
    pips = np.array([sum(w[s] for s in subsets if j in s) / tot for j in range(p)])
    got = res.sort_values("variantId")["posteriorProbability"].to_numpy()
    assert np.allclose(got, pips, rtol=1e-9, atol=1e-12)


def test_auc_rank_window_at_quantization_bound(spark):
    """``evaluate_binary_predictions`` at the documented bound: 1M
    DISTINCT raw float scores spanning [0, 1]. The single-partition
    rank window runs over the per-quantized-score aggregate, so its
    input stays <= 1e6 + 1 rows regardless of row count, and the
    Mann-Whitney AUC with average tied ranks must match an exact
    numpy computation of the same statistic on the same quantized
    scores (what sklearn.roc_auc_score computes, which is not in
    this environment) to 1e-9."""
    import numpy as np
    import pandas as pd

    from genetics_spark_coloc_spark.operators.l2g_trainer import (
        evaluate_binary_predictions,
    )

    n = 1_000_000
    rng = np.random.default_rng(7)
    score = rng.random(n)  # ~all distinct raw float64
    label = (rng.random(n) < np.clip(score * 0.8 + 0.1, 0, 1)).astype(np.int64)
    pdf = pd.DataFrame({"score": score, "label": label})
    sdf = spark.createDataFrame(pdf).repartition(16)

    # the bound property: after 1e-6 quantization the rank window's
    # input cardinality is capped by bucket count, not row count
    from pyspark.sql import functions as F

    n_buckets = sdf.select(
        F.countDistinct(F.round("score", 6)).alias("b")
    ).collect()[0]["b"]
    assert n_buckets <= 1_000_001

    row = evaluate_binary_predictions(sdf).collect()[0]

    # exact reference AUC on the same quantized scores (half-away
    # quantization mirrors Spark's HALF_UP on non-negative doubles;
    # seeded uniforms sit ~1e-10 per row from any 6dp midpoint)
    q = np.floor(score * 1e6 + 0.5) / 1e6
    order = np.argsort(q, kind="stable")
    qs, ls = q[order], label[order]
    ranks = np.empty(n, dtype=np.float64)
    i = 0
    while i < n:
        j = i
        while j < n and qs[j] == qs[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    p_cnt = int(ls.sum())
    n_cnt = n - p_cnt
    auc = (ranks[ls == 1].sum() - p_cnt * (p_cnt + 1) / 2.0) / (p_cnt * n_cnt)
    assert abs(row["areaUnderROC"] - auc) < 1e-9


def test_duplicate_spans_equal_bruteforce_on_random_corpora(spark):
    """Property: duplicate_spans == brute force on random small-vocab
    corpora. Brute force: token position p of doc d is duplicated iff
    SOME k-window covering p occurs >= 2 times corpus-wide; spans are
    the maximal runs of duplicated positions. Random corpora from a
    4-word vocabulary maximize collisions, self-repeats, and abutting
    windows."""
    import random

    from genetics_spark_coloc_spark.operators.text import duplicate_spans

    k = 3
    for seed in range(6):
        rng = random.Random(seed)
        vocab = ["aa", "bb", "cc", "dd"]
        docs = {
            i: [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
            for i in range(8)
        }
        from collections import Counter

        wins = Counter()
        for toks in docs.values():
            for j in range(len(toks) - k + 1):
                wins[tuple(toks[j : j + k])] += 1
        want = set()
        for i, toks in docs.items():
            dup_pos = set()
            for j in range(len(toks) - k + 1):
                if wins[tuple(toks[j : j + k])] >= 2:
                    dup_pos.update(range(j, j + k))
            # maximal runs of duplicated positions
            run = []
            for p in sorted(dup_pos):
                if run and p == run[-1] + 1:
                    run.append(p)
                else:
                    if run:
                        want.add((i, run[0], run[-1] + 1, len(run)))
                    run = [p]
            if run:
                want.add((i, run[0], run[-1] + 1, len(run)))
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs.items()],
            "doc_id long, text string",
        )
        got = {
            (r["docId"], r["spanStart"], r["spanEnd"], r["spanTokens"])
            for r in duplicate_spans(df, min_tokens=k).collect()
        }
        assert got == want, (seed, got ^ want)


# ------------------------------------------------- KMV sketch properties
kmv_sets_strategy = st.tuples(
    st.sets(st.integers(min_value=0, max_value=5000), min_size=1, max_size=120),
    st.sets(st.integers(min_value=0, max_value=5000), min_size=1, max_size=120),
)


def _py_kmv(values, k):
    """Pure-Python reference: k smallest 60-bit md5 hashes."""
    import hashlib

    hs = sorted(
        int(hashlib.md5(f"v{v}".encode()).hexdigest()[:15], 16) for v in values
    )
    return hs[:k]


@settings(max_examples=6, deadline=None)
@given(kmv_sets_strategy)
def test_kmv_sketch_and_overlap_match_reference(spark, sets):
    """The sketch equals the Python reference exactly for ANY input
    set, and the overlap estimator's pooled-K intersection count
    matches a pure-Python replay of the Beyer et al. estimator."""
    from genetics_spark_coloc_spark.operators.sketches import (
        kmv_overlap_estimate,
        kmv_sketch,
    )

    a_vals, b_vals = sets
    k = 32

    def spark_sketch(vals):
        df = spark.createDataFrame(
            [(f"v{v}",) for v in sorted(vals)], "key string"
        ).select(F.lit("g").alias("g"), F.array("key").alias("keys"))
        return kmv_sketch(df, F.col("keys"), ["g"], k=k)

    ska, skb = spark_sketch(a_vals), spark_sketch(b_vals)
    assert [r.hashValue for r in ska.orderBy("rank").collect()] == _py_kmv(
        a_vals, k
    )
    # reference overlap: pool the two reference sketches, keep the
    # K smallest, count members present in both sketches
    ra, rb = set(_py_kmv(a_vals, k)), set(_py_kmv(b_vals, k))
    pool = sorted(ra | rb)[:k]
    n_pool = len(pool)
    n_both = sum(1 for h in pool if h in ra and h in rb)
    got = kmv_overlap_estimate(ska, skb, k=k).collect()[0]
    assert got.nPool == n_pool
    assert got.estJaccard == round(n_both / n_pool, 6)
    if n_pool < k:
        # exact branch: the pool IS the union
        assert got.estUnion == float(len(a_vals | b_vals))
