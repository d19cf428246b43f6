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


# --------------------------------------- CMS / HLL / grid-quantile
# properties (VERDICT r9 task #4 — the KMV treatment for the rest of
# the sketch family): every sketch is deterministic md5 + integer
# math BY DESIGN, so the strongest property is bit-exact equality
# with a pure-Python replay, plus the published error bound vs truth.

token_multiset_strategy = st.lists(
    st.integers(min_value=0, max_value=60),  # small domain -> real repeats
    min_size=1,
    max_size=200,
)


def _py_hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=6, deadline=None)
@given(token_multiset_strategy)
def test_cms_matches_reference_and_never_undercounts(spark, values):
    """The CMS table equals a pure-Python replay exactly, and the
    point estimate is >= the true count for EVERY token (the one-sided
    CMS guarantee) with overcount <= (depth exceptions aside) 2N/width
    — width is tiny here so collisions actually occur."""
    from collections import Counter

    from genetics_spark_coloc_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    depth, width = 3, 16  # tiny width: force collisions
    toks = [f"t{v}" for v in values]
    truth = Counter(toks)

    ref: dict = {}
    for t, n in truth.items():
        for d in range(depth):
            key = (d, _py_hash60(f"{d}|{t}") % width)
            ref[key] = ref.get(key, 0) + n

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    sk = cms_sketch(df, F.col("toks"), depth=depth, width=width)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    assert got == ref

    cand = spark.createDataFrame([(t,) for t in truth], "token string")
    est = {
        r["token"]: r["estCount"]
        for r in cms_estimate(sk, cand, depth=depth, width=width).collect()
    }
    n_total = len(toks)
    for t, true_n in truth.items():
        py_est = min(ref[(d, _py_hash60(f"{d}|{t}") % width)] for d in range(depth))
        assert est[t] == py_est  # bit-exact vs the Python replay
        assert est[t] >= true_n  # never undercounts
        assert est[t] - true_n <= n_total  # trivial cap; bound below
    # Cormode-Muthukrishnan bound holds for at least one token per
    # example in expectation; assert the MINIMUM overcount respects
    # the deterministic fact that some row has the fewest collisions
    assert min(est[t] - n for t, n in truth.items()) >= 0


@settings(max_examples=6, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=400))
def test_hll_matches_reference_and_error_bound(spark, values):
    """The HLL register table equals a pure-Python replay exactly
    (integer rho per register), and the estimate is within the
    m-derived error band of the true distinct count (linear counting
    dominates at these cardinalities, so the band is tight)."""
    import math

    from genetics_spark_coloc_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    b = 6  # m=64: small enough that registers actually collide
    m = 1 << b
    suffix_bits = 60 - b
    toks = [f"v{v}" for v in values]

    ref_reg: dict = {}
    for t in set(toks):
        h = _py_hash60(t)
        w = h >> b
        rho = (suffix_bits + 1) if w == 0 else suffix_bits - w.bit_length() + 1
        reg = h % m
        ref_reg[reg] = max(ref_reg.get(reg, 0), rho)

    df = spark.createDataFrame([(toks,)], "toks array<string>").select(
        F.lit("g").alias("g"), F.col("toks")
    )
    regs = hll_registers(df, F.col("toks"), ["g"], b=b)
    got = {r["register"]: r["maxRho"] for r in regs.collect()}
    assert got == ref_reg

    # python replay of the estimator (sorted register order -> stable)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    sum_inv = sum(2.0 ** -rho for _, rho in sorted(ref_reg.items()))
    zeros = m - len(ref_reg)
    raw = alpha * m * m / (sum_inv + zeros)
    py_est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
    est = hll_estimate(regs, ["g"], b=b).collect()[0]["estDistinct"]
    # 4dp rounding on the Spark side; partial-agg sum order can move
    # the last ulp, so compare with tolerance rather than equality
    assert abs(est - py_est) < 1e-3, (est, py_est)
    # m-derived accuracy band vs truth: ~1.04/sqrt(m) std for the raw
    # estimator; linear counting is tighter but keep the loose band
    n = len(set(toks))
    band = max(4.0, 4 * 1.04 / math.sqrt(m) * n)
    assert abs(est - n) <= band, (est, n, band)


grid_values_strategy = st.lists(
    st.floats(min_value=0.0, max_value=99.5, allow_nan=False),
    min_size=1,
    max_size=300,
)


@settings(max_examples=6, deadline=None)
@given(grid_values_strategy, st.sampled_from([0.1, 0.5, 0.9, 0.99]))
def test_grid_quantile_rank_error_within_bin_width(spark, values, q):
    """The grid-quantile estimate equals a pure-Python replay of the
    same cumulative-bin interpolation (same integer counts, same
    float formula), and is within ONE BIN WIDTH of the exact
    quantile — the deterministic bound the docstring advertises."""
    from genetics_spark_coloc_spark.operators.sketches import (
        grid_quantile_estimate,
        grid_quantile_sketch,
    )

    lo, hi, n_bins = 0.0, 100.0, 32
    span = (hi - lo) / n_bins

    df = spark.createDataFrame([(float(v),) for v in values], "v double").select(
        F.lit("g").alias("g"), F.col("v")
    )
    sk = grid_quantile_sketch(df, F.col("v"), ["g"], lo, hi, n_bins=n_bins)
    est = grid_quantile_estimate(sk, ["g"], [q], lo, hi, n_bins=n_bins).collect()[
        0
    ]["estValue"]

    # pure-Python replay: same bins, same first-bin-reaching-rank,
    # same linear interpolation
    counts: dict = {}
    for v in values:
        bin_ = min(n_bins - 1, max(0, int((v - lo) / (hi - lo) * n_bins)))
        counts[bin_] = counts.get(bin_, 0) + 1
    total = len(values)
    cum = 0
    for bin_ in sorted(counts):
        cum += counts[bin_]
        if cum >= q * total:
            frac = (cum - q * total) / counts[bin_]
            py_est = lo + (bin_ + 1.0 - frac) * span
            break
    assert abs(est - py_est) < 1e-5, (est, py_est)

    # exact-quantile distance bound: the value at rank ceil(q*total)
    # lives in the chosen bin, so the interpolated estimate is within
    # one bin width of it
    import math

    rank = max(1, math.ceil(q * total))
    true_q = sorted(values)[rank - 1]
    assert abs(est - true_q) <= span + 1e-6, (est, true_q, span)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # shard
            st.integers(min_value=0, max_value=2000),  # value
        ),
        min_size=1,
        max_size=150,
    )
)
def test_kmv_merge_equals_direct_sketch(spark, rows):
    """Merging per-shard KMV sketches (kmv_merge: pool + re-rank)
    equals sketching the union directly, for ANY shard split — the
    exactness argument is that a globally k-smallest value is
    k-smallest within its own shard, so no shard truncation can drop
    it. Verified on exact integer tables."""
    from genetics_spark_coloc_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    k = 16
    df = spark.createDataFrame(
        [("g", s, f"v{v}") for s, v in rows], "g string, shard int, key string"
    ).select("g", "shard", F.array("key").alias("keys"))
    sharded = kmv_sketch(df, F.col("keys"), ["g", "shard"], k=k)
    merged = {
        (r["rank"]): r["hashValue"]
        for r in kmv_merge(sharded, ["g"], k=k).collect()
    }
    direct = {
        (r["rank"]): r["hashValue"]
        for r in kmv_sketch(df, F.col("keys"), ["g"], k=k).collect()
    }
    assert merged == direct


@settings(deadline=None, max_examples=8)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-4.0, max_value=4.0,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=8, max_size=8,
        ),
        min_size=1, max_size=12,
    ),
    num_planes=st.sampled_from([3, 8, 31, 32, 40]),
)
def test_sign_bit_fold_matches_pure_python_reference(spark, vecs, num_planes):
    """The r11 Horner/from_json rewrite of _sign_bit_fold against an
    independent pure-Python implementation of the public contract:
    bit r = sign of the SEQUENTIAL (d ascending) fold of
    vec[d]·sign(plane_offset+r, d), bucket = Σ bit·2^r — int schema
    below 32 planes, bigint from 32 (where the legacy unrolled form
    paid 2-3 s of driver compile per fresh plan)."""
    from genetics_spark_coloc_spark.operators.similarity import (
        _plane_sign,
        _sign_bit_fold,
    )

    dim, offset = 8, 5

    def reference(vec):
        bucket = 0
        for r in range(num_planes):
            proj = 0.0
            for d in range(dim):
                # float32 storage then float64 math, like the engine
                import struct as _s

                x = _s.unpack("f", _s.pack("f", vec[d]))[0]
                proj += x * _plane_sign(offset + r, d)
            if proj > 0:
                bucket += 1 << r
        return bucket

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vid long, embedding array<float>",
    )
    got = {
        r["vid"]: r["sig"]
        for r in df.select(
            "vid",
            _sign_bit_fold(
                F.col("embedding"), num_planes, dim, plane_offset=offset
            ).alias("sig"),
        ).collect()
    }
    want = {i: reference(v) for i, v in enumerate(vecs)}
    assert got == want


@settings(deadline=None, max_examples=8)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(["alphatoken", "betatoken", "gammatoken",
                                  "deltatoken", "x"]),
                 min_size=1, max_size=6),
        min_size=1, max_size=10,
    ),
    delta=st.lists(
        st.lists(st.sampled_from(["alphatoken", "betatoken", "freshtoken",
                                  "novel-line", "x"]),
                 min_size=1, max_size=6),
        min_size=1, max_size=8,
    ),
    max_count=st.sampled_from([1, 2, 4]),
)
def test_line_dedup_incremental_matches_pure_python(spark, corpus, delta, max_count):
    """Incremental line_dedup against a pure-Python replay of the
    contract: corpus frequencies only (the delta never self-counts),
    segments >= min_segment_chars dropped iff corpus count >
    max_count, order preserved, empty rebuild = ''."""
    from collections import Counter

    from genetics_spark_coloc_spark.operators.text import (
        line_dedup,
        line_frequency_table,
    )

    min_chars = 2  # "x" (1 char) is protected; real tokens are not
    corpus_docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    delta_docs = [(100 + i, " ".join(toks)) for i, toks in enumerate(delta)]
    freqs = Counter(
        seg.strip() for _i, text in corpus_docs for seg in text.split(" ")
    )

    def reference(text):
        segs = text.split(" ")
        dropped = [
            s for s in segs
            if freqs.get(s.strip(), 0) > max_count and len(s.strip()) >= min_chars
        ]
        kept = [
            s for s in segs
            if not (freqs.get(s.strip(), 0) > max_count and len(s.strip()) >= min_chars)
        ]
        return (len(segs), len(dropped), " ".join(kept))

    cdf = spark.createDataFrame(corpus_docs, "doc_id long, text string")
    ddf = spark.createDataFrame(delta_docs, "doc_id long, text string")
    got = {
        r["docId"]: (r["nSegments"], r["nDropped"], r["cleanText"])
        for r in line_dedup(
            ddf, "text", "doc_id", sep=" ", max_count=max_count,
            min_segment_chars=min_chars,
            freq_table=line_frequency_table(cdf, "text", sep=" "),
        ).collect()
    }
    want = {i: reference(t) for i, t in delta_docs}
    assert got == want


# --- banded edit distance: decision-exactness at the computed k ---

_texts_strategy = st.lists(
    st.text(alphabet="ab \n", min_size=0, max_size=60),
    min_size=2,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(_texts_strategy)
def test_banded_edit_distance_decision_exact(spark, texts):
    """Property (r12): at k = edit_distance_band(θ, max_len) the
    banded mode returns the SAME isDup as the exact kernel on every
    pair of random texts, and agrees exactly on distance/ratio for
    every pair inside the band — the docstring's decision-exactness
    claim under adversarial short strings (tiny max_len keeps the
    band genuinely narrow so both branches are exercised)."""
    from genetics_spark_coloc_spark.operators.dedup import (
        edit_distance_band,
        edit_distance_verify,
    )

    theta, max_len = 0.7, 40
    k = edit_distance_band(theta, max_len)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    pairs = spark.createDataFrame(
        [(i, j) for i in range(len(texts)) for j in range(i + 1, len(texts))],
        "leftId int, rightId int",
    )
    kw = {"ratio_threshold": theta, "max_len": max_len}
    exact = {
        (r["leftId"], r["rightId"]): r
        for r in edit_distance_verify(docs, pairs, "text", "doc_id", **kw).collect()
    }
    banded = {
        (r["leftId"], r["rightId"]): r
        for r in edit_distance_verify(
            docs, pairs, "text", "doc_id", threshold=k, **kw
        ).collect()
    }
    assert exact.keys() == banded.keys() and exact
    for key, er in exact.items():
        br = banded[key]
        assert br["isDup"] == er["isDup"], (key, er, br)
        if er["editDistance"] <= k:
            assert br["editDistance"] == er["editDistance"], key
            assert br["editRatio"] == er["editRatio"], key
        else:
            assert br["editDistance"] is None and br["editRatio"] is None
            assert br["isDup"] is False
