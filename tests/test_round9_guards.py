"""Round-9 scale hardening: the hot-bucket guard extended to the two
banded generators the round-8 rollout missed (hyperplane LSH pairs and
SemDeDup's within-cluster join), plus the guard-contract fixes — typo'd
modes rejected even with the ceiling disabled, str-only key columns,
caller-accurate remediation hints — the bloom_prune ambiguous-column
fix, the max_pairs threading through the biosample wrappers, and a
plan-level pin that the guard's count aggregate survives optimization.

Additive layer — the reference (d0choa/genetics_spark_coloc) has no
near-dup surface; these guard this repo's own 100 TB failure modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _embeddings(spark, n_dup: int, n_unique: int = 4, dim: int = 8):
    """n_dup identical all-ones vectors (one degenerate family) plus
    n_unique mutually-orthogonal one-hot vectors (pairwise cosine 0,
    cosine to the family 1/sqrt(dim) — far below any dedup threshold).
    """
    dup = spark.range(n_dup).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * dim).alias("embedding"),
    )
    uniq = spark.range(n_unique).select(
        (F.col("id") + n_dup).alias("vec_id"),
        F.array(
            *[
                F.when(F.col("id") % dim == j, F.lit(1.0)).otherwise(F.lit(0.0))
                for j in range(dim)
            ]
        ).alias("embedding"),
    )
    return dup.unionByName(uniq)


# ------------------------------------------------ hyperplane LSH bands
def test_hyperplane_banded_guard_raises_on_hot_bucket(spark):
    from genetics_spark_coloc_spark.operators.similarity import (
        lsh_cosine_candidates_banded,
    )

    corpus = _embeddings(spark, n_dup=30)
    guarded = lsh_cosine_candidates_banded(
        corpus, num_bands=2, planes_per_band=4, dim=8, hot_bucket_ceiling=10
    )
    with pytest.raises(Exception, match="lsh_cosine_candidates_banded hot-bucket"):
        guarded.count()


def test_hyperplane_banded_guard_cap_and_identity(spark):
    from genetics_spark_coloc_spark.operators.similarity import (
        lsh_cosine_candidates_banded,
    )

    corpus = _embeddings(spark, n_dup=30)
    # cap: the identical family's band buckets are excluded -> no
    # pairs within the family
    capped = lsh_cosine_candidates_banded(
        corpus,
        num_bands=2,
        planes_per_band=4,
        dim=8,
        hot_bucket_ceiling=10,
        on_hot_bucket="cap",
    )
    assert (
        capped.filter((F.col("leftId") < 30) & (F.col("rightId") < 30)).count() == 0
    )
    # raise mode under the ceiling is bit-identical to the unguarded plan
    ok = lsh_cosine_candidates_banded(
        corpus, num_bands=2, planes_per_band=4, dim=8, hot_bucket_ceiling=100
    )
    ref = lsh_cosine_candidates_banded(
        corpus, num_bands=2, planes_per_band=4, dim=8, hot_bucket_ceiling=None
    )
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, ref.collect()))
    assert ok.filter((F.col("leftId") < 30) & (F.col("rightId") < 30)).count() == (
        30 * 29 // 2
    )


# -------------------------------------------- SemDeDup cluster join
def test_semantic_dedup_guard_raises_on_degenerate_cluster(spark):
    from genetics_spark_coloc_spark.operators.similarity import semantic_dedup

    # identical k-means seeds -> identical centroids -> the tie-break
    # funnels EVERY vector into cluster 0: the degenerate-corpus case
    vectors = _embeddings(spark, n_dup=30)
    guarded = semantic_dedup(vectors, k=2, dim=8, hot_bucket_ceiling=10)
    with pytest.raises(Exception, match="semantic_dedup hot-bucket"):
        guarded.count()


def test_semantic_dedup_guard_cap_keeps_members_and_identity(spark):
    from genetics_spark_coloc_spark.operators.similarity import semantic_dedup

    vectors = _embeddings(spark, n_dup=30)
    # cap: the hot cluster is excluded from PAIRING only — every
    # vector still appears in the output, marked non-duplicate
    capped = semantic_dedup(
        vectors, k=2, dim=8, hot_bucket_ceiling=10, on_hot_bucket="cap"
    ).collect()
    assert len(capped) == 34
    assert all(not r.isDuplicate for r in capped)
    # under the ceiling: identical to the unguarded plan, duplicates found
    ok = semantic_dedup(vectors, k=2, dim=8, hot_bucket_ceiling=100)
    ref = semantic_dedup(vectors, k=2, dim=8, hot_bucket_ceiling=None)
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, ref.collect()))
    assert ok.filter(F.col("isDuplicate") & (F.col("vecId") < 30)).count() == 29


# ------------------------------------------------- guard contract fixes
def test_guard_rejects_bad_mode_even_when_ceiling_disabled(spark):
    """A typo'd on_hot_bucket must fail at plan time even with the
    guard disabled — not be silently accepted (ADVICE r8)."""
    from genetics_spark_coloc_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("some text here").alias("text")
    )
    with pytest.raises(ValueError, match="on_hot_bucket"):
        minhash_dedup_pairs(
            docs, "text", "doc_id", hot_bucket_ceiling=None, on_hot_bucket="warn"
        )


def test_guard_key_cols_must_be_strings(spark):
    from genetics_spark_coloc_spark.functions.guards import guard_hot_buckets

    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(TypeError, match="key_cols"):
        guard_hot_buckets(df, [F.col("k")], 10, "raise", "test")


def test_verbatim_abort_names_its_own_parameter(spark):
    """The remediation hint must name on_hot_gram (the parameter
    verbatim_match_spans actually has), not on_hot_bucket."""
    from genetics_spark_coloc_spark.operators.text import verbatim_match_spans

    docs = spark.range(30).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("the same boilerplate sentence repeated on every page").alias(
            "text"
        ),
    )
    spans = verbatim_match_spans(
        docs, "text", "doc_id", min_tokens=3, hot_gram_ceiling=5
    )
    with pytest.raises(Exception, match="on_hot_gram"):
        spans.count()


def test_guard_aggregate_survives_optimization(spark):
    """Plan-level pin (r8 What's-wrong #3): raise mode works only if
    Catalyst does NOT elide the per-bucket count aggregate feeding the
    assert_true filter. Pin its presence in the OPTIMIZED plan of a
    guarded generator so a future optimizer change that prunes the
    unreferenced count side fails CI loudly instead of silently
    disabling every guard."""
    from genetics_spark_coloc_spark.operators.dedup import minhash_dedup_pairs
    from genetics_spark_coloc_spark.plans.inspect import (
        optimized_plan,
        physical_plan,
    )

    docs = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text "), F.col("id").cast("string")).alias("text"),
    )
    guarded = minhash_dedup_pairs(docs, "text", "doc_id", hot_bucket_ceiling=10)
    opt = optimized_plan(guarded)
    # the count aggregate and the raise_error filter it feeds (Spark
    # rewrites assert_true -> if(...) raise_error in optimization)
    assert "_bucket_cnt" in opt
    assert "raise_error" in opt and "hot-bucket guard" in opt
    assert "_bucket_cnt" in physical_plan(guarded)


# --------------------------------------------------- bloom_prune alias
def test_bloom_prune_fact_with_pos_column(spark):
    """A fact table that itself has a `pos` column must not make the
    broadcast semi-join condition ambiguous (ADVICE r8)."""
    from genetics_spark_coloc_spark.operators.sketches import (
        bloom_build,
        bloom_prune,
    )

    dim = spark.range(10).select(F.col("id").alias("key"))
    bloom = bloom_build(dim, F.col("key"), m_bits=1 << 12, k=3)
    fact = spark.range(100).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("pos")
    )
    kept = bloom_prune(bloom, fact, F.col("key"), m_bits=1 << 12, k=3)
    ids = {r.key for r in kept.collect()}
    # no false negatives: every true dim key survives, and the fact's
    # own pos column is untouched
    assert set(range(10)) <= ids
    assert kept.columns == ["key", "pos"]


# ------------------------------------------- max_pairs threading
def test_ancestors_and_descendants_threads_max_pairs(spark):
    from genetics_spark_coloc_spark.operators.ontology import (
        ancestors_and_descendants,
    )

    # 40-node chain closes to 780 pairs
    edges = spark.range(39).select(
        F.col("id").cast("string").alias("subject"),
        (F.col("id") + 1).cast("string").alias("object"),
    )
    with pytest.raises(RuntimeError, match="max_pairs"):
        ancestors_and_descendants(edges, max_pairs=100).count()
    assert ancestors_and_descendants(edges, max_pairs=None).count() == 40


# ------------------------------------- streaming guard alignment
class TestStreamingHotBucketGuard:
    """The streaming near-dup path honors the same hot-bucket
    contract as the batch generators: a degenerate bucket FAILS the
    query loudly by default instead of silently freezing (r8
    What's-wrong #2)."""

    def _banded_source(self, spark, tmp_path, n_hot: int):
        rows = [(f"d{i}", 0, "hot_bucket") for i in range(n_hot)] + [
            (f"u{i}", 0, f"cold_{i}") for i in range(4)
        ]
        src = str(tmp_path / "banded")
        spark.createDataFrame(
            rows, "docId string, bandIdx int, bandHash string"
        ).coalesce(1).write.mode("overwrite").parquet(src)
        return (
            spark.readStream.schema("docId string, bandIdx int, bandHash string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    def test_raise_mode_fails_query_loudly(self, spark, tmp_path):
        from genetics_spark_coloc_spark.streaming.pipelines import (
            bucket_pair_stream,
        )

        stream = self._banded_source(spark, tmp_path, n_hot=20)
        out = bucket_pair_stream(stream, max_bucket_size=8)
        q = (
            out.writeStream.format("memory")
            .queryName("hot_guard_raise")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception, match="hot-bucket guard"):
            q.awaitTermination(120)
            if q.exception() is not None:
                raise q.exception()

    def test_cap_mode_freezes_bucket(self, spark, tmp_path):
        from genetics_spark_coloc_spark.streaming.pipelines import (
            bucket_pair_stream,
        )

        stream = self._banded_source(spark, tmp_path, n_hot=20)
        out = bucket_pair_stream(stream, max_bucket_size=8, on_hot_bucket="cap")
        q = (
            out.writeStream.format("memory")
            .queryName("hot_guard_cap")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None
        got = spark.sql("select * from hot_guard_cap").collect()
        # only the first 8 admitted docs pair: 8*7/2, cold buckets
        # hold one doc each and emit nothing
        assert len(got) == 8 * 7 // 2

    def test_bad_mode_rejected_at_plan_time(self, spark, tmp_path):
        from genetics_spark_coloc_spark.streaming.pipelines import (
            bucket_pair_stream,
        )

        stream = self._banded_source(spark, tmp_path, n_hot=2)
        with pytest.raises(ValueError, match="on_hot_bucket"):
            bucket_pair_stream(stream, on_hot_bucket="warn")


# --------------------------------- incremental (delta-vs-index) dedup
def test_incremental_lsh_guard_raises_and_identity(spark):
    """delta x index per bucket is |d|x|i| — the same quadratic class;
    both sides carry the guard independently."""
    from genetics_spark_coloc_spark.operators.dedup import (
        incremental_lsh_candidates,
    )

    boiler = "shared boilerplate prefix common to every page of this site"
    index = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
    )
    delta = spark.range(3).select(
        (F.col("id") + 1000).alias("doc_id"), F.lit(boiler).alias("text")
    )
    hot = incremental_lsh_candidates(delta, index, hot_bucket_ceiling=10)
    with pytest.raises(Exception, match="incremental_lsh_candidates"):
        hot.count()
    # under the ceiling: identical to unguarded — every delta doc
    # candidates against every index doc
    ok = incremental_lsh_candidates(delta, index, hot_bucket_ceiling=100)
    ref = incremental_lsh_candidates(delta, index, hot_bucket_ceiling=None)
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, ref.collect()))
    assert ok.count() == 3 * 30


# ------------------------------------------- bench regression tripwire
def test_bench_find_regressions():
    import bench

    prior = {"a": 1.0, "b": 2.0, "c": 0.2, "d": 4.0}
    current = {"a": 1.6, "b": 2.2, "c": 0.9, "d": 8.0, "new": 9.0}
    got = bench.find_regressions(prior, current)
    # a: 1.6x and >1s -> flagged; b: 1.1x -> no; c: 4.5x but sub-second
    # floor -> no; d: 2x -> flagged; new: no prior -> no
    assert set(got) == {"a", "d"}
    assert got["d"] == {
        "prior_sec": 4.0,
        "now_sec": 8.0,
        # r11: flags also carry the host-speed-adjusted latency
        # (identity here — no speed_ratio passed)
        "now_sec_speed_adjusted": 8.0,
    }
    # contention annotation: each flag carries the loadavg sampled at
    # its best repeat's start, so the artifact adjudicates itself
    annotated = bench.find_regressions(
        prior, current, loads={"a": 33.5, "b": 1.0}
    )
    assert annotated["a"]["load1_at_measure"] == 33.5
    assert "load1_at_measure" not in annotated["d"]  # no sample -> no claim


def test_bench_cpu_snapshot_and_busy_frac():
    """The per-pass contention evidence: snapshots carry loadavg and
    /proc/stat jiffies, and the busy fraction between two snapshots
    lands in [0, 1]; degenerate inputs return None, never raise."""
    import bench

    snap = bench._cpu_snapshot()
    assert len(snap["loadavg"]) == 3
    assert len(snap.get("proc_stat_cpu", [0] * 8)) == 8
    a = {"proc_stat_cpu": [100, 0, 50, 800, 50, 0, 0, 0]}
    b = {"proc_stat_cpu": [200, 0, 100, 1400, 100, 0, 0, 0]}
    frac = bench._busy_frac(a, b)
    assert frac is not None and 0.0 <= frac <= 1.0
    # deltas: user 100, system 50, idle 600, iowait 50 -> 150/800 busy
    assert abs(frac - (1 - 650 / 800)) < 1e-4
    assert bench._busy_frac({}, b) is None
    assert bench._busy_frac(a, a) is None  # zero elapsed jiffies


def test_bounded_single_partition_rank_raises_on_violation(spark):
    """VERDICT r10 #6: the declared-single-partition consumers
    (kmv_overlap_estimate's ≤2k pool rank, zipf_slope's top-200
    window) relied on a docstring contract; the rank column now
    carries a loud in-plan size guard. Planted violation: a
    partition over the bound raises the standard loud-guard error
    instead of silently serializing through one task; at or under
    the bound the rank values are unchanged."""
    from pyspark.sql import functions as F

    from genetics_spark_coloc_spark.functions.reshape import (
        bounded_single_partition_rank,
    )

    df = spark.range(10).select(F.col("id").alias("k"))
    over = df.withColumn(
        "r",
        bounded_single_partition_rank(
            F.col("k"), [F.col("k")], 5, "planted_violation_test"
        ),
    )
    with pytest.raises(Exception, match="documented bound 5"):
        over.collect()
    under = df.withColumn(
        "r",
        bounded_single_partition_rank(
            F.col("k"), [F.col("k")], 10, "at_bound_test"
        ),
    )
    rows = {r["k"]: r["r"] for r in under.collect()}
    assert rows == {i: i + 1 for i in range(10)}


def test_kmv_overlap_estimate_guard_trips_on_oversized_pool(spark):
    """The real call site: feeding kmv_overlap_estimate tables larger
    than k-sketches (violating its ≤2k pool contract) raises loudly."""
    from pyspark.sql import functions as F

    from genetics_spark_coloc_spark.operators.sketches import (
        kmv_overlap_estimate,
    )

    big = spark.range(5000).select(F.col("id").alias("hashValue"))
    with pytest.raises(Exception, match="kmv_overlap_estimate"):
        kmv_overlap_estimate(big, big, k=64).collect()
