"""Round-8 scale hardening: the shared hot-bucket guard applied to
every banded pair generator (functions/guards.py), plus the
transitive-closure output bound and the deterministic biosample merge
tie-break.

Additive layer — the reference (d0choa/genetics_spark_coloc) has no
near-dup or ontology-merge surface; these guard the 100 TB failure
modes of this repo's own generators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# the guard rides assert_true inside a job; depending on whether AQE
# materializes one stage or several, Spark surfaces it as a
# SparkRuntimeException or a wrapped STAGE_MATERIALIZATION error —
# both carry the guard message, so tests match on the message


def _hot_docs(spark, n_dup: int, n_unique: int = 4):
    """n_dup identical docs (one degenerate bucket family) plus a few
    distinct docs, for any text-pair generator."""
    dup = spark.range(n_dup).select(
        F.col("id").alias("doc_id"),
        F.lit("shared boilerplate prefix common to every page of this site").alias(
            "text"
        ),
    )
    uniq = spark.range(n_unique).select(
        (F.col("id") + n_dup).alias("doc_id"),
        F.concat(
            F.lit("entirely distinct payload "),
            F.md5(F.col("id").cast("string")),
            F.lit(" with nothing shared "),
            F.md5((F.col("id") + 1000).cast("string")),
        ).alias("text"),
    )
    return dup.unionByName(uniq)


# --------------------------------------------------------------- LSH bands
def test_lsh_pairs_guard_raises_on_hot_band(spark):
    from genetics_spark_coloc_spark.operators.dedup import minhash_dedup_pairs

    docs = _hot_docs(spark, n_dup=30)
    guarded = minhash_dedup_pairs(docs, "text", "doc_id", hot_bucket_ceiling=10)
    with pytest.raises(Exception, match="lsh_candidate_pairs hot-bucket"):
        guarded.count()


def test_lsh_pairs_guard_cap_and_identity(spark):
    from genetics_spark_coloc_spark.operators.dedup import minhash_dedup_pairs

    docs = _hot_docs(spark, n_dup=30)
    # cap: the 30-doc family's band buckets are excluded -> no pairs
    capped = minhash_dedup_pairs(
        docs, "text", "doc_id", hot_bucket_ceiling=10, on_hot_bucket="cap"
    )
    assert capped.count() == 0
    # raise mode under the ceiling is bit-identical to the unguarded plan
    guarded = minhash_dedup_pairs(docs, "text", "doc_id", hot_bucket_ceiling=100)
    unguarded = minhash_dedup_pairs(docs, "text", "doc_id", hot_bucket_ceiling=None)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )
    assert guarded.count() == 30 * 29 // 2


# ------------------------------------------------------------ SimHash blocks
def test_simhash_pairs_guard_raises_and_caps(spark):
    from genetics_spark_coloc_spark.operators.dedup import simhash_near_dup_pairs

    docs = _hot_docs(spark, n_dup=25)
    guarded = simhash_near_dup_pairs(docs, "text", "doc_id", hot_bucket_ceiling=10)
    with pytest.raises(Exception, match="simhash_near_dup_pairs hot-bucket"):
        guarded.count()
    # cap: the 25-doc identical family is excluded; only (possibly)
    # chance-near pairs among the filler docs may remain
    capped = simhash_near_dup_pairs(
        docs, "text", "doc_id", hot_bucket_ceiling=10, on_hot_bucket="cap"
    )
    assert (
        capped.filter((F.col("leftId") < 25) & (F.col("rightId") < 25)).count() == 0
    )
    # under the ceiling: identical to unguarded
    ok = simhash_near_dup_pairs(docs, "text", "doc_id", hot_bucket_ceiling=100)
    ref = simhash_near_dup_pairs(docs, "text", "doc_id", hot_bucket_ceiling=None)
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, ref.collect()))


# ------------------------------------------------------------- aHash bands
def test_ahash_pairs_guard_raises_and_caps(spark):
    from genetics_spark_coloc_spark.operators.multimodal import ahash_near_dup_pairs

    # 20 identical signatures = one hot (band, value) bucket per band
    sigs = spark.range(20).select(
        F.col("id").alias("mediaId"),
        F.lit(16).alias("nBits"),
        F.lit(0xABCD).cast("long").alias("sig"),
    )
    guarded = ahash_near_dup_pairs(sigs, n_bits=16, hot_bucket_ceiling=8)
    with pytest.raises(Exception, match="ahash_near_dup_pairs hot-bucket"):
        guarded.count()
    capped = ahash_near_dup_pairs(
        sigs, n_bits=16, hot_bucket_ceiling=8, on_hot_bucket="cap"
    )
    assert capped.count() == 0
    ok = ahash_near_dup_pairs(sigs, n_bits=16, hot_bucket_ceiling=100)
    assert ok.count() == 20 * 19 // 2


# --------------------------------------------------------- winnow postings
def test_winnow_pairs_guard_raises_and_caps(spark):
    from genetics_spark_coloc_spark.operators.text import winnow_candidate_pairs

    docs = _hot_docs(spark, n_dup=30)
    guarded = winnow_candidate_pairs(
        docs, "text", "doc_id", k=3, window=2, hot_bucket_ceiling=10
    )
    with pytest.raises(Exception, match="winnow_candidate_pairs hot-bucket"):
        guarded.count()
    # cap: the 30-doc family's postings are excluded; filler docs share
    # the scaffold words so they may still legitimately pair
    capped = winnow_candidate_pairs(
        docs, "text", "doc_id", k=3, window=2, hot_bucket_ceiling=10,
        on_hot_bucket="cap",
    )
    assert (
        capped.filter((F.col("leftId") < 30) & (F.col("rightId") < 30)).count() == 0
    )
    ok = winnow_candidate_pairs(
        docs, "text", "doc_id", k=3, window=2, hot_bucket_ceiling=100
    )
    ref = winnow_candidate_pairs(
        docs, "text", "doc_id", k=3, window=2, hot_bucket_ceiling=None
    )
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, ref.collect()))


def test_guard_rejects_bad_mode_at_plan_time(spark):
    from genetics_spark_coloc_spark.operators.dedup import minhash_dedup_pairs

    docs = _hot_docs(spark, n_dup=3)
    with pytest.raises(ValueError, match="on_hot_bucket"):
        minhash_dedup_pairs(docs, "text", "doc_id", on_hot_bucket="warn")


# ------------------------------------------------- transitive-closure bound
def test_transitive_closure_max_pairs_guard(spark):
    from genetics_spark_coloc_spark.operators.ontology import transitive_closure

    # a 40-node chain closes to 40*39/2 = 780 pairs
    edges = spark.range(39).select(
        F.col("id").cast("string").alias("subject"),
        (F.col("id") + 1).cast("string").alias("object"),
    )
    with pytest.raises(RuntimeError, match="max_pairs"):
        transitive_closure(edges, max_pairs=100)
    # generous bound: full closure intact
    assert transitive_closure(edges, max_pairs=10_000).count() == 40 * 39 // 2
    # disabled: same
    assert transitive_closure(edges, max_pairs=None).count() == 40 * 39 // 2


# ------------------------------------- deterministic biosample merge ties
def test_merge_biosample_indices_tie_break_deterministic(spark):
    """Duplicate biosampleId rows WITHIN one input (tied priority)
    must resolve to the same winner on any partitioning: the scalar
    ordering key is (_prio, value), not _prio alone."""
    from genetics_spark_coloc_spark.operators.ontology import (
        merge_biosample_indices,
    )

    rows = [("b1", "zeta", ["x"]), ("b1", "alpha", ["y"]), ("b1", "mid", ["z"])]
    schema = "biosampleId string, name string, tags array<string>"
    for n_parts in (1, 2, 3):
        df = spark.createDataFrame(rows, schema).repartition(n_parts)
        out = merge_biosample_indices([df]).collect()
        assert len(out) == 1
        # lowest (prio=0, value) -> 'alpha'; arrays union sorted
        assert out[0].name == "alpha"
        assert out[0].tags == ["x", "y", "z"]
    # across inputs, priority still dominates the value tie-break
    first = spark.createDataFrame([("b1", "zzz", ["a"])], schema)
    second = spark.createDataFrame([("b1", "aaa", ["b"])], schema)
    merged = merge_biosample_indices([first, second]).collect()[0]
    assert merged.name == "zzz"  # prio 0 wins despite larger value
