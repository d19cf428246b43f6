"""Tests for study-locus maintenance ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.study_locus_ops import (
    annotate_purity,
    assign_study_locus_id,
    hash_long_variant_ids,
    process_locus_breaker_output,
)


def test_assign_study_locus_id_deterministic(spark):
    df = spark.createDataFrame(
        [("S1", "v1"), ("S1", "v1"), ("S1", "v2")], ["studyId", "variantId"]
    )
    ids = [r["studyLocusId"] for r in df.select(assign_study_locus_id()).collect()]
    assert ids[0] == ids[1] != ids[2]
    assert len(ids[0]) == 32  # md5 hex


def test_hash_long_variant_ids(spark):
    short = "1_100_A_G"
    long = "2_200_" + "A" * 400 + "_G"
    df = spark.createDataFrame([(short,), (long,)], ["variantId"])
    out = [r["v"] for r in df.select(hash_long_variant_ids(F.col("variantId")).alias("v")).collect()]
    assert out[0] == short
    assert out[1].startswith("2_200_h") and len(out[1]) < 50


def test_annotate_purity(spark):
    df = spark.createDataFrame(
        [
            ("L1", [{"variantId": "a", "r2Overall": 0.8}, {"variantId": "b", "r2Overall": 0.6}]),
            ("L2", []),
        ],
        "studyLocusId: string, locus: array<struct<variantId: string, r2Overall: double>>",
    )
    rows = {r["studyLocusId"]: r for r in annotate_purity(df).collect()}
    assert rows["L1"]["purityMeanR2"] == pytest.approx(0.7)
    assert rows["L1"]["purityMinR2"] == pytest.approx(0.6)
    assert rows["L2"]["purityMeanR2"] is None


def test_process_locus_breaker_output(spark):
    lbc = spark.createDataFrame(
        [
            ("S1", "1", 500_000, "1_500000_A_C", 400_000, 600_000),   # small, kept
            ("S1", "1", 5_000_000, "1_5000000_A_C", 4_000_000, 7_000_000),  # large, split
        ],
        "studyId: string, chromosome: string, position: int, variantId: string, "
        "locusStart: int, locusEnd: int",
    )
    wbc = spark.createDataFrame(
        [
            ("S1", "1", 4_500_000, "1_4500000_A_C"),  # inside large locus
            ("S1", "1", 6_500_000, "1_6500000_A_C"),  # inside large locus
            ("S1", "1", 9_000_000, "1_9000000_A_C"),  # outside
        ],
        "studyId: string, chromosome: string, position: int, variantId: string",
    )
    out = process_locus_breaker_output(lbc, wbc, large_loci_size=1_500_000).collect()
    by_variant = {r["variantId"]: r for r in out}
    assert set(by_variant) == {"1_500000_A_C", "1_4500000_A_C", "1_6500000_A_C"}
    split = by_variant["1_4500000_A_C"]
    assert split["locusStart"] == 4_500_000 - 750_000
    assert split["locusEnd"] == 4_500_000 + 750_000
    assert by_variant["1_500000_A_C"]["locusStart"] == 400_000  # untouched
