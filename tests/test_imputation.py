"""Tests for z-score imputation and LD-outlier detection."""

from __future__ import annotations

import math

import pytest

from genetics_spark_coloc_spark.operators.imputation import flag_ld_outliers, impute_zscores


def test_impute_zscores_weighted_combination(spark):
    observed = spark.createDataFrame(
        [("S1", "a", "1", 2.0), ("S1", "b", "1", 4.0)],
        "studyId: string, variantId: string, chromosome: string, z: double",
    )
    pairwise = spark.createDataFrame(
        [("t", "a", "1", 0.8), ("t", "b", "1", 0.6),
         ("lonely", "a", "1", 0.9)],  # only one neighbour -> filtered
        "variantIdI: string, variantIdJ: string, chromosome: string, r: double",
    )
    rows = impute_zscores(observed, pairwise, min_neighbours=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["variantId"] == "t"
    expected = (0.8 * 2.0 + 0.6 * 4.0) / math.sqrt(0.8**2 + 0.6**2)
    assert r["zImputed"] == pytest.approx(expected)
    assert r["nNeighbours"] == 2


def test_impute_skips_observed_targets(spark):
    observed = spark.createDataFrame(
        [("S1", "a", "1", 2.0), ("S1", "t", "1", 1.0)],
        "studyId: string, variantId: string, chromosome: string, z: double",
    )
    pairwise = spark.createDataFrame(
        [("t", "a", "1", 0.8)],
        "variantIdI: string, variantIdJ: string, chromosome: string, r: double",
    )
    assert impute_zscores(observed, pairwise, min_neighbours=1).count() == 0


def test_flag_ld_outliers(spark):
    tags = spark.createDataFrame(
        [
            ("L1", "consistent", 4.0, 5.0, 0.8),   # z ≈ r*zLead -> T = 0
            ("L1", "outlier", -4.0, 5.0, 0.8),     # T = 64/0.36 >> 10
        ],
        "studyLocusId: string, tagVariantId: string, z: double, zLead: double, r: double",
    )
    rows = {r["tagVariantId"]: r for r in flag_ld_outliers(tags).collect()}
    assert not rows["consistent"]["isLdOutlier"]
    assert rows["consistent"]["ldConsistencyT"] == pytest.approx(0.0)
    assert rows["outlier"]["isLdOutlier"]
    assert rows["outlier"]["ldConsistencyP"] < 1e-6
