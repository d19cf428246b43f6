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


def test_raiss_exact_matches_numpy(spark):
    """Exact RAISS on a 2-observed / 1-target locus, checked against
    the closed-form numpy computation."""
    import numpy as np
    from pyspark.sql import Row

    from genetics_spark_coloc_spark.operators.imputation import raiss_impute_grouped

    observed = spark.createDataFrame(
        [
            Row(studyLocusId="L1", variantId="o1", z=2.0),
            Row(studyLocusId="L1", variantId="o2", z=-1.0),
        ]
    )
    ld = spark.createDataFrame(
        [
            Row(studyLocusId="L1", variantIdI="o1", variantIdJ="o2", r=0.3),
            Row(studyLocusId="L1", variantIdI="t1", variantIdJ="o1", r=0.8),
            Row(studyLocusId="L1", variantIdI="t1", variantIdJ="o2", r=0.2),
        ]
    )
    lam = 0.1
    out = raiss_impute_grouped(observed, ld, ridge_lambda=lam).collect()
    assert len(out) == 1
    row = out[0]
    sigma_oo = np.array([[1.0, 0.3], [0.3, 1.0]]) + lam * np.eye(2)
    sigma_uo = np.array([[0.8, 0.2]])
    z_o = np.array([2.0, -1.0])
    expected_z = float(sigma_uo @ np.linalg.solve(sigma_oo, z_o))
    expected_info = float(sigma_uo @ np.linalg.inv(sigma_oo) @ sigma_uo.T)
    assert row.variantId == "t1"
    assert abs(row.zImputed - expected_z) < 1e-9
    assert abs(row.imputationInfo - expected_info) < 1e-9
    assert row.nObserved == 2


def test_raiss_exact_single_neighbour_identity(spark):
    """With one observed neighbour, λ=0: ẑ = r·z and info = r²."""
    from pyspark.sql import Row

    from genetics_spark_coloc_spark.operators.imputation import raiss_impute_grouped

    observed = spark.createDataFrame([Row(studyLocusId="L", variantId="o", z=3.0)])
    ld = spark.createDataFrame(
        [Row(studyLocusId="L", variantIdI="t", variantIdJ="o", r=0.5)]
    )
    row = raiss_impute_grouped(observed, ld, ridge_lambda=0.0).collect()[0]
    assert abs(row.zImputed - 1.5) < 1e-12
    assert abs(row.imputationInfo - 0.25) < 1e-12
