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
    from genetics_spark_coloc_spark.operators.imputation import raiss_model

    expected = raiss_model(
        np.array([2.0, -1.0]),
        np.array([[1.0, 0.3], [0.3, 1.0]]),
        np.array([[0.8, 0.2]]),
        lamb=lam,
    )
    assert row.variantId == "t1"
    assert abs(row.zImputed - float(expected["mu"][0])) < 1e-9
    assert abs(row.imputationInfo - float(expected["imputation_r2"][0])) < 1e-9
    assert row.nObserved == 2


def test_raiss_exact_single_neighbour_identity(spark):
    """One observed neighbour, λ=0 (published model semantics):
    mu_raw = r·z, var = 1 − r², var bounded in [0,1], R2 = 1 − var,
    mu = mu_raw/√R2 = r·z/|r| = sign(r)·z; imputation_r2 = r²."""
    from pyspark.sql import Row

    from genetics_spark_coloc_spark.operators.imputation import raiss_impute_grouped

    observed = spark.createDataFrame([Row(studyLocusId="L", variantId="o", z=3.0)])
    ld = spark.createDataFrame(
        [Row(studyLocusId="L", variantIdI="t", variantIdJ="o", r=0.5)]
    )
    row = raiss_impute_grouped(observed, ld, ridge_lambda=0.0).collect()[0]
    # mu = (0.5·3.0)/sqrt(1 − 0.75) = 1.5/0.5 = 3.0
    assert abs(row.zImputed - 3.0) < 1e-9
    assert abs(row.imputationInfo - 0.25) < 1e-9


def test_raiss_model_golden():
    """Published-model golden values on the reference fixture
    (reference tests/gentropy/method/test_sumstat_imputation.py):
    imputing variant 5 of the 21-variant locus."""
    import os

    import numpy as np
    import pandas as pd
    import pytest as _pytest

    d = "/root/reference/tests/gentropy/data_samples"
    if not os.path.isdir(d):
        _pytest.skip("reference golden fixtures not mounted")
    from genetics_spark_coloc_spark.operators.imputation import raiss_model

    ld = np.array(pd.read_csv(f"{d}/01_test_ld.csv", header=None))
    z = np.array(pd.read_csv(f"{d}/01_test_z.csv").iloc[:, 1])
    known = [i for i in range(21) if i != 5]
    out = raiss_model(
        z[known], ld[np.ix_(known, known)], ld[np.ix_([5], known)],
        lamb=0.01, rtol=0.01,
    )
    assert np.round(out["imputation_r2"][0], 4) == 0.9304
    assert np.round(out["mu"][0], 4) == 9.7215
