"""Tests for LD annotation, LD clumping, PICS, locus statistics, filters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.filters import exclude_region, sanity_filter
from genetics_spark_coloc_spark.operators.ld import (
    LD_CLUMPED_FLAG,
    UNRESOLVED_LD_FLAG,
    ld_annotate,
    ld_clump,
)
from genetics_spark_coloc_spark.operators.locus_statistics import annotate_locus_statistics
from genetics_spark_coloc_spark.operators.pics import pics_finemap

ASSOC_SCHEMA = (
    "studyLocusId: string, studyId: string, variantId: string, chromosome: string, "
    "position: int, qualityControls: array<string>"
)
STUDIES_SCHEMA = (
    "studyId: string, ldPopulationStructure: array<struct<ldPopulation: string, "
    "relativeSampleSize: double>>"
)
LD_INDEX_SCHEMA = (
    "variantId: string, chromosome: string, ldSet: array<struct<tagVariantId: string, "
    "rValues: array<struct<population: string, r: double>>>>"
)


def _assoc(slid, study, variant, chrom="1", pos=100):
    return {
        "studyLocusId": slid,
        "studyId": study,
        "variantId": variant,
        "chromosome": chrom,
        "position": pos,
        "qualityControls": [],
    }


def test_ld_annotate_major_population_and_threshold(spark):
    assoc = spark.createDataFrame([_assoc("L1", "S1", "v1")], ASSOC_SCHEMA)
    studies = spark.createDataFrame(
        [
            {
                "studyId": "S1",
                "ldPopulationStructure": [
                    {"ldPopulation": "afr", "relativeSampleSize": 0.3},
                    {"ldPopulation": "nfe", "relativeSampleSize": 0.7},
                ],
            }
        ],
        STUDIES_SCHEMA,
    )
    ld_index = spark.createDataFrame(
        [
            {
                "variantId": "v1",
                "chromosome": "1",
                "ldSet": [
                    {
                        "tagVariantId": "v2",
                        "rValues": [
                            {"population": "nfe", "r": 0.9},
                            {"population": "afr", "r": 0.2},
                        ],
                    },
                    {
                        "tagVariantId": "v3",
                        "rValues": [{"population": "nfe", "r": 0.5}],  # r2=0.25 < 0.5
                    },
                    {
                        "tagVariantId": "v1",
                        "rValues": [{"population": "nfe", "r": 0.95}],
                    },
                ],
            }
        ],
        LD_INDEX_SCHEMA,
    )
    out = ld_annotate(assoc, studies, ld_index).collect()[0]
    tags = {t["tagVariantId"]: t["r2Overall"] for t in out["ldSet"]}
    # major population is nfe (0.7): v2 r2 = 0.81, v3 filtered (0.25), lead forced to 1.0
    assert tags["v2"] == pytest.approx(0.81)
    assert "v3" not in tags
    assert tags["v1"] == 1.0
    assert out["qualityControls"] == []


def test_ld_annotate_unresolved_rescue(spark):
    assoc = spark.createDataFrame([_assoc("L1", "S1", "vX")], ASSOC_SCHEMA)
    studies = spark.createDataFrame(
        [
            {
                "studyId": "S1",
                "ldPopulationStructure": [
                    {"ldPopulation": "nfe", "relativeSampleSize": 1.0}
                ],
            }
        ],
        STUDIES_SCHEMA,
    )
    ld_index = spark.createDataFrame([], LD_INDEX_SCHEMA)
    out = ld_annotate(assoc, studies, ld_index).collect()[0]
    assert UNRESOLVED_LD_FLAG in out["qualityControls"]
    assert [t["tagVariantId"] for t in out["ldSet"]] == ["vX"]
    assert out["ldSet"][0]["r2Overall"] == 1.0


def test_ld_annotate_tie_prefers_nfe(spark):
    assoc = spark.createDataFrame([_assoc("L1", "S1", "v1")], ASSOC_SCHEMA)
    studies = spark.createDataFrame(
        [
            {
                "studyId": "S1",
                "ldPopulationStructure": [
                    {"ldPopulation": "afr", "relativeSampleSize": 0.5},
                    {"ldPopulation": "nfe", "relativeSampleSize": 0.5},
                ],
            }
        ],
        STUDIES_SCHEMA,
    )
    ld_index = spark.createDataFrame(
        [
            {
                "variantId": "v1",
                "chromosome": "1",
                "ldSet": [
                    {
                        "tagVariantId": "v2",
                        "rValues": [
                            {"population": "afr", "r": 1.0},
                            {"population": "nfe", "r": 0.8},
                        ],
                    }
                ],
            }
        ],
        LD_INDEX_SCHEMA,
    )
    out = ld_annotate(assoc, studies, ld_index).collect()[0]
    # tie at 0.5/0.5 -> nfe wins -> r2 = 0.64
    assert out["ldSet"][0]["r2Overall"] == pytest.approx(0.64)


LEAD_SCHEMA = (
    "studyId: string, chromosome: string, variantId: string, pValueMantissa: float, "
    "pValueExponent: int, qualityControls: array<string>, "
    "ldSet: array<struct<tagVariantId: string, r2Overall: double>>"
)


def test_ld_clump_links_to_more_significant(spark):
    rows = [
        {  # most significant lead
            "studyId": "S1", "chromosome": "1", "variantId": "lead1",
            "pValueMantissa": 1.0, "pValueExponent": -12, "qualityControls": [],
            "ldSet": [{"tagVariantId": "shared", "r2Overall": 0.9}],
        },
        {  # shares 'shared' tag via its own ldSet containing lead1
            "studyId": "S1", "chromosome": "1", "variantId": "lead2",
            "pValueMantissa": 1.0, "pValueExponent": -8, "qualityControls": [],
            "ldSet": [{"tagVariantId": "lead1", "r2Overall": 0.8}],
        },
        {  # independent
            "studyId": "S1", "chromosome": "1", "variantId": "lead3",
            "pValueMantissa": 1.0, "pValueExponent": -9, "qualityControls": [],
            "ldSet": [{"tagVariantId": "elsewhere", "r2Overall": 0.7}],
        },
    ]
    df = spark.createDataFrame(rows, LEAD_SCHEMA)
    out = {r["variantId"]: r["qualityControls"] for r in ld_clump(df).collect()}
    assert out["lead1"] == []
    assert LD_CLUMPED_FLAG in out["lead2"]
    assert out["lead3"] == []


def test_pics_finemap_golden(spark):
    # reference doctest (pics.py:131-137): ld_set [(var1, 0.8), (var2, 1.0)],
    # lead neglog_p = 10 -> posteriors [0.0712, 0.9288], SE [0.0742, 0.9977]
    df = spark.createDataFrame(
        [
            {
                "studyLocusId": "L1",
                "variantId": "var2",
                "pValueMantissa": 1.0,
                "pValueExponent": -10,
                "beta": 0.5,
                "ldSet": [
                    {"tagVariantId": "var1", "r2Overall": 0.8},
                    {"tagVariantId": "var2", "r2Overall": 1.0},
                ],
            }
        ],
        "studyLocusId: string, variantId: string, pValueMantissa: float, "
        "pValueExponent: int, beta: double, "
        "ldSet: array<struct<tagVariantId: string, r2Overall: double>>",
    )
    locus = pics_finemap(df).collect()[0]["locus"]
    by_id = {t["variantId"]: t for t in locus}
    assert by_id["var1"]["posteriorProbability"] == pytest.approx(0.07116959886882368, rel=1e-5)
    assert by_id["var2"]["posteriorProbability"] == pytest.approx(0.9288304011311763, rel=1e-5)
    assert by_id["var1"]["standardError"] == pytest.approx(0.07420896512708416, rel=1e-6)
    assert by_id["var2"]["standardError"] == pytest.approx(0.9977000638225533, rel=1e-6)
    # lead variant carries its own single-point stats; tags have nulls
    assert by_id["var2"]["beta"] == 0.5
    assert by_id["var1"]["beta"] is None


def test_pics_drops_low_r2(spark):
    df = spark.createDataFrame(
        [
            {
                "studyLocusId": "L1",
                "variantId": "v",
                "pValueMantissa": 1.0,
                "pValueExponent": -10,
                "beta": 0.5,
                "ldSet": [
                    {"tagVariantId": "low", "r2Overall": 0.3},
                    {"tagVariantId": "v", "r2Overall": 1.0},
                ],
            }
        ],
        "studyLocusId: string, variantId: string, pValueMantissa: float, "
        "pValueExponent: int, beta: double, "
        "ldSet: array<struct<tagVariantId: string, r2Overall: double>>",
    )
    locus = pics_finemap(df).collect()[0]["locus"]
    assert [t["variantId"] for t in locus] == ["v"]
    assert locus[0]["posteriorProbability"] == pytest.approx(1.0)


SUMSTATS_SCHEMA = (
    "studyId: string, variantId: string, chromosome: string, position: int, "
    "beta: double, pValueMantissa: float, pValueExponent: int"
)


def test_annotate_locus_statistics_binned_range_join(spark):
    loci = spark.createDataFrame(
        [("L1", "S1", "1", 10_000)],
        "studyLocusId: string, studyId: string, chromosome: string, position: int",
    )
    ss = spark.createDataFrame(
        [
            ("S1", "in1", "1", 9_500, 0.1, 1.0, -9),
            ("S1", "in2", "1", 10_900, 0.1, 1.0, -9),
            ("S1", "out_dist", "1", 11_100, 0.1, 1.0, -9),
            ("S1", "out_chrom", "2", 10_000, 0.1, 1.0, -9),
            ("S2", "out_study", "1", 10_000, 0.1, 1.0, -9),
        ],
        SUMSTATS_SCHEMA,
    )
    out = annotate_locus_statistics(loci, ss, distance=1000).collect()[0]
    assert sorted(t["variantId"] for t in out["locus"]) == ["in1", "in2"]


def test_sanity_filter(spark):
    rows = [
        ("S1", "ok", "1", 1, 0.5, 5.0, -8),
        ("S1", "zero_beta", "1", 2, 0.0, 5.0, -8),
        ("S1", "p_ge_1", "1", 3, 0.5, 1.0, 0),
        ("S1", "nan_beta", "1", 4, float("nan"), 5.0, -8),
    ]
    df = spark.createDataFrame(rows, SUMSTATS_SCHEMA)
    kept = [r["variantId"] for r in sanity_filter(df).collect()]
    assert kept == ["ok"]


def test_exclude_region(spark):
    df = spark.createDataFrame(
        [("S1", "a", "6", 26_000_000, 0.1, 1.0, -9), ("S1", "b", "6", 40_000_000, 0.1, 1.0, -9)],
        SUMSTATS_SCHEMA,
    )
    kept = [r["variantId"] for r in exclude_region(df, "6", 25_726_063, 33_400_000).collect()]
    assert kept == ["b"]
