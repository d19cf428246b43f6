"""Tests for window-based clumping and locus-breaker clumping.

Cluster/prune expectations derive from the reference's documented
examples (window_based_clumping.py docstrings: _cluster_peaks and
_prune_peak) re-expressed on synthetic sumstats.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from genetics_spark_coloc_spark.operators.clumping import (
    cluster_peaks,
    locus_breaker,
    window_based_clumping,
)

SUMSTATS_SCHEMA = StructType(
    [
        StructField("studyId", StringType(), False),
        StructField("variantId", StringType(), False),
        StructField("chromosome", StringType(), False),
        StructField("position", IntegerType(), False),
        StructField("beta", DoubleType(), False),
        StructField("pValueMantissa", FloatType(), False),
        StructField("pValueExponent", IntegerType(), False),
    ]
)


def _ss(study, chrom, pos, mantissa, exponent):
    return (study, f"{chrom}_{pos}_A_C", chrom, pos, 0.1, float(mantissa), exponent)


def test_cluster_peaks_matches_reference_example(spark):
    # reference docstring example: window_based_clumping.py:44-95
    data = [
        ("s1", "chr1", 2), ("s1", "chr1", 4), ("s1", "chr1", 12),
        ("s1", "chr1", 31), ("s1", "chr1", 38), ("s1", "chr1", 42),
        ("s1", "chr2", 41), ("s1", "chr2", 44), ("s1", "chr2", 50),
        ("s2", "chr2", 55), ("s2", "chr2", 62), ("s2", "chr2", 70),
    ]
    df = spark.createDataFrame(data, ["studyId", "chromosome", "position"])
    got = {
        (r["studyId"], r["chromosome"], r["position"]): r["cluster_id"]
        for r in cluster_peaks(df, 10).collect()
    }
    assert got[("s1", "chr1", 2)] == "s1_chr1_2"
    assert got[("s1", "chr1", 12)] == "s1_chr1_2"
    assert got[("s1", "chr1", 31)] == "s1_chr1_31"
    assert got[("s1", "chr2", 41)] == "s1_chr2_41"
    assert got[("s2", "chr2", 55)] == "s2_chr2_55"


def test_window_clumping_greedy_prune(spark):
    # positions by significance rank: 3, 9, 8, 4, 6 with window 2
    # reference _prune_peak example -> leads at 3, 9, 6
    rows = [
        _ss("s1", "1", 3, 1.0, -10),  # most significant
        _ss("s1", "1", 9, 2.0, -10),
        _ss("s1", "1", 8, 3.0, -10),
        _ss("s1", "1", 4, 4.0, -10),
        _ss("s1", "1", 6, 5.0, -10),
    ]
    df = spark.createDataFrame(rows, SUMSTATS_SCHEMA)
    leads = sorted(
        r["position"] for r in window_based_clumping(df, distance=2, gwas_significance=1e-8).collect()
    )
    assert leads == [3, 6, 9]


def test_window_clumping_significance_filter(spark):
    rows = [
        _ss("s1", "1", 100, 5.0, -9),   # significant
        _ss("s1", "1", 200, 5.0, -6),   # not significant
        _ss("s1", "1", 2_000_000, 1.0, -12),  # significant, separate cluster
    ]
    df = spark.createDataFrame(rows, SUMSTATS_SCHEMA)
    leads = sorted(
        r["position"]
        for r in window_based_clumping(df, distance=500_000, gwas_significance=1e-8).collect()
    )
    assert leads == [100, 2_000_000]


def test_window_clumping_flags_instead_of_drop(spark):
    rows = [
        _ss("s1", "1", 100, 1.0, -10),
        _ss("s1", "1", 200, 5.0, -9),  # within window of 100 -> clumped
    ]
    df = spark.createDataFrame(rows, SUMSTATS_SCHEMA)
    out = window_based_clumping(df, distance=1000, drop_clumped=False).collect()
    flags = {r["position"]: r["qualityControls"] for r in out}
    assert flags[100] == []
    assert len(flags[200]) == 1


def test_locus_breaker_boundaries(spark):
    rows = [
        # locus 1: positions 1000..3000 (within 250k)
        _ss("s1", "1", 1000, 1.0, -9),
        _ss("s1", "1", 2000, 1.0, -12),   # top variant
        _ss("s1", "1", 3000, 1.0, -6),
        # gap > 250k -> locus 2, but only baseline significance (1e-6 > 1e-8 cut)
        _ss("s1", "1", 800_000, 1.0, -6),
    ]
    df = spark.createDataFrame(rows, SUMSTATS_SCHEMA)
    out = locus_breaker(
        df,
        baseline_pvalue_cutoff=1e-5,
        distance_cutoff=250_000,
        pvalue_cutoff=1e-8,
        flanking_distance=100_000,
    ).collect()
    assert len(out) == 1
    lead = out[0]
    assert lead["position"] == 2000
    assert lead["locusStart"] == 0  # 1000 - 100000 floored at 0
    assert lead["locusEnd"] == 103_000  # 3000 + 100000


def test_locus_breaker_flank_extends_end(spark):
    rows = [
        _ss("s1", "2", 500_000, 1.0, -12),
        _ss("s1", "2", 510_000, 1.0, -9),
    ]
    df = spark.createDataFrame(rows, SUMSTATS_SCHEMA)
    out = locus_breaker(df).collect()
    assert len(out) == 1
    assert out[0]["locusStart"] == 400_000
    assert out[0]["locusEnd"] == 610_000


def test_window_clumping_no_pandas_udf_in_plan(spark):
    """The greedy prune must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes in the physical plan."""
    rows = [_ss("s1", "1", 100, 1.0, -10)]
    df = spark.createDataFrame(rows, SUMSTATS_SCHEMA)
    plan = window_based_clumping(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
