"""End-to-end pipeline test: two synthetic sumstats sources through
clump → finemap → overlaps → coloc."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.pipelines import clump_and_finemap, coloc_pipeline

SCHEMA = (
    "studyId: string, variantId: string, chromosome: string, position: int, "
    "beta: double, standardError: double, pValueMantissa: float, pValueExponent: int"
)


def _sumstats(study, chrom, center, n, strongest_offset, exp):
    """A cluster of n variants around `center`; the one at
    strongest_offset is most significant."""
    rows = []
    for i in range(n):
        pos = center + i * 1000
        is_strong = i == strongest_offset
        rows.append(
            (
                study,
                f"{chrom}_{pos}_A_C",
                chrom,
                pos,
                0.5 if is_strong else 0.05,
                0.05,
                1.0,
                exp if is_strong else -9,
            )
        )
    return rows


def test_clump_and_finemap(spark):
    df = spark.createDataFrame(
        _sumstats("GS1", "1", 1_000_000, 8, 3, -20)
        + _sumstats("GS1", "1", 5_000_000, 5, 0, -15),
        SCHEMA,
    )
    loci = clump_and_finemap(df, distance=100_000, gwas_significance=1e-8)
    rows = loci.collect()
    assert len(rows) == 2  # two independent loci
    for r in rows:
        tags = r["locus"]
        assert len(tags) >= 5
        total_pp = sum(t["posteriorProbability"] for t in tags)
        assert total_pp == pytest.approx(1.0, abs=1e-9)
        # the most significant variant (largest |beta|/se) dominates
        best = max(tags, key=lambda t: t["posteriorProbability"])
        assert best["posteriorProbability"] > 0.9
        assert any(t["is95CredibleSet"] for t in tags)


def test_coloc_pipeline_end_to_end(spark):
    # GWAS and QTL share the locus at 1 Mb on chr1 (same variant grid)
    gwas = spark.createDataFrame(
        _sumstats("GWAS1", "1", 1_000_000, 8, 3, -20), SCHEMA
    )
    qtl = spark.createDataFrame(
        _sumstats("QTL1", "1", 1_000_000, 8, 3, -12), SCHEMA
    )
    result = coloc_pipeline(gwas, qtl, distance=100_000)
    rows = result.collect()
    methods = {r["colocalisationMethod"] for r in rows}
    assert "eCAVIAR" in methods
    ecav = [r for r in rows if r["colocalisationMethod"] == "eCAVIAR"][0]
    # same causal variant on both sides -> high CLPP
    assert ecav["clpp"] > 0.8
    assert ecav["numberColocalisingVariants"] == 8
    coloc_rows = [r for r in rows if r["colocalisationMethod"] == "COLOC"]
    if coloc_rows:  # COLOC surviving its overlap-size filter
        assert coloc_rows[0]["h4"] > 0.5
