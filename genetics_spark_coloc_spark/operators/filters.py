"""Row-level quality filters on summary statistics / loci.

Reference anchors: sanity filter (src/gentropy/dataset/
summary_statistics.py:143-172), genomic-region exclusion
(summary_statistics.py:117-141, common/genomic_region.py:6-103),
MHC flagging (dataset/study_locus.py:1098-1153).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GRCh38 MHC region (reference: common/genomic_region.py knowns)
MHC_CHROMOSOME = "6"
MHC_START = 25_726_063
MHC_END = 33_400_000


def sanity_filter(sumstats: DataFrame) -> DataFrame:
    """Drop malformed sumstat rows: null/NaN/0 beta, SE ≤ 0 (when
    present), p-value pair invalid or p ≥ 1
    (reference: summary_statistics.py:143-172)."""
    df = sumstats.dropna(subset=["beta", "pValueMantissa", "pValueExponent", "position"])
    conditions = [
        ~F.isnan(F.col("beta")),
        F.col("beta") != 0,
        F.col("pValueMantissa") > 0,
        # p < 1 on the decomposed pair
        (F.col("pValueExponent") < 0)
        | ((F.col("pValueExponent") == 0) & (F.col("pValueMantissa") < 1)),
    ]
    if "standardError" in df.columns:
        conditions.append(F.col("standardError").isNull() | (F.col("standardError") > 0))
    cond = conditions[0]
    for c in conditions[1:]:
        cond = cond & c
    return df.filter(cond)


def in_region(chromosome: Column, position: Column, region_chrom: str, start: int, end: int) -> Column:
    """Genomic-range predicate (reference: genomic_region.py:6-103)."""
    return (chromosome == region_chrom) & (position >= start) & (position <= end)


def exclude_region(
    df: DataFrame, region_chrom: str, start: int, end: int
) -> DataFrame:
    """Drop rows inside a genomic region."""
    return df.filter(
        ~in_region(F.col("chromosome"), F.col("position"), region_chrom, start, end)
    )


def flag_mhc(df: DataFrame, flag: str = "MHC region") -> DataFrame:
    """Append the MHC QC flag to loci inside the MHC region
    (reference: study_locus.py:1098-1153)."""
    inside = in_region(
        F.col("chromosome"), F.col("position"), MHC_CHROMOSOME, MHC_START, MHC_END
    )
    return df.withColumn(
        "qualityControls",
        F.when(
            inside,
            F.array_union(
                F.coalesce(F.col("qualityControls"), F.array().cast("array<string>")),
                F.array(F.lit(flag)),
            ),
        ).otherwise(F.col("qualityControls")),
    )
