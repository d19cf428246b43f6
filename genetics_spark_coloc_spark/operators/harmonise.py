"""Summary-statistics allele harmonisation.

Reference parity: ``common/harmonise.py:10-170`` — rename chromosome
23→X, filter low-INFO and low-MAF rows, type variants
(palindromic snp_c / other snp_n / indel), join a variant-annotation
table prepared in BOTH allele orientations (``direction`` ∈
{direct, flip}), negate beta and reflect the effect-allele frequency
on flips, and drop palindromic flips (strand-ambiguous).

Spark-first shape: the orientation join is a plain equi join on
(chromosome, summaryStatsId) — the both-orientations annotation table
is the trick that keeps it hash-shaped (the reference builds it in
``per_chromosome.py``; here ``annotation_both_orientations`` derives
it from a canonical variant table). At 100 TB both sides partition by
chromosome, so the join co-locates and prunes per chromosome.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PALINDROMIC = [("A", "T"), ("T", "A"), ("G", "C"), ("C", "G")]


def variant_type(a0, a1):
    """snp_c (complementary/palindromic) | snp_n | indel
    (reference: harmonise.py:92-116)."""
    is_snp = (F.length(a0) == 1) & (F.length(a1) == 1)
    is_pal = F.lit(False)
    for x, y in PALINDROMIC:
        is_pal = is_pal | ((a0 == x) & (a1 == y))
    return F.when(is_snp, F.when(is_pal, "snp_c").otherwise("snp_n")).otherwise(
        "indel"
    )


def annotation_both_orientations(canonical: DataFrame) -> DataFrame:
    """Expand a canonical variant table (chromosome, position, refAllele,
    altAllele, variantId) into both allele orientations with a
    ``direction`` marker, so harmonisation is one equi join."""
    direct = canonical.select(
        F.col("chromosome").alias("vaChromosome"),
        F.concat_ws(
            "_", "chromosome", "position", "refAllele", "altAllele"
        ).alias("summaryStatsId"),
        "variantId",
        F.lit("direct").alias("direction"),
    )
    flipped = canonical.select(
        F.col("chromosome").alias("vaChromosome"),
        F.concat_ws(
            "_", "chromosome", "position", "altAllele", "refAllele"
        ).alias("summaryStatsId"),
        "variantId",
        F.lit("flip").alias("direction"),
    )
    return direct.unionByName(flipped)


def harmonise_sumstats(
    raw: DataFrame,
    annotation: DataFrame,
    min_info: float | None = 0.8,
    min_maf: float | None = 0.0001,
) -> DataFrame:
    """Harmonise raw sumstats rows against a both-orientations
    annotation table (reference: harmonise.py:10-170).

    ``raw`` needs (studyId, chromosome, position, allele0, allele1,
    beta) and optionally (info, a1freq). Returns rows joined to their
    canonical variantId with beta/EAF flipped when the orientation is
    reversed; palindromic flips are dropped.
    """
    df = raw.withColumn(
        "chromosome",
        F.when(F.col("chromosome") == "23", "X").otherwise(F.col("chromosome")),
    )
    if min_info is not None and "info" in df.columns:
        df = df.filter(F.col("info") >= min_info)
    if min_maf is not None and "a1freq" in df.columns:
        maf = F.when(F.col("a1freq") < 0.5, F.col("a1freq")).otherwise(
            1 - F.col("a1freq")
        )
        df = df.filter(maf >= min_maf)
    df = df.withColumn(
        "variantType", variant_type(F.col("allele0"), F.col("allele1"))
    ).withColumn(
        "summaryStatsId",
        F.concat_ws("_", "chromosome", "position", "allele0", "allele1"),
    )
    joined = df.join(
        annotation,
        on=[
            df["chromosome"] == annotation["vaChromosome"],
            df["summaryStatsId"] == annotation["summaryStatsId"],
        ],
        how="inner",
    ).drop("vaChromosome", "summaryStatsId")
    flipped = F.col("direction") == "flip"
    out = joined.withColumn(
        "beta",
        F.when(flipped, -F.col("beta").cast("double")).otherwise(
            F.col("beta").cast("double")
        ),
    )
    if "a1freq" in raw.columns:
        out = out.withColumn(
            "effectAlleleFrequencyFromSource",
            F.when(flipped, 1 - F.col("a1freq").cast("double")).otherwise(
                F.col("a1freq").cast("double")
            ),
        )
    # strand-ambiguous palindromic SNPs cannot be safely flipped
    return out.filter(~((F.col("variantType") == "snp_c") & flipped))
