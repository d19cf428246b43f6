"""StudyLocus maintenance operators: large-locus splitting, purity
metrics, id assignment, long-variant-id hashing.

Reference anchors: process_locus_breaker_output
(method/locus_breaker_clumping.py:121-170), purity from ldSet
(credible-set quality metrics in study_locus schema), deterministic
study-locus ids (dataset/study_locus.py:609-632), md5-hashing of
over-long variant ids (dataset/variant_index.py:73, config.py:468).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.core.dataset import generate_identifier


def assign_study_locus_id(uniqueness_cols: list[str] | None = None) -> Column:
    """Deterministic md5 id over the uniqueness-defining columns
    (reference: study_locus.py:609-632)."""
    return generate_identifier(uniqueness_cols or ["studyId", "variantId"]).alias(
        "studyLocusId"
    )


def hash_long_variant_ids(variant_id: Column, threshold: int = 300) -> Column:
    """Replace variant ids longer than ``threshold`` chars (huge
    indel alleles) with ``chrom_pos_md5hash``
    (reference: variant_index.py:73, config.py:468)."""
    parts = F.split(variant_id, "_")
    hashed = F.concat_ws(
        "_", parts[0], parts[1], F.concat(F.lit("h"), F.md5(variant_id))
    )
    return F.when(F.length(variant_id) > threshold, hashed).otherwise(variant_id)


def annotate_purity(study_locus: DataFrame, locus_col: str = "locus") -> DataFrame:
    """purityMeanR2 / purityMinR2 from the locus tags' r2Overall —
    the credible-set LD-purity metrics of the study_locus schema."""
    # sort before folding: summation order is then deterministic, so
    # the mean is bit-reproducible across engines and partitionings
    r2s = F.sort_array(
        F.filter(
            F.coalesce(F.col(f"{locus_col}.r2Overall"), F.array()),
            lambda x: x.isNotNull(),
        )
    )
    n = F.size(r2s)
    mean_r2 = F.when(
        n > 0,
        F.aggregate(r2s, F.lit(0.0), lambda acc, x: acc + x) / n.cast("double"),
    )
    min_r2 = F.when(n > 0, F.array_min(r2s))
    return study_locus.withColumn("purityMeanR2", mean_r2).withColumn(
        "purityMinR2", min_r2
    )


def process_locus_breaker_output(
    lbc: DataFrame,
    wbc: DataFrame,
    large_loci_size: int = 1_500_000,
) -> DataFrame:
    """Split over-wide locus-breaker loci using window-based clumping
    leads (reference: locus_breaker_clumping.py:121-170).

    Small loci pass through; for large loci, window-clumped leads
    falling inside [locusStart, locusEnd] replace them, each with a
    ±large_loci_size/2 window. The membership test is a left-semi
    range join, binned on position so it stays a hash join.
    """
    width = F.col("locusEnd") - F.col("locusStart")
    small = lbc.filter(width <= large_loci_size)
    large = lbc.filter(width > large_loci_size)

    large_keyed = large.select(
        F.col("studyId").alias("ll_studyId"),
        F.col("chromosome").alias("ll_chromosome"),
        "locusStart",
        "locusEnd",
    ).withColumn(
        "ll_bin",
        F.explode(
            F.sequence(
                F.floor(F.col("locusStart") / large_loci_size).cast("int"),
                F.floor(F.col("locusEnd") / large_loci_size).cast("int"),
            )
        ),
    )
    wbc_binned = wbc.withColumn(
        "bin", F.floor(F.col("position") / large_loci_size).cast("int")
    )
    inside = wbc_binned.join(
        F.broadcast(large_keyed),
        on=[
            F.col("studyId") == F.col("ll_studyId"),
            F.col("chromosome") == F.col("ll_chromosome"),
            F.col("bin") == F.col("ll_bin"),
            F.col("position").between(F.col("locusStart"), F.col("locusEnd")),
        ],
        how="leftsemi",
    ).drop("bin")
    rebuilt = inside.withColumn(
        "locusStart", (F.col("position") - large_loci_size // 2).cast("int")
    ).withColumn("locusEnd", (F.col("position") + large_loci_size // 2).cast("int"))
    return rebuilt.unionByName(small, allowMissingColumns=True)


def flag_explained_by_finemapping(
    leads: DataFrame,
    regions: DataFrame,
    bin_size: int = 100_000,
) -> DataFrame:
    """QC flag: lead falls inside an already-fine-mapped region
    (reference qc_explained_by_SuSiE, dataset/study_locus.py:1218-1245
    — there an interval join of exploded tags vs SuSiE regions).

    ``leads`` needs (studyId, chromosome, position); ``regions`` needs
    (studyId, chromosome, regionStart, regionEnd). The interval join
    is binned on position so Catalyst plans a hash join on
    (studyId, chromosome, bin) with the between() as a cheap residual
    — never a broadcast-nested-loop over raw inequality predicates.
    Regions spanning multiple bins are exploded (≤ span/bin_size + 1
    rows each), which is the 100 TB-safe trade: small dimension-side
    duplication for an equi-key shuffle.
    """
    region_binned = regions.select(
        F.col("studyId").alias("r_studyId"),
        F.col("chromosome").alias("r_chromosome"),
        "regionStart",
        "regionEnd",
    ).withColumn(
        "r_bin",
        F.explode(
            F.sequence(
                F.floor(F.col("regionStart") / bin_size).cast("int"),
                F.floor(F.col("regionEnd") / bin_size).cast("int"),
            )
        ),
    )
    lead_binned = leads.withColumn(
        "__bin", F.floor(F.col("position") / bin_size).cast("int")
    )
    explained = (
        lead_binned.join(
            F.broadcast(region_binned),
            on=[
                F.col("studyId") == F.col("r_studyId"),
                F.col("chromosome") == F.col("r_chromosome"),
                F.col("__bin") == F.col("r_bin"),
                F.col("position").between(F.col("regionStart"), F.col("regionEnd")),
            ],
            how="leftsemi",
        )
        .select("studyId", "chromosome", "position")
        .distinct()
        .withColumn("isExplainedByFinemapping", F.lit(True))
    )
    return (
        lead_binned.drop("__bin")
        .join(
            explained,
            on=["studyId", "chromosome", "position"],
            how="left",
        )
        .withColumn(
            "isExplainedByFinemapping",
            F.coalesce(F.col("isExplainedByFinemapping"), F.lit(False)),
        )
    )
