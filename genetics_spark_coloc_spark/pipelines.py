"""End-to-end composed pipelines — the engine's top-level API.

``coloc_pipeline`` is the reference's flagship flow (SURVEY §7.3):

    sumstats → significance filter → window clumping → collect locus
    statistics → ABF fine-mapping posteriors → credible-set flags →
    find_overlaps → eCAVIAR + COLOC → colocalisation table

Everything below is one lazy logical plan per output; Catalyst
plans the whole flow (pushdown through every stage, AQE at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators import coloc as coloc_ops
from genetics_spark_coloc_spark.operators import overlaps as overlap_ops
from genetics_spark_coloc_spark.operators.clumping import window_based_clumping
from genetics_spark_coloc_spark.operators.credible_sets import annotate_credible_sets
from genetics_spark_coloc_spark.operators.finemapping import finemap_abf
from genetics_spark_coloc_spark.operators.locus_statistics import annotate_locus_statistics


def clump_and_finemap(
    sumstats: DataFrame,
    distance: int = 500_000,
    gwas_significance: float = 1e-8,
    study_type: str = "gwas",
) -> DataFrame:
    """sumstats -> study_locus rows with fine-mapped ``locus`` arrays.

    Lead selection by greedy window clumping; per-locus tag collection
    via the binned range join; tag posteriors via Wakefield ABF;
    95/99% credible-set flags annotated.
    """
    leads = window_based_clumping(sumstats, distance, gwas_significance)
    loci = leads.select(
        F.md5(F.concat_ws("|", "studyId", "variantId")).alias("studyLocusId"),
        "studyId",
        "variantId",
        "chromosome",
        "position",
    )
    collected = annotate_locus_statistics(loci, sumstats, distance)
    # posterior per tag within each locus (needs standardError; fall
    # back to |beta|/|z|-free default when the source lacks SE)
    tags = collected.select(
        "studyLocusId", "studyId", "variantId", "chromosome", "position",
        F.explode_outer("locus").alias("tag"),
    )
    has_se = "standardError" in sumstats.columns
    se = F.coalesce(F.col("tag.standardError"), F.lit(0.1)) if has_se else F.lit(0.1)
    finemapped = finemap_abf(
        tags.select(
            "studyLocusId", "studyId", "variantId", "chromosome", "position",
            F.col("tag.variantId").alias("tagVariantId"),
            F.col("tag.pValueMantissa").alias("tagPValueMantissa"),
            F.col("tag.pValueExponent").alias("tagPValueExponent"),
            F.coalesce(F.col("tag.beta"), F.lit(0.0)).alias("beta"),
            se.alias("standardError"),
        ),
        locus_col="studyLocusId",
    )
    rebuilt = finemapped.groupBy(
        "studyLocusId", "studyId", "variantId", "chromosome", "position"
    ).agg(
        F.collect_list(
            F.struct(
                F.col("tagVariantId").alias("variantId"),
                F.col("posteriorProbability"),
                F.col("logABF").alias("logBF"),
                F.col("beta"),
                F.col("tagPValueMantissa").alias("pValueMantissa"),
                F.col("tagPValueExponent").alias("pValueExponent"),
            )
        ).alias("locus")
    )
    return annotate_credible_sets(
        rebuilt.withColumn("studyType", F.lit(study_type)).withColumn(
            "region",
            F.concat_ws(":", "chromosome", F.col("position").cast("string")),
        )
    )


def coloc_pipeline(
    gwas_sumstats: DataFrame,
    qtl_sumstats: DataFrame,
    distance: int = 500_000,
    gwas_significance: float = 1e-8,
    qtl_significance: float = 1e-5,
) -> DataFrame:
    """Full colocalisation: two sumstats sources in, one
    colocalisation table out (eCAVIAR + COLOC, unioned)."""
    gwas_loci = clump_and_finemap(gwas_sumstats, distance, gwas_significance, "gwas")
    qtl_loci = clump_and_finemap(qtl_sumstats, distance, qtl_significance, "eqtl")
    study_locus = gwas_loci.unionByName(qtl_loci)
    overlaps = overlap_ops.find_overlaps(study_locus)
    ecav = coloc_ops.ecaviar(overlaps)
    cl = coloc_ops.coloc(overlaps)
    # one stacked colocalisation table; method-specific metrics null
    # on the other method's rows (matches the reference's single
    # colocalisation schema with optional h0-h4/clpp)
    return ecav.unionByName(cl, allowMissingColumns=True)
