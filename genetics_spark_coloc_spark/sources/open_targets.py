"""Open-Targets variant exports: VCF-shaped formatting and
loss-of-function curation ingestion.

Reference: datasource/open_targets/variants.py:67-136 (``as_vcf_df``)
and datasource/open_targets/lof_curation.py:17-98. The Ensembl-API
rsId backfill (variants.py:25-65) is a network call; here it is a
join against a caller-supplied rsId→variantId mapping table instead
(the distributed part — the join — is identical, the HTTP fetch is
out of scope for an analytics engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.variant_effect import (
    normalise_variant_effect,
)

LOF_DESCRIPTIONS = {
    "lof": "Assessed to cause LoF",
    "likely_lof": "Suspected to cause LoF",
    "uncertain": "Uncertain LoF assessment",
    "likely_not_lof": "Suspected not to cause LoF",
    "not_lof": "Assessed not to cause LoF",
}

LOF_DESCRIPTION_SUFFIX = " by OTAR2075 variant curation effort."


def map_rsids_to_variant_ids(
    variant_df: DataFrame, rsid_mapping: DataFrame
) -> DataFrame:
    """Backfill null variantIds from an rsId→variantId mapping table
    (reference variants.py:25-65 — there the mapping comes from the
    Ensembl HTTP API and the join is identical)."""
    mapping = rsid_mapping.select(
        "variantRsId", F.explode("mappedVariantIds").alias("mappedVariantId")
    )
    return (
        variant_df.join(F.broadcast(mapping), on="variantRsId", how="left")
        .withColumn(
            "variantId", F.coalesce(F.col("variantId"), F.col("mappedVariantId"))
        )
        .drop("mappedVariantId")
    )


def variants_to_vcf(variant_df: DataFrame) -> DataFrame:
    """Variant rows → VCF-shaped frame (reference variants.py:67-136):
    union the top-level variantId with any locus-array variantIds,
    split ``chrom_pos_ref_alt``, keep only ACGT alleles, distinct,
    sorted.

    Input needs ``variantId``; ``variantRsId`` and
    ``locus: array<struct<variantId,...>>`` are optional.
    """
    if "variantRsId" not in variant_df.columns:
        variant_df = variant_df.withColumn("variantRsId", F.lit(None).cast("string"))
    if "locus" in variant_df.columns:
        locus_ids = F.col("locus.variantId")
    else:
        locus_ids = F.lit(None).cast("array<string>")

    # null-safe union of scalar id + locus ids (reference
    # safe_array_union, spark_helpers)
    all_ids = F.array_distinct(
        F.concat(
            F.array(F.col("variantId")),
            F.coalesce(locus_ids, F.array().cast("array<string>")),
        )
    )
    parts = F.split(F.col("vid"), "_")
    return (
        variant_df.filter(F.col("variantId").isNotNull())
        .select(F.explode(all_ids).alias("vid"), "variantRsId")
        .select(
            F.coalesce(parts.getItem(0), F.lit(".")).alias("#CHROM"),
            F.get(parts, 1).cast("int").alias("POS"),
            F.coalesce(F.col("variantRsId"), F.lit(".")).alias("ID"),
            F.coalesce(F.get(parts, 2), F.lit(".")).alias("REF"),
            F.coalesce(F.get(parts, 3), F.lit(".")).alias("ALT"),
            F.lit(".").alias("QUAL"),
            F.lit(".").alias("FILTER"),
            F.lit(".").alias("INFO"),
        )
        .distinct()
        .filter(
            (F.col("#CHROM") != ".")
            & F.col("POS").isNotNull()
            & F.col("REF").rlike("^[GCTA.]*$")
            & F.col("ALT").rlike("^[GCTA.]*$")
        )
        .orderBy(F.col("#CHROM").asc(), F.col("POS").asc())
    )


def _lof_description(verdict: Column) -> Column:
    expr: Column | None = None
    for key, text in LOF_DESCRIPTIONS.items():
        expr = (
            F.when(verdict == key, F.lit(text))
            if expr is None
            else expr.when(verdict == key, F.lit(text))
        )
    assert expr is not None
    return F.concat(expr, F.lit(LOF_DESCRIPTION_SUFFIX))


def lof_curation_to_variant_index(lof_dataset: DataFrame) -> DataFrame:
    """OTAR2075 LoF curation → variant-index rows (reference
    lof_curation.py:60-98): GRCh38 chrom/pos + GRCh37 ref/alt compose
    the variantId; the verdict becomes a LossOfFunctionCuration
    variantEffect entry with a normalised score and a human
    description.

    Input columns: ``variantIdGrch37``, ``variantIdGrch38`` (both
    dash-separated chr-pos-ref-alt) and ``verdict``.
    """
    h37 = F.split(F.col("variantIdGrch37"), "-")
    h38 = F.split(F.col("variantIdGrch38"), "-")
    return (
        lof_dataset.select(
            F.concat_ws(
                "_", h38.getItem(0), h38.getItem(1), F.get(h37, 2), F.get(h37, 3)
            ).alias("variantId"),
            h38.getItem(0).alias("chromosome"),
            h38.getItem(1).cast("int").alias("position"),
            F.get(h37, 2).alias("referenceAllele"),
            F.get(h37, 3).alias("alternateAllele"),
            F.array(
                F.struct(
                    F.lit("LossOfFunctionCuration").alias("method"),
                    F.col("verdict").alias("assessment"),
                    F.lit(None).cast("double").alias("score"),
                    F.lit(None).cast("string").alias("targetId"),
                )
            ).alias("variantEffect"),
            _lof_description(F.col("verdict")).alias("variantDescription"),
        )
        .withColumn(
            "variantEffect", normalise_variant_effect(F.col("variantEffect"))
        )
    )


def foldx_to_amino_acid_variants(
    foldx_input: DataFrame, plddt_threshold: float = 0.7
) -> DataFrame:
    """FoldX ΔΔG predictions → amino-acid-variant rows (reference
    open_targets/foldex_integration.py:37-103): drop low-confidence
    residues (plddt ≤ threshold), anti-join proteins where one
    structural position maps to multiple sequence positions
    (ambiguous), collapse to one variantEffect array per
    (uniprotAccession, aminoAcidChange), normalise the free-energy
    scores.

    Input columns: protein_acc, position, wild_type, mutated_type,
    plddt, foldx_ddg.
    """
    ambiguous = (
        foldx_input.groupBy("protein_acc", "position", "wild_type")
        .agg(F.count_distinct("plddt").alias("n"))
        .filter(F.col("n") > 1)
        .select("protein_acc")
        .distinct()
    )
    return (
        foldx_input.filter(F.col("plddt") > plddt_threshold)
        .join(ambiguous, on="protein_acc", how="left_anti")
        .select(
            F.col("protein_acc").alias("uniprotAccession"),
            F.concat(
                F.col("wild_type"), F.col("position"), F.col("mutated_type")
            ).alias("aminoAcidChange"),
            F.struct(
                F.lit("FoldX").alias("method"),
                F.lit(None).cast("string").alias("assessment"),
                F.col("foldx_ddg").cast("double").alias("score"),
                F.lit(None).cast("string").alias("targetId"),
            ).alias("prediction"),
        )
        .groupBy("uniprotAccession", "aminoAcidChange")
        .agg(F.sort_array(F.collect_set("prediction")).alias("variantEffect"))
        .withColumn(
            "variantEffect", normalise_variant_effect(F.col("variantEffect"))
        )
    )
