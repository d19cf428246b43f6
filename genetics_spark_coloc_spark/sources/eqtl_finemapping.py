"""eQTL-Catalogue SuSiE fine-mapping ingestion → StudyLocus rows.

Reference: datasource/eqtl_catalogue/finemapping.py:28-262. Two raw
frames — per-variant credible-set statistics and per-variant log
Bayes factors (wide ``lbf_variable1..10``) — join with the dataset
metadata, the per-credible-set LBF is selected by index, and leads/
loci are derived per (dataset, trait, region, credibleSetIndex).

Differences from the reference spelled deliberately:
- the 10-way ``when`` chain for logBF is ``element_at`` over an array
  (same semantics; see also finngen_finemapping);
- lead selection breaks PIP ties on variantId (the reference's
  ``row_number`` over only desc(PIP) is nondeterministic);
- the locus is collected with ``collect_list`` in a groupBy rather
  than a window + filter-isLead — one aggregation instead of a window
  pass over every tag row, same result, smaller shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.arrays import logsumexp
from genetics_spark_coloc_spark.operators.study_locus_ops import (
    assign_study_locus_id,
)
from genetics_spark_coloc_spark.sources.finngen_finemapping import _pick_by_index
from genetics_spark_coloc_spark.sources.study_indexes import (
    identify_qtl_study_type,
)

LOG10E = 0.43429448190325176


def clean_strings_from_symbols(source: Column) -> Column:
    """Lower-case and collapse URL-unsafe characters to underscores
    (reference spark_helpers.py:891-914)."""
    return F.regexp_replace(F.lower(source), r"[^a-z0-9-_]+", "_")


def extract_credible_set_index(cs_id: Column) -> Column:
    """``QTD000046_L1`` → 1 (reference finemapping.py:77-98)."""
    return F.split(cs_id, "_L").getItem(1).cast("int")


def extract_dataset_id_from_file_path(file_path: Column) -> Column:
    """First ``QTD\\d{6}`` token of a path (reference
    finemapping.py:100-119)."""
    return F.regexp_extract(file_path, r"QTD\d{6}", 0)


def parse_eqtl_susie_results(
    credible_sets: DataFrame,
    lbf: DataFrame,
    studies_metadata: DataFrame,
    n_effects: int = 10,
) -> DataFrame:
    """Join credible-set stats, wide LBFs and study metadata into one
    per-tag frame (reference parse_susie_results,
    finemapping.py:121-200).

    Expects ``credible_sets`` to carry ``credibleSetIndex`` (use
    :func:`extract_credible_set_index`) and ``dataset_id`` on both
    raw frames; ``studies_metadata`` is broadcast.
    """
    from genetics_spark_coloc_spark.sources.readers import parse_pvalue_string

    return (
        lbf.join(
            credible_sets.join(F.broadcast(studies_metadata), on="dataset_id"),
            on=["molecular_trait_id", "region", "variant", "dataset_id"],
            how="inner",
        )
        .withColumn("credibleSetIndex", F.col("credibleSetIndex").cast("int"))
        .withColumn(
            "logBF",
            _pick_by_index("lbf_variable", F.col("credibleSetIndex"), n_effects),
        )
        .select(
            F.regexp_replace(F.col("variant"), "chr", "").alias("variantId"),
            F.col("region"),
            F.col("chromosome"),
            F.col("position"),
            F.col("pip").alias("posteriorProbability"),
            *parse_pvalue_string(F.col("pvalue").cast("string")),
            F.col("sample_size").alias("nSamples"),
            F.col("beta"),
            F.col("se").alias("standardError"),
            F.col("credibleSetIndex"),
            F.col("logBF"),
            F.lit("SuSIE").alias("finemappingMethod"),
            F.col("molecular_trait_id").alias("traitFromSource"),
            F.col("gene_id").alias("geneId"),
            F.col("dataset_id"),
            clean_strings_from_symbols(
                F.concat_ws(
                    "_",
                    F.col("study_label"),
                    F.col("quant_method"),
                    F.col("sample_group"),
                    F.col("molecular_trait_id"),
                )
            ).alias("studyId"),
            F.col("tissue_id").alias("biosampleFromSourceId"),
            identify_qtl_study_type(
                F.col("quant_method"), F.col("study_type")
            ).alias("studyType"),
            F.col("study_label").alias("projectId"),
            F.col("molecular_trait_id"),
        )
    )


def eqtl_susie_to_study_locus(processed: DataFrame) -> DataFrame:
    """Collapse the per-tag frame into credible-set rows (reference
    from_susie_results, finemapping.py:202-262): max-PIP lead, locus
    array, whole-set log10 Bayes factor via a logsumexp fold."""
    keys = ["dataset_id", "molecular_trait_id", "region", "credibleSetIndex"]
    # r14: the lead comes from a min_by AGGREGATION instead of the old
    # row_number window + filter(rn=1) (see
    # finngen_finemapping_to_study_locus — same device, same
    # semantics-preservation argument, and the same two drilled-and-
    # rejected alternatives: unbounded-window collect_list is
    # O(group²), and fusing min_by into the collect_list aggregation
    # drops the whole aggregate out of codegen). min_by over
    # (desc-PIP-nulls-last, asc variantId) reproduces the old
    # row_number lead exactly; variantId is unique per group so the
    # order is strict.
    rest = [c for c in processed.columns if c not in keys]
    lead_key = F.struct(
        F.when(F.isnan(F.col("posteriorProbability")), F.lit(float("-inf")))
        .otherwise(
            F.coalesce(-F.col("posteriorProbability"), F.lit(float("inf")))
        )
        .alias("k1"),
        F.col("variantId").alias("k2"),
    )
    leads = processed.groupBy(*keys).agg(
        F.min_by(F.struct(*rest), lead_key).alias("_lead")
    )
    loci = processed.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "variantId",
                    "posteriorProbability",
                    "pValueMantissa",
                    "pValueExponent",
                    "logBF",
                    "beta",
                    "standardError",
                )
            )
        ).alias("locus"),
    )
    # column order matches the old leads.join(loci, on=keys) output:
    # keys first, the remaining per-tag columns, then the locus
    return (
        leads.join(loci, on=keys, how="inner")
        .select(*keys, "_lead.*", "locus")
        .withColumn(
            "studyLocusId",
            assign_study_locus_id(["studyId", "variantId", "finemappingMethod"]),
        )
        .withColumn(
            "credibleSetlog10BF",
            logsumexp(F.col("locus.logBF")) * F.lit(LOG10E),
        )
    )
