"""Per-project study-index ingestion: eQTL Catalogue, FinnGen,
UKBiobank.

Reference: datasource/eqtl_catalogue/study_index.py:20-150,
datasource/finngen/study_index.py:22-189,
datasource/ukbiobank/study_index.py:14-110. Each is a metadata-table
projection — tiny frames, but the parsing rules (QTL-type dispatch,
trait reformatting, EFO aggregation) are part of the engine's public
surface so they are reproduced as testable operators over plain
DataFrames (the HTTP fetches of the originals are the caller's
problem; everything here starts from an already-loaded frame).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.study_index_ops import (
    aggregate_and_map_ancestries,
)

#: Quantification-method → QTL type (reference
#: eqtl_catalogue/study_index.py:49-57).
EQTL_METHOD_TO_QTL_TYPE = {
    "ge": "eqtl",
    "exon": "eqtl",
    "tx": "eqtl",
    "microarray": "eqtl",
    "leafcutter": "sqtl",
    "aptamer": "pqtl",
    "txrev": "tuqtl",
}


def identify_qtl_study_type(
    quant_method: Column, study_type: Column
) -> Column:
    """QTL study type from quantification method, with an ``sc``
    prefix for single-cell studies (reference
    eqtl_catalogue/study_index.py:59-86)."""
    pairs: list[Column] = []
    for k, v in EQTL_METHOD_TO_QTL_TYPE.items():
        pairs.extend([F.lit(k), F.lit(v)])
    mapped = F.create_map(*pairs)[quant_method]
    return F.when(
        study_type == "single-cell", F.concat(F.lit("sc"), mapped)
    ).otherwise(mapped)


def eqtl_catalogue_study_id(
    project_id: Column, qtl_group: Column, gene_id: Column
) -> Column:
    """Full eQTL-Catalogue study id ``project_qtlgroup_gene``
    (reference eqtl_catalogue/summary_stats.py:23-46 — there the
    project/group come from regexes over ``input_file_name()``)."""
    return F.concat_ws("_", project_id, qtl_group, gene_id)


def process_eqtl_sumstats(raw: DataFrame) -> DataFrame:
    """eQTL-Catalogue summary-stats normalisation (reference
    eqtl_catalogue/summary_stats.py:48-93): compose studyId and
    variantId, decompose the p-value, drop unparseable positions and
    zero betas."""
    from genetics_spark_coloc_spark.sources.readers import parse_pvalue_string

    return (
        raw.select(
            eqtl_catalogue_study_id(
                F.col("project_id"), F.col("qtl_group"), F.col("gene_id")
            ).alias("studyId"),
            F.concat_ws(
                "_", F.col("chromosome"), F.col("position"), F.col("ref"), F.col("alt")
            ).alias("variantId"),
            F.col("chromosome"),
            F.col("position").cast("int").alias("position"),
            *parse_pvalue_string(F.col("pvalue")),
            F.col("beta").cast("double").alias("beta"),
            F.col("se").cast("double").alias("standardError"),
            F.col("maf").cast("float").alias("effectAlleleFrequencyFromSource"),
        )
        .filter(F.col("position").isNotNull() & (F.col("beta") != 0))
    )


def finngen_study_index(
    phenotypes: DataFrame,
    release_prefix: str = "FINNGEN_R11",
    sample_size: int = 500_348,
    sumstats_url_prefix: str = "",
    sumstats_url_suffix: str = "",
) -> DataFrame:
    """FinnGen phenotype manifest → study index rows (reference
    finngen/study_index.py:127-189)."""
    return phenotypes.select(
        F.concat_ws("_", F.lit(release_prefix), F.col("phenocode")).alias("studyId"),
        F.col("phenostring").alias("traitFromSource"),
        F.col("num_cases").cast("int").alias("nCases"),
        F.col("num_controls").cast("int").alias("nControls"),
        (F.col("num_cases") + F.col("num_controls")).cast("int").alias("nSamples"),
        F.lit(release_prefix).alias("projectId"),
        F.lit("gwas").alias("studyType"),
        F.lit(True).alias("hasSumstats"),
        F.array(
            F.struct(
                F.lit(sample_size).cast("int").alias("sampleSize"),
                F.lit("Finnish").alias("ancestry"),
            )
        ).alias("discoverySamples"),
        F.array(F.lit("FinnGen")).alias("cohorts"),
        F.concat(
            F.lit(sumstats_url_prefix), F.col("phenocode"), F.lit(sumstats_url_suffix)
        ).alias("summarystatsLocation"),
    ).withColumn(
        "ldPopulationStructure",
        aggregate_and_map_ancestries(F.col("discoverySamples")),
    )


def join_efo_mapping(
    study_index: DataFrame, efo_curation: DataFrame, finngen_release: str
) -> DataFrame:
    """Attach curated EFO mappings per trait (reference
    finngen/study_index.py:82-125): filter the curation table to the
    release, left join on trait, aggregate mapped ids per study —
    studies without mappings keep an empty array. The ids are sorted
    (the reference's collect_list order is join-order-dependent)."""
    efo = (
        efo_curation.withColumn("STUDY", F.upper(F.col("STUDY")))
        .filter(F.col("STUDY").contains("FINNGEN"))
        .filter(F.col("STUDY").contains(finngen_release.upper()))
        .select(
            F.regexp_replace(F.col("SEMANTIC_TAG"), r"^.*/", "").alias(
                "traitFromSourceMappedId"
            ),
            F.col("PROPERTY_VALUE").alias("traitFromSource"),
        )
    )
    joined = study_index.join(
        F.broadcast(efo), on="traitFromSource", how="left_outer"
    )
    group_cols = [c for c in joined.columns if c != "traitFromSourceMappedId"]
    return joined.groupBy(group_cols).agg(
        F.sort_array(
            F.filter(
                F.collect_list("traitFromSourceMappedId"), lambda x: x.isNotNull()
            )
        ).alias("traitFromSourceMappedIds")
    )


def ukbiobank_study_index(manifest: DataFrame) -> DataFrame:
    """UKBiobank manifest → study index rows (reference
    ukbiobank/study_index.py:35-110): SAIGE/NEALE publication
    constants, "category: name" traits flipped to
    "Name | category"."""
    trait = F.col("traitFromSource")
    return (
        manifest.select(
            F.col("code").alias("studyId"),
            F.lit("UKBiobank").alias("projectId"),
            F.lit("gwas").alias("studyType"),
            F.col("trait").alias("traitFromSource"),
            F.when(F.col("code").startswith("SAIGE_"), "30104761").alias("pubmedId"),
            F.when(F.col("code").startswith("NEALE2_"), "2018-08-01")
            .otherwise("2018-10-24")
            .alias("publicationDate"),
            F.col("n_total").cast("string").alias("initialSampleSize"),
            F.col("n_cases").cast("int").alias("nCases"),
            F.array(
                F.struct(
                    F.col("n_total").cast("int").alias("sampleSize"),
                    F.concat(F.lit("European="), F.col("n_total")).alias("ancestry"),
                )
            ).alias("discoverySamples"),
            F.col("in_path").alias("summarystatsLocation"),
            F.lit(True).alias("hasSumstats"),
        )
        .withColumn(
            "traitFromSource",
            F.when(
                trait.contains(":"),
                F.concat(
                    F.initcap(F.split(trait, ": ").getItem(1)),
                    F.lit(" | "),
                    F.lower(F.split(trait, ": ").getItem(0)),
                ),
            ).otherwise(trait),
        )
    )
