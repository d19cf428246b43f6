"""GWAS-Catalog study-index ingestion: ancestry parsing, sample-size
extraction, curation annotation.

Reference: datasource/gwas_catalog/study_index.py (682 LoC). The
distinctive operator is ``parse_discovery_samples``
(study_index.py:36-135): curated ancestry labels arrive as
comma-separated compounds ("European, African", 100) whose sample
counts must be split evenly across the component ancestries, then
re-summed per unique label. The reference does this with four chained
``aggregate``/``transform`` folds; here it is one flatten +
label-indexed sum — identical truncation semantics
(``count / n_parts`` cast to int), one expression tree.

Everything here is array/higher-order-function work on columns — no
shuffles beyond the caller's own groupBy, so it scales with the
study table (thousands of rows), never with sumstats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.study_index_ops import (
    aggregate_and_map_ancestries,
)

#: Splits compound ancestry labels on ", " unless inside parentheses
#: (reference study_index.py:87).
ANCESTRY_SPLIT_REGEX = r",\s(?![^()]*\))"

QC_NO_OT_CURATION = "Study was not curated by Open Targets"
QC_SUMSTATS_NOT_AVAILABLE = "No harmonized summary statistics"


def parse_cohorts(raw_cohort: Column) -> Column:
    """Pipe-separated cohort list → de-duplicated array; null for
    null/empty input (reference study_index.py:205-229)."""
    return F.when(
        raw_cohort.isNotNull() & (raw_cohort != ""),
        F.array_distinct(F.split(raw_cohort, r"\|")),
    )


def parse_discovery_samples(discovery_samples: Column) -> Column:
    """Parse curated discovery-stage ancestries with even sample-size
    splitting (reference study_index.py:36-135).

    Input: array<struct<ancestry: string, sampleSize: int>> where
    ``ancestry`` may be a comma-separated compound. Each compound's
    count is divided evenly (integer truncation) across its component
    labels, then counts are summed per unique label. Output labels
    keep first-appearance order of the input array.

    ``[("European, African", 100), ("European", 50)]``
    → ``[("European", 100/2 + 50 = 100), ("African", 50)]``
    """
    shares = F.flatten(
        F.transform(
            discovery_samples,
            lambda s: F.transform(
                F.split(s["ancestry"], ANCESTRY_SPLIT_REGEX),
                lambda part: F.struct(
                    part.alias("ancestry"),
                    (
                        s["sampleSize"]
                        / F.size(F.split(s["ancestry"], ANCESTRY_SPLIT_REGEX))
                    )
                    .cast("int")
                    .alias("sampleSize"),
                ),
            ),
        )
    )
    labels = F.array_distinct(F.transform(shares, lambda s: s["ancestry"]))
    return F.transform(
        labels,
        lambda lab: F.struct(
            lab.alias("ancestry"),
            F.aggregate(
                F.filter(shares, lambda s: s["ancestry"] == lab),
                F.lit(0),
                lambda acc, s: acc + s["sampleSize"],
            )
            .cast("int")
            .alias("sampleSize"),
        ),
    )


def annotate_discovery_sample_sizes(studies: DataFrame) -> DataFrame:
    """Extract nCases / nControls / nSamples from the free-text
    ``initialSampleSize`` column (reference study_index.py:589-632):
    split on commas-with-space, strip thousands separators, take the
    first integer of each segment, attribute it to cases/controls by
    keyword, sum per study."""
    sample_size_lut = (
        studies.select(
            "studyId",
            F.explode_outer(F.split(F.col("initialSampleSize"), r",\s+")).alias(
                "samples"
            ),
        )
        .withColumn(
            "sampleSize",
            F.regexp_extract(
                F.regexp_replace(F.col("samples"), ",", ""), r"[0-9]+", 0
            ).try_cast("int"),
        )
        .select(
            "studyId",
            "sampleSize",
            F.when(F.col("samples").contains("cases"), F.col("sampleSize"))
            .otherwise(F.lit(0))
            .alias("nCases"),
            F.when(F.col("samples").contains("controls"), F.col("sampleSize"))
            .otherwise(F.lit(0))
            .alias("nControls"),
        )
        .groupBy("studyId")
        .agg(
            F.sum("nCases").cast("int").alias("nCases"),
            F.sum("nControls").cast("int").alias("nControls"),
            F.sum("sampleSize").cast("int").alias("nSamples"),
        )
    )
    return studies.join(sample_size_lut, on="studyId", how="left")


def annotate_ancestries(studies: DataFrame, ancestry_lut: DataFrame) -> DataFrame:
    """Join the GWAS-Catalog ancestry table onto the study table
    (reference study_index.py:468-587): pivot per-study ancestry rows
    into discovery ("initial") and replication stages, apply
    :func:`parse_discovery_samples` to the discovery set, and map the
    result onto LD reference populations.

    The ancestry_lut is expected pre-camelCased: columns ``studyId``,
    ``stage`` ("initial"/"replication"), ``broadAncestralCategory``,
    ``numberOfIndividuals``.
    """
    ancestry_stages = (
        ancestry_lut.groupBy("studyId")
        .pivot("stage", ["initial", "replication"])
        .agg(
            F.collect_list(
                F.struct(
                    F.col("broadAncestralCategory").alias("ancestry"),
                    F.col("numberOfIndividuals").cast("int").alias("sampleSize"),
                )
            )
        )
        .withColumn("discoverySamples", parse_discovery_samples(F.col("initial")))
        .withColumnRenamed("replication", "replicationSamples")
        .withColumn(
            "ldPopulationStructure",
            aggregate_and_map_ancestries(F.col("discoverySamples")),
        )
        .select(
            "studyId", "discoverySamples", "ldPopulationStructure", "replicationSamples"
        )
    )
    return studies.join(ancestry_stages, on="studyId", how="left")


def annotate_from_study_curation(
    studies: DataFrame, curation_table: DataFrame | None
) -> DataFrame:
    """Merge an Open-Targets curation table into the study index
    (reference study_index.py:342-406): curated study type wins,
    analysis flags union in, and non-curated sumstats studies get the
    NO_OT_CURATION quality flag."""
    if curation_table is None:
        return studies
    if "qualityControls" not in studies.columns:
        studies = studies.withColumn(
            "qualityControls", F.array().cast("array<string>")
        )
    if "analysisFlags" not in studies.columns:
        studies = studies.withColumn("analysisFlags", F.array().cast("array<string>"))

    curation = curation_table.select(
        "studyId",
        F.col("studyType").alias("curationStudyType"),
        F.col("analysisFlags").alias("curationAnalysisFlags"),
        F.lit(True).alias("isCurated"),
    )
    return (
        studies.join(F.broadcast(curation), on="studyId", how="left")
        .withColumn("isCurated", F.coalesce(F.col("isCurated"), F.lit(False)))
        .withColumn(
            "studyType", F.coalesce(F.col("curationStudyType"), F.col("studyType"))
        )
        .withColumn(
            "analysisFlags",
            F.coalesce(
                F.array_union(
                    F.col("analysisFlags"), F.col("curationAnalysisFlags")
                ),
                F.array().cast("array<string>"),
            ),
        )
        .withColumn(
            "qualityControls",
            F.when(
                ~F.col("isCurated"),
                F.array_union(
                    F.col("qualityControls"), F.array(F.lit(QC_NO_OT_CURATION))
                ),
            ).otherwise(F.col("qualityControls")),
        )
        .drop("curationStudyType", "curationAnalysisFlags", "isCurated")
    )


def extract_studies_for_curation(
    studies: DataFrame, curation: DataFrame | None
) -> DataFrame:
    """Flatten the study index back into the curation-spreadsheet
    shape (reference study_index.py:408-466): sumstats studies only,
    array columns pipe-joined, isCurated stringly-typed for TSV."""
    base = studies.filter(F.col("hasSumstats"))
    if curation is None:
        return base.select(
            "studyId",
            F.lit(None).cast("string").alias("studyType"),
            F.lit(None).cast("string").alias("analysisFlag"),
            F.lit(None).cast("string").alias("qualityControl"),
            F.lit("false").alias("isCurated"),
            "pubmedId",
            "publicationTitle",
            "traitFromSource",
        )
    cur = curation.select(
        "studyId",
        F.col("studyType").alias("curationStudyType"),
        F.col("analysisFlags").alias("curationAnalysisFlags"),
        F.col("qualityControls").alias("curationQualityControls"),
        F.col("isCurated").alias("curationIsCurated"),
    )
    return base.join(F.broadcast(cur), on="studyId", how="left").select(
        "studyId",
        F.col("curationStudyType").alias("studyType"),
        F.array_join(F.col("curationAnalysisFlags"), "|").alias("analysisFlag"),
        F.array_join(F.col("curationQualityControls"), "|").alias("qualityControl"),
        F.coalesce(F.col("curationIsCurated"), F.lit(False))
        .cast("string")
        .alias("isCurated"),
        "pubmedId",
        "publicationTitle",
        "traitFromSource",
    )


def update_study_id(studies: DataFrame, study_annotation: DataFrame) -> DataFrame:
    """Override studyId / trait columns from an annotation table
    (reference study_index.py:298-340): left join on studyId, updated
    values win via coalesce."""
    ann = study_annotation.select(
        "studyId",
        F.col("updatedStudyId"),
        F.col("traitFromSource").alias("updatedTraitFromSource"),
        F.col("traitFromSourceMappedIds").alias("updatedTraitFromSourceMappedIds"),
    )
    original_cols = studies.columns
    return (
        studies.join(F.broadcast(ann), on="studyId", how="left")
        .withColumn("studyId", F.coalesce(F.col("updatedStudyId"), F.col("studyId")))
        .withColumn(
            "traitFromSource",
            F.coalesce(F.col("updatedTraitFromSource"), F.col("traitFromSource")),
        )
        .withColumn(
            "traitFromSourceMappedIds",
            F.coalesce(
                F.col("updatedTraitFromSourceMappedIds"),
                F.col("traitFromSourceMappedIds"),
            ),
        )
        .select(original_cols)
    )


def parse_gwas_catalog_study_id(sumstats_path: Column) -> Column:
    """Last GCST accession in a summary-statistics path
    (reference study_index.py:662-682)."""
    accessions = F.regexp_extract_all(sumstats_path, F.lit(r"(GCST\d+)"))
    return F.get(accessions, F.size(accessions) - 1)


def parse_efos(efo_uri: Column) -> Column:
    """Extract EFO identifiers from a comma-separated URI list, sorted
    (reference common/utils.py:231-255)."""
    return F.when(
        efo_uri.isNotNull(),
        F.array_sort(F.regexp_extract_all(efo_uri, F.lit(r"([A-Z]+_[0-9]+)"))),
    )


def parse_ot_curation_table(raw: DataFrame) -> DataFrame:
    """Normalise the Open-Targets curation spreadsheet (reference
    study_index_ot_curation.py:25-52): pipe-joined flag strings →
    arrays (empty when null), isCurated → boolean."""
    if "qualityControl" not in raw.columns:
        raw = raw.withColumn("qualityControl", F.lit(None).cast("string"))
    return raw.select(
        "studyId",
        "studyType",
        F.when(
            F.col("analysisFlag").isNotNull(), F.split(F.col("analysisFlag"), r"\|")
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("analysisFlags"),
        F.when(
            F.col("qualityControl").isNotNull(),
            F.split(F.col("qualityControl"), r"\|"),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("qualityControls"),
        F.col("isCurated").cast("boolean"),
    )
