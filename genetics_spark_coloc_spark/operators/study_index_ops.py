"""StudyIndex operators: ancestry→LD-population mapping and
relative-sample-size aggregation, study-type LUTs.

Reference anchors: aggregate_and_map_ancestries + helpers
(dataset/study_index.py:85-207), study_type_lut (:209-215),
is_qtl (:217-223). The ancestry fold is a showcase of higher-order
array functions — per-row, zero shuffle, stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# GWAS-Catalog ancestry label → gnomAD LD panel population
# (reference asset: assets/data/gwas_population_2_LD_panel_map.json)
GWAS_POPULATION_TO_LD_PANEL = {
    "European": "nfe",
    "African American or Afro-Caribbean": "afr",
    "Native American": "amr",
    "Asian unspecified": "eas",
    "Hispanic or Latin American": "amr",
    "East Asian": "eas",
    "Central Asian": "eas",
    "South Asian": "eas",
    "South East Asian": "eas",
    "Sub-Saharan African": "afr",
    "African unspecified": "afr",
    "Oceanian": "eas",
    "Other": "nfe",
    "Finnish": "fin",
}


def _ld_population_map() -> Column:
    pairs: list[Column] = []
    for k, v in GWAS_POPULATION_TO_LD_PANEL.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def aggregate_and_map_ancestries(discovery_samples: Column) -> Column:
    """array<struct<ancestry,sampleSize>> → array<struct<ldPopulation,
    relativeSampleSize>> (reference: study_index.py:164-207).

    Three higher-order passes, all row-local:
    1. transform: map each ancestry label onto its LD panel population;
    2. aggregate: fold the mapped structs into a distinct-population
       accumulator, summing sample sizes of same-population entries;
    3. transform: divide by the total for relative sample sizes.
    """
    map_expr = _ld_population_map()
    mapped = F.transform(
        discovery_samples,
        lambda s: F.struct(
            map_expr[s["ancestry"]].alias("ancestry"),
            s["sampleSize"].cast("double").alias("sampleSize"),
        ),
    )
    zero = F.array_distinct(
        F.transform(
            mapped,
            lambda s: F.struct(
                s["ancestry"].alias("ancestry"), F.lit(0.0).alias("sampleSize")
            ),
        )
    )
    aggregated = F.aggregate(
        mapped,
        zero,
        lambda acc, entry: F.transform(
            acc,
            lambda a: F.when(
                a["ancestry"] == entry["ancestry"],
                F.struct(
                    a["ancestry"].alias("ancestry"),
                    (a["sampleSize"] + entry["sampleSize"]).alias("sampleSize"),
                ),
            ).otherwise(a),
        ),
    )
    total = F.aggregate(
        aggregated, F.lit(0.0), lambda acc, pop: acc + pop["sampleSize"]
    )
    return F.transform(
        aggregated,
        lambda pop: F.struct(
            pop["ancestry"].alias("ldPopulation"),
            (pop["sampleSize"] / total).alias("relativeSampleSize"),
        ),
    )


# Study QC flag strings (reference StudyQualityCheck,
# dataset/study_index.py:40-62)
QC_SUMSTATS_NOT_AVAILABLE = (
    "Harmonized summary statistics are not available or empty"
)
QC_FAILED_MEAN_BETA = "The mean beta QC check value is not within the expected range"
QC_FAILED_PZ = "The PZ QC check values are not within the expected range"
QC_FAILED_GC_LAMBDA = "The GC lambda value is not within the expected range"
QC_SMALL_NUMBER_OF_SNPS = (
    "The number of SNPs in the study is below the expected threshold"
)


def annotate_sumstats_qc(
    study_index: DataFrame,
    sumstats_qc: DataFrame,
    threshold_mean_beta: float = 0.05,
    threshold_mean_diff_pz: float = 0.05,
    threshold_se_diff_pz: float = 0.05,
    threshold_min_gc_lambda: float = 0.7,
    threshold_max_gc_lambda: float = 2.5,
    threshold_min_n_variants: int = 2_000_000,
) -> DataFrame:
    """Fold per-study sumstat QC metrics into the study index as a
    ``sumstatQCValues`` map, set ``hasSumstats`` and append threshold
    QC flags (reference annotate_sumstats_qc,
    dataset/study_index.py:495-609).

    ``sumstats_qc`` is wide: studyId + one column per metric
    (mean_beta, mean_diff_pz, se_diff_pz, gc_lambda, n_variants).
    The wide→map fold happens with a single per-row map_from_arrays —
    no melt shuffle; the only exchange is the left join on studyId
    (broadcast: the QC table is per-study, tiny next to the index).
    """
    from genetics_spark_coloc_spark.operators.annotation import update_quality_flag

    metric_cols = [c for c in sumstats_qc.columns if c != "studyId"]
    qc_map = sumstats_qc.select(
        "studyId",
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in metric_cols]),
            F.array(*[F.col(c).cast("float") for c in metric_cols]),
        ).alias("sumstatQCValues"),
        F.lit(True).alias("hasSumstats"),
    )
    if "qualityControls" not in study_index.columns:
        study_index = study_index.withColumn(
            "qualityControls", F.array().cast("array<string>")
        )
    v = F.col("sumstatQCValues")
    return (
        study_index.drop("sumstatQCValues", "hasSumstats")
        .join(F.broadcast(qc_map), on="studyId", how="left")
        .withColumn("hasSumstats", F.coalesce(F.col("hasSumstats"), F.lit(False)))
        .withColumn(
            "qualityControls",
            update_quality_flag(
                F.col("qualityControls"),
                ~F.col("hasSumstats"),
                QC_SUMSTATS_NOT_AVAILABLE,
            ),
        )
        .withColumn(
            "qualityControls",
            update_quality_flag(
                F.col("qualityControls"),
                ~(F.abs(v["mean_beta"]) <= threshold_mean_beta),
                QC_FAILED_MEAN_BETA,
            ),
        )
        .withColumn(
            "qualityControls",
            update_quality_flag(
                F.col("qualityControls"),
                ~(
                    (F.abs(v["mean_diff_pz"]) <= threshold_mean_diff_pz)
                    & (v["se_diff_pz"] <= threshold_se_diff_pz)
                ),
                QC_FAILED_PZ,
            ),
        )
        .withColumn(
            "qualityControls",
            update_quality_flag(
                F.col("qualityControls"),
                ~(
                    (v["gc_lambda"] <= threshold_max_gc_lambda)
                    & (v["gc_lambda"] >= threshold_min_gc_lambda)
                ),
                QC_FAILED_GC_LAMBDA,
            ),
        )
        .withColumn(
            "qualityControls",
            update_quality_flag(
                F.col("qualityControls"),
                v["n_variants"] < threshold_min_n_variants,
                QC_SMALL_NUMBER_OF_SNPS,
            ),
        )
    )


QC_NO_OT_CURATION = "GWAS Catalog study has not been curated by Open Targets"


def deconvolute_studies(study_index: DataFrame) -> DataFrame:
    """Merge duplicate studyIds ingested from multiple sources into
    one row per study (reference deconvolute_studies,
    study_index.py:610-760).

    The reference implements this with windows over
    ``orderBy(f.rand())`` — nondeterministic row picks. Here the same
    semantics are a single deterministic groupBy:

    - drop the no-OT-curation flag on rows without sumstats, and the
      sumstats-not-available flag everywhere when any source has
      sumstats (``keepTopHit`` logic);
    - merged ``qualityControls`` = sorted distinct union;
    - ``hasSumstats`` = any-true (max over booleans);
    - ``studyType`` = comma-joined sorted distinct types (ambiguity
      surfaces at study-type validation, as in the reference);
    - traits = the most granular (fewest mapped ids; ties broken
      lexicographically) — reference's ``mostGranular`` pick, made
      reproducible.

    Expects columns: studyId, studyType, hasSumstats,
    qualityControls, traitFromSource, traitFromSourceMappedIds.
    One shuffle (the groupBy); no windows, no rand().
    """
    qc = F.coalesce(F.col("qualityControls"), F.array().cast("array<string>"))
    any_sumstats = Window.partitionBy("studyId")
    cleaned = (
        study_index.withColumn(
            "qualityControls",
            F.when(
                ~F.col("hasSumstats"),
                F.array_remove(qc, QC_NO_OT_CURATION),
            ).otherwise(qc),
        )
        .withColumn(
            "_keepTopHit", ~F.max("hasSumstats").over(any_sumstats)
        )
        .withColumn(
            "qualityControls",
            F.when(
                ~F.col("_keepTopHit"),
                F.array_remove(
                    F.col("qualityControls"), QC_SUMSTATS_NOT_AVAILABLE
                ),
            ).otherwise(F.col("qualityControls")),
        )
    )
    granularity = F.struct(
        F.size("traitFromSourceMappedIds").alias("n"),
        F.col("traitFromSourceMappedIds").alias("ids"),
        F.col("traitFromSource").alias("t"),
    )
    return cleaned.groupBy("studyId").agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("qualityControls")))
        ).alias("qualityControls"),
        F.max("hasSumstats").alias("hasSumstats"),
        F.concat_ws(",", F.array_sort(F.collect_set("studyType"))).alias(
            "studyType"
        ),
        F.min_by(F.col("traitFromSource"), granularity).alias("traitFromSource"),
        F.min_by(F.col("traitFromSourceMappedIds"), granularity).alias(
            "traitFromSourceMappedIds"
        ),
    )


def study_type_lut(study_index: DataFrame) -> DataFrame:
    """(studyId, studyType) lookup table (reference: study_index.py:209-215)."""
    return study_index.select("studyId", "studyType")


def is_qtl(study_type: Column) -> Column:
    """True for any *qtl study type (reference: study_index.py:217-223)."""
    return study_type.endswith("qtl")
