"""FinnGen SuSiE fine-mapping ingestion → StudyLocus rows.

Reference: datasource/finngen/finemapping.py:193-533. There the wide
per-effect columns (``alpha1..alpha10``, ``lbf_variable1..10``,
``mean1..10``) are resolved into the credible-set-specific value with
three 10-branch ``when()`` chains, and block-gzipped TSVs are read
through Hail. Here the resolution is one ``element_at`` over an array
built from the wide columns (same semantics, a fraction of the
expression tree, no Hail): per-row the credible-set index ``cs``
selects the cs-th single-effect statistics.

Scale notes: the snp→summary join is an equi join on
(studyId, region, credibleSetIndex) — both sides are pre-filtered
(cs>0, LBF threshold) before the shuffle; lead selection and locus
collection reuse the same grouping keys so AQE coalesces them into
one exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.sources.readers import parse_pvalue_string
from genetics_spark_coloc_spark.operators.study_locus_ops import (
    assign_study_locus_id,
)

#: log10(exp(2)) — the publication's credible-set LBF threshold.
CREDSET_LBF_THRESHOLD = 0.8685889638065036

SUSIE_METHOD = "SuSIE"


def _pick_by_index(prefix: str, index: Column, n_effects: int) -> Column:
    """``element_at([<prefix>1 … <prefix>N], index)`` — the Spark-first
    replacement for the reference's N-way ``when`` chain
    (finemapping.py:336-410)."""
    return F.element_at(
        F.array(*[F.col(f"{prefix}{i}").cast("double") for i in range(1, n_effects + 1)]),
        index,
    )


def process_finngen_susie_snps(
    snps: DataFrame,
    release_prefix: str = "FINNGEN_R11",
    n_effects: int = 10,
) -> DataFrame:
    """Normalise the per-variant SuSiE output (finemapping.py:297-411).

    Expects the raw wide schema: trait, region, v, chromosome,
    position, cs, p, se, maf + alpha/lbf_variable/mean wide columns.
    Keeps only credible-set members (cs > 0) with a parseable
    position.
    """
    return (
        snps.filter(F.col("position").cast("int").isNotNull())
        .filter(F.col("cs").cast("int") > 0)
        .select(
            F.concat_ws("_", F.lit(release_prefix), F.col("trait")).alias("studyId"),
            F.col("region"),
            F.regexp_replace(F.col("v"), ":", "_").alias("variantId"),
            F.col("cs").cast("int").alias("credibleSetIndex"),
            F.regexp_replace(F.col("chromosome"), "^chr", "").alias("chromosome"),
            F.col("position").cast("int").alias("position"),
            *parse_pvalue_string(F.col("p")),
            F.col("se").cast("double").alias("standardError"),
            F.col("maf").cast("float").alias("effectAlleleFrequencyFromSource"),
            F.lit(SUSIE_METHOD).alias("finemappingMethod"),
            _pick_by_index("alpha", F.col("cs").cast("int"), n_effects).alias(
                "posteriorProbability"
            ),
            _pick_by_index("lbf_variable", F.col("cs").cast("int"), n_effects).alias(
                "logBF"
            ),
            _pick_by_index("mean", F.col("cs").cast("int"), n_effects).alias("beta"),
        )
    )


def process_finngen_cs_summaries(
    summaries: DataFrame,
    release_prefix: str = "FINNGEN_R11",
    lbf_threshold: float = CREDSET_LBF_THRESHOLD,
) -> DataFrame:
    """Credible-set-level summaries with the publication's LBF filter
    (finemapping.py:435-453): drop sets with log10BF below log10(e^2)
    unless they are the first credible set of the region."""
    return (
        summaries.select(
            F.col("region"),
            F.col("cs").cast("int").alias("credibleSetIndex"),
            F.col("cs_log10bf").cast("double").alias("credibleSetlog10BF"),
            F.col("cs_avg_r2").cast("double").alias("purityMeanR2"),
            F.col("cs_min_r2").cast("double").alias("purityMinR2"),
            F.concat_ws("_", F.lit(release_prefix), F.col("trait")).alias("studyId"),
        )
        .filter(
            (F.col("credibleSetlog10BF") > lbf_threshold)
            | (F.col("credibleSetIndex") == 1)
        )
    )


def finngen_finemapping_to_study_locus(
    snps: DataFrame,
    summaries: DataFrame,
    release_prefix: str = "FINNGEN_R11",
    lbf_threshold: float = CREDSET_LBF_THRESHOLD,
    n_effects: int = 10,
) -> DataFrame:
    """Full ingestion (finemapping.py:207-532): normalise snps, filter
    summaries, join, pick the max-PIP lead per credible set, collect
    the locus array, and derive locusStart/locusEnd from the region
    string.

    Determinism: the reference breaks PIP ties arbitrarily
    (row_number over desc PIP only); here ties break on variantId so
    the result is stable under retries/oracles. Locus arrays are
    sorted by variantId.
    """
    tags = process_finngen_susie_snps(snps, release_prefix, n_effects)
    cs = process_finngen_cs_summaries(summaries, release_prefix, lbf_threshold)

    keys = ["studyId", "region", "credibleSetIndex"]
    joined = tags.join(cs, on=keys, how="inner")

    # r14: the lead comes from a min_by AGGREGATION instead of the old
    # row_number window + filter(rn=1) — a codegen'd HashAggregate
    # with map-side partial aggregation, no full (keys, PIP, variant)
    # sort. Two rejected alternatives, both drilled at sf0.1: (a) an
    # unbounded-frame collect_list window projects the whole locus
    # array onto EVERY row before rn=1 discards all but one — O(group²)
    # copies, 4.5x slower; (b) fusing min_by and collect_list into ONE
    # aggregation forces the whole aggregate into interpreted
    # ObjectHashAggregate (TypedImperativeAggregate disables codegen),
    # paying per-row interpreted wide-struct copies — 2x slower than
    # keeping the two aggregations separate and joining on the keys
    # (each stays column-pruned and codegen'd; 9.9 s vs 4.4 s).
    # min_by uses the same total order the old window did: desc PIP
    # nulls-LAST (coalesce to +inf; NaN pins first exactly as desc
    # ranks NaN above every double), tie-broken asc variantId —
    # variantId is unique per group, so the order is strict and the
    # min_by deterministic.
    lead_key = F.struct(
        F.when(F.isnan(F.col("posteriorProbability")), F.lit(float("-inf")))
        .otherwise(
            F.coalesce(-F.col("posteriorProbability"), F.lit(float("inf")))
        )
        .alias("k1"),
        F.col("variantId").alias("k2"),
    )
    lead_payload = F.struct(
        "variantId",
        "chromosome",
        "position",
        "beta",
        "pValueMantissa",
        "pValueExponent",
        "effectAlleleFrequencyFromSource",
        "standardError",
        "finemappingMethod",
        "credibleSetlog10BF",
        "purityMeanR2",
        "purityMinR2",
    )
    leads = joined.groupBy(*keys).agg(
        F.min_by(lead_payload, lead_key).alias("_lead")
    )
    loci = joined.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("variantId").cast("string").alias("variantId"),
                    F.col("posteriorProbability").alias("posteriorProbability"),
                    F.col("logBF").alias("logBF"),
                    F.col("pValueMantissa").alias("pValueMantissa"),
                    F.col("pValueExponent").alias("pValueExponent"),
                    F.col("beta").alias("beta"),
                    F.col("standardError").alias("standardError"),
                )
            )
        ).alias("locus"),
    )
    span = F.split(F.split(F.col("region"), ":").getItem(1), "-")
    return (
        loci.join(leads, on=keys, how="inner")
        .select(*keys, "locus", "_lead.*")
        .withColumn("locusStart", span.getItem(0).cast("int"))
        .withColumn("locusEnd", span.getItem(1).cast("int"))
        .withColumn(
            "studyLocusId",
            assign_study_locus_id(["studyId", "variantId", "finemappingMethod"]),
        )
    )
