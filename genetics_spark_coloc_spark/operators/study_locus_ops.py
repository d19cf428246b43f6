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
from pyspark.sql.window import Window

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


# Confidence labels, highest → lowest (reference
# CredibleSetConfidenceClasses, dataset/study_locus.py:43-60)
CONFIDENCE_IN_SAMPLE = "SuSiE fine-mapped credible set with in-sample LD"
CONFIDENCE_OUT_OF_SAMPLE = "SuSiE fine-mapped credible set with out-of-sample LD"
CONFIDENCE_PICSED_SUMSTATS = (
    "PICS fine-mapped credible set extracted from summary statistics"
)
CONFIDENCE_PICSED_TOP_HIT = "PICS fine-mapped credible set based on reported top hit"
CONFIDENCE_UNKNOWN = "Unknown confidence"

QC_OUT_OF_SAMPLE_LD = "Study locus finemapped without in-sample LD reference"
QC_TOP_HIT = "Study locus from curated top hit"


def assign_confidence(study_locus: DataFrame) -> DataFrame:
    """Label each credible set by fine-mapping provenance
    (reference assign_confidence, dataset/study_locus.py:1372-1443):
    SuSiE ± in-sample LD, PICS from sumstats vs curated top hit,
    otherwise unknown. Pure when/otherwise chain over
    ``finemappingMethod`` × ``qualityControls``."""
    if (
        "qualityControls" not in study_locus.columns
        or "finemappingMethod" not in study_locus.columns
    ):
        return study_locus
    is_susie = F.col("finemappingMethod").isin("SuSie", "SuSiE-inf")
    out_of_sample = F.array_contains(
        F.col("qualityControls"), QC_OUT_OF_SAMPLE_LD
    )
    is_pics = F.col("finemappingMethod") == "PICS"
    top_hit = F.array_contains(F.col("qualityControls"), QC_TOP_HIT)
    return study_locus.withColumn(
        "confidence",
        F.when(is_susie & ~out_of_sample, CONFIDENCE_IN_SAMPLE)
        .when(is_susie & out_of_sample, CONFIDENCE_OUT_OF_SAMPLE)
        .when(is_pics & ~top_hit, CONFIDENCE_PICSED_SUMSTATS)
        .when(is_pics & top_hit, CONFIDENCE_PICSED_TOP_HIT)
        .otherwise(CONFIDENCE_UNKNOWN),
    )


def score_credible_set_confidence(confidence: Column) -> Column:
    """Confidence label → numeric score in [0,1]
    (reference CredibleSetConfidenceFeature.score_credible_set_confidence,
    l2g_features/other.py:326-361)."""
    return (
        F.when(confidence == CONFIDENCE_IN_SAMPLE, F.lit(1.0))
        .when(confidence == CONFIDENCE_OUT_OF_SAMPLE, F.lit(0.75))
        .when(confidence == CONFIDENCE_PICSED_SUMSTATS, F.lit(0.5))
        .when(confidence == CONFIDENCE_PICSED_TOP_HIT, F.lit(0.25))
        .when(confidence == CONFIDENCE_UNKNOWN, F.lit(0.0))
    )


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


def validate_unique_study_locus_id(
    study_locus: DataFrame,
    flag: str = "Non-unique study locus identifier",
) -> DataFrame:
    """QC-flag rows whose studyLocusId appears more than once
    (reference validate_unique_study_locus_id,
    dataset/study_locus.py:374-392). One count-window, no join."""
    from genetics_spark_coloc_spark.operators.annotation import update_quality_flag

    w = Window.partitionBy("studyLocusId")
    return study_locus.withColumn(
        "qualityControls",
        update_quality_flag(
            F.col("qualityControls") if "qualityControls" in study_locus.columns
            else F.lit(None).cast("array<string>"),
            F.count(F.lit(1)).over(w) > 1,
            flag,
        ),
    )
