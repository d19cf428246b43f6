"""Credible-set annotation over the ``locus`` array<struct> column.

Reference: src/gentropy/dataset/study_locus.py:916-967
(``annotate_credible_sets``) — sort tags by posteriorProbability
DESC, then flag ``is95CredibleSet``/``is99CredibleSet`` using the
EXCLUSIVE prefix sum (the ``index - 1`` slice trick): a tag is in the
X% set iff the probability mass strictly before it is < X, which
keeps the tag that crosses the threshold.

Everything is higher-order array functions — per-row, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.functions.arrays import (
    array_sum,
    logsumexp,
    order_array_of_structs_by_field,
)


def annotate_credible_sets(study_locus: DataFrame, locus_col: str = "locus") -> DataFrame:
    """Add is95CredibleSet / is99CredibleSet flags to each locus tag."""
    nonempty = F.col(locus_col).isNotNull() & (F.size(F.col(locus_col)) > 0)
    sorted_locus = F.when(
        nonempty, order_array_of_structs_by_field(F.col(locus_col), "posteriorProbability")
    )
    df = study_locus.withColumn(locus_col, sorted_locus)

    # exclusive prefix sums over the sorted posteriors, zipped back in
    prefix = F.transform(
        F.sequence(F.lit(1), F.size(F.col(locus_col))),
        lambda index: F.aggregate(
            F.slice(F.col(f"{locus_col}.posteriorProbability"), 1, index - 1),
            F.lit(0.0),
            lambda acc, el: acc + el,
        ),
    )
    annotated = F.zip_with(
        F.col(locus_col),
        prefix,
        lambda tag, acc: tag.withField("is95CredibleSet", (acc < 0.95) & acc.isNotNull())
        .withField("is99CredibleSet", (acc < 0.99) & acc.isNotNull()),
    )
    return df.withColumn(locus_col, F.when(nonempty, annotated))


def credible_set_log10bf(logbfs: Column) -> Column:
    """log10 Bayes factor of a whole credible set: logsumexp of the
    per-tag logBFs × log10(e)
    (reference: study_locus.py:635-657 — there a Python UDF over
    ``get_logsum``; here the pure-Spark stable fold)."""
    return (logsumexp(logbfs) * F.lit(0.43429448190325176)).alias(
        "credibleSetlog10BF"
    )


def filter_credible_set(
    study_locus: DataFrame,
    credible_interval: str = "is95CredibleSet",
    locus_col: str = "locus",
) -> DataFrame:
    """Keep only tags inside the given credible interval
    (reference: study_locus.py:779-800): annotate, then array-filter
    the locus on the interval flag."""
    annotated = annotate_credible_sets(study_locus, locus_col)
    return annotated.withColumn(
        locus_col,
        F.filter(F.col(locus_col), lambda tag: tag[credible_interval]),
    )


def filter_ld_set(ld_set: Column, r2_threshold: float) -> Column:
    """Array-filter an ldSet on r2Overall ≥ threshold, null-preserving
    (reference: study_locus.py:802-819)."""
    return F.when(
        ld_set.isNotNull(),
        F.filter(ld_set, lambda tag: tag["r2Overall"] >= r2_threshold),
    )


def unique_variants_in_locus(study_locus: DataFrame) -> DataFrame:
    """Distinct (variantId, chromosome) across leads ∪ tags
    (reference: study_locus.py:860-881); chromosome re-derived by
    splitting the ``chrom_pos_ref_alt`` id."""
    return (
        study_locus.withColumn(
            "variantId",
            F.explode(
                F.array_union(
                    F.array(F.col("variantId")),
                    F.coalesce(F.col("locus.variantId"), F.array()),
                )
            ),
        )
        .select("variantId", F.split(F.col("variantId"), "_")[0].alias("chromosome"))
        .distinct()
    )


def qc_abnormal_pips(
    study_locus: DataFrame,
    lower: float = 0.99,
    upper: float = 1.0001,
    flag: str = "Abnormal posterior probability distribution",
) -> DataFrame:
    """Flag loci whose posterior probabilities don't sum to ~1
    (reference: study_locus.py:433-485)."""
    pip_sum = array_sum(F.coalesce(F.col("locus.posteriorProbability"), F.array()))
    out_of_range = (
        F.col("locus").isNotNull()
        & (F.size(F.col("locus")) > 0)
        & ((pip_sum < lower) | (pip_sum > upper))
    )
    return study_locus.withColumn(
        "qualityControls",
        F.when(
            out_of_range,
            F.array_union(
                F.coalesce(F.col("qualityControls"), F.array().cast("array<string>")),
                F.array(F.lit(flag)),
            ),
        ).otherwise(F.col("qualityControls")),
    )


def credible_set_qc(
    cred_sets: DataFrame,
    p_value_threshold: float = 1e-5,
    purity_min_r2: float = 0.01,
) -> DataFrame:
    """Post-fine-mapping credible-set QC (reference
    method/susie_inf.py:471-533 + credible_set_qc.py step): drop sets
    whose lead p-value misses the threshold or whose min-R2 purity is
    too low, then keep the highest-log10BF row per studyLocusId.

    Unlike the reference — which recomposes the double
    ``mantissa × 10^exponent`` (underflows at 1e-308) — the p-value
    filter compares the (mantissa, exponent) pair. Ties on log10BF
    break on variantId for determinism. The reference's optional
    LD-clump branch is the existing ``ld.ld_annotate`` +
    ``ld.flag_linked_leads`` composition.
    """
    from genetics_spark_coloc_spark.functions.pvalue import pvalue_pair_lte

    dedup_w = Window.partitionBy("studyLocusId").orderBy(
        F.desc("credibleSetlog10BF"), F.asc("variantId")
    )
    return (
        cred_sets.filter(
            pvalue_pair_lte(
                F.col("pValueMantissa"),
                F.col("pValueExponent"),
                p_value_threshold,
            )
        )
        .filter(F.col("purityMinR2") >= purity_min_r2)
        .withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
