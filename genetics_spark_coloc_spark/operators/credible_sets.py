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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.arrays import (
    array_sum,
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
