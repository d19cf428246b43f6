"""Higher-order array functions — the engine's distinctive layer.

Credible-set math lives inside ``array<struct>`` columns; these
helpers keep all of it JVM-side (whole-stage codegen) instead of the
reference's row-at-a-time Python UDFs.

Reference anchors: logsumexp UDF (src/gentropy/common/utils.py:258-276),
softmax posteriors (method/colocalisation.py:221-238), array-struct
sorts (common/spark_helpers.py:354-448), credible-set cumulative sum
(dataset/study_locus.py:939-967), harmonic sum
(common/spark_helpers.py:853-888).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def logsumexp(arr: Column) -> Column:
    """log(Σ exp(xᵢ)) computed stably: max + log(Σ exp(xᵢ - max)).

    Pure-Spark replacement for the reference's ``get_logsum`` Python
    UDF (common/utils.py:258-276).
    """
    mx = F.array_max(arr)
    shifted_sum = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: acc + F.exp(x - mx),
    )
    return mx + F.log(shifted_sum)


def softmax(arr: Column) -> Column:
    """Softmax over an array<double>, stably (subtract max).

    Replaces the reference's ``_get_posteriors`` vector UDF
    (method/colocalisation.py:221-238).
    """
    mx = F.array_max(arr)
    total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + F.exp(x - mx))
    return F.transform(arr, lambda x: F.exp(x - mx) / total)


def array_sum(arr: Column) -> Column:
    """Σ over array<double> via fold (reference uses the same idiom for
    PIP sums, dataset/study_locus.py:455-461)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def order_array_of_structs_by_field(arr: Column, field: str) -> Column:
    """Sort array<struct> by one numeric field DESC, nulls last
    (reference: common/spark_helpers.py:354-409)."""
    return F.array_sort(
        arr,
        lambda l, r: (
            F.when(l[field].isNull() & r[field].isNull(), 0)
            .when(l[field].isNull(), 1)
            .when(r[field].isNull(), -1)
            .when(l[field] > r[field], -1)
            .when(l[field] < r[field], 1)
            .otherwise(0)
        ).cast("integer"),
    )


def order_array_of_structs_by_two_fields(arr: Column, primary: str, secondary: str) -> Column:
    """Sort array<struct> by primary DESC then secondary DESC, nulls
    last (reference: common/spark_helpers.py:412-448)."""
    def cmp(l: Column, r: Column) -> Column:  # noqa: E741
        return (
            F.when(l[primary].isNull() & r[primary].isNotNull(), 1)
            .when(r[primary].isNull() & l[primary].isNotNull(), -1)
            .when(l[primary] > r[primary], -1)
            .when(l[primary] < r[primary], 1)
            .when(l[secondary].isNull() & r[secondary].isNotNull(), 1)
            .when(r[secondary].isNull() & l[secondary].isNotNull(), -1)
            .when(l[secondary] > r[secondary], -1)
            .when(l[secondary] < r[secondary], 1)
            .otherwise(0)
        ).cast("integer")

    return F.array_sort(arr, cmp)


def cumulative_sum_flags(
    sorted_values: Column, threshold: float
) -> Column:
    """For a DESC-sorted array<double>, flag elements belonging to the
    minimal prefix whose sum exceeds ``threshold``.

    Element i is IN the credible set iff the sum of elements BEFORE it
    (exclusive prefix) is still < threshold — the reference's
    ``index - 1`` slice trick (dataset/study_locus.py:939-967),
    re-expressed with zip_with over an exclusive running sum.

    Returns array<boolean> aligned with the input.
    """
    n = F.size(sorted_values)
    # exclusive prefix sums: prefix[i] = sum(values[0..i-1])
    prefix = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.aggregate(
            F.slice(sorted_values, F.lit(1), i - 1),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.transform(prefix, lambda p: p < F.lit(threshold))


def harmonic_sum(sorted_values: Column, scale: float = 1.0) -> Column:
    """Harmonic sum Σ valueᵢ / (i^2 * scale) over a DESC-sorted array
    (reference: common/spark_helpers.py:853-888)."""
    n = F.size(sorted_values)
    return F.aggregate(
        F.zip_with(
            sorted_values,
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda v, i: v / (i.cast("double") * i.cast("double") * F.lit(scale)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
