"""As-of (point-in-time) join — a custom operator Spark lacks as a
built-in (SURVEY notes the reference has none either; this is part of
the training-data/time-series extension layer).

Implementation is the union-and-forward-fill technique, NOT a range
join: tag both sides, union, and per key take the running
``last(payload, ignorenulls=True)`` over (ts, side, tiebreak). One
shuffle on the key, O(n log n) partition-local sort, no O(n·m)
range-predicate join and no per-key collect. This is the shape that
survives 100 TB: the window never materialises more than the frame's
single forward-fill value per row, and skewed keys are still a single
sorted run (AQE handles residual partition skew).

Semantics: for each left row, the right row with the greatest
``ts <= left.ts`` per key (inclusive), ties on ts broken by the
greatest ``tiebreak`` value. Left rows with no prior right row get
nulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Point-in-time join: attach the most recent right-side payload
    at or before each left row's timestamp, per key.

    ``left`` and ``right`` must share ``on`` key columns and the
    ``ts_col``; ``payload_cols`` are taken from ``right`` and appended
    to left rows as ``asof_<name>``.
    """
    tie = (
        F.col(tiebreak_col)
        if tiebreak_col and tiebreak_col in right.columns
        else F.lit(0)
    )
    left_cols = [c for c in left.columns if c not in on and c != ts_col]

    l_tagged = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        tie.cast("long").alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows (side 0) sort before left rows at equal ts ->
    # inclusive "at or before"; __tie orders equal-ts right rows so
    # the greatest tiebreak wins the fill.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return (
        filled.filter(F.col("__side") == 1)
        .drop("__side", "__tie", *[f"__p_{c}" for c in payload_cols])
        .withColumnRenamed("__ts", ts_col)
    )
