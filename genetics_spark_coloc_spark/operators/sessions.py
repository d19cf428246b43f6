"""Gap-based sessionization of an event stream.

The reference is pure batch (SURVEY §2.11) — this is part of the
training-data-pipeline extension. Two spellings of the same
semantics:

- ``sessionize``: batch, pure window functions (lag → gap flag →
  running sum = session ordinal). One shuffle on user_id; the
  running sum is partition-local after that. This is the
  oracle-checkable form.
- ``sessionize_stream``: Structured Streaming over the same events
  with ``session_window`` — Spark's native session windows merge
  late-arriving events within the gap under a watermark.

At 100 TB: sessionization is embarrassingly parallel per user; skewed
power-users are the risk. The batch form keeps per-user data as one
sorted run (no collect_list materialisation), so a hot user costs one
partition's sort, not memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Split each user's events into sessions separated by > gap.

    Output: one row per session with ordinal, event count, value sum,
    and duration in seconds.
    """
    dt = dict(events.dtypes).get(ts_col)
    if dt == "bigint":
        # parquet TIMESTAMP(NANOS) read as long: truncate to micros
        # with integer arithmetic (exact), then to fractional seconds
        # — bit-identical to DuckDB's EPOCH(ts) on the same file.
        epoch = (F.expr(f"{ts_col} div 1000")).cast("double") / F.lit(1000000.0)
    elif dt in ("timestamp", "timestamp_ntz"):
        # NTZ→TZ interprets the wall clock in the session tz (UTC).
        epoch = F.unix_micros(F.col(ts_col).cast("timestamp")).cast(
            "double"
        ) / F.lit(1000000.0)
    else:
        # already epoch seconds (double) or another numeric
        epoch = F.col(ts_col).cast("double")
    order = Window.partitionBy("userId").orderBy("epochS")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = events.select(
        F.col(user_col).alias("userId"),
        epoch.alias("epochS"),
        F.col(value_col).alias("value"),
    ).withColumn(
        "isNewSession",
        F.when(
            (F.col("epochS") - F.lag("epochS").over(order)) > F.lit(float(gap_seconds)),
            1,
        )
        .when(F.lag("epochS").over(order).isNull(), 1)
        .otherwise(0),
    )
    with_session = marked.withColumn(
        "sessionOrdinal", F.sum("isNewSession").over(run)
    )
    return (
        with_session.groupBy("userId", "sessionOrdinal")
        .agg(
            F.count(F.lit(1)).alias("nEvents"),
            F.round(F.sum("value"), 6).alias("valueSum"),
            F.round(F.max("epochS") - F.min("epochS"), 6).alias("durationS"),
        )
        .withColumn("sessionOrdinal", F.col("sessionOrdinal").cast("int"))
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization with native session windows.

    ``events`` must be a streaming DataFrame (``spark.readStream``).
    The watermark bounds state: sessions with no event for
    `watermark` past the gap are finalized and emitted.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("session"),
            F.col(user_col).alias("userId"),
        )
        .agg(
            F.count(F.lit(1)).alias("nEvents"),
            F.round(F.sum(value_col), 6).alias("valueSum"),
        )
        .select(
            "userId",
            F.col("session.start").alias("sessionStart"),
            F.col("session.end").alias("sessionEnd"),
            "nEvents",
            "valueSum",
        )
    )
