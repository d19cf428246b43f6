"""Structured Streaming variants of the engine's ingest/quality ops.

The reference is pure batch (SURVEY §2.11: zero streaming APIs); this
module is the additive streaming surface for continuous
training-data ingestion: the same declarative transformations applied
to ``readStream`` sources, with event-time watermarks for late data.

All builders return an un-started streaming DataFrame (or a query via
``run_*``) so tests can drive them with in-memory sources/sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators import text


def streaming_quality_scores(events: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-record text quality metrics on a stream — stateless
    projection, identical expressions to the batch operator."""
    t = F.col(text_col)
    return events.select(
        "*",
        text.token_count(t).alias("nTokens"),
        F.round(text.quality_score(t), 6).alias("qualityScore"),
        text.language_id(t).alias("predictedLang"),
    )


def streaming_dedup_exact(
    events: DataFrame, text_col: str, event_time_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup by content hash with a watermark bound.

    ``dropDuplicates`` keyed on the hash + watermark keeps state
    bounded: hashes older than the watermark are evicted — the
    standard pattern for unbounded dedup state.
    """
    return (
        events.withColumn("contentHash", F.md5(F.col(text_col)))
        .withWatermark(event_time_col, watermark)
        .dropDuplicates(["contentHash"])
    )


def streaming_windowed_stats(
    events: DataFrame,
    event_time_col: str,
    value_col: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window aggregation with late-data handling — the
    streaming analogue of the batch per-study QC aggregates."""
    return (
        events.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window))
        .agg(
            F.count(F.lit(1)).alias("nRecords"),
            F.round(F.avg(value_col), 6).alias("meanValue"),
            F.round(F.stddev_samp(value_col), 6).alias("stdValue"),
        )
        .select(
            F.col("window.start").alias("windowStart"),
            F.col("window.end").alias("windowEnd"),
            "nRecords",
            "meanValue",
            "stdValue",
        )
    )
