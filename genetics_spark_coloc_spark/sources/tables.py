"""Loaders for the driver's synthetic star-schema tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet file each under a
scale-factor directory.

``events.ts`` has drifted across driver testdata generations:
TIMESTAMP(NANOS) (reads as bigint under ``nanosAsLong``), plain
TIMESTAMP, and TIMESTAMP_NTZ (micros) have all been observed.
``load_table`` canonicalizes every physical type into two derived
columns consumers rely on exclusively:

- ``event_time``: TIMESTAMP truncated to micros (session tz is UTC)
- ``epoch_s``: DOUBLE seconds since epoch — bit-identical to
  DuckDB's ``EPOCH(ts)`` on the same file, so oracle SQL can use
  ``EPOCH(ts)`` regardless of the physical type.

No query should touch raw ``ts`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet carries TIMESTAMP(NANOS); a vanilla session rejects it
    # with PARQUET_TYPE_ILLEGAL unless nanos are surfaced as long. The conf
    # is runtime-settable, so set it here rather than relying on the builder.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            # TIMESTAMP(NANOS) surfaced as nanos-since-epoch long:
            # integer-truncate to micros (exact), then derive both forms.
            micros = F.expr("ts div 1000")
            df = df.withColumn(
                "event_time", F.timestamp_micros(micros.cast("long"))
            ).withColumn("epoch_s", micros.cast("double") / F.lit(1000000.0))
        elif dt in ("timestamp", "timestamp_ntz"):
            # NTZ→TZ cast interprets the wall clock in the session tz
            # (UTC), matching DuckDB's naive-as-UTC EPOCH semantics.
            et = F.col("ts").cast("timestamp")
            df = df.withColumn("event_time", et).withColumn(
                "epoch_s", F.unix_micros(et).cast("double") / F.lit(1000000.0)
            )
        elif dt is not None:
            raise TypeError(f"events.ts: unsupported physical type {dt}")
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
