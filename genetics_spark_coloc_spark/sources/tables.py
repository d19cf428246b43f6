"""Loaders for the driver's synthetic star-schema tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet file each under a
scale-factor directory.

``events.ts`` is written as parquet TIMESTAMP(NANOS); with the
session's ``nanosAsLong`` conf it arrives as a long. ``load_table``
normalizes it: keeps ``ts`` as nanos-since-epoch (long) and adds
``event_time`` as a proper timestamp truncated to micros.
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
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
