"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship colocalisation pipeline on
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the LLM-data-pipeline layer, each
paired with a DuckDB oracle over the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from genetics_spark_coloc_spark.contract import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: eCAVIAR colocalisation of overlapping credible
    sets derived from /root/testdata/sf0.001."""
    return QUERIES["ecaviar"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query."""
    return dict(ORACLES)
