"""Merged driver-contract registry: all query builders + oracles."""

from __future__ import annotations

from genetics_spark_coloc_spark.queries import ORACLES as _BASE_ORACLES
from genetics_spark_coloc_spark.queries import QUERIES as _BASE_QUERIES
from genetics_spark_coloc_spark.queries_annot import ANNOT_ORACLES, ANNOT_QUERIES
from genetics_spark_coloc_spark.queries_extra import EXTRA_ORACLES, EXTRA_QUERIES
from genetics_spark_coloc_spark.queries_ld import LD_ORACLES, LD_QUERIES
from genetics_spark_coloc_spark.queries_impute import IMPUTE_ORACLES, IMPUTE_QUERIES
from genetics_spark_coloc_spark.queries_ingest import INGEST_ORACLES, INGEST_QUERIES
from genetics_spark_coloc_spark.queries_intervals import (
    INTERVAL_ORACLES,
    INTERVAL_QUERIES,
)
from genetics_spark_coloc_spark.queries_more import MORE_ORACLES, MORE_QUERIES
from genetics_spark_coloc_spark.queries_neardup import NEARDUP_ORACLES, NEARDUP_QUERIES
from genetics_spark_coloc_spark.queries_scale import SCALE_ORACLES, SCALE_QUERIES
from genetics_spark_coloc_spark.queries_study import STUDY_ORACLES, STUDY_QUERIES

QUERIES = {
    **_BASE_QUERIES,
    **LD_QUERIES,
    **EXTRA_QUERIES,
    **ANNOT_QUERIES,
    **NEARDUP_QUERIES,
    **IMPUTE_QUERIES,
    **MORE_QUERIES,
    **SCALE_QUERIES,
    **STUDY_QUERIES,
    **INGEST_QUERIES,
    **INTERVAL_QUERIES,
}
ORACLES = {
    **_BASE_ORACLES,
    **LD_ORACLES,
    **EXTRA_ORACLES,
    **ANNOT_ORACLES,
    **NEARDUP_ORACLES,
    **IMPUTE_ORACLES,
    **MORE_ORACLES,
    **SCALE_ORACLES,
    **STUDY_ORACLES,
    **INGEST_ORACLES,
    **INTERVAL_ORACLES,
}
