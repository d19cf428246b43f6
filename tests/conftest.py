"""Shared session-scoped SparkSession for all tests."""

from __future__ import annotations

import pytest

from genetics_spark_coloc_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    session = get_session(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield session
