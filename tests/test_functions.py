"""Tests for the functions layer: p-value algebra, array math, reshape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.arrays import (
    cumulative_sum_flags,
    harmonic_sum,
    logsumexp,
    order_array_of_structs_by_field,
    softmax,
)
from genetics_spark_coloc_spark.functions.pvalue import (
    neglog_pvalue,
    pvalue_pair_lte,
    split_pvalue,
    split_pvalue_column,
    zscore_from_pvalue,
)
from genetics_spark_coloc_spark.functions.reshape import (
    get_record_with_maximum_value,
    melt,
    pivot_first,
)


def test_split_pvalue():
    assert split_pvalue(5e-8) == (5.0, -8)
    assert split_pvalue(0.5) == (5.0, -1)
    assert split_pvalue(1.0) == (1.0, 0)
    with pytest.raises(ValueError):
        split_pvalue(0.0)


def test_split_pvalue_column(spark):
    df = spark.createDataFrame([(5e-8,), (0.5,), (1e-300,)], ["p"])
    m, e = split_pvalue_column(F.col("p"))
    rows = df.select(m.alias("m"), e.alias("e")).collect()
    assert (rows[0]["m"], rows[0]["e"]) == (5.0, -8)
    assert (rows[1]["m"], rows[1]["e"]) == (5.0, -1)
    assert (rows[2]["m"], rows[2]["e"]) == (1.0, -300)


def test_pvalue_pair_lte(spark):
    df = spark.createDataFrame(
        [(5.0, -8), (6.0, -8), (1.0, -7), (9.9, -9), (1.0, -320)],
        ["m", "e"],
    )
    out = df.select(pvalue_pair_lte(F.col("m"), F.col("e"), 5e-8).alias("sig")).collect()
    assert [r["sig"] for r in out] == [True, False, False, True, True]


def test_neglog_pvalue(spark):
    df = spark.createDataFrame([(5.0, -8)], ["m", "e"])
    val = df.select(neglog_pvalue(F.col("m"), F.col("e")).alias("nl")).collect()[0]["nl"]
    assert val == pytest.approx(-math.log10(5e-8))


def test_zscore_from_pvalue(spark):
    # norm.ppf golden values (scipy): p=0.05 -> 1.959964, p=1e-10 -> 6.4667
    df = spark.createDataFrame([(5.0, -2, 1.0), (1.0, -10, -1.0)], ["m", "e", "beta"])
    out = df.select(
        zscore_from_pvalue(F.col("m"), F.col("e"), F.col("beta")).alias("z")
    ).collect()
    assert out[0]["z"] == pytest.approx(1.959963985, abs=1e-6)
    assert out[1]["z"] == pytest.approx(-6.466951, abs=1e-4)


def test_logsumexp_matches_numpy(spark):
    import numpy as np

    vals = [0.2, 0.1, 0.05, 0.0]
    df = spark.createDataFrame([(vals,)], ["arr"])
    got = df.select(logsumexp(F.col("arr")).alias("ls")).collect()[0]["ls"]
    expected = np.log(np.sum(np.exp(np.array(vals))))
    assert got == pytest.approx(expected, rel=1e-12)


def test_softmax_golden(spark):
    # reference example (colocalisation.py:231-234): posteriors of
    # [0.2, 0.1, 0.05, 0] are [0.279, 0.2524, 0.2401, 0.2284]
    df = spark.createDataFrame([([0.2, 0.1, 0.05, 0.0],)], ["arr"])
    got = df.select(softmax(F.col("arr")).alias("sm")).collect()[0]["sm"]
    for g, e in zip(got, [0.279, 0.2524, 0.2401, 0.2284]):
        assert g == pytest.approx(e, abs=1e-4)
    assert sum(got) == pytest.approx(1.0)


def test_order_array_of_structs_by_field(spark):
    df = spark.createDataFrame(
        [([{"v": 0.1, "id": "a"}, {"v": None, "id": "b"}, {"v": 0.5, "id": "c"}],)],
        "arr: array<struct<v: double, id: string>>",
    )
    got = df.select(order_array_of_structs_by_field(F.col("arr"), "v").alias("s")).collect()[0]["s"]
    assert [x["id"] for x in got] == ["c", "a", "b"]  # desc, nulls last


def test_cumulative_sum_flags(spark):
    # sorted desc: [0.6, 0.3, 0.05, 0.05]; 95% set = first 3 (exclusive
    # prefix 0, 0.6, 0.9 < 0.95; fourth has prefix 0.95 -> out)
    df = spark.createDataFrame([([0.6, 0.3, 0.05, 0.05],)], ["arr"])
    got = df.select(cumulative_sum_flags(F.col("arr"), 0.95).alias("f")).collect()[0]["f"]
    assert got == [True, True, True, False]


def test_harmonic_sum(spark):
    df = spark.createDataFrame([([1.0, 1.0, 1.0],)], ["arr"])
    got = df.select(harmonic_sum(F.col("arr")).alias("h")).collect()[0]["h"]
    assert got == pytest.approx(1.0 + 1.0 / 4 + 1.0 / 9)


def test_melt_pivot_roundtrip(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0), (2, 30.0, 40.0)], ["id", "a", "b"])
    long = melt(df, ["id"], ["a", "b"])
    assert long.count() == 4
    wide = pivot_first(long, ["id"], "variable", "value", ["a", "b"])
    rows = {r["id"]: (r["a"], r["b"]) for r in wide.collect()}
    assert rows == {1: (10.0, 20.0), 2: (30.0, 40.0)}


def test_get_record_with_maximum_value(spark):
    df = spark.createDataFrame(
        [("g1", 1.0, "x"), ("g1", 5.0, "y"), ("g2", 2.0, "z")], ["g", "v", "tag"]
    )
    rows = {r["g"]: r["tag"] for r in get_record_with_maximum_value(df, ["g"], "v").collect()}
    assert rows == {"g1": "y", "g2": "z"}
