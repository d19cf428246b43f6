"""Bit-parity of the r14 Arrow gram-window kernel vs the Column form.

`_gram_windows` emits (docId, start, gram) where gram is a chained
xxhash64 over the document's k-token windows. The r14 rewrite moved
the k−1 interpreted zip_with(xxhash64) passes into a vectorized Arrow
kernel built on functions/xxh.py's numpy XXH64 replica; these tests
pin (a) the numpy hashLong against Spark's own xxhash64 on longs and
(b) the whole operator's output against the retained Column reference
(`_gram_windows_column`) — EXACT equality, no rounding: the keys must
be bit-identical or downstream gram joins change."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.xxh import (
    _SEED,
    xxh64_hash_long,
    xxh64_longs2,
)
from genetics_spark_coloc_spark.operators.text import (
    _gram_windows,
    _gram_windows_column,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
    (3, "a b c d e f g h i j k l m n o p"),
    (4, "short text"),  # fewer tokens than k=5
    (5, ""),  # blank -> zero grams
    (6, None),  # null text
    (7, "  spaced   out\ttokens\nnewline mix  seven eight nine ten  "),
    (8, "ONE one One oNe ONE one repeated repeated repeated repeated"),
]


def test_numpy_hashlong_matches_spark(spark):
    vals = [0, 1, -1, 42, 2**63 - 1, -(2**63), 123456789123456789, -987654]
    rows = (
        spark.createDataFrame(
            [(a, b) for a in vals for b in vals], "a long, b long"
        )
        .select(
            "a",
            "b",
            F.xxhash64("a").alias("h1"),
            F.xxhash64("a", "b").alias("h2"),
        )
        .collect()
    )
    for r in rows:
        a = np.uint64(np.int64(r["a"]))
        b = np.uint64(np.int64(r["b"]))
        assert np.int64(xxh64_hash_long(a, _SEED)) == r["h1"]
        assert np.int64(xxh64_longs2(a, b)) == r["h2"]


@pytest.mark.parametrize("k", [1, 2, 5, 20])
@pytest.mark.parametrize("wide", [False, True])
def test_gram_windows_kernel_bit_parity(spark, k, wide):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    new = _gram_windows(df, "text", "doc_id", k, wide).toPandas()
    old = _gram_windows_column(df, "text", "doc_id", k, wide).toPandas()
    key = lambda p: sorted(  # noqa: E731
        (r.docId, r.start, tuple(r.gram) if wide else r.gram)
        for r in p.itertuples(index=False)
    )
    assert len(new) == len(old)
    assert key(new) == key(old)


def test_gram_windows_kernel_string_ids(spark):
    df = spark.createDataFrame(
        [(f"doc-{i}", t) for i, t in DOCS], "doc_id string, text string"
    )
    new = _gram_windows(df, "text", "doc_id", 3, False).toPandas()
    old = _gram_windows_column(df, "text", "doc_id", 3, False).toPandas()
    assert sorted(map(tuple, new.values.tolist())) == sorted(
        map(tuple, old.values.tolist())
    )
