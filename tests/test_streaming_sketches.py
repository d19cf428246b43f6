"""Streaming sketch maintenance (round 9): CMS / HLL registers folded
incrementally per micro-batch must equal the batch sketch of the same
corpus after replay — the merge laws (counts add, registers max) are
exactly what Spark's incremental streaming aggregation computes.

Additive layer; the reference (d0choa/genetics_spark_coloc) has no
sketch or streaming surface (SURVEY §2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    return spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.array(
            F.concat(F.lit("hot"), (F.col("id") % 3).cast("string")),
            F.concat(F.lit("t"), F.pmod(F.hash("id"), F.lit(997)).cast("string")),
            F.concat(
                F.lit("t"), F.pmod(F.hash("id", "id"), F.lit(997)).cast("string")
            ),
        ).alias("tokens"),
        F.pmod(F.hash("id"), F.lit(2)).cast("string").alias("lang"),
    )


def _replay(spark, tmp_path, name, build):
    """Write docs as 3 files -> 3 micro-batches -> complete-mode
    memory sink; returns the final snapshot rows."""
    src = str(tmp_path / f"{name}_src")
    _docs(spark).repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(_docs(spark).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    return spark.sql(f"select * from {name}").collect()


def test_streaming_cms_matches_batch_sketch(spark, tmp_path):
    from genetics_spark_coloc_spark.operators.sketches import cms_sketch
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_cms_sketch,
    )

    depth, width = 4, 256
    batch = {
        (r.row, r.bucket): r.cnt
        for r in cms_sketch(
            _docs(spark), F.col("tokens"), depth=depth, width=width
        ).collect()
    }
    got = _replay(
        spark,
        tmp_path,
        "cms_stream",
        lambda s: streaming_cms_sketch(s, F.col("tokens"), depth=depth, width=width),
    )
    stream = {(r.row, r.bucket): r.cnt for r in got}
    assert stream == batch
    # state bound: the register table never exceeds the sketch size
    assert len(stream) <= depth * width


def test_streaming_hll_matches_batch_registers(spark, tmp_path):
    from genetics_spark_coloc_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_hll_registers,
    )

    b = 6
    batch = {
        (r.lang, r.register): r.maxRho
        for r in hll_registers(
            _docs(spark), F.col("tokens"), ["lang"], b=b
        ).collect()
    }
    got = _replay(
        spark,
        tmp_path,
        "hll_stream",
        lambda s: streaming_hll_registers(s, F.col("tokens"), ["lang"], b=b),
    )
    stream = {(r.lang, r.register): r.maxRho for r in got}
    assert stream == batch
    assert len(stream) <= 2 * (1 << b)
    # a register snapshot taken from the stream reads back through the
    # SAME batch estimator — sanity: estimates are within HLL error of
    # the true per-group distinct counts
    snap = spark.createDataFrame(
        [(k[0], k[1], v) for k, v in stream.items()],
        "lang string, register long, maxRho int",
    )
    est = {
        r.lang: r.estDistinct
        for r in hll_estimate(snap, ["lang"], b=b).collect()
    }
    truth = {
        r.lang: r.n
        for r in _docs(spark)
        .select("lang", F.explode("tokens").alias("token"))
        .groupBy("lang")
        .agg(F.countDistinct("token").alias("n"))
        .collect()
    }
    for lang, n in truth.items():
        assert abs(est[lang] - n) / n < 0.35, (lang, est[lang], n)
