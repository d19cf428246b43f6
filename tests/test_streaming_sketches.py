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


# ---------------------------------------------------------- KMV sketch
class TestKMV:
    """KMV laws: exact below k, bounded-error estimation above k,
    union-merge, and intersection estimation — the set-operation
    capability HLL lacks (Beyer et al. 2007)."""

    def _sets(self, spark, n, salt=""):
        return spark.range(n).select(
            F.lit("g").alias("g"),
            F.array(F.concat(F.lit(f"k{salt}"), F.col("id").cast("string"))).alias(
                "keys"
            ),
        )

    def test_exact_when_under_k(self, spark):
        from genetics_spark_coloc_spark.operators.sketches import (
            kmv_distinct_estimate,
            kmv_sketch,
        )

        df = self._sets(spark, 40)
        sk = kmv_sketch(df, F.col("keys"), ["g"], k=256)
        assert sk.count() == 40  # sketch IS the distinct set
        est = kmv_distinct_estimate(sk, ["g"], k=256).collect()[0]
        assert est.estDistinct == 40.0

    def test_estimate_within_bound(self, spark):
        from genetics_spark_coloc_spark.operators.sketches import (
            kmv_distinct_estimate,
            kmv_sketch,
        )

        n, k = 20_000, 256
        sk = kmv_sketch(self._sets(spark, n), F.col("keys"), ["g"], k=k)
        assert sk.count() == k
        est = kmv_distinct_estimate(sk, ["g"], k=k).collect()[0].estDistinct
        # standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
        assert abs(est - n) / n < 0.25, est

    def test_merge_law(self, spark):
        """Union of two sketches re-ranked to k smallest == sketch of
        the union corpus."""
        from pyspark.sql.window import Window

        from genetics_spark_coloc_spark.operators.sketches import kmv_sketch

        k = 64
        a = self._sets(spark, 500)
        b = self._sets(spark, 500, salt="x")
        both = a.unionByName(b)
        direct = {
            r.hashValue
            for r in kmv_sketch(both, F.col("keys"), ["g"], k=k).collect()
        }
        ska = kmv_sketch(a, F.col("keys"), ["g"], k=k)
        skb = kmv_sketch(b, F.col("keys"), ["g"], k=k)
        pooled = ska.unionByName(skb).select("g", "hashValue").distinct()
        w = Window.partitionBy("g").orderBy("hashValue")
        merged = {
            r.hashValue
            for r in pooled.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .collect()
        }
        assert merged == direct

    def test_overlap_estimate_tracks_truth(self, spark):
        from genetics_spark_coloc_spark.operators.sketches import (
            kmv_overlap_estimate,
            kmv_sketch,
        )

        # A = 0..4999, B = 2500..7499 -> union 7500, inter 2500,
        # jaccard 1/3
        k = 256
        a_df = spark.range(5000).select(
            F.lit("g").alias("g"),
            F.array(F.concat(F.lit("k"), F.col("id").cast("string"))).alias("keys"),
        )
        b_df = spark.range(2500, 7500).select(
            F.lit("g").alias("g"),
            F.array(F.concat(F.lit("k"), F.col("id").cast("string"))).alias("keys"),
        )
        ska = kmv_sketch(a_df, F.col("keys"), ["g"], k=k)
        skb = kmv_sketch(b_df, F.col("keys"), ["g"], k=k)
        got = kmv_overlap_estimate(ska, skb, k=k).collect()[0]
        assert abs(got.estUnion - 7500) / 7500 < 0.25
        assert abs(got.estJaccard - 1 / 3) < 0.12
        assert abs(got.estIntersection - 2500) / 2500 < 0.35


def test_streaming_kmv_matches_batch_sketch(spark, tmp_path):
    """Replaying the corpus through the stateful streaming KMV (3
    micro-batches) reproduces the batch sketch value for value; the
    max-version emission per group is the live snapshot."""
    from genetics_spark_coloc_spark.operators.sketches import kmv_sketch
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_kmv_sketch,
    )

    k = 32
    batch = {
        (r.lang, r.rank): r.hashValue
        for r in kmv_sketch(_docs(spark), F.col("tokens"), ["lang"], k=k).collect()
    }
    src = str(tmp_path / "kmv_src")
    _docs(spark).repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(_docs(spark).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_kmv_sketch(stream, F.col("tokens"), "lang", k=k)
        .writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    rows = spark.sql("select * from kmv_stream").collect()
    latest_version: dict = {}
    for r in rows:
        latest_version[r.g] = max(latest_version.get(r.g, 0), r.version)
    stream_sk = {
        (r.g, r.rank): r.hashValue
        for r in rows
        if r.version == latest_version[r.g]
    }
    assert stream_sk == batch
    # state bound: each group's snapshot is <= k values
    per_group = {}
    for (g, _), _v in stream_sk.items():
        per_group[g] = per_group.get(g, 0) + 1
    assert all(n <= k for n in per_group.values())


def test_kmv_sketch_plan_has_window_group_limit(spark):
    """Scale pin: the rank<=k filter must rewrite to Partial+Final
    WindowGroupLimit (SPARK-37099), so each map partition ships at
    most k rows per group into the rank exchange — without it the
    shuffle carries the full distinct set and the sketch stops being
    sub-linear."""
    from genetics_spark_coloc_spark.operators.sketches import kmv_sketch
    from genetics_spark_coloc_spark.plans.inspect import physical_plan

    df = spark.range(1000).select(
        F.pmod(F.col("id"), F.lit(4)).cast("string").alias("g"),
        F.array(F.col("id").cast("string")).alias("keys"),
    )
    plan = physical_plan(kmv_sketch(df, F.col("keys"), ["g"], k=16))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan


def test_streaming_kmv_delta_emission_reconstructs_and_shrinks(spark, tmp_path):
    """Delta emission (emit each hash once, when it enters the
    sketch): the k-smallest cut over ALL emitted delta rows per group
    reconstructs the batch sketch exactly, and the total emitted row
    count is strictly below the snapshot mode's on the same replay —
    the sink-volume bound for high-cardinality streams."""
    from genetics_spark_coloc_spark.operators.sketches import kmv_sketch
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_kmv_sketch,
    )

    k = 32
    batch = {
        (r.lang, r.rank): r.hashValue
        for r in kmv_sketch(_docs(spark), F.col("tokens"), ["lang"], k=k).collect()
    }
    src = str(tmp_path / "kmv_delta_src")
    _docs(spark).repartition(3).write.mode("overwrite").parquet(src)

    def replay(mode, name):
        stream = (
            spark.readStream.schema(_docs(spark).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_kmv_sketch(stream, F.col("tokens"), "lang", k=k, emit=mode)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        return spark.sql(f"select * from {name}").collect()

    delta_rows = replay("delta", "kmv_delta_stream")
    snap_rows = replay("snapshot", "kmv_snap_stream")

    # reconstruction: k smallest emitted hashes per group == batch
    per_group: dict = {}
    for r in delta_rows:
        per_group.setdefault(r.g, []).append(r.hashValue)
    rebuilt = {
        (g, i + 1): h
        for g, hs in per_group.items()
        for i, h in enumerate(sorted(set(hs))[:k])
    }
    assert rebuilt == batch
    # measurable reduction (each hash rides the sink once)
    assert len(delta_rows) < len(snap_rows)
    # each (g, hashValue) emitted exactly once in delta mode
    assert len(delta_rows) == len({(r.g, r.hashValue) for r in delta_rows})

    import pytest

    with pytest.raises(ValueError, match="snapshot.*delta"):
        streaming_kmv_sketch(
            spark.readStream.schema(_docs(spark).schema).parquet(src),
            F.col("tokens"),
            "lang",
            k=k,
            emit="bogus",
        )


def test_streaming_grid_sketch_matches_batch(spark, tmp_path):
    """Replay parity for the grid-histogram sketch: streaming bin
    counts after a 3-trigger replay equal the batch sketch bit for
    bit, and state never exceeds n_bins rows."""
    from genetics_spark_coloc_spark.operators.sketches import (
        grid_quantile_sketch,
    )
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_grid_sketch,
    )

    n_bins = 16
    metric = F.size("tokens") + F.length("lang")
    batch = {
        r.bin: r.cnt
        for r in grid_quantile_sketch(
            _docs(spark).select(metric.alias("_v")),
            F.col("_v"), [], 0.0, 10.0, n_bins,
        ).collect()
    }
    got = _replay(
        spark,
        tmp_path,
        "grid_stream",
        lambda s: streaming_grid_sketch(s, metric, 0.0, 10.0, n_bins),
    )
    stream = {r.bin: r.cnt for r in got}
    assert stream == batch
    assert len(stream) <= n_bins


def test_streaming_drift_gate_batch_parity_and_alert(spark, tmp_path):
    """VERDICT r10 #7: the streaming drift gate. A reference grid
    sketch is persisted once; a SHIFTED stream replays through
    streaming_drift_gate (stream-static via foreachBatch over the
    sketch snapshot). Certification: the FINAL trigger's PSI row
    equals the batch distribution_drift_psi of the same raw corpora
    exactly, and the planted shift raises driftAlert; an unshifted
    replay stays quiet."""
    from genetics_spark_coloc_spark.operators.sketches import (
        distribution_drift_psi,
        grid_quantile_sketch,
    )
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_drift_gate,
    )

    n_bins, lo, hi = 16, 0.0, 100.0
    base = spark.range(2000).select((F.col("id") % 40).cast("double").alias("v"))
    shifted = spark.range(2000).select(
        (F.col("id") % 40 + 45).cast("double").alias("v")
    )
    ref_path = str(tmp_path / "ref_sketch.parquet")
    grid_quantile_sketch(base, F.col("v"), [], lo, hi, n_bins).write.mode(
        "overwrite"
    ).parquet(ref_path)

    def run_gate(df, name):
        src = str(tmp_path / f"{name}_src")
        df.repartition(3).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        rows = []
        writer = streaming_drift_gate(
            stream,
            F.col("v"),
            ref_path,
            lo,
            hi,
            n_bins,
            on_alert=lambda _b, epoch, row: rows.append((epoch, row)),
        )
        q = (
            writer.option(
                "checkpointLocation", str(tmp_path / f"{name}_ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        assert rows, "gate never fired"
        return rows[-1][1]  # the full-corpus snapshot's PSI row

    drift_row = run_gate(shifted, "drift_gate_shifted")
    assert drift_row["driftAlert"]
    # batch parity: same psi as the raw-data batch operator
    batch_row = distribution_drift_psi(
        base, shifted, F.col("v"), lo=lo, hi=hi, n_bins=n_bins
    ).collect()[0]
    assert drift_row["psi"] == batch_row["psi"]
    assert drift_row["refTotal"] == batch_row["refTotal"]
    assert drift_row["curTotal"] == batch_row["curTotal"]

    quiet_row = run_gate(base, "drift_gate_quiet")
    assert not quiet_row["driftAlert"]
    assert quiet_row["psi"] == 0.0
