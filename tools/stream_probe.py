"""Streaming throughput probe: push N synthetic documents through the
stateful LSH near-dup stream (bucket_pair_stream over MinHash bands)
and through the stateless decontaminator, reporting end-to-end
docs/sec including micro-batch scheduling — the number a capacity
plan for a continuous ingest pipeline actually needs.

Prints one JSON line per probe: {probe, docs, sec, docs_per_sec,
pairs|flagged}.

Usage: python tools/stream_probe.py [docs_thousands]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from genetics_spark_coloc_spark.session import get_session


def main() -> None:
    n_docs = int(float(sys.argv[1]) * 1000) if len(sys.argv) > 1 else 100_000
    spark = get_session(
        app_name="stream_probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_decontaminate,
        streaming_near_dup_pairs,
    )

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.lit(" shared body fragment "),
            (F.col("id") % (n_docs // 20)).cast("string"),
            F.lit(" tail "),
            F.md5((F.col("id") * 13).cast("string")),
        ).alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="stream_probe_")
    src = os.path.join(tmp, "docs")
    # 8 files => 8 micro-batches with maxFilesPerTrigger=1: the probe
    # pays real per-trigger scheduling, not one giant batch
    docs.repartition(8).write.mode("overwrite").parquet(src)

    def run(name, build, count_sql, files_per_trigger=1):
        reader = spark.readStream.schema("doc_id long, text string")
        if files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", files_per_trigger)
        stream = reader.parquet(src)
        t0 = time.perf_counter()
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(f"probe_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        sec = round(time.perf_counter() - t0, 2)
        out_n = spark.sql(count_sql.format(t=f"probe_{name}")).collect()[0][0]
        print(
            json.dumps(
                {
                    "probe": name,
                    "docs": n_docs,
                    "sec": sec,
                    "docs_per_sec": int(n_docs / sec),
                    "output_rows": out_n,
                }
            ),
            flush=True,
        )

    run(
        "streaming_lsh_near_dup_8_triggers",
        lambda s: streaming_near_dup_pairs(s, "text", "doc_id"),
        "select count(*) from {t}",
    )
    run(
        "streaming_lsh_near_dup_1_trigger",
        lambda s: streaming_near_dup_pairs(s, "text", "doc_id"),
        "select count(*) from {t}",
        files_per_trigger=None,
    )
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    run(
        "streaming_decontaminate",
        lambda s: streaming_decontaminate(
            s.filter(F.col("doc_id") % 97 != 0), eval_df, n=5
        ),
        "select count(*) from {t} where isContaminated",
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()


def sketch_stream_probes(n_docs: int = 500_000) -> None:
    """Round-9 probe: streaming sketch maintenance throughput — CMS /
    HLL as bounded-state streaming aggregations and KMV through the
    stateful top-k — replayed over 8 micro-batches. The claim under
    test at volume: state (and therefore per-trigger commit cost)
    stays at sketch size while docs/sec stays ingest-bound.
    Run via: python -c "import tools.stream_probe as sp; sp.sketch_stream_probes()"
    """
    spark = get_session(
        app_name="stream_sketch_probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_cms_sketch,
        streaming_hll_registers,
        streaming_kmv_sketch,
    )

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array(
            *[
                F.concat(
                    F.lit("t"),
                    F.pmod(F.hash(F.col("id"), F.lit(i)), F.lit(200_000)).cast(
                        "string"
                    ),
                )
                for i in range(10)
            ]
        ).alias("tokens"),
        F.pmod(F.hash("id"), F.lit(4)).cast("string").alias("lang"),
    )
    tmp = tempfile.mkdtemp(prefix="stream_sketch_")
    src = os.path.join(tmp, "docs")
    docs.repartition(8).write.mode("overwrite").parquet(src)
    schema = docs.schema

    def run(name, build, mode):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(f"sp_{name}")
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        sec = round(time.perf_counter() - t0, 2)
        out_n = spark.sql(f"select count(*) from sp_{name}").collect()[0][0]
        state_rows = None
        for pr in reversed(q.recentProgress):
            if pr.get("stateOperators"):
                state_rows = pr["stateOperators"][0]["numRowsTotal"]
                break
        print(
            json.dumps(
                {
                    "probe": f"streaming_{name}_8_triggers",
                    "docs": n_docs,
                    "tokens": n_docs * 10,
                    "sec": sec,
                    "docs_per_sec": int(n_docs / sec),
                    "output_rows": out_n,
                    "state_rows": state_rows,
                }
            ),
            flush=True,
        )

    run("cms", lambda s: streaming_cms_sketch(s, F.col("tokens"), depth=4, width=1024), "complete")
    run("hll", lambda s: streaming_hll_registers(s, F.col("tokens"), ["lang"], b=10), "complete")
    run("kmv", lambda s: streaming_kmv_sketch(s, F.col("tokens"), "lang", k=256), "update")
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def delta_index_stream_probe(n_index: int = 2_000_000, n_stream: int = 100_000) -> None:
    """Round-10 probe: STATELESS streaming incremental dedup
    (streaming_delta_lsh_candidates — stream-static join against the
    persisted bucketed band index) vs the stateful bucket-state LSH.
    The stateless path has no state store to shuffle per trigger, so
    its per-trigger tax should be the micro-batch banding plus a
    bucket-local join only.
    Run via: python -c "import tools.stream_probe as sp; sp.delta_index_stream_probe()"
    """
    spark = get_session(
        app_name="delta_index_stream_probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from genetics_spark_coloc_spark.steps import run_step
    from genetics_spark_coloc_spark.operators.dedup import load_lsh_band_index
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_delta_lsh_candidates,
    )

    def corpus(n, salt):
        dup_body = F.concat(
            F.md5(F.concat(F.lit("dup"), (F.col("id") % 10_000).cast("string"))),
            F.md5(F.concat(F.lit("dup2"), (F.col("id") % 10_000).cast("string"))),
        )
        normal = F.concat(
            F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))),
            F.lit(" "),
            F.md5((F.col("id") * 13).cast("string")),
        )
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 200 == 0, dup_body).otherwise(normal).alias("text"),
        )

    tmp = tempfile.mkdtemp(prefix="delta_stream_probe_")
    idx_path = os.path.join(tmp, "index.parquet")
    corpus(n_index, "i").write.mode("overwrite").parquet(idx_path)
    spark.sql("DROP TABLE IF EXISTS band_index_stream_probe")
    run_step(
        spark,
        "lsh_band_index",
        {"corpus": idx_path},
        "band_index_stream_probe",
        params={"num_buckets": 64},
    )
    persisted = load_lsh_band_index(
        spark, "band_index_stream_probe", hot_bucket_ceiling=10_000
    )
    src = os.path.join(tmp, "stream")
    corpus(n_stream, "d").repartition(8).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    q = (
        streaming_delta_lsh_candidates(stream, persisted)
        .writeStream.format("memory")
        .queryName("delta_idx_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    sec = round(time.perf_counter() - t0, 2)
    n_out = spark.sql("select count(*) from delta_idx_probe").collect()[0][0]
    print(
        json.dumps(
            {
                "probe": "streaming_delta_vs_2m_index_8_triggers",
                "index_docs": n_index,
                "stream_docs": n_stream,
                "sec": sec,
                "stream_docs_per_sec": int(n_stream / sec),
                "emitted_rows": n_out,
            }
        ),
        flush=True,
    )
    spark.sql("DROP TABLE IF EXISTS band_index_stream_probe")
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def drift_gate_stream_probe(n_docs: int = 2_000_000, n_triggers: int = 8) -> None:
    """Round-11 probe: the streaming drift gate's throughput. State is
    one <=n_bins-row bin table and the per-trigger gate is a
    sketch-vs-sketch join, so throughput should track raw scan+bin
    speed, independent of corpus history.
    Run via: python -c "import tools.stream_probe as sp; sp.drift_gate_stream_probe()"
    """
    spark = get_session(
        app_name="drift_gate_stream_probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from genetics_spark_coloc_spark.operators.sketches import (
        grid_quantile_sketch,
    )
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_drift_gate,
    )

    tmp = tempfile.mkdtemp(prefix="drift_gate_probe_")
    base = spark.range(n_docs).select(
        (F.pmod(F.hash("id"), F.lit(1000)).cast("double")).alias("v")
    )
    shifted = spark.range(n_docs).select(
        (F.pmod(F.hash("id", "id"), F.lit(1000)).cast("double") + 300).alias("v")
    )
    ref_path = os.path.join(tmp, "ref_sketch.parquet")
    grid_quantile_sketch(base, F.col("v"), [], 0.0, 1500.0, 64).write.mode(
        "overwrite"
    ).parquet(ref_path)
    src = os.path.join(tmp, "stream")
    shifted.repartition(n_triggers).write.mode("overwrite").parquet(src)
    alerts = []
    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    q = (
        streaming_drift_gate(
            stream,
            F.col("v"),
            ref_path,
            0.0,
            1500.0,
            64,
            on_alert=lambda _b, e, row: alerts.append((e, row["psi"], row["driftAlert"])),
        )
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    sec = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "probe": f"drift_gate_stream_{n_docs // 1_000_000}m_docs",
                "rows": n_docs,
                "sec": sec,
                "docs_per_sec": int(n_docs / sec),
                "triggers": len(alerts),
                "final_psi": alerts[-1][1] if alerts else None,
                "alerted": bool(alerts and alerts[-1][2]),
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def line_scrub_stream_probe(n_docs: int = 1_000_000, n_triggers: int = 8) -> None:
    """Round-11 probe: streaming C4 line scrub throughput. The
    frequency table is at-rest corpus evidence (here built from a 2M
    doc reference corpus), each trigger is one posexplode + hash join
    + per-doc rebuild — cost should track batch line_dedup on the
    same volume, with zero state.
    Run via: python -c "import tools.stream_probe as sp; sp.line_scrub_stream_probe()"
    """
    spark = get_session(
        app_name="line_scrub_stream_probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from genetics_spark_coloc_spark.operators.text import line_frequency_table
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_line_dedup,
    )

    tmp = tempfile.mkdtemp(prefix="line_scrub_probe_")
    banner = F.concat(
        F.lit("subscribe to our newsletter variant "),
        (F.col("id") % 100).cast("string"),
    )
    uniq = lambda salt: F.md5(  # noqa: E731
        F.concat(F.lit(salt), F.col("id").cast("string"))
    )
    corpus = spark.range(2_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n", uniq("a"), banner, uniq("b")).alias("text"),
    )
    freq_path = os.path.join(tmp, "line_freq.parquet")
    line_frequency_table(corpus, "text", sep="\n").write.mode(
        "overwrite"
    ).parquet(freq_path)

    delta = spark.range(n_docs).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat_ws("\n", uniq("d1"), banner, uniq("d2")).alias("text"),
    )
    src = os.path.join(tmp, "stream")
    delta.repartition(n_triggers).write.mode("overwrite").parquet(src)

    totals = {"docs": 0, "dropped": 0, "triggers": 0}

    def on_batch(cleaned, epoch_id):
        row = cleaned.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("nDropped").alias("d")
        ).collect()[0]
        totals["docs"] += row["n"]
        totals["dropped"] += row["d"]
        totals["triggers"] += 1

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    q = (
        streaming_line_dedup(stream, freq_path, on_batch, sep="\n")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    sec = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "probe": f"line_scrub_stream_{n_docs // 1_000_000}m_docs",
                "rows": n_docs,
                "sec": sec,
                "docs_per_sec": int(n_docs / sec),
                "triggers": totals["triggers"],
                "docs_seen": totals["docs"],
                "dropped": totals["dropped"],
            }
        ),
        flush=True,
    )
    spark.stop()
