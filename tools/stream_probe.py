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
