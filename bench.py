"""Benchmark harness: runs every contract query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the `noop` sink (full column
evaluation, no write cost). AQE stays on — that is the production
configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from genetics_spark_coloc_spark.contract import QUERIES
from genetics_spark_coloc_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2 if cpus.isdigit() else 64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first timed query isn't charged
    # session startup cost
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    # spawn the Python/Arrow worker pool once so the first pandas-UDF
    # query isn't charged executor-python startup
    spark.range(32).repartition(32).toDF("a").groupBy("a").applyInPandas(
        lambda pdf: pdf, "a long"
    ).count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "contract_query_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
