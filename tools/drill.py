"""Per-query optimization drill: capture the formatted plan and a
solo best-of-N noop-sink timing for the named registry queries.

Usage:
  python tools/drill.py [--sf DIR] [--plans OUT_DIR] [--suffix _before]
                        [--repeats 3] query [query ...]

Writes ``<plans>/<query><suffix>.txt`` with explain("formatted") and
prints one line per query: ``<query>  best=<sec>  runs=[...]``.
The timing methodology matches bench.py (noop sink, perf_counter,
min over repeats) so numbers are comparable to BENCH_FULL.json's
per-query map taken solo.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genetics_spark_coloc_spark.contract import QUERIES
from genetics_spark_coloc_spark.session import get_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plans", default=None, help="directory for plan files")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="drill",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2 if cpus.isdigit() else 64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.read.parquet(f"{args.sf}/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).toDF("a").groupBy("a").applyInPandas(
        lambda pdf: pdf, "a long"
    ).count()

    for name in args.queries:
        if name not in QUERIES:
            print(f"{name}  UNKNOWN QUERY", flush=True)
            continue
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
        if args.no_time:
            print(f"{name}  plan written", flush=True)
            continue
        runs = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"drill:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}  best={min(runs)}  runs={runs}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
