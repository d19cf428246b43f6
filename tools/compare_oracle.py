"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column names,
and order-insensitive values (sorted by all columns, rounded).

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from genetics_spark_coloc_spark.session import get_session
from genetics_spark_coloc_spark.sources.tables import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session(app_name="compare_oracle", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} SPARK ERROR: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(spark_pd)}")
            continue
        try:
            duck_pd = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} DUCKDB ERROR: {exc}")
            failures.append(name)
            continue
        a, b = normalize(spark_pd), normalize(duck_pd)
        if len(a) != len(b):
            print(f"{name:24s} ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
            failures.append(name)
        elif list(a.columns) != list(b.columns):
            print(f"{name:24s} COLUMN MISMATCH {list(a.columns)} vs {list(b.columns)}")
            failures.append(name)
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=0, atol=1e-9)
                print(f"{name:24s} OK ({len(a)} rows)")
            except AssertionError as exc:
                print(f"{name:24s} VALUE MISMATCH: {str(exc)[:300]}")
                failures.append(name)
    print("\nFAILED:" if failures else "\nALL MATCH", failures if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
