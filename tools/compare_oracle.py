"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column names,
and order-insensitive values (sorted by all columns, rounded).

Usage: python tools/compare_oracle.py [sf_dir] [query ...]

With ``--json PATH`` (e.g. ``--json SELFCHECK.json``) a per-query result
artifact is written in the same shape as the driver's CORRECTNESS files:
``{"<query>": {"rows_match": ..., "schema_match": ..., "hash_match": ...,
"spark_rows": N, "oracle_rows": N, "err": null}}``. Queries without an
``oracle_sql()`` entry are recorded as ``err: "no_oracle"`` rows-only checks.

ORACLE DETERMINISM CONTRACT (round-10 memo; see MEMORY.md
"DuckDB recursive CTE flakiness"): DuckDB recursive CTEs that carry
LIST state (e.g. an accepted-leads array) have been observed to
silently mis-execute under DuckDB's threaded execution — wrong rows,
no error. This script runs a single connection, which has been
sufficient for the one legacy recursive oracle (window_clump_greedy),
but NO NEW ``oracle_sql()`` entry should use a recursive CTE: express
iterative algorithms (connected components, ontology closure, greedy
walks) through a closed-form SQL equivalent instead — bounded-depth
geometry arguments (tests/test_lifecycle_e2e.py's <=2-leads clump),
path-doubling unrolled to a fixed depth, or a reduced query whose
fixed point is directly computable. If no closed form exists, omit
the oracle and accept the driver's weaker rows-only check rather
than gamble on list-state recursion.
"""

from __future__ import annotations

import json
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
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_session(app_name="compare_oracle", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    results: dict[str, dict] = {}
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        results[name] = rec
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spark_pd)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} SPARK ERROR: {exc}")
            rec["err"] = f"spark: {str(exc)[:200]}"
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(spark_pd)}")
            rec["err"] = "no_oracle"
            rec["rows_match"] = len(spark_pd) >= 0
            continue
        try:
            duck_pd = con.execute(oracles[name]).df()
            rec["oracle_rows"] = len(duck_pd)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} DUCKDB ERROR: {exc}")
            rec["err"] = f"duckdb: {str(exc)[:200]}"
            failures.append(name)
            continue
        a, b = normalize(spark_pd), normalize(duck_pd)
        rec["rows_match"] = len(a) == len(b)
        rec["schema_match"] = list(a.columns) == list(b.columns)
        if not rec["rows_match"]:
            print(f"{name:24s} ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
            failures.append(name)
        elif not rec["schema_match"]:
            print(f"{name:24s} COLUMN MISMATCH {list(a.columns)} vs {list(b.columns)}")
            failures.append(name)
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=0, atol=1e-9)
                rec["hash_match"] = True
                print(f"{name:24s} OK ({len(a)} rows)")
            except AssertionError as exc:
                print(f"{name:24s} VALUE MISMATCH: {str(exc)[:300]}")
                failures.append(name)
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(results, fh, indent=1)
        n_green = sum(
            1 for r in results.values() if r["hash_match"] and r["err"] is None
        )
        n_rows_only = sum(1 for r in results.values() if r["err"] == "no_oracle")
        print(
            f"\nwrote {json_path}: {n_green} hash-green, {n_rows_only} rows-only,"
            f" {len(failures)} failed, {len(results)} total"
        )
    print("\nFAILED:" if failures else "\nALL MATCH", failures if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
