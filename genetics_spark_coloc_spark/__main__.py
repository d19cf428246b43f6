"""CLI entry point: ``python -m genetics_spark_coloc_spark``.

Mirrors the reference's ``gentropy step=<name> step.param=...`` hydra
CLI (reference: src/gentropy/cli.py:13-22) with plain argparse:

    python -m genetics_spark_coloc_spark list
    python -m genetics_spark_coloc_spark describe window_based_clumping
    python -m genetics_spark_coloc_spark run window_based_clumping \
        --in summary_statistics=/data/ss.parquet \
        --out /data/leads.parquet --param distance=250000

Config-file execution (the reference's hydra compose surface,
src/gentropy/config.py:26-787, without the dependency): a JSON file
supplies the step name, input map, output path, params, and Spark
settings; any flag given on the command line overrides the file —
the same defaults-then-overrides layering hydra performs:

    python -m genetics_spark_coloc_spark run --config coloc.json
    python -m genetics_spark_coloc_spark run --config coloc.json \
        --param method=ecaviar --out /data/coloc_ecaviar.parquet

    # coloc.json
    {"step": "colocalisation",
     "inputs": {"credible_sets": "/data/credible_sets.parquet"},
     "output": "/data/coloc.parquet",
     "params": {"method": "coloc"},
     "master": "local[8]", "shuffle_partitions": 16}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from genetics_spark_coloc_spark.steps import STEPS, coerce_param, run_step


def _kv(pairs: list[str], what: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for item in pairs:
        if "=" not in item:
            raise SystemExit(f"{what} must be key=value, got {item!r}")
        k, v = item.split("=", 1)
        out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="genetics_spark_coloc_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered steps")

    p_desc = sub.add_parser("describe", help="show a step's inputs and params")
    p_desc.add_argument("step", choices=sorted(STEPS))

    p_run = sub.add_parser("run", help="run a step")
    p_run.add_argument(
        "step", nargs="?", default=None, choices=sorted(STEPS),
        help="step name (may come from --config instead)",
    )
    p_run.add_argument(
        "--config", default=None, metavar="PATH",
        help="JSON config file: {step, inputs, output, params, master, "
        "shuffle_partitions}; command-line flags override it",
    )
    p_run.add_argument(
        "--in", dest="inputs", action="append", default=[], metavar="KEY=PATH",
        help="input path, repeatable (e.g. summary_statistics=/x.parquet)",
    )
    p_run.add_argument("--out", dest="output", default=None, help="output path")
    p_run.add_argument(
        "--param", dest="params", action="append", default=[], metavar="KEY=VALUE",
        help="step parameter override, repeatable",
    )
    p_run.add_argument("--master", default=None, help="Spark master")
    p_run.add_argument(
        "--shuffle-partitions", type=int, default=None, help="spark.sql.shuffle.partitions"
    )

    args = parser.parse_args(argv)

    if args.cmd == "list":
        width = max(len(n) for n in STEPS)
        for name in sorted(STEPS):
            print(f"{name:<{width}}  {STEPS[name].description.splitlines()[0]}")
        return 0

    if args.cmd == "describe":
        spec = STEPS[args.step]
        print(spec.name)
        print(f"  {spec.description}")
        print(f"  inputs: {', '.join(spec.inputs)}")
        for k, prm in spec.params.items():
            print(f"  --param {k}={prm.default!r} ({prm.type.__name__}) {prm.help}")
        return 0

    cfg: dict = {}
    if args.config:
        with open(args.config, encoding="utf-8") as fh:
            cfg = json.load(fh)
        unknown = set(cfg) - {
            "step", "inputs", "output", "params", "master", "shuffle_partitions"
        }
        if unknown:
            raise SystemExit(f"--config: unknown keys {sorted(unknown)}")

    step = args.step or cfg.get("step")
    if step is None:
        raise SystemExit("run: step name required (positional or in --config)")
    if step not in STEPS:
        raise SystemExit(f"unknown step {step!r}; available: {sorted(STEPS)}")
    spec = STEPS[step]

    # layering: config file first, command-line flags override —
    # per-key for inputs/params, whole-value for output/master
    inputs = {**cfg.get("inputs", {}), **_kv(args.inputs, "--in")}
    params = {}
    for k, v in cfg.get("params", {}).items():
        # JSON already carries typed values; strings still coerce so
        # "250000" and 250000 both work
        params[k] = coerce_param(spec, k, v) if isinstance(v, str) else v
    for k, v in _kv(args.params, "--param").items():
        params[k] = coerce_param(spec, k, v)
    output = args.output if args.output is not None else cfg.get("output")
    master = args.master or cfg.get("master") or "local[*]"
    shuffle = (
        args.shuffle_partitions
        if args.shuffle_partitions is not None
        else cfg.get("shuffle_partitions")
    )

    from genetics_spark_coloc_spark.session import get_session

    kwargs = {"app_name": f"step:{step}", "master": master}
    if shuffle is not None:
        kwargs["shuffle_partitions"] = int(shuffle)
    # the production loop is ONE STEP PER PROCESS (the README
    # quickstart: build index today, append tomorrow), so catalog
    # tables written by one CLI invocation must be visible to the
    # next — persist the catalog in a derby metastore under the
    # working directory (alongside spark-warehouse/) instead of the
    # default in-memory catalog that dies with the session. Spark's
    # datasource bucketing metadata rides the metastore table
    # properties, so bucketed tables keep their no-shuffle join
    # layout across invocations. BUT Derby's metastore lock is
    # single-process and every hive session drops metastore_db/ +
    # derby.log into cwd, so the persistent catalog is enabled ONLY
    # for the invocations that actually use it (StepSpec.needs_catalog
    # — lsh_band_index / bucket_layout always, lsh_pairs only with
    # --param index); every other step keeps the in-memory catalog
    # and can run concurrently. Catalog-using steps must NOT run
    # concurrently in the same working directory (Derby's lock will
    # reject the second); SPARK_GRAFT_CLI_CATALOG=hive|in-memory
    # overrides the choice either way. Library/test sessions keep
    # the in-memory catalog (parallel derby access would lock).
    # needs_catalog sees the params MERGED over the spec defaults
    # (same dict shape run_step hands the runner) — a predicate that
    # consults a defaulted param must not silently mis-scope the
    # metastore just because the user left the param off the CLI
    merged_params = {k: prm.default for k, prm in spec.params.items()}
    merged_params.update(params)
    catalog_impl = os.environ.get("SPARK_GRAFT_CLI_CATALOG") or (
        "hive"
        if spec.needs_catalog is not None and spec.needs_catalog(merged_params)
        else None
    )
    if catalog_impl:
        kwargs["extra_conf"] = {
            "spark.sql.catalogImplementation": catalog_impl
        }
    spark = get_session(**kwargs)
    df = run_step(spark, step, inputs, output, params)
    if df is not None:
        print(f"step {step}: wrote {output}")
    else:
        print(f"step {step}: done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
