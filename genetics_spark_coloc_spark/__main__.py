"""CLI entry point: ``python -m genetics_spark_coloc_spark``.

Mirrors the reference's ``gentropy step=<name> step.param=...`` hydra
CLI (reference: src/gentropy/cli.py:13-22) with plain argparse:

    python -m genetics_spark_coloc_spark list
    python -m genetics_spark_coloc_spark describe window_based_clumping
    python -m genetics_spark_coloc_spark run window_based_clumping \
        --in summary_statistics=/data/ss.parquet \
        --out /data/leads.parquet --param distance=250000
"""

from __future__ import annotations

import argparse
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
    p_run.add_argument("step", choices=sorted(STEPS))
    p_run.add_argument(
        "--in", dest="inputs", action="append", default=[], metavar="KEY=PATH",
        help="input path, repeatable (e.g. summary_statistics=/x.parquet)",
    )
    p_run.add_argument("--out", dest="output", default=None, help="output path")
    p_run.add_argument(
        "--param", dest="params", action="append", default=[], metavar="KEY=VALUE",
        help="step parameter override, repeatable",
    )
    p_run.add_argument("--master", default="local[*]", help="Spark master")
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

    spec = STEPS[args.step]
    inputs = _kv(args.inputs, "--in")
    raw_params = _kv(args.params, "--param")
    params = {k: coerce_param(spec, k, v) for k, v in raw_params.items()}

    from genetics_spark_coloc_spark.session import get_session

    kwargs = {"app_name": f"step:{args.step}", "master": args.master}
    if args.shuffle_partitions is not None:
        kwargs["shuffle_partitions"] = args.shuffle_partitions
    spark = get_session(**kwargs)
    df = run_step(spark, args.step, inputs, args.output, params)
    if df is not None:
        print(f"step {args.step}: wrote {args.output}")
    else:
        print(f"step {args.step}: done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
