"""Physical-plan inspection helpers — the engine's scale guardrails.

The optimizer strategy is "declare everything, let Catalyst plan it"
(SURVEY §4: the reference builds no optimizer either). These helpers
make plan QUALITY testable so regressions that would hurt at 100 TB
(lost pushdown, Python round-trips, nested-loop joins) fail CI
instead of surfacing on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted executed plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_python_eval(df: DataFrame) -> bool:
    """True if the plan routes rows through Python workers
    (BatchEvalPython = row-at-a-time UDF; ArrowEvalPython = pandas
    UDF). The genetics operators must keep this False; only the
    applyInPandas kernels may show FlatMapGroupsInPandas."""
    plan = physical_plan(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains a cartesian or broadcast nested-loop
    join — the O(n·m) shapes binned range joins are meant to avoid."""
    plan = physical_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    import re

    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — verifies column pruning reached the scan."""
    import re

    plan = physical_plan(df)
    return re.findall(r"ReadSchema: ([^\n,]*struct<[^\n]*)", plan)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the plan (each is a full shuffle)."""
    return physical_plan(df).count("Exchange")


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of WindowExec nodes with an EMPTY partition spec — the
    shape that forces every row onto one partition ('No Partition
    Defined' warning). In the plan text a Window node prints
    ``Window [funcs], [partitionSpec], [orderSpec]`` with empty specs
    OMITTED — so two bracket groups can mean EITHER an unpartitioned
    ordered window (second group is an order spec, its entries carry
    ASC/DESC) or a partition-only aggregate window (no ordering —
    fine). Only the former is counted.
    """
    import re

    count = 0
    for line in physical_plan(df).splitlines():
        stripped = line.lstrip(" +-*:")
        if not stripped.startswith("Window ["):
            continue
        body = stripped[len("Window "):]
        depth = 0
        groups: list[str] = []
        cur: list[str] = []
        for ch in body:
            if ch == "[":
                if depth == 0:
                    cur = []
                else:
                    cur.append(ch)
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                else:
                    cur.append(ch)
            elif depth > 0:
                cur.append(ch)
        if len(groups) >= 3:
            continue  # funcs + partition + order: partitioned
        if len(groups) == 2 and not re.search(r"\b(ASC|DESC)\b", groups[1]):
            continue  # partition-only aggregate window: fine
        count += 1
    return count
