"""Skew-mitigation helpers: salted two-phase aggregation.

AQE's skew handling splits oversized SHUFFLE JOIN partitions, but a
skewed groupBy key still lands every row of the hot key on one
reducer. Salting fixes that for algebraic aggregates: phase 1
aggregates on (key, salt) — spreading the hot key over
``num_salts`` reducers — and phase 2 combines the partials on the
key alone, now touching at most ``num_salts`` rows per key.

Results are EXACTLY equal to the unsalted aggregation for
associative-commutative aggregates (sum/count/min/max); float sums
differ only in addition order (same class of difference as any
repartitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (phase-1 aggregate, phase-2 combiner) per supported aggregate
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 32,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-phase salted groupBy.

    ``aggs`` maps output column name -> (aggregate, input column),
    aggregate in {sum, count, min, max}; e.g.
    ``{"revenue": ("sum", "price"), "n": ("count", "*")}``.

    ``salt_col`` defaults to a salt derived purely from row CONTENT
    (``pmod(hash(all columns), num_salts)``): the same row hashes to
    the same salt on any partition layout, so a partial stage retry
    after a fetch failure re-routes every row to the same reducer it
    originally went to — no duplication or loss, unlike ``rand()`` or
    ``monotonically_increasing_id()`` salting. Exact-duplicate rows
    co-locate in one salt bucket (correct, just less spread if the
    hot key is dominated by fully identical rows). Pass ``salt_col``
    with a deterministic content-derived expression only.
    """
    unknown = {a for a, _ in aggs.values()} - set(_COMBINERS)
    if unknown:
        raise ValueError(f"unsupported aggregates: {sorted(unknown)}")
    salt = (
        salt_col
        if salt_col is not None
        else F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    )
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt")
    partials = phase1.agg(
        *[
            _COMBINERS[a][0](F.lit(1) if c == "*" else F.col(c)).alias(f"_p_{out}")
            for out, (a, c) in aggs.items()
        ]
    )
    phase2 = partials.groupBy(*keys).agg(
        *[
            _COMBINERS[a][1](F.col(f"_p_{out}")).alias(out)
            for out, (a, _c) in aggs.items()
        ]
    )
    return phase2


def spread_for_compute(df: DataFrame, *cols: str) -> DataFrame:
    """Restore task parallelism ahead of a compute-expensive per-row
    kernel (Levenshtein DP, per-pair set intersection, per-pair
    vector math).

    AQE sizes post-shuffle partitions by BYTES
    (advisoryPartitionSizeInBytes), which is right for I/O- and
    shuffle-bound stages but wrong when the stage's cost per row
    dwarfs its bytes: a candidate-pair table of a few hundred KB
    coalesces to ONE partition and the kernel runs single-threaded
    while the rest of the cluster idles (measured: the
    edit-distance verifiers' 11.7k-pair kernel stage ran as one
    task for ~13 s on local[32]).

    This hash-repartitions on ``xxhash64(cols)`` (deterministic —
    safe under task retry, unlike rand/round-robin ordering concerns)
    to the session's CONFIGURED ``spark.sql.shuffle.partitions``,
    which AQE does not re-coalesce (user-specified repartitions with
    an explicit partition count are preserved). The setting is the
    deployment's declared parallelism target, so the spread scales
    with the cluster instead of a local constant. Cost: one exchange
    of the (narrow — call it BEFORE attaching payload columns) rows;
    at large scale, where AQE already yields good parallelism by
    bytes, that one narrow exchange is noise relative to the kernel
    it feeds.

    The ``xxhash64`` wrapper is LOAD-BEARING, not decoration (r14,
    found by re-measuring the r14 spread fix): candidate-pair
    generators typically END with a distinct/groupBy on exactly the
    same key columns, so ``repartition(n, *cols)`` produces a
    partitioning IDENTICAL to the child's ENSURE_REQUIREMENTS
    exchange and the optimizer removes it as redundant — leaving
    only the coalescible exchange, which AQE folds back to one
    task and silently re-serializes the kernel (plan-verified:
    the banded verifier's pair exchange read ENSURE_REQUIREMENTS,
    and its 11.7k-pair kernel stage cost ~12 core-seconds but ~13 s
    of wall). Hashing the keys makes the partitioning expression
    distinct from any natural grouping key, so the user repartition
    survives as REPARTITION_BY_NUM.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if not cols:
        return df.repartition(n)
    return df.repartition(n, F.xxhash64(*[F.col(c) for c in cols]))
