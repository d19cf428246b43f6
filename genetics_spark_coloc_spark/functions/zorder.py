"""Z-order (Morton) keys and write-time multi-dimensional clustering.

Why this exists at 100 TB: parquet data skipping prunes on per-file
min/max column statistics, which a single-column sort only makes
tight for ONE dimension. Interleaving the bits of several columns
into one Morton key and range-partitioning + sorting on it gives
every interleaved dimension locally-bounded min/max ranges per file,
so predicates on ANY of them prune files — the same device Delta
Lake's OPTIMIZE ZORDER BY and Hudi clustering use, expressed here as
plain Spark: a pure-Column key (whole-stage codegen, no UDF) plus
``repartitionByRange`` + ``sortWithinPartitions``.

The key is exact fixed-point bit math, so it is oracle-checkable in
SQL bit operators term for term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative integer
    columns, ``bits`` bits each, as one BIGINT key. Inputs are
    masked to their low ``bits`` bits first (callers with wider or
    continuous domains quantize with :func:`quantize_fixed` — the
    mask alone wraps rather than clamps). Bit ``b`` of column ``j``
    lands at position ``b * n + (n - 1 - j)``: column 0 is the most
    significant within each interleave group.

    Pure Column arithmetic — ``n * bits`` shift-and-mask terms, all
    inside one codegen stage; no shuffle, no UDF. ``n * bits`` must
    fit a signed 64-bit key (≤ 62).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed 64-bit key")
    mask = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        masked = c.cast("long").bitwiseAND(F.lit(mask))
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(masked, b).bitwiseAND(F.lit(1)),
                b * n + (n - 1 - j),
            )
    return key


def zorder_key_sql(col_exprs: list[str], bits: int = 16) -> str:
    """The SAME key as :func:`zorder_key`, spelled as a DuckDB SQL
    expression (term-for-term independent of the Column build) —
    used by the registry oracle."""
    n = len(col_exprs)
    mask = (1 << bits) - 1
    terms = []
    for j, e in enumerate(col_exprs):
        for b in range(bits):
            pos = b * n + (n - 1 - j)
            terms.append(f"(((({e} & {mask}) >> {b}) & 1) << {pos})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"


def quantize_fixed(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Affine map of ``[lo, hi]`` onto the ``bits``-bit integer grid,
    clamped at both ends (out-of-range values pin to the edge cells
    instead of wrapping). Fixed bounds — not data-derived — so the
    key is stable across runs and partitions; derive lo/hi once from
    domain knowledge or a one-off profile, never per-batch.
    """
    top = (1 << bits) - 1
    scaled = F.floor((c.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(top + 1))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(top)).cast("long")


def zorder_layout(
    df: DataFrame,
    cols: list[Column],
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the Morton key
    of ``cols`` and sort within each partition by it. Downstream
    ``write.parquet`` then emits files whose min/max stats are tight
    in EVERY interleaved dimension. One shuffle (the range exchange,
    with a sampled boundary pass), one local sort, no UDF."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    return (
        keyed.repartitionByRange(num_partitions, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
