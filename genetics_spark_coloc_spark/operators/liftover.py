"""Genome-build liftover as a broadcast interval join — no native
dependency.

Reference parity: common/Liftover.py:62-131 (LiftOverSpark), which
wraps the C `pyliftover` library in a pandas UDF. That gate meant
the operator never ran in environments without the wheel. This
implementation parses the UCSC chain format directly (a public,
documented format: header `chain score tName tSize tStrand tStart
tEnd qName qSize qStrand qStart qEnd id` followed by `size dt dq`
alignment blocks) into a table of block mappings, broadcasts it, and
converts coordinates with a range join — pure Spark, runs anywhere,
and at 100 TB the chain table is a classic broadcast dim (a few MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHAIN_SCHEMA = (
    "chainIdx long, tChrom string, tStart long, tEnd long, "
    "qChrom string, qStart long, qStrand string, qSize long"
)


def parse_chain_text(text: str) -> list[tuple]:
    """Parse UCSC chain text into per-block target→query mappings.

    Each alignment block of ``size`` bases maps target positions
    [tCur, tCur+size) onto query positions [qCur, qCur+size) (query
    counted from the chromosome end when qStrand is '-').
    ``chainIdx`` is the chain's file order — UCSC chain files are
    sorted by score descending, so lower index = better chain.
    """
    blocks: list[tuple] = []
    t_chrom = q_chrom = q_strand = None
    t_cur = q_cur = q_size = 0
    chain_idx = -1
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if parts[0] == "chain":
            # chain score tName tSize tStrand tStart tEnd
            #       qName qSize qStrand qStart qEnd id
            chain_idx += 1
            t_chrom = parts[2].removeprefix("chr")
            t_cur = int(parts[5])
            q_chrom = parts[7].removeprefix("chr")
            q_size = int(parts[8])
            q_strand = parts[9]
            q_cur = int(parts[10])
            continue
        size = int(parts[0])
        blocks.append(
            (chain_idx, t_chrom, t_cur, t_cur + size, q_chrom, q_cur, q_strand, q_size)
        )
        if len(parts) == 3:
            t_cur += size + int(parts[1])
            q_cur += size + int(parts[2])
    return blocks


def chain_to_df(spark: SparkSession, chain_path: str) -> DataFrame:
    """Load a chain file into the block-mapping table (driver-side
    parse — chain files are megabytes; the result is a broadcast dim)."""
    with open(chain_path) as fh:
        return spark.createDataFrame(parse_chain_text(fh.read()), CHAIN_SCHEMA)


def _prefixed(chain: DataFrame, prefix: str) -> DataFrame:
    return chain.select(
        *[F.col(c).alias(f"{prefix}_{c}") for c in chain.columns]
    )


def _map_position(pos_col: str, prefix: str):
    """Mapped coordinate for a joined (position, block) row."""
    offset = F.col(pos_col) - F.col(f"{prefix}_tStart")
    plus = F.col(f"{prefix}_qStart") + offset
    minus = F.col(f"{prefix}_qSize") - (F.col(f"{prefix}_qStart") + offset) - 1
    return F.when(F.col(f"{prefix}_qStrand") == "+", plus).otherwise(minus)


def liftover_intervals(
    df: DataFrame,
    chain: DataFrame,
    chrom_col: str = "chrom",
    start_col: str = "start",
    end_col: str = "end",
    max_difference: int = 100,
    row_id_col: str | None = None,
) -> DataFrame:
    """Convert ``[start, end]`` intervals to the chain's query build
    (reference convert_intervals, Liftover.py:93-131): both edges are
    lifted independently through the broadcast block table, and
    intervals whose lifted length drifts more than ``max_difference``
    bases are dropped — the same QC the reference applies. Unmapped
    intervals are dropped (inner joins).

    Adds ``mapped_start`` / ``mapped_end``; ``chrom_col`` is replaced
    with the query-build chromosome.

    Real chain files contain OVERLAPPING chains per target region
    (alternative alignments, alt contigs): both edges must match
    blocks of the SAME chain — otherwise the two coordinates come
    from different coordinate systems — and when several chains cover
    an interval, only the best one (lowest chainIdx = highest score,
    matching pyliftover's preference) is kept per input interval.

    Best-chain dedup is keyed on a per-row id, NOT on the input
    columns — two fully identical input rows each survive (one lifted
    output per input row). Pass ``row_id_col`` naming a column that is
    unique per row for fully deterministic behaviour under stage
    retries; when omitted, a ``monotonically_increasing_id`` is
    attached before the joins (correct in normal execution, but a
    mid-shuffle fetch-failure retry could re-id rows).
    """
    from pyspark.sql.window import Window

    s = _prefixed(chain, "s")
    e = _prefixed(chain, "e")
    if row_id_col is None:
        row_id_col = "_liftRowId"
        df = df.withColumn(row_id_col, F.monotonically_increasing_id())
        drop_row_id = True
    else:
        drop_row_id = False
    out = (
        df.join(
            F.broadcast(s),
            on=[
                F.col(chrom_col) == F.col("s_tChrom"),
                F.col(start_col) >= F.col("s_tStart"),
                F.col(start_col) < F.col("s_tEnd"),
            ],
        )
        .withColumn("_mappedA", _map_position(start_col, "s"))
        .withColumn("_qChrom", F.col("s_qChrom"))
        .withColumn("_chainIdx", F.col("s_chainIdx"))
        .drop(*[f"s_{c}" for c in chain.columns])
        .join(
            F.broadcast(e),
            on=[
                F.col("_chainIdx") == F.col("e_chainIdx"),
                F.col(end_col) >= F.col("e_tStart"),
                F.col(end_col) < F.col("e_tEnd"),
            ],
        )
        .withColumn("_mappedB", _map_position(end_col, "e"))
        .drop(*[f"e_{c}" for c in chain.columns])
        # negative-strand chains swap the edge order
        .withColumn("mapped_start", F.least("_mappedA", "_mappedB"))
        .withColumn("mapped_end", F.greatest("_mappedA", "_mappedB"))
        .filter(
            F.abs(
                (F.col("mapped_end") - F.col("mapped_start"))
                - (F.col(end_col) - F.col(start_col))
            )
            <= max_difference
        )
        # best chain per input ROW (keyed on the unique row id, so
        # even fully identical duplicate rows each survive)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(row_id_col).orderBy("_chainIdx", "mapped_start")
            ),
        )
        .filter(F.col("_rk") == 1)
        .withColumn(chrom_col, F.col("_qChrom"))
        .drop("_mappedA", "_mappedB", "_qChrom", "_chainIdx", "_rk")
    )
    if drop_row_id:
        out = out.drop(row_id_col)
    return out
