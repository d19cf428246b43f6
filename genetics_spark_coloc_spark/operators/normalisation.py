"""Numeric normalisation + coordinate liftover.

- ``normalise_column``: 0-1 min-max scaling. The reference does this
  with a pyspark.ml VectorAssembler+MinMaxScaler pipeline
  (common/spark_helpers.py:215-253) — two ML stages and a vector
  round-trip for what is one aggregate + one broadcast join; this
  version is a plain expression, deterministic and codegen-friendly.
- ``liftover_coordinates``: GRCh37↔38 conversion via pyliftover
  inside a pandas UDF (reference: common/Liftover.py:62-131). The
  library is not installed in this environment, so the operator is
  gated behind an import-try with the Spark plumbing intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalise_column(
    df: DataFrame, input_col_name: str, output_col_name: str, decimals: int = 2
) -> DataFrame:
    """Min-max scale a column to [0,1]
    (reference: spark_helpers.py:215-253, same 2dp rounding).

    Global min/max via one aggregate broadcast-joined back — no ML
    pipeline, no vector columns.
    """
    stats = df.agg(
        F.min(input_col_name).alias("_min"), F.max(input_col_name).alias("_max")
    )
    scaled = F.when(
        F.col("_max") != F.col("_min"),
        (F.col(input_col_name) - F.col("_min")) / (F.col("_max") - F.col("_min")),
    ).otherwise(F.lit(0.0))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(output_col_name, F.round(scaled, decimals))
        .drop("_min", "_max")
    )


def liftover_coordinates(
    df: DataFrame,
    chain_file: str,
    chrom_col: str = "chromosome",
    pos_col: str = "position",
    out_prefix: str = "mapped_",
) -> DataFrame:
    """Lift genomic coordinates across assemblies with pyliftover
    (pandas UDF, Arrow-batched).

    Raises NotImplementedError when pyliftover is unavailable (this
    container); the UDF shape and output schema are the real design.
    """
    try:
        from pyliftover import LiftOver  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "pyliftover is not installed in this environment; "
            "liftover_coordinates requires it (pip install pyliftover "
            "on a real cluster)"
        ) from exc

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<chrom: string, pos: long>")
    def lift(chroms: pd.Series, positions: pd.Series) -> pd.DataFrame:
        lo = LiftOver(chain_file)
        out_c, out_p = [], []
        for c, p in zip(chroms, positions):
            hits = lo.convert_coordinate(f"chr{c}", int(p))
            if hits:
                out_c.append(hits[0][0].removeprefix("chr"))
                out_p.append(hits[0][1])
            else:
                out_c.append(None)
                out_p.append(None)
        return pd.DataFrame({"chrom": out_c, "pos": out_p})

    lifted = lift(F.col(chrom_col), F.col(pos_col))
    return df.withColumn(f"{out_prefix}chromosome", lifted["chrom"]).withColumn(
        f"{out_prefix}position", lifted["pos"]
    )


def write_partitioned_by_chromosome(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Chromosome-partitioned parquet layout (reference processes
    per-chromosome, common/per_chromosome.py:14-110): readers filtering
    on chromosome prune entire directories instead of scanning."""
    df.write.mode(mode).partitionBy("chromosome").parquet(path)
