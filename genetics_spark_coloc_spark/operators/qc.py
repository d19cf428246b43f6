"""Summary-statistics P–Z consistency regression.

Reference parity: ``method/sumstat_quality_controls.py`` (PZ check —
the reference regresses the log-p-value implied by beta/se against
the reported one to catch mis-harmonised studies; see
`src/gentropy/method/sumstat_quality_controls.py:92-180`).

Spark-first design: the whole regression is a single groupBy with
``covar_pop``/``var_pop``/``corr`` — one shuffle keyed by studyId,
map-side partial aggregation, no UDF, no driver collect. At 100 TB
this is the textbook scalable shape: per-study sufficient statistics
combine associatively across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.pvalue import zscore_from_pvalue


def pz_regression(sumstats: DataFrame) -> DataFrame:
    """Per-study OLS of z_from_beta (= beta/se) on z_from_p.

    A well-harmonised study has slope ≈ 1 and intercept ≈ 0.

    Input columns: studyId, beta, standardError, pValueMantissa,
    pValueExponent. Output: one row per study with slope, intercept,
    pzCorr, nVariants.
    """
    withz = sumstats.select(
        "studyId",
        zscore_from_pvalue(
            F.col("pValueMantissa"), F.col("pValueExponent"), F.col("beta")
        ).alias("zFromP"),
        (F.col("beta") / F.col("standardError")).alias("zFromBeta"),
    ).filter(F.col("standardError") > 0)
    agg = withz.groupBy("studyId").agg(
        F.covar_pop("zFromP", "zFromBeta").alias("cov"),
        F.var_pop("zFromP").alias("varx"),
        F.avg("zFromP").alias("meanx"),
        F.avg("zFromBeta").alias("meany"),
        F.corr("zFromP", "zFromBeta").alias("pzCorr"),
        F.count(F.lit(1)).alias("nVariants"),
    )
    slope = F.col("cov") / F.col("varx")
    return agg.select(
        "studyId",
        slope.alias("pzSlope"),
        (F.col("meany") - slope * F.col("meanx")).alias("pzIntercept"),
        "pzCorr",
        "nVariants",
    )
