"""Contract queries: z-score imputation + LD-consistency outliers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.imputation import flag_ld_outliers, impute_zscores
from genetics_spark_coloc_spark.sources.tables import load_table


def q_impute_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAISS-style LD-weighted z-score imputation (SURVEY §2.9
    sumstat_imputation, declarative form)."""
    ev = load_table(spark, sf_dir, "events")
    # observed: variants w0..w29 per study; targets w30..w49 unobserved
    observed = (
        ev.select(
            F.concat(F.lit("S"), (F.col("user_id") % 3).cast("string")).alias("studyId"),
            F.concat(F.lit("w"), (F.col("event_id") % 30).cast("string")).alias("variantId"),
            F.lit("1").alias("chromosome"),
            ((F.col("value") - 50.0) / 25.0).alias("z"),
        )
        .groupBy("studyId", "variantId", "chromosome")
        .agg(F.max("z").alias("z"))
    )
    # LD: target w(30+t) correlated with neighbours w((t*3+k) % 30)
    targets = spark.range(20).select(
        F.concat(F.lit("w"), (F.col("id") + 30).cast("string")).alias("variantIdI"),
        F.col("id").alias("t"),
    )
    pairwise = targets.select(
        "variantIdI",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
        "t",
    ).select(
        "variantIdI",
        F.concat(F.lit("w"), ((F.col("t") * 3 + F.col("k")) % 30).cast("string")).alias(
            "variantIdJ"
        ),
        F.lit("1").alias("chromosome"),
        (0.5 + ((F.col("t") + F.col("k")) % 5) / 10.0).alias("r"),
    )
    out = impute_zscores(observed, pairwise)
    return out.select(
        "studyId",
        "variantId",
        F.round("zImputed", 6).alias("zImputed"),
        "nNeighbours",
        F.round("imputationInfo", 6).alias("imputationInfo"),
    )


SQL_IMPUTE_ZSCORES = """
WITH observed AS (
  SELECT 'S' || CAST(user_id % 3 AS VARCHAR) AS studyId,
         'w' || CAST(event_id % 30 AS VARCHAR) AS variantId,
         MAX((value - 50.0) / 25.0) AS z
  FROM events
  GROUP BY 1, 2
),
pairwise AS (
  SELECT 'w' || CAST(t + 30 AS VARCHAR) AS variantIdI,
         'w' || CAST((t * 3 + k) % 30 AS VARCHAR) AS variantIdJ,
         0.5 + ((t + k) % 5) / 10.0 AS r
  FROM range(0, 20) a(t) CROSS JOIN range(0, 4) b(k)
)
SELECT o.studyId, p.variantIdI AS variantId,
       ROUND(SUM(p.r * o.z) / SQRT(SUM(p.r * p.r)), 6) AS zImputed,
       CAST(COUNT(*) AS BIGINT) AS nNeighbours,
       ROUND(SUM(p.r * p.r) / COUNT(*), 6) AS imputationInfo
FROM pairwise p
JOIN observed o ON o.variantId = p.variantIdJ
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


def q_ld_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENTIST-style LD-consistency outlier detection (SURVEY §2.9
    CARMA outlier core, declarative form)."""
    ev = load_table(spark, sf_dir, "events")
    tags = ev.select(
        F.concat(F.lit("L"), (F.col("user_id") % 10).cast("string")).alias("studyLocusId"),
        F.concat(F.lit("v"), F.col("event_id").cast("string")).alias("tagVariantId"),
        ((F.col("value") - 50.0) / 10.0).alias("z"),
        ((F.col("user_id") % 10) / 2.0).alias("zLead"),
        (0.5 + (F.col("event_id") % 5) / 10.0).alias("r"),
    )
    out = flag_ld_outliers(tags, chi2_threshold=10.0)
    return out.select(
        "studyLocusId",
        "tagVariantId",
        F.round("ldConsistencyT", 6).alias("ldConsistencyT"),
        F.round("ldConsistencyP", 6).alias("ldConsistencyP"),
        "isLdOutlier",
    )


SQL_LD_OUTLIERS = """
WITH tags AS (
  SELECT 'L' || CAST(user_id % 10 AS VARCHAR) AS studyLocusId,
         'v' || CAST(event_id AS VARCHAR) AS tagVariantId,
         (value - 50.0) / 10.0 AS z,
         (user_id % 10) / 2.0 AS zLead,
         0.5 + (event_id % 5) / 10.0 AS r
  FROM events
),
t AS (
  SELECT *, POWER(z - r * zLead, 2) / GREATEST(1 - r * r, 1e-6) AS tstat
  FROM tags
),
erfc AS (
  SELECT *, SQRT(tstat / 2) AS x FROM t
)
SELECT studyLocusId, tagVariantId,
       ROUND(tstat, 6) AS ldConsistencyT,
       ROUND(((((1.061405429 * (1/(1+0.3275911*x)) - 1.453152027) * (1/(1+0.3275911*x))
              + 1.421413741) * (1/(1+0.3275911*x)) - 0.284496736) * (1/(1+0.3275911*x))
              + 0.254829592) * (1/(1+0.3275911*x)) * EXP(-x*x), 6) AS ldConsistencyP,
       tstat > 10.0 AS isLdOutlier
FROM erfc
"""

def q_impute_raiss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT RAISS imputation via cogrouped applyInPandas, using the
    published raiss_model (golden-validated: imputation_r2 0.9304 /
    mu 9.7215 on the reference fixture). The pairwise input carries
    only target→observed correlations, so Σ_OO reduces to (1+λ)I and
    the model has a closed form — mu = Σr·z/(1+λ) normalized by
    √R2 with the published variance bounds — which the DuckDB oracle
    replicates, giving the pseudo-inverse code path a full
    rows+schema+hash gate. (Non-diagonal Σ_OO is exercised in
    tests/test_imputation.py.)"""
    from genetics_spark_coloc_spark.operators.imputation import raiss_impute_grouped

    ev = load_table(spark, sf_dir, "events")
    observed = (
        ev.select(
            F.concat(F.lit("S"), (F.col("user_id") % 3).cast("string")).alias(
                "studyLocusId"
            ),
            F.concat(F.lit("w"), (F.col("event_id") % 30).cast("string")).alias(
                "variantId"
            ),
            ((F.col("value") - 50.0) / 25.0).alias("z"),
        )
        .groupBy("studyLocusId", "variantId")
        .agg(F.max("z").alias("z"))
    )
    studies = spark.range(3).select(
        F.concat(F.lit("S"), F.col("id").cast("string")).alias("studyLocusId")
    )
    targets = spark.range(20).select(
        F.concat(F.lit("w"), (F.col("id") + 30).cast("string")).alias("variantIdI"),
        F.col("id").alias("t"),
    )
    pairwise = (
        targets.select(
            "variantIdI", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"), "t"
        )
        .select(
            "variantIdI",
            F.concat(F.lit("w"), ((F.col("t") * 3 + F.col("k")) % 30).cast("string")).alias(
                "variantIdJ"
            ),
            (0.5 + ((F.col("t") + F.col("k")) % 5) / 10.0).alias("r"),
        )
        .crossJoin(F.broadcast(studies))
    )
    out = raiss_impute_grouped(observed, pairwise, ridge_lambda=0.01)
    return out.select(
        "studyLocusId",
        "variantId",
        F.round("zImputed", 6).alias("zImputed"),
        F.round("imputationInfo", 6).alias("imputationInfo"),
        "nObserved",
    )


SQL_IMPUTE_RAISS = """
WITH observed AS (
  SELECT 'S' || CAST(user_id % 3 AS VARCHAR) AS studyLocusId,
         'w' || CAST(event_id % 30 AS VARCHAR) AS variantId,
         MAX((value - 50.0) / 25.0) AS z
  FROM events GROUP BY 1, 2
),
nobs AS (
  SELECT studyLocusId, CAST(COUNT(*) AS INT) AS nObserved
  FROM observed GROUP BY 1
),
pairwise AS (
  SELECT 'w' || CAST(t + 30 AS VARCHAR) AS variantIdI,
         'w' || CAST((t * 3 + k) % 30 AS VARCHAR) AS variantIdJ,
         0.5 + ((t + k) % 5) / 10.0 AS r
  FROM range(0, 20) a(t) CROSS JOIN range(0, 4) b(k)
),
agg AS (
  SELECT o.studyLocusId, p.variantIdI AS variantId,
         SUM(p.r * (o.z / 1.01)) AS muRaw,
         1.01 - SUM(p.r * (p.r / 1.01)) AS var,
         MAX(n.nObserved) AS nObserved
  FROM pairwise p
  JOIN observed o ON o.variantId = p.variantIdJ
  JOIN nobs n ON n.studyLocusId = o.studyLocusId
  GROUP BY 1, 2
)
SELECT studyLocusId, variantId,
       ROUND(muRaw / SQRT(1.01 - (CASE WHEN var < 0 THEN 0
                                       WHEN var > 1.00999 THEN 1
                                       ELSE var END)), 6) AS zImputed,
       ROUND(1 - var, 6) AS imputationInfo,
       nObserved
FROM agg
"""


IMPUTE_QUERIES = {
    "impute_zscores": q_impute_zscores,
    "ld_outliers": q_ld_outliers,
    "impute_raiss": q_impute_raiss,
}
IMPUTE_ORACLES = {
    "impute_zscores": SQL_IMPUTE_ZSCORES,
    "ld_outliers": SQL_LD_OUTLIERS,
    "impute_raiss": SQL_IMPUTE_RAISS,
}
