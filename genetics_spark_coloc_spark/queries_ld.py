"""Contract queries for the LD / PICS / locus-statistics operator group.

Same contract as queries.py: Spark builder + DuckDB oracle per
operator, over deterministic derivations from `events`. See
queries.py docstring for the parity rules (FLOOR before int casts,
round 6dp, identical arithmetic both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators import ld, locus_statistics, pics
from genetics_spark_coloc_spark.operators.clumping import cluster_peaks
from genetics_spark_coloc_spark.operators.filters import sanity_filter
from genetics_spark_coloc_spark.queries import SUMSTATS_SQL, _sumstats
from genetics_spark_coloc_spark.functions.pvalue import pvalue_pair_lte
from genetics_spark_coloc_spark.sources.tables import load_table
from pyspark.sql.window import Window


# ---------------------------------------------------------------- ld_annotate
def q_ld_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LD annotation: major-population r², threshold, unresolved-LD
    rescue (SURVEY §2.3 LD annotation)."""
    ev = load_table(spark, sf_dir, "events")
    assoc = (
        ev.select(
            F.concat(F.lit("S"), (F.col("event_id") % 4).cast("string")).alias("studyId"),
            F.concat(F.lit("x"), (F.col("event_id") % 50).cast("string")).alias("variantId"),
            (F.col("event_id") % 50).alias("m"),
            (F.col("event_id") % 4).alias("s"),
        )
        .distinct()
        .withColumn("chromosome", F.lit("1"))
        .withColumn("qualityControls", F.array().cast("array<string>"))
    )
    studies = (
        assoc.select("s")
        .distinct()
        .select(
            F.concat(F.lit("S"), F.col("s").cast("string")).alias("studyId"),
            F.array(
                F.struct(
                    F.lit("afr").alias("ldPopulation"),
                    (0.4 + 0.2 * (F.col("s") % 2)).alias("relativeSampleSize"),
                ),
                F.struct(
                    F.lit("nfe").alias("ldPopulation"),
                    (0.6 - 0.2 * (F.col("s") % 2)).alias("relativeSampleSize"),
                ),
            ).alias("ldPopulationStructure"),
        )
    )
    ld_index = (
        assoc.select("m")
        .distinct()
        .filter(F.col("m") < 40)
        .select(
            F.concat(F.lit("x"), F.col("m").cast("string")).alias("variantId"),
            F.lit("1").alias("chromosome"),
            F.transform(
                F.sequence(F.lit(0), F.lit(2)),
                lambda k: F.struct(
                    F.concat(F.lit("x"), ((F.col("m") + k) % 50).cast("string")).alias(
                        "tagVariantId"
                    ),
                    F.array(
                        F.struct(
                            F.lit("afr").alias("population"),
                            (0.6 + ((F.col("m") * 3 + k) % 4) / 10.0).alias("r"),
                        ),
                        F.struct(
                            F.lit("nfe").alias("population"),
                            (0.9 - ((F.col("m") * 3 + k) % 5) / 10.0).alias("r"),
                        ),
                    ).alias("rValues"),
                ),
            ).alias("ldSet"),
        )
    )
    annotated = ld.ld_annotate(assoc.drop("m", "s"), studies, ld_index)
    return annotated.select(
        "studyId",
        "variantId",
        F.array_contains(F.col("qualityControls"), ld.UNRESOLVED_LD_FLAG).alias("unresolved"),
        F.explode("ldSet").alias("tag"),
    ).select(
        "studyId",
        "variantId",
        F.col("tag.tagVariantId").alias("tagVariantId"),
        F.round(F.col("tag.r2Overall"), 6).alias("r2Overall"),
        "unresolved",
    )


SQL_LD_ANNOTATE = """
WITH assoc AS (
  SELECT DISTINCT 'S' || CAST(event_id % 4 AS VARCHAR) AS studyId,
         'x' || CAST(event_id % 50 AS VARCHAR)         AS variantId,
         CAST(event_id % 50 AS BIGINT)                 AS m,
         CAST(event_id % 4 AS BIGINT)                  AS s
  FROM events
),
tag_rows AS (
  SELECT a.studyId, a.variantId, a.m, a.s, CAST(k AS BIGINT) AS k,
         'x' || CAST((a.m + CAST(k AS BIGINT)) % 50 AS VARCHAR) AS tagVariantId
  FROM assoc a CROSS JOIN range(0, 3) t(k)
  WHERE a.m < 40
),
r2s AS (
  SELECT studyId, variantId, tagVariantId,
         CASE WHEN s % 2 = 0
              THEN POWER(0.9 - ((m * 3 + k) % 5) / 10.0, 2)  -- major pop nfe
              ELSE POWER(0.6 + ((m * 3 + k) % 4) / 10.0, 2)  -- major pop afr
         END AS r2
  FROM tag_rows
),
kept AS (
  SELECT studyId, variantId, tagVariantId,
         CASE WHEN tagVariantId = variantId THEN 1.0 ELSE r2 END AS r2Overall
  FROM r2s WHERE r2 >= 0.5
),
resolved AS (SELECT DISTINCT studyId, variantId FROM kept),
unresolved AS (
  SELECT studyId, variantId FROM assoc
  EXCEPT SELECT studyId, variantId FROM resolved
)
SELECT studyId, variantId, tagVariantId, ROUND(r2Overall, 6) AS r2Overall,
       FALSE AS unresolved
FROM kept
UNION ALL
SELECT studyId, variantId, variantId AS tagVariantId, 1.0 AS r2Overall,
       TRUE AS unresolved
FROM unresolved
"""


# ---------------------------------------------------------------- ld_clumping
def q_ld_clumping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LD clumping: flag leads explained by a more significant lead
    sharing an LD tag (SURVEY §2.5 LD-clump linkage)."""
    leads = (
        _sumstats(spark, sf_dir)
        .filter(pvalue_pair_lte(F.col("pValueMantissa"), F.col("pValueExponent"), 1e-8))
        .withColumn("qualityControls", F.array().cast("array<string>"))
        .withColumn(
            "ldSet",
            F.transform(
                F.sequence(F.lit(0), F.lit(2)),
                lambda k: F.struct(
                    F.concat_ws(
                        "_",
                        F.col("chromosome"),
                        (F.col("position") + 291 * k).cast("string"),
                        F.lit("A"),
                        F.lit("C"),
                    ).alias("tagVariantId"),
                    (1.0 - 0.1 * k).alias("r2Overall"),
                ),
            ),
        )
    )
    return ld.ld_clump(leads).select(
        "studyId",
        "chromosome",
        "variantId",
        F.array_contains(F.col("qualityControls"), ld.LD_CLUMPED_FLAG).alias("isLinked"),
    )


SQL_LD_CLUMPING = f"""
WITH {SUMSTATS_SQL.strip()},
leads AS (
  SELECT studyId, chromosome, variantId, position, pValueMantissa, pValueExponent
  FROM sumstats
  WHERE pValueExponent < -8 OR (pValueExponent = -8 AND pValueMantissa <= 1.0)
),
lead_tags AS (
  SELECT studyId, chromosome, variantId,
         chromosome || '_' || CAST(position + 291 * CAST(k AS INT) AS VARCHAR) || '_A_C' AS tagVariantId
  FROM leads CROSS JOIN range(0, 3) t(k)
)
SELECT a.studyId, a.chromosome, a.variantId,
       EXISTS (
         SELECT 1
         FROM leads b
         JOIN lead_tags t
           ON t.studyId = a.studyId AND t.chromosome = a.chromosome
          AND t.variantId = a.variantId AND b.variantId = t.tagVariantId
         WHERE b.studyId = a.studyId AND b.chromosome = a.chromosome
           AND (b.pValueExponent, b.pValueMantissa, b.variantId)
             < (a.pValueExponent, a.pValueMantissa, a.variantId)
       ) AS isLinked
FROM leads a
"""


# ----------------------------------------------------------------------- pics
def q_pics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PICS fine-mapping posteriors, fully JVM-side via erfc
    approximation (SURVEY §2.9 PICS._finemap)."""
    ev = load_table(spark, sf_dir, "events")
    tag_rows = (
        ev.select(
            (F.col("user_id") % 8).alias("d"),
            F.concat(F.lit("v"), (F.col("event_id") % 40).cast("string")).alias("tagVariantId"),
            ((F.col("event_id") % 97) / 100.0).alias("r2"),
        )
        .groupBy("d", "tagVariantId")
        .agg(F.max("r2").alias("r2"))
    )
    assoc = tag_rows.groupBy("d").agg(
        # sorted: the PICS normalisation fold then sums posteriors in
        # deterministic tag order (bit-reproducible vs the oracle)
        F.sort_array(
            F.collect_list(
                F.struct(F.col("tagVariantId"), F.col("r2").alias("r2Overall"))
            )
        ).alias("ldSet")
    ).select(
        F.concat(F.lit("P"), F.col("d").cast("string")).alias("studyLocusId"),
        F.concat(F.lit("v"), ((F.col("d") * 5) % 40).cast("string")).alias("variantId"),
        F.lit(1.0).cast("float").alias("pValueMantissa"),
        (-(8 + F.col("d") % 7)).cast("int").alias("pValueExponent"),
        (F.col("d") / 10.0).alias("beta"),
        "ldSet",
    )
    picsed = pics.pics_finemap(assoc)
    return picsed.select("studyLocusId", F.explode("locus").alias("tag")).select(
        "studyLocusId",
        F.col("tag.variantId").alias("tagVariantId"),
        F.round(F.col("tag.r2Overall"), 6).alias("r2Overall"),
        F.round(F.col("tag.posteriorProbability"), 6).alias("posteriorProbability"),
        F.round(F.col("tag.standardError"), 6).alias("standardError"),
    )


# erfc via the same Abramowitz-Stegun 7.1.26 polynomial as
# functions/stats.py, spelled in SQL
SQL_PICS = """
WITH tag_raw AS (
  SELECT CAST(user_id % 8 AS BIGINT) AS d,
         'v' || CAST(event_id % 40 AS VARCHAR) AS tagVariantId,
         (event_id % 97) / 100.0 AS r2
  FROM events
),
tag_rows AS (
  SELECT d, tagVariantId, MAX(r2) AS r2 FROM tag_raw GROUP BY 1, 2
),
kept AS (
  SELECT 'P' || CAST(d AS VARCHAR) AS studyLocusId, tagVariantId, r2,
         CAST(8 + d % 7 AS DOUBLE) AS nlp
  FROM tag_rows
  WHERE r2 >= 0.5
),
mustd AS (
  SELECT *, nlp * r2 AS mu,
         CASE WHEN ABS(SQRT(1 - POWER(SQRT(r2), 6.4)) * SQRT(nlp) / 2) = 0 THEN 0.001
              ELSE ABS(SQRT(1 - POWER(SQRT(r2), 6.4)) * SQRT(nlp) / 2) END AS std
  FROM kept
),
zz AS (
  SELECT *, (nlp - mu) / std / SQRT(2) AS z FROM mustd
),
erfc AS (
  SELECT *,
         CASE WHEN z >= 0
              THEN ((((1.061405429 * (1/(1+0.3275911*ABS(z))) - 1.453152027) * (1/(1+0.3275911*ABS(z)))
                     + 1.421413741) * (1/(1+0.3275911*ABS(z))) - 0.284496736) * (1/(1+0.3275911*ABS(z)))
                     + 0.254829592) * (1/(1+0.3275911*ABS(z))) * EXP(-ABS(z)*ABS(z))
              ELSE 2 - ((((1.061405429 * (1/(1+0.3275911*ABS(z))) - 1.453152027) * (1/(1+0.3275911*ABS(z)))
                     + 1.421413741) * (1/(1+0.3275911*ABS(z))) - 0.284496736) * (1/(1+0.3275911*ABS(z)))
                     + 0.254829592) * (1/(1+0.3275911*ABS(z))) * EXP(-ABS(z)*ABS(z))
         END AS relpp
  FROM zz
)
SELECT studyLocusId, tagVariantId,
       ROUND(r2, 6) AS r2Overall,
       ROUND(relpp / SUM(relpp) OVER (PARTITION BY studyLocusId), 6) AS posteriorProbability,
       ROUND(POWER(10, -std), 6) AS standardError
FROM erfc
"""


# ------------------------------------------------------- locus statistics join
def q_locus_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned-range-join collection of sumstats into loci
    (SURVEY §2.3 broadcast range join, §4 binned rewrite)."""
    ss = _sumstats(spark, sf_dir)
    sig = ss.filter(pvalue_pair_lte(F.col("pValueMantissa"), F.col("pValueExponent"), 1e-8))
    clustered = cluster_peaks(sig, 50_000)
    w = Window.partitionBy("studyId", "chromosome", "cluster_id").orderBy(
        F.col("pValueExponent").asc(), F.col("pValueMantissa").asc(), F.col("position").asc()
    )
    loci = (
        clustered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.concat_ws("_", "studyId", "chromosome", F.col("position").cast("string")).alias(
                "studyLocusId"
            ),
            "studyId",
            "chromosome",
            "position",
        )
    )
    annotated = locus_statistics.annotate_locus_statistics(loci, ss, distance=10_000)
    return annotated.select(
        "studyLocusId",
        F.coalesce(F.size("locus"), F.lit(0)).cast("long").alias("nTags"),
        F.array_min(F.col("locus.variantId")).alias("minTagVariantId"),
    )


SQL_LOCUS_STATISTICS = f"""
WITH {SUMSTATS_SQL.strip()},
significant AS (
  SELECT * FROM sumstats
  WHERE pValueExponent < -8 OR (pValueExponent = -8 AND pValueMantissa <= 1.0)
),
clustered AS (
  SELECT *,
         MAX(CASE WHEN gap IS NULL OR gap > 50000 THEN position END)
           OVER (PARTITION BY studyId, chromosome ORDER BY position
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_start
  FROM (
    SELECT *, position - LAG(position) OVER (PARTITION BY studyId, chromosome ORDER BY position) AS gap
    FROM significant
  )
),
loci AS (
  SELECT studyId || '_' || chromosome || '_' || CAST(position AS VARCHAR) AS studyLocusId,
         studyId, chromosome, position
  FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY studyId, chromosome, cluster_start
             ORDER BY pValueExponent ASC, pValueMantissa ASC, position ASC) AS rn
    FROM clustered
  ) WHERE rn = 1
)
SELECT l.studyLocusId,
       CAST(COUNT(s.variantId) AS BIGINT) AS nTags,
       MIN(s.variantId) AS minTagVariantId
FROM loci l
LEFT JOIN sumstats s
  ON s.studyId = l.studyId AND s.chromosome = l.chromosome
 AND s.position BETWEEN l.position - 10000 AND l.position + 10000
GROUP BY l.studyLocusId
"""


# ---------------------------------------------------------------- sanity filter
def q_sanity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sumstat sanity filter: zero/NaN betas, SE ≤ 0, p ≥ 1
    (SURVEY §2.2)."""
    ss = _sumstats(spark, sf_dir).withColumn(
        "standardError", (F.col("position") % 5) / 4.0
    )
    return sanity_filter(ss).select("studyId", "variantId", F.round("standardError", 6).alias("standardError"))


SQL_SANITY_FILTER = f"""
WITH {SUMSTATS_SQL.strip()},
with_se AS (
  SELECT *, (position % 5) / 4.0 AS standardError FROM sumstats
)
SELECT studyId, variantId, ROUND(standardError, 6) AS standardError
FROM with_se
WHERE beta IS NOT NULL AND NOT isnan(beta) AND beta != 0
  AND pValueMantissa IS NOT NULL AND pValueExponent IS NOT NULL AND position IS NOT NULL
  AND pValueMantissa > 0
  AND (pValueExponent < 0 OR (pValueExponent = 0 AND pValueMantissa < 1))
  AND (standardError IS NULL OR standardError > 0)
"""


LD_QUERIES = {
    "ld_annotate": q_ld_annotate,
    "ld_clumping": q_ld_clumping,
    "pics": q_pics,
    "locus_statistics": q_locus_statistics,
    "sanity_filter": q_sanity_filter,
}

LD_ORACLES = {
    "ld_annotate": SQL_LD_ANNOTATE,
    "ld_clumping": SQL_LD_CLUMPING,
    "pics": SQL_PICS,
    "locus_statistics": SQL_LOCUS_STATISTICS,
    "sanity_filter": SQL_SANITY_FILTER,
}
