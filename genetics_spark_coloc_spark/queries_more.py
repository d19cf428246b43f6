"""Contract queries: intra-study overlaps, credible-set purity,
large-locus splitting, and multi-join relational pipelines.

Parity rules as in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.functions.pvalue import pvalue_pair_lte
from genetics_spark_coloc_spark.operators import overlaps
from genetics_spark_coloc_spark.operators.clumping import cluster_peaks, locus_breaker
from genetics_spark_coloc_spark.operators.study_locus_ops import (
    QC_OUT_OF_SAMPLE_LD,
    QC_TOP_HIT,
    annotate_purity,
    assign_confidence,
    process_locus_breaker_output,
    score_credible_set_confidence,
)
from genetics_spark_coloc_spark.queries import SUMSTATS_SQL, _sumstats
from genetics_spark_coloc_spark.sources.tables import load_table


# ------------------------------------------------------ intra-study overlaps
def _intra_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag rows where each study hosts TWO loci sharing tags, so the
    intra-study overlap path has work to do."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(F.lit("L"), (F.col("user_id") % 10).cast("string")).alias("studyLocusId"),
        F.concat(F.lit("S"), (F.col("user_id") % 5).cast("string")).alias("studyId"),
        F.lit("gwas").alias("studyType"),
        F.lit("1").alias("chromosome"),
        F.concat(F.lit("r"), (F.col("user_id") % 10).cast("string")).alias("region"),
        F.concat(F.lit("v"), (F.col("event_id") % 40).cast("string")).alias("tagVariantId"),
    )
    return raw.distinct()


INTRA_TAGS_SQL = """
itags AS (
  SELECT DISTINCT
         'L' || CAST(user_id % 10 AS VARCHAR) AS studyLocusId,
         'S' || CAST(user_id % 5 AS VARCHAR)  AS studyId,
         'gwas'                               AS studyType,
         '1'                                  AS chromosome,
         'r' || CAST(user_id % 10 AS VARCHAR) AS region,
         'v' || CAST(event_id % 40 AS VARCHAR) AS tagVariantId
  FROM events
)
"""


def q_intra_study_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-study overlapping locus pairs (credible-set dedup path,
    SURVEY §2.3 _overlapping_peaks intra_study_overlap=True)."""
    tags = _intra_tags(spark, sf_dir)
    peaks = overlaps.overlapping_peaks(tags, intra_study_overlap=True)
    return peaks.select("leftStudyLocusId", "rightStudyLocusId", "chromosome")


SQL_INTRA_STUDY_OVERLAPS = f"""
WITH {INTRA_TAGS_SQL.strip()}
SELECT DISTINCT l.studyLocusId AS leftStudyLocusId,
       r.studyLocusId AS rightStudyLocusId,
       l.chromosome AS chromosome
FROM itags l
JOIN itags r
  ON l.studyId = r.studyId
 AND l.chromosome = r.chromosome
 AND l.tagVariantId = r.tagVariantId
 AND l.studyLocusId > r.studyLocusId
 AND l.region != r.region
"""


# -------------------------------------------------------------------- purity
def q_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credible-set LD-purity metrics from the tag r² distribution."""
    ev = load_table(spark, sf_dir, "events")
    tag_rows = (
        ev.select(
            F.concat(F.lit("L"), (F.col("user_id") % 10).cast("string")).alias("studyLocusId"),
            F.concat(F.lit("v"), (F.col("event_id") % 40).cast("string")).alias("variantId"),
            ((F.col("event_id") % 97) / 100.0).alias("r2"),
        )
        .groupBy("studyLocusId", "variantId")
        .agg(F.max("r2").alias("r2Overall"))
    )
    study_locus = tag_rows.groupBy("studyLocusId").agg(
        F.collect_list(F.struct("variantId", "r2Overall")).alias("locus")
    )
    out = annotate_purity(study_locus)
    return out.select(
        "studyLocusId",
        F.round("purityMeanR2", 6).alias("purityMeanR2"),
        F.round("purityMinR2", 6).alias("purityMinR2"),
    )


SQL_PURITY = """
WITH tag_rows AS (
  SELECT 'L' || CAST(user_id % 10 AS VARCHAR) AS studyLocusId,
         'v' || CAST(event_id % 40 AS VARCHAR) AS variantId,
         MAX((event_id % 97) / 100.0) AS r2Overall
  FROM events
  GROUP BY 1, 2
)
SELECT studyLocusId,
       ROUND(list_sum(list_sort(list(r2Overall))) / COUNT(*), 6) AS purityMeanR2,
       ROUND(MIN(r2Overall), 6) AS purityMinR2
FROM tag_rows
GROUP BY studyLocusId
"""


# --------------------------------------------------------- large-loci split
def q_locus_breaker_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locus-breaker output with over-wide loci re-broken by clumped
    leads (SURVEY §2.3 locus-breaker large-loci semi range join)."""
    ss = _sumstats(spark, sf_dir)
    lbc = locus_breaker(ss, 1e-5, 25_000, 1e-8, 10_000)
    sig = ss.filter(pvalue_pair_lte(F.col("pValueMantissa"), F.col("pValueExponent"), 1e-8))
    clustered = cluster_peaks(sig, 10_000)
    w = Window.partitionBy("studyId", "chromosome", "cluster_id").orderBy(
        F.col("pValueExponent").asc(), F.col("pValueMantissa").asc(), F.col("position").asc()
    )
    wbc = (
        clustered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("studyId", "chromosome", "position", "variantId")
    )
    out = process_locus_breaker_output(lbc, wbc, large_loci_size=100_000)
    return out.select("studyId", "chromosome", "position", "variantId", "locusStart", "locusEnd")


SQL_LOCUS_BREAKER_SPLIT = f"""
WITH {SUMSTATS_SQL.strip()},
baseline AS (
  SELECT *, -(log10(CAST(pValueMantissa AS DOUBLE)) + pValueExponent) AS negLogPValue
  FROM sumstats
  WHERE pValueExponent < -5 OR (pValueExponent = -5 AND pValueMantissa <= 1.0)
),
seg AS (
  SELECT *,
         GREATEST(
           MAX(CASE WHEN gap IS NULL OR gap > 25000 THEN position END)
             OVER (PARTITION BY studyId, chromosome ORDER BY position
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 10000,
           0) AS locusStart
  FROM (
    SELECT *, position - LAG(position) OVER (PARTITION BY studyId, chromosome ORDER BY position) AS gap
    FROM baseline
  )
),
bounded AS (
  SELECT *, MAX(position + 10000) OVER (PARTITION BY studyId, chromosome, locusStart) AS locusEnd
  FROM seg
),
lbc AS (
  SELECT studyId, chromosome, position, variantId,
         CAST(locusStart AS INT) AS locusStart, CAST(locusEnd AS INT) AS locusEnd
  FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY studyId, chromosome, locusStart, locusEnd
             ORDER BY negLogPValue DESC, position ASC) AS rn
    FROM bounded
  ) WHERE rn = 1 AND negLogPValue > 8.0
),
significant AS (
  SELECT * FROM sumstats
  WHERE pValueExponent < -8 OR (pValueExponent = -8 AND pValueMantissa <= 1.0)
),
clustered AS (
  SELECT *,
         MAX(CASE WHEN gap IS NULL OR gap > 10000 THEN position END)
           OVER (PARTITION BY studyId, chromosome ORDER BY position
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_start
  FROM (
    SELECT *, position - LAG(position) OVER (PARTITION BY studyId, chromosome ORDER BY position) AS gap
    FROM significant
  )
),
wbc AS (
  SELECT studyId, chromosome, position, variantId
  FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY studyId, chromosome, cluster_start
             ORDER BY pValueExponent ASC, pValueMantissa ASC, position ASC) AS rn
    FROM clustered
  ) WHERE rn = 1
),
small AS (
  SELECT * FROM lbc WHERE locusEnd - locusStart <= 100000
),
large AS (
  SELECT * FROM lbc WHERE locusEnd - locusStart > 100000
),
rebuilt AS (
  SELECT w.studyId, w.chromosome, w.position, w.variantId,
         CAST(w.position - 50000 AS INT) AS locusStart,
         CAST(w.position + 50000 AS INT) AS locusEnd
  FROM wbc w
  WHERE EXISTS (
    SELECT 1 FROM large l
    WHERE l.studyId = w.studyId AND l.chromosome = w.chromosome
      AND w.position BETWEEN l.locusStart AND l.locusEnd
  )
)
SELECT * FROM rebuilt
UNION ALL
SELECT studyId, chromosome, position, variantId, locusStart, locusEnd FROM small
"""


# -------------------------------------------------------- multi-join TPC-H
def q_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem revenue rollup (broadcast dims)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("nLineitems"),
        )
    )


SQL_REVENUE_BY_SEGMENT = """
SELECT c.c_mktsegment, o.o_orderpriority,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS nLineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


def q_local_supply_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier chain
    with the local-supplier predicate (TPC-H Q5 shape)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


SQL_LOCAL_SUPPLY_REVENUE = """
SELECT r.r_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY r.r_name
"""


def q_credible_set_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credible-set confidence assignment + numeric scoring
    (reference assign_confidence, dataset/study_locus.py:1372-1443, and
    CredibleSetConfidenceFeature, l2g_features/other.py:326-361):
    finemappingMethod × qualityControls flags → label → [0,1] score."""
    ev = load_table(spark, sf_dir, "events")
    study_locus = ev.select(
        (F.col("event_id") % 60).cast("int").alias("k")
    ).distinct().select(
        F.concat(F.lit("L"), F.col("k").cast("string")).alias("studyLocusId"),
        F.element_at(
            F.array(F.lit("SuSie"), F.lit("SuSiE-inf"), F.lit("PICS"), F.lit("abf")),
            (F.col("k") % 4 + 1).cast("int"),
        ).alias("finemappingMethod"),
        F.filter(
            F.array(
                F.when(F.col("k") % 3 == 0, F.lit(QC_OUT_OF_SAMPLE_LD)),
                F.when(F.col("k") % 5 == 0, F.lit(QC_TOP_HIT)),
            ),
            lambda x: x.isNotNull(),
        ).alias("qualityControls"),
    )
    labelled = assign_confidence(study_locus)
    return labelled.select(
        "studyLocusId",
        "confidence",
        score_credible_set_confidence(F.col("confidence")).alias("confidenceScore"),
    )


SQL_CREDIBLE_SET_CONFIDENCE = """
WITH sl AS (
  SELECT DISTINCT CAST(event_id % 60 AS INT) AS k FROM events
),
lab AS (
  SELECT 'L' || CAST(k AS VARCHAR) AS studyLocusId,
         CASE k % 4 WHEN 0 THEN 'SuSie' WHEN 1 THEN 'SuSiE-inf'
                    WHEN 2 THEN 'PICS' ELSE 'abf' END AS m,
         k % 3 = 0 AS oos,
         k % 5 = 0 AS th
  FROM sl
)
SELECT studyLocusId,
       CASE WHEN m IN ('SuSie', 'SuSiE-inf') AND NOT oos
              THEN 'SuSiE fine-mapped credible set with in-sample LD'
            WHEN m IN ('SuSie', 'SuSiE-inf') AND oos
              THEN 'SuSiE fine-mapped credible set with out-of-sample LD'
            WHEN m = 'PICS' AND NOT th
              THEN 'PICS fine-mapped credible set extracted from summary statistics'
            WHEN m = 'PICS' AND th
              THEN 'PICS fine-mapped credible set based on reported top hit'
            ELSE 'Unknown confidence' END AS confidence,
       CASE WHEN m IN ('SuSie', 'SuSiE-inf') AND NOT oos THEN 1.0
            WHEN m IN ('SuSie', 'SuSiE-inf') AND oos THEN 0.75
            WHEN m = 'PICS' AND NOT th THEN 0.5
            WHEN m = 'PICS' AND th THEN 0.25
            ELSE 0.0 END AS confidenceScore
FROM lab
"""


MORE_QUERIES = {
    "intra_study_overlaps": q_intra_study_overlaps,
    "credible_set_confidence": q_credible_set_confidence,
    "credible_set_purity": q_purity,
    "locus_breaker_split": q_locus_breaker_split,
    "revenue_by_segment": q_revenue_by_segment,
    "local_supply_revenue": q_local_supply_revenue,
}

MORE_ORACLES = {
    "intra_study_overlaps": SQL_INTRA_STUDY_OVERLAPS,
    "credible_set_confidence": SQL_CREDIBLE_SET_CONFIDENCE,
    "credible_set_purity": SQL_PURITY,
    "locus_breaker_split": SQL_LOCUS_BREAKER_SPLIT,
    "revenue_by_segment": SQL_REVENUE_BY_SEGMENT,
    "local_supply_revenue": SQL_LOCAL_SUPPLY_REVENUE,
}
