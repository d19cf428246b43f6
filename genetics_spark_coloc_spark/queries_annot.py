"""Contract queries: annotation/validation operators, GC-lambda QC,
hyperplane-LSH ANN buckets.

Parity rules as in queries.py. SQL fragments that depend on static
Python mappings (consequence severity) are GENERATED from the same
dict the Spark operator uses, so the two spellings cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.annotation import (
    CONSEQUENCE_SCORES,
    intervals_to_gene_tss,
    most_severe_consequence,
    validate_study_locus,
)
from genetics_spark_coloc_spark.operators.similarity import hyperplane_bucket
from genetics_spark_coloc_spark.queries import TAGS_SQL, _tags
from genetics_spark_coloc_spark.sources.tables import load_table

_TERMS = [
    "missense_variant",
    "intron_variant",
    "stop_gained",
    "synonymous_variant",
    "upstream_gene_variant",
    "intergenic_variant",
    "5_prime_UTR_variant",
    "splice_region_variant",
]

_SCORE_CASE = "CASE {col} " + " ".join(
    f"WHEN '{term}' THEN {score}" for term, score in CONSEQUENCE_SCORES.items()
) + " ELSE 0.0 END"


def q_most_severe_csq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-severe-consequence selection over a VEP-style terms array
    (SURVEY §2.1 VEP parser core)."""
    ev = load_table(spark, sf_dir, "events")
    terms = F.array(
        *[
            F.element_at(
                F.array(*[F.lit(t) for t in _TERMS]),
                ((F.col("event_id") * (i + 1)) % 8 + 1).cast("int"),
            )
            for i in range(3)
        ]
    )
    return ev.select(
        F.col("event_id").alias("eventId"),
        terms.alias("terms"),
    ).select(
        "eventId",
        most_severe_consequence(F.col("terms")).alias("mostSevereConsequence"),
    )


_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in _TERMS) + "]"

SQL_MOST_SEVERE_CSQ = f"""
WITH terms AS (
  SELECT event_id AS eventId,
         {_TERMS_SQL}[CAST((event_id * 1) % 8 AS INT) + 1] AS t0,
         {_TERMS_SQL}[CAST((event_id * 2) % 8 AS INT) + 1] AS t1,
         {_TERMS_SQL}[CAST((event_id * 3) % 8 AS INT) + 1] AS t2
  FROM events
),
scored AS (
  SELECT eventId, t0, t1, t2,
         {_SCORE_CASE.format(col="t0")} AS s0,
         {_SCORE_CASE.format(col="t1")} AS s1,
         {_SCORE_CASE.format(col="t2")} AS s2
  FROM terms
)
SELECT eventId,
       CASE WHEN s0 >= s1 AND s0 >= s2 THEN t0
            WHEN s1 >= s2 THEN t1
            ELSE t2 END AS mostSevereConsequence
FROM scored
"""


def q_study_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-join study validation flags (SURVEY §2.3 validation
    joins)."""
    tag_rows = _tags(spark, sf_dir)
    loci = (
        tag_rows.select("studyLocusId", "studyId")
        .distinct()
        .withColumn("qualityControls", F.array().cast("array<string>"))
    )
    studies = (
        loci.select("studyId")
        .distinct()
        .filter(F.substring("studyId", 2, 10).cast("int") % 2 == 0)
    )
    out = validate_study_locus(loci, studies)
    return out.select(
        "studyLocusId",
        "studyId",
        (F.size("qualityControls") > 0).alias("isFlagged"),
    )


SQL_STUDY_VALIDATION = f"""
WITH {TAGS_SQL.strip()},
loci AS (SELECT DISTINCT studyLocusId, studyId FROM tags)
SELECT studyLocusId, studyId,
       (CAST(substr(studyId, 2) AS INT) % 2 != 0) AS isFlagged
FROM loci
"""


def q_intervals_tss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval↔gene TSS-distance join (SURVEY §2.3)."""
    ev = load_table(spark, sf_dir, "events")
    intervals = ev.select(
        (1 + F.col("event_id") % 2).cast("string").alias("chromosome"),
        ((F.col("event_id") * 53) % 500000).cast("int").alias("start"),
        ((F.col("event_id") * 53) % 500000 + 1000 + F.col("event_id") % 5000)
        .cast("int")
        .alias("end"),
        F.concat(F.lit("E"), (F.col("event_id") % 50).cast("string")).alias("geneId"),
        (F.col("value") / 100.0).alias("score"),
        F.lit("derived").alias("datasourceId"),
        F.lit(None).cast("string").alias("biosampleId"),
    )
    targets = (
        spark.range(20)
        .select(
            F.concat(F.lit("G"), F.col("id").cast("string")).alias("id"),
            F.lit("protein_coding").alias("biotype"),
            (F.col("id") * 47000).cast("long").alias("tss"),
            F.struct(
                (1 + F.col("id") % 2).cast("string").alias("chromosome"),
                F.lit(0).cast("long").alias("start"),
                F.lit(0).cast("long").alias("end"),
            ).alias("genomicLocation"),
        )
    )
    out = intervals_to_gene_tss(intervals, targets, max_distance=100_000)
    return out.groupBy("geneId", "tssGeneId").agg(
        F.count(F.lit(1)).alias("nIntervals"),
        F.round(F.sum("score"), 6).alias("scoreSum"),
    )


SQL_INTERVALS_TSS = """
WITH intervals AS (
  SELECT CAST(1 + event_id % 2 AS VARCHAR)                      AS chromosome,
         CAST((event_id * 53) % 500000 AS INT)                  AS istart,
         CAST((event_id * 53) % 500000 + 1000 + event_id % 5000 AS INT) AS iend,
         'E' || CAST(event_id % 50 AS VARCHAR)                  AS geneId,
         value / 100.0                                          AS score
  FROM events
),
targets AS (
  SELECT 'G' || CAST(g AS VARCHAR) AS tssGeneId,
         CAST(g * 47000 AS BIGINT) AS tss,
         CAST(1 + g % 2 AS VARCHAR) AS chromosome
  FROM range(0, 20) t(g)
),
joined AS (
  SELECT i.geneId, t.tssGeneId, i.score
  FROM intervals i
  JOIN targets t
    ON i.chromosome = t.chromosome
   AND ABS(CAST(FLOOR((i.istart + i.iend) / 2) AS BIGINT) - t.tss) <= 100000
)
SELECT geneId, tssGeneId,
       CAST(COUNT(*) AS BIGINT) AS nIntervals,
       ROUND(SUM(score), 6) AS scoreSum
FROM joined
GROUP BY 1, 2
"""


def q_gc_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genomic-control lambda per study: median(z²)/0.4549364
    (SURVEY §2.4 sumstat QC; exact percentile, not approx, for oracle
    parity)."""
    ev = load_table(spark, sf_dir, "events")
    ss = ev.select(
        F.concat(F.lit("S"), (F.col("user_id") % 5).cast("string")).alias("studyId"),
        ((F.col("value") - 50.0) / 10.0).alias("beta"),
        (0.02 + (F.col("event_id") % 10) / 100.0).alias("standardError"),
    ).withColumn("chi2", F.pow(F.col("beta") / F.col("standardError"), 2))
    return ss.groupBy("studyId").agg(
        F.round(F.percentile("chi2", F.lit(0.5)) / 0.4549364231195724, 6).alias("gcLambda"),
        F.count(F.lit(1)).alias("nVariants"),
    )


SQL_GC_LAMBDA = """
WITH ss AS (
  SELECT 'S' || CAST(user_id % 5 AS VARCHAR) AS studyId,
         POWER(((value - 50.0) / 10.0) / (0.02 + (event_id % 10) / 100.0), 2) AS chi2
  FROM events
)
SELECT studyId,
       ROUND(MEDIAN(chi2) / 0.4549364231195724, 6) AS gcLambda,
       CAST(COUNT(*) AS BIGINT) AS nVariants
FROM ss
GROUP BY studyId
"""


def q_hyperplane_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment over embeddings — the
    ANN scale path (bucketed candidate join instead of n²)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("docId"),
        hyperplane_bucket(F.col("embedding"), num_planes=8).alias("bucket"),
    )


SQL_HYPERPLANE_BUCKETS = """
WITH b AS (
  SELECT e.vec_id AS docId, CAST(p AS INT) AS p,
         list_sum(list_transform(range(len(e.embedding)), d ->
           CAST(e.embedding[CAST(d AS INT) + 1] AS DOUBLE) *
           CASE WHEN substr(md5(CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('0','2','4','6','8','a','c','e')
                THEN 1.0 ELSE -1.0 END)) AS proj
  FROM embeddings e CROSS JOIN range(0, 8) t(p)
)
SELECT docId,
       CAST(SUM(CASE WHEN proj > 0 THEN CAST(POWER(2, p) AS INT) ELSE 0 END) AS INT) AS bucket
FROM b
GROUP BY docId
"""


ANNOT_QUERIES = {
    "most_severe_consequence": q_most_severe_csq,
    "study_validation": q_study_validation,
    "intervals_tss": q_intervals_tss,
    "gc_lambda": q_gc_lambda,
    "hyperplane_buckets": q_hyperplane_buckets,
}

ANNOT_ORACLES = {
    "most_severe_consequence": SQL_MOST_SEVERE_CSQ,
    "study_validation": SQL_STUDY_VALIDATION,
    "intervals_tss": SQL_INTERVALS_TSS,
    "gc_lambda": SQL_GC_LAMBDA,
    "hyperplane_buckets": SQL_HYPERPLANE_BUCKETS,
}
