"""Contract query: embedding-cosine near-duplicate detection — the
scale path (LSH bucket candidates → exact cosine verify).

Completes the dedup family: exact (hash), MinHash+LSH (text),
SimHash (text bits), n-gram Jaccard (text sets), and this —
embedding-cosine near-dup, candidates restricted to hyperplane-LSH
buckets so the exact cosine only runs on O(bucket²) pairs instead of
O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.similarity import cosine, lsh_cosine_candidates
from genetics_spark_coloc_spark.sources.tables import load_table


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embedding pairs: same LSH bucket AND exact
    cosine ≥ 0.4 (threshold chosen to produce matches on the
    synthetic embeddings, whose max pairwise cosine is ~0.51)."""
    emb = load_table(spark, sf_dir, "embeddings")
    candidates = lsh_cosine_candidates(emb, num_planes=8)
    vecs = emb.select(F.col("vec_id"), F.col("embedding"))
    joined = (
        candidates.join(
            vecs.select(F.col("vec_id").alias("leftId"), F.col("embedding").alias("lv")),
            on="leftId",
        )
        .join(
            vecs.select(F.col("vec_id").alias("rightId"), F.col("embedding").alias("rv")),
            on="rightId",
        )
        .withColumn("cosineSim", F.round(cosine(F.col("lv"), F.col("rv")), 6))
        .filter(F.col("cosineSim") >= 0.4)
    )
    return joined.select("leftId", "rightId", "bucket", "cosineSim")


SQL_EMBEDDING_NEAR_DUP = """
WITH b AS (
  SELECT e.vec_id AS docId, e.embedding, CAST(p AS INT) AS p,
         list_sum(list_transform(range(len(e.embedding)), d ->
           CAST(e.embedding[CAST(d AS INT) + 1] AS DOUBLE) *
           CASE WHEN substr(md5(CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('0','2','4','6','8','a','c','e')
                THEN 1.0 ELSE -1.0 END)) AS proj
  FROM embeddings e CROSS JOIN range(0, 8) t(p)
),
buckets AS (
  SELECT docId,
         CAST(SUM(CASE WHEN proj > 0 THEN CAST(POWER(2, p) AS INT) ELSE 0 END) AS INT) AS bucket
  FROM b GROUP BY docId
),
vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT l.docId AS leftId, r.docId AS rightId, l.bucket
  FROM buckets l JOIN buckets r ON l.bucket = r.bucket AND l.docId < r.docId
),
scored AS (
  SELECT p.leftId, p.rightId, p.bucket,
         ROUND(list_dot_product(lv.v, rv.v) /
               (sqrt(list_dot_product(lv.v, lv.v)) * sqrt(list_dot_product(rv.v, rv.v))), 6)
           AS cosineSim
  FROM pairs p
  JOIN vecs lv ON lv.vec_id = p.leftId
  JOIN vecs rv ON rv.vec_id = p.rightId
)
SELECT leftId, rightId, bucket, cosineSim
FROM scored WHERE cosineSim >= 0.4
"""

NEARDUP_QUERIES = {"embedding_near_dup": q_embedding_near_dup}
NEARDUP_ORACLES = {"embedding_near_dup": SQL_EMBEDDING_NEAR_DUP}
