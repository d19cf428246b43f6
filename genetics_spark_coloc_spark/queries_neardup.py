"""Contract query: embedding-cosine near-duplicate detection — the
scale path (multi-band LSH candidates → exact cosine verify).

Completes the dedup family: exact (hash), MinHash+LSH (text),
SimHash (text bits), n-gram Jaccard (text sets), and this —
embedding-cosine near-dup. Candidates come from MULTI-BAND
hyperplane LSH (4 bands × 8 planes, OR-construction) so the
bucket-key cardinality scales with the corpus instead of capping at
2^planes, and the exact cosine only runs on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.similarity import (
    cosine,
    lsh_cosine_candidates_banded,
)
from genetics_spark_coloc_spark.sources.tables import load_table


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embedding pairs: any LSH band agreeing AND
    exact cosine >= 0.4 (threshold chosen to produce matches on the
    synthetic embeddings, whose max pairwise cosine is ~0.51)."""
    emb = load_table(spark, sf_dir, "embeddings")
    candidates = lsh_cosine_candidates_banded(emb, num_bands=4, planes_per_band=8)
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
    return joined.select("leftId", "rightId", "matchBand", "cosineSim")


SQL_EMBEDDING_NEAR_DUP = """
WITH proj AS (
  SELECT e.vec_id AS docId, CAST(b AS INT) AS band, CAST(r AS INT) AS r,
         list_sum(list_transform(range(len(e.embedding)), d ->
           CAST(e.embedding[CAST(d AS INT) + 1] AS DOUBLE) *
           CASE WHEN substr(md5(CAST(b * 8 + r AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 1)
                     IN ('0','2','4','6','8','a','c','e')
                THEN 1.0 ELSE -1.0 END)) AS pr
  FROM embeddings e
  CROSS JOIN range(0, 4) tb(b)
  CROSS JOIN range(0, 8) tr(r)
),
hashes AS (
  SELECT docId, band,
         CAST(SUM(CASE WHEN pr > 0 THEN CAST(POWER(2, r) AS INT) ELSE 0 END) AS INT) AS bandHash
  FROM proj GROUP BY docId, band
),
pairs AS (
  SELECT l.docId AS leftId, r.docId AS rightId, CAST(MIN(l.band) AS INT) AS matchBand
  FROM hashes l
  JOIN hashes r ON l.band = r.band AND l.bandHash = r.bandHash AND l.docId < r.docId
  GROUP BY 1, 2
),
vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT p.leftId, p.rightId, p.matchBand,
         ROUND(list_dot_product(lv.v, rv.v) /
               (sqrt(list_dot_product(lv.v, lv.v)) * sqrt(list_dot_product(rv.v, rv.v))), 6)
           AS cosineSim
  FROM pairs p
  JOIN vecs lv ON lv.vec_id = p.leftId
  JOIN vecs rv ON rv.vec_id = p.rightId
)
SELECT leftId, rightId, matchBand, cosineSim
FROM scored WHERE cosineSim >= 0.4
"""

NEARDUP_QUERIES = {"embedding_near_dup": q_embedding_near_dup}
NEARDUP_ORACLES = {"embedding_near_dup": SQL_EMBEDDING_NEAR_DUP}
