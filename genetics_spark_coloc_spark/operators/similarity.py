"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the query set, JVM-side dot
  product via zip_with/aggregate folds (double accumulation,
  left-to-right — reproducible), ranking window per query.
- LSH-bucketed variant (scale path): random-hyperplane signs derived
  deterministically from md5 of (planeIdx, dim) so the oracle can
  reproduce the buckets; candidates only join within a bucket.

At 100 TB the broadcast side is the small query set; the corpus scan
stays partition-local until the final per-query top-k shuffle (k rows
per partition per query after partial ranking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with double accumulation, left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (queryId, neighborId, cosineSim) with self-matches
    excluded; ties broken by neighborId (deterministic). The
    similarity is rounded to 6dp BEFORE ranking so rank order is
    reproducible across engines.
    """
    q = queries.select(
        F.col(id_col).alias("queryId"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighborId"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), on=F.col("neighborId") != F.col("queryId"))
        .withColumn("cosineSim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .drop("qvec", "cvec")
    )
    w = Window.partitionBy("queryId").orderBy(
        F.col("cosineSim").desc(), F.col("neighborId").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("queryId", "neighborId", "cosineSim", "rank")
    )


def hyperplane_bucket(vec: Column, num_planes: int = 8) -> Column:
    """Deterministic random-hyperplane LSH bucket id (int).

    Plane p's weight for dimension d is +1 if md5("p|d") starts with
    an even hex digit else -1 — a reproducible pseudo-random
    hyperplane both Spark and a SQL oracle can derive. Bucket bit p =
    sign of Σ_d w(p,d)·vec[d].
    """
    def plane_sign(p: Column, d: Column) -> Column:
        first_hex = F.substring(F.md5(F.concat_ws("|", p.cast("string"), d.cast("string"))), 1, 1)
        return F.when(first_hex.isin("0", "2", "4", "6", "8", "a", "c", "e"), 1.0).otherwise(-1.0)

    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(vec, dims, lambda x, d: x.cast("double") * plane_sign(p, d)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    # bucket id = Σ bit_p · 2^p (shiftleft needs a literal int, so use
    # exact power-of-two arithmetic inside the lambda)
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            lambda b, p: F.when(b > 0, F.pow(F.lit(2.0), p).cast("int")).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")


def lsh_cosine_candidates(
    corpus: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket the corpus by hyperplane LSH; candidate pairs share a
    bucket. The scale path for ANN: per-bucket joins instead of n²."""
    bucketed = corpus.select(
        F.col(id_col).alias("docId"),
        hyperplane_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    l, r = bucketed.alias("l"), bucketed.alias("r")
    return (
        l.join(
            r,
            on=[F.col("l.bucket") == F.col("r.bucket"), F.col("l.docId") < F.col("r.docId")],
        )
        .select(
            F.col("l.docId").alias("leftId"),
            F.col("r.docId").alias("rightId"),
            F.col("l.bucket").alias("bucket"),
        )
    )
