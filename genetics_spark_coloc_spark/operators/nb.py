"""Distributed multinomial Naive Bayes for corpus labeling.

The workhorse cheap classifier of LLM-data curation (quality
routing, language/source attribution, topic bucketing) — chosen here
because its training IS a pair of counting aggregations, which Spark
does at any scale with map-side combine, and its closed form makes
every number exactly oracle-checkable in SQL (unlike SGD-trained
models). fastText-style curation classifiers are this plus a hash
trick.

Training: one explode + groupBy (label, token) count, one label
total, one corpus vocab count — three small shuffles over data that
shrinks immediately to the vocab size. Scoring: tokens join the
broadcast model; unseen (label, token) pairs fall back to the
label's smoothed floor. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.text import tokens


def _tok(text_col: str) -> Column:
    return tokens(F.lower(F.col(text_col)))


def nb_train(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Laplace-smoothed multinomial NB token model, long form:
    (label, token, tokenCount, logLik) with

        logLik = ln((tokenCount + alpha) / (labelTokens + alpha * V))

    where V is the corpus-wide distinct-token vocabulary. Exact
    closed form — no iteration, no randomness. The label-total and
    vocab sides are tiny aggregates broadcast onto the (label,
    token) counts."""
    toks = df.select(
        F.col(label_col).alias("label"), F.explode(_tok(text_col)).alias("token")
    )
    counts = toks.groupBy("label", "token").agg(
        F.count(F.lit(1)).alias("tokenCount")
    )
    label_totals = toks.groupBy("label").agg(
        F.count(F.lit(1)).alias("labelTokens")
    )
    vocab = toks.select("token").distinct().agg(
        F.count(F.lit(1)).alias("vocabSize")
    )
    return (
        counts.join(F.broadcast(label_totals), "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "token",
            "tokenCount",
            F.log(
                (F.col("tokenCount") + F.lit(alpha))
                / (F.col("labelTokens") + F.lit(alpha) * F.col("vocabSize"))
            ).alias("logLik"),
        )
    )


def nb_priors(
    df: DataFrame, label_col: str = "lang", alpha: float = 1.0
) -> DataFrame:
    """Smoothed class log-priors (label, docCount, logPrior) with
    logPrior = ln((docCount + alpha) / (N + alpha * L))."""
    counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("docCount")
    )
    totals = counts.agg(
        F.sum("docCount").alias("_n"), F.count(F.lit(1)).alias("_l")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "label",
        "docCount",
        F.log(
            (F.col("docCount") + F.lit(alpha))
            / (F.col("_n") + F.lit(alpha) * F.col("_l"))
        ).alias("logPrior"),
    )


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Score every document against every label and keep the argmax:
    (docId, label, score). A document's score under label c is

        logPrior(c) + sum over token positions of logLik(c, token)

    with unseen (label, token) pairs taking the label's smoothed
    floor ln(alpha / (labelTokens + alpha * V)). Ties break toward
    the lexicographically smaller label.

    Shape: doc tokens are first compressed to per-doc (token, n)
    pairs (one map-side-combined groupBy), so the label cross and
    the broadcast-model join fan out over DISTINCT doc-tokens — on
    real text that shrinks the join input by the token repeat factor
    (each occurrence contributes n * logLik, not a row). The final
    argmax is a min_by aggregate; the candidate set is |docs| x
    |labels|, never |docs| x |vocab|."""
    # Reconstruct the floor from the model itself: for any (label,
    # token) row, floor = logLik - ln(tokenCount + alpha) + ln(alpha)
    # — algebraically exact, so the model long form is self-contained
    # and nb_score needs no extra side table.
    label_floors = model.groupBy("label").agg(
        F.max(
            F.col("logLik")
            - F.log(F.col("tokenCount") + F.lit(alpha))
            + F.log(F.lit(alpha))
        ).alias("floorLik")
    )
    toks = (
        docs.select(
            F.col(id_col).alias("docId"), F.explode(_tok(text_col)).alias("token")
        )
        .groupBy("docId", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = (
        toks.crossJoin(F.broadcast(label_floors))
        .join(F.broadcast(model.select("label", "token", "logLik")),
              ["label", "token"], "left")
        .groupBy("docId", "label")
        .agg(
            F.sum(
                F.col("n") * F.coalesce(F.col("logLik"), F.col("floorLik"))
            ).alias("tokenScore")
        )
        .join(F.broadcast(priors.select("label", "logPrior")), "label")
        .select(
            "docId",
            "label",
            (F.col("tokenScore") + F.col("logPrior")).alias("score"),
        )
    )
    # min_by on (-rounded score, label): smallest negative score =
    # largest score; ties -> smallest label. Rounding BEFORE the
    # argmax makes the tie-break reproducible across plans and
    # matches the oracle's ORDER BY ROUND(score, 6).
    best = scored.groupBy("docId").agg(
        F.min_by(
            F.struct(F.col("label"), F.round("score", 6).alias("score")),
            F.struct(
                (-F.round("score", 6)).alias("negScore"),
                F.col("label").alias("label"),
            ),
        ).alias("_b")
    )
    return best.select(
        "docId", F.col("_b.label").alias("label"), F.col("_b.score").alias("score")
    )
