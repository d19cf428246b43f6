"""L2G training harness: group-aware splits, distributed evaluation
metrics, k-fold cross-validation.

Reference: method/l2g/trainer.py:286-473. There the whole feature
matrix is ``toPandas()``-ed and sklearn's GroupShuffleSplit /
GroupKFold / metric functions run on the driver. Here:

- group splits are deterministic hashes of the group key (same
  gene×trait pair never straddles train/test — the leakage guarantee
  GroupShuffleSplit provides — but computed row-local, no collect);
- metrics are aggregations: confusion counts from one groupBy, ROC
  AUC by the Mann-Whitney rank statistic over a window (average
  ranks for ties — identical to sklearn's roc_auc_score);
- cross-validation trains one distributed GBT per fold (k in-cluster
  fits instead of k driver fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from genetics_spark_coloc_spark.functions.reshape import declared_single_partition


def assign_group_split(
    df: DataFrame,
    group_cols: list[str],
    test_fraction: float = 0.2,
    seed: str = "42",
) -> DataFrame:
    """Add an ``isTest`` flag constant within each group
    (reference trainer.py:324-331 GroupShuffleSplit): md5 of the
    group key + seed, bucketed into [0,1)."""
    key = F.md5(F.concat_ws("_", *[F.col(c) for c in group_cols], F.lit(seed)))
    bucket = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % 10000) / 10000.0
    return df.withColumn("isTest", bucket < test_fraction)


def assign_group_fold(
    df: DataFrame,
    group_cols: list[str],
    n_splits: int = 5,
    seed: str = "42",
) -> DataFrame:
    """Add a ``fold`` column in [0, n_splits) constant within each
    group (reference trainer.py:443-447 GroupKFold)."""
    key = F.md5(F.concat_ws("_", *[F.col(c) for c in group_cols], F.lit(seed)))
    fold = F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_splits
    return df.withColumn("fold", fold.cast("int"))


def evaluate_binary_predictions(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.5,
) -> DataFrame:
    """One-row frame of classification metrics (reference
    trainer.py:416-424): accuracy, precision, recall, f1 at the
    threshold, plus rank-based ROC AUC.

    AUC = (Σ ranks of positives − P(P+1)/2) / (P·N) with average
    ranks for tied scores — the Mann-Whitney form of
    ``roc_auc_score``, computed with one sort-window and one
    aggregation.

    Rows with a NULL score are excluded from ALL metrics (sklearn
    would raise on NaN scores; we drop and document). Scores are
    quantized to 1e-6 before ranking, which (a) bounds the
    single-partition rank window by quantized-score cardinality
    (≤2M buckets for [0,1] probabilities) instead of raw distinct
    floats, and (b) makes the rank re-join key float-safe.
    """
    scored = scored.filter(F.col(score_col).isNotNull())
    qscore = F.round(F.col(score_col).cast("double"), 6)
    pred = (F.col(score_col) >= threshold).cast("int")
    y = F.col(label_col).cast("int")

    # the Mann-Whitney rank needs a global order, but only over
    # DISTINCT quantized scores: aggregate (count, posCount) per
    # score first, then run the single-partition running sum over
    # score groups — bounded by quantized cardinality, not row count
    per_score = scored.groupBy(qscore.alias("_score")).agg(
        F.count("*").alias("_cnt"),
        F.sum(F.col(label_col).cast("int")).alias("_posCnt"),
    )
    # bounded by quantized-score cardinality (6dp grid), not row
    # count; declared single partition — the running sum needs one
    ws = Window.partitionBy(
        declared_single_partition(F.col("_score"))
    ).orderBy(F.col("_score").asc())
    score_ranks = per_score.withColumn(
        "_minrank",
        F.coalesce(
            F.sum("_cnt").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        + 1,
    ).withColumn("_avgrank", F.col("_minrank") + (F.col("_cnt") - 1) / 2.0)
    ranked = scored.join(
        score_ranks.select("_score", "_avgrank"),
        on=qscore == F.col("_score"),
    )

    return ranked.agg(
        F.count("*").alias("n"),
        F.sum((pred == y).cast("int")).alias("_correct"),
        F.sum(((pred == 1) & (y == 1)).cast("int")).alias("_tp"),
        F.sum(((pred == 1) & (y == 0)).cast("int")).alias("_fp"),
        F.sum(((pred == 0) & (y == 1)).cast("int")).alias("_fn"),
        F.sum(y).alias("_pos"),
        F.sum(1 - y).alias("_neg"),
        F.sum(F.when(y == 1, F.col("_avgrank"))).alias("_possum"),
    ).select(
        "n",
        (F.col("_correct") / F.col("n")).alias("accuracy"),
        (F.col("_tp") / (F.col("_tp") + F.col("_fp"))).alias("precision"),
        (F.col("_tp") / (F.col("_tp") + F.col("_fn"))).alias("recall"),
        (
            2
            * F.col("_tp")
            / (2 * F.col("_tp") + F.col("_fp") + F.col("_fn"))
        ).alias("f1"),
        (
            (F.col("_possum") - F.col("_pos") * (F.col("_pos") + 1) / 2.0)
            / (F.col("_pos") * F.col("_neg"))
        ).alias("areaUnderROC"),
    )


def cross_validate_l2g(
    feature_matrix: DataFrame,
    feature_names: list[str],
    group_cols: list[str],
    label_col: str = "goldStandardSet",
    n_splits: int = 5,
    max_iter: int = 10,
) -> DataFrame:
    """Group-k-fold cross-validation with one distributed GBT fit per
    fold (reference cross_validate, trainer.py:349-473). Returns one
    metrics row per fold."""
    from genetics_spark_coloc_spark.operators.l2g import (
        predict_l2g,
        train_l2g_model,
    )

    folded = assign_group_fold(feature_matrix, group_cols, n_splits).localCheckpoint()
    results: list[DataFrame] = []
    for fold in range(n_splits):
        train = folded.filter(F.col("fold") != fold)
        val = folded.filter(F.col("fold") == fold)
        if val.isEmpty() or train.isEmpty():
            continue
        model = train_l2g_model(
            train, label_col=label_col, feature_names=feature_names, max_iter=max_iter
        )
        scored = predict_l2g(model, val).join(
            val.select("studyLocusId", "geneId", label_col),
            on=["studyLocusId", "geneId"],
        )
        metrics = evaluate_binary_predictions(
            scored, score_col="l2gScore", label_col=label_col
        ).withColumn("fold", F.lit(fold))
        results.append(metrics)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
