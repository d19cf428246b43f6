"""Variant-effect score normalisation + LOFTEE extraction.

Reference anchors: VariantEffectNormaliser
(dataset/variant_index.py:367-717) — maps heterogeneous predictor
scores (CADD, GERP, SIFT, PolyPhen, AlphaMissense, Pangolin, LOFTEE,
LoF curation, FoldX) onto a comparable [-1, 1] scale where negative
means benign and positive deleterious; get_loftee
(variant_index.py:341-364).

Everything is a per-row ``transform`` over the variantEffect
array<struct> — no shuffle, stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rescale(
    column: Column,
    min_value: float,
    max_value: float,
    minimum: float = 0.0,
    maximum: float = 1.0,
) -> Column:
    """Linear rescale from [min_value, max_value] to [minimum, maximum]
    (reference: variant_index.py:441-462)."""
    return (column - min_value) / (max_value - min_value) * (
        maximum - minimum
    ) + minimum


def normalise_cadd(score: Column) -> Column:
    """CADD 0-10→[-1,0], 10-20→[0,0.5], 20-30→[0.5,0.75], 30-81→[0.75,1]
    (reference: variant_index.py:488-517)."""
    return (
        F.when(score <= 10, _rescale(score, 0, 10, -1.0, 0.0))
        .when(score <= 20, _rescale(score, 10, 20, 0.0, 0.5))
        .when(score <= 30, _rescale(score, 20, 30, 0.5, 0.75))
        .when(score > 30, _rescale(score, 30, 81, 0.75, 1))
    )


def normalise_gerp(score: Column) -> Column:
    """GERP >6→1, 2-6→[0.5,1], 0-2→[0,0.5], -3-0→[-1,0], <-3→-1
    (reference: variant_index.py:519-543)."""
    return (
        F.when(score > 6, F.lit(1.0))
        .when(score >= 2, _rescale(score, 2, 6, 0.5, 1))
        .when(score >= 0, _rescale(score, 0, 2, 0, 0.5))
        .when(score >= -3, _rescale(score, -3, 0, -1, 0))
        .when(score < -3, F.lit(-1.0))
    )


def normalise_lof(assessment: Column) -> Column:
    """Ordinal LoF curation verdicts → {1, 0.5, 0, -0.5, -1}
    (reference: variant_index.py:545-572)."""
    return (
        F.when(assessment == "lof", F.lit(1.0))
        .when(assessment == "likely_lof", F.lit(0.5))
        .when(assessment == "uncertain", F.lit(0.0))
        .when(assessment == "likely_not_lof", F.lit(-0.5))
        .when(assessment == "not_lof", F.lit(-1.0))
    )


def normalise_loftee(assessment: Column) -> Column:
    """LOFTEE HC→1.0, LC→0.85 (reference: variant_index.py:574-594)."""
    return F.when(assessment == "HC", F.lit(1.0)).when(
        assessment == "LC", F.lit(0.85)
    )


def normalise_sift(score: Column, assessment: Column) -> Column:
    """SIFT (1-score, assessment) piecewise map onto [-1,1]
    (reference: variant_index.py:596-639)."""
    inv = 1 - F.round(score.cast("double"), 2)
    return (
        F.when(
            (inv >= 0.95) & (assessment == "deleterious"),
            _rescale(1 - score, 0.95, 1, 0.5, 1),
        )
        .when(
            (inv >= 0.95) & (assessment == "deleterious_low_confidence"),
            _rescale(1 - score, 0.95, 1, 0, 0.5),
        )
        .when(
            (inv <= 0.95) & (assessment == "tolerated_low_confidence"),
            _rescale(1 - score, 0, 0.95, -0.5, 0.0),
        )
        .when(
            (inv <= 0.95) & (assessment == "tolerated"),
            _rescale(1 - score, 0, 0.95, -1, -0.5),
        )
    )


def normalise_polyphen(assessment: Column, score: Column) -> Column:
    """PolyPhen benign/possibly/probably bands → [-1,1]; unknown → null
    (reference: variant_index.py:641-669)."""
    return (
        F.when(assessment == "unknown", F.lit(None).cast("double"))
        .when(score <= 0.446, _rescale(score, 0, 0.446, -1.0, -0.25))
        .when(score <= 0.908, _rescale(score, 0.446, 0.908, -0.25, 0.25))
        .when(score > 0.908, _rescale(score, 0.908, 1.0, 0.25, 1.0))
    )


def normalise_alpha_missense(score: Column) -> Column:
    """AlphaMissense three bands → [-1,1] (reference: variant_index.py:671-694)."""
    return (
        F.when(score < 0.06, _rescale(score, 0, 0.06, -1.0, -0.25))
        .when(score < 0.77, _rescale(score, 0.06, 0.77, -0.25, 0.25))
        .when(score >= 0.77, _rescale(score, 0.77, 1, 0.25, 1))
    )


def normalise_pangolin(score: Column) -> Column:
    """|Pangolin| two bands → [0,1] (reference: variant_index.py:696-717)."""
    return F.when(
        F.abs(score) > 0.14, _rescale(F.abs(score), 0.14, 1, 0.5, 1)
    ).when(F.abs(score) <= 0.14, _rescale(F.abs(score), 0, 0.14, 0.0, 0.5))


def normalise_foldx(score: Column) -> Column:
    """FoldX |ddG| ≥2 kcal/mol → 1, else scaled [0,1]
    (reference: variant_index.py:464-486)."""
    return F.when(F.abs(score) >= 2, F.lit(1.0)).otherwise(
        _rescale(F.abs(score), 0.0, 2.0, 0.0, 1.0)
    )


def resolve_predictor_methods(
    score: Column, method: Column, assessment: Column
) -> Column:
    """Dispatch a (score, method, assessment) triple to its
    normaliser (reference: variant_index.py:408-438). SpliceAI and
    VEP scores pass through unchanged."""
    return (
        F.when(method == "LOFTEE", normalise_loftee(assessment))
        .when(method == "SIFT", normalise_sift(score, assessment))
        .when(method == "PolyPhen", normalise_polyphen(assessment, score))
        .when(method == "AlphaMissense", normalise_alpha_missense(score))
        .when(method == "CADD", normalise_cadd(score))
        .when(method == "Pangolin", normalise_pangolin(score))
        .when(method == "LossOfFunctionCuration", normalise_lof(assessment))
        .when(method == "SpliceAI", score)
        .when(method == "VEP", score)
        .when(method == "GERP", normalise_gerp(score))
        .when(method == "FoldX", normalise_foldx(score))
    )


def normalise_variant_effect(variant_effect: Column) -> Column:
    """Append a ``normalisedScore`` field to every entry of the
    variantEffect array (reference normalise_variant_effect,
    variant_index.py:380-406)."""
    return F.transform(
        variant_effect,
        lambda predictor: predictor.withField(
            "normalisedScore",
            resolve_predictor_methods(
                predictor["score"], predictor["method"], predictor["assessment"]
            ),
        ),
    )


def get_loftee(variant_index: DataFrame) -> DataFrame:
    """Variant→gene LOFTEE calls with the high-quality pLoF flag
    (reference get_loftee, variant_index.py:341-364)."""
    return (
        variant_index.select(
            "variantId", F.explode("transcriptConsequences").alias("tc")
        )
        .filter(F.col("tc.lofteePrediction").isNotNull())
        .withColumn(
            "isHighQualityPlof",
            F.when(F.col("tc.lofteePrediction") == "HC", True).when(
                F.col("tc.lofteePrediction") == "LC", False
            ),
        )
        .select(
            "variantId",
            F.col("tc.targetId").alias("targetId"),
            F.col("tc.lofteePrediction").alias("lofteePrediction"),
            "isHighQualityPlof",
        )
    )


def annotate_with_amino_acid_consequences(
    variant_index: DataFrame, annotation: DataFrame
) -> DataFrame:
    """Merge amino-acid-level predictor annotations into each
    variant's ``variantEffect`` array (reference
    annotate_with_amino_acid_consequences, variant_index.py:287-340):
    extract the first transcript consequence carrying an amino-acid
    change, explode its Uniprot accessions, join the amino-acid
    annotation table on (accession, change), array_union the
    predictors in, and keep the richest row per variant.

    Two departures from the reference, both deliberate:
    - ``F.get`` instead of ``[0]`` — an ANSI-mode Spark 4 session
      errors on out-of-bounds array indexing;
    - the final keep-richest window orders by (size desc, hash of the
      effect array) so ties resolve deterministically (the reference
      orders by size alone).
    """
    from pyspark.sql.window import Window

    aa_csq = F.filter(
        "transcriptConsequences", lambda vep: vep["aminoAcidChange"].isNotNull()
    )
    w = Window.partitionBy("variantId").orderBy(
        F.size("variantEffect").desc(), F.xxhash64(F.to_json("variantEffect"))
    )
    return (
        variant_index.withColumns(
            {
                "aminoAcidChange": F.get(aa_csq, 0)["aminoAcidChange"],
                "uniprotAccession": F.explode_outer(
                    F.get(aa_csq, 0)["uniprotAccessions"]
                ),
            }
        )
        .join(
            annotation.withColumnRenamed("variantEffect", "annotations"),
            on=["uniprotAccession", "aminoAcidChange"],
            how="left",
        )
        .withColumn(
            "variantEffect",
            F.when(
                F.col("annotations").isNotNull(),
                F.array_union("variantEffect", "annotations"),
            ).otherwise(F.col("variantEffect")),
        )
        .drop("uniprotAccession", "aminoAcidChange", "annotations")
        .distinct()
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") == 1)
        .drop("_rank")
    )
