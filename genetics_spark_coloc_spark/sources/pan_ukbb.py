"""Pan-UKBB LD matrix toolset, Hail-free.

Reference: datasource/pan_ukbb_ld/ld.py:20-214. Two operators carry
the semantics:

- ``align_ld_index_alleles`` (:46-147): join the Pan-UKBB LD variant
  index against the variant annotation on (chromosome, position),
  keep direct, flipped, or unannotated allele matches, rewrite
  flipped alleles to the annotation's orientation with
  ``alleleOrder = -1``, and keep the best (direct-first) row per
  matrix index.
- ``symmetrise_ld_entries``: the reference materialises the locus LD
  block as a driver-side numpy matrix (:149-181 — upper triangle +
  transpose, allele-order sign outer product, unit diagonal). Here
  the same completion runs relationally on (i, j, r) entries, so it
  scales to whole-chromosome matrices: union the swapped lower
  triangle, join per-side allele orders for the sign, force r=1 on
  the diagonal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def align_ld_index_alleles(
    ukbb_index: DataFrame, variant_annotation: DataFrame
) -> DataFrame:
    """Align LD-index alleles to the variant annotation's orientation
    (reference ld.py:46-147).

    ``ukbb_index``: (chromosome, position, referenceAllele,
    alternateAllele, idx). ``variant_annotation``: (chromosome,
    position, referenceAllele, alternateAllele).
    """
    ukbb = ukbb_index.dropDuplicates(
        ["chromosome", "position", "referenceAllele", "alternateAllele"]
    )
    va = variant_annotation.select(
        "chromosome",
        "position",
        F.col("referenceAllele").alias("vaRef"),
        F.col("alternateAllele").alias("vaAlt"),
    ).dropDuplicates(["chromosome", "position", "vaRef", "vaAlt"])

    direct = (F.col("referenceAllele") == F.col("vaRef")) & (
        F.col("alternateAllele") == F.col("vaAlt")
    )
    flipped = (F.col("referenceAllele") == F.col("vaAlt")) & (
        F.col("alternateAllele") == F.col("vaRef")
    )
    aligned = (
        ukbb.join(va, on=["chromosome", "position"], how="left")
        .filter(direct | flipped | F.col("vaRef").isNull() | F.col("vaAlt").isNull())
        .withColumn("alleleOrder", F.when(flipped, -1).otherwise(1))
        .withColumn(
            "newRef", F.when(flipped, F.col("vaRef")).otherwise(F.col("referenceAllele"))
        )
        .withColumn(
            "newAlt", F.when(flipped, F.col("vaAlt")).otherwise(F.col("alternateAllele"))
        )
        .select(
            F.concat_ws("_", "chromosome", "position", "newRef", "newAlt").alias(
                "variantId"
            ),
            "chromosome",
            "position",
            F.col("newRef").alias("referenceAllele"),
            F.col("newAlt").alias("alternateAllele"),
            "alleleOrder",
            "idx",
        )
    )
    # best row per matrix index: direct orientation (alleleOrder 1)
    # wins; ties broken on variantId for determinism (the reference's
    # rank() keeps duplicate rank-1 rows on ties — here exactly one)
    w = Window.partitionBy("idx").orderBy(
        F.col("alleleOrder").desc(), F.col("variantId")
    )
    return (
        aligned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def symmetrise_ld_entries(
    half_entries: DataFrame, allele_order: DataFrame
) -> DataFrame:
    """Upper-triangular LD entries → full signed symmetric matrix
    entries (reference ld.py:149-181, relational spelling).

    ``half_entries``: (i, j, r) with i ≤ j (hail's stored upper
    triangle). ``allele_order``: (idx, alleleOrder ∈ {1,-1}). Result:
    (i, j, r) for every ordered pair, where off-diagonal r is
    multiplied by alleleOrder_i × alleleOrder_j and the diagonal is
    exactly 1.
    """
    upper = half_entries.filter(F.col("i") != F.col("j"))
    mirrored = upper.select(
        F.col("j").alias("i"), F.col("i").alias("j"), F.col("r")
    )
    diagonal = (
        allele_order.select(F.col("idx").alias("i"))
        .withColumn("j", F.col("i"))
        .withColumn("r", F.lit(1.0))
    )
    orders = F.broadcast(allele_order)
    return (
        upper.unionByName(mirrored)
        .join(
            orders.select(F.col("idx").alias("i"), F.col("alleleOrder").alias("orderI")),
            on="i",
        )
        .join(
            orders.select(F.col("idx").alias("j"), F.col("alleleOrder").alias("orderJ")),
            on="j",
        )
        .select("i", "j", (F.col("r") * F.col("orderI") * F.col("orderJ")).alias("r"))
        .unionByName(diagonal)
    )
