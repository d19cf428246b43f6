"""Linkage-disequilibrium operators: annotation from an LD index, and
LD-based clumping.

Re-expresses reference src/gentropy/method/ld.py:19-231 (annotation)
and src/gentropy/method/clump.py:17-63 (clumping). The LD source is a
Parquet ``ld_index`` table (variantId, chromosome, ldSet[tag,
rValues[population, r]]) — the engine has no Hail dependency; a
pairwise-LD parquet table replaces the BlockMatrix (SURVEY §7.1).

Scale notes: the study-index join is a broadcast (small dim); the LD
index join shuffles on (variantId, chromosome) — fine-grained. The
clumping window partitions by (studyId, chromosome); the running
collect_set is bounded by loci-per-chromosome (thousands, not
millions), so executor memory is safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.functions.arrays import order_array_of_structs_by_field

UNRESOLVED_LD_FLAG = "Variant not found in LD reference"
LD_CLUMPED_FLAG = "Explained by a more significant variant in high LD"


def _major_population(ordered_populations: Column) -> Column:
    """Major population by relativeSampleSize; ties prefer 'nfe'
    (reference: ld.py:22-44)."""
    major_size = ordered_populations["relativeSampleSize"][0]
    majors = F.filter(ordered_populations, lambda x: x["relativeSampleSize"] == major_size)
    has_nfe = F.filter(majors, lambda x: x["ldPopulation"] == "nfe")
    return F.when(
        (F.size(majors) > 1) & (F.size(has_nfe) == 1), F.lit("nfe")
    ).otherwise(ordered_populations["ldPopulation"][0])


def _r2_for_major_population(ld_set: Column, major_population: Column) -> Column:
    """r² of the major population per tag; 0.0 when absent
    (reference: ld.py:46-75)."""
    return F.transform(
        ld_set,
        lambda x: F.struct(
            x["tagVariantId"].alias("tagVariantId"),
            F.coalesce(
                F.pow(
                    F.filter(x["rValues"], lambda y: y["population"] == major_population)[
                        "r"
                    ][0],
                    2,
                ),
                F.lit(0.0),
            ).alias("r2Overall"),
        ),
    )


def ld_annotate(
    associations: DataFrame,
    studies: DataFrame,
    ld_index: DataFrame,
    r2_threshold: float = 0.5,
) -> DataFrame:
    """Annotate study loci with an ``ldSet`` of tag variants
    (reference: ld.py:116-231).

    1. join study-index population structure (broadcast; small dim)
    2. join ld_index on (variantId, chromosome)
    3. compute per-tag r² for the study's major population
    4. threshold at ``r2_threshold``, null when empty
    5. flag unresolved LD; rescue the lead variant as its own tag
    6. force the lead's r² to 1.0
    """
    pop_structure = F.broadcast(
        studies.select(
            "studyId",
            order_array_of_structs_by_field(
                F.col("ldPopulationStructure"), "relativeSampleSize"
            ).alias("ldPopulationStructure"),
        )
    )
    annotated = (
        associations.drop("ldSet")
        .join(pop_structure, on="studyId", how="left")
        .join(ld_index, on=["variantId", "chromosome"], how="left")
        .withColumn(
            "majorPopulation",
            F.when(
                F.col("ldPopulationStructure").isNotNull(),
                _major_population(F.col("ldPopulationStructure")),
            ),
        )
        .withColumn(
            "ldSet",
            F.when(
                F.col("ldPopulationStructure").isNotNull(),
                _r2_for_major_population(F.col("ldSet"), F.col("majorPopulation")),
            ),
        )
        .drop("ldPopulationStructure", "majorPopulation")
        .withColumn(
            "ldSet",
            F.filter(F.col("ldSet"), lambda x: x["r2Overall"] >= r2_threshold),
        )
        .withColumn("ldSet", F.when(F.size("ldSet") > 0, F.col("ldSet")))
        .withColumn(
            "qualityControls",
            F.when(
                F.col("ldSet").isNull(),
                F.array_union(
                    F.coalesce(F.col("qualityControls"), F.array().cast("array<string>")),
                    F.array(F.lit(UNRESOLVED_LD_FLAG)),
                ),
            ).otherwise(F.col("qualityControls")),
        )
        .withColumn(
            "ldSet",
            F.when(
                (F.col("ldSet").isNull() | (F.size("ldSet") == 0))
                & F.col("variantId").isNotNull(),
                F.array(
                    F.struct(
                        F.col("variantId").alias("tagVariantId"),
                        F.lit(1.0).alias("r2Overall"),
                    )
                ),
            ).otherwise(F.col("ldSet")),
        )
        .withColumn(
            "ldSet",
            F.transform(
                F.col("ldSet"),
                lambda x: F.when(
                    x["tagVariantId"] == F.col("variantId"),
                    F.struct(
                        x["tagVariantId"].alias("tagVariantId"),
                        F.lit(1.0).alias("r2Overall"),
                    ),
                ).otherwise(x),
            ),
        )
    )
    return annotated


def is_lead_linked(
    df: DataFrame,
    study_col: str = "studyId",
    chrom_col: str = "chromosome",
) -> Column:
    """True when a lead is explained by a more significant lead whose
    LD set shares a tag (reference: clump.py:20-66).

    Running ``collect_set`` of more-significant leads over a
    p-value-ordered window, intersected with this lead's tag set.
    """
    w = (
        Window.partitionBy(study_col, chrom_col)
        .orderBy(
            F.col("pValueExponent").asc(),
            F.col("pValueMantissa").asc(),
            F.col("variantId").asc(),  # deterministic tiebreak
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    more_significant_leads = F.collect_set("variantId").over(w)
    tags = F.array_distinct(
        F.array_union(
            F.array(F.col("variantId")),
            F.coalesce(
                F.transform(F.col("ldSet"), lambda x: x["tagVariantId"]),
                F.array().cast("array<string>"),
            ),
        )
    )
    return F.when(
        F.col("variantId").isNotNull(),
        F.size(F.array_intersect(more_significant_leads, tags)) > 1,
    ).otherwise(F.lit(False))


def ld_clump(associations: DataFrame, drop_linked: bool = False) -> DataFrame:
    """Flag (or drop) leads explained by a more significant lead in LD
    (reference: clump.py:68-80)."""
    flagged = associations.withColumn("isLdLinked", is_lead_linked(associations))
    if drop_linked:
        return flagged.filter(~F.col("isLdLinked")).drop("isLdLinked")
    return flagged.withColumn(
        "qualityControls",
        F.when(
            F.col("isLdLinked"),
            F.array_union(
                F.coalesce(F.col("qualityControls"), F.array().cast("array<string>")),
                F.array(F.lit(LD_CLUMPED_FLAG)),
            ),
        ).otherwise(F.col("qualityControls")),
    ).drop("isLdLinked")
