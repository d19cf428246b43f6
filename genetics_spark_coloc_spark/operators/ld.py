"""Linkage-disequilibrium operators: annotation from an LD index, and
LD-based clumping.

Re-expresses reference src/gentropy/method/ld.py:19-231 (annotation)
and src/gentropy/method/clump.py:17-63 (clumping). The LD source is a
Parquet ``ld_index`` table (variantId, chromosome, ldSet[tag,
rValues[population, r]]) — the engine has no Hail dependency; a
pairwise-LD parquet table replaces the BlockMatrix (SURVEY §7.1).

Scale notes: the study-index join is a broadcast (small dim); the LD
index join shuffles on (variantId, chromosome) — fine-grained.
Clumping linkage is a hash semi-join on exploded tag sets (see
``flag_linked_leads``), not the reference's O(n²) running-window
collect_set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
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


def flag_linked_leads(
    df: DataFrame,
    study_col: str = "studyId",
    chrom_col: str = "chromosome",
) -> DataFrame:
    """Adds ``isLdLinked``: True when a lead is explained by a more
    significant lead whose id appears in this lead's LD tag set
    (reference: clump.py:20-66).

    The reference computes this with a running ``collect_set`` window
    — O(n²) state per (study, chromosome) partition, which blows up
    when a chromosome holds thousands of leads. Here the same
    predicate is an EXISTS re-expressed as a hash semi-join:
    explode the (bounded, ~25-element) tag set and join it against
    the lead table on (study, chromosome, tag = other.variantId) with
    a strict significance-ordering residual. O(n·|tags|) work, one
    fine-grained shuffle, same result (the window's intersect>1 is
    exactly "some OTHER more-significant lead is among my tags").
    """
    tags_x = df.select(
        F.col(study_col).alias("a_study"),
        F.col(chrom_col).alias("a_chrom"),
        F.col("variantId").alias("a_vid"),
        F.col("pValueExponent").alias("a_exp"),
        F.col("pValueMantissa").alias("a_mant"),
        F.explode(
            F.array_distinct(
                F.array_union(
                    F.array(F.col("variantId")),
                    F.coalesce(
                        F.transform(F.col("ldSet"), lambda x: x["tagVariantId"]),
                        F.array().cast("array<string>"),
                    ),
                )
            )
        ).alias("a_tag"),
    )
    leads_b = df.select(
        F.col(study_col).alias("b_study"),
        F.col(chrom_col).alias("b_chrom"),
        F.col("variantId").alias("b_vid"),
        F.col("pValueExponent").alias("b_exp"),
        F.col("pValueMantissa").alias("b_mant"),
    )
    linked_keys = (
        tags_x.join(
            leads_b,
            on=[
                F.col("b_study") == F.col("a_study"),
                F.col("b_chrom") == F.col("a_chrom"),
                F.col("b_vid") == F.col("a_tag"),
                F.struct(F.col("b_exp"), F.col("b_mant"), F.col("b_vid"))
                < F.struct(F.col("a_exp"), F.col("a_mant"), F.col("a_vid")),
            ],
            how="inner",
        )
        .select("a_study", "a_chrom", "a_vid")
        .distinct()
        .withColumn("_linked", F.lit(True))
    )
    return (
        df.join(
            linked_keys,
            on=[
                F.col(study_col) == F.col("a_study"),
                F.col(chrom_col) == F.col("a_chrom"),
                F.col("variantId") == F.col("a_vid"),
            ],
            how="left",
        )
        .withColumn(
            "isLdLinked",
            F.col("variantId").isNotNull() & F.coalesce(F.col("_linked"), F.lit(False)),
        )
        .drop("a_study", "a_chrom", "a_vid", "_linked")
    )


def ld_clump(associations: DataFrame, drop_linked: bool = False) -> DataFrame:
    """Flag (or drop) leads explained by a more significant lead in LD
    (reference: clump.py:68-80)."""
    flagged = flag_linked_leads(associations)
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
