"""L2G gold-standard construction: positive curation parsing,
negative expansion by TSS window, independence filtering, and
interaction-based false-negative removal.

Reference anchors: OpenTargetsL2GGoldStandard
(datasource/open_targets/l2g_gold_standard.py:14-128) and
L2GGoldStandard methods (dataset/l2g_gold_standard.py:29-238).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.core.dataset import generate_identifier
from genetics_spark_coloc_spark.functions.reshape import (
    get_record_with_maximum_value,
)

GS_POSITIVE = "positive"
GS_NEGATIVE = "negative"
INTERACTION_THRESHOLD = 0.7
LOCUS_TO_GENE_WINDOW = 500_000


def parse_positive_curation(curation: DataFrame) -> DataFrame:
    """High/Medium-confidence curated (study, variant, gene) triples
    with their curation sources (reference
    open_targets/l2g_gold_standard.py:23-57)."""
    return (
        curation.filter(
            F.col("gold_standard_info.highest_confidence").isin(["High", "Medium"])
        )
        .select(
            F.col("association_info.otg_id").alias("studyId"),
            F.col("gold_standard_info.gene_id").alias("geneId"),
            F.concat_ws(
                "_",
                F.col("sentinel_variant.locus_GRCh38.chromosome"),
                F.col("sentinel_variant.locus_GRCh38.position"),
                F.col("sentinel_variant.alleles.reference"),
                F.col("sentinel_variant.alleles.alternative"),
            ).alias("variantId"),
            F.col("metadata.set_label").alias("source"),
        )
        .withColumn(
            "studyLocusId", generate_identifier(["studyId", "variantId"])
        )
        .groupBy("studyLocusId", "studyId", "variantId", "geneId")
        .agg(F.sort_array(F.collect_set("source")).alias("sources"))
    )


def expand_gold_standard_with_negatives(
    positive_set: DataFrame,
    variant_index: DataFrame,
    window: int = LOCUS_TO_GENE_WINDOW,
) -> DataFrame:
    """Label every gene within the TSS window of a curated lead:
    curated gene → positive, others → negative; curated genes absent
    from the variant index stay positive (reference
    open_targets/l2g_gold_standard.py:59-106)."""
    distances = (
        variant_index.select(
            "variantId", F.explode("transcriptConsequences").alias("tc")
        )
        .select(
            "variantId",
            F.col("tc.targetId").alias("non_curated_geneId"),
            F.col("tc.distanceFromTss").alias("distanceFromTss"),
        )
        .filter(F.col("distanceFromTss") <= window)
    )
    return (
        positive_set.withColumnRenamed("geneId", "curated_geneId")
        .join(distances, on="variantId", how="left")
        .withColumn(
            "goldStandardSet",
            F.when(
                (F.col("curated_geneId") == F.col("non_curated_geneId"))
                | F.col("non_curated_geneId").isNull(),
                F.lit(GS_POSITIVE),
            ).otherwise(GS_NEGATIVE),
        )
        .withColumn(
            "geneId",
            F.when(
                F.col("goldStandardSet") == GS_POSITIVE, F.col("curated_geneId")
            ).otherwise(F.col("non_curated_geneId")),
        )
        .drop("distanceFromTss", "curated_geneId", "non_curated_geneId")
    )


def process_gene_interactions(interactions: DataFrame) -> DataFrame:
    """Top-scoring interaction per gene pair
    (reference dataset/l2g_gold_standard.py:76-106)."""
    return get_record_with_maximum_value(
        interactions, ["targetA", "targetB"], "scoring"
    ).selectExpr("targetA as geneIdA", "targetB as geneIdB", "scoring as score")


def filter_unique_associations(
    gold_standard: DataFrame, squared_overlaps: DataFrame
) -> DataFrame:
    """Drop rows whose lead variant overlaps another locus pointing at
    the same gene (reference dataset/l2g_gold_standard.py:141-183);
    ``squared_overlaps`` must carry both orientations
    (leftStudyLocusId, rightStudyLocusId, tagVariantId)."""
    same_gene = Window.partitionBy("geneId")
    return (
        gold_standard.alias("left")
        .withColumn(
            "sl_same_gene", F.collect_set("studyLocusId").over(same_gene)
        )
        .join(
            squared_overlaps.alias("right"),
            (F.col("left.studyLocusId") == F.col("right.leftStudyLocusId"))
            & (F.col("left.variantId") == F.col("right.tagVariantId")),
            "left",
        )
        .withColumn("overlaps", F.col("right.tagVariantId").isNotNull())
        .filter(~((F.size("sl_same_gene") > 1) & F.col("overlaps")))
        .select(*[f"left.{c}" for c in gold_standard.columns])
    )


def remove_false_negatives(
    gold_standard: DataFrame,
    interactions_df: DataFrame,
    threshold: float = INTERACTION_THRESHOLD,
) -> DataFrame:
    """Drop negative rows whose gene strongly interacts with a
    positive gene at the same standard (reference
    dataset/l2g_gold_standard.py:185-238)."""
    squared = interactions_df.unionByName(
        interactions_df.selectExpr(
            "geneIdB as geneIdA", "geneIdA as geneIdB", "score"
        )
    ).filter(F.col("score") > threshold)
    return (
        gold_standard.alias("left")
        .join(
            squared.alias("right"),
            F.col("left.geneId") == F.col("right.geneIdA"),
            "left",
        )
        .withColumnRenamed("geneIdB", "interactorGeneId")
        .join(
            gold_standard.selectExpr(
                "geneId as interactorGeneId",
                "goldStandardSet as interactorGeneIdGoldStandardSet",
            ),
            "interactorGeneId",
            "left",
        )
        .filter(
            (F.col("geneId") != F.col("interactorGeneId"))
            | F.col("interactorGeneId").isNull()
        )
        .filter(
            ~(F.col("goldStandardSet") == GS_NEGATIVE)
            & (F.col("interactorGeneIdGoldStandardSet") == GS_POSITIVE)
            | F.col("interactorGeneId").isNull()
        )
        .select(*gold_standard.columns)
        .distinct()
    )


def build_gold_standard(
    curation: DataFrame,
    squared_overlaps: DataFrame,
    variant_index: DataFrame,
    interactions: DataFrame,
) -> DataFrame:
    """Full gold-standard pipeline (reference from_otg_curation,
    dataset/l2g_gold_standard.py:34-64): parse positives → expand
    negatives → de-duplicate overlapping loci → remove
    interaction-confounded false negatives."""
    positives = parse_positive_curation(curation)
    expanded = expand_gold_standard_with_negatives(positives, variant_index)
    unique = filter_unique_associations(expanded, squared_overlaps)
    return remove_false_negatives(unique, process_gene_interactions(interactions))
