"""Locus-to-gene (L2G) feature pipeline + distributed scoring.

Re-expresses the reference's feature factory / matrix / model
(src/gentropy/method/l2g/feature_factory.py:100-197,
dataset/l2g_feature_matrix.py:57-108, method/l2g/model.py:178-209)
with two architectural upgrades for scale:

1. Features are declarative long-format ``(studyLocusId, geneId,
   featureName, featureValue)`` pipelines pivoted wide with an
   EXPLICIT pivot-value list (no discovery job).
2. The classifier is ``pyspark.ml`` GBT — distributed training and
   prediction — instead of the reference's driver-side sklearn
   ``toPandas()`` round-trip (its acknowledged bottleneck).

Feature semantics mirror the reference:
- distance features: mean/min distance from credible-set variants to
  the gene's TSS/footprint, weighted by posterior probability
  (dataset/l2g_features/distance.py).
- coloc features: max CLPP / max H4 per (locus, gene) by QTL type
  (dataset/l2g_features/colocalisation.py).
- neighbourhood variants: feature / max(feature over genes at locus)
  (the reference's local normalisation, distance.py:120-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.functions.reshape import pivot_first


_DISTANCE_FEATURE_NAMES = {
    "distanceFromTss": ("distanceTssMean", "distanceSentinelTss"),
    "distanceFromFootprint": ("distanceFootprintMean", "distanceSentinelFootprint"),
}


def _gene_distances(
    variant_index: DataFrame, distance_type: str, genomic_window: int
) -> DataFrame:
    """variantId→(geneId, distance) pairs within the genomic window
    (reference: dataset/variant_index.py:253-283 get_distance_to_gene)."""
    return (
        variant_index.select(
            "variantId", F.explode("transcriptConsequences").alias("csq")
        )
        .select(
            "variantId",
            F.col("csq.targetId").alias("geneId"),
            F.col(f"csq.{distance_type}").alias("d"),
        )
        .filter(F.col("d") <= genomic_window)
    )


def distance_features(
    study_locus: DataFrame,
    variant_index: DataFrame,
    distance_type: str = "distanceFromTss",
    genomic_window: int = 500_000,
) -> DataFrame:
    """Distance features per (studyLocusId, geneId), reference
    semantics (dataset/l2g_features/distance.py:21-81):

    - ``<family>Mean``: log10(Σ_tags (window − d + 1)·pp) / log10(window+1)
      over all credible-set variants;
    - ``distanceSentinel<family>``: log10(window − d + 1) / log10(window+1)
      for the sentinel (lead) variant only — ``study_locus.variantId``.

    Long format output: studyLocusId, geneId, featureName, featureValue.
    """
    mean_name, sentinel_name = _DISTANCE_FEATURE_NAMES[distance_type]
    distances = _gene_distances(variant_index, distance_type, genomic_window)
    log_denom = F.log10(F.lit(float(genomic_window + 1)))

    tags = study_locus.select(
        "studyLocusId", F.explode("locus").alias("tag")
    ).select(
        "studyLocusId",
        F.col("tag.variantId").alias("variantId"),
        F.coalesce(F.col("tag.posteriorProbability"), F.lit(1.0)).alias("pp"),
    )
    mean_f = (
        tags.join(distances, on="variantId", how="inner")
        .withColumn(
            "score", (F.lit(genomic_window) - F.col("d") + F.lit(1)) * F.col("pp")
        )
        .groupBy("studyLocusId", "geneId")
        .agg(F.sum("score").alias("scoreSum"))
        .select(
            "studyLocusId",
            "geneId",
            F.lit(mean_name).alias("featureName"),
            (F.log10("scoreSum") / log_denom).alias("featureValue"),
        )
    )
    sentinel_f = (
        study_locus.select("studyLocusId", "variantId")
        .join(distances, on="variantId", how="inner")
        .withColumn("score", F.lit(genomic_window) - F.col("d") + F.lit(1))
        .groupBy("studyLocusId", "geneId")
        .agg(F.first("score").alias("scoreFirst"))
        .select(
            "studyLocusId",
            "geneId",
            F.lit(sentinel_name).alias("featureName"),
            (F.log10("scoreFirst") / log_denom).alias("featureValue"),
        )
    )
    return mean_f.unionByName(sentinel_f)


def distance_tss_features(
    study_locus: DataFrame, variant_index: DataFrame, max_distance: int = 500_000
) -> DataFrame:
    """TSS distance features (wrapper over :func:`distance_features`).

    If ``study_locus`` lacks a sentinel ``variantId`` column, the
    max-posterior tag (ties → lexicographic variantId) stands in.
    """
    if "variantId" not in study_locus.columns:
        w = Window.partitionBy("studyLocusId").orderBy(
            F.col("tag.posteriorProbability").desc(), F.col("tag.variantId").asc()
        )
        lead = (
            study_locus.select("studyLocusId", F.explode("locus").alias("tag"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("studyLocusId", F.col("tag.variantId").alias("variantId"))
        )
        study_locus = study_locus.join(lead, on="studyLocusId", how="left")
    return distance_features(
        study_locus, variant_index, "distanceFromTss", max_distance
    )


def vep_features(study_locus: DataFrame, variant_index: DataFrame) -> DataFrame:
    """VEP severity features per (studyLocusId, geneId), reference
    semantics (dataset/l2g_features/vep.py:21-75):

    - ``vepMaximum``: max consequence severity over credible-set variants;
    - ``vepMean``: mean of severity·posteriorProbability.

    Long format output: studyLocusId, geneId, featureName, featureValue.
    """
    consequences = variant_index.select(
        "variantId", F.explode("transcriptConsequences").alias("csq")
    ).select(
        "variantId",
        F.col("csq.targetId").alias("geneId"),
        F.col("csq.consequenceScore").alias("severityScore"),
    )
    joined = (
        study_locus.select("studyLocusId", F.explode_outer("locus").alias("tag"))
        .select(
            "studyLocusId",
            F.col("tag.variantId").alias("variantId"),
            F.col("tag.posteriorProbability").alias("pp"),
        )
        .join(consequences, on="variantId", how="inner")
    )
    agg = joined.groupBy("studyLocusId", "geneId").agg(
        F.max("severityScore").alias("maxScore"),
        F.mean(F.col("severityScore") * F.col("pp")).alias("meanScore"),
    )
    return agg.select(
        "studyLocusId",
        "geneId",
        F.lit("vepMaximum").alias("featureName"),
        F.col("maxScore").alias("featureValue"),
    ).unionByName(
        agg.select(
            "studyLocusId",
            "geneId",
            F.lit("vepMean").alias("featureName"),
            F.col("meanScore").alias("featureValue"),
        )
    )


def local_features(
    study_locus: DataFrame,
    variant_index: DataFrame,
    genomic_window: int = 500_000,
) -> DataFrame:
    """The six tag-level feature families — distanceTssMean /
    distanceSentinelTss / distanceFootprintMean /
    distanceSentinelFootprint / vepMaximum / vepMean — in TWO
    aggregation passes instead of five.

    Semantically the union of :func:`distance_features` (both distance
    types) and :func:`vep_features`: all five pipelines explode the
    same ``study_locus.locus`` / ``variant_index.
    transcriptConsequences`` pair and join on variantId, differing
    only in the aggregate, so one tags⋈csq shuffle computes every
    credible-set aggregate (the per-type ``d <= window`` filters move
    inside conditional sums; groups are kept or dropped by a
    has-qualifying-row count per family, reproducing the split
    pipelines' inner-join row sets exactly — including the edge where
    every in-window tag has posteriorProbability 0.0 and the mean is
    a NULL-valued row) and one sentinel⋈csq shuffle computes both
    sentinel scores.
    At 100 TB this is the difference between shuffling the exploded
    credible-set join five times and twice.

    Long format output: studyLocusId, geneId, featureName,
    featureValue. NULL handling matches the split pipelines
    family-by-family (see the unpivot NULL-policy comment), so the
    final registry matrix — including all-zero candidate rows from
    groups whose only evidence is NULL severities — is identical to
    the split form's; pinned by the ``l2g_registry_matrix`` oracle.
    """
    w_lit = F.lit(genomic_window)
    log_denom = F.log10(F.lit(float(genomic_window + 1)))
    csq = variant_index.select(
        "variantId", F.explode("transcriptConsequences").alias("csq")
    ).select(
        "variantId",
        F.col("csq.targetId").alias("geneId"),
        F.col("csq.distanceFromTss").alias("dTss"),
        F.col("csq.distanceFromFootprint").alias("dFp"),
        F.col("csq.consequenceScore").alias("severityScore"),
    )
    tags = study_locus.select(
        "studyLocusId", F.explode("locus").alias("tag")
    ).select(
        "studyLocusId",
        F.col("tag.variantId").alias("variantId"),
        F.col("tag.posteriorProbability").alias("pp"),
    )
    pp1 = F.coalesce(F.col("pp"), F.lit(1.0))
    tag_agg = (
        tags.join(csq, on="variantId", how="inner")
        .groupBy("studyLocusId", "geneId")
        .agg(
            (
                F.log10(
                    F.sum(
                        F.when(
                            F.col("dTss") <= w_lit,
                            (w_lit - F.col("dTss") + F.lit(1)) * pp1,
                        )
                    )
                )
                / log_denom
            ).alias("distanceTssMean"),
            (
                F.log10(
                    F.sum(
                        F.when(
                            F.col("dFp") <= w_lit,
                            (w_lit - F.col("dFp") + F.lit(1)) * pp1,
                        )
                    )
                )
                / log_denom
            ).alias("distanceFootprintMean"),
            F.max("severityScore").alias("vepMaximum"),
            F.mean(F.col("severityScore") * F.col("pp")).alias("vepMean"),
            # qualifying-row counts, NOT value-IS-NOT-NULL: when every
            # in-window tag has posteriorProbability exactly 0.0 the
            # weighted sum is 0 and log10(0) is NULL, yet the split
            # distance_features pipelines (inner join on the window
            # filter, no value filter) still emitted that NULL row —
            # filtering the unpivot on the VALUE would drop it and
            # diverge from the split form on this edge
            F.count(F.when(F.col("dTss") <= w_lit, 1)).alias("_nTss"),
            F.count(F.when(F.col("dFp") <= w_lit, 1)).alias("_nFp"),
        )
    )
    sent_agg = (
        study_locus.select("studyLocusId", "variantId")
        .join(csq, on="variantId", how="inner")
        .groupBy("studyLocusId", "geneId")
        .agg(
            (
                F.log10(
                    F.first(
                        F.when(
                            F.col("dTss") <= w_lit, w_lit - F.col("dTss") + F.lit(1)
                        ),
                        ignorenulls=True,
                    )
                )
                / log_denom
            ).alias("distanceSentinelTss"),
            (
                F.log10(
                    F.first(
                        F.when(
                            F.col("dFp") <= w_lit, w_lit - F.col("dFp") + F.lit(1)
                        ),
                        ignorenulls=True,
                    )
                )
                / log_denom
            ).alias("distanceSentinelFootprint"),
        )
    )

    def unpivot(
        df: DataFrame, names: list[str], drop_null: bool
    ) -> DataFrame:
        stack = ", ".join(f"'{n}', `{n}`" for n in names)
        out = df.select(
            "studyLocusId",
            "geneId",
            F.expr(f"stack({len(names)}, {stack})").alias(
                "featureName", "featureValue"
            ),
        )
        return out.filter(F.col("featureValue").isNotNull()) if drop_null else out

    # NULL policy mirrors the split pipelines exactly: the distance
    # families inner-joined on the window filter, so a group with no
    # qualifying row emitted NO long row — but a group WITH a
    # qualifying row kept its row even when the aggregate itself is
    # NULL (all in-window pp == 0.0 → sum 0 → log10 NULL), hence the
    # per-family _nTss/_nFp flag filter rather than a value filter;
    # vep_features emitted its two rows for every joined (locus, gene)
    # group EVEN when the aggregate was NULL (all-NULL severities),
    # and those groups must survive to the matrix as all-zero
    # candidate rows after fillna — dropping them would shrink the
    # candidate-gene row set on real data with missing VEP scores.
    dist_long = (
        tag_agg.select(
            "studyLocusId",
            "geneId",
            "_nTss",
            "_nFp",
            F.expr(
                "stack(2, 'distanceTssMean', `distanceTssMean`, "
                "'distanceFootprintMean', `distanceFootprintMean`)"
            ).alias("featureName", "featureValue"),
        )
        .filter(
            F.when(
                F.col("featureName") == "distanceTssMean", F.col("_nTss") > 0
            ).otherwise(F.col("_nFp") > 0)
        )
        .drop("_nTss", "_nFp")
    )
    return (
        dist_long.unionByName(
            unpivot(tag_agg, ["vepMaximum", "vepMean"], False)
        )
        .unionByName(
            unpivot(
                sent_agg,
                ["distanceSentinelTss", "distanceSentinelFootprint"],
                True,
            )
        )
    )


def coloc_features(
    study_locus: DataFrame, colocalisation: DataFrame, study_index: DataFrame
) -> DataFrame:
    """Max CLPP / max H4 per (left locus, right study's gene), split by
    right study type (eqtl/pqtl/sqtl)
    (reference: l2g_features/colocalisation.py)."""
    right_meta = study_locus.select(
        F.col("studyLocusId").alias("rightStudyLocusId"),
        F.col("studyId").alias("rightStudyId"),
    ).join(
        study_index.select(
            F.col("studyId").alias("rightStudyId"),
            "geneId",
            F.col("studyType").alias("rightType"),
        ),
        on="rightStudyId",
    )
    joined = colocalisation.join(right_meta, on="rightStudyLocusId", how="inner").filter(
        F.col("geneId").isNotNull() & F.col("rightType").isin("eqtl", "pqtl", "sqtl")
    )
    agg = joined.groupBy(
        F.col("leftStudyLocusId").alias("studyLocusId"), "geneId", "rightType"
    ).agg(F.max("clpp").alias("maxClpp"), F.max("h4").alias("maxH4"))
    # feature names use the reference registry casing: eQtl/pQtl/sQtl
    prefix = (
        F.when(F.col("rightType") == "eqtl", F.lit("eQtl"))
        .when(F.col("rightType") == "pqtl", F.lit("pQtl"))
        .otherwise(F.lit("sQtl"))
    )
    clpp = agg.filter(F.col("maxClpp").isNotNull()).select(
        "studyLocusId",
        "geneId",
        F.concat(prefix, F.lit("ColocClppMaximum")).alias("featureName"),
        F.col("maxClpp").alias("featureValue"),
    )
    h4 = agg.filter(F.col("maxH4").isNotNull()).select(
        "studyLocusId",
        "geneId",
        F.concat(prefix, F.lit("ColocH4Maximum")).alias("featureName"),
        F.col("maxH4").alias("featureValue"),
    )
    return clpp.unionByName(h4)


def neighbourhood_normalise(
    features_long: DataFrame, protein_coding_genes: DataFrame | None = None
) -> DataFrame:
    """Per (studyLocusId, featureName): value / max(value) across genes
    (reference: l2g_features/distance.py:120-123, vep.py:77-124).
    Appends '<name>Neighbourhood' rows.

    When ``protein_coding_genes`` (single column ``geneId``) is given,
    rows are restricted to those genes before the regional max — the
    reference excludes non-protein-coding genes from neighbourhood
    features (vep.py:104-108, issue #3552 note).
    """
    if protein_coding_genes is not None:
        features_long = features_long.join(
            F.broadcast(protein_coding_genes.select("geneId")), on="geneId", how="inner"
        )
    w = Window.partitionBy("studyLocusId", "featureName")
    return features_long.withColumn(
        "_max", F.max("featureValue").over(w)
    ).select(
        "studyLocusId",
        "geneId",
        F.concat(F.col("featureName"), F.lit("Neighbourhood")).alias("featureName"),
        F.when(F.col("_max") != 0, F.col("featureValue") / F.col("_max"))
        .otherwise(0.0)
        .alias("featureValue"),
    )


def gene_count_features(
    study_locus: DataFrame, target_index: DataFrame, window: int = 500_000
) -> DataFrame:
    """Number of (protein-coding) genes within ±window of the lead
    (reference: l2g_features/other.py gene counts)."""
    genes = target_index.select(
        "id",
        F.col("genomicLocation.chromosome").alias("g_chrom"),
        F.col("tss").alias("g_tss"),
        "biotype",
    )
    base = study_locus.select("studyLocusId", "chromosome", "position").join(
        F.broadcast(genes),
        on=[
            F.col("chromosome") == F.col("g_chrom"),
            (F.col("g_tss") >= F.col("position") - window)
            & (F.col("g_tss") <= F.col("position") + window),
        ],
    )
    counts = base.groupBy("studyLocusId").agg(
        F.count(F.lit(1)).cast("double").alias("geneCount500kb"),
        F.sum((F.col("biotype") == "protein_coding").cast("int"))
        .cast("double")
        .alias("proteinGeneCount500kb"),
    )
    per_gene = base.select("studyLocusId", F.col("id").alias("geneId")).distinct()
    long_rows = per_gene.join(counts, on="studyLocusId")
    return long_rows.select(
        "studyLocusId", "geneId", F.lit("geneCount500kb").alias("featureName"),
        F.col("geneCount500kb").alias("featureValue"),
    ).unionByName(
        long_rows.select(
            "studyLocusId", "geneId", F.lit("proteinGeneCount500kb").alias("featureName"),
            F.col("proteinGeneCount500kb").alias("featureValue"),
        )
    )


# the reference's full feature registry
# (method/l2g/feature_factory.py:102-134)
REGISTRY_FEATURES = [
    "distanceSentinelTss",
    "distanceSentinelTssNeighbourhood",
    "distanceSentinelFootprint",
    "distanceSentinelFootprintNeighbourhood",
    "distanceTssMean",
    "distanceTssMeanNeighbourhood",
    "distanceFootprintMean",
    "distanceFootprintMeanNeighbourhood",
    "eQtlColocClppMaximum",
    "eQtlColocClppMaximumNeighbourhood",
    "pQtlColocClppMaximum",
    "pQtlColocClppMaximumNeighbourhood",
    "sQtlColocClppMaximum",
    "sQtlColocClppMaximumNeighbourhood",
    "eQtlColocH4Maximum",
    "eQtlColocH4MaximumNeighbourhood",
    "pQtlColocH4Maximum",
    "pQtlColocH4MaximumNeighbourhood",
    "sQtlColocH4Maximum",
    "sQtlColocH4MaximumNeighbourhood",
    "vepMean",
    "vepMeanNeighbourhood",
    "vepMaximum",
    "vepMaximumNeighbourhood",
    "geneCount500kb",
    "proteinGeneCount500kb",
    "isProteinCoding",
    "credibleSetConfidence",
]


def is_protein_coding_features(
    study_locus: DataFrame, target_index: DataFrame, window: int = 500_000
) -> DataFrame:
    """``isProteinCoding``: 1.0 for protein-coding genes within
    ±window of the lead position, 0.0 for other nearby genes
    (reference: l2g_features/other.py:228-266)."""
    genes = target_index.select(
        F.col("id").alias("geneId"),
        F.col("genomicLocation.chromosome").alias("g_chrom"),
        F.col("tss").alias("g_tss"),
        "biotype",
    )
    return (
        study_locus.select("studyLocusId", "chromosome", "position")
        .join(
            F.broadcast(genes),
            on=[
                F.col("chromosome") == F.col("g_chrom"),
                (F.col("g_tss") >= F.col("position") - window)
                & (F.col("g_tss") <= F.col("position") + window),
            ],
        )
        .select(
            "studyLocusId",
            "geneId",
            F.lit("isProteinCoding").alias("featureName"),
            (F.col("biotype") == "protein_coding").cast("double").alias("featureValue"),
        )
        .distinct()
    )


def credible_set_confidence_features(
    study_locus: DataFrame, variant_index: DataFrame
) -> DataFrame:
    """``credibleSetConfidence``: the locus's confidence-class score
    attached to every gene its credible-set variants are consequences
    of (reference: l2g_features/other.py:268-357 + the 1.0/0.75/0.5/
    0.25 class mapping in study_locus_ops.score_credible_set_confidence)."""
    from genetics_spark_coloc_spark.operators.study_locus_ops import (
        score_credible_set_confidence,
    )

    variant_genes = variant_index.select(
        "variantId", F.explode("transcriptConsequences").alias("csq")
    ).select("variantId", F.col("csq.targetId").alias("geneId")).distinct()
    tags = study_locus.select(
        "studyLocusId",
        score_credible_set_confidence(F.col("confidence")).alias("score"),
        F.explode("locus").alias("tag"),
    ).select("studyLocusId", "score", F.col("tag.variantId").alias("variantId"))
    return (
        tags.join(variant_genes, on="variantId", how="inner")
        .groupBy("studyLocusId", "geneId")
        .agg(F.max("score").alias("featureValue"))
        .select(
            "studyLocusId",
            "geneId",
            F.lit("credibleSetConfidence").alias("featureName"),
            "featureValue",
        )
    )


def extend_coloc_to_neighbourhood_genes(
    coloc_long: DataFrame,
    study_locus: DataFrame,
    variant_index: DataFrame,
    target_index: DataFrame,
) -> DataFrame:
    """Zero-valued rows for protein-coding genes linked (via variant
    consequences) to a locus's sentinel variant but absent from the
    colocalisation results — so the coloc neighbourhood max runs over
    ALL nearby coding genes, not only colocalising ones (reference:
    l2g_features/colocalisation.py:73-128).

    ``coloc_long`` is long-format (studyLocusId, geneId, featureName,
    featureValue); zero rows are emitted per featureName present.
    """
    coding_variant_gene = (
        variant_index.select(
            "variantId", F.explode("transcriptConsequences").alias("csq")
        )
        .select("variantId", F.col("csq.targetId").alias("geneId"))
        .join(
            F.broadcast(
                target_index.filter(F.col("biotype") == "protein_coding").select(
                    F.col("id").alias("geneId")
                )
            ),
            on="geneId",
        )
        .distinct()
    )
    locus_variant = study_locus.select("studyLocusId", "variantId")
    locus_genes = locus_variant.join(coding_variant_gene, on="variantId").select(
        "studyLocusId", "geneId"
    )
    names = coloc_long.select("featureName").distinct()
    candidate_rows = locus_genes.crossJoin(F.broadcast(names))
    return candidate_rows.join(
        coloc_long.select("studyLocusId", "geneId", "featureName"),
        on=["studyLocusId", "geneId", "featureName"],
        how="left_anti",
    ).select(
        "studyLocusId", "geneId", "featureName", F.lit(0.0).alias("featureValue")
    )


def build_registry_feature_matrix(
    study_locus: DataFrame,
    variant_index: DataFrame,
    colocalisation: DataFrame,
    study_index: DataFrame,
    target_index: DataFrame,
    genomic_window: int = 500_000,
    qtl_locus_to_study: DataFrame | None = None,
) -> DataFrame:
    """The full reference feature registry as one wide matrix —
    every feature in ``REGISTRY_FEATURES`` (feature_factory.py:102-134)
    computed from its family pipeline, neighbourhood-normalised where
    the registry has a Neighbourhood variant, pivoted with an explicit
    value list and 0.0-filled."""
    protein_coding = target_index.filter(
        F.col("biotype") == "protein_coding"
    ).select(F.col("id").alias("geneId"))

    # one merged pass over the exploded tags⋈consequences join for all
    # six tag-level families (2 shuffles, not 5 — see local_features)
    # r14: each family's long table fans out to multiple consumers
    # (local → the union + its neighbourhood normalisation; coloc →
    # the union + the neighbourhood extension + ITS normalisation),
    # and without a lineage barrier every consumer re-executes the
    # window-heavy family pipeline inside the one assembled plan
    # (438-node plan, local/coloc subtrees executed 2-3x). The long
    # tables are tiny (|loci × genes| rows), so a lazy localCheckpoint
    # at each fan-out point trades nothing for single execution.
    local = local_features(
        study_locus, variant_index, genomic_window
    ).localCheckpoint(eager=False)
    # the right-side (QTL) locus→study mapping defaults to the same
    # study-locus table; pass a dedicated one when QTL credible sets
    # live in their own table
    coloc = coloc_features(
        qtl_locus_to_study if qtl_locus_to_study is not None else study_locus,
        colocalisation,
        study_index,
    ).localCheckpoint(eager=False)
    coloc_extended = coloc.unionByName(
        extend_coloc_to_neighbourhood_genes(
            coloc, study_locus, variant_index, target_index
        )
    ).localCheckpoint(eager=False)
    counts = gene_count_features(study_locus, target_index, genomic_window)
    coding = is_protein_coding_features(study_locus, target_index, genomic_window)
    confidence = credible_set_confidence_features(study_locus, variant_index)

    neighbourhoods = neighbourhood_normalise(
        local, protein_coding_genes=protein_coding
    ).unionByName(
        neighbourhood_normalise(coloc_extended, protein_coding_genes=protein_coding)
    )
    long = (
        local.unionByName(coloc)
        .unionByName(neighbourhoods)
        .unionByName(counts)
        .unionByName(coding)
        .unionByName(confidence)
    )
    return assemble_feature_matrix(long, REGISTRY_FEATURES)


def assemble_feature_matrix(
    features_long: DataFrame, feature_names: list[str]
) -> DataFrame:
    """Long -> wide feature matrix with explicit pivot values and 0.0
    fill (reference: l2g_feature_matrix.py:57-108 + fill_na)."""
    wide = pivot_first(
        features_long, ["studyLocusId", "geneId"], "featureName", "featureValue",
        pivot_values=feature_names,
    )
    return wide.fillna(0.0, subset=feature_names)


def feature_missingness_rates(
    feature_matrix: DataFrame, feature_names: list[str]
) -> DataFrame:
    """Proportion of missing (null or 0) values per feature column
    (reference calculate_feature_missingness_rate,
    l2g_feature_matrix.py:109-132).

    The reference launches one count() JOB PER FEATURE (N+1 scans);
    here a single aggregation pass computes every rate at once, then
    unpivots to long (featureName, missingRate) — one scan total,
    which is the difference between minutes and hours on a 100 TB
    matrix.
    """
    aggs = [
        F.avg((F.col(c).isNull() | (F.col(c) == 0)).cast("double")).alias(c)
        for c in feature_names
    ]
    stacked = ", ".join(f"'{c}', `{c}`" for c in feature_names)
    return feature_matrix.agg(*aggs).selectExpr(
        f"stack({len(feature_names)}, {stacked}) AS (featureName, missingRate)"
    )


def train_l2g_model(
    feature_matrix: DataFrame,
    label_col: str = "goldStandardSet",
    feature_names: list[str] | None = None,
    max_iter: int = 20,
):
    """Train a distributed GBT classifier on the feature matrix.

    Returns the fitted pyspark.ml PipelineModel. This replaces the
    reference's sklearn-on-driver training (model.py:178-209) with
    in-cluster training.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    feature_names = feature_names or [
        c for c in feature_matrix.columns if c not in ("studyLocusId", "geneId", label_col)
    ]
    assembler = VectorAssembler(inputCols=feature_names, outputCol="features")
    gbt = GBTClassifier(labelCol=label_col, featuresCol="features", maxIter=max_iter, seed=42)
    return Pipeline(stages=[assembler, gbt]).fit(feature_matrix)


def save_l2g_model(
    model,
    path: str,
    feature_names: list[str] | None = None,
    label_col: str = "goldStandardSet",
) -> None:
    """Persist a trained L2G model so a model trained today can score
    tomorrow without retraining (reference ``LocusToGeneModel.save``,
    method/l2g/model.py:211-231; there skops serializes a driver-side
    sklearn estimator). Here the distributed pyspark.ml PipelineModel
    uses its native ML writer — readable on any cluster that can see
    the path — plus a sidecar ``l2g_metadata`` JSON dataset (feature
    list + label column, mirroring the reference's ``features_list``
    metadata) written through Spark so it lands on the same
    filesystem, local or object store.

    ``feature_names`` defaults to the fitted VectorAssembler's input
    columns, so the saved metadata always matches what the model was
    actually trained on.
    """
    if feature_names is None:
        feature_names = list(model.stages[0].getInputCols())
    model.write().overwrite().save(f"{path}/pipeline")
    from pyspark.sql import SparkSession  # noqa: PLC0415

    ss = SparkSession.getActiveSession()
    meta = ss.createDataFrame(
        [(list(feature_names), label_col)],
        "featureNames array<string>, labelCol string",
    )
    meta.coalesce(1).write.mode("overwrite").json(f"{path}/l2g_metadata")


def load_l2g_model(spark, path: str):
    """Load a persisted L2G model (reference
    ``LocusToGeneModel.load_from_disk``, method/l2g/model.py:56-110).
    Returns ``(PipelineModel, metadata dict)`` where metadata carries
    ``featureNames`` (list[str]) and ``labelCol``. Loaded models score
    identically to the in-session model (pinned by the round-trip
    parity test)."""
    from pyspark.ml import PipelineModel

    model = PipelineModel.load(f"{path}/pipeline")
    row = spark.read.json(f"{path}/l2g_metadata").first()
    meta = {
        "featureNames": list(row["featureNames"]),
        "labelCol": row["labelCol"],
    }
    return model, meta


def predict_l2g(model, feature_matrix: DataFrame) -> DataFrame:
    """Distributed scoring: P(gene is causal) per (studyLocusId, geneId)."""
    from pyspark.ml.functions import vector_to_array

    return model.transform(feature_matrix).select(
        "studyLocusId",
        "geneId",
        vector_to_array(F.col("probability"))[1].alias("l2gScore"),
    )


def to_disease_target_evidence(
    predictions: DataFrame,
    study_locus: DataFrame,
    study_index: DataFrame,
    l2g_threshold: float = 0.05,
) -> DataFrame:
    """L2G predictions → disease/target evidence rows (reference
    dataset/l2g_prediction.py:105-144): threshold on score, join the
    credible set for studyId, join the study index for diseaseIds,
    explode one evidence row per disease.

    study_index is broadcast (small dim); the predictions→study_locus
    join shuffles on studyLocusId only once.
    """
    return (
        predictions.filter(F.col("score") >= l2g_threshold)
        .join(
            study_locus.select("studyLocusId", "studyId"),
            on="studyLocusId",
            how="inner",
        )
        .join(
            F.broadcast(study_index.select("studyId", "diseaseIds")),
            on="studyId",
            how="inner",
        )
        .select(
            F.lit("genetic_association").alias("datatypeId"),
            F.lit("gwas_credible_sets").alias("datasourceId"),
            F.col("geneId").alias("targetFromSourceId"),
            F.explode(F.col("diseaseIds")).alias("diseaseFromSourceMappedId"),
            F.col("score").alias("resourceScore"),
            "studyLocusId",
        )
    )


def add_prediction_features(
    predictions: DataFrame,
    feature_matrix: DataFrame,
    feature_names: list[str],
) -> DataFrame:
    """Annotate predictions with the feature vector they were scored
    on, as an array of (name, value) structs (reference
    dataset/l2g_prediction.py:270-306)."""
    return predictions.join(
        feature_matrix.select("studyLocusId", "geneId", *feature_names),
        on=["studyLocusId", "geneId"],
        how="left",
    ).select(
        "studyLocusId",
        "geneId",
        "score",
        F.array(
            *[
                F.struct(F.lit(c).alias("name"), F.col(c).alias("value"))
                for c in feature_names
            ]
        ).alias("features"),
    )


def to_l2g_feature_long(
    feature_matrix: DataFrame, feature_names: list[str]
) -> DataFrame:
    """Wide feature matrix -> long `l2g_feature` entity rows
    (reference: assets/schemas/l2g_feature.json; dataset/l2g_feature.py).

    One row per (studyLocusId, geneId, featureName) with a non-null
    float value — null features are absent rows, matching the
    reference's long-form storage. Validates against
    ``get_schema("l2g_feature")``.
    """
    stacked = feature_matrix.select(
        "studyLocusId",
        "geneId",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("featureName"),
                        F.col(c).cast("float").alias("featureValue"),
                    )
                    for c in feature_names
                ]
            )
        ).alias("_fv"),
    )
    return stacked.filter(F.col("_fv.featureValue").isNotNull()).select(
        F.col("studyLocusId").cast("string"),
        F.col("geneId").cast("string"),
        F.col("_fv.featureName").alias("featureName"),
        F.col("_fv.featureValue").alias("featureValue"),
    )


def to_l2g_predictions_entity(
    predictions: DataFrame,
    feature_matrix: DataFrame,
    feature_names: list[str],
    score_col: str = "l2gScore",
) -> DataFrame:
    """Conform scored predictions to the `l2g_predictions` entity
    (reference: assets/schemas/l2g_predictions.json): score as
    non-null double, features array<struct<name, value, shapValue>>
    with float values, nullable shapBaseValue. shapValue columns stay
    null until an explainer fills them (see ``explain_predictions``).
    """
    annotated = predictions.join(
        feature_matrix.select("studyLocusId", "geneId", *feature_names),
        on=["studyLocusId", "geneId"],
        how="left",
    )
    return annotated.filter(F.col(score_col).isNotNull()).select(
        F.col("studyLocusId").cast("string"),
        F.col("geneId").cast("string"),
        F.col(score_col).cast("double").alias("score"),
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("name"),
                    F.coalesce(F.col(c).cast("float"), F.lit(0.0).cast("float")).alias(
                        "value"
                    ),
                    F.lit(None).cast("float").alias("shapValue"),
                )
                for c in feature_names
            ]
        ).alias("features"),
        F.lit(None).cast("float").alias("shapBaseValue"),
    )


def explain_predictions(
    model,
    feature_matrix: DataFrame,
    feature_names: list[str],
    baseline_value: float = 0.0,
) -> DataFrame:
    """Per-feature occlusion contributions, fully distributed.

    NOTE: for GBT models prefer ``operators.treeshap.
    explain_predictions_treeshap`` — exact TreeSHAP (the reference's
    l2g_prediction.py:146-268 semantics) in ONE mapInPandas pass.
    This occlusion explainer remains as the model-agnostic fallback
    (it only needs ``model.transform``): each feature's contribution
    is the score delta when that feature is occluded to
    ``baseline_value`` — N+1 distributed transform passes
    (N = len(feature_names)), no data ever collected. Output shape:
    features array<struct<name, value, contribution>> + baseScore.
    """
    from pyspark.ml.functions import vector_to_array

    def _score(df: DataFrame) -> DataFrame:
        return model.transform(df).select(
            "studyLocusId",
            "geneId",
            vector_to_array(F.col("probability"))[1].alias("_s"),
        )

    base = _score(feature_matrix).withColumnRenamed("_s", "baseScore")
    out = feature_matrix.select("studyLocusId", "geneId", *feature_names).join(
        base, on=["studyLocusId", "geneId"], how="inner"
    )
    for name in feature_names:
        occluded = _score(
            feature_matrix.withColumn(name, F.lit(baseline_value))
        ).withColumnRenamed("_s", f"_occ_{name}")
        out = out.join(occluded, on=["studyLocusId", "geneId"], how="inner")
    return out.select(
        "studyLocusId",
        "geneId",
        "baseScore",
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("name"),
                    F.col(c).alias("value"),
                    (F.col("baseScore") - F.col(f"_occ_{c}")).alias("contribution"),
                )
                for c in feature_names
            ]
        ).alias("features"),
    )
