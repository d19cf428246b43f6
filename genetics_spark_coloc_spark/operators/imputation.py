"""Summary-statistics imputation and LD-consistency QC.

Declarative re-expressions of the reference's driver-side numpy
kernels (SURVEY §2.9):

- ``impute_zscores``: RAISS-style imputation of z-scores for variants
  missing from a study, from LD neighbours
  (reference: method/sumstat_imputation.py:15-172 runs per-locus
  numpy on the driver). The simplified estimator here is the
  normalized LD-weighted combination ẑ_t = Σᵢ rᵢ·zᵢ / √(Σᵢ rᵢ²) over
  observed neighbours — the diagonal approximation of the RAISS
  conditional-expectation formula (exact when neighbours are
  mutually uncorrelated). Joins + group aggregates only, so it
  scales as ordinary hash joins; the exact matrix-inverse variant
  plugs into ``finemapping.finemap_grouped`` as a kernel.

- ``flag_ld_outliers``: DENTIST-style LD-consistency statistic
  (reference: CARMA outlier handling, method/carma.py): for each tag
  variant with lead LD r, T = (z_tag - r·z_lead)² / (1 - r²) is ~χ²₁
  under consistency; large T flags the variant as an outlier
  (allele-switch / imputation artifact). Pure expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.stats import chi2_sf_1df


def impute_zscores(
    observed: DataFrame,
    pairwise_ld: DataFrame,
    min_neighbours: int = 2,
) -> DataFrame:
    """Impute z for variants absent from ``observed`` using LD
    neighbours.

    observed: (studyId, variantId, chromosome, z)
    pairwise_ld: (variantIdI, variantIdJ, chromosome, r) — I is the
    target (possibly unobserved) variant, J the neighbour.

    Output: (studyId, variantId, chromosome, zImputed, nNeighbours,
    imputationInfo) for target variants NOT in observed.
    imputationInfo = Σ r² / n — the usual r²-based info proxy.
    """
    obs = observed.select(
        "studyId",
        F.col("variantId").alias("variantIdJ"),
        "chromosome",
        F.col("z").alias("zJ"),
    )
    joined = pairwise_ld.join(obs, on=["variantIdJ", "chromosome"], how="inner")
    # drop targets that are themselves observed
    observed_keys = observed.select(
        "studyId", F.col("variantId").alias("variantIdI"), "chromosome"
    ).withColumn("_obs", F.lit(True))
    candidates = joined.join(
        observed_keys, on=["studyId", "variantIdI", "chromosome"], how="left"
    ).filter(F.col("_obs").isNull())
    return (
        candidates.groupBy("studyId", F.col("variantIdI").alias("variantId"), "chromosome")
        .agg(
            (F.sum(F.col("r") * F.col("zJ")) / F.sqrt(F.sum(F.col("r") * F.col("r"))))
            .alias("zImputed"),
            F.count(F.lit(1)).alias("nNeighbours"),
            (F.sum(F.col("r") * F.col("r")) / F.count(F.lit(1))).alias("imputationInfo"),
        )
        .filter(F.col("nNeighbours") >= min_neighbours)
    )


def flag_ld_outliers(
    tags: DataFrame,
    chi2_threshold: float = 10.0,
) -> DataFrame:
    """DENTIST-style LD-consistency outlier flags per tag.

    tags: (studyLocusId, tagVariantId, z, zLead, r) where r is LD of
    the tag with the lead. Adds ``ldConsistencyT`` (the χ²₁
    statistic), ``ldConsistencyP`` (its upper tail), and
    ``isLdOutlier``.
    """
    denom = F.greatest(1 - F.col("r") * F.col("r"), F.lit(1e-6))
    t_stat = F.pow(F.col("z") - F.col("r") * F.col("zLead"), 2) / denom
    return (
        tags.withColumn("ldConsistencyT", t_stat)
        .withColumn("ldConsistencyP", chi2_sf_1df(F.col("ldConsistencyT")))
        .withColumn("isLdOutlier", F.col("ldConsistencyT") > chi2_threshold)
    )
