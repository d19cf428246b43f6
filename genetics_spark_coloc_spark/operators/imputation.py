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


def raiss_model(
    z_known,
    ld_known,
    ld_unknown_known,
    lamb: float = 0.01,
    rtol: float = 0.01,
) -> dict:
    """The published RAISS imputation model, per locus (reference:
    method/sumstat_imputation.py:14-171; Julienne et al. 2019 RAISS).

    - Σ_T gets 1+λ on its diagonal and is pseudo-inverted with an
      eigenvalue cutoff of ``rtol``·σ_max (numerical robustness over
      exactness, as published);
    - mu = Σ_iT Σ_T⁻¹ z_T, then normalized by √R2 where
      R2 = (1+λ) − var_bounded;
    - var = (1+λ) − quadform, bounded into [0, 1] before normalizing;
    - imputation_r2 = 1 − var (unbounded), the QC filter statistic.

    Returns {"mu", "var", "imputation_r2", "ld_score"} numpy arrays.
    """
    import numpy as np

    sig_t = np.array(ld_known, dtype=float, copy=True)
    np.fill_diagonal(sig_t, 1.0 + lamb)
    # np.linalg.pinv's rcond is relative to the largest singular
    # value — the same cutoff semantics as the reference's
    # scipy pinv(rtol=..., atol=0)
    sig_t_inv = np.linalg.pinv(sig_t, rcond=rtol)
    sig_it = np.atleast_2d(np.asarray(ld_unknown_known, dtype=float))
    z_t = np.asarray(z_known, dtype=float)

    mu = sig_it @ (sig_t_inv @ z_t)
    var = (1.0 + lamb) - np.einsum("ij,jk,ik->i", sig_it, sig_t_inv, sig_it)
    ld_score = (sig_it**2).sum(axis=1)

    var_bounded = var.copy()
    var_bounded[var_bounded < 0] = 0.0
    var_bounded[var_bounded > 0.99999 + lamb] = 1.0
    # with lamb=0 a var at the upper cutoff gives r2_norm == 0 and an
    # inf/NaN zImputed (the reference's _var_in_boundaries flaw);
    # clamp to a small epsilon so the normalization stays finite —
    # such SNPs carry imputation_r2 ≈ 0 and are dropped by the QC
    # filter anyway
    r2_norm = np.maximum((1.0 + lamb) - var_bounded, 1e-12)
    mu = mu / np.sqrt(r2_norm)
    return {
        "mu": mu,
        "var": var,
        "imputation_r2": 1.0 - var,
        "ld_score": ld_score,
    }


def raiss_impute_grouped(
    observed: DataFrame,
    pairwise_ld: DataFrame,
    ridge_lambda: float = 0.01,
    rtol: float = 0.01,
    locus_col: str = "studyLocusId",
) -> DataFrame:
    """EXACT RAISS imputation, distributed per locus via cogrouped
    applyInPandas: the published :func:`raiss_model` (golden-value
    validated against the reference's 21-variant fixture) runs once
    per locus on an executor, instead of the reference's per-locus
    numpy loop on the driver (method/sumstat_imputation.py:15-172).

    Output per target variant: ``zImputed`` = R2-normalized mu,
    ``imputationInfo`` = imputation R² (1 − var), ``nObserved``.

    observed: (locus_col, variantId, z)
    pairwise_ld: (locus_col, variantIdI, variantIdJ, r) — I is a
    target or observed variant, J observed; O–O rows define Σ_OO
    (missing pairs default to 0 off-diagonal, 1+λ diagonal).

    The cogroup shuffles each locus ONCE per side; loci are
    independent so 1000 executors impute 1000 loci concurrently —
    the scalable replacement for the reference's manifest scatter.
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{locus_col} string, variantId string, zImputed double, "
        "imputationInfo double, nObserved int"
    )

    def kernel(obs_pdf: pd.DataFrame, ld_pdf: pd.DataFrame) -> pd.DataFrame:
        if obs_pdf.empty or ld_pdf.empty:
            return pd.DataFrame(
                {
                    locus_col: pd.Series(dtype="object"),
                    "variantId": pd.Series(dtype="object"),
                    "zImputed": pd.Series(dtype="float64"),
                    "imputationInfo": pd.Series(dtype="float64"),
                    "nObserved": pd.Series(dtype="int32"),
                }
            )
        locus = obs_pdf[locus_col].iloc[0]
        obs_ids = sorted(obs_pdf["variantId"].unique())
        o_index = {v: i for i, v in enumerate(obs_ids)}
        z_o = (
            obs_pdf.drop_duplicates("variantId")
            .set_index("variantId")["z"]
            .reindex(obs_ids)
            .to_numpy(dtype=float)
        )
        n = len(obs_ids)
        sigma_oo = np.eye(n)
        targets = {}
        for row in ld_pdf.itertuples(index=False):
            i, j, r = row.variantIdI, row.variantIdJ, float(row.r)
            if j not in o_index:
                continue
            if i in o_index:
                sigma_oo[o_index[i], o_index[j]] = r
                sigma_oo[o_index[j], o_index[i]] = r
            else:
                targets.setdefault(i, {})[j] = r
        if not targets:
            return pd.DataFrame(
                {
                    locus_col: pd.Series(dtype="object"),
                    "variantId": pd.Series(dtype="object"),
                    "zImputed": pd.Series(dtype="float64"),
                    "imputationInfo": pd.Series(dtype="float64"),
                    "nObserved": pd.Series(dtype="int32"),
                }
            )
        t_ids = sorted(targets)
        sigma_uo = np.zeros((len(t_ids), n))
        for ti, t in enumerate(t_ids):
            for j, r in targets[t].items():
                sigma_uo[ti, o_index[j]] = r
        model = raiss_model(
            z_o, sigma_oo, sigma_uo, lamb=ridge_lambda, rtol=rtol
        )
        return pd.DataFrame(
            {
                locus_col: locus,
                "variantId": t_ids,
                "zImputed": model["mu"],
                "imputationInfo": model["imputation_r2"],
                "nObserved": np.int32(n),
            }
        )

    return (
        observed.groupBy(locus_col)
        .cogroup(pairwise_ld.groupBy(locus_col))
        .applyInPandas(kernel, schema=out_schema)
    )
