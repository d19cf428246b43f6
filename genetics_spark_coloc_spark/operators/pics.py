"""PICS fine-mapping (Probabilistic Identification of Causal SNPs).

Re-expresses reference src/gentropy/method/pics.py:21-290. The
reference runs a scipy row-UDF per locus; here the whole computation
is higher-order array functions + an erfc approximation
(functions/stats.py), staying JVM-side:

per tag with r² ≥ 0.5 (others dropped):
    mu    = neglog_p · r²
    std   = |sqrt(1 - sqrt(r²)^k) · sqrt(neglog_p) / 2|, 0 → 0.001
    relPP = 2 · SF_Normal(mu, std)(neglog_p)
    standardError = 10^(-std)
posteriorProbability = relPP / Σ relPP  (per locus)

Then the lead variant's single-point stats are injected into its own
tag and the lead-vs-tag stats nulled elsewhere, as in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.functions.pvalue import neglog_pvalue
from genetics_spark_coloc_spark.functions.stats import normal_sf

K_DEFAULT = 6.4


def _pics_tag_struct(tag: Column, neglog_p: Column, k: float) -> Column:
    r2 = tag["r2Overall"]
    mu = neglog_p * r2
    std_raw = F.abs(
        F.sqrt(1 - F.pow(F.sqrt(r2), F.lit(k))) * F.sqrt(neglog_p) / 2
    )
    std = F.when(std_raw == 0, 0.001).otherwise(std_raw)
    rel_pp = 2 * normal_sf(neglog_p, mu, std)
    return F.struct(
        tag["tagVariantId"].alias("variantId"),
        r2.alias("r2Overall"),
        F.pow(F.lit(10.0), -std).alias("standardError"),
        rel_pp.alias("relativePosteriorProbability"),
    )


def pics_finemap(
    associations: DataFrame, k: float = K_DEFAULT, qc_col: str | None = "qualityControls"
) -> DataFrame:
    """Compute the PICS ``locus`` credible set from ``ldSet``.

    Input needs: variantId, pValueMantissa, pValueExponent, beta,
    ldSet[tagVariantId, r2Overall]. Output replaces ``locus`` with the
    PICS posteriors (tags with r² < 0.5 or null removed).
    """
    neglog_p = neglog_pvalue(F.col("pValueMantissa"), F.col("pValueExponent"))

    usable = F.filter(
        F.col("ldSet"),
        lambda x: x["r2Overall"].isNotNull() & (x["r2Overall"] >= 0.5),
    )
    raw_tags = F.when(
        F.col("ldSet").isNotNull() & neglog_p.isNotNull(),
        F.transform(usable, lambda t: _pics_tag_struct(t, neglog_p, k)),
    )
    # Stage the tags and their sum as real columns BEFORE the
    # normalising transform: a lambda that captured the aggregate
    # expression directly would re-fold it (and every erfc inside)
    # once per element — O(n²) per locus. As bound columns they are
    # evaluated once per row.
    staged = (
        associations.withColumn("_rawTags", raw_tags)
        .withColumn(
            "_picsTotal",
            F.aggregate(
                F.coalesce(F.col("_rawTags"), F.array()),
                F.lit(0.0),
                lambda acc, t: acc + t["relativePosteriorProbability"],
            ),
        )
    )
    normalized = F.transform(
        F.col("_rawTags"),
        lambda t: F.struct(
            t["variantId"].alias("variantId"),
            t["r2Overall"].alias("r2Overall"),
            F.when(
                F.col("_picsTotal") != 0,
                t["relativePosteriorProbability"] / F.col("_picsTotal"),
            ).alias("posteriorProbability"),
            t["standardError"].alias("standardError"),
        ),
    )
    with_locus = (
        staged.drop("locus")
        .withColumn("locus", normalized)
        .drop("_rawTags", "_picsTotal")
    )

    # inject the lead's single-point stats into its own tag; null elsewhere
    return with_locus.withColumn(
        "locus",
        F.transform(
            F.col("locus"),
            lambda tag: F.when(
                F.col("variantId") == tag["variantId"],
                tag.withField("pValueMantissa", F.col("pValueMantissa"))
                .withField("pValueExponent", F.col("pValueExponent"))
                .withField("beta", F.col("beta")),
            ).otherwise(
                tag.withField("pValueMantissa", F.lit(None).cast("float"))
                .withField("pValueExponent", F.lit(None).cast("int"))
                .withField("beta", F.lit(None).cast("double"))
            ),
        ),
    )
