"""Fine-mapping simulation benchmark: simulate GWAS z-scores from an
LD structure with known causal variants, fine-map them, and score the
credible sets against the planted truth.

Reference parity: finemapping_simulations.py:16-267
(SimSumStatFromLD, SimulationLoop, ProvideSummary). The reference
simulates and fine-maps one locus per driver iteration with global
np.random state; here each locus is an independent, seeded
mapInPandas batch — thousands of simulation replicates run
concurrently and are exactly replayable (seed = f(locus index)).

Model (as published): with M SNPs, n_causal causals and regional
heritability he2_reggen, per-causal signal strength is
Tau = n·he2/n_causal; joint z are N(0, Tau) at causal positions;
marginal GWAS z ~ N(U·jz, U) for LD matrix U.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIM_SCHEMA = (
    "studyLocusId string, variantId string, position double, "
    "beta double, standardError double, isCausal boolean"
)


def _ld_sqrt(ld: np.ndarray) -> np.ndarray:
    """Symmetric square root of a PSD LD matrix (eigen-clip), used to
    draw N(mu, U) as mu + sqrt(U)·N(0, I)."""
    evals, vecs = np.linalg.eigh(ld)
    return (vecs * np.sqrt(np.maximum(evals, 0.0))) @ vecs.T


def simulate_sumstats(
    spark: SparkSession,
    ld: np.ndarray,
    positions: np.ndarray,
    n_loci: int = 50,
    n_causal: int = 2,
    he2_reggen: float = 0.003,
    n: int = 100_000,
    seed: int = 7,
) -> DataFrame:
    """Simulate ``n_loci`` independent GWAS loci sharing one LD
    structure. Output rows carry (beta, standardError) with se=1 so
    z == beta, plus the planted ``isCausal`` truth.

    Each locus draws from ``default_rng(seed*1e6 + locusIdx)`` — the
    replicate set is deterministic and partition-independent.
    """
    ld = np.asarray(ld, dtype=float)
    pos = np.asarray(positions, dtype=float)
    m = ld.shape[0]
    tau = n * he2_reggen / n_causal
    root = _ld_sqrt(ld)

    def gen(batches):
        for pdf in batches:
            out = []
            for locus_idx in pdf["id"]:
                rng = np.random.default_rng(int(seed) * 1_000_000 + int(locus_idx))
                causal = rng.choice(m, size=n_causal, replace=False)
                jz = np.zeros(m)
                jz[causal] = rng.normal(0.0, 1.0, n_causal) * np.sqrt(tau)
                muz = ld @ jz
                z = muz + root @ rng.normal(0.0, 1.0, m)
                flags = np.zeros(m, dtype=bool)
                flags[causal] = True
                out.append(
                    pd.DataFrame(
                        {
                            "studyLocusId": f"SIM{int(locus_idx)}",
                            "variantId": [f"v{j:04d}" for j in range(m)],
                            "position": pos,
                            "beta": z,
                            "standardError": 1.0,
                            "isCausal": flags,
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                columns=[
                    "studyLocusId",
                    "variantId",
                    "position",
                    "beta",
                    "standardError",
                    "isCausal",
                ]
            )

    seeds = spark.range(n_loci).repartition(
        min(n_loci, spark.sparkContext.defaultParallelism)
    )
    return seeds.mapInPandas(gen, schema=SIM_SCHEMA)


def simulate_sumstats_deterministic(
    events: DataFrame,
    m: int = 25,
    causal_slots: tuple[int, int] = (7, 19),
) -> DataFrame:
    """Oracle-able deterministic variant of ``simulate_sumstats``:
    the same simulate → fine-map → score pipeline shape (reference
    SimSumStatFromLD, finemapping_simulations.py:16-267), but the
    Gaussian noise comes from a multiplicative-hash uniform pushed
    through the Acklam inverse normal (``functions.pvalue.norm_ppf``)
    instead of a seeded PCG64 stream, and the planted causal slots
    are fixed positions within each locus. Every value is a pure
    Column expression DuckDB can replicate, which is what upgrades
    the end-to-end simulation benchmark from a rows-only check to an
    exact hash gate. The published N(0, U)-correlated-noise model
    stays exercised by ``simulate_sumstats`` under pytest
    (tests/test_finemap_golden.py).

    Loci are consecutive ``m``-variant blocks of ``event_id``; the
    two causal slots carry effects of alternating sign whose size
    cycles with the locus index, so credible sets recover them at a
    realistic (non-degenerate) rate. Output matches SIM_SCHEMA minus
    ``position`` (identity-LD fine-mapping downstream).
    """
    from genetics_spark_coloc_spark.functions.pvalue import norm_ppf

    lid = F.floor(F.col("event_id") / m).cast("long")
    slot = (F.col("event_id") % m).cast("int")
    # Knuth multiplicative hash -> uniform in (0, 1), strictly
    # interior so the inverse normal never sees 0 or 1
    k = (F.col("event_id") * F.lit(2654435761)) % F.lit(1000003)
    u = (k.cast("double") + F.lit(0.5)) / F.lit(1000003.0)
    # moderate effects (|z| ~ 1-4.3) against N(0,1) noise whose tails
    # reach ~4.9: leads and recovery vary by locus, so the scored
    # accuracy/sensitivity discriminate instead of saturating at 1.0
    effect = (
        F.when(slot == causal_slots[0], 1.5 + 0.7 * (lid % 5).cast("double"))
        .when(slot == causal_slots[1], -(1.0 + 0.5 * (lid % 7).cast("double")))
        .otherwise(F.lit(0.0))
    )
    return events.select(
        F.concat(F.lit("SIM"), lid.cast("string")).alias("studyLocusId"),
        F.format_string("v%04d", slot).alias("variantId"),
        (effect + norm_ppf(u)).alias("beta"),
        F.lit(1.0).alias("standardError"),
        slot.isin(list(causal_slots)).alias("isCausal"),
    )


def score_credible_sets(
    cred_sets: DataFrame, truth: DataFrame, n_causal: int
) -> DataFrame:
    """Summarise fine-mapping performance against the planted truth
    (reference ProvideSummary, finemapping_simulations.py:20-42):

    - accuracy: fraction of credible sets containing ≥1 causal variant
    - accuracy_lead: fraction whose lead variant is causal
    - false_positives: 1 − accuracy
    - sensitivity: causal-containing sets / (n_causal · n_loci)

    cred_sets: susie_study_locus_kernel output (studyLocusId,
    credibleSetIndex, leadVariantId, locus array); truth:
    (studyLocusId, variantId, isCausal).
    """
    # r14: the member relation feeds BOTH the per-set containment
    # aggregate and the distinct-recovered count; without a barrier
    # the upstream fine-mapping kernel (a full applyInPandas pass)
    # executed once per consumer (drilled: score stage 1.7 s on top
    # of a 2.1 s kernel at sf0.1). The kernel output is per-locus
    # credible sets — tiny next to the kernel that produced it.
    cred_sets = cred_sets.localCheckpoint(eager=False)
    members = cred_sets.select(
        "studyLocusId",
        "credibleSetIndex",
        "leadVariantId",
        F.explode("locus").alias("tag"),
    ).select(
        "studyLocusId",
        "credibleSetIndex",
        "leadVariantId",
        F.col("tag.variantId").alias("variantId"),
    )
    causal = truth.filter(F.col("isCausal")).select(
        "studyLocusId", "variantId", F.lit(True).alias("isCausalTag")
    )
    per_cs = (
        members.join(causal, on=["studyLocusId", "variantId"], how="left")
        .groupBy("studyLocusId", "credibleSetIndex", "leadVariantId")
        .agg(F.max(F.coalesce("isCausalTag", F.lit(False))).alias("isInX"))
    )
    lead_causal = causal.select(
        "studyLocusId", F.col("variantId").alias("leadVariantId"),
        F.lit(True).alias("leadIsCausal"),
    )
    per_cs = per_cs.join(
        lead_causal, on=["studyLocusId", "leadVariantId"], how="left"
    ).withColumn("isInLead", F.coalesce("leadIsCausal", F.lit(False)))
    # sensitivity counts DISTINCT recovered causal variants — a set
    # containing both planted causals recovers 2, and three sets all
    # holding the same causal recover 1 (a set-level count would both
    # double- and under-count)
    recovered = (
        members.join(causal, on=["studyLocusId", "variantId"], how="inner")
        .select("studyLocusId", "variantId")
        .distinct()
        .agg(F.count(F.lit(1)).alias("_recovered"))
    )
    return (
        per_cs.agg(
            F.countDistinct("studyLocusId").alias("successfulRuns"),
            F.count(F.lit(1)).alias("numberOfCs"),
            (F.countDistinct("studyLocusId") * n_causal).alias("expectedResults"),
            F.round(F.avg((~F.col("isInX")).cast("double")), 6).alias(
                "falsePositives"
            ),
            F.round(F.avg(F.col("isInX").cast("double")), 6).alias("accuracy"),
            F.round(F.avg(F.col("isInLead").cast("double")), 6).alias("accuracyLead"),
        )
        .crossJoin(recovered)
        .withColumn(
            "sensitivity",
            F.round(F.col("_recovered") / (F.col("expectedResults")), 6),
        )
        .drop("_recovered")
    )
