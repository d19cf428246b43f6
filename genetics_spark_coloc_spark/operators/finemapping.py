"""Fine-mapping operators.

Two layers:

1. ``finemap_abf`` — single-causal-variant fine-mapping with
   Wakefield approximate Bayes factors (Wakefield 2009, the standard
   single-variant PIP used by coloc/FINEMAP-style pipelines). Pure
   Column math + one window sum: no UDF, fully distributed, and
   SQL-oracle-expressible.

2. ``finemap_grouped`` — the distributed per-locus kernel harness:
   ``groupBy(studyLocusId).applyInPandas(kernel)``. This is the
   architectural replacement for the reference's one-locus-per-job
   scatter (susie_finemapper.py:48-158 + manifest fan-out,
   SURVEY §3.3): Spark schedules thousands of loci across executors,
   Arrow moves each locus as a pandas frame, and any numpy kernel
   (SuSiE, CARMA, RAISS) plugs in. The built-in kernel is a clean
   NumPy implementation of SuSiE-style iterative Bayesian single
   effect regression on z-scores (IBSS; Wang et al. 2020 "sum of
   single effects" model) assuming independent variants when no LD
   matrix rows are supplied.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ABF_W = 0.15 * 0.15  # prior effect variance (sd 0.15, Wakefield's default for GWAS)


def log_abf(z: Column, se: Column, w: float = ABF_W) -> Column:
    """log Wakefield ABF for one variant: 0.5*ln(1-r) + z²r/2,
    r = W/(W+se²)."""
    r = F.lit(w) / (F.lit(w) + se * se)
    return 0.5 * F.log(1 - r) + (z * z) * r / 2


def finemap_abf(
    sumstats: DataFrame,
    locus_col: str = "studyLocusId",
    w: float = ABF_W,
) -> DataFrame:
    """Per-locus posterior inclusion probabilities from Wakefield ABFs.

    Input rows need (locus_col, variantId, beta, standardError).
    Adds ``logABF`` and ``posteriorProbability`` (softmax of logABF
    within the locus, max-shifted for stability).
    """
    z = F.col("beta") / F.col("standardError")
    with_abf = sumstats.withColumn("logABF", log_abf(z, F.col("standardError"), w))
    wdw = Window.partitionBy(locus_col)
    mx = F.max("logABF").over(wdw)
    shifted = F.exp(F.col("logABF") - mx)
    total = F.sum(shifted).over(wdw)
    return with_abf.withColumn("posteriorProbability", shifted / total)


# ---------------------------------------------------------------------------
# grouped-kernel harness
# ---------------------------------------------------------------------------

FINEMAP_RESULT_SCHEMA = (
    "studyLocusId string, variantId string, posteriorProbability double, "
    "credibleSetIndex int, logBF double"
)


def _rank_key(pips):
    """PIPs rounded half-AWAY-from-zero at 1e-6 — the ordering key the
    DuckDB oracles spell as ORDER BY ROUND(pip, 6). np.round's
    half-to-even would disagree with SQL ROUND on every .5 boundary;
    this scaled form only differs from an engine's shortest-repr
    rounding within ~1ulp of a boundary (the knife-edge every
    cross-engine rounded comparison in this repo accepts)."""
    import numpy as np

    return np.floor(np.abs(pips) * 1e6 + 0.5) / 1e6 * np.sign(pips)


def susie_kernel(pdf: pd.DataFrame, max_l: int = 5, max_iter: int = 100, tol: float = 1e-6) -> pd.DataFrame:
    """NumPy IBSS kernel (SuSiE sum-of-single-effects on z-scores,
    independence approximation).

    Iteratively fits L single-effect regressions; each effect yields a
    posterior inclusion vector; variants are assigned to the credible
    set (effect) where their PIP is highest. Returns one row per
    variant with its total PIP and best credible-set index.
    """
    import numpy as np

    z = (pdf["beta"] / pdf["standardError"]).to_numpy(dtype=float)
    n = len(z)
    locus = pdf["studyLocusId"].iloc[0]
    l_eff = min(max_l, n)
    prior_v = 1.0  # prior effect variance on z scale

    # residual z after removing other effects; with independence
    # approximation the update is per-effect softmax of Bayes factors
    alpha = np.full((l_eff, n), 1.0 / n)
    mu = np.zeros((l_eff, n))
    for _ in range(max_iter):
        alpha_old = alpha.copy()
        for l in range(l_eff):  # noqa: E741
            r = z - (alpha * mu).sum(axis=0) + alpha[l] * mu[l]
            post_var = prior_v / (1.0 + prior_v)
            log_bf = 0.5 * np.log(1.0 / (1.0 + prior_v)) + 0.5 * post_var * r * r
            log_bf -= log_bf.max()
            w = np.exp(log_bf)
            alpha[l] = w / w.sum()
            mu[l] = post_var * r
        if np.abs(alpha - alpha_old).max() < tol:
            break

    pip = 1.0 - np.prod(1.0 - alpha, axis=0)
    best_effect = alpha.argmax(axis=0)
    total_log_bf = np.log(np.maximum(pip, 1e-300))
    return pd.DataFrame(
        {
            "studyLocusId": locus,
            "variantId": pdf["variantId"].to_numpy(),
            "posteriorProbability": pip,
            "credibleSetIndex": (best_effect + 1).astype("int32"),
            "logBF": total_log_bf,
        }
    )


def susie_reduced_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """SuSiE-inf in its deterministic reduced configuration: identity
    LD, one effect, fixed hyperparameters (ssq=0.2, sigmasq=1,
    tausq=0, no estimation). In this configuration the model has a
    closed form — lbf_j = n·z_j²/(2(n+5)) − ½ln(0.2(n+5)), PIP =
    softmax(lbf) — which the driver's DuckDB oracle replicates, so
    this exercises the REAL susie_inf code path under an exact SQL
    check. The 99% credible set is the top-PIP prefix crossing 0.99
    (ties broken by variantId, mirroring the SQL ORDER BY).
    """
    import numpy as np

    from genetics_spark_coloc_spark.operators.susie import susie_inf

    locus = pdf["studyLocusId"].iloc[0]
    z = (pdf["beta"] / pdf["standardError"]).to_numpy(dtype=float)
    out = susie_inf(
        z,
        ld=None,
        L=1,
        est_ssq=False,
        est_sigmasq=False,
        est_tausq=False,
        ssq=np.array([0.2]),
    )
    pip = out["PIP"][:, 0]
    lbf = out["lbf_variable"][:, 0]
    vids = pdf["variantId"].to_numpy()
    # order by ROUNDED pip: raw pips that agree to 1e-6 are fp-noise
    # ordered across engines; the vid tiebreak then fires identically
    # on both sides (cum still sums the raw values, in this order)
    order = np.lexsort((vids, -_rank_key(pip)))
    cum_before = np.concatenate([[0.0], np.cumsum(pip[order])[:-1]])
    in_cs = np.zeros(len(z), dtype="int32")
    in_cs[order] = (cum_before < 0.99).astype("int32")
    return pd.DataFrame(
        {
            "studyLocusId": locus,
            "variantId": vids,
            "posteriorProbability": pip,
            "credibleSetIndex": in_cs,
            "logBF": lbf,
        }
    )


def _exp_decay_ld(positions: "pd.Series | None", scale: float) -> "object":
    """Synthetic positive-definite LD for loci that carry positions
    but no measured LD: r_ij = exp(−|pos_i − pos_j|/scale). The
    exponential kernel is PD, so eigh is well-behaved."""
    import numpy as np

    if positions is None:
        return None
    pos = positions.to_numpy(dtype=float)
    return np.exp(-np.abs(pos[:, None] - pos[None, :]) / scale)


def _locus_inputs(pdf: pd.DataFrame, ld_scale: float, identity_fallback: bool):
    """Shared per-locus kernel preamble: stable variantId sort,
    z = beta/se, and the LD source (position→exp-decay when present;
    identity or None otherwise). One definition so the SuSiE, CARMA
    and study-locus kernels can never diverge on LD sourcing."""
    import numpy as np

    pdf = pdf.sort_values("variantId", kind="stable").reset_index(drop=True)
    z = (pdf["beta"] / pdf["standardError"]).to_numpy(dtype=float)
    if "position" in pdf.columns:
        ld = _exp_decay_ld(pdf["position"], ld_scale)
    else:
        ld = np.eye(len(z)) if identity_fallback else None
    return pdf, z, ld


def susie_inf_kernel(
    pdf: pd.DataFrame,
    max_l: int = 10,
    n: int = 100_000,
    ld_scale: float = 200_000.0,
    susie_kwargs: "dict | None" = None,
) -> pd.DataFrame:
    """Full LD-aware SuSiE-inf per-locus kernel (production
    configuration: method-of-moments, est_tausq=False — reference
    susie_finemapper.py:609-610). LD comes from a ``position`` column
    via an exponential-decay kernel when no measured LD accompanies
    the locus; replace ``_exp_decay_ld`` with an ld_index join for
    measured panels.

    Output per variant: total PIP across effects, index of the first
    99% credible set containing the variant (1-based; 0 = none), and
    the max per-effect log Bayes factor.
    """
    import numpy as np

    from genetics_spark_coloc_spark.operators.susie import credible_sets, susie_inf

    locus = pdf["studyLocusId"].iloc[0]
    pdf, z, ld = _locus_inputs(pdf, ld_scale, identity_fallback=False)
    p = len(z)
    out = susie_inf(z, ld=ld, n=n, L=min(max_l, p), **(susie_kwargs or {}))
    pip_total = 1.0 - np.prod(1.0 - out["PIP"], axis=1)
    if ld is None:
        ld = np.eye(p)
    cs = credible_sets(out["PIP"], n=n, ld=ld)
    cs_index = np.zeros(p, dtype="int32")
    for rank, members in enumerate(cs, start=1):
        for j in members:
            if cs_index[j] == 0:
                cs_index[j] = rank
    return pd.DataFrame(
        {
            "studyLocusId": locus,
            "variantId": pdf["variantId"].to_numpy(),
            "posteriorProbability": pip_total,
            "credibleSetIndex": cs_index,
            "logBF": out["lbf_variable"].max(axis=1),
        }
    )


def susie_inf_ld_oracle_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """``susie_inf_kernel`` — the full LD-aware code path: position →
    exp-decay LD (``_exp_decay_ld``), real eigendecomposition
    (``_eig_xtx``), V-basis mat-vecs inside ``susie_inf``, and
    purity-filtered ``credible_sets`` extraction — in its
    deterministic oracle configuration: one effect, fixed
    hyperparameters (ssq=0.2, sigmasq=1, tausq=0, no estimation),
    and locus positions spaced so far apart that every off-diagonal
    exp-decay entry underflows to exactly 0.0 (|Δpos|/scale > 745).
    The LD matrix is then the exact identity — but it is still built,
    eigendecomposed, and carried through every V @ x product and the
    credible-set purity block, so the oracle hash gates the genuine
    LD machinery. Closed form the DuckDB oracle replicates:
    lbf_j = n·z_j²/(2(n+5)) − ½ln(0.2(n+5)), PIP = softmax(lbf);
    with identity LD a multi-member 99% set has min|r| = 0 < 0.5 and
    is purity-dropped, so credibleSetIndex = 1 iff PIP ≥ 0.99.
    (The full exponential-decay-LD, L=10, method-of-moments
    configuration stays pinned by golden pytest parity vs the
    reference's own moments — tests/test_finemap_golden.py.)"""
    import numpy as np

    return susie_inf_kernel(
        pdf,
        max_l=1,
        susie_kwargs={
            "est_ssq": False,
            "est_sigmasq": False,
            "est_tausq": False,
            "ssq": np.array([0.2]),
        },
    )


SUSIE_STUDY_LOCUS_SCHEMA = (
    "studyLocusId string, credibleSetIndex int, credibleSetLog10BF double, "
    "purityMeanR2 double, purityMinR2 double, leadVariantId string, "
    "locus array<struct<variantId: string, posteriorProbability: double, "
    "logBF: double>>"
)


def susie_study_locus_kernel(
    pdf: pd.DataFrame,
    max_l: int = 10,
    n: int = 100_000,
    ld_scale: float = 200_000.0,
    cs_lbf_thr: float = 2.0,
    sum_pips: float = 0.99,
    susie_kwargs: "dict | None" = None,
) -> pd.DataFrame:
    """SuSiE-inf output → study-locus credible-set rows, entirely
    executor-side (reference susie_inf_to_studylocus,
    susie_finemapper.py:188-320, runs this per locus ON THE DRIVER
    with collect + createDataFrame; here it's one applyInPandas
    kernel so thousands of loci convert concurrently).

    Per effect, ordered by credible-set logBF descending: the first
    effect is always kept, later ones only when their logBF clears
    ``cs_lbf_thr``; the credible set is the top-PIP prefix reaching
    ``sum_pips``; purity is the mean/min r² over the member LD block.
    """
    import numpy as np

    from genetics_spark_coloc_spark.operators.susie import susie_inf

    locus = pdf["studyLocusId"].iloc[0]
    pdf, z, ld = _locus_inputs(pdf, ld_scale, identity_fallback=True)
    p = len(z)
    if ld is None:
        ld = np.eye(p)
    out = susie_inf(z, ld=ld, n=n, L=min(max_l, p), **(susie_kwargs or {}))
    vids = pdf["variantId"].to_numpy()

    order_creds = sorted(
        enumerate(out["lbf"]), key=lambda t: t[1], reverse=True
    )
    rows = []
    for rank, (el, cs_lbf) in enumerate(order_creds):
        if rank > 0 and cs_lbf < cs_lbf_thr:
            continue
        pip = out["PIP"][:, el]
        # rounded-pip ordering with vid tiebreak — engine-stable (see
        # susie_reduced_kernel); the cumulative mass is still raw
        order = np.lexsort((vids, -_rank_key(pip)))
        cum = np.cumsum(pip[order])
        k = int(np.argmax(cum >= sum_pips))
        if cum[-1] < sum_pips:
            k = len(cum) - 1
        members = order[: k + 1]
        sub = ld[np.ix_(members, members)]
        r2 = sub * sub
        rows.append(
            {
                "studyLocusId": locus,
                "credibleSetIndex": rank + 1,
                "credibleSetLog10BF": float(cs_lbf / np.log(10.0)),
                "purityMeanR2": float(r2.mean()),
                "purityMinR2": float(r2.min()),
                "leadVariantId": str(vids[members[0]]),
                "locus": [
                    {
                        "variantId": str(vids[j]),
                        "posteriorProbability": float(pip[j]),
                        "logBF": float(out["lbf_variable"][j, el]),
                    }
                    for j in members
                ],
            }
        )
    if not rows:
        return pd.DataFrame(
            columns=[
                "studyLocusId",
                "credibleSetIndex",
                "credibleSetLog10BF",
                "purityMeanR2",
                "purityMinR2",
                "leadVariantId",
                "locus",
            ]
        )
    return pd.DataFrame(rows)


def susie_study_locus_reduced_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """``susie_study_locus_kernel`` in its deterministic reduced
    configuration: identity LD (no ``position`` column supplied),
    one effect, fixed hyperparameters (ssq=0.2, sigmasq=1, tausq=0,
    no estimation). The credible-set extraction — effect ordering,
    99% top-PIP prefix, purity over the LD block, lead variant —
    is the GENUINE production code path; only the model collapses
    to the closed form lbf_j = n·z_j²/(2(n+5)) − ½ln(0.2(n+5)),
    PIP = softmax(lbf), credibleSetLog10BF = logsumexp(lbf − ln p)
    / ln 10, which the driver's DuckDB oracle replicates exactly.
    With identity LD the purity block is analytic too: meanR2 = 1/k,
    minR2 = 1 if k == 1 else 0."""
    import numpy as np

    return susie_study_locus_kernel(
        pdf,
        max_l=1,
        susie_kwargs={
            "est_ssq": False,
            "est_sigmasq": False,
            "est_tausq": False,
            "ssq": np.array([0.2]),
        },
    )


def carma_ld_kernel(
    pdf: pd.DataFrame,
    tau: float = 0.04,
    ld_scale: float = 200_000.0,
) -> pd.DataFrame:
    """LD-aware deterministic CARMA kernel (operators/carma.py):
    spike-slab model search + LD-mismatch outlier screen per locus.
    credibleSetIndex carries the PIP rank; outliers get rank 0 and
    PIP 0 (excluded from the model space, reference carma.py:885-905).
    """
    import numpy as np

    from genetics_spark_coloc_spark.operators.carma import carma_spike_slab

    locus = pdf["studyLocusId"].iloc[0]
    pdf, z, ld = _locus_inputs(pdf, ld_scale, identity_fallback=True)
    p = len(z)
    res = carma_spike_slab(z, ld, tau=tau)
    pips = np.asarray(res["PIPs"], dtype=float)
    outlier_mask = np.zeros(p, dtype=bool)
    outlier_mask[list(res["Outliers"])] = True
    vids = pdf["variantId"].to_numpy()
    # rank on 6-dp-rounded PIPs: raw PIPs that agree to 1e-6 are
    # fp-noise-ordered (e.g. several saturated at 1.0), so ranking
    # the rounded value with a variantId tiebreak keeps the rank
    # stable under reordering/replay and engine-comparable
    order = np.lexsort((vids, -_rank_key(pips)))
    rank = np.empty(p, dtype="int32")
    rank[order] = np.arange(1, p + 1)
    rank[outlier_mask] = 0
    # singleton spike-slab log BF (diag(LD)=1): ½lnτ − ½ln(1+τ) + z²/(2(1+τ))
    single_lbf = 0.5 * np.log(tau) - 0.5 * np.log1p(tau) + z * z / (2.0 * (1.0 + tau))
    return pd.DataFrame(
        {
            "studyLocusId": locus,
            "variantId": vids,
            "posteriorProbability": pips,
            "credibleSetIndex": rank,
            "logBF": single_lbf,
        }
    )


def finemap_grouped(
    sumstats: DataFrame,
    kernel: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    locus_col: str = "studyLocusId",
    num_partitions: int | None = None,
    schema: str | None = None,
    max_locus_variants: int = 25_000,
) -> DataFrame:
    """Distributed per-locus fine-mapping via applyInPandas.

    One Arrow batch per locus; executor-side numpy — loci are
    independent, so this scales linearly with executors (the
    reference fans out ONE locus per Spark job instead,
    susie_finemapper.py:48-64).

    The explicit ``repartition(n, locus)`` matters: the kernel is
    CPU-heavy per GROUP while the shuffled bytes are tiny, so AQE's
    size-based partition coalescing would otherwise fold hundreds of
    loci into one or two python workers and serialize the whole fit.
    An explicit numPartitions is exempt from AQE coalescing, and
    groupBy over the same key reuses the partitioning (no second
    exchange).

    ``max_locus_variants`` is the loud-guard bound on the harness's
    one-locus-per-worker contract (house style: the line_dedup
    ``max_doc_segments`` / hot-bucket twins): the LD-aware kernels
    materialize a p×p float64 matrix inside ONE Python worker, so a
    pathological unclumped locus (p = 100k → 80 GB) would OOM or
    grind a single task where every other group finished. The check
    runs in the wrapper, before the kernel allocates anything — zero
    plan cost (no extra shuffle, no pre-count) — and fails the job
    with the actionable bound. The default (25k variants ≈ 5 GB of
    LD) is an order of magnitude above any post-clumping locus;
    LD-free kernels (ABF, the independence-approximation CARMA) are
    O(p) and may raise it explicitly.
    """
    chosen = kernel or susie_kernel
    if num_partitions is None:
        try:
            num_partitions = int(
                sumstats.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except Exception:  # noqa: BLE001
            num_partitions = 64
    sumstats = sumstats.repartition(num_partitions, locus_col)
    bound = int(max_locus_variants)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > bound:
            raise ValueError(
                f"finemap_grouped: locus "
                f"{pdf[locus_col].iloc[0]!r} has {len(pdf)} variants > "
                f"max_locus_variants={bound}; one locus is fitted inside "
                "one Python worker (LD-aware kernels materialize a p×p "
                "matrix there) — split or re-clump the locus upstream, or "
                "raise max_locus_variants for an O(p) kernel before "
                "scaling up"
            )
        return chosen(pdf)

    return sumstats.groupBy(locus_col).applyInPandas(
        run, schema=schema or FINEMAP_RESULT_SCHEMA
    )


def carma_kernel(
    pdf: pd.DataFrame,
    max_model_size: int = 2,
    prior_inclusion: float = 0.01,
    w: float = ABF_W,
) -> pd.DataFrame:
    """CARMA-style Bayesian model search, truncated to exhaustive
    enumeration of causal configurations up to ``max_model_size``
    (reference: method/carma.py:17-919 runs a stochastic shotgun
    search on the driver, one locus per job; this kernel keeps the
    spike-slab model-space posterior but enumerates |M| ≤ 2
    configurations — exact for loci with at most two causal signals,
    deterministic, and runs per locus under finemap_grouped).

    Model evidence: log BF of configuration M = Σ_{i∈M} ABF_i under
    an independence approximation, plus the spike-slab model-size
    prior log(p^|M| (1-p)^(n-|M|)). PIP_i = Σ_{M∋i} post(M).
    """
    import numpy as np

    locus = pdf["studyLocusId"].iloc[0]
    beta = pdf["beta"].to_numpy(dtype=float)
    se = pdf["standardError"].to_numpy(dtype=float)
    n = len(beta)
    z = beta / se
    r = w / (w + se * se)
    log_abf = 0.5 * np.log(1 - r) + z * z * r / 2

    logp, log1mp = np.log(prior_inclusion), np.log(1 - prior_inclusion)
    # O(n) algebra instead of O(n²) pair enumeration, made underflow-
    # safe by decomposing pair sums AROUND THE TOP VARIANT t:
    #   Σ_{j≠t} e^{A_t+A_j − (mA+a2)} = Σ_{j≠t} e^{A_j−a2} = G1
    #   Σ_{i<j, both≠t} e^{A_i+A_j − (mA+a2)} = e^{a2−mA}(G1²−G2)/2
    # Every factor lies in [0, n] because A_j ≤ a2 for j≠t and
    # a2 ≤ mA, so the dominant pair {t, runner-up} always carries
    # weight ~1 even when mA − a2 is thousands of log-units. The
    # DuckDB oracle evaluates the identical closed form.
    vids_arr = pdf["variantId"].to_numpy()
    order_desc = np.lexsort((vids_arr, -log_abf))  # A desc, variantId asc
    t = order_desc[0]
    null_score = n * log1mp
    m_a = float(log_abf[t])
    c = np.exp(log_abf - m_a)
    c1 = float(c.sum())
    single_max = logp + (n - 1) * log1mp + m_a
    pair_base = 2 * logp + (n - 2) * log1mp
    use_pairs = max_model_size >= 2 and n >= 2
    if use_pairs:
        a2 = float(log_abf[order_desc[1]])
        mx = max(null_score, single_max, pair_base + m_a + a2)
        g_expo = log_abf - a2
        g_expo[t] = -np.inf  # t is handled by its own closed form
        g = np.exp(g_expo)
        g1, g2 = float(g.sum()), float((g * g).sum())
        pair_mass_shifted = g1 + np.exp(a2 - m_a) * (g1 * g1 - g2) / 2
        total = (
            np.exp(null_score - mx)
            + np.exp(logp + (n - 1) * log1mp + m_a - mx) * c1
            + np.exp(pair_base + m_a + a2 - mx) * pair_mass_shifted
        )
        p_expo = pair_base + log_abf + m_a - mx
        p_expo[t] = -np.inf
        w_pair = np.exp(p_expo) * (1.0 + np.exp(a2 - m_a) * (g1 - g))
        w_pair[t] = np.exp(pair_base + m_a + a2 - mx) * g1
    else:
        mx = max(null_score, single_max)
        total = np.exp(null_score - mx) + np.exp(
            logp + (n - 1) * log1mp + m_a - mx
        ) * c1
        w_pair = np.zeros(n)
    w_single = np.exp(logp + (n - 1) * log1mp + log_abf - mx)
    pip = (w_single + w_pair) / total

    # rank by ROUNDED PIP desc with variantId tiebreak — raw pips
    # equal to 1e-6 are fp-noise ordered, so the rounded key keeps the
    # rank identical across engines and replays
    vids = pdf["variantId"].to_numpy()
    order = np.lexsort((vids, -_rank_key(pip)))
    cs_index = np.empty(n, dtype="int32")
    cs_index[order] = np.arange(1, n + 1)
    return pd.DataFrame(
        {
            "studyLocusId": locus,
            "variantId": vids,
            "posteriorProbability": pip,
            "credibleSetIndex": cs_index,
            "logBF": log_abf,
        }
    )
