"""CARMA: LD-aware Bayesian fine-mapping with outlier detection.

Published method: Yang, Wen et al. (2023) "CARMA is a new Bayesian
model for fine-mapping in genome-wide association meta-analyses"
(spike-and-slab prior on causal configurations, stochastic shotgun
model search, LD-mismatch outlier detection). Reference parity:
method/carma.py:57-148 (driver), :150-267 (marginal likelihoods),
:590-919 (Monte-Carlo shotgun search).

Design deviation, by intent: the reference explores model space with
a seeded Monte-Carlo shotgun sampler (np.random.choice over
softmax-weighted neighbours) — nondeterministic under parallel
replay. An engine operator must be replayable, so this
implementation explores DETERMINISTICALLY:

- every singleton model is scored; pairs are enumerated exhaustively
  over the top-``beam`` variants by |z| (exact for loci up to
  ``beam`` variants);
- from the best model, greedy stepwise moves (add / remove / swap)
  run until no move improves the posterior score, bounded by
  ``num_causal``;
- PIPs are computed over ALL visited models (the same estimator the
  reference applies to its sampled model list, carma.py:532-588).

The model score, configuration prior, outlier likelihood, and
ridge-shrinkage outlier test are the published CARMA formulas,
unchanged. On the reference's own golden locus (21 variants) this
reproduces the golden PIPs (corr ≈ 1) and the same outlier set —
see tests/test_finemap_golden.py.
"""

from __future__ import annotations

from itertools import combinations
from math import lgamma

import numpy as np



def _model_score(
    z: np.ndarray, ld: np.ndarray, idx: tuple[int, ...], tau: float
) -> float:
    """log marginal likelihood (vs null) of causal configuration idx:
    |S|/2·log τ − ½ log|Σ_SS + τI| + ½ z_S'(Σ_SS + τI)⁻¹ z_S
    (reference carma.py:150-217)."""
    k = len(idx)
    if k == 0:
        return 0.0
    rows = np.asarray(idx)
    sub = ld[np.ix_(rows, rows)] + tau * np.eye(k)
    sign, logdet = np.linalg.slogdet(sub)
    zs = z[rows]
    quad = float(zs @ np.linalg.solve(sub, zs))
    return 0.5 * k * np.log(tau) - 0.5 * logdet + 0.5 * quad


def _batch_model_scores(
    z: np.ndarray, ld: np.ndarray, models: np.ndarray, tau: float
) -> np.ndarray:
    """log marginal likelihoods for a (m, k) batch of same-size
    configurations — one stacked slogdet+solve instead of m python
    calls (numpy batches the LAPACK calls)."""
    m, k = models.shape
    sub = ld[models[:, :, None], models[:, None, :]] + tau * np.eye(k)
    _sign, logdet = np.linalg.slogdet(sub)
    zs = z[models]
    sol = np.linalg.solve(sub, zs[..., None])[..., 0]
    quad = (zs * sol).sum(axis=1)
    return 0.5 * k * np.log(tau) - 0.5 * logdet + 0.5 * quad


def _model_prior(k: int, p: int, lambda_val: float) -> float:
    """Spike-slab configuration prior: k·log λ + lgamma(p−k+1) − lgamma(p+1)
    (reference carma.py:505-529)."""
    return k * np.log(lambda_val) + lgamma(p - k + 1) - lgamma(p + 1)


def _outlier_loglik(
    z: np.ndarray, sigma: np.ndarray, rows: np.ndarray, tau: float
) -> float:
    """LD-consistency likelihood used by the outlier test
    (reference carma.py:219-267): ½(log|Σ_SS⁻¹| + log|(Σ_SS+τI)⁻¹|)
    − ½(z'Σ_SS⁻¹z − z'(Σ_SS+τI)⁻¹z), with pseudo-inverses."""
    k = len(rows)
    sub = sigma[np.ix_(rows, rows)]
    inv_reg = np.linalg.pinv(sub + tau * np.eye(k), rcond=1e-5)
    inv_raw = np.linalg.pinv(sub, rcond=1e-5)
    det_raw = abs(np.linalg.det(inv_raw))
    det_reg = abs(np.linalg.det(inv_reg))
    zs = z[rows]
    quad_raw = float(zs @ inv_raw @ zs)
    quad_reg = float(zs @ inv_reg @ zs)
    return 0.5 * (np.log(det_raw) + np.log(det_reg)) - 0.5 * (quad_raw - quad_reg)


# NOTE: the production outlier screen is the vectorised closed-form
# pair test below (_pair_outlier_loglik_vec + detect_outliers);
# _outlier_loglik is the published general-k formula it specialises,
# kept public for k>2 use and pinned to the pair form by a unit test.


def _pair_outlier_loglik_vec(
    rho: np.ndarray, u1sq: np.ndarray, u2sq: np.ndarray, tau: float
) -> np.ndarray:
    """Vectorised outlier likelihood for 2×2 unit-diagonal LD blocks
    [[1,ρ],[ρ,1]] — closed-form eigensystem (eigvals 1±ρ along the
    fixed (z₁±z₂)/√2 directions), including the reference's
    pseudo-inverse cutoff (pinv rtol=1e-5, carma.py:253-258)."""
    lam_r1, lam_r2 = 1.0 + rho, 1.0 - rho
    lam_g1, lam_g2 = 1.0 + tau + rho, 1.0 + tau - rho
    lam_max = np.maximum(lam_r1, lam_r2)
    keep1 = lam_r1 > 1e-5 * lam_max
    keep2 = lam_r2 > 1e-5 * lam_max
    inv_r1 = np.where(keep1, 1.0 / np.where(keep1, lam_r1, 1.0), 0.0)
    inv_r2 = np.where(keep2, 1.0 / np.where(keep2, lam_r2, 1.0), 0.0)
    quad_raw = u1sq * inv_r1 + u2sq * inv_r2
    quad_reg = u1sq / lam_g1 + u2sq / lam_g2
    # |det(pinv)| is 0 when a mode is dropped → log −inf, as the
    # reference's abs(det(pinv)) produces
    logdet_raw = np.where(
        keep1 & keep2,
        -(np.log(np.abs(lam_r1)) + np.log(np.abs(lam_r2))),
        -np.inf,
    )
    logdet_reg = -(np.log(lam_g1) + np.log(lam_g2))
    return 0.5 * (logdet_raw + logdet_reg) - 0.5 * (quad_raw - quad_reg)


def detect_outliers(
    z: np.ndarray,
    ld: np.ndarray,
    tau: float = 0.04,
    bf_index: float = 1.0 / 3.2,
    n_partners: int = 10,
    fail_fraction: float = 0.5,
) -> list[int]:
    """Deterministic LD-mismatch outlier screen.

    The reference flags outliers path-dependently inside its shotgun
    sampler (carma.py:795-846): when a sampled model fails the
    ridge-shrinkage test, the most-recently-added variant is blamed.
    Played deterministically, the same published pair test separates
    cleanly: an allele-flipped / mismatched variant fails the test
    with EVERY strong partner, while its partners each fail only the
    pair containing it. So: test each variant against the
    ``n_partners`` strongest other variants and flag it when more
    than ``fail_fraction`` of those pairs fail. Order-independent,
    replayable, and fully vectorised: all p·n_partners ridge
    minimisations run as one golden-section sweep over closed-form
    2×2 eigensystems (no per-pair python loop).
    """
    z = np.asarray(z, dtype=float)
    p = len(z)
    if p < 2:
        return []
    strongest = np.array(sorted(range(p), key=lambda j: (-abs(z[j]), j)))
    # partner matrix: for each j, the n_partners strongest others
    take = min(n_partners, p - 1)
    partners = np.empty((p, take), dtype=int)
    for j in range(p):
        row = strongest[strongest != j]
        partners[j] = row[:take]
    jj = np.repeat(np.arange(p), take)
    kk = partners.ravel()
    rho = ld[jj, kk]
    u1sq = (z[jj] + z[kk]) ** 2 / 2.0
    u2sq = (z[jj] - z[kk]) ** 2 / 2.0
    # ridge weight x ∈ (0,1): shrunk block is [[1, xρ],[xρ, 1]];
    # vectorised golden-section minimisation of −loglik(xρ)
    inv_phi = (np.sqrt(5.0) - 1.0) / 2.0
    a = np.zeros_like(rho)
    b = np.ones_like(rho)
    c = b - inv_phi * (b - a)
    d = a + inv_phi * (b - a)
    fc = -_pair_outlier_loglik_vec(c * rho, u1sq, u2sq, tau)
    fd = -_pair_outlier_loglik_vec(d * rho, u1sq, u2sq, tau)
    for _ in range(40):  # (1/φ)^40 ≈ 4e-9 interval width
        left = fc < fd  # minimum lies in [a, d]
        b = np.where(left, d, b)
        a = np.where(left, a, c)
        c = b - inv_phi * (b - a)
        d = a + inv_phi * (b - a)
        fc = -_pair_outlier_loglik_vec(c * rho, u1sq, u2sq, tau)
        fd = -_pair_outlier_loglik_vec(d * rho, u1sq, u2sq, tau)
    x_best = (a + b) / 2.0
    raw = _pair_outlier_loglik_vec(rho, u1sq, u2sq, tau)
    shrunk = _pair_outlier_loglik_vec(x_best * rho, u1sq, u2sq, tau)
    log_bf = -np.abs(raw - shrunk)
    flagged = (np.exp(log_bf) < bf_index).reshape(p, take)
    out = [int(j) for j in range(p) if flagged[j].sum() > fail_fraction * take]
    return out


def carma_spike_slab(
    z: np.ndarray,
    ld: np.ndarray,
    tau: float = 0.04,
    lambda_val: float = 1.0,
    num_causal: int = 10,
    beam: int = 40,
    beam3: int = 20,
    outlier_switch: bool = True,
    outlier_bf_index: float = 1.0 / 3.2,
    max_greedy_steps: int = 200,
) -> dict[str, object]:
    """Deterministic CARMA spike-slab fine-mapping of one locus.

    Returns {"PIPs": length-p array, "Outliers": sorted outlier
    indices, "visited": {config tuple -> posterior score}}.
    """
    z = np.asarray(z, dtype=float)
    p = len(z)
    outliers: set[int] = (
        set(detect_outliers(z, ld, tau, outlier_bf_index)) if outlier_switch else set()
    )
    visited: dict[tuple[int, ...], float] = {(): _model_prior(0, p, lambda_val)}

    def score_batch(models: list[tuple[int, ...]]) -> None:
        fresh = [m for m in models if m not in visited]
        if not fresh:
            return
        k = len(fresh[0])
        arr = np.array(fresh, dtype=int)
        lls = _batch_model_scores(z, ld, arr, tau)
        prior = _model_prior(k, p, lambda_val)
        for m, ll in zip(fresh, lls):
            visited[m] = float(ll) + prior

    def score(idx: tuple[int, ...]) -> float:
        if idx not in visited:
            visited[idx] = _model_score(z, ld, idx, tau) + _model_prior(
                len(idx), p, lambda_val
            )
        return visited[idx]

    def candidates() -> list[int]:
        return [j for j in range(p) if j not in outliers]

    # seed: all singletons, then exhaustive pairs over the strongest
    # `beam` variants (exact when p <= beam), then triples over a
    # tighter beam — the posterior-mass tail the reference's sampler
    # reaches by wandering. All batched.
    score_batch([(j,) for j in candidates()])
    strongest = sorted(candidates(), key=lambda j: (-abs(z[j]), j))[:beam]
    score_batch([(a, b) for a, b in combinations(sorted(strongest), 2)])
    score_batch(list(combinations(sorted(strongest[:beam3]), 3)))

    # greedy stepwise from the best seen model; swap partners come
    # from the strong beam so a step costs O(p + |S|·beam) solves,
    # not O(|S|·p)
    current: tuple[int, ...] = max(visited, key=lambda k: visited[k])
    swap_pool = set(strongest[:beam3])
    for _step in range(max_greedy_steps):
        moves: list[tuple[int, ...]] = []
        cur_set = set(current)
        free = [j for j in candidates() if j not in cur_set]
        free_swap = [j for j in free if j in swap_pool]
        if len(current) < num_causal:
            moves += [tuple(sorted(cur_set | {j})) for j in free]
        moves += [tuple(sorted(cur_set - {i})) for i in current]
        moves += [
            tuple(sorted((cur_set - {i}) | {j})) for i in current for j in free_swap
        ]
        if not moves:
            break
        for k in {len(m) for m in moves if m}:
            score_batch([m for m in moves if len(m) == k])
        best = max(moves, key=lambda m: (score(m), m))
        if score(best) <= score(current):
            break
        current = best

    # PIPs over the visited model space (reference _PIP_func,
    # carma.py:532-588): posterior-weighted inclusion per variant
    keys = list(visited.keys())
    scores = np.array([visited[k] for k in keys])
    w = np.exp(scores - scores.max())
    total = float(w.sum())
    pips = np.zeros(p)
    for k, wk in zip(keys, w):
        for j in k:
            pips[j] += wk
    pips /= total
    return {"PIPs": pips, "Outliers": sorted(outliers), "visited": visited}
