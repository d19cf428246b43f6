"""SuSiE-inf: LD-aware sum-of-single-effects fine-mapping with an
infinitesimal random-effect component.

Published method: Cui, Dey, Eraslan, Finucane et al. (2023),
"Improving fine-mapping by modeling infinitesimal effects"
(the FinucaneLab *fine-mapping-inf* package). Reference parity:
method/susie_inf.py:33-234 (model fit), :236-299 (method-of-moments
variance update), :301-404 (MLE variance update), :406-468
(credible-set extraction). This is an independent NumPy
implementation from the published model:

    y = X b + X a + e,   b = sum_l b_l (single effects),
    a ~ N(0, tau^2 I)  (infinitesimal),  e ~ N(0, sigma^2 I)

fitted on summary statistics (z, LD) through the eigendecomposition
X'X = V diag(Dsq) V'. Differences from the reference by design:

- no SciPy: bounded scalar minimisation is golden-section
  (``_minimize_bounded``); the 2-parameter MLE uses coordinate
  descent over the same bounded scalar routine.
- credible-set purity subsampling is deterministic (top-100 by PIP)
  instead of ``np.random.choice(seed=123)`` — an engine operator
  must be replayable.

Spark integration lives in ``operators/finemapping.py``: per-locus
kernels under ``groupBy(locus).applyInPandas`` — thousands of loci
schedule across executors, each locus fits in one Arrow batch.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

def _minimize_bounded(
    f: Callable[[float], float],
    lo: float,
    hi: float,
    xatol: float = 1e-5,
    max_fun: int = 500,
) -> float:
    """Bounded scalar minimisation: Brent's method (golden section +
    successive parabolic interpolation) per Forsythe, Malcolm & Moler,
    "Computer Methods for Mathematical Computations" (1977), FMIN.

    This is the same classic algorithm SciPy's
    ``minimize_scalar(method="bounded")`` implements, which the
    reference calls (susie_inf.py:157); matching it step-for-step
    keeps iteration trajectories — and therefore golden values —
    aligned without a SciPy dependency.
    """
    golden_mean = 0.5 * (3.0 - np.sqrt(5.0))
    sqrt_eps = np.sqrt(2.2e-16)
    a, b = float(lo), float(hi)
    x = w = v = a + golden_mean * (b - a)
    fx = fw = fv = f(x)
    step = prev_range = 0.0
    mid = 0.5 * (a + b)
    tol1 = sqrt_eps * abs(x) + xatol / 3.0
    tol2 = 2.0 * tol1
    n_eval = 1
    while abs(x - mid) > (tol2 - 0.5 * (b - a)):
        use_golden = True
        if abs(prev_range) > tol1:
            # try a parabolic fit through (x, w, v)
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            if q > 0.0:
                p = -p
            q = abs(q)
            r = prev_range
            prev_range = step
            if (abs(p) < abs(0.5 * q * r)) and (p > q * (a - x)) and (p < q * (b - x)):
                use_golden = False
                step = p / q
                u = x + step
                if (u - a) < tol2 or (b - u) < tol2:
                    step = tol1 if mid >= x else -tol1
        if use_golden:
            prev_range = (a if x >= mid else b) - x
            step = golden_mean * prev_range
        u = x + (np.sign(step) or 1.0) * max(abs(step), tol1)
        fu = f(u)
        n_eval += 1
        if fu <= fx:
            if u >= x:
                a = x
            else:
                b = x
            v, fv, w, fw = w, fw, x, fx
            x, fx = u, fu
        else:
            if u < x:
                a = u
            else:
                b = u
            if fu <= fw or w == x:
                v, fv, w, fw = w, fw, u, fu
            elif fu <= fv or v == x or v == w:
                v, fv = u, fu
        mid = 0.5 * (a + b)
        tol1 = sqrt_eps * abs(x) + xatol / 3.0
        tol2 = 2.0 * tol1
        if n_eval >= max_fun:
            break
    return x


def _logsumexp(a: np.ndarray) -> float:
    m = np.max(a)
    if not np.isfinite(m):
        return float(m)
    return float(m + np.log(np.sum(np.exp(a - m))))


def _eig_xtx(ld: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Eigendecomposition of X'X = n * LD; eigenvalues clipped at 0."""
    evals, vecs = np.linalg.eigh(ld)
    return vecs, np.maximum(n * evals, 0.0)


def _vmul(V: np.ndarray | None, x: np.ndarray) -> np.ndarray:
    """V @ x, with V=None meaning the identity basis (O(p) shortcut)."""
    return x if V is None else V @ x


def _vtmul(V: np.ndarray | None, x: np.ndarray) -> np.ndarray:
    """V.T @ x, with V=None meaning the identity basis."""
    return x if V is None else V.T @ x


def susie_inf(  # noqa: C901
    z: np.ndarray,
    ld: np.ndarray | None = None,
    n: int = 100_000,
    L: int = 10,
    meansq: float = 1.0,
    V: np.ndarray | None = None,
    Dsq: np.ndarray | None = None,
    est_ssq: bool = True,
    ssq: np.ndarray | None = None,
    ssq_range: tuple[float, float] = (0.0, 1.0),
    pi0: np.ndarray | None = None,
    est_sigmasq: bool = True,
    est_tausq: bool = False,
    sigmasq: float = 1.0,
    tausq: float = 0.0,
    sigmasq_range: tuple[float, float] | None = None,
    tausq_range: tuple[float, float] | None = None,
    method: str = "moments",
    maxiter: int = 100,
    pip_tol: float = 1e-3,
) -> dict[str, Any]:
    """Fit SuSiE-inf on z-scores and an LD matrix.

    Returns a dict with keys PIP (p×L per-effect inclusion
    probabilities), mu, omega, lbf_variable (p×L per-effect log
    Bayes factors), ssq, sigmasq, tausq, alpha (posterior
    infinitesimal effects), lbf (length-L credible-set logBFs).

    ``ld=None`` means "no LD available": an identity LD matrix, which
    reduces the model to independent single-effect regressions (the
    eigenbasis is trivial — no decomposition is computed).
    """
    z = np.asarray(z, dtype=float)
    p = len(z)
    if V is None or Dsq is None:
        if ld is None:
            # identity LD: X'X = n I — keep V symbolic (None) so every
            # V@x / V.T@x below is the identity map and the fit stays
            # O(p) per iteration instead of O(p²)
            V = None
            Dsq = np.full(p, float(n))
        else:
            V, Dsq = _eig_xtx(np.asarray(ld, dtype=float), n)
    else:
        Dsq = np.maximum(np.asarray(Dsq, dtype=float), 0.0)

    xty = np.sqrt(n) * z
    vt_xty = _vtmul(V, xty)
    yty = n * meansq

    ssq = np.full(L, 0.2) if ssq is None else np.asarray(ssq, dtype=float).copy()
    pip = np.full((p, L), 1.0 / p)
    mu = np.zeros((p, L))
    lbf_var = np.zeros((p, L))
    logpi0 = (
        np.full(p, -np.log(p))
        if pi0 is None
        else np.where(pi0 > 0, np.log(np.maximum(pi0, 1e-300)), -np.inf)
    )

    var = tausq * Dsq + sigmasq
    diag_xox = (
        Dsq / var if V is None else np.sum(V * V * (Dsq / var), axis=1)
    )
    xoy = _vmul(V, vt_xty / var)
    omega = diag_xox[:, None] + 1.0 / ssq[None, :]

    for _it in range(maxiter):
        pip_prev = pip.copy()
        for el in range(L):
            # residualize: remove all effects except l
            b_other = (mu * pip).sum(axis=1) - mu[:, el] * pip[:, el]
            xoxb = _vmul(V, _vtmul(V, b_other) * Dsq / var)
            xor = xoy - xoxb
            if est_ssq:
                # profile out the prior effect variance s_l^2 by
                # minimising the negative single-effect evidence
                def neg_evidence(x: float, xor: np.ndarray = xor) -> float:
                    return -_logsumexp(
                        -0.5 * np.log1p(x * diag_xox)
                        + x * xor**2 / (2.0 * (1.0 + x * diag_xox))
                        + logpi0
                    )

                ssq[el] = _minimize_bounded(neg_evidence, *ssq_range)
            omega[:, el] = diag_xox + 1.0 / ssq[el]
            mu[:, el] = xor / omega[:, el]
            lbf_var[:, el] = xor**2 / (2.0 * omega[:, el]) - 0.5 * np.log(
                omega[:, el] * ssq[el]
            )
            log_pip = lbf_var[:, el] + logpi0
            pip[:, el] = np.exp(log_pip - _logsumexp(log_pip))

        if est_sigmasq or est_tausq:
            if method == "moments":
                sigmasq, tausq = _update_var_moments(
                    pip, mu, omega, tausq, sigmasq, n, V, Dsq, vt_xty, xty, yty,
                    est_sigmasq, est_tausq,
                )
            elif method == "MLE":
                sigmasq, tausq = _update_var_mle(
                    pip, mu, omega, sigmasq, tausq, n, V, Dsq, vt_xty, yty,
                    est_sigmasq, est_tausq, sigmasq_range, tausq_range,
                )
            else:
                raise ValueError(f"unknown variance estimation method {method!r}")
            var = tausq * Dsq + sigmasq
            diag_xox = (
                Dsq / var if V is None else np.sum(V * V * (Dsq / var), axis=1)
            )
            xoy = _vmul(V, vt_xty / var)

        if np.max(np.abs(pip - pip_prev)) < pip_tol:
            break

    b_post = (mu * pip).sum(axis=1)
    xor = xoy - _vmul(V, _vtmul(V, b_post) * Dsq / var)
    alpha = tausq * xor
    lbf_cs = np.array(
        [_logsumexp(lbf_var[:, el] - np.log(p)) for el in range(L)]
    )
    return {
        "PIP": pip,
        "mu": mu,
        "omega": omega,
        "lbf_variable": lbf_var,
        "ssq": ssq,
        "sigmasq": sigmasq,
        "tausq": tausq,
        "alpha": alpha,
        "lbf": lbf_cs,
    }


def _posterior_second_moments(
    pip: np.ndarray, mu: np.ndarray, omega: np.ndarray, V: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray]:
    """diag(V' M V) where M = E[bb'] under the variational posterior,
    plus V'b for the posterior mean b (shared by MoM and MLE updates).
    V=None is the identity basis."""
    b = (mu * pip).sum(axis=1)
    vtb = _vtmul(V, b)
    diag_vmv = vtb**2
    # subtract per-effect squared projections, add marginal second moments
    per_effect = mu * pip  # p × L
    vt_pe = _vtmul(V, per_effect)  # p × L
    diag_vmv -= np.sum(vt_pe**2, axis=1)
    snd = np.sum(pip * (mu**2 + 1.0 / omega), axis=1)  # E[b_j^2] summed over l
    diag_vmv += snd if V is None else (V.T**2) @ snd
    return vtb, diag_vmv


def _update_var_moments(
    pip: np.ndarray,
    mu: np.ndarray,
    omega: np.ndarray,
    tausq: float,
    sigmasq: float,
    n: int,
    V: np.ndarray,
    Dsq: np.ndarray,
    vt_xty: np.ndarray,
    xty: np.ndarray,
    yty: float,
    est_sigmasq: bool,
    est_tausq: bool,
) -> tuple[float, float]:
    """Method-of-moments update for (sigma^2, tau^2): match E[||y-Xb||^2]
    and E[||X'(y-Xb)||^2] to their model expectations — a 2×2 linear
    system in (sigma^2, tau^2)."""
    vtb, diag_vmv = _posterior_second_moments(pip, mu, omega, V)
    b = _vmul(V, vtb)  # == posterior mean in original basis
    sum_d = float(np.sum(Dsq))
    sum_d2 = float(np.sum(Dsq**2))
    m0 = yty - 2.0 * float(b @ xty) + float(Dsq @ diag_vmv)
    m1 = (
        float(xty @ xty)
        - 2.0 * float((vtb * vt_xty) @ Dsq)
        + float((Dsq**2) @ diag_vmv)
    )
    if est_tausq:
        # solve [[n, sum_d], [sum_d, sum_d2]] @ (sigmasq, tausq) = (m0, m1)
        det = n * sum_d2 - sum_d * sum_d
        sig = (m0 * sum_d2 - m1 * sum_d) / det
        tau = (n * m1 - sum_d * m0) / det
        if sig > 0 and tau > 0:
            return float(sig), float(tau)
        return m0 / n, 0.0
    if est_sigmasq:
        return (m0 - sum_d * tausq) / n, tausq
    return sigmasq, tausq


def _update_var_mle(
    pip: np.ndarray,
    mu: np.ndarray,
    omega: np.ndarray,
    sigmasq: float,
    tausq: float,
    n: int,
    V: np.ndarray,
    Dsq: np.ndarray,
    vt_xty: np.ndarray,
    yty: float,
    est_sigmasq: bool,
    est_tausq: bool,
    sigmasq_range: tuple[float, float] | None,
    tausq_range: tuple[float, float] | None,
) -> tuple[float, float]:
    """Bounded MLE of (sigma^2, tau^2) on the variational objective.

    The reference uses L-BFGS-B; without SciPy we run coordinate
    descent, each coordinate solved by golden-section — the objective
    is smooth and the box is small, so a handful of sweeps converges.
    """
    p = mu.shape[0]
    if sigmasq_range is None:
        sigmasq_range = (0.2 * yty / n, 1.2 * yty / n)
    if tausq_range is None:
        tausq_range = (1e-12, 1.2 * yty / (n * p))
    vtb, diag_vmv = _posterior_second_moments(pip, mu, omega, V)

    def neg_elbo(sig: float, tau: float) -> float:
        denom = tau * Dsq + sig
        return (
            0.5 * (n - p) * np.log(sig)
            + 0.5 / sig * yty
            + float(
                np.sum(
                    0.5 * np.log(denom)
                    - 0.5 * tau / sig * vt_xty**2 / denom
                    - vtb * vt_xty / denom
                    + 0.5 * Dsq / denom * diag_vmv
                )
            )
        )

    # L-BFGS-B (the reference's optimizer) terminates when the
    # objective improves by less than factr*eps*max(|f|,1) — with the
    # default factr=1e7 that is a LOOSE stop (~1e-4 at this objective's
    # scale), so from a warm start the parameters freeze once the
    # outer IBSS loop stops moving them materially. Reproduce that
    # termination rule: reject the update when the improvement over
    # the warm start is below the same threshold.
    f0 = neg_elbo(
        min(max(sigmasq, sigmasq_range[0]), sigmasq_range[1]),
        min(max(tausq, tausq_range[0]), tausq_range[1]),
    )
    ftol = 1e7 * 2.220446049250313e-16
    if est_tausq:
        sig, tau = sigmasq, tausq
        for _sweep in range(8):
            sig_new = _minimize_bounded(lambda x: neg_elbo(x, tau), *sigmasq_range)
            tau_new = _minimize_bounded(lambda x: neg_elbo(sig_new, x), *tausq_range)
            if abs(sig_new - sig) < 1e-10 and abs(tau_new - tau) < 1e-14:
                sig, tau = sig_new, tau_new
                break
            sig, tau = sig_new, tau_new
        if f0 - neg_elbo(sig, tau) < ftol * max(abs(f0), 1.0):
            return sigmasq, tausq
        return float(sig), float(tau)
    if est_sigmasq:
        sig = _minimize_bounded(lambda x: neg_elbo(x, tausq), *sigmasq_range)
        if f0 - neg_elbo(sig, tausq) < ftol * max(abs(f0), 1.0):
            return sigmasq, tausq
        return float(sig), tausq
    return sigmasq, tausq


def credible_sets(
    pip: np.ndarray,
    n: int = 100_000,
    coverage: float = 0.99,
    purity: float = 0.5,
    ld: np.ndarray | None = None,
    V: np.ndarray | None = None,
    Dsq: np.ndarray | None = None,
    dedup: bool = True,
    purity_subsample: int = 100,
) -> list[list[int]]:
    """Extract level-`coverage` credible sets from per-effect PIPs,
    filtered by min-|r| purity (reference cred_inf, susie_inf.py:406-468).

    Deviation: purity on large sets is checked on the top-
    ``purity_subsample`` variants by PIP (deterministic) rather than a
    seeded random subsample.
    """
    if ld is None and (V is None or Dsq is None):
        raise ValueError("need ld or (V, Dsq) for purity filtering")
    out: list[list[int]] = []
    for el in range(pip.shape[1]):
        order = np.argsort(-pip[:, el], kind="stable")
        cum = np.cumsum(pip[order, el])
        k = int(np.argmax(cum >= coverage))
        if cum[-1] < coverage:
            continue
        members = order[: k + 1]
        if len(members) == 1:
            out.append([int(members[0])])
            continue
        rows = members[:purity_subsample]
        if ld is not None:
            sub = ld[np.ix_(rows, rows)]
        else:
            sub = (V[rows, :] * Dsq) @ V[rows, :].T / n
        if np.min(np.abs(sub)) > purity:
            out.append(sorted(int(i) for i in members))
    if dedup:
        seen: list[tuple[int, ...]] = []
        for cs in out:
            if tuple(cs) not in seen:
                seen.append(tuple(cs))
        out = [list(t) for t in seen]
    return out
