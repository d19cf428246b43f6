"""Statistical scalar functions as pure Column expressions.

The reference calls scipy inside row-UDFs for these (norm.sf in PICS,
chi2.sf in sumstat QC); here they are closed-form/approximated with
arithmetic Spark built-ins so they run in whole-stage codegen AND can
be mirrored verbatim in a SQL oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Abramowitz & Stegun 7.1.26 erf approximation constants (|err| <= 1.5e-7)
_A1, _A2, _A3, _A4, _A5 = (
    0.254829592,
    -0.284496736,
    1.421413741,
    -1.453152027,
    1.061405429,
)
_P = 0.3275911


def erfc_approx(x: Column) -> Column:
    """Complementary error function via A&S 7.1.26 (|error| ≤ 1.5e-7).

    Handles negative arguments through erfc(-x) = 2 - erfc(x).
    """
    ax = F.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    poly = ((((_A5 * t + _A4) * t + _A3) * t + _A2) * t + _A1) * t
    erfc_pos = poly * F.exp(-ax * ax)
    return F.when(x >= 0, erfc_pos).otherwise(2.0 - erfc_pos)


def normal_sf(x: Column, mu: Column, sigma: Column) -> Column:
    """Survival function 1 - Φ((x-mu)/sigma) of a Normal(mu, sigma)."""
    z = (x - mu) / sigma
    return 0.5 * erfc_approx(z / F.lit(math.sqrt(2.0)))


def chi2_sf_1df(x: Column) -> Column:
    """Upper-tail of chi-square with 1 dof: erfc(sqrt(x/2))."""
    return erfc_approx(F.sqrt(x / 2.0))


# Chebyshev-fit erfc (the classic Hastings/Press et al. rational
# approximation): FRACTIONAL error < 1.2e-7 everywhere, so it stays
# accurate deep into the tail where the A&S absolute-error bound is
# useless (erfc(7) ~ 4e-23).
_NR_C = (
    -1.26551223,
    1.00002368,
    0.37409196,
    0.09678418,
    -0.18628806,
    0.27886807,
    -1.13520398,
    1.48851587,
    -0.82215223,
    0.17087277,
)


def erfc_tail(x: Column) -> Column:
    """erfc with bounded RELATIVE error (~1.2e-7), valid in the far
    tail; use for -log10(p)-style derivations."""
    ax = F.abs(x)
    t = 1.0 / (1.0 + 0.5 * ax)
    poly = F.lit(float(_NR_C[9]))
    for c in reversed(_NR_C[1:9]):
        poly = poly * t + F.lit(float(c))
    poly = poly * t + F.lit(float(_NR_C[0]))
    ans = t * F.exp(-ax * ax + poly)
    return F.when(x >= 0, ans).otherwise(2.0 - ans)


def neg_log10_chi2_sf_1df(z2: Column) -> Column:
    """-log10 of the chi²(1df) upper tail, tail-accurate
    (reference _calculate_logpval, sumstat_quality_controls.py:53-66,
    which calls scipy in a row UDF)."""
    return -F.log10(erfc_tail(F.sqrt(z2 / 2.0)))


def round_scaled_half_away(c: Column, digits: int = 6) -> Column:
    """Round by scaling and flooring at +0.5 — the algorithm DuckDB's
    ROUND applies to doubles, spelled as Spark Columns so an
    oracle-paired query computes the SAME function on both engines
    instead of agreeing by luck (Spark's F.round rounds the shortest
    decimal repr instead, which diverges when x·10^d lands exactly on
    .5 as a double artifact — hit in the wild by event_rollup at
    sf0.1). Residual knife-edges vs std::round remain at
    pred-of-.5-form scaled doubles and odd scaled integers ≥ 2^52 —
    astronomically unlikely; every rounded cross-engine comparison in
    this repo accepts that class. Use this (not F.round) for any NEW
    oracle-paired aggregate of accumulated doubles."""
    scale = float(10**digits)
    return F.signum(c) * F.floor(F.abs(c) * scale + 0.5) / scale
