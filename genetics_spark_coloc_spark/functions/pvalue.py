"""Decomposed p-value algebra.

P-values are stored as ``(pValueMantissa: float, pValueExponent: int)``
so values below the double underflow limit (1e-308) survive
(reference: src/gentropy/common/utils.py:123-169,
assets/schemas/summary_statistics.json). Every comparison must happen
on the pair, never on the recomposed double.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_pvalue(pvalue: float) -> tuple[float, int]:
    """Decompose a float p-value into (mantissa ∈ [1,10), exponent).

    >>> split_pvalue(5e-8)
    (5.0, -8)
    >>> split_pvalue(0.5)
    (5.0, -1)
    """
    if not (0 < pvalue <= 1):
        raise ValueError(f"p-value must be in (0, 1], got {pvalue}")
    exponent = math.floor(math.log10(pvalue))
    mantissa = round(pvalue / 10**exponent, 10)
    if mantissa >= 10:  # e.g. pvalue=1.0 -> (1.0, 0) not (10.0, -1)
        mantissa /= 10
        exponent += 1
    return mantissa, exponent


def split_pvalue_column(pvalue: Column) -> tuple[Column, Column]:
    """Column version of :func:`split_pvalue` (reference: utils.py:123-169)."""
    exponent = F.floor(F.log10(pvalue)).cast("integer")
    mantissa = F.round(pvalue / F.pow(F.lit(10.0), exponent), 10)
    # normalise the 10.0 mantissa edge produced by floor/round interplay
    mantissa_norm = F.when(mantissa >= 10, mantissa / 10).otherwise(mantissa).cast("float")
    exponent_norm = F.when(mantissa >= 10, exponent + 1).otherwise(exponent)
    return mantissa_norm, exponent_norm


def pvalue_pair_lte(
    mantissa: Column, exponent: Column, threshold: float
) -> Column:
    """``p <= threshold`` evaluated on the decomposed pair
    (reference: dataset/summary_statistics.py:38-58).

    exp < t_exp  ∨  (exp = t_exp ∧ mantissa <= t_mantissa)
    """
    t_mantissa, t_exponent = split_pvalue(threshold)
    return (exponent < F.lit(t_exponent)) | (
        (exponent == F.lit(t_exponent)) & (mantissa <= F.lit(t_mantissa))
    )


def pvalue_pair_gt(
    mantissa: Column, exponent: Column, threshold: float
) -> Column:
    """``p > threshold`` on the decomposed pair (negation companion of
    :func:`pvalue_pair_lte`, used by lead-p-value QC)."""
    t_mantissa, t_exponent = split_pvalue(threshold)
    return (exponent > F.lit(t_exponent)) | (
        (exponent == F.lit(t_exponent)) & (mantissa > F.lit(t_mantissa))
    )


def neglog_pvalue_to_mantissa_and_exponent(
    neglog_pvalue_col: Column,
) -> tuple[Column, Column]:
    """-log10(p) → (pValueMantissa float, pValueExponent int), exact
    reference arithmetic (spark_helpers.py:256-284):
    exponent = ceil(nlp), mantissa = 10^(exponent - nlp), sign-flip
    the exponent. Survives p below 1e-308 because p itself is never
    materialised."""
    exponent = F.ceil(neglog_pvalue_col)
    mantissa = F.pow(F.lit(10), exponent - neglog_pvalue_col)
    return (
        mantissa.cast("float").alias("pValueMantissa"),
        (-1 * exponent).cast("int").alias("pValueExponent"),
    )


def neglog_pvalue(mantissa: Column, exponent: Column) -> Column:
    """-log10(p) from the pair: -(log10(mantissa) + exponent)
    (reference: common/spark_helpers.py:288-313)."""
    return -(F.log10(mantissa.cast("double")) + exponent.cast("double"))


def zscore_from_pvalue(mantissa: Column, exponent: Column, beta: Column) -> Column:
    """Two-sided p -> |z| with the sign of beta.

    |z| = sqrt(2) * erfinv(1 - p); computed in log space from the
    pair so it survives tiny p. Uses the Acklam/Moro-style inverse
    normal via Spark built-ins is overkill here; for p representable
    as a double we invert with ``sqrt(2)*erfinv``, and for smaller p
    we use the asymptotic expansion |z| ≈ sqrt(2L - ln(2L) - ln(2π))
    where L = ln(1/p) (classic tail approximation of Φ⁻¹).

    The reference does this with a scipy UDF
    (common/spark_helpers.py:101-134); staying JVM-side keeps the hot
    path in codegen.
    """
    ln10 = math.log(10.0)
    log_p = (F.log(mantissa.cast("double")) + exponent.cast("double") * F.lit(ln10))
    big_l = -log_p  # L = ln(1/p)
    asymptotic = F.sqrt(
        2 * big_l - F.log(2 * big_l) - F.lit(math.log(2 * math.pi))
    )
    p = F.exp(log_p)
    # rational approximation (Acklam) valid for p in (0, 0.5]; vectorised branches
    exact = _norm_ppf_upper(p)
    magnitude = F.when(exponent >= -300, exact).otherwise(asymptotic)
    return F.when(beta < 0, -magnitude).otherwise(magnitude)


def norm_ppf(u: Column) -> Column:
    """Φ⁻¹(u) for u in (0, 1): the plain inverse normal CDF, via the
    same Acklam rational approximation as ``_norm_ppf_upper``
    (reflected through 0.5 so both tails share one polynomial pair).
    Used to turn deterministic uniforms into Gaussian noise for the
    oracle-able simulation benchmark (operators/finemap_sim.py) —
    the SQL oracles carry the identical polynomial, so both engines
    agree to ~1e-9 relative."""
    lower = F.least(u, 1 - u)
    mag = _norm_ppf_upper(2 * lower)
    return F.when(u < 0.5, -mag).otherwise(mag)


def _norm_ppf_upper(p: Column) -> Column:
    """|Φ⁻¹(p/2)| for two-sided p, via Acklam's rational approximation.

    Max relative error ~1.15e-9 — adequate for z-score harmonisation
    (the reference's scipy UDF is exact but row-at-a-time Python).
    """
    # two-sided: q = p/2 is the lower-tail probability of -|z|
    q = p / 2
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    p_low = 0.02425
    # tail branch (q < p_low): z = poly_c(t)/poly_d(t), t = sqrt(-2 ln q)
    t = F.sqrt(-2 * F.log(q))
    num_c = ((((c[0] * t + c[1]) * t + c[2]) * t + c[3]) * t + c[4]) * t + c[5]
    den_d = (((d[0] * t + d[1]) * t + d[2]) * t + d[3]) * t + 1
    tail = num_c / den_d
    # central branch: z = q_poly, r = q - 0.5, s = r*r
    r = q - 0.5
    s = r * r
    num_a = (((((a[0] * s + a[1]) * s + a[2]) * s + a[3]) * s + a[4]) * s + a[5]) * r
    den_b = ((((b[0] * s + b[1]) * s + b[2]) * s + b[3]) * s + b[4]) * s + 1
    central = num_a / den_b
    z = F.when(q < p_low, tail).otherwise(-central)
    return F.abs(z)
