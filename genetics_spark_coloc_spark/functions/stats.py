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
