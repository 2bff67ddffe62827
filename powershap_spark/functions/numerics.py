"""Vendored numeric kernels (no scipy / statsmodels in this environment).

Implements exactly the statistical primitives the reference engine uses:

- ``percentileofscore(kind='rank')``   (reference: powershap/utils.py:9-10)
- Student-t CDF / PPF                   (via regularized incomplete beta)
- noncentral-t CDF                      (chi2-mixture integration)
- one-sample t-test power, 'smaller'    (statsmodels TTestPower().power,
                                         reference: powershap/utils.py:38-46)
- solve_power for nobs                  (reference: powershap/utils.py:50-58)

All functions are pure numpy/math, driver-side only — they run on the tiny
(m+1)-row per-feature aggregate, never inside Spark tasks.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "percentileofscore_rank",
    "betainc_reg",
    "t_cdf",
    "t_ppf",
    "nct_cdf",
    "ttest_power_smaller",
    "solve_power_nobs",
]


def percentileofscore_rank(scores: np.ndarray, x: float) -> float:
    """scipy.stats.percentileofscore(scores, x, kind='rank') — in [0, 100].

    rank semantics (scipy >= 1.9): mean of the 'weak' (<=) and 'strict' (<)
    counts plus a +1 tie correction applied when any element equals the
    score, i.e. ``(count(s < x) + count(s <= x) + [any(s == x)]) * 50 / n``.
    The tie term matters for degenerate all-equal columns (e.g. all-zero
    SHAP values from a single-class fit), where omitting it understates the
    percentile by 1/(2n).
    """
    s = np.asarray(scores, dtype=np.float64)
    n = len(s)
    if n == 0:
        return np.nan
    strict = np.count_nonzero(s < x)
    weak = np.count_nonzero(s <= x)
    plus1 = 1 if weak > strict else 0
    return (strict + weak + plus1) * 50.0 / n


# ---------------------------------------------------------------------------
# Regularized incomplete beta  I_x(a, b)  (Numerical-Recipes-style Lentz CF)
# ---------------------------------------------------------------------------


def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 300, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


# ---------------------------------------------------------------------------
# Student t
# ---------------------------------------------------------------------------


def t_cdf(x: float, df: float) -> float:
    if df <= 0:
        return np.nan
    if x == 0.0:
        return 0.5
    ib = betainc_reg(df / 2.0, 0.5, df / (df + x * x))
    return 1.0 - 0.5 * ib if x > 0 else 0.5 * ib


def t_ppf(p: float, df: float) -> float:
    """Inverse CDF by bisection + Newton polish (plenty for driver-side use)."""
    if not (0.0 < p < 1.0):
        if p <= 0.0:
            return -math.inf
        return math.inf
    lo, hi = -1.0, 1.0
    while t_cdf(lo, df) > p:
        lo *= 2.0
        if lo < -1e10:
            break
    while t_cdf(hi, df) < p:
        hi *= 2.0
        if hi > 1e10:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-13 * max(1.0, abs(hi)):
            break
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# Noncentral t CDF via the chi2 mixture representation:
#   T = (Z + nc) / sqrt(V/df),  Z ~ N(0,1) ⟂ V ~ chi2(df)
#   P(T <= t) = E_V[ Phi(t * sqrt(V/df) - nc) ]
# integrated with Gauss-Legendre over the chi2 bulk (the integrand is smooth).
# ---------------------------------------------------------------------------

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(192)


def _chi2_logpdf(v: np.ndarray, df: float) -> np.ndarray:
    k2 = df / 2.0
    return (k2 - 1.0) * np.log(v) - v / 2.0 - k2 * math.log(2.0) - math.lgamma(k2)


def nct_cdf(t: float, df: float, nc: float) -> float:
    if df <= 0:
        return np.nan
    if math.isinf(t):
        return 1.0 if t > 0 else 0.0
    # chi2(df) bulk: mean df, sd sqrt(2 df); clip at 0.
    sd = math.sqrt(2.0 * df)
    lo = max(1e-12, df - 14.0 * sd)
    hi = df + 14.0 * sd
    if df < 2.0:
        lo = 1e-12  # density is unbounded at 0 for df<2; integrand still finite
    mid = 0.5 * (hi + lo)
    half = 0.5 * (hi - lo)
    v = mid + half * _GL_NODES
    w = half * _GL_WEIGHTS
    dens = np.exp(_chi2_logpdf(v, df))
    z = t * np.sqrt(v / df) - nc
    vals = 0.5 * (1.0 + np.array([math.erf(zz / math.sqrt(2.0)) for zz in z]))
    out = float(np.sum(w * dens * vals))
    return min(1.0, max(0.0, out))


# ---------------------------------------------------------------------------
# One-sample t-test power, alternative='smaller'
# (statsmodels.stats.power.TTestPower semantics, as used at
#  reference powershap/utils.py:38-58)
# ---------------------------------------------------------------------------


def ttest_power_smaller(effect_size: float, nobs: float, alpha: float) -> float:
    """power = F_nct( t_ppf(alpha, df); df, nc ) with df=nobs-1, nc=es*sqrt(nobs)."""
    df = nobs - 1.0
    if df <= 0:
        return np.nan
    nc = effect_size * math.sqrt(nobs)
    crit = t_ppf(alpha, df)
    return nct_cdf(crit, df, nc)


def solve_power_nobs(
    effect_size: float,
    alpha: float,
    power: float,
    n_max: float = 1e8,
) -> float:
    """Solve ``ttest_power_smaller(es, nobs, alpha) == power`` for nobs.

    Monotone increasing in nobs for effect_size < 0 (the only case the
    reference hits: features significant under 'smaller'). Bisection on
    [2, n_max]; returns n_max when even that is insufficient (caller ceils
    and the automatic-mode recursion limit bounds the loop anyway).
    """
    if effect_size >= 0 or not np.isfinite(effect_size):
        return float(n_max)
    lo, hi = 2.0, 4.0
    while ttest_power_smaller(effect_size, hi, alpha) < power:
        hi *= 2.0
        if hi >= n_max:
            return float(n_max)
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if ttest_power_smaller(effect_size, mid, alpha) < power:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-9 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)
