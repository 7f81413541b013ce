"""Special functions for p-values (no scipy in the image): regularized
incomplete gamma Q(a,x) and incomplete beta I_x(a,b) via the standard
series / continued-fraction expansions (Numerical Recipes §6.2-6.4 —
public-domain formulas), vectorized over numpy arrays.

Used for: chi² survival (ChiSqTest), F survival (ANOVA/FValue) — matching
the reference's use of commons-math distributions
(flink-ml-lib/.../stats/chisqtest/ChiSqTest.java:101 etc.).
"""

from __future__ import annotations

import math

import numpy as np

_EPS = 3e-14
_FPMIN = 1e-300
_ITMAX = 500


def _gser(a: float, x: float) -> float:
    ap, summ, delt = a, 1.0 / a, 1.0 / a
    for _ in range(_ITMAX):
        ap += 1.0
        delt *= x / ap
        summ += delt
        if abs(delt) < abs(summ) * _EPS:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gcf(a: float, x: float) -> float:
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _ITMAX + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammq(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gser(a, x)
    return _gcf(a, x)


def chi2_sf(x, df):
    """Chi-squared survival function (p-value)."""
    xs = np.atleast_1d(np.asarray(x, dtype=float))
    dfs = np.broadcast_to(np.atleast_1d(np.asarray(df, dtype=float)), xs.shape)
    out = np.array([gammq(d / 2.0, v / 2.0) for v, d in zip(xs.ravel(), dfs.ravel())])
    return out.reshape(xs.shape) if np.ndim(x) else float(out[0])


def _betacf(a: float, b: float, x: float) -> float:
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _ITMAX + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
             + a * math.log(x) + b * math.log(1.0 - x))
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def f_sf(f, dfn, dfd):
    """F-distribution survival function (p-value)."""
    fs = np.atleast_1d(np.asarray(f, dtype=float))
    d1 = np.broadcast_to(np.atleast_1d(np.asarray(dfn, dtype=float)), fs.shape)
    d2 = np.broadcast_to(np.atleast_1d(np.asarray(dfd, dtype=float)), fs.shape)
    out = []
    for v, a, b in zip(fs.ravel(), d1.ravel(), d2.ravel()):
        if not np.isfinite(v) or v < 0:
            out.append(float("nan"))
        else:
            out.append(betainc(b / 2.0, a / 2.0, b / (b + a * v)))
    arr = np.array(out)
    return arr.reshape(fs.shape) if np.ndim(f) else float(arr[0])


def kolmogorov_sf(lam: float) -> float:
    """Kolmogorov distribution survival function
    Q(λ) = 2 Σ_{k≥1} (−1)^{k−1} exp(−2 k² λ²) (Numerical Recipes §14.3.3;
    the series converges in a handful of terms for λ > 0.2).  Clamped to
    [0, 1]; Q(0⁺) → 1."""
    if not math.isfinite(lam):
        return float("nan")
    if lam <= 0.0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = 2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        s += term
        if abs(term) < 1e-16:
            break
    return max(0.0, min(1.0, s))
