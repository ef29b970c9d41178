"""Moments sketch: maximum-entropy quantiles from power sums.

Gan, Ding, Tai, Sharan & Bailis, "Moment-Based Quantile Sketches for
Efficient High Cardinality Aggregation Queries" (VLDB 2018). The sketch
state per group is (n, min, max, sum(x), sum(x^2), ..., sum(x^k)) — a
dozen doubles regardless of input size, the smallest mergeable quantile
state in the library (KLL ~ k log(n/k) items, t-digest ~ centroids,
DDSketch ~ buckets; this is k+3 numbers). Merge = elementwise add of
the sums plus min/max — associative, commutative, loss-free — so build
and merge are PURE SQL aggregation (``SUM(POW(x, i))``), zero Python
anywhere in the distributed plan; only the final quantile solve (a
deterministic numpy Newton iteration over the k+3 numbers) runs in an
Arrow batch.

Estimation (paper §3): scale the domain to [-1, 1] via min/max, convert
the raw power sums to Chebyshev-basis moments, then find the MAXIMUM
ENTROPY density f(x) = exp(sum_j lambda_j T_j(x)) whose first k
Chebyshev moments match the sketch — a strictly convex program solved
by damped Newton on the dual. Quantiles invert the fitted CDF on a
fixed grid. The paper reports ~1e-3 average rank error at k = 10 on
real distributions; the operator-level contract here is the looser
rank-error <= eps bound its tests and gate assert.

Numerical conditioning (paper §3.4): raw power sums in float64 lose
precision when the domain is a narrow band far from zero (the binomial
re-centering at solve time cancels). k is capped at 12 and the solver
degrades gracefully — on non-convergence it retries with fewer moments
and bottoms out at the min/max uniform estimate.

No reference-repo counterpart (the reference is HLL-only); sibling of
kernel/kll.py / kernel/tdigest.py on the quantile axis of SURVEY §2.4.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "scaled_power_sums",
    "chebyshev_moments",
    "maxent_lambdas",
    "maxent_quantiles",
    "maxent_cdf",
    "MAX_K",
]

MAX_K = 12  # float64 conditioning ceiling (paper §3.4)
_GRID = 1024  # CDF-inversion grid; rank resolution ~ 1/_GRID


def scaled_power_sums(n: float, mn: float, mx: float, sums: np.ndarray) -> np.ndarray:
    """Power sums of the affine-scaled sample y = a*x + b in [-1, 1].

    S'_p = sum_i y_i^p = sum_{j<=p} C(p,j) a^j b^(p-j) S_j with S_0 = n
    (binomial theorem; exact in real arithmetic, float64 in practice —
    the conditioning caveat in the module docstring lives here).
    """
    k = len(sums)
    a = 2.0 / (mx - mn)
    b = -(mx + mn) / (mx - mn)
    raw = np.concatenate(([float(n)], np.asarray(sums, dtype=np.float64)))
    out = np.empty(k + 1, dtype=np.float64)
    for p in range(k + 1):
        acc = 0.0
        for j in range(p + 1):
            acc += math.comb(p, j) * (a**j) * (b ** (p - j)) * raw[j]
        out[p] = acc
    return out


def _cheb_coeffs(k: int) -> np.ndarray:
    """(k+1, k+1) matrix C with T_j(x) = sum_i C[j, i] x^i (three-term
    recurrence T_{j+1} = 2x T_j - T_{j-1})."""
    c = np.zeros((k + 1, k + 1))
    c[0, 0] = 1.0
    if k >= 1:
        c[1, 1] = 1.0
    for j in range(2, k + 1):
        c[j, 1:] = 2.0 * c[j - 1, :-1]
        c[j] -= c[j - 2]
    return c


def chebyshev_moments(n: float, mn: float, mx: float, sums: np.ndarray) -> np.ndarray:
    """mu_j = E[T_j(y)] for the scaled sample, j = 0..k (mu_0 = 1)."""
    scaled = scaled_power_sums(n, mn, mx, sums) / float(n)
    return _cheb_coeffs(len(sums)) @ scaled


def _grid(k: int, npts: int = _GRID) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(x, trapezoid weights, T values (k+1, npts)) on [-1, 1]."""
    x = np.linspace(-1.0, 1.0, npts)
    w = np.full(npts, x[1] - x[0])
    w[0] *= 0.5
    w[-1] *= 0.5
    t = np.cos(np.outer(np.arange(k + 1), np.arccos(np.clip(x, -1.0, 1.0))))
    return x, w, t


def maxent_lambdas(
    mu: np.ndarray, max_iter: int = 200, tol: float = 1e-9
) -> np.ndarray | None:
    """Dual coefficients of the maxent density exp(sum lambda_j T_j) on
    [-1, 1] matching Chebyshev moments ``mu``, or None if Newton fails
    to converge (caller retries with fewer moments).

    The dual Phi(lambda) = integral exp(lambda . T) - lambda . mu is
    smooth and strictly convex; damped Newton with backtracking is the
    paper's solver (§3.2).
    """
    k = len(mu) - 1
    _, w, t = _grid(k)
    lam = np.zeros(k + 1)
    lam[0] = math.log(0.5)  # start at the uniform density on [-1, 1]

    def parts(l_: np.ndarray):
        expo = np.clip(l_ @ t, -300.0, 300.0)
        e = np.exp(expo) * w
        return e, float(e.sum() - l_ @ mu)

    e, phi = parts(lam)
    for _ in range(max_iter):
        grad = t @ e - mu
        if float(np.abs(grad).max()) < tol:
            return lam
        h = (t * e) @ t.T
        h[np.diag_indices_from(h)] += 1e-12
        try:
            step = np.linalg.solve(h, -grad)
        except np.linalg.LinAlgError:
            return None
        # backtracking line search on the convex dual
        alpha = 1.0
        for _bt in range(60):
            cand = lam + alpha * step
            e2, phi2 = parts(cand)
            if phi2 < phi:
                lam, e, phi = cand, e2, phi2
                break
            alpha *= 0.5
        else:
            return None
    grad = t @ e - mu
    return lam if float(np.abs(grad).max()) < 1e-6 else None


def maxent_quantiles(
    n: float,
    mn: float,
    mx: float,
    sums: np.ndarray,
    qs: np.ndarray,
    log_sums: np.ndarray | None = None,
) -> np.ndarray:
    """Quantile estimates in ORIGINAL value space for ranks ``qs``.

    ``log_sums`` (sum(ln(x)^i), valid only when every x > 0) switches
    the solve into log space for positive heavy-tailed samples.
    Degenerate groups short-circuit (n == 0 -> NaN, min == max ->
    constant). Non-convergence retries with two fewer moments per step;
    the k = 0 floor is the uniform [min, max] estimate — every returned
    value is always inside [min, max].
    """
    qs = np.asarray(qs, dtype=np.float64)
    if n <= 0:
        return np.full(len(qs), np.nan)
    if mx == mn:
        return np.full(len(qs), float(mn))
    # Log-moment path (paper §3.1): heavy tails that defeat raw power
    # moments (lognormal q10 rank error ~0.06 at k=8, measured) are
    # smooth in ln x (0.004 measured). Used when the whole sample is
    # positive and the multiplicative spread is real — narrow bands at
    # a large offset (mx/mn ~ 1) condition WORSE in log space.
    if log_sums is not None and mn > 0 and mx / mn > 2.0:
        y = _solve_quantiles(n, math.log(mn), math.log(mx), log_sums, qs)
        return np.exp(y)
    return _solve_quantiles(n, mn, mx, sums, qs)


def _fit_grid_cdf(
    n: float, mn: float, mx: float, sums: np.ndarray
) -> tuple[np.ndarray, np.ndarray] | None:
    """Fitted (grid x, CDF at x) on the SCALED domain [-1, 1], or None
    when no moment prefix converges (caller falls back to uniform)."""
    sums = np.asarray(sums, dtype=np.float64)
    k = len(sums)
    while k >= 2:
        mu = chebyshev_moments(n, mn, mx, sums[:k])
        # |E[T_j]| <= 1 for ANY distribution on [-1, 1]; a violation is
        # float cancellation in the binomial re-centering, not data —
        # skip straight to fewer moments instead of feeding the solver.
        if np.all(np.isfinite(mu)) and float(np.abs(mu).max()) <= 1.0 + 1e-9:
            lam = maxent_lambdas(mu)
            if lam is not None:
                x, w, t = _grid(k)
                pdf = np.exp(np.clip(lam @ t, -300.0, 300.0)) * w
                cdf = np.cumsum(pdf)
                cdf /= cdf[-1]
                return x, cdf
        k -= 2
    return None


def _solve_quantiles(
    n: float, mn: float, mx: float, sums: np.ndarray, qs: np.ndarray
) -> np.ndarray:
    fit = _fit_grid_cdf(n, mn, mx, sums)
    if fit is None:  # uniform fallback
        y = 2.0 * qs - 1.0
    else:
        x, cdf = fit
        y = np.interp(qs, cdf, x)
    return (y * (mx - mn) + mx + mn) / 2.0


def maxent_cdf(
    n: float,
    mn: float,
    mx: float,
    sums: np.ndarray,
    values: np.ndarray,
    log_sums: np.ndarray | None = None,
) -> np.ndarray:
    """Estimated rank P(X <= v) for each v in ``values`` — the inverse
    read of `maxent_quantiles`, sharing its fit, fallbacks, and the
    log-domain heuristic (P(X <= v) = P(ln X <= ln v)). Values below
    min clamp to 0, above max to 1; n == 0 yields NaN."""
    values = np.asarray(values, dtype=np.float64)
    if n <= 0:
        return np.full(len(values), np.nan)
    if mx == mn:
        return np.where(values >= mn, 1.0, 0.0)
    if log_sums is not None and mn > 0 and mx / mn > 2.0:
        lo, hi, sums_d = math.log(mn), math.log(mx), log_sums
        # nonpositive query values rank 0 in an all-positive sample
        v = np.where(values > 0, np.log(np.maximum(values, 1e-300)), lo - 1.0)
    else:
        lo, hi, sums_d = mn, mx, sums
        v = values
    y = (2.0 * v - (hi + lo)) / (hi - lo)
    fit = _fit_grid_cdf(n, lo, hi, sums_d)
    if fit is None:  # uniform fallback
        ranks = (y + 1.0) / 2.0
    else:
        x, cdf = fit
        ranks = np.interp(y, x, cdf)
    return np.clip(np.where(y < -1.0, 0.0, np.where(y > 1.0, 1.0, ranks)), 0.0, 1.0)
