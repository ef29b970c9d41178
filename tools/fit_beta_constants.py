"""Fit per-precision LogLog-Beta coefficients for the reference's
windowed-rho convention.

LogLog-Beta (Qin, Kim, Abernethy, Lee; arXiv:1612.02284) replaces
HLL++'s linear-counting branch + empirical bias tables with one smooth
formula,

    n_hat = alpha(m) * m * (m - z) / (beta_p(z) + ssum)

where z is the zero-register count, ssum = sum(2^-reg), and beta_p is a
degree-7 polynomial in (z, ln(z+1)). The paper publishes coefficients
fitted at m = 2^14 for full 32-bit-tail rho; this engine's rho window
is the reference's NEXT-P-BITS run (rho in [1, p+1], src/hyper.erl:
189-198), and the paper's single set degrades to 4-6x the error bound
away from p=14 (measured). So we re-run the paper's own procedure per
precision:

* simulate register arrays at known cardinality n: per-register item
  counts via one multinomial draw, register value = max of k windowed
  geometrics sampled exactly through the inverse CDF
  r = ceil(-log2(1 - u^(1/k))) clipped to p+1 (clipping is exact: the
  uncapped tail mass beyond p+1 equals the window==0 mass 2^-p);
* for every sample with z > 0 the formula inverts to a linear target
  t = alpha*m*(m-z)/n - ssum over features [z, zl, zl^2, ..., zl^7],
  zl = ln(z+1);
* weighted least squares with weight dn/dbeta = n/(alpha*m*(m-z)), so
  minimizing the residual minimizes RELATIVE cardinality error;
* held-out seeds report median/p95/max relative error per p.

Deterministic (fixed PCG64 seeds); writes
hyper_spark/kernel/beta_constants.json:
    {"coeffs": {p: [c0..c7]}, "accuracy": {p: {...}}}

Run: python tools/fit_beta_constants.py
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyper_spark.kernel.hll import alpha  # noqa: E402

P_RANGE = range(4, 17)
DEGREE = 7
FIT_SEED = 20260818
VAL_SEED = 987654321
N_POINTS = 160
REPS_FIT = 24
REPS_VAL = 8
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hyper_spark",
    "kernel",
    "beta_constants.json",
)


def simulate_registers(rng: np.random.Generator, n: int, p: int) -> np.ndarray:
    """One register array for cardinality n at precision p, windowed rho."""
    m = 1 << p
    counts = rng.multinomial(n, np.full(m, 1.0 / m))
    regs = np.zeros(m, dtype=np.int64)
    nz = counts > 0
    k = counts[nz].astype(np.float64)
    u = rng.random(k.size)
    # max of k geometric(1/2) draws via inverse CDF; log1p(-u^(1/k))
    # through expm1 for k large enough that u^(1/k) ~ 1
    tail = -np.expm1(np.log(u) / k)
    tail = np.maximum(tail, 1e-300)
    r = np.ceil(-np.log2(tail)).astype(np.int64)
    regs[nz] = np.clip(r, 1, p + 1)
    return regs


def features(z: float) -> np.ndarray:
    zl = math.log(z + 1.0)
    return np.array([z] + [zl**i for i in range(1, DEGREE + 1)])


def sample_stats(regs: np.ndarray, p: int) -> tuple[float, float]:
    ssum = float(np.exp2(-regs.astype(np.float64)).sum())
    z = float(np.count_nonzero(regs == 0))
    return z, ssum


def grid(p: int) -> list[int]:
    m = 1 << p
    lo, hi = 1, 48 * m
    ns = np.unique(
        np.round(np.exp(np.linspace(math.log(lo), math.log(hi), N_POINTS)))
    ).astype(np.int64)
    return [int(n) for n in ns]


def estimate(coef: np.ndarray, z: float, ssum: float, p: int) -> float:
    m = 1 << p
    beta = float(coef @ features(z))
    return alpha(m) * m * (m - z) / (beta + ssum)


def fit_p(p: int) -> tuple[list[float], dict]:
    m = 1 << p
    a = alpha(m)
    rng = np.random.default_rng([FIT_SEED, p])
    rows, targets, weights = [], [], []
    for n in grid(p):
        for _ in range(REPS_FIT):
            regs = simulate_registers(rng, n, p)
            z, ssum = sample_stats(regs, p)
            if z <= 0:
                continue  # beta(0)=0 by construction; nothing to fit
            rows.append(features(z))
            targets.append(a * m * (m - z) / n - ssum)
            weights.append(n / (a * m * (m - z)))
    X = np.asarray(rows)
    t = np.asarray(targets)
    # scale each ROW by its beta-residual -> relative-cardinality-error
    # conversion factor, so ||scaled residual||^2 IS the sum of squared
    # relative errors (sqrt(w) here would equalize beta-error instead,
    # over-weighting the largest n ~linearly)
    w = np.asarray(weights)
    coef, *_ = np.linalg.lstsq(X * w[:, None], t * w, rcond=None)

    vrng = np.random.default_rng([VAL_SEED, p])
    errs = []
    for n in grid(p):
        for _ in range(REPS_VAL):
            regs = simulate_registers(vrng, n, p)
            z, ssum = sample_stats(regs, p)
            e = estimate(coef, z, ssum, p)
            errs.append(abs(e - n) / n)
    errs = np.asarray(errs)
    bound = 1.04 / math.sqrt(m)
    acc = {
        "median": float(np.median(errs)),
        "p95": float(np.quantile(errs, 0.95)),
        "max": float(errs.max()),
        "bound": bound,
        "samples": int(errs.size),
    }
    return [float(c) for c in coef], acc


def main() -> None:
    coeffs, accuracy = {}, {}
    for p in P_RANGE:
        c, acc = fit_p(p)
        coeffs[str(p)] = c
        accuracy[str(p)] = acc
        print(
            f"p={p}: median={acc['median']:.5f} p95={acc['p95']:.5f} "
            f"max={acc['max']:.5f} bound={acc['bound']:.5f}",
            flush=True,
        )
    with open(OUT, "w") as f:
        json.dump(
            {
                "method": "weighted-lstsq refit of LogLog-Beta "
                "(arXiv:1612.02284) per precision for the windowed-rho "
                "convention; tools/fit_beta_constants.py",
                "fit_seed": FIT_SEED,
                "coeffs": coeffs,
                "accuracy": accuracy,
            },
            f,
            indent=1,
        )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
