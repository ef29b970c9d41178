"""Moments sketch operators: O(k)-state mergeable quantiles.

Gan et al., "Moment-Based Quantile Sketches" (VLDB 2018). Completes the
quantile axis of SURVEY §2.4 (KLL = rank guarantee, t-digest = tail
accuracy, DDSketch = relative value error) with the smallest possible
mergeable state: k + 3 doubles per group — n, min, max, sum(x^i) — plus
an optional log-moment set for positive heavy-tailed data. At 100 TB
that state size is the point: a billion-group rollup ships ~12 doubles
per group per partition, two orders of magnitude under a KLL blob, and
every cube/rollup/merge stage is plain ``SUM``/``MIN``/``MAX`` codegen.

Spark-first shape:

* build  = one ``groupBy(keys).agg(count, min, max, SUM(POW(x, i)))`` —
  whole-stage codegen, map-side partial aggregation, shuffle = one row
  per (group, partition). Zero Python in the distributed plan.
* merge  = ``SUM``/``MIN``/``MAX`` regroup — associative, commutative,
  loss-free at any tree shape (the same resumable-fold contract as
  hll_agg.union_sketches / dd_merge).
* solve  = ``mapInPandas`` over the one-row-per-group sketch table: a
  deterministic numpy Newton maxent fit per group (kernel/moments.py),
  Arrow-batched, never on the driver.

Accuracy contract (measured in tests/test_moments.py): rank error
<= 0.02 at k = 8 on continuous distributions (lognormal / uniform /
bimodal / gamma measured <= 0.006); estimates always inside
[min, max]. Discrete atoms (e.g. a value carrying 50% of the mass) are
out of scope for any smooth-density method — use KLL/DDSketch there.

No reference counterpart (the reference is HLL-only; this follows the
published paper, like kernel/kll.py and operators/ddsketch.py).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.moments import MAX_K, maxent_cdf, maxent_quantiles

__all__ = [
    "moments_by",
    "moments_merge",
    "moments_quantiles",
    "moments_ranks",
    "moments_stats",
]


def _k_of(sketch_df: DataFrame) -> int:
    k = sum(1 for c in sketch_df.columns if c.startswith("m") and c[1:].isdigit())
    if k == 0:
        raise ValueError("not a moments sketch table (no m1..mk columns)")
    return k


def moments_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    k: int = 8,
    log_moments: bool = True,
) -> DataFrame:
    """One moments sketch per group:
    DataFrame[*keys, n, mn, mx, m1..mk (, n_pos, lm1..lmk)].

    ``log_moments`` also accumulates sum(ln(x)^i) over the x > 0 rows
    (plus n_pos, so the solver knows whether the WHOLE group was
    positive); the paper's log-moment set is what keeps heavy-tailed
    positive data accurate. NULLs are skipped (sketch_by's contract).
    Pure whole-stage codegen — ``POW`` + ``SUM`` — so partial
    aggregation caps the shuffle at one row per group per partition.
    """
    if not 2 <= k <= MAX_K:
        raise ValueError(f"k must be in [2, {MAX_K}], got {k}")
    c = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min(c).alias("mn"),
        F.max(c).alias("mx"),
        *[F.sum(F.pow(c, i)).alias(f"m{i}") for i in range(1, k + 1)],
    ]
    if log_moments:
        lx = F.when(c > 0, F.log(c))
        aggs.append(F.count(lx).alias("n_pos"))
        aggs.extend(
            F.sum(F.pow(lx, i)).alias(f"lm{i}") for i in range(1, k + 1)
        )
    return df.filter(c.isNotNull()).groupBy(*keys).agg(*aggs)


def moments_merge(sketch_df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge sketches onto coarser keys (global with keys=()): sums
    add, min/max fold — loss-free at any tree shape, so daily sketches
    roll up to weeks/months/all-time without touching raw rows."""
    keys = list(keys)
    k = _k_of(sketch_df)
    aggs = [
        F.sum("n").alias("n"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        *[F.sum(f"m{i}").alias(f"m{i}") for i in range(1, k + 1)],
    ]
    if "n_pos" in sketch_df.columns:
        aggs.append(F.sum("n_pos").alias("n_pos"))
        aggs.extend(F.sum(f"lm{i}").alias(f"lm{i}") for i in range(1, k + 1))
    return sketch_df.groupBy(*keys).agg(*aggs)


def moments_quantiles(
    sketch_df: DataFrame, keys: Sequence[str], qs: Sequence[float]
) -> DataFrame:
    """Evaluate quantiles from the sketch table alone:
    DataFrame[*keys, q, value] with len(qs) rows per group.

    One ``mapInPandas`` pass — each input row is one group's k + 3
    numbers, each solve is a bounded Newton iteration (kernel) — so
    evaluation distributes over however many groups exist and ships no
    raw data anywhere.
    """
    keys = list(keys)
    k = _k_of(sketch_df)
    qs = [float(q) for q in qs]
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"qs must be non-empty ranks in [0, 1], got {qs}")
    has_log = "n_pos" in sketch_df.columns
    in_cols = keys + ["n", "mn", "mx"] + [f"m{i}" for i in range(1, k + 1)]
    if has_log:
        in_cols += ["n_pos"] + [f"lm{i}" for i in range(1, k + 1)]
    key_fields = [sketch_df.schema[kc] for kc in keys]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("q", T.DoubleType(), False),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    qarr = np.asarray(qs, dtype=np.float64)

    def solve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                sums = np.array([d[f"m{i}"] for i in range(1, k + 1)])
                lsums = None
                if has_log and d["n_pos"] == d["n"]:
                    lsums = np.array([d[f"lm{i}"] for i in range(1, k + 1)])
                vals = maxent_quantiles(
                    float(d["n"]), float(d["mn"]), float(d["mx"]),
                    sums, qarr, log_sums=lsums,
                )
                for q, v in zip(qs, vals):
                    out.append(
                        {**{kc: d[kc] for kc in keys}, "q": q,
                         "value": None if np.isnan(v) else float(v)}
                    )
            yield pd.DataFrame(out, columns=keys + ["q", "value"])

    return sketch_df.select(*in_cols).mapInPandas(solve, schema)


def moments_ranks(
    sketch_df: DataFrame, keys: Sequence[str], values: Sequence[float]
) -> DataFrame:
    """Inverse read of `moments_quantiles`: estimated rank P(X <= v)
    per group for each query value — DataFrame[*keys, value, rank].
    Shares the maxent fit, fallbacks, and log-domain heuristic
    (kernel/moments.py::maxent_cdf); same one-``mapInPandas`` shape as
    the quantile eval. The SLO read: "what fraction of turns sit under
    the 2-second budget", asked of the sketch alone."""
    keys = list(keys)
    k = _k_of(sketch_df)
    values = [float(v) for v in values]
    if not values:
        raise ValueError("values must be a non-empty sequence")
    has_log = "n_pos" in sketch_df.columns
    in_cols = keys + ["n", "mn", "mx"] + [f"m{i}" for i in range(1, k + 1)]
    if has_log:
        in_cols += ["n_pos"] + [f"lm{i}" for i in range(1, k + 1)]
    key_fields = [sketch_df.schema[kc] for kc in keys]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("value", T.DoubleType(), False),
            T.StructField("rank", T.DoubleType(), True),
        ]
    )
    varr = np.asarray(values, dtype=np.float64)

    def solve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                sums = np.array([d[f"m{i}"] for i in range(1, k + 1)])
                lsums = None
                if has_log and d["n_pos"] == d["n"]:
                    lsums = np.array([d[f"lm{i}"] for i in range(1, k + 1)])
                ranks = maxent_cdf(
                    float(d["n"]), float(d["mn"]), float(d["mx"]),
                    sums, varr, log_sums=lsums,
                )
                for v, r in zip(values, ranks):
                    out.append(
                        {**{kc: d[kc] for kc in keys}, "value": v,
                         "rank": None if np.isnan(r) else float(r)}
                    )
            yield pd.DataFrame(out, columns=keys + ["value", "rank"])

    return sketch_df.select(*in_cols).mapInPandas(solve, schema)


def moments_stats(sketch_df: DataFrame) -> DataFrame:
    """Exact mean / variance / skewness / kurtosis read straight off
    the first four power sums — pure Column arithmetic (no solve, no
    Python), so this read path inlines into SQL codegen and is
    oracle-replayable term by term."""
    k = _k_of(sketch_df)
    if k < 4:
        raise ValueError(f"stats need k >= 4 moments, got k={k}")
    n, m1, m2, m3, m4 = (F.col(c) for c in ("n", "m1", "m2", "m3", "m4"))
    mean = m1 / n
    var = m2 / n - mean * mean
    # central moments from raw moments (binomial expansion)
    mu3 = m3 / n - 3 * mean * (m2 / n) + 2 * mean * mean * mean
    mu4 = (
        m4 / n
        - 4 * mean * (m3 / n)
        + 6 * mean * mean * (m2 / n)
        - 3 * mean * mean * mean * mean
    )
    sd = F.sqrt(var)

    def _is_sum(c: str) -> bool:
        return (c.startswith("m") or c.startswith("lm")) and c[1:].lstrip("m").isdigit()

    kept = [c for c in sketch_df.columns if not _is_sum(c) and c != "n_pos"]
    return sketch_df.select(
        *kept,
        mean.alias("mean"),
        var.alias("variance"),
        F.when(sd > 0, mu3 / F.pow(sd, 3)).alias("skewness"),
        F.when(sd > 0, mu4 / F.pow(sd, 4)).alias("kurtosis"),
    )
