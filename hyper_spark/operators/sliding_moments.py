"""Sliding-window moments sketch: any-window quantiles and exact
distribution statistics from k+3 doubles PER TIME BUCKET.

Fifth member of the sliding family (sliding_hll.py: any-window
distinct; sliding_cms.py: top-k; sliding_theta.py: set algebra;
sliding_dd.py: relative-error quantiles). Power sums add and min/max
fold across time buckets (operators/moments.py), so a per-grain-bucket
state (*keys, bucket_ts, n, mn, mx, m1..mk, ...) answers ANY trailing
window with one conditional-sum pass — and the state is the smallest
of the family by far: k+3 numbers per (group, bucket) vs a DD bucket
table or an HLL register set. A year of daily buckets for a million
groups is ~4 GB of doubles; "mean/p99/skewness over the last 7/30/365
days, asked after the fact" never rescans raw rows.

Exactness contract: the window's n/min/max/mean/variance/skew/kurtosis
are EXACT for grain-aligned windows (sum regrouping is float-
associative, so equality is to fp-addition order, asserted at 1e-12 in
tests); quantiles carry the moments-sketch rank-accuracy contract
(|P(X <= est) - q| <= eps, kernel-measured <= 0.006 on continuous
shapes). Unaligned windows include the partially-covered oldest bucket
in full (family contract). Coarsen is the DD kind — no weakened
guarantee: sums re-grouped to a coarser grain serve aligned windows
identically.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.kernel.moments import MAX_K
from hyper_spark.operators.moments import moments_quantiles, moments_stats
from hyper_spark.operators.sliding_hll import (
    _epoch_seconds,
    _interval_seconds,
    sliding_expire,
)

__all__ = [
    "sliding_moments_table",
    "sliding_moments_merge",
    "sliding_moments_expire",
    "sliding_moments_coarsen",
    "sliding_moments_quantiles",
    "sliding_moments_stats",
]


def _k_of(state: DataFrame) -> int:
    k = sum(1 for c in state.columns if c.startswith("m") and c[1:].isdigit())
    if k == 0:
        raise ValueError("not a sliding moments state (no m1..mk columns)")
    return k


def _sum_aggs(k: int, has_log: bool) -> list[Column]:
    aggs = [
        F.sum("n").alias("n"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        *[F.sum(f"m{i}").alias(f"m{i}") for i in range(1, k + 1)],
    ]
    if has_log:
        aggs.append(F.sum("n_pos").alias("n_pos"))
        aggs.extend(F.sum(f"lm{i}").alias(f"lm{i}") for i in range(1, k + 1))
    return aggs


def sliding_moments_table(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str | Column,
    k: int = 8,
    grain: str = "1 day",
    log_moments: bool = True,
) -> DataFrame:
    """Build the sliding state: DataFrame[*keys, bucket_ts, n, mn, mx,
    m1..mk (, n_pos, lm1..lmk)] — one moments sketch per (group,
    grain-bucket), moments_by's arithmetic exactly. Pure codegen; the
    k is carried by the schema itself, so mixed-k states fail any
    union loudly instead of silently mis-merging."""
    if not 2 <= k <= MAX_K:
        raise ValueError(f"k must be in [2, {MAX_K}], got {k}")
    c = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    t = F.col(ts_col).cast("timestamp")
    bucketed = df.filter(c.isNotNull() & t.isNotNull()).select(
        *keys,
        F.window(F.col(ts_col), grain).start.cast("timestamp").alias("bucket_ts"),
        c.alias("__v"),
    )
    v = F.col("__v")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
        *[F.sum(F.pow(v, i)).alias(f"m{i}") for i in range(1, k + 1)],
    ]
    if log_moments:
        lx = F.when(v > 0, F.log(v))
        aggs.append(F.count(lx).alias("n_pos"))
        aggs.extend(F.sum(F.pow(lx, i)).alias(f"lm{i}") for i in range(1, k + 1))
    return bucketed.groupBy(*keys, "bucket_ts").agg(*aggs)


def sliding_moments_merge(
    states: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Merge same-(k, grain) shard/checkpoint states: sums add, min/max
    fold per (group, bucket) — the resumable-fold contract."""
    if not states:
        raise ValueError("no states to merge")
    keys = list(keys)
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    k = _k_of(u)
    has_log = "n_pos" in u.columns
    return u.groupBy(*keys, "bucket_ts").agg(*_sum_aggs(k, has_log))


def sliding_moments_expire(state: DataFrame, older_than_ts: str) -> DataFrame:
    """Drop buckets strictly older than the cutoff — a plain range
    predicate (bucket sketches are independent)."""
    return sliding_expire(state, older_than_ts)


def sliding_moments_coarsen(
    state: DataFrame,
    keys: Sequence[str],
    older_than_ts: str,
    grain: str,
) -> DataFrame:
    """Tiered retention: re-bucket history strictly OLDER than the
    cutoff to a coarser grain. Sums re-group (the same fold the query
    performs), so coarse-aligned windows are served identically from
    ~grain-ratio fewer rows — the DD kind of coarsen, no weakened
    guarantee. Cutoff must sit on a coarse boundary."""
    keys = list(keys)
    cut = F.lit(older_than_ts).cast("timestamp")
    b = F.col("bucket_ts").cast("timestamp")
    coarse_b = F.window(F.col("bucket_ts"), grain).start.cast("timestamp")
    k = _k_of(state)
    has_log = "n_pos" in state.columns
    old = (
        state.filter(b < cut)
        .withColumn("bucket_ts", coarse_b)
        .groupBy(*keys, "bucket_ts")
        .agg(*_sum_aggs(k, has_log))
    )
    return state.filter(b >= cut).unionByName(old)


def _windowed_state(
    state: DataFrame,
    keys: Sequence[str],
    t_ref: str,
    windows: Mapping[str, str],
) -> DataFrame:
    """One conditional-sum pass producing a (keys + window)-keyed
    moments sketch table covering every requested trailing window."""
    keys = list(keys)
    labels = list(windows)
    spark = state.sparkSession
    ref_s = _epoch_seconds(spark, t_ref)
    cutoffs = {
        lab: ref_s - _interval_seconds(spark, windows[lab]) for lab in labels
    }
    k = _k_of(state)
    has_log = "n_pos" in state.columns
    b = F.col("bucket_ts").cast("timestamp").cast("double")
    sum_cols = [f"m{i}" for i in range(1, k + 1)]
    if has_log:
        sum_cols += ["n_pos"] + [f"lm{i}" for i in range(1, k + 1)]

    def window_aggs(lab: str, i: int) -> list[Column]:
        inw = b >= F.lit(cutoffs[lab])
        out = [
            F.sum(F.when(inw, F.col("n")).otherwise(0)).alias(f"__n_{i}"),
            F.min(F.when(inw, F.col("mn"))).alias(f"__mn_{i}"),
            F.max(F.when(inw, F.col("mx"))).alias(f"__mx_{i}"),
        ]
        out.extend(
            F.sum(F.when(inw, F.col(c)).otherwise(0.0)).alias(f"__{c}_{i}")
            for c in sum_cols
        )
        return out

    aggs: list[Column] = []
    for i, lab in enumerate(labels):
        aggs.extend(window_aggs(lab, i))
    summed = state.groupBy(*keys).agg(*aggs)
    stacked = summed.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lab).alias("window"),
                        F.col(f"__n_{i}").alias("n"),
                        F.col(f"__mn_{i}").alias("mn"),
                        F.col(f"__mx_{i}").alias("mx"),
                        *[
                            F.col(f"__{c}_{i}").alias(c)
                            for c in sum_cols
                        ],
                    )
                    for i, lab in enumerate(labels)
                ]
            )
        ).alias("__x"),
    ).select(*keys, "__x.*")
    return stacked.filter(F.col("n") > 0)


def sliding_moments_quantiles(
    state: DataFrame,
    keys: Sequence[str],
    t_ref: str,
    windows: Mapping[str, str],
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantiles per (group, trailing window) queried at ``t_ref``:
    DataFrame[*keys, window, q, value]. ``windows`` maps label ->
    interval ('7 days'). One conditional-sum pass covers every window;
    the maxent solve then runs once per (group, window) row."""
    keys = list(keys)
    stacked = _windowed_state(state, keys, t_ref, windows)
    return moments_quantiles(stacked, [*keys, "window"], list(qs))


def sliding_moments_stats(
    state: DataFrame,
    keys: Sequence[str],
    t_ref: str,
    windows: Mapping[str, str],
) -> DataFrame:
    """Exact mean/variance/skewness/kurtosis per (group, trailing
    window) — pure Column arithmetic over the window-summed power
    sums, SQL-replayable term by term (moments_stats)."""
    keys = list(keys)
    stacked = _windowed_state(state, keys, t_ref, windows)
    return moments_stats(stacked)
