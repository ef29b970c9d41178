"""Sliding-window DDSketch: relative-error quantiles over ANY trailing
window from one bucketed state.

Completes the sliding family (sliding_hll.py: any-window distinct;
sliding_cms.py: any-window top-k; sliding_theta.py: any-window set
algebra) with the remaining question — "p99 latency over the last
7/30/365 days, asked after the fact". DDSketch bucket counts are
integers that merge by SUM (ddsketch.py), so a per-grain-bucket cell
state (*keys, bucket_ts, store, bucket, cnt) answers any trailing
window by summing in-window buckets: the summed table IS the DDSketch
of exactly the window's rows — same bit-identical estimates as a
direct build, same ±alpha relative-error guarantee (pytest-asserted).

Scale shape: build = one shuffle (groupBy keys × grain-bucket × store
× bucket); state ≤ live-buckets × stores × distinct-buckets rows per
group (collapse the archive with sliding_dd_coarsen, which is fully
lossless for aligned windows — counters sum, no candidate-set caveat
like CMS); query = ONE conditional-sum pass over the state for all
windows + the dd_quantiles cumulative-sum window. Pure JVM codegen
end to end.

Streaming build: streaming/dd_stream.py::streaming_windowed_dd_by
ALREADY emits this state — its per-window bucket tables are these
cells with ``window_start`` as ``bucket_ts`` (native windowed count
aggregate; integer counts make streamed == batch exact). The bridge is
a rename, pytest-asserted.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.operators.ddsketch import dd_bucket_col, dd_quantiles
from hyper_spark.operators.sliding_hll import (
    _epoch_seconds,
    _interval_seconds,
    sliding_expire,
)

__all__ = [
    "sliding_dd_table",
    "sliding_dd_merge",
    "sliding_dd_expire",
    "sliding_dd_coarsen",
    "sliding_dd_quantiles",
    "sliding_dd_drift",
]


def sliding_dd_table(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str | Column,
    alpha: float = 0.01,
    grain: str = "1 day",
    weight: str | Column | None = None,
) -> DataFrame:
    """Build the sliding state: DataFrame[*keys, bucket_ts, store,
    bucket, cnt, alpha] — per (group, grain-bucket) DDSketch bucket
    counts (ddsketch.py arithmetic exactly). NULLs are skipped; alpha
    rides as lineage so mixed states fail the query loudly.

    ``weight`` mirrors ddsketch.py::dd_by — cnt becomes the summed
    mass (NULL/NaN/non-positive weights contribute nothing), and any-
    window reads stay lossless because masses add exactly like counts;
    query with ``sliding_dd_quantiles(..., weighted=True)``."""
    c = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    t = F.col(ts_col).cast("timestamp")
    store, bucket = dd_bucket_col(c, alpha)
    base = df.filter(c.isNotNull() & t.isNotNull())
    cols = [
        F.window(F.col(ts_col), grain).start.cast("timestamp").alias(
            "bucket_ts"
        ),
        store.alias("store"),
        bucket.alias("bucket"),
    ]
    if weight is None:
        mass = F.count(F.lit(1))
    else:
        w = F.col(weight) if isinstance(weight, str) else weight
        wd = w.cast("double")
        base = base.filter((wd > 0) & ~F.isnan(wd))
        cols.append(wd.alias("__w"))
        mass = F.sum("__w")
    return (
        base.select(*keys, *cols)
        .groupBy(*keys, "bucket_ts", "store", "bucket")
        .agg(mass.alias("cnt"))
        .select(*keys, "bucket_ts", "store", "bucket", "cnt",
                F.lit(float(alpha)).alias("alpha"))
    )


def _meta(state: DataFrame) -> float:
    metas = state.select("alpha").distinct().take(2)
    if not metas:
        raise ValueError("empty dd state")
    if len(metas) > 1:
        raise ValueError("mixed-alpha dd states cannot be queried together")
    return float(metas[0]["alpha"])


def sliding_dd_merge(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Merge same-(alpha, grain) shard/checkpoint states: counts sum —
    lossless at any tree shape (equals the direct build of the combined
    input, pytest-asserted)."""
    if not states:
        raise ValueError("no states to merge")
    keys = list(keys)
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return (
        u.groupBy(*keys, "bucket_ts", "store", "bucket", "alpha")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*keys, "bucket_ts", "store", "bucket", "cnt", "alpha")
    )


def sliding_dd_expire(state: DataFrame, older_than_ts: str) -> DataFrame:
    """Drop buckets strictly older than the cutoff — a plain range
    predicate (bucket counts are independent across buckets)."""
    return sliding_expire(state, older_than_ts)


def sliding_dd_coarsen(
    state: DataFrame,
    keys: Sequence[str],
    older_than_ts: str,
    grain: str,
) -> DataFrame:
    """Tiered retention: re-bucket history strictly OLDER than the
    cutoff to a coarser grain. Counts SUM into the coarse bucket —
    exactly the window-sum the query performs — so coarse-aligned
    windows return bit-identical quantiles from fewer rows, with NO
    weakened guarantee (unlike CMS candidates). Cutoff must sit on a
    coarse boundary (see sliding_hll.sliding_coarsen)."""
    keys = list(keys)
    cut = F.lit(older_than_ts).cast("timestamp")
    b = F.col("bucket_ts").cast("timestamp")
    coarse_b = F.window(F.col("bucket_ts"), grain).start.cast("timestamp")
    old = (
        state.filter(b < cut)
        .select(
            *keys, coarse_b.alias("bucket_ts"), "store", "bucket", "cnt",
            "alpha",
        )
        .groupBy(*keys, "bucket_ts", "store", "bucket", "alpha")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*keys, "bucket_ts", "store", "bucket", "cnt", "alpha")
    )
    return state.filter(b >= cut).unionByName(old)


def sliding_dd_quantiles(
    state: DataFrame,
    keys: Sequence[str],
    t_ref: str,
    windows: Mapping[str, str],
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    alpha: float | None = None,
    weighted: bool = False,
) -> DataFrame:
    """Quantiles per (group, trailing window) queried at ``t_ref``:
    DataFrame[*keys, window, q, est]. ``windows`` maps label ->
    interval ('7 days'); grain-aligned windows carry the exact
    guarantee, unaligned ones include the partially-covered oldest
    bucket in full (family contract). One conditional-sum pass over
    the state covers every window, then the ddsketch.py bucket walk
    evaluates — bit-identical to a direct DDSketch of each window's
    raw rows. ``alpha=None`` reads the state's lineage column (one
    driver action — pass it explicitly when composing build+query in
    one unpersisted plan)."""
    keys = list(keys)
    labels = list(windows)
    spark = state.sparkSession
    ref_s = _epoch_seconds(spark, t_ref)
    cutoffs = {
        lab: ref_s - _interval_seconds(spark, windows[lab]) for lab in labels
    }
    if alpha is None:
        alpha = _meta(state)

    b = F.col("bucket_ts").cast("timestamp").cast("double")
    summed = state.groupBy(*keys, "store", "bucket").agg(
        *[
            F.sum(
                F.when(b >= F.lit(cutoffs[lab]), F.col("cnt")).otherwise(0)
            ).alias(f"__c_{i}")
            for i, lab in enumerate(labels)
        ]
    )
    stacked = (
        summed.select(
            *keys,
            "store",
            "bucket",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(lab).alias("window"),
                            F.col(f"__c_{i}").alias("count"),
                        )
                        for i, lab in enumerate(labels)
                    ]
                )
            ).alias("__x"),
        )
        .select(*keys, F.col("__x.window").alias("window"), "store", "bucket",
                F.col("__x.count").alias("count"))
        .filter(F.col("count") > 0)
    )
    return dd_quantiles(
        stacked, list(qs), keys=[*keys, "window"], alpha=alpha,
        weighted=weighted,
    )


def sliding_dd_drift(
    state: DataFrame,
    keys: Sequence[str],
    range_a: tuple[str, str],
    range_b: tuple[str, str],
) -> DataFrame:
    """Distribution drift BETWEEN two [lo, hi) time ranges from the
    state alone — the cross-range question (sliding_theta_overlap's
    shape, for values instead of sets): DataFrame[*keys, n_a, n_b,
    ks]. ``ks`` is the Kolmogorov-Smirnov statistic
    max |CDF_a - CDF_b| over the DD bucketization — deterministic
    bucket arithmetic, so an SQL oracle reproduces it to the double,
    and it sits within O(alpha) of the raw-value KS (each bucket spans
    a [x/γ, x·γ] value band). Groups empty on either side return NULL
    ks (no distribution to compare). One conditional-sum pass + one
    cumulative window, pure codegen."""
    from pyspark.sql.window import Window

    from hyper_spark.operators.ddsketch import _order_cols

    keys = list(keys)
    spark = state.sparkSession
    b = F.col("bucket_ts").cast("timestamp").cast("double")

    def _in(rng: tuple[str, str]) -> Column:
        lo = _epoch_seconds(spark, rng[0])
        hi = _epoch_seconds(spark, rng[1])
        return (b >= F.lit(lo)) & (b < F.lit(hi))

    in_a, in_b = _in(range_a), _in(range_b)
    cells = (
        state.filter(in_a | in_b)
        .groupBy(*keys, "store", "bucket")
        .agg(
            F.sum(F.when(in_a, F.col("cnt")).otherwise(0)).alias("__ca"),
            F.sum(F.when(in_b, F.col("cnt")).otherwise(0)).alias("__cb"),
        )
    )
    store_rank, signed_bucket = _order_cols()
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(store_rank, signed_bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = cells.select(
        *keys,
        F.sum("__ca").over(w_cum).alias("__cum_a"),
        F.sum("__cb").over(w_cum).alias("__cum_b"),
        F.sum("__ca").over(w_all).alias("n_a"),
        F.sum("__cb").over(w_all).alias("n_b"),
    )
    gap = F.abs(
        F.col("__cum_a") / F.col("n_a") - F.col("__cum_b") / F.col("n_b")
    )
    return cum.groupBy(*keys).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.max(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), gap)
        ).alias("ks"),
    )
