"""Streaming build for the sliding-window moments state.

Same move as sliding_cms_stream.py: the sliding moments state is
relational (operators/sliding_moments.py — one row of k+3 numbers per
(*keys, grain-bucket)), and every component is a NATIVE windowed
aggregate — COUNT / MIN / MAX / SUM(POW(x, i)) — so the build is
Structured Streaming's plain windowed agg: JVM state store end to end,
watermark expiry free, no custom state operator, no Python anywhere.

Sums and min/max are order-insensitive, so closed buckets match the
batch bucketization of the same rows exactly up to float-addition
associativity (counts and min/max bit-exact, power sums at ~1e-15
relative — the parity pytest asserts both). The sink is directly
queryable by sliding_moments_quantiles / sliding_moments_stats.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.kernel.moments import MAX_K

__all__ = ["streaming_sliding_moments"]


def streaming_sliding_moments(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str | Column,
    k: int = 8,
    grain: str = "1 day",
    watermark: str = "1 hour",
    log_moments: bool = True,
) -> DataFrame:
    """Streaming moments rows per (keys, grain window): DataFrame[*keys,
    bucket_ts, n, mn, mx, m1..mk (, n_pos, lm1..lmk)] — the exact
    schema the batch sliding_moments query paths consume. Late rows
    inside the watermark fold in exactly (sum/min/max are
    order-insensitive); works identically on a bounded batch frame,
    which the parity test exploits."""
    if not 2 <= k <= MAX_K:
        raise ValueError(f"k must be in [2, {MAX_K}], got {k}")
    c = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    src = df
    if df.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    prepared = src.filter(c.isNotNull()).select(
        *keys, F.col(ts_col), c.alias("__v")
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
    return (
        prepared.groupBy(*keys, F.window(F.col(ts_col), grain).alias("__w"))
        .agg(*aggs)
        .select(
            *keys,
            F.col("__w.start").cast("timestamp").alias("bucket_ts"),
            "n",
            "mn",
            "mx",
            *[f"m{i}" for i in range(1, k + 1)],
            *(
                ["n_pos"] + [f"lm{i}" for i in range(1, k + 1)]
                if log_moments
                else []
            ),
        )
    )
