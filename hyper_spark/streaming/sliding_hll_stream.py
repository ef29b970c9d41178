"""Streaming build for the sliding-window HLL state.

Same move as dd_stream.py: because the sliding-HLL state is relational
(operators/sliding_hll.py — rows (*keys, idx, bucket_ts, rho)), the
streaming build is Structured Streaming's NATIVE windowed max
aggregate: state per live (keys, window, idx) is one small int, JVM
state store end to end, watermark expiry for free, no custom state
operator and no Python.

Append rows are each grain-bucket's FINAL (idx, max rho) — integers,
order-insensitive, so they equal the batch bucketization of the same
rows EXACTLY. The sink is directly queryable by
``sliding_estimates`` (the Pareto front is only a compaction, never a
correctness requirement); run ``sliding_merge([sink_df], keys)``
periodically to compact history to the front — fronts merge
losslessly, so compaction can run incrementally at any cadence, the
checkpoint/rollup shape used across the library.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.functions.hashing import hll_prepare

__all__ = ["streaming_sliding_register_by"]


def streaming_sliding_register_by(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str | Column,
    p: int = 14,
    grain: str = "1 hour",
    watermark: str = "1 hour",
    hash_fn: str = "sha1",
) -> DataFrame:
    """Streaming bucketized register rows per (keys, grain window):
    DataFrame[*keys, idx, bucket_ts, rho]. Late rows inside the
    watermark fold in exactly (max is order-insensitive); works
    identically on a bounded batch frame, which the parity test
    exploits."""
    c = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    idx, rho = hll_prepare(c, p, hash_fn)
    src = df
    if df.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    prepared = src.filter(c.isNotNull()).select(
        *keys,
        F.col(ts_col),
        idx.alias("idx"),
        rho.alias("rho"),
    )
    return (
        prepared.groupBy(
            *keys,
            F.window(F.col(ts_col), grain).alias("__w"),
            F.col("idx"),
        )
        .agg(F.max("rho").alias("rho"))
        .select(
            *keys,
            "idx",
            F.col("__w.start").cast("timestamp").alias("bucket_ts"),
            "rho",
        )
    )
