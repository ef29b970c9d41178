"""Streaming build for the sliding-window CMS cell state.

Same move as sliding_hll_stream.py: the sliding-CMS state is
relational (operators/sliding_cms.py — rows (*keys, bucket_ts, row,
bucket, cnt)), and a grain-bucket's cell count is a plain windowed
COUNT — Structured Streaming's native aggregate, JVM state store end
to end, watermark expiry free, no custom state operator, no Python.
Counts are order-insensitive, so closed buckets equal the batch
bucketization of the same rows EXACTLY (the parity pytest).

Candidates (the enumeration side) stream separately: per-bucket
space-saving top-k (streaming/topk_stream.py::streaming_windowed_topk)
with capacity c emits every item with in-bucket share >= 1/c — the
same Misra-Gries guarantee operators/sliding_cms.py derives from
local_topk_candidates, so a capacity >= the query k preserves the
window-completeness argument. ``sliding_cms_topk`` queries the two
sinks directly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.operators.cms_agg import cms_bucket_col

__all__ = ["streaming_sliding_cms_cells"]


def streaming_sliding_cms_cells(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str | Column,
    grain: str = "1 day",
    depth: int = 5,
    width: int = 2048,
    watermark: str = "1 hour",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming cell rows per (keys, grain window): DataFrame[*keys,
    bucket_ts, row, bucket, cnt, depth, width, hash_fn] — the exact
    schema sliding_cms_topk consumes. Late rows inside the watermark
    fold in exactly (count is order-insensitive); works identically on
    a bounded batch frame, which the parity test exploits."""
    c = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    src = df
    if df.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    rows = F.posexplode(
        F.array(
            *[cms_bucket_col(c, i, width, hash_fn) for i in range(depth)]
        )
    )
    prepared = src.filter(c.isNotNull()).select(
        *keys, F.col(ts_col), rows.alias("row", "bucket")
    )
    return (
        prepared.groupBy(
            *keys,
            F.window(F.col(ts_col), grain).alias("__w"),
            F.col("row"),
            F.col("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *keys,
            F.col("__w.start").cast("timestamp").alias("bucket_ts"),
            "row",
            "bucket",
            "cnt",
            F.lit(depth).alias("depth"),
            F.lit(width).alias("width"),
            F.lit(hash_fn).alias("hash_fn"),
        )
    )
