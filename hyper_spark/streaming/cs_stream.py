"""Streaming build for time-bucketed count-sketch cell states.

Same move as sliding_cms_stream.py, with the count sketch's signed
updates: a grain-bucket's cell counter is a plain windowed SUM of
sign * weight — Structured Streaming's native aggregate, JVM state
store end to end, watermark expiry free, no custom state operator, no
Python. Signed sums are order-insensitive, so closed buckets equal the
batch bucketization of the same rows EXACTLY (the parity pytest is
bit-exact).

The sink rows are `operators/countsketch.py::cs_by`'s internal cell
relation plus bucket_ts. Downstream is all batch algebra: filter the
wanted time range, ``cs_from_cells`` densifies to count-sketch states
(summing a cell across buckets IS the linear merge of the per-bucket
states), and ``cs_diff`` / ``heavy_changers`` / ``cs_f2`` read change
from the stored sink without ever touching raw rows again — live
windowed change detection (deltoids over a stream) from one native
windowed aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.operators.cms_agg import cms_bucket_col
from hyper_spark.operators.countsketch import cs_sign_col

__all__ = ["streaming_cs_cells"]


def streaming_cs_cells(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str | Column,
    grain: str = "1 day",
    depth: int = 5,
    width: int = 1024,
    watermark: str = "1 hour",
    hash_fn: str = "xxhash64",
    weight: str | Column | None = None,
) -> DataFrame:
    """Streaming cell rows per (keys, grain window): DataFrame[*keys,
    bucket_ts, row, bucket, csum, wsum] — exactly cs_by's cell relation
    per time bucket, ready for ``cs_from_cells`` after a range filter.
    NULL values are skipped (cs_by's contract); ``weight`` scales
    updates (negative deletes — the turnstile contract survives the
    stream because SUM is the state). Works identically on a bounded
    batch frame, which the parity test exploits."""
    c = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    wcol = (
        F.lit(1).cast("long")
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight).cast(
            "long"
        )
    )
    src = df
    if df.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    entries = F.posexplode(
        F.array(
            *[
                F.struct(
                    cms_bucket_col(c, i, width, hash_fn).alias("bucket"),
                    (cs_sign_col(c, i, hash_fn) * wcol).alias("delta"),
                )
                for i in range(depth)
            ]
        )
    )
    prepared = (
        src.filter(c.isNotNull())
        .select(*keys, F.col(ts_col), wcol.alias("__w"), entries.alias("row", "e"))
        .select(
            *keys,
            F.col(ts_col),
            "__w",
            F.col("row"),
            F.col("e.bucket").alias("bucket"),
            F.col("e.delta").alias("delta"),
        )
    )
    return (
        prepared.groupBy(
            *keys,
            F.window(F.col(ts_col), grain).alias("__wnd"),
            F.col("row"),
            F.col("bucket"),
        )
        .agg(
            F.sum("delta").alias("csum"),
            F.sum("__w").alias("wsum"),
        )
        .select(
            *keys,
            F.col("__wnd.start").cast("timestamp").alias("bucket_ts"),
            "row",
            "bucket",
            "csum",
            "wsum",
        )
    )
