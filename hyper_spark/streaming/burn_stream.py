"""Streaming build for the SLO burn-rate bucket counters.

Same move as sliding_hll_stream.py: because the burn-rate state is
relational (operators/anomaly.py::burn_rate_read — rows (*by, bucket,
n_total, n_bad)), the streaming build is Structured Streaming's NATIVE
windowed count/sum aggregate: state per live (group, window) is two
longs, JVM state store end to end, watermark expiry for free, no
custom state operator and no Python.

Append rows are each closed bucket's FINAL counters — plain sums,
order-insensitive, so they equal the batch bucketization of the same
rows EXACTLY (the parity gate's contract). The sink is directly
queryable by ``burn_rate_read`` for the dual-window alert table; rows
from successive runs over disjoint data merge by summing counters per
(group, bucket) before the read.

Reference parity note: the reference (src/hyper.erl) has no streaming
or monitoring surface; this is engine surface (SURVEY.md §2.4), the
streaming sibling of the batch ``burn_rate_alerts``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_bucket_counts"]

_GRAIN = {"minute": "1 minute", "hour": "1 hour", "day": "1 day"}


def streaming_bucket_counts(
    df: DataFrame,
    bad,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    bucket: str = "hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-(group, bucket) SLO counters: DataFrame[*by,
    bucket, n_total, n_bad]. ``bad`` is a boolean Column (or SQL
    string) marking an SLO-violating event, as in
    ``burn_rate_alerts``. Late rows inside the watermark fold in
    exactly (sums are order-insensitive); works identically on a
    bounded batch frame, which the parity test exploits."""
    if bucket not in _GRAIN:
        raise ValueError(f"bucket must be one of {sorted(_GRAIN)}")
    if isinstance(bad, str):
        bad = F.expr(bad)
    by = list(by)
    src = df
    if df.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.filter(F.col(ts_col).isNotNull())
        .groupBy(*by, F.window(F.col(ts_col), _GRAIN[bucket]).alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(bad.cast("long")).alias("n_bad"),
        )
        .select(
            *by,
            F.col("__w.start").cast("timestamp").alias("bucket"),
            "n_total",
            "n_bad",
        )
    )
