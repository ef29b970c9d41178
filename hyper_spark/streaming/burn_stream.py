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

_UTC_ALIASES = {
    "UTC", "Etc/UTC", "GMT", "Etc/GMT", "GMT0", "Greenwich",
    "Universal", "Zulu", "Z", "+00:00",
}


def _check_alignment(df: DataFrame, bucket: str) -> None:
    """`F.window` tumbles aligned to the UTC epoch; the batch
    bucketizer (`burn_rate_alerts`) truncates with `date_trunc` in the
    SESSION timezone. The exact-parity contract therefore requires the
    two conventions to coincide: day buckets only align in a UTC
    session, and hour buckets misalign in fractional-offset zones
    (+05:30 and friends). Raise rather than let merged counter stores
    silently mix two bucket conventions."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz in _UTC_ALIASES:
        return
    if bucket == "day":
        raise ValueError(
            f"streaming day buckets align to the UTC epoch but the "
            f"session timezone is {tz!r}, so they cannot match the "
            "batch date_trunc convention — set the session timezone "
            "to UTC, or build hour buckets and roll up at read time"
        )
    # hour buckets coincide with date_trunc in any WHOLE-hour-offset
    # zone; reject provable fractional offsets, accept the rest
    offsets = []
    try:
        from datetime import datetime
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
        for probe in (datetime(2024, 1, 1), datetime(2024, 7, 1)):
            offsets.append(int(probe.replace(tzinfo=z).utcoffset().total_seconds()))
    except Exception:
        import re

        m = re.fullmatch(r"[+-](\d{2}):(\d{2})", tz)
        if m:
            offsets.append(int(m.group(1)) * 3600 + int(m.group(2)) * 60)
    if bucket == "hour" and any(o % 3600 for o in offsets):
        raise ValueError(
            f"session timezone {tz!r} has a fractional-hour UTC "
            "offset: streaming hour buckets (UTC-epoch aligned) "
            "cannot match the batch date_trunc convention — set the "
            "session timezone to UTC"
        )


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
    _check_alignment(df, bucket)
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
