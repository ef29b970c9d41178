"""Interval analytics: merged spans, coverage, peak concurrency.

The gaps-and-islands family generalized beyond gap sessionization
(temporal.py::sessionize works on POINT events; these operators work
on INTERVALS — rows that already carry a start and an end, e.g. tool
invocations with latency, agent task leases, GPU reservations):

* ``merge_intervals``  — coalesce overlapping/near-touching intervals
  into maximal spans per key (the classic sweep: sort by start, a new
  span opens where start exceeds the running max end by more than
  ``tolerance``);
* ``interval_coverage`` — per-key covered duration / span count /
  largest span, i.e. "how much wall-clock was this conversation
  actually doing tool work";
* ``max_concurrency``  — per-key peak number of simultaneously open
  intervals and the earliest instant it is reached, via the +1/-1
  event sweep. Half-open ``[start, end)`` semantics: an interval
  ending at t does NOT overlap one starting at t.

Scale shape: each operator is ONE hash partition by key + ONE
within-key sort (window), then bounded aggregates — the irreducible
cost of any order-dependent sweep. Keys are independent, so the skew
story is the per-key row count (a conversation's tool calls), which
is bounded in practice; no cross-key shuffle, no Python anywhere in
the plan. All three are expressible with the same window functions in
ANSI SQL, so the DuckDB oracle replays the exact algorithm.

Invalid rows (NULL start/end, end < start) are dropped up front —
documented contract, mirrored by the oracle's WHERE clause.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_intervals", "interval_coverage", "max_concurrency"]


def _prep(
    df: DataFrame, by: Sequence[str], start: str, end: str
) -> tuple[DataFrame, list]:
    keys = list(by)
    if not keys:
        raise ValueError("by must name at least one key column")
    def _dbl(c: str):
        col = F.col(c)
        # TIMESTAMP_NTZ cannot cast to double directly; route through
        # TIMESTAMP (no-op for tz-aware, session-tz for NTZ) — the
        # repo-wide idiom (temporal.py::_orderable_double)
        if df.schema[c].dataType.simpleString().startswith("timestamp"):
            col = col.cast("timestamp")
        return col.cast("double")

    base = df.filter(
        F.col(start).isNotNull()
        & F.col(end).isNotNull()
        & (F.col(end) >= F.col(start))
    ).select(*keys, _dbl(start).alias("__s"), _dbl(end).alias("__e"))
    return base, keys


def merge_intervals(
    df: DataFrame,
    by: Sequence[str],
    start: str,
    end: str,
    tolerance: float = 0.0,
) -> DataFrame:
    """DataFrame[*by, span_start, span_end, n_intervals]: maximal
    merged spans per key. Two intervals belong to the same span when
    the later one starts within ``tolerance`` of the running max end
    (0.0 = merge only true overlap/touch). Timestamps are compared as
    epoch seconds (double)."""
    if tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    base, keys = _prep(df, by, start, end)
    w = Window.partitionBy(*keys).orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "__new",
        F.when(
            prev_max_end.isNull()
            | (F.col("__s") > prev_max_end + F.lit(float(tolerance))),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "__isl",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy(*keys, "__isl")
        .agg(
            F.min("__s").alias("span_start"),
            F.max("__e").alias("span_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__isl")
    )


def interval_coverage(
    df: DataFrame,
    by: Sequence[str],
    start: str,
    end: str,
    tolerance: float = 0.0,
) -> DataFrame:
    """DataFrame[*by, covered, n_spans, n_intervals, longest_span]:
    per-key total covered duration (overlap counted once), from the
    merged spans."""
    spans = merge_intervals(df, by, start, end, tolerance=tolerance)
    return spans.groupBy(*list(by)).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("covered"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("n_intervals").alias("n_intervals"),
        F.max(F.col("span_end") - F.col("span_start")).alias("longest_span"),
    )


def max_concurrency(
    df: DataFrame,
    by: Sequence[str],
    start: str,
    end: str,
) -> DataFrame:
    """DataFrame[*by, peak, peak_at]: per-key maximum number of
    simultaneously open intervals under half-open [start, end)
    semantics, and the earliest event time at which the peak holds.
    Zero-length intervals (start == end) are empty sets under [s, e):
    the -1-before-+1 tie order closes them before they open, so they
    overlap nothing; a key holding only zero-length intervals reports
    peak 0."""
    base, keys = _prep(df, by, start, end)
    events = base.select(
        *keys, F.col("__s").alias("__t"), F.lit(1).alias("__d")
    ).unionByName(
        base.select(*keys, F.col("__e").alias("__t"), F.lit(-1).alias("__d"))
    )
    # -1 sorts before +1 at equal __t: half-open semantics
    w = Window.partitionBy(*keys).orderBy("__t", "__d")
    running = events.withColumn(
        "__open",
        F.sum("__d").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # peak via a second window over the SAME partitioning — no extra
    # shuffle, no per-key side table to join back at scale
    peaked = running.withColumn(
        "__peak", F.max("__open").over(Window.partitionBy(*keys))
    )
    return (
        peaked.filter(F.col("__open") == F.col("__peak"))
        .groupBy(*keys)
        .agg(
            F.max("__peak").alias("peak"),
            F.min("__t").alias("peak_at"),
        )
    )
