"""Temporal operators Spark lacks as built-ins, expressed as compositions
of native window functions (never Python, never a custom shuffle):

sessionize
    gap-based session assignment: a new session starts when the gap to
    the previous event of the same key exceeds ``gap``. One window
    lineage (lag -> flag -> running sum) — a single shuffle keyed by the
    partition key, all whole-stage-codegen.

asof_join
    for every left row, the most recent right row at-or-before its
    timestamp (per key) — the classic point-in-time/backward as-of join
    (DuckDB/Pandas/kdb semantics). Implemented as union + window
    last_value carry-forward: one shuffle of (left ∪ right) keyed by the
    join key, no range-explode, no per-row Python; skew on the key is
    the same skew any windowed plan has and salts the same way.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize", "asof_join", "range_join"]


def sessionize(
    df: DataFrame,
    key: str | Sequence[str],
    ts_col: str,
    gap: float,
    session_col: str = "session_idx",
) -> DataFrame:
    """Adds ``session_col``: 0-based session index per key, new session
    when ts - previous ts > ``gap`` seconds (first event = session 0)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    ts = F.col(ts_col)
    # TIMESTAMP_NTZ cannot cast to double directly; route through
    # TIMESTAMP (no-op for tz-aware columns, session-tz for NTZ)
    if df.schema[ts_col].dataType.simpleString().startswith("timestamp"):
        ts = ts.cast("timestamp")
    ts = ts.cast("double")
    new_sess = (
        F.when(F.lag(ts).over(w).isNull(), F.lit(0))
        .when(ts - F.lag(ts).over(w) > gap, F.lit(1))
        .otherwise(F.lit(0))
    )
    return df.withColumn(
        session_col, F.sum(new_sess).over(w).cast("long")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: each left row gains the latest right values
    whose ``on`` (orderable, e.g. timestamp) is <= the left row's, within
    the same ``by`` key(s). Left rows with no prior right row keep NULLs.

    Plan: tag both sides, unionByName, carry the right side's values
    forward with ``last(..., ignorenulls=True)`` over (by, on, tag) —
    right rows sort before left rows at equal ``on`` so equal timestamps
    match (at-or-before semantics) — then keep the left rows."""
    bys = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(bys) | {on}]
    carried = [f"{c}{suffix}" for c in right_cols]

    l_tagged = left.withColumn("__side", F.lit(1))
    for c, cc in zip(right_cols, carried):
        l_tagged = l_tagged.withColumn(cc, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *bys,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(cc) for c, cc in zip(right_cols, carried)],
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    w = (
        Window.partitionBy(*bys)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for cc in carried:
        unioned = unioned.withColumn(cc, F.last(cc, ignorenulls=True).over(w))
    return unioned.filter(F.col("__side") == 1).drop("__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: str | Sequence[str] = (),
    bin_width: float = 3600.0,
) -> DataFrame:
    """Interval containment join: left rows matched to every right
    interval with start <= ts <= end (optionally per ``by`` key).

    Spark's native plan for an inequality join is broadcast-nested-loop
    (quadratic). This is the standard bin-bucketing rewrite: left rows
    key on floor(ts / bin_width); right intervals explode into every bin
    they overlap (sequence()), the join is an EQUI-join on (by, bin),
    and an exact BETWEEN filter removes bin-edge false candidates. Cost:
    |right| x avg_interval_bins explode + a hash join — pick bin_width
    near the typical interval length so the fan-out stays O(1) per
    interval. Timestamps may be TIMESTAMP, TIMESTAMP_NTZ, or numeric."""
    bys = [by] if isinstance(by, str) else list(by)

    def as_double(df, c):
        col = F.col(c)
        if df.schema[c].dataType.simpleString().startswith("timestamp"):
            col = col.cast("timestamp")
        return col.cast("double")

    l = left.withColumn("__ts", as_double(left, left_ts)).withColumn(
        "__bin", F.floor(F.col("__ts") / bin_width)
    )
    r = (
        right.withColumn("__s", as_double(right, right_start))
        .withColumn("__e", as_double(right, right_end))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s") / bin_width),
                    F.floor(F.col("__e") / bin_width),
                )
            ),
        )
    )
    joined = l.join(r, on=bys + ["__bin"]).filter(
        (F.col("__ts") >= F.col("__s")) & (F.col("__ts") <= F.col("__e"))
    )
    return joined.drop("__bin", "__ts", "__s", "__e")
