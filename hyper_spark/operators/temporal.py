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


def _orderable_double(df: DataFrame, c: str) -> Column:
    col = F.col(c)
    if df.schema[c].dataType.simpleString().startswith("timestamp"):
        col = col.cast("timestamp")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: each left row gains the values of ONE matched right row
    within the same ``by`` key(s) — the latest right row with ``on`` <=
    the left's (``backward``, the point-in-time default), the earliest
    with ``on`` >= (``forward``), or whichever of those two is closer
    (``nearest``, ties broken backward like pandas merge_asof). Left rows
    with no matching right row keep NULLs. ``tolerance`` (same units as
    ``on``; seconds for timestamps) drops matches with |left.on −
    right.on| > tolerance, mirroring pandas/DuckDB semantics.

    Plan: tag both sides, unionByName, carry ONE non-null struct of the
    matched right row (its ``on`` + all carried values) across a window
    keyed by ``by`` — a struct, not per-column carries, so a genuinely
    NULL right value is preserved as the matched row's NULL and multiple
    carried columns always come from the SAME right row (ADVICE r02
    medium). One shuffle of (left ∪ right) keyed by the join key, no
    range-explode, no per-row Python; skew on the key is the same skew
    any windowed plan has and salts the same way."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" or tolerance is not None:
        # these options do arithmetic on `on`: a string column would cast
        # to NULL and silently null every match, a date would fail at
        # analysis — reject clearly instead
        on_type = left.schema[on].dataType.simpleString()
        numericish = on_type.startswith("timestamp") or on_type in (
            "int", "bigint", "smallint", "tinyint", "float", "double",
        ) or on_type.startswith("decimal")
        if not numericish:
            raise ValueError(
                f"direction='nearest' / tolerance need a timestamp or "
                f"numeric `on` column, got {on_type}"
            )
    bys = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(bys) | {on}]
    right_cols = list(right_cols)
    carried = [f"{c}{suffix}" for c in right_cols]

    # the matched-row payload: right's orderable `on` (as double, for
    # tolerance/nearest arithmetic — only cast when those modes need it:
    # an ANSI cast of a non-numeric `on` would throw at runtime even for
    # plain backward joins that never read it) + every carried value
    needs_on_math = direction == "nearest" or tolerance is not None
    r_on = (
        _orderable_double(right, on)
        if needs_on_math
        else F.lit(None).cast("double")
    )
    r_struct = F.struct(
        r_on.alias("__r_on"),
        *[F.col(c).alias(cc) for c, cc in zip(right_cols, carried)],
    )
    r_tagged = right.select(
        *bys,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        r_struct.alias("__match"),
    )
    struct_type = r_tagged.schema["__match"].dataType
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__match", F.lit(None).cast(struct_type)
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    need_back = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")
    if need_back:
        # right rows (side 0) sort before left at equal `on`: at-or-before
        w_back = (
            Window.partitionBy(*bys)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        unioned = unioned.withColumn(
            "__m_back", F.last("__match", ignorenulls=True).over(w_back)
        )
    if need_fwd:
        # left rows sort before right at equal `on`, window looks forward:
        # at-or-after
        w_fwd = (
            Window.partitionBy(*bys)
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        unioned = unioned.withColumn(
            "__m_fwd", F.first("__match", ignorenulls=True).over(w_fwd)
        )

    out = unioned.filter(F.col("__side") == 1)
    l_on = _orderable_double(out, on) if needs_on_math else F.lit(None).cast("double")
    if direction == "backward":
        match = F.col("__m_back")
    elif direction == "forward":
        match = F.col("__m_fwd")
    else:  # nearest: smaller |Δon| wins, ties -> backward
        d_back = l_on - F.col("__m_back.__r_on")
        d_fwd = F.col("__m_fwd.__r_on") - l_on
        match = (
            F.when(F.col("__m_back").isNull(), F.col("__m_fwd"))
            .when(F.col("__m_fwd").isNull(), F.col("__m_back"))
            .when(d_fwd < d_back, F.col("__m_fwd"))
            .otherwise(F.col("__m_back"))
        )
    if tolerance is not None:
        match = F.when(
            F.abs(l_on - match["__r_on"]) <= F.lit(float(tolerance)), match
        )
    out = out.withColumn("__m", match)
    for cc in carried:
        out = out.withColumn(cc, F.col("__m")[cc])
    return out.drop("__side", "__match", "__m", "__m_back", "__m_fwd")


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
