"""Robust numeric normalization: per-group winsorization and
median/IQR scaling — the outlier-taming prep a feature pipeline runs
before statistics that assume bounded moments (a handful of 10⁶-second
"latencies" from stuck clients otherwise dominate every mean, z-score,
and gradient).

Two bound sources, one clip/scale shape:

- ``mode='exact'``: per-group bounds from Spark's exact ``percentile``
  aggregate (one sort-based aggregate per group — fine while each
  group's values fit a partition's sort budget, and what the SQL
  oracle replays via ``quantile_cont``, same linear-interpolation
  definition).
- ``mode='sketch'``: bounds read from the mergeable DDSketch state
  (``operators/ddsketch.py``) — relative-error-bounded quantiles with
  a one-scan, map-side-combined build; the 100-TB path, exchanged
  rows bounded by |groups × buckets| instead of a per-group sort.

Either way the bounds table is tiny (one row per group) and BROADCASTS
back onto the raw rows; the clip itself is pure codegen
(`greatest(least(x, hi), lo)`), so the second pass is map-only.

Reference parity note: the reference (src/hyper.erl) has no
normalization surface; this is engine surface (SURVEY.md §2.4
training-data family), composing the quantile sketches the reference
family provides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["group_bounds", "winsorize_by", "robust_scale_by"]


def group_bounds(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    probs: Sequence[float] = (0.01, 0.99),
    mode: str = "exact",
    alpha: float = 0.005,
) -> DataFrame:
    """Per-group quantile bounds: DataFrame[*by, q_0, q_1, ...] — one
    column per requested probability, named ``q_<i>``. ``exact`` uses
    the sort-based ``percentile`` aggregate; ``sketch`` reads the same
    probabilities off a DDSketch build (each bound within ``alpha``
    relative error, guaranteed)."""
    probs = list(probs)
    if not probs or not all(0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0, 1], got {probs}")
    by = list(by)
    if mode == "exact":
        aggs = [
            F.expr(f"percentile(`{col}`, {p!r})").alias(f"q_{i}")
            for i, p in enumerate(probs)
        ]
        return df.filter(F.col(col).isNotNull()).groupBy(*by).agg(*aggs)
    if mode != "sketch":
        raise ValueError(f"mode must be 'exact' or 'sketch', got {mode!r}")
    from hyper_spark.operators.ddsketch import dd_quantiles_by

    q = dd_quantiles_by(df, by, col, probs, alpha=alpha)
    # dd_quantiles_by returns one row per (group, q); pivot to columns
    pivoted = (
        q.withColumn(
            "__qi",
            F.concat(
                F.lit("q_"),
                F.array_position(
                    F.array(*[F.lit(float(p)) for p in probs]),
                    F.col("q"),
                ).cast("int")
                - 1,
            ),
        )
        .groupBy(*by)
        .pivot("__qi", [f"q_{i}" for i in range(len(probs))])
        .agg(F.first("est"))
    )
    return pivoted


def winsorize_by(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    lower: float = 0.01,
    upper: float = 0.99,
    mode: str = "exact",
    alpha: float = 0.005,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``col`` to its per-group [lower, upper] quantiles. Returns
    the input rows plus ``lo``, ``hi``, and the clipped value in
    ``out_col`` (default ``{col}_w``). ALL input rows survive: the
    bounds join is LEFT (a NULL group key, or a group whose values are
    entirely NULL, has no bounds row — those rows carry NULL lo/hi and
    their value passes through unclipped), and a NULL value stays NULL
    (Spark's least/greatest SKIP nulls, so the clip must be gated on
    the value's presence or a NULL input would come back as ``hi``).
    The bounds table broadcasts; the clip is map-only codegen."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}/{upper}")
    by = list(by)
    out_col = out_col or f"{col}_w"
    bounds = group_bounds(df, col, by, (lower, upper), mode, alpha).select(
        *by, F.col("q_0").alias("lo"), F.col("q_1").alias("hi")
    )
    joined = (
        df.join(F.broadcast(bounds), on=by, how="left") if by
        else df.crossJoin(F.broadcast(bounds))
    )
    return joined.withColumn(
        out_col,
        F.when(
            F.col(col).isNotNull(),
            F.greatest(F.least(F.col(col), F.col("hi")), F.col("lo")),
        ),
    )


def robust_scale_by(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    mode: str = "exact",
    alpha: float = 0.005,
    out_col: str | None = None,
) -> DataFrame:
    """Median/IQR standardization per group: (x − median) / (q75 −
    q25) — the outlier-immune z-score (a classical z-score's mean and
    std are themselves dragged by the tail it is supposed to flag).
    Returns input rows plus ``median``, ``iqr``, and the scaled value
    in ``out_col`` (default ``{col}_rs``; NULL when IQR is 0 — a
    constant group has no scale). Same broadcast-bounds + map-only
    shape and row-preservation contract as ``winsorize_by``: the
    bounds join is LEFT, so NULL-keyed rows and all-NULL groups
    survive with NULL median/iqr (and a NULL scale)."""
    by = list(by)
    out_col = out_col or f"{col}_rs"
    bounds = group_bounds(
        df, col, by, (0.25, 0.5, 0.75), mode, alpha
    ).select(
        *by,
        F.col("q_1").alias("median"),
        (F.col("q_2") - F.col("q_0")).alias("iqr"),
    )
    joined = (
        df.join(F.broadcast(bounds), on=by, how="left") if by
        else df.crossJoin(F.broadcast(bounds))
    )
    return joined.withColumn(
        out_col,
        F.when(
            F.col("iqr") > 0,
            (F.col(col) - F.col("median")) / F.col("iqr"),
        ),
    )
