"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread", "widen_for_explosion"]


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the source scan
    yields fewer partitions (a small-file table can arrive as ONE
    partition, serializing every map-side Python stage onto one core —
    measured 5.7s -> 0.65s on the sf0.1 minhash signature stage). No-op
    when the input is already wide, so at 100 TB nothing extra shuffles."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def widen_for_explosion(df: DataFrame, *cols: str, factor: int = 1) -> DataFrame:
    """Repartition by ``cols`` with an EXPLICIT partition count so AQE
    cannot coalesce the downstream stage.

    AQE sizes post-shuffle stages from their shuffle INPUT bytes, which
    is exactly wrong for candidate-generating equi-joins whose output
    explodes quadratically in per-key group size: a few MB of slim
    prefix entries coalesce to a handful of tasks that then each emit
    hundreds of MB of join output (measured on the sf0.1 ssjoin: 12 MB
    of prefix entries -> 11 tasks x ~25 s with 750 MB of partial-agg
    spill; at 32 explicit partitions the same stage spreads across the
    full cluster). An explicit count (`REPARTITION_BY_NUM`) is exempt
    from AQE coalescing, and joining two sides repartitioned to the
    same count on the join key adds NO extra exchange — it replaces the
    `ENSURE_REQUIREMENTS` shuffle the join would have inserted anyway.

    ``factor`` multiplies ``defaultParallelism`` so per-task explosion
    variance load-balances across waves; scale-adaptive by
    construction (no constant tuned to local mode)."""
    want = df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(want, *cols)
