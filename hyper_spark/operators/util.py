"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


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
