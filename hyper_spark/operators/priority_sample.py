"""Priority sampling: a mergeable weighted-sample sketch with unbiased
subset-sum estimation (Duffield, Lund, Thorup, JACM 2007).

The sketch: each item with aggregated weight w gets priority q = w/u
for a uniform draw u in (0,1]; the sample is the k highest-priority
items plus the threshold tau = the (k+1)-th priority (0 when the group
has <= k items, in which case the sample is the whole group and every
estimate is exact). Any subset-sum estimate is then

    est(S) = sum over sampled items in S of max(w, tau)

which is UNBIASED for the true sum over S (DLT Theorem 1) with near-
optimal variance among k-sample estimators — one small sample answers
arbitrary post-hoc subset queries ("how many events from users in
cohort X?") without rescanning, the same lambda shape as the other
sketch sinks here.

Determinism doctrine (sampling.py): u is ``uniform_draw_col`` —
md5-derived, a pure function of (item, seed) — so the sampled SET, the
priorities, and every estimate are reproducible row-by-row by the
DuckDB oracle, across re-runs, partitionings, and cluster sizes. No
RNG stream, no partition-order dependence.

Merge contract: samples built with the same seed over DISJOINT item
universes (item-sharded corpora, time shards with shard-unique ids)
merge losslessly: keep the k highest-priority entries of the union,
new tau = max(tau_1, tau_2, (k+1)-th union priority) (DLT section 4).
Overlapping item keys would share u draws across inputs and void the
independence the unbiasedness proof needs — the caller owns that
invariant, as with the other sketch stores.

Plan shape: one shuffle for the per-(group, item) weight aggregate
(already required to define w), then two window passes over the SAME
partitioning (rank + threshold broadcast — no second exchange); the
estimator is a plain filtered aggregate over k rows per group.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyper_spark.operators.sampling import uniform_draw_col

__all__ = ["priority_sample_by", "priority_subset_sum", "priority_merge"]


def priority_sample_by(
    df: DataFrame,
    item: str,
    weight: str | Column | None = None,
    k: int = 64,
    by: Sequence[str] = (),
    seed: str | int = 0,
) -> DataFrame:
    """Build the sketch: DataFrame[*by, item, w, priority, threshold],
    <= k rows per ``by`` group. ``weight`` None counts rows (w = item
    frequency); otherwise w = sum(weight) per item — weights must be
    positive for the DLT guarantee."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bys = list(by)
    it = F.col(item)
    base = df.filter(it.isNotNull())
    if weight is None:
        w_agg = F.count(F.lit(1)).cast("double")
    else:
        wd = (F.col(weight) if isinstance(weight, str) else weight).cast(
            "double"
        )
        # NaN > 0 is TRUE in Spark SQL: one NaN row would otherwise
        # make its whole item's summed weight NaN and poison the
        # priority ordering — exclude invalid masses at the row level
        base = base.filter((wd > 0) & ~F.isnan(wd))
        w_agg = F.sum(wd)
    weighted = base.groupBy(*bys, it.alias(item)).agg(w_agg.alias("w"))
    q = (F.col("w") / uniform_draw_col(item, seed)).alias("priority")
    scored = weighted.select(*bys, item, "w", q)
    if not bys:
        # global top-(k+1) via sort+limit (TakeOrdered: per-partition
        # partial top-k, no full-table single-partition window)
        scored = scored.orderBy(F.desc("priority"), F.col(item)).limit(k + 1)
    else:
        # grouped TakeOrdered equivalent: a globally top-(k+1) row of a
        # group is top-(k+1) of that group within ANY partition it sits
        # in, so a partition-local rank prune keeps a superset of the
        # answer while bounding the final per-group sort at
        # n_partitions*(k+1) rows — without it, a group's every
        # distinct item funnels through ONE window task (millions of
        # rows per sort at transcript scale)
        local = Window.partitionBy(F.spark_partition_id(), *bys).orderBy(
            F.desc("priority"), F.col(item)
        )
        scored = (
            scored.withColumn("__lrn", F.row_number().over(local))
            .filter(F.col("__lrn") <= k + 1)
            .drop("__lrn")
        )
    part = Window.partitionBy(*bys) if bys else Window.partitionBy()
    rank_w = part.orderBy(F.desc("priority"), F.col(item))
    return (
        scored
        .withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") <= k + 1)
        # tau = the (k+1)-th priority, visible to every surviving row
        # via a second window over the SAME partitioning (no exchange)
        .withColumn(
            "threshold",
            F.coalesce(
                F.max(
                    F.when(F.col("__rn") == k + 1, F.col("priority"))
                ).over(part),
                F.lit(0.0),
            ),
        )
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def priority_subset_sum(
    sample: DataFrame,
    cond: Column,
    by: Sequence[str] = (),
) -> DataFrame:
    """Unbiased subset-sum estimate from the sketch:
    DataFrame[*by, est_sum, n_sample_hits]. ``cond`` is any predicate
    over the sample's columns (typically the item); est_sum =
    sum(max(w, threshold)) over matching sampled items — exact when the
    group had <= k items (threshold 0)."""
    bys = list(by)
    hit = F.when(cond, F.greatest(F.col("w"), F.col("threshold")))
    agg = sample.groupBy(*bys) if bys else sample.groupBy()
    return agg.agg(
        F.coalesce(F.sum(hit), F.lit(0.0)).alias("est_sum"),
        F.count(hit).alias("n_sample_hits"),
    )


def priority_merge(
    samples: Sequence[DataFrame],
    k: int,
    by: Sequence[str] = (),
) -> DataFrame:
    """Merge same-seed sketches over disjoint item universes (see
    module doc): top-k of the union by priority, threshold =
    max(input thresholds, (k+1)-th union priority). Same schema out,
    so merges tree up across shards/checkpoints like the other
    sketches."""
    if not samples:
        raise ValueError("no samples to merge")
    bys = list(by)
    u = samples[0]
    for s in samples[1:]:
        u = u.unionByName(s)
    part = Window.partitionBy(*bys) if bys else Window.partitionBy()
    rank_w = part.orderBy(F.desc("priority"), *[F.col(c) for c in _item_cols(u, bys)])
    return (
        u.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") <= k + 1)
        .withColumn(
            "threshold",
            F.greatest(
                F.max("threshold").over(part),
                F.coalesce(
                    F.max(
                        F.when(F.col("__rn") == k + 1, F.col("priority"))
                    ).over(part),
                    F.lit(0.0),
                ),
            ),
        )
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _item_cols(sample: DataFrame, bys: Sequence[str]) -> list[str]:
    fixed = set(bys) | {"w", "priority", "threshold"}
    return [c for c in sample.columns if c not in fixed]
