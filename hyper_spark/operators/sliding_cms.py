"""Sliding-window count-min + heavy hitters: frequency/top-k over ANY
trailing window from one bucketed state.

The CMS companion to operators/sliding_hll.py (the north star's
"heavy-hitter tool counts" question, windowed after the fact): counter
cells merge by SUM, so a state of per-grain-bucket cells answers every
trailing window by summing the in-window buckets — one build, every
window. The candidate problem (a CMS can estimate but not enumerate)
is solved per bucket: `local_topk_candidates`'s Misra-Gries clause
guarantees each bucket emits every item with in-bucket share >= 1/k,
and an item with SHARE >= 1/k over a grain-aligned window must have
share >= 1/k in at least one of its buckets (averaging) — so every
window heavy hitter is in the union of the window's candidate sets.

State (both relational, parquet-persistable, partition-prunable on
bucket_ts):

* cells:      (*keys, bucket_ts, row, bucket, cnt) + (depth, width,
              hash_fn) lineage columns — at most depth x width cells
              per (group, bucket) no matter how many raw rows;
* candidates: (*keys, bucket_ts, <col>) — at most
              n_partitions x (k*fanout + k) per (group, bucket).

Query = one conditional-sum pass over cells (ALL windows at once, the
sliding_estimates shape) + candidate probe join + per-(group, window)
top-k rank. Pure JVM end to end; raw rows are touched only at build.

Estimates carry the standard CMS one-sided guarantee per window:
true <= est <= true + (e/width) * N_window with prob >= 1 - e^-depth
(kernel/cms.py:9-10). Exactness note: when width >= the number of
distinct in-window items there are still collisions across GRAIN
BUCKETS only if items collide in a row — same cell algebra as a
single CMS of the window's rows, so bounds are those of a plain CMS
built on exactly the window (parity pytest-asserted).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyper_spark.operators.cms_agg import cms_bucket_col, local_topk_candidates
from hyper_spark.operators.sliding_hll import (
    _epoch_seconds,
    _interval_seconds,
    sliding_expire,
)

__all__ = [
    "sliding_cms_table",
    "sliding_cms_merge",
    "sliding_cms_expire",
    "sliding_cms_coarsen",
    "sliding_cms_topk",
]


def sliding_cms_table(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    col: str | Column,
    grain: str = "1 day",
    depth: int = 5,
    width: int = 2048,
    k: int = 16,
    fanout: int = 4,
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """Build the sliding state -> (cells, candidates); see module doc.
    ``k`` bounds the per-bucket candidate guarantee (share >= 1/k);
    query with any k' <= k."""
    c = F.col(col) if isinstance(col, str) else col
    name = col if isinstance(col, str) else df.select(col).columns[0]
    keys = list(keys)
    t = F.col(ts_col).cast("timestamp")
    bucket_ts = F.window(F.col(ts_col), grain).start.cast("timestamp")
    base = df.filter(c.isNotNull() & t.isNotNull()).select(
        *keys, bucket_ts.alias("bucket_ts"), c.alias(name)
    )
    rows = F.posexplode(
        F.array(
            *[
                cms_bucket_col(F.col(name), i, width, hash_fn)
                for i in range(depth)
            ]
        )
    )
    cells = (
        base.select(*keys, "bucket_ts", rows.alias("row", "bucket"))
        .groupBy(*keys, "bucket_ts", "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "*",
            F.lit(depth).alias("depth"),
            F.lit(width).alias("width"),
            F.lit(hash_fn).alias("hash_fn"),
        )
    )
    cands = local_topk_candidates(
        base, name, k, fanout=fanout, by=["bucket_ts", *keys]
    ).select(*keys, "bucket_ts", name)
    return cells, cands


def sliding_cms_merge(
    cell_states: Sequence[DataFrame],
    cand_states: Sequence[DataFrame],
    keys: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """Merge same-(grain, depth, width, hash_fn) shard/checkpoint/
    incremental states: counter cells SUM, candidate sets UNION —
    both lossless, so the merge equals the direct build of the
    combined input (pytest-asserted)."""
    if not cell_states or not cand_states:
        raise ValueError("no states to merge")
    keys = list(keys)
    cells = cell_states[0]
    for s in cell_states[1:]:
        cells = cells.unionByName(s)
    lineage = ["depth", "width", "hash_fn"]
    merged_cells = cells.groupBy(
        *keys, "bucket_ts", "row", "bucket", *lineage
    ).agg(F.sum("cnt").alias("cnt")).select(
        *keys, "bucket_ts", "row", "bucket", "cnt", *lineage
    )
    cands = cand_states[0]
    for s in cand_states[1:]:
        cands = cands.unionByName(s)
    return merged_cells, cands.distinct()


def sliding_cms_expire(
    cells: DataFrame, cands: DataFrame, older_than_ts: str
) -> tuple[DataFrame, DataFrame]:
    """Drop buckets strictly older than the cutoff from both tables —
    plain range predicates, partition-prunable on a bucket_ts-
    partitioned store (same contract as sliding_hll.sliding_expire)."""
    return (
        sliding_expire(cells, older_than_ts),
        sliding_expire(cands, older_than_ts),
    )


def sliding_cms_coarsen(
    cells: DataFrame,
    cands: DataFrame,
    keys: Sequence[str],
    older_than_ts: str,
    grain: str,
) -> tuple[DataFrame, DataFrame]:
    """Tiered retention: re-bucket history strictly OLDER than the
    cutoff to a coarser grain (counter cells SUM into the coarse
    bucket — exactly the window-sum the query performs, so coarse-
    aligned windows return identical results from fewer rows);
    candidate sets re-bucket by distinct union. The candidate
    1/k-share guarantee weakens to the COARSE bucket for archived
    history (an item needs share >= 1/k in some coarse bucket) — the
    usual tiered-rollup trade. Cutoff must sit on a coarse boundary
    (see sliding_hll.sliding_coarsen)."""
    keys = list(keys)
    cut = F.lit(older_than_ts).cast("timestamp")
    b = F.col("bucket_ts").cast("timestamp")
    lineage = ["depth", "width", "hash_fn"]
    coarse_b = (
        F.window(F.col("bucket_ts"), grain).start.cast("timestamp")
    )
    old_cells = (
        cells.filter(b < cut)
        .select(
            *keys, coarse_b.alias("bucket_ts"), "row", "bucket", "cnt",
            *lineage,
        )
        .groupBy(*keys, "bucket_ts", "row", "bucket", *lineage)
        .agg(F.sum("cnt").alias("cnt"))
        .select(*keys, "bucket_ts", "row", "bucket", "cnt", *lineage)
    )
    item = [c for c in cands.columns if c not in (*keys, "bucket_ts")]
    old_cands = (
        cands.filter(b < cut)
        .select(*keys, coarse_b.alias("bucket_ts"), *item)
        .distinct()
    )
    return (
        cells.filter(b >= cut).unionByName(old_cells),
        cands.filter(b >= cut).unionByName(old_cands),
    )


def sliding_cms_topk(
    cells: DataFrame,
    cands: DataFrame,
    keys: Sequence[str],
    col: str,
    t_ref: str,
    windows: Mapping[str, str],
    k: int,
    params: tuple[int, int, str] | None = None,
) -> DataFrame:
    """Top-k items per (group, trailing window) queried at ``t_ref``:
    DataFrame[*keys, window, <col>, estimate]. ``windows`` maps
    label -> interval ('7 days'). Grain-aligned windows carry the full
    CMS guarantee + candidate completeness (module doc); unaligned
    ones include the partially-covered oldest bucket in full.

    One conditional-sum pass over cells covers every window; the
    candidate probe re-derives the depth bucket expressions from the
    state's recorded (depth, width, hash_fn) lineage, so mixing states
    built with different parameters fails loudly. Reading the lineage
    is one driver action on ``cells`` — cheap on a persisted state
    table (the operational shape), but it recomputes an unpersisted
    build plan once; when composing build+query in one plan either
    persist the state or pass ``params=(depth, width, hash_fn)`` to
    skip the introspection."""
    keys = list(keys)
    labels = list(windows)
    spark = cells.sparkSession
    ref_s = _epoch_seconds(spark, t_ref)
    cutoffs = {
        lab: ref_s - _interval_seconds(spark, windows[lab]) for lab in labels
    }
    if params is not None:
        depth, width, hash_fn = params
    else:
        metas = cells.select("depth", "width", "hash_fn").distinct().take(2)
        if not metas:
            raise ValueError("empty cell state")
        if len(metas) > 1:
            raise ValueError(
                "mixed (depth, width, hash_fn) cell states cannot be "
                "queried together"
            )
        meta = metas[0]
        depth, width, hash_fn = meta["depth"], meta["width"], meta["hash_fn"]

    b = F.col("bucket_ts").cast("timestamp").cast("double")
    summed = cells.groupBy(*keys, "row", "bucket").agg(
        *[
            F.sum(
                F.when(b >= F.lit(cutoffs[lab]), F.col("cnt")).otherwise(0)
            ).alias(f"__c_{i}")
            for i, lab in enumerate(labels)
        ]
    )
    probe = (
        cands.groupBy(*keys, col)
        .agg(F.max(b).alias("__newest"))
        .select(
            *keys,
            col,
            "__newest",
            F.posexplode(
                F.array(
                    *[
                        cms_bucket_col(F.col(col), i, width, hash_fn)
                        for i in range(depth)
                    ]
                )
            ).alias("row", "bucket"),
        )
    )
    per_item = (
        probe.join(summed, on=[*keys, "row", "bucket"], how="left")
        .groupBy(*keys, col)
        .agg(
            F.max("__newest").alias("__newest"),
            *[
                F.min(F.coalesce(F.col(f"__c_{i}"), F.lit(0))).alias(
                    f"__e_{i}"
                )
                for i in range(len(labels))
            ],
        )
    )
    stacked = per_item.select(
        *keys,
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lab).alias("window"),
                        F.col(f"__e_{i}").alias("estimate"),
                        (F.col("__newest") >= F.lit(cutoffs[lab])).alias(
                            "__in"
                        ),
                    )
                    for i, lab in enumerate(labels)
                ]
            )
        ).alias("__s"),
    ).select(
        *keys,
        F.col("__s.window").alias("window"),
        col,
        F.col("__s.estimate").alias("estimate"),
        F.col("__s.__in").alias("__in"),
    ).filter(F.col("__in") & (F.col("estimate") > 0))
    w = Window.partitionBy(*keys, "window").orderBy(
        F.desc("estimate"), F.col(col)
    )
    return (
        stacked.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(*keys, "window", col, "estimate")
    )
