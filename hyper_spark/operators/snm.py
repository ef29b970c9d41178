"""Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95) —
candidate pairs within a sliding window over a global sort order.

The third blocking family next to LSH (probabilistic, similarity-
keyed) and prefix filtering (exact, similarity-keyed): SNM blocks on
an ARBITRARY domain key (name+zip, normalized title, url prefix...)
and guarantees every pair within ``window`` positions of the global
(key, id) order is emitted exactly once — the classic record-linkage
move when the matching predicate is fuzzy or learned and no
similarity-join bound applies. Candidates feed a downstream verifier
(edit_distance_join's banded levenshtein, a learned classifier,
connected_components for closure) — this operator is the blocker, not
the matcher. The multi-pass variant of the paper is composition:
union the pair sets of several calls with different keys.

100-TB shape: the global rank is NOT a single-partition window — it is
the TeraSort shape (the pack_offsets lesson, operators/packing.py):
range-partition the slim (id, key) projection, row_number WITHIN each
partition in parallel, then add broadcast per-partition base offsets
(a prefix sum over #partitions rows). The ranked table is persisted —
ranks must come from ONE materialization (range boundaries are
sampled, so recomputing branches could disagree) — and the pair join
touches only (id, rank): keys never ride the join. Pairing is an
equi-join on rank blocks of width ``window``: ranks r < s within
window-1 of each other satisfy floor(s/w) in {floor(r/w),
floor(r/w)+1}, so the probe side emits two block keys and each
qualifying pair matches exactly once — no dedup pass needed. All
stages are JVM codegen.

Reference scope note: the reference engine (GameAnalytics/hyper) has
no record-linkage surface; this operator is part of the engine's
training-data-pipeline extension (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sorted_neighborhood_pairs"]


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    key: str | Column = "text",
    window: int = 5,
) -> DataFrame:
    """Every unordered pair of rows whose positions in the global
    (key, id) sort order differ by LESS than ``window``, exactly once:
    DataFrame[id_a, id_b, rank_a, rank_b] with rank_a < rank_b (ranks
    are the 0-based global sort positions — the audit trail for "why
    is this a candidate").

    Rows with a NULL key are EXCLUDED (engines disagree on NULL sort
    placement, and a null domain key carries no blocking information —
    coalesce upstream to opt them in). Ties in ``key`` order
    deterministically by ``id_col``.

    CALLER CONTRACT: the result is eagerly materialized and persisted
    (the ranked table feeds both join sides); ``.unpersist()`` when
    done."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    w = int(window)
    k = F.col(key) if isinstance(key, str) else key
    spark = df.sparkSession
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    slim = (
        df.select(F.col(id_col).alias("id"), k.alias("__k"))
        .filter(F.col("__k").isNotNull())
        .repartitionByRange(n_buckets, F.col("__k"), F.col("id"))
        .withColumn("__pid", F.spark_partition_id())
    )
    # local index within each range partition (parallel windows), then
    # broadcast prefix bases over the tiny per-partition count table
    local = slim.withColumn(
        "__i",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy("__k", "id")
        ),
    )
    counts = local.groupBy("__pid").agg(F.max("__i").alias("__cnt"))
    prefix_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bases = counts.withColumn(
        "__base", F.sum("__cnt").over(prefix_w) - F.col("__cnt")
    ).select("__pid", "__base")
    # persisted: ranks must come from one materialization (range
    # boundaries are sampled) and both join sides read them
    ranked = (
        local.join(F.broadcast(bases), "__pid")
        .select("id", (F.col("__base") + F.col("__i") - 1).alias("rank"))
        .persist()
    )
    ranked.count()

    a = ranked.select(
        F.col("id").alias("id_a"),
        F.col("rank").alias("rank_a"),
        F.explode(
            F.array(
                F.floor(F.col("rank") / w),
                F.floor(F.col("rank") / w) + 1,
            )
        ).alias("__blk"),
    )
    b = ranked.select(
        F.col("id").alias("id_b"),
        F.col("rank").alias("rank_b"),
        F.floor(F.col("rank") / w).alias("__blk"),
    )
    pairs = (
        a.join(b, "__blk")
        .filter(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") <= F.lit(w - 1))
        )
        .select("id_a", "id_b", "rank_a", "rank_b")
        .persist()
    )
    pairs.count()
    ranked.unpersist()
    return pairs
