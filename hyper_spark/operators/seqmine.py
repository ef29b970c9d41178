"""Frequent sequential-pattern mining over transcript tool trajectories.

Mines every GAPPED subsequence pattern (PrefixSpan semantics — Pei et
al., ICDE 2001: items in order, arbitrary gaps allowed) whose support
(number of distinct sequences containing it) clears ``min_support``,
up to ``max_len`` items. Over agent transcripts this answers "which
tool-call playbooks recur across conversations?" — n-gram/transition
analytics (temporal.py::state_ngrams) only see CONTIGUOUS runs and
miss a `search → … → edit → … → commit` workflow with chatter between
the steps; this operator finds it.

Algorithm: level-wise prefix projection, DataFrame-native. The
projection table holds one row per (sequence, frequent pattern) with
the pattern's GREEDY earliest completion position — the classical
subsequence fact that "seq contains p + x iff seq contains p and x
occurs after p's earliest completion" makes that single position a
lossless projection summary (no per-sequence suffix copies, unlike
literal PrefixSpan). Each level is then:

    extend:  proj ⋈ turns on sequence id, position > end_pos,
             item restricted to the broadcast level-1 frequent set
    project: min(position) per (sequence, pattern + item)
    count:   rows per pattern (the projection is one row per
             supporting sequence, so count(*) IS the support)
    prune:   support >= min_support (Apriori: a frequent pattern's
             prefix is frequent, so per-level pruning is lossless)

Scale: turns are hash-partitioned by sequence id once and persisted;
every level's extend join co-locates on that key. Per-level shuffle is
bounded by the projection fan-out Σ_seq |patterns in seq| ·
|turns after end| — the irreducible PrefixSpan working set, controlled
by min_support (raises the pruning floor) and ``max_gap`` (bounds the
lookahead window per extension, the SPAM-style gap constraint).
Patterns never carry text bodies, only the item strings. Zero Python
in the plan: joins, windows, and aggregates only.

Determinism: exact counting over exact matching — no draws anywhere;
results are a pure function of the input, reproducible row-by-row by
a DuckDB self-join oracle at any partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

__all__ = ["frequent_sequences"]


def frequent_sequences(
    df: DataFrame,
    order_col: str,
    item_col: str,
    seq_by: Sequence[str],
    min_support: int = 2,
    max_len: int = 3,
    max_gap: int | None = None,
    sep: str = "→",
) -> DataFrame:
    """Mine frequent gapped subsequences: DataFrame[pattern, length,
    support], one row per frequent pattern of 1..max_len items.

    ``seq_by`` identifies a sequence (e.g. ``["conv_id"]``); order
    within a sequence is ``order_col`` (must be unique per sequence —
    turn_idx). ``max_gap`` bounds the allowed gap in ORDER UNITS
    between consecutive matched items (None = unbounded, PrefixSpan
    default; 1 = contiguous n-grams). ``pattern`` is the items joined
    by ``sep``; support counts distinct sequences."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    sby = list(seq_by)
    if not sby:
        raise ValueError("seq_by must name at least one column")

    from hyper_spark.operators.graph import _checkpoint

    turns = (
        df.filter(F.col(item_col).isNotNull())
        .select(
            *sby,
            F.col(order_col).cast("long").alias("__pos"),
            F.col(item_col).cast("string").alias("__it"),
        )
        .repartition(*sby)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # level 1: frequent items, then their earliest position per sequence
    # — the seed projection. Every level's projection is checkpointed
    # (graph.py loop hygiene: lineage truncation + materialization), so
    # the per-level support outputs below re-read stable state.
    freq1 = (
        turns.groupBy("__it")
        .agg(F.count_distinct(*[F.col(c) for c in sby]).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    alphabet = F.broadcast(freq1.select(F.col("__it").alias("__ext")))
    proj = _checkpoint(
        turns.join(F.broadcast(freq1.select("__it")), on="__it")
        .groupBy(*sby, F.col("__it").alias("__pat"))
        .agg(F.min("__pos").alias("__end"))
    )

    def _support(p: DataFrame, level: int) -> DataFrame:
        # a projection holds one row per supporting sequence, so plain
        # count(*) per pattern IS the support
        return p.groupBy("__pat").agg(
            F.count(F.lit(1)).alias("support")
        ).select(
            F.col("__pat").alias("pattern"),
            F.lit(level).alias("length"),
            "support",
        )

    levels = [_support(proj, 1)]
    for level in range(2, max_len + 1):
        gap_ok = (
            F.col("__pos") <= F.col("__end") + max_gap
            if max_gap is not None
            else F.lit(True)
        )
        # support prune via ONE window pass over the extension table
        # (r6): the projection holds one row per supporting sequence,
        # so count(*) over (partition by __pat) IS the support — the
        # old persist + broadcast-frequency build + semi-join cost an
        # extra job and a cache round trip per level for the same
        # pruned projection.
        from pyspark.sql.window import Window

        sup_w = Window.partitionBy("__pat")
        ext = (
            proj.join(turns, on=sby)
            .filter((F.col("__pos") > F.col("__end")) & gap_ok)
            .join(alphabet, on=F.col("__it") == F.col("__ext"))
            .groupBy(
                *sby,
                F.concat_ws(sep, "__pat", "__it").alias("__pat"),
            )
            .agg(F.min("__pos").alias("__end"))
        )
        proj = _checkpoint(
            ext.withColumn("__sup", F.count(F.lit(1)).over(sup_w))
            .filter(F.col("__sup") >= min_support)
            .drop("__sup")
        )
        levels.append(_support(proj, level))
        if proj.limit(1).count() == 0:
            break

    turns.unpersist()
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
