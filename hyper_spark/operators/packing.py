"""Sequence packing for LLM pretraining: concat-then-chunk offsets.

Standard pretraining packing concatenates all documents in a fixed order
and slices the token stream into fixed-size context windows. The
per-document facts a pipeline needs are each doc's *global token offset*
and which chunks it spans — i.e. an exclusive running sum of token counts
in corpus order.

A naive Spark expression of that is ``sum(tokens) OVER (ORDER BY id)`` —
a single-partition window that serializes the whole corpus through one
task and is exactly the plan that dies at 100 TB. This module computes
the identical result with a two-level prefix sum:

1. collect order-key boundary quantiles once (approxQuantile over the
   pruned order column) and assign each row an order-monotonic bucket
   from that broadcast literal — deterministic across every plan branch
   (the TeraSort partitioning shape);
2. *intra-bucket* running sums via a window partitioned by bucket — all
   buckets in parallel;
3. per-bucket totals (plain partial-aggregated sums, one tiny row per
   bucket) get their own running sum on the driver-side-small table,
   broadcast-joined back as each bucket's base offset.

Only the per-bucket totals (n_buckets rows) ever pass through a
single-partition window; the corpus itself sees one quantile pass and
one hash shuffle by bucket with embarrassingly parallel windows. The
result is bucketing-invariant, so a plain global-window SQL oracle
verifies it row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["pack_offsets", "chunk_stats"]

_BUCKET = "__pack_bucket"


def pack_offsets(
    df: DataFrame,
    order_col: str,
    size_col: str | Column,
    chunk_size: int,
    n_buckets: int | None = None,
    offset_col: str = "offset",
) -> DataFrame:
    """Add global packing columns to ``df``:

    - ``offset``      exclusive running sum of ``size_col`` in
                      ``order_col`` order (the doc's start position in
                      the concatenated token stream);
    - ``first_chunk`` / ``last_chunk``  chunk ids the doc touches
                      (``floor(offset/chunk_size)`` ..
                      ``floor((offset+size-1)/chunk_size)``);
    - ``n_chunks``    how many chunk boundaries the doc spans (1 = fits
                      inside a single context window's slice).

    ``order_col`` must be unique *after casting to double* (doc ids) —
    bucket boundaries and the running-sum order both use the numeric
    value, so tied casts have no deterministic order. Zero-size docs get ``last_chunk = first_chunk``
    (they occupy no tokens but anchor at their offset).

    Scale: one column-pruned quantile pass + one hash shuffle by bucket
    with parallel per-bucket windows + a broadcast of ``n_buckets``
    prefix rows (see module docstring). ``n_buckets`` defaults to the
    session shuffle partition count; raise it on a real cluster — it
    caps the window parallelism.
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    sized = df.withColumn("__sz", size.cast("long")).withColumn(
        "__o", F.col(order_col).cast("double")
    )

    # Deterministic order-monotonic bucketing (TeraSort shape): boundary
    # quantiles are collected ONCE and broadcast as a literal, so every
    # plan branch sees identical buckets. (repartitionByRange +
    # spark_partition_id is NOT safe here — its boundary sampling can
    # differ between the branches that recompute the frame.)
    if n_buckets > 1:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = sized.stat.approxQuantile(
            "__o", probs, 1.0 / (4 * n_buckets)
        )
        bounds = sorted(set(bounds))
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("__o") > b, 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    bucketed = sized.withColumn(_BUCKET, bucket)

    # order by the SAME double cast the buckets were computed from — a
    # string-typed numeric order column would otherwise sort
    # lexicographically inside buckets while the boundaries split
    # numerically, making results depend on n_buckets
    intra_w = (
        Window.partitionBy(_BUCKET)
        .orderBy("__o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__cum", F.sum("__sz").over(intra_w))

    # bucket base offsets: plain partial-aggregated sums (no window over
    # the corpus), prefix-summed over the tiny n_buckets-row table
    totals = bucketed.groupBy(_BUCKET).agg(F.sum("__sz").alias("__total"))
    prefix_w = (
        Window.orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = totals.withColumn(
        "__base", F.sum("__total").over(prefix_w) - F.col("__total")
    ).select(_BUCKET, "__base")

    out = (
        local.join(F.broadcast(bases), on=_BUCKET)
        .withColumn(offset_col, F.col("__base") + F.col("__cum") - F.col("__sz"))
        .withColumn(
            "first_chunk", F.floor(F.col(offset_col) / F.lit(chunk_size))
        )
        .withColumn(
            "last_chunk",
            F.greatest(
                F.floor(
                    (F.col(offset_col) + F.col("__sz") - 1) / F.lit(chunk_size)
                ),
                F.col("first_chunk"),
            ),
        )
        .withColumn(
            "n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1)
        )
        .drop(_BUCKET, "__sz", "__o", "__cum", "__base")
    )
    return out


def chunk_stats(packed: DataFrame) -> DataFrame:
    """Corpus-level packing summary from a ``pack_offsets`` result:
    doc count, chunk count, and the count/fraction of docs split across
    a chunk boundary (the packing-loss signal tuners watch). Derived
    entirely from the packed columns — one aggregate, no extra scan."""
    split = F.sum(F.when(F.col("n_chunks") > 1, 1).otherwise(0))
    return packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.max("last_chunk") + 1).alias("n_chunks_total"),
        split.alias("n_split_docs"),
        (split / F.count(F.lit(1))).alias("split_frac"),
    )
