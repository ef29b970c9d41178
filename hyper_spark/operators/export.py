"""Deterministic sharded export — the training-data sink.

The reference (GameAnalytics/hyper) is a sketch library with no
export surface; this belongs to the training-data-pipeline tier
(SURVEY §2.4/§6). A trainer consuming a 100-TB corpus wants the
classic contract: N shards of roughly equal size, globally shuffled
(so every shard is an unbiased corpus sample), byte-reproducible
across re-runs (so a resumed or re-tried export job regenerates the
SAME shards), with a manifest to check against.

Determinism comes from the same md5 draw the sampling/split operators
use (``sampling.split_hash_col``): every row's shard and its position
inside the shard are pure functions of (id, seed) — independent of
input partitioning, task scheduling, and cluster size, and exactly
reproducible in the DuckDB oracle.

- shard(id)   = int(md5(id ':' seed)[:8 hex]) mod n_shards —
  multinomial-balanced (shard sizes concentrate within
  O(sqrt(rows / n_shards)) of the mean; exact balancing would need a
  global sort + row_number, a scale anti-pattern the docstring of
  ``export_shards`` explains).
- order inside a shard = ascending (order_key, id) — a deterministic
  global shuffle of the corpus, so sequential readers see an i.i.d.
  document stream.

Scale shape: one hash-repartition by shard (each shard lives in
exactly ONE task — a key is never split), sortWithinPartitions for
the in-shard order (per-task sort, no global sort barrier), then a
``partitionBy('shard')`` parquet write = exactly one file per shard.
The manifest is computed by reading the written shards back (proof of
write, not intent) and is a |n_shards|-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hyper_spark.operators.sampling import split_hash_col

__all__ = ["shard_assignment", "export_shards", "shard_manifest"]


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    id_col: str | Column = "doc_id",
    seed: str | int = 0,
) -> DataFrame:
    """Adds ``shard`` (bigint in [0, n_shards)) and ``order_key`` (the
    8-hex md5 draw; ascending = deterministic global shuffle order).
    Rows with a NULL id get NULL draws and are dropped — the same NULL
    contract as the sampling/split family."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.col(id_col) if isinstance(id_col, str) else id_col
    h = split_hash_col(key, seed)
    out = df.withColumn("order_key", h).filter(F.col("order_key").isNotNull())
    return out.withColumn(
        "shard",
        (F.conv(F.col("order_key"), 16, 10).cast("long") % n_shards).cast(
            "bigint"
        ),
    )


def _present_shards(spark: SparkSession, path: str) -> list[int]:
    """Shard indices already committed under ``path`` (directory
    listing through Hadoop FS — works on any supported filesystem)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("shard="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str | int = 0,
    columns: list[str] | None = None,
    resume: bool = False,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` parquet shards under
    ``path/shard=K/`` — one file per shard, rows in deterministic
    shuffled order — and return the read-back manifest
    (DataFrame[shard, n_rows, n_files, min_key, max_key]).

    ``columns`` restricts the exported payload (id and ``order_key``
    are always kept; ``order_key`` lets any consumer re-verify the
    order without recomputing md5).

    ``resume=True`` is the checkpoint-restart contract: shard
    directories already present under ``path`` are trusted and
    skipped; only the missing shards are computed and appended.
    Because assignment and in-shard order are pure functions of
    (id, seed), a resumed run writes byte-for-byte the shards the
    interrupted run would have — so a killed export costs only the
    un-committed shards. (A shard directory torn mid-write should be
    deleted before resuming; task-commit makes this the rare crash
    window, and the manifest's n_files/n_rows flags it.)

    Why mod-hash shards and not exactly-equal shards: exact equality
    needs a global row_number, i.e. a total sort of the corpus through
    one ordering — the repartition+sortWithinPartitions here keeps
    every stage per-task. At 100 TB / 10k shards the multinomial
    imbalance is ~0.1%, noise next to parquet block rounding.
    """
    spark = df.sparkSession
    assigned = shard_assignment(df, n_shards, id_col, seed)
    mode = "error"
    if resume:
        present = set(_present_shards(spark, path))
        if present:
            missing = [s for s in range(n_shards) if s not in present]
            if not missing:
                return shard_manifest(spark, path)
            # partition pruning on the missing set keeps the scan +
            # shuffle bounded by the un-exported remainder
            assigned = assigned.filter(F.col("shard").isin(missing))
            mode = "append"
    payload = (
        [id_col, "order_key"]
        + [c for c in (columns or df.columns) if c not in (id_col, "order_key")]
    )
    out = (
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "order_key", id_col)
        .select(*payload, "shard")
    )
    out.write.partitionBy("shard").mode(mode).parquet(path)
    return shard_manifest(spark, path)


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Manifest of an exported shard directory, from the written files
    themselves: per shard, row count, file count (1 by construction),
    and the order-key range. |n_shards| rows."""
    written = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    return (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("__file").cast("bigint").alias("n_files"),
            F.min("order_key").alias("min_key"),
            F.max("order_key").alias("max_key"),
        )
        .orderBy("shard")
    )
