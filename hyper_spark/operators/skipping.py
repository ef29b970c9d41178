"""File-skipping index: per-FILE Bloom filters + min/max zone maps for
needle-in-a-haystack point lookups over a parquet footprint, without a
full scan.

The lakehouse data-skipping pattern (Delta/Iceberg bloom indexes, ORC
bloom streams): one index row per data file holding (row count,
min/max of the indexed column, an m-bit Bloom filter of its values).
A point lookup then touches only the files whose zone map covers the
probe value AND whose Bloom filter claims it — on a 100-TB table of
~800k files, a unique-key probe reads one file instead of all of them.

Reference parity note: the reference (src/hyper.erl) is a sketch
library with no storage layer; this operator is engine surface
(SURVEY.md §2.4), reusing the repo's Bloom machinery
(operators/bloom_agg.py) with semantics from the standard Bloom-filter
literature. No false negatives (a Bloom miss proves absence, and the
zone-map check is exact interval logic), so ``point_lookup`` is
EXACTLY the full-scan filter — false positives only cost extra file
reads, and the final exact filter removes them from results.

Scale design:
- the index is a DataFrame (one row per file, ~m_bits/8 bytes each) —
  build is one distributed pass, the index persists to parquet, and
  pruning FILTERS the index distributed-side; only matching file
  NAMES are collected (bounded by probe selectivity, the whole point);
- probe values are a bounded point-lookup set (hundreds/thousands,
  not a table) — for table-vs-table membership use ``bloom_prune``;
- the Bloom bit test runs as an Arrow-batched pandas UDF with the
  probe-position matrix (|values| × k ints) closure-captured; the
  zone-map test is pure Catalyst, typed in the column's own type.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce
from operator import or_

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType

from hyper_spark.operators.bloom_agg import bloom_by
from hyper_spark.operators.cms_agg import cms_bucket_col

__all__ = ["build_file_index", "file_candidates", "point_lookup"]


def build_file_index(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the skipping index for ``col`` over a file-backed
    DataFrame: DataFrame[file, n_rows, min_value, max_value, m_bits,
    k, n, bits, hash_fn] — one row per underlying data file.

    ``df`` must come from a file source (``input_file_name()`` is the
    file identity); derived single-table projections/filters are fine,
    joins are not (a joined row has no single source file). NULLs in
    ``col`` are excluded from the Bloom filter and the zone map — a
    point lookup never matches NULL (equality semantics), so files
    holding only NULLs are always skippable.

    Defaults size the filter for ~100k distinct values/file at ~1%
    FPR (m/n ≈ 10, k = 7); at 128-MB files that covers typical key
    densities. The index is ~m_bits/8 bytes per file — 128 KB
    default, ~0.1% of the data it indexes.
    """
    tagged = df.withColumn("__file", F.input_file_name())
    c = F.col(col)
    zones = (
        tagged.groupBy("__file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(c).alias("min_value"),
            F.max(c).alias("max_value"),
        )
    )
    blooms = bloom_by(
        tagged, ["__file"], col, m_bits=m_bits, k=k, hash_fn=hash_fn
    )
    return (
        zones.join(blooms, on="__file", how="left")
        .withColumnRenamed("__file", "file")
        .select(
            "file", "n_rows", "min_value", "max_value",
            "m_bits", "k", "n", "bits", "hash_fn",
        )
    )


def _probe_positions(
    spark: SparkSession, values: Sequence, m_bits: int, k: int, hash_fn: str
) -> np.ndarray:
    """Bit positions for each probe value, computed with the SAME
    Spark expression used at build time (hash parity by construction).
    Returns an (n_values, k) int64 matrix."""
    vals_df = spark.createDataFrame([(v,) for v in values], ["__v"])
    pos = vals_df.select(
        F.array(
            *[cms_bucket_col(F.col("__v"), i, m_bits, hash_fn) for i in range(k)]
        ).alias("__pos")
    ).collect()
    return np.array([r["__pos"] for r in pos], dtype=np.int64)


def file_candidates(
    index_df: DataFrame, values: Sequence
) -> DataFrame:
    """Filter the index to files that MIGHT contain any of ``values``:
    per (file, value), the value must sit inside the file's
    [min_value, max_value] zone AND hit all k Bloom positions. No
    false negatives; candidates are a superset of the true file set.

    Runs as a distributed filter over the index — nothing is collected
    here, so it composes with a persisted index of any size.
    """
    # NULL never equals anything — drop it from the probe set
    values = [v for v in values if v is not None]
    if not values:
        return index_df.limit(0)
    meta = (
        index_df.filter(F.col("bits").isNotNull())
        .select("m_bits", "k", "hash_fn")
        .distinct()
        .collect()
    )
    if not meta:
        return index_df.limit(0)
    if len(meta) != 1:
        raise ValueError(
            "index mixes bloom parameters/hash_fns "
            f"({[tuple(r) for r in meta]}) — rebuild with one build_file_index call"
        )
    m_bits, k, hash_fn = meta[0]["m_bits"], meta[0]["k"], meta[0]["hash_fn"]
    pos = _probe_positions(index_df.sparkSession, values, m_bits, k, hash_fn)

    @F.pandas_udf(ArrayType(BooleanType()))
    def bloom_hits(bits: pd.Series) -> pd.Series:
        out = []
        for blob in bits:
            if blob is None:  # all-NULL file: no filter, nothing to match
                out.append([False] * len(pos))
                continue
            arr = np.frombuffer(blob, dtype=np.uint8)
            hit = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            out.append(hit.all(axis=1).tolist())  # (n_values,)
        return pd.Series(out)

    with_hits = index_df.withColumn("__hits", bloom_hits(F.col("bits")))
    per_value = [
        (F.lit(v) >= F.col("min_value"))
        & (F.lit(v) <= F.col("max_value"))
        & F.element_at(F.col("__hits"), i + 1)
        for i, v in enumerate(values)
    ]
    return with_hits.filter(reduce(or_, per_value)).drop("__hits")


def point_lookup(
    spark: SparkSession,
    path: str,
    index_df: DataFrame,
    col: str,
    values: Sequence,
) -> DataFrame:
    """Exact ``col IN (values)`` over the parquet at ``path``, reading
    ONLY the candidate files from the skipping index. Result-identical
    to ``spark.read.parquet(path).filter(col.isin(values))`` — the
    Bloom/zone screen has no false negatives and the exact filter
    still runs over whatever is read.
    """
    values = list(values)
    schema = spark.read.parquet(path).schema
    if not values:
        return spark.createDataFrame([], schema)
    files = [
        r["file"] for r in file_candidates(index_df, values).select("file").collect()
    ]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files).filter(F.col(col).isin(values))
