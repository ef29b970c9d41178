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

from hyper_spark.operators.cms_agg import cms_bucket_col

__all__ = [
    "build_file_index",
    "update_file_index",
    "file_candidates",
    "point_lookup",
    "save_zordered",
    "build_zone_maps",
    "zone_candidates",
    "range_scan",
    "plan_compaction",
    "compact_files",
]


def _km_hash_cols(col: "F.Column") -> tuple["F.Column", "F.Column"]:
    """The two base hashes for Kirsch–Mitzenmacher position expansion:
    pos_i = (h1 + i·h2) mod m. Both build and probe derive positions
    from THESE two Spark expressions, so bucket parity holds by
    construction."""
    s = col.cast("string")
    return F.xxhash64(s), F.xxhash64(F.lit(1), s)


def _km_positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) int64 bit positions from the two base hashes (uint64
    two's-complement reinterpretation + wrapping arithmetic — exact on
    both build and probe sides by construction)."""
    u1 = h1.astype(np.int64).view(np.uint64)[:, None]
    u2 = h2.astype(np.int64).view(np.uint64)[:, None]
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((u1 + i * u2) % np.uint64(m_bits)).astype(np.int64)


_BLOOM_PARTIAL_FIELDS = "__file string, n bigint, bits binary"


def _file_blooms(
    df: DataFrame, col: str, m_bits: int, k: int
) -> DataFrame:
    """One Bloom bitmap per file, the 100-TB shape: each task ORs its
    rows into per-file partial bitmaps locally (vectorized numpy over
    Arrow batches — two int64 hash columns per row cross to Python,
    never k exploded positions), then one tiny shuffle merges
    m_bits/8-byte blobs per file. No row-level shuffle, no distinct.
    Partition-local memory is (files seen by the task) × m_bits/8 —
    file-aligned parquet splits see 1-2 files per task."""
    h1, h2 = _km_hash_cols(F.col(col))
    src = (
        df.filter(F.col(col).isNotNull())
        .select(
            F.input_file_name().alias("__file"),
            h1.alias("__h1"),
            h2.alias("__h2"),
        )
    )
    nbytes = (m_bits + 7) // 8

    def pack(batches):
        bitmaps: dict = {}
        counts: dict = {}
        for pdf in batches:
            for f, grp in pdf.groupby("__file", sort=False):
                pos = _km_positions(
                    grp["__h1"].to_numpy(), grp["__h2"].to_numpy(), k, m_bits
                )
                bm = bitmaps.get(f)
                if bm is None:
                    bm = bitmaps[f] = np.zeros(nbytes, dtype=np.uint8)
                np.bitwise_or.at(
                    bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
                )
                counts[f] = counts.get(f, 0) + len(grp)
        if bitmaps:
            yield pd.DataFrame(
                {
                    "__file": list(bitmaps),
                    "n": [counts[f] for f in bitmaps],
                    "bits": [bitmaps[f].tobytes() for f in bitmaps],
                }
            )

    partials = src.mapInPandas(pack, _BLOOM_PARTIAL_FIELDS)

    def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(nbytes, dtype=np.uint8)
        for blob in pdf["bits"]:
            bm |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame(
            {
                "__file": [pdf["__file"].iloc[0]],
                "n": [int(pdf["n"].sum())],
                "bits": [bm.tobytes()],
            }
        )

    return partials.groupBy("__file").applyInPandas(
        or_merge, _BLOOM_PARTIAL_FIELDS
    )


def build_file_index(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    hash_fn: str = "xxhash64_km",
) -> DataFrame:
    """Build the skipping index for ``col`` over a file-backed
    DataFrame: DataFrame[file, column, n_rows, min_value, max_value,
    m_bits, k, n, bits, hash_fn] — one row per underlying data file.

    ``df`` must come from a file source (``input_file_name()`` is the
    file identity); derived single-table projections/filters are fine,
    joins are not (a joined row has no single source file). NULLs in
    ``col`` are excluded from the Bloom filter and the zone map — a
    point lookup never matches NULL (equality semantics), so files
    holding only NULLs are always skippable.

    ``hash_fn='xxhash64_km'`` (default, and the only build scheme) is
    Kirsch–Mitzenmacher double hashing over two JVM xxhash64 values:
    the build ORs bitmaps task-locally and shuffles only per-file
    blobs (measured 298 s → seconds at 20M rows vs the exploded-
    positions path), at the textbook ε cost of KM vs k independent
    hashes. The recorded hash_fn is validated at probe time.

    Defaults size the filter for ~100k distinct values/file at ~1%
    FPR (m/n ≈ 10, k = 7); at 128-MB files that covers typical key
    densities. The index is ~m_bits/8 bytes per file — 128 KB
    default, ~0.1% of the data it indexes.
    """
    if hash_fn != "xxhash64_km":
        raise ValueError(
            "file indexes build with hash_fn='xxhash64_km' (no parity "
            f"obligation exists for this surface); got {hash_fn!r}"
        )
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
    blooms = _file_blooms(df, col, m_bits, k)
    # metadata literals live OUTSIDE the join so an all-NULL file (no
    # bloom row -> NULL bits) still carries correct build parameters
    return (
        zones.join(blooms, on="__file", how="left")
        .withColumnRenamed("__file", "file")
        .select(
            "file", F.lit(col).alias("column"), "n_rows",
            "min_value", "max_value",
            F.lit(m_bits).alias("m_bits"), F.lit(k).alias("k"),
            "n", "bits", F.lit(hash_fn).alias("hash_fn"),
        )
    )


def update_file_index(
    index_df: DataFrame, df: DataFrame
) -> DataFrame:
    """Incrementally maintain a skipping index against the CURRENT
    file set of ``df`` (the same table the index was built on, after
    appends/compactions/deletes): rows for vanished files are dropped,
    rows for surviving files are kept AS IS (immutable files never
    change content — the parquet contract this index relies on), and
    only genuinely NEW files are scanned and indexed. The incremental
    cost is proportional to the appended data, not the table — the
    property that makes a 100-TB index maintainable per batch.

    Uses ``df.inputFiles()`` (driver-side file listing, no data scan)
    to compute the set difference; build parameters (column, m_bits,
    k, hash_fn) are read from the existing index rows, so the merged
    index stays self-consistent by construction.
    """
    spark = df.sparkSession
    current = set(df.inputFiles())
    meta = (
        index_df.select("column", "m_bits", "k", "hash_fn").distinct().collect()
    )
    if len(meta) != 1:
        raise ValueError(
            "index mixes build parameters "
            f"({[tuple(r) for r in meta]}) — cannot extend it consistently"
        )
    col, m_bits, k, hash_fn = (
        meta[0]["column"], meta[0]["m_bits"], meta[0]["k"], meta[0]["hash_fn"]
    )
    known = {r["file"] for r in index_df.select("file").collect()}
    new_files = sorted(current - known)
    files_df = spark.createDataFrame(
        [(f,) for f in sorted(current)], ["file"]
    )
    kept = index_df.join(files_df, on="file", how="left_semi")
    if not new_files:
        return kept
    fresh = build_file_index(
        spark.read.parquet(*new_files),
        col,
        m_bits=m_bits,
        k=k,
        hash_fn=hash_fn,
    )
    return kept.unionByName(fresh)


def _probe_positions(
    spark: SparkSession, values: Sequence, m_bits: int, k: int, hash_fn: str
) -> np.ndarray:
    """Bit positions for each probe value, computed with the SAME
    Spark expressions used at build time (hash parity by construction).
    Returns an (n_values, k) int64 matrix."""
    vals_df = spark.createDataFrame([(v,) for v in values], ["__v"])
    if hash_fn == "xxhash64_km":
        h1, h2 = _km_hash_cols(F.col("__v"))
        rows = vals_df.select(h1.alias("h1"), h2.alias("h2")).collect()
        return _km_positions(
            np.array([r["h1"] for r in rows], dtype=np.int64),
            np.array([r["h2"] for r in rows], dtype=np.int64),
            k,
            m_bits,
        )
    # legacy scheme: indexes persisted by the pre-KM builder
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


# ---------------------------------------------------------------- z-order


def _zvalue_col(df: DataFrame, cols: Sequence[str], bits: int) -> "F.Column":
    """Morton z-value as a pure-codegen column: each dim is equi-width
    bucketed into 2^bits cells via ``width_bucket`` over its global
    [min, max] (one tiny agg collect), then the cells' bits are
    interleaved with shift/OR expressions — no Python in the row path.
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    n_cells = 1 << bits
    d = len(cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = stats[f"__lo_{j}"], stats[f"__hi_{j}"]
        if lo is None or hi is None or lo == hi:
            continue  # constant/all-NULL dim carries no information
        # width_bucket returns 1..n_cells (n_cells+1 for v == hi); clamp
        # to 0..n_cells-1
        cell = F.least(
            F.lit(n_cells - 1),
            (F.width_bucket(F.col(c).cast("double"), F.lit(float(lo)),
                            F.lit(float(hi)), F.lit(n_cells)) - F.lit(1)),
        ).cast("long")
        for i in range(bits):
            # bit i of this dim lands at position i*d + j of z
            z = z.bitwiseOR(
                F.shiftleft(cell.bitwiseAND(F.lit(1 << i)), i * (d - 1) + j)
            )
    return z


def save_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 64,
    bits: int = 8,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet laid out along a Morton (z-order) curve
    over ``cols`` — the layout that makes MULTI-dimensional zone-map
    pruning effective. A single-column sort prunes range predicates on
    that column only; the z-curve keeps every dimension's values
    locally clustered, so a file's [min, max] box is tight in ALL
    ``cols`` at once and ``range_scan`` touches ~n_files^(1-1/d) files
    for a selective d-dim box instead of all of them.

    ``cols`` must be numeric/timestamp (equi-width cells need an
    order-preserving metric; hashing a string would destroy the
    locality that is the whole point). Rows with NULL in a dim sort
    into the curve's origin cells for that dim — correctness is
    layout-independent, NULLs just cluster less helpfully.

    Scale: bucket boundaries are one tiny agg collect; the z-value is
    whole-stage-codegen bit arithmetic; the write is one range
    repartition on z (the same shuffle any explicit sort-write pays).
    """
    cols = list(cols)
    if not (1 <= len(cols) <= 8):
        raise ValueError("z-order wants 1..8 columns")
    for c in cols:
        t = df.schema[c].dataType.simpleString()
        if not (
            t in ("tinyint", "smallint", "int", "bigint", "float", "double",
                  "date", "timestamp")
            or t.startswith("decimal")
        ):
            raise ValueError(
                f"z-order column {c!r} has non-numeric type {t}; hash "
                "layouts destroy locality — pick numeric/timestamp dims"
            )
    tagged = df.withColumn(
        "__z",
        _zvalue_col(
            df.select(*[F.col(c).cast("double").alias(c) for c in cols]),
            cols,
            bits,
        ),
    )
    (
        tagged.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def build_zone_maps(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Multi-column zone maps: one row per data file with
    ``n_rows`` and typed ``min_<col>``/``max_<col>`` for every
    ``cols`` entry. One distributed pass; persist next to the data and
    rebuild only when files change."""
    cols = list(cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
        .withColumnRenamed("__file", "file")
    )


def zone_candidates(
    zone_df: DataFrame, predicates: dict
) -> DataFrame:
    """Filter zone maps to files whose [min, max] box overlaps EVERY
    ``{col: (lo, hi)}`` range (either bound may be None for
    open-ended). Pure Catalyst, typed in each column's own type; no
    false negatives — interval overlap is exact logic on true
    per-file extrema."""
    out = zone_df
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            out = out.filter(F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            out = out.filter(F.col(f"min_{c}") <= F.lit(hi))
    return out


def range_scan(
    spark: SparkSession,
    path: str,
    zone_df: DataFrame,
    predicates: dict,
) -> DataFrame:
    """Exact multi-dimensional range query over the parquet at
    ``path``, reading only zone-map candidate files. Result-identical
    to the full-scan conjunction of BETWEENs (candidates are a
    superset; the exact filter still runs)."""
    schema = spark.read.parquet(path).schema
    files = [
        r["file"]
        for r in zone_candidates(zone_df, predicates).select("file").collect()
    ]
    if not files:
        return spark.createDataFrame([], schema)
    out = spark.read.parquet(*files)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            out = out.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            out = out.filter(F.col(c) <= F.lit(hi))
    return out


# ------------------------------------------------------------ compaction


def plan_compaction(
    zone_df: DataFrame, target_rows: int, small_frac: float = 0.5
) -> list[list[str]]:
    """Bin-pack SMALL files into rewrite groups: files with fewer than
    ``small_frac * target_rows`` rows are first-fit-decreasing packed
    into groups of ~``target_rows`` total. Returns a list of file
    groups (each ≥ 2 files — rewriting a lone small file buys
    nothing); files at or above the threshold are left alone.

    Input is a zone-map/index DataFrame carrying ``file`` and
    ``n_rows`` (build_zone_maps / build_file_index both qualify).
    Driver-side over one row per file — bounded by file count, the
    same budget every table-format compactor spends.
    """
    if target_rows < 1:
        raise ValueError("target_rows must be >= 1")
    rows = [
        (r["file"], int(r["n_rows"]))
        for r in zone_df.select("file", "n_rows").collect()
    ]
    small = sorted(
        (fn for fn in rows if fn[1] < small_frac * target_rows),
        key=lambda fn: (-fn[1], fn[0]),
    )
    groups: list[tuple[list[str], int]] = []
    for f, n in small:
        placed = False
        for g in groups:
            if g[1] + n <= target_rows:
                g[0].append(f)
                groups[groups.index(g)] = (g[0], g[1] + n)
                placed = True
                break
        if not placed:
            groups.append(([f], n))
    return [g[0] for g in groups if len(g[0]) >= 2]


def compact_files(
    spark: SparkSession, plan: list[list[str]], dest: str
) -> DataFrame:
    """Execute a compaction plan: each group's files are read together
    and rewritten as ONE file under ``dest``. Returns the manifest
    DataFrame[group_id, n_files_in, file_in] describing what was
    rewritten; the caller swaps old files for new ones (this operator
    does NOT delete inputs — parquet directories have no atomic
    manifest, so the swap belongs to the caller's commit protocol,
    exactly like every table format's rewrite action).

    Row preservation is structural: each output file is a plain
    re-write of its inputs' rows (no filter, no projection).
    """
    if not plan:
        raise ValueError("empty compaction plan")
    rows = []
    for gid, group in enumerate(plan):
        (
            spark.read.parquet(*group)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{dest.rstrip('/')}/group={gid}")
        )
        rows.extend((gid, len(group), f) for f in group)
    return spark.createDataFrame(
        rows, "group_id int, n_files_in int, file_in string"
    )
