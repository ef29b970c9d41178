"""Distributed HLL sketch aggregation.

The insight this whole module leans on: the reference's union is exactly
element-wise max over register arrays, so a sketch is a perfect mergeable
partial-aggregate state for Spark's partial/final aggregation model — the
reference README itself sketches the map/reduce deployment
(``/root/reference/README.md:10-15``).

Two physical strategies, both ending in identical sketch bytes:

``explode`` (default for grouped sketches)
    rows → JVM-native (idx, rho) columns → ``groupBy(keys, idx).max(rho)``
    (Catalyst inserts the map-side partial aggregate; shuffle volume is
    bounded by Σ_g min(n_g, 2^p) small int rows, and the 2^p idx values
    act as a built-in salt that spreads any hot group key over the whole
    cluster) → one ``applyInPandas`` densify per group.

``partial`` (default for global / few-group sketches)
    rows → JVM-native (idx, rho) → ``mapInPandas`` builds *per-partition*
    dense partial sketches (map-side combine; nothing raw is shuffled)
    → ``groupBy(keys)`` merge of 2^p-byte blobs with
    ``np.maximum.reduce``. This is the treeAggregate shape: shuffle
    carries only num_partitions × num_groups blobs.

At 100 TB: ``explode`` keeps the shuffle proportional to distinct
(group, idx) pairs — at most 2^p rows per group no matter how many input
rows — and ``partial`` keeps it proportional to partitions × groups.
Pick ``partial`` when groups ≪ rows/partition, ``explode`` otherwise;
``auto`` does exactly that.

Mixed-precision merge folds to the minimum P first, matching union/1
(``src/hyper.erl:67-88``).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from hyper_spark.functions.hashing import hll_prepare
from hyper_spark.kernel.hll import (
    HllSketch,
    beta_coefficients,
    decode_register_blob,
    encode_registers,
    estimate_beta,
    estimate_from_registers,
)

__all__ = [
    "sketch_by",
    "multi_sketch_by",
    "union_sketches",
    "cardinality_col",
    "cardinality_beta_col",
    "beta_estimate_agg",
    "approx_distinct",
    "sketch_collect",
    "register_table",
    "collect_sketches_from_registers",
    "intersect_card",
    "difference_card",
    "SKETCH_FIELDS",
]

SKETCH_FIELDS = [
    StructField("p", IntegerType(), False),
    StructField("registers", BinaryType(), False),
]

_GROUP_COL = "__hll_group"


def _sketch_schema(df: DataFrame, keys: Sequence[str]) -> StructType:
    key_fields = [df.schema[k] for k in keys]
    return StructType(list(key_fields) + SKETCH_FIELDS)


def _densify_fn(p: int, keys: Sequence[str], encoding: str = "dense"):
    m = 1 << p

    def densify(pdf: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(
            regs,
            pdf["idx"].to_numpy(dtype=np.int64),
            pdf["rho"].to_numpy(dtype=np.uint8),
        )
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["p"] = [p]
        out["registers"] = [encode_registers(regs, encoding)]
        return pd.DataFrame(out)

    return densify


def _stream_groups(per_group_fn, keys: Sequence[str]):
    """mapInPandas wrapper that applies a per-group pandas function to
    key-CLUSTERED, key-SORTED partitions: one Python/Arrow round trip
    per partition instead of one per group. applyInPandas paid ~2.8 ms
    of per-group overhead — 2.3 s of a 2.8 s hourly-rollup build was
    744 tiny-group round trips (profiled r6; guide §4.1). The trailing
    (possibly incomplete) group of every batch is carried into the
    next; outputs are batched into one frame per input batch."""
    keys = list(keys)

    def _neq_prev(pdf: pd.DataFrame):
        neq = None
        for k in keys:
            col, prev = pdf[k], pdf[k].shift()
            both_na = col.isna() & prev.isna()
            d = col.ne(prev) & ~both_na
            neq = d if neq is None else (neq | d)
        return neq

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tail = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
                tail = None
            seg = _neq_prev(pdf).cumsum()
            last = seg.iloc[-1]
            tail = pdf[seg == last]
            done = pdf[seg < last]
            if len(done):
                outs = [
                    per_group_fn(g)
                    for _, g in done.groupby(seg[seg < last], sort=False)
                ]
                yield pd.concat(outs, ignore_index=True)
        if tail is not None and len(tail):
            yield per_group_fn(tail)

    return run


def _grouped_apply(df: DataFrame, keys: Sequence[str], per_group_fn, schema):
    """Cluster by ``keys`` + sort within partitions, then stream groups
    through ``per_group_fn`` (see _stream_groups)."""
    keys = list(keys)
    return (
        df.repartition(*keys)
        .sortWithinPartitions(*keys)
        .mapInPandas(_stream_groups(per_group_fn, keys), schema)
    )


def _merge_fn(keys: Sequence[str], encoding: str = "dense", decode_encoding: str = "auto"):
    """``decode_encoding`` declares how the INPUT blobs were written —
    required for 'packed6' inputs, whose length is ambiguous with sparse
    (kernel.decode_register_blob docstring)."""
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        ps = pdf["p"].to_numpy()
        min_p = int(ps.min())
        stacked = []
        for p_i, blob in zip(ps, pdf["registers"]):
            regs = decode_register_blob(int(p_i), blob, decode_encoding)
            if p_i != min_p:
                regs = regs.reshape(-1, 1 << min_p).max(axis=0)
            stacked.append(regs)
        merged = np.maximum.reduce(stacked) if len(stacked) > 1 else stacked[0]
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["p"] = [min_p]
        out["registers"] = [encode_registers(merged, encoding)]
        return pd.DataFrame(out)

    return merge


def _partials_fn(p: int, keys: Sequence[str], encoding: str = "dense"):
    """mapInPandas worker: per Arrow batch, per group, build a dense partial
    sketch (the map-side combine of the `partial` strategy)."""
    m = 1 << p

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate across all batches of the partition: one blob per group
        acc: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if keys:
                grouped = pdf.groupby(list(keys), sort=False, dropna=False)
                for gkey, sub in grouped:
                    gkey = gkey if isinstance(gkey, tuple) else (gkey,)
                    regs = acc.get(gkey)
                    if regs is None:
                        regs = acc.setdefault(gkey, np.zeros(m, dtype=np.uint8))
                    np.maximum.at(
                        regs,
                        sub["idx"].to_numpy(dtype=np.int64),
                        sub["rho"].to_numpy(dtype=np.uint8),
                    )
            else:
                regs = acc.get(())
                if regs is None:
                    regs = acc.setdefault((), np.zeros(m, dtype=np.uint8))
                np.maximum.at(
                    regs,
                    pdf["idx"].to_numpy(dtype=np.int64),
                    pdf["rho"].to_numpy(dtype=np.uint8),
                )
        if acc:
            rows = {
                k: [gkey[i] for gkey in acc] for i, k in enumerate(keys)
            }
            rows["p"] = [p] * len(acc)
            rows["registers"] = [
                encode_registers(regs, encoding) for regs in acc.values()
            ]
            yield pd.DataFrame(rows)

    return build


def sketch_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    p: int = 14,
    strategy: str = "auto",
    encoding: str = "dense",
    hash_fn: str = "sha1",
) -> DataFrame:
    """Aggregate ``col`` into one HLL sketch per ``keys`` group.

    Returns DataFrame[*keys, p int, registers binary]. ``encoding``:
    ``dense`` (default) is the canonical 2^p-byte form
    (src/hyper_register.erl:61-65), byte-equal to a kernel-side
    sequential build; ``sparse``/``auto`` emit the ⟨idx:16, rho:8⟩-pairs
    blob below the hyper_bisect fill threshold
    (src/hyper_bisect.erl:18-29) — up to ~1000x smaller for
    low-cardinality groups, decoded transparently by every consumer.

    NULL values are skipped, matching the null-skipping contract of
    Spark's own approx_count_distinct (the reference only accepts
    binaries, src/hyper.erl:20, so it has no null case).

    ``hash_fn``: ``'sha1'`` (default) is byte-compatible with the
    reference; ``'xxhash64'`` is the 100-TB fast path — ~3x hash-stage
    throughput, same error bounds, NO reference/kernel byte parity, and
    sketches from different hash_fns must never be unioned (see
    functions/hashing.py)."""
    col = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    if encoding == "packed6":
        # packed6 blobs are length-ambiguous with sparse; every generic
        # consumer (cardinality_col, union_sketches, serde) decodes with
        # the 'auto' default. Only checkpointed_sketch_build threads the
        # decode hint level-to-level, so the mode lives there (and in the
        # explicit hll_pack6_col/hll_unpack6_col serde pair).
        raise ValueError(
            "encoding='packed6' is only supported inside "
            "checkpointed_sketch_build (the decode hint must travel with "
            "the blobs); use dense/auto/sparse here"
        )
    if strategy == "auto":
        # ALWAYS explode: the register path is JVM end-to-end (map-side
        # combine bounds every task's shuffle output at 2^p rows per
        # group), while 'partial' ships EVERY raw (idx, rho) row through
        # Arrow into Python. Measured at sf16 (74.5M rows, global
        # sketch, local[32]): explode 2.5 s vs partial 17.7 s — the old
        # keys=[] → 'partial' default was a 7x regression at scale.
        # 'partial' stays available explicitly (its one-blob-per-
        # partition shape is what checkpointed_sketch_build builds on,
        # with salting/lineage where it belongs).
        strategy = "explode"

    idx, rho = hll_prepare(col, p, hash_fn)
    prepared = df.filter(col.isNotNull()).select(
        *keys, idx.alias("idx"), rho.alias("rho")
    )
    schema = _sketch_schema(df, keys)

    if strategy == "partial":
        partials = prepared.mapInPandas(
            _partials_fn(p, keys, encoding), schema=schema
        )
        if keys:
            return partials.groupBy(*keys).applyInPandas(
                _merge_fn(keys, encoding), schema
            )
        grouped = partials.withColumn(_GROUP_COL, F.lit(0))
        return (
            grouped.groupBy(_GROUP_COL)
            .applyInPandas(_merge_fn([], encoding), StructType(SKETCH_FIELDS))
        )

    if strategy == "explode":
        reg_table = prepared.groupBy(*keys, "idx").agg(F.max("rho").alias("rho"))
        if keys:
            return _grouped_apply(
                reg_table, keys, _densify_fn(p, keys, encoding), schema
            )
        grouped = reg_table.withColumn(_GROUP_COL, F.lit(0))
        return (
            grouped.groupBy(_GROUP_COL)
            .applyInPandas(_densify_fn(p, [], encoding), StructType(SKETCH_FIELDS))
        )

    raise ValueError(f"unknown strategy {strategy!r}")


def multi_sketch_by(
    df: DataFrame,
    keys: Sequence[str],
    cols: dict,
    p: int = 14,
    hash_fn: str = "sha1",
    encoding: str = "dense",
) -> DataFrame:
    """Several distinct-count metrics in ONE scan: ``cols`` maps metric
    tag → value column; each (tag, keys) group gets its own sketch,
    byte-identical to a separate ``sketch_by`` per column.

    Shape: the per-row hash expressions for every metric compute in the
    same projection, explode into (tag, idx, rho) rows (so one pass over
    the data feeds all metrics), then the usual bounded register
    aggregation — shuffle ≤ |metrics| × groups × 2^p rows regardless of
    input size. This is the realistic analytics-pass shape (the scaling
    harness measures exactly this job): N metrics cost one read plus N
    tiny aggregates, not N reads.

    Returns DataFrame[metric string, *keys, p, registers]."""
    from pyspark.sql.types import StringType

    keys = list(keys)
    if encoding == "packed6":
        raise ValueError(
            "encoding='packed6' is only supported inside "
            "checkpointed_sketch_build; use dense/auto/sparse here"
        )
    structs = []
    for tag, c in cols.items():
        c = F.col(c) if isinstance(c, str) else c
        idx, rho = hll_prepare(c, p, hash_fn)
        # NULL value -> NULL idx/rho inside the struct; filtered after the
        # explode (a pre-filter can't apply per-metric)
        structs.append(
            F.struct(F.lit(tag).alias("tag"), idx.alias("idx"), rho.alias("rho"))
        )
    exploded = (
        df.select(*keys, F.explode(F.array(*structs)).alias("s"))
        .select(
            *keys,
            F.col("s.tag").alias("metric"),
            F.col("s.idx").alias("idx"),
            F.col("s.rho").alias("rho"),
        )
        .filter(F.col("idx").isNotNull())
    )
    reg = exploded.groupBy("metric", *keys, "idx").agg(F.max("rho").alias("rho"))
    schema = StructType(
        [StructField("metric", StringType(), False)]
        + [df.schema[k] for k in keys]
        + SKETCH_FIELDS
    )
    return _grouped_apply(
        reg, ["metric"] + keys, _densify_fn(p, ["metric"] + keys, encoding), schema
    )


def register_table(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    p: int = 14,
    hash_fn: str = "sha1",
) -> DataFrame:
    """The sparse sketch as rows: DataFrame[*keys, idx, rho] with rho the
    per-(group, idx) max — 100% JVM (scan → hash exprs → partial/final
    aggregate), no Python stage anywhere. At most groups × 2^p rows.
    NULL values are skipped (see sketch_by)."""
    col = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    idx, rho = hll_prepare(col, p, hash_fn)
    prepared = df.filter(col.isNotNull()).select(
        *keys, idx.alias("idx"), rho.alias("rho")
    )
    return prepared.groupBy(*keys, "idx").agg(F.max("rho").alias("rho"))


def collect_sketches_from_registers(
    reg_df: DataFrame, keys: Sequence[str], p: int
) -> dict[tuple, HllSketch]:
    """Driver-side final assembly of a register table into kernel
    sketches (the reference's read path is likewise a cheap scalar stage,
    src/hyper.erl:103-130 / SURVEY §3.3).

    Use when groups × 2^p rows are driver-collectible (e.g. a global
    sketch or a handful of groups): it removes every Python executor
    stage from the job, leaving a pure whole-stage-codegen plan plus one
    tiny collect. For many groups use ``sketch_by`` (distributed
    densify)."""
    keys = list(keys)
    rows = reg_df.collect()
    out: dict[tuple, HllSketch] = {}
    by_key: dict[tuple, list] = {}
    for r in rows:
        k = tuple(r[c] for c in keys)
        by_key.setdefault(k, []).append((r["idx"], r["rho"]))
    for k, pairs in by_key.items():
        idxs = np.fromiter((i for i, _ in pairs), dtype=np.int64, count=len(pairs))
        rhos = np.fromiter((v for _, v in pairs), dtype=np.uint8, count=len(pairs))
        out[k] = HllSketch.from_sparse(p, idxs, rhos)
    return out


def union_sketches(
    sketch_df: DataFrame,
    keys: Sequence[str],
    encoding: str = "dense",
    decode_encoding: str = "auto",
) -> DataFrame:
    """Merge sketches (lossless register max) grouped by ``keys`` — e.g.
    roll per-day sketches up to per-month. Mixed P folds to min P
    (src/hyper.erl:82-87).

    Caveat carried over from the reference's fold (I mod 2^P',
    hyper_binary.erl:150-155): same-P unions are exactly lossless, but a
    *mixed*-P union of sketches built over OVERLAPPING value sets
    double-registers the common elements (folded indices use different
    hash bits than natively-built lower-P indices). Build at one P when
    sets overlap; mixed P is safe for disjoint shards."""
    keys = list(keys)
    if encoding == "packed6":
        raise ValueError(
            "encoding='packed6' is only supported inside "
            "checkpointed_sketch_build (the decode hint must travel with "
            "the blobs); use dense/auto/sparse here"
        )
    if keys:
        schema = StructType([sketch_df.schema[k] for k in keys] + SKETCH_FIELDS)
        return _grouped_apply(
            sketch_df, keys, _merge_fn(keys, encoding, decode_encoding), schema
        )
    grouped = sketch_df.withColumn(_GROUP_COL, F.lit(0))
    return grouped.groupBy(_GROUP_COL).applyInPandas(
        _merge_fn([], encoding, decode_encoding), StructType(SKETCH_FIELDS)
    )


@F.pandas_udf(DoubleType())
def cardinality_col(p: pd.Series, registers: pd.Series) -> pd.Series:
    """Arrow-batched estimator column: sketch blob (dense or sparse) →
    cardinality estimate (src/hyper.erl:103-130)."""
    out = np.empty(len(p), dtype=np.float64)
    for i, (p_i, blob) in enumerate(zip(p, registers)):
        out[i] = estimate_from_registers(
            decode_register_blob(int(p_i), blob), int(p_i)
        )
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def cardinality_beta_col(p: pd.Series, registers: pd.Series) -> pd.Series:
    """Arrow-batched LogLog-Beta estimator column (kernel/hll.py::
    estimate_beta): branch-free, bias-table-free alternative to
    ``cardinality_col``."""
    out = np.empty(len(p), dtype=np.float64)
    for i, (p_i, blob) in enumerate(zip(p, registers)):
        out[i] = estimate_beta(
            decode_register_blob(int(p_i), blob), int(p_i)
        )
    return pd.Series(out)


def beta_estimate_agg(p: int, rho: str | Column = "rho") -> Column:
    """LogLog-Beta estimate as ONE pure-JVM aggregate expression over a
    register table (``register_table`` rows: one (group, idx, rho) row
    per NONZERO register). Compose as

        register_table(df, keys, col, p).groupBy(*keys)
            .agg(beta_estimate_agg(p).alias("estimate"))

    and the whole query — scan, hash, register max, estimate — runs in
    whole-stage codegen with zero Python stages. z (zero registers)
    = m - count(rows); each zero register contributes 2^0 = 1 to the
    register sum, hence the ``+ z`` next to sum(2^-rho). Bit-identical
    to kernel estimate_beta (gated)."""
    rho = F.col(rho) if isinstance(rho, str) else rho
    m = float(1 << p)
    c = [float(x) for x in beta_coefficients(p)]
    z = F.lit(m) - F.count(F.lit(1)).cast("double")
    ssum = F.sum(F.pow(F.lit(2.0), -rho.cast("double"))) + z
    zl = F.log(z + F.lit(1.0))
    beta = F.lit(c[0]) * z
    for i in range(1, 8):
        beta = beta + F.lit(c[i]) * F.pow(zl, F.lit(float(i)))
    from hyper_spark.kernel.hll import alpha as _alpha

    return F.lit(_alpha(1 << p)) * F.lit(m) * (F.lit(m) - z) / (beta + ssum)


def approx_distinct(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    p: int = 14,
    strategy: str = "auto",
    hash_fn: str = "sha1",
    estimator: str = "hllpp",
) -> DataFrame:
    """User-facing distinct-cardinality query: one estimate per group.
    ``estimator='beta'`` routes the read side through LogLog-Beta."""
    sk = sketch_by(df, keys, col, p, strategy, hash_fn=hash_fn)
    est_fn = {"hllpp": cardinality_col, "beta": cardinality_beta_col}[estimator]
    return sk.select(
        *keys, est_fn(F.col("p"), F.col("registers")).alias("estimate")
    )


def sketch_collect(sketch_df: DataFrame, p: int | None = None) -> HllSketch:
    """Collect a single-row sketch DataFrame to a kernel HllSketch."""
    rows = sketch_df.select("p", "registers").collect()
    if not rows:
        if p is None:
            raise ValueError("empty sketch DataFrame and no default precision")
        return HllSketch(p)
    sketches = [HllSketch.from_blob(r["p"], bytes(r["registers"])) for r in rows]
    return HllSketch.merge_all(sketches)


def _binary_sketch_op(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    pair_fn,
    alias: str,
) -> DataFrame:
    """Shared shape for pairwise sketch operators: join two sketch
    tables on ``on`` (cross join of singletons when empty) and apply
    ``pair_fn(HllSketch, HllSketch) -> float`` per pair in one Arrow
    batch — sketches decode via ``from_blob`` (dense + sparse)."""
    on = list(on)
    l = left.select(
        *on, F.col("p").alias("p_l"), F.col("registers").alias("registers_l")
    )
    r = right.select(
        *on, F.col("p").alias("p_r"), F.col("registers").alias("registers_r")
    )
    joined = l.join(r, on=on) if on else l.crossJoin(r)

    @F.pandas_udf(DoubleType())
    def _apply(
        p_l: pd.Series, reg_l: pd.Series, p_r: pd.Series, reg_r: pd.Series
    ) -> pd.Series:
        out = np.empty(len(p_l))
        for i in range(len(p_l)):
            a = HllSketch.from_blob(int(p_l[i]), bytes(reg_l[i]))
            b = HllSketch.from_blob(int(p_r[i]), bytes(reg_r[i]))
            out[i] = pair_fn(a, b)
        return pd.Series(out)

    return joined.select(
        *on,
        _apply("p_l", "registers_l", "p_r", "registers_r").alias(alias),
    )


def intersect_card(
    left: DataFrame, right: DataFrame, on: Sequence[str] = ()
) -> DataFrame:
    """Inclusion–exclusion intersection estimate between two sketch tables
    (src/hyper.erl:97-100; no accuracy guarantee). Joined on ``on`` (cross
    join of singletons when empty)."""
    return _binary_sketch_op(
        left, right, on,
        lambda a, b: a.intersect_cardinality(b),
        "intersect_card",
    )


def difference_card(
    left: DataFrame, right: DataFrame, on: Sequence[str] = ()
) -> DataFrame:
    """Set-difference estimate |A \\ B| between two sketch tables —
    completes the sketch set algebra (union exact by register max,
    intersection/difference by inclusion–exclusion with the reference's
    'no guarantees' caveat, src/hyper.erl:97-100). Computed as
    ``clamp(|A∪B| − |B|)`` into [0, |A|] — three estimates plus one
    merge per pair (the |A| − |A∩B| form expands to the same value but
    costs an extra estimation). Joined on ``on``."""

    def diff(a, b):
        return min(
            a.cardinality(),
            max(0.0, a.merge(b).cardinality() - b.cardinality()),
        )

    return _binary_sketch_op(left, right, on, diff, "difference_card")
