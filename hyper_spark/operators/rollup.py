"""Time-grain sketch rollups (hypertable-style continuous aggregates).

The workload: "distinct users per hour, per day, per week" over an
append-heavy event/transcript table. Naively that is one full scan per
grain. Here the raw table is scanned ONCE — HLL sketches are built at
the finest grain, and every coarser grain is derived by lossless
register-max union of the finer sketches (union associativity is the
reference's own merge law, src/hyper.erl:82-87, property-tested in
tests/test_kernel_hll.py). Because the union is exact over registers,
a rolled-up day sketch is byte-identical to one built directly from the
raw rows — that identity is the correctness gate.

Scale shape: the single raw scan feeds the usual two-level sketch
aggregation (shuffle bounded by buckets × 2^p rows); each coarser grain
then shuffles only |finer buckets| sketch blobs — independent of the
raw row count, which is what makes serving many grains over 10^12 rows
cheap.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.operators.hll_agg import (
    cardinality_col,
    sketch_by,
    union_sketches,
)

__all__ = [
    "sketch_time_rollup",
    "rollup_estimates",
    "retention_estimates",
    "sketch_cube",
    "sliding_sketch_union",
]

# Spark date_trunc fmts, fine -> coarse (all also valid DuckDB grains)
_GRAIN_ORDER = ("minute", "hour", "day", "week", "month", "quarter", "year")


def _nests_in(fine: str, coarse: str) -> bool:
    """True iff every ``fine`` bucket lies wholly inside one ``coarse``
    bucket — the condition under which ``coarse`` sketches may be derived
    from ``fine`` sketches. minute ⊂ hour ⊂ day ⊂ everything;
    month ⊂ quarter ⊂ year; but a WEEK can straddle a month/quarter/year
    boundary, so week nests into nothing coarser."""
    order = {g: i for i, g in enumerate(_GRAIN_ORDER)}
    if order[fine] >= order[coarse]:
        return False
    if fine in ("minute", "hour", "day"):
        return True
    if fine == "week":
        return False
    return True  # month -> quarter/year, quarter -> year


def sketch_time_rollup(
    df: DataFrame,
    ts_col: str,
    col: str | Column,
    p: int = 14,
    grains: Sequence[str] = ("hour", "day"),
    keys: Sequence[str] = (),
    encoding: str = "dense",
    checkpoint_dir: str | None = None,
    hash_fn: str = "sha1",
) -> DataFrame:
    """One HLL sketch per (keys, grain, bucket) for every grain in
    ``grains`` (ordered fine → coarse), coarser grains derived by
    lossless union of the previous grain's sketches.

    With ``checkpoint_dir`` each grain is persisted as parquet under
    ``<dir>/grain_<name>`` before the next is derived, so the raw table
    is scanned exactly ONCE however many grains are served (and a rerun
    resumes: complete grains are read back, not rebuilt) — the shape to
    use at scale. Without it the result is a lazy plan whose execution
    re-derives the finer levels once per grain (fine for interactive /
    small inputs; Spark does not reuse the shared subplan across the
    union branches).

    Returns DataFrame[*keys, grain string, bucket timestamp, p,
    registers]."""
    keys = list(keys)
    grains = list(grains)
    order = {g: i for i, g in enumerate(_GRAIN_ORDER)}
    unknown = [g for g in grains if g not in order]
    if unknown:
        raise ValueError(f"unknown grains {unknown}; pick from {_GRAIN_ORDER}")
    if len(grains) != len(set(grains)) or sorted(grains, key=order.get) != grains:
        raise ValueError("grains must be unique and ordered fine -> coarse")
    if encoding == "packed6":
        # a packed6 blob is length-ambiguous with sparse and the rollup's
        # consumers (cardinality_col / rollup_estimates / union_sketches)
        # decode with the 'auto' default — only checkpointed_sketch_build
        # threads the required decode hint level-to-level
        raise ValueError("encoding='packed6' is not supported by rollups; use dense/auto/sparse")
    # every coarser grain must derive from a grain that NESTS inside it —
    # a week sketch cannot roll into a month (weeks straddle month
    # boundaries; such a union would misattribute whole weeks)
    for i, g in enumerate(grains[1:], start=1):
        if not any(_nests_in(f, g) for f in grains[:i]):
            raise ValueError(
                f"grain {g!r} cannot be derived from any finer grain in "
                f"{grains[:i]} (weeks straddle month/quarter/year "
                "boundaries); include a day-or-finer grain before it"
            )

    def materialize(grain: str, sk: DataFrame) -> DataFrame:
        """checkpoint_dir: write-once-then-read so coarser grains and the
        final union read parquet, never re-deriving this level."""
        if checkpoint_dir is None:
            return sk
        import os

        from hyper_spark.plans.merge import _complete

        path = os.path.join(checkpoint_dir, f"grain_{grain}")
        if not _complete(path):
            sk.write.mode("overwrite").parquet(path)
        return sk.sparkSession.read.parquet(path)

    fine = grains[0]
    built: dict[str, DataFrame] = {}
    built[fine] = materialize(
        fine,
        sketch_by(
            df.withColumn("__bucket", F.date_trunc(fine, F.col(ts_col))),
            keys + ["__bucket"],
            col,
            p,
            encoding=encoding,
            hash_fn=hash_fn,
        ),
    )

    def tagged(grain: str, sk: DataFrame) -> DataFrame:
        return sk.select(
            *keys,
            F.lit(grain).alias("grain"),
            F.col("__bucket").alias("bucket"),
            "p",
            "registers",
        )

    out = tagged(fine, built[fine])
    for i, g in enumerate(grains[1:], start=1):
        # derive from the COARSEST already-built grain that nests in g
        # (coarsest = fewest sketches to union); validated above
        src = max(
            (f for f in grains[:i] if _nests_in(f, g)), key=order.get
        )
        built[g] = materialize(
            g,
            union_sketches(
                built[src].withColumn("__bucket", F.date_trunc(g, F.col("__bucket"))),
                keys + ["__bucket"],
                encoding=encoding,
            ),
        )
        out = out.unionByName(tagged(g, built[g]))
    return out


def rollup_estimates(rollup_df: DataFrame) -> DataFrame:
    """Attach the cardinality estimate to a ``sketch_time_rollup``
    output (drops the register blobs — the query-serving projection)."""
    return rollup_df.withColumn(
        "estimate", cardinality_col(F.col("p"), F.col("registers"))
    ).drop("p", "registers")


def retention_estimates(
    sketch_df: DataFrame,
    bucket_col: str = "bucket",
    step: str = "1 day",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Period-over-period audience overlap from a per-bucket sketch
    table — the classic retention query (how many of bucket t's distinct
    users return in bucket t+step?) answered WITHOUT rescanning raw
    data: each adjacent pair of sketches yields the union estimate by
    lossless register max, the intersection by inclusion–exclusion
    (src/hyper.erl:97-100 — no accuracy guarantee, same caveat as
    ``intersect_card``), and derived rates.

    Input: [*keys, bucket_col timestamp, p, registers] (e.g. one grain
    of ``sketch_time_rollup``). Output per consecutive pair:
    [*keys, bucket, next_bucket, prev_estimate, next_estimate,
    overlap_estimate, retention_rate, jaccard].

    Scale: a self-join keyed by (keys, bucket+step) over |buckets| rows
    of 2^p-byte blobs — raw-data volume never moves; the pairwise math
    is one Arrow batch of sketch pairs.
    """
    from hyper_spark.kernel.hll import HllSketch

    keys = list(keys)
    if "grain" in sketch_df.columns:
        raise ValueError(
            "sketch table carries a 'grain' column (sketch_time_rollup "
            "output): select ONE grain first — equal bucket timestamps "
            "from different grains would silently cross-join"
        )
    cur = sketch_df.select(
        *keys,
        F.col(bucket_col).alias("bucket"),
        F.col("p").alias("p_a"),
        F.col("registers").alias("reg_a"),
        (F.col(bucket_col) + F.expr(f"INTERVAL {step}")).alias("__next"),
    )
    nxt = sketch_df.select(
        *keys,
        F.col(bucket_col).alias("__next"),
        F.col("p").alias("p_b"),
        F.col("registers").alias("reg_b"),
    )
    joined = cur.join(nxt, on=keys + ["__next"])

    @F.pandas_udf("struct<prev:double,nxt:double,overlap:double>")
    def pair_stats(
        p_a: pd.Series, ra: pd.Series, p_b: pd.Series, rb: pd.Series
    ) -> pd.DataFrame:
        prev, nxt_, over = [], [], []
        for pa, a, pb, b in zip(p_a, ra, p_b, rb):
            # from_blob: decodes dense AND sparse register encodings —
            # the library-wide consumer contract (encoding='auto' tables
            # carry sparse blobs below the fill threshold)
            sa = HllSketch.from_blob(int(pa), bytes(a))
            sb = HllSketch.from_blob(int(pb), bytes(b))
            prev.append(sa.cardinality())
            nxt_.append(sb.cardinality())
            over.append(sa.intersect_cardinality(sb))
        return pd.DataFrame({"prev": prev, "nxt": nxt_, "overlap": over})

    stats = pair_stats("p_a", "reg_a", "p_b", "reg_b")
    out = joined.withColumn("__s", stats).select(
        *keys,
        "bucket",
        F.col("__next").alias("next_bucket"),
        F.col("__s.prev").alias("prev_estimate"),
        F.col("__s.nxt").alias("next_estimate"),
        F.col("__s.overlap").alias("overlap_estimate"),
        F.when(
            F.col("__s.prev") > 0, F.col("__s.overlap") / F.col("__s.prev")
        ).otherwise(F.lit(0.0)).alias("retention_rate"),
        F.when(
            F.col("__s.prev") + F.col("__s.nxt") - F.col("__s.overlap") > 0,
            F.col("__s.overlap")
            / (F.col("__s.prev") + F.col("__s.nxt") - F.col("__s.overlap")),
        ).otherwise(F.lit(0.0)).alias("jaccard"),
    )
    return out


def sliding_sketch_union(
    sketch_df: DataFrame,
    bucket_col: str = "bucket",
    window: int = 7,
    step_seconds: float = 86400.0,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Rolling-window distinct counts from a bucketed sketch table —
    "7-day rolling distinct users" — WITHOUT rescanning raw data: the
    sketch for target bucket t is the lossless register-max union of
    the source sketches in (t − window·step, t]. Each source bucket
    contributes to its ``window`` following targets via one explode, so
    the whole job shuffles ``window × |buckets|`` sketch blobs —
    independent of the raw row count (an exact rolling distinct re-scans
    ``window`` days of raw rows per day served).

    ``bucket_col`` must be a timestamp/date on a fixed ``step_seconds``
    stride (the ``sketch_time_rollup`` output shape; select ONE grain
    first). Targets are kept only for buckets present in the source
    table. Returns [*keys, bucket_col (timestamp), p, registers]; feed
    ``cardinality_col`` for serving. Mixed-p inputs fold to min-p, the
    standard union law."""
    keys = list(keys)
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if "grain" in sketch_df.columns:
        raise ValueError(
            "sketch table carries a 'grain' column (sketch_time_rollup "
            "output): select ONE grain first — equal bucket timestamps "
            "from different grains would silently mix"
        )
    src = F.col(bucket_col).cast("timestamp")
    contrib = sketch_df.select(
        *keys, src.alias("__src"), "p", "registers",
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("__w"),
    ).withColumn(
        bucket_col,
        F.timestamp_seconds(
            F.col("__src").cast("double")
            + F.col("__w") * F.lit(float(step_seconds))
        ),
    )
    # keep only targets that exist as source buckets (no phantom
    # trailing windows past the data's end); |buckets| rows, broadcast
    observed = sketch_df.select(src.alias(bucket_col)).distinct()
    contrib = contrib.join(F.broadcast(observed), on=bucket_col, how="leftsemi")
    return union_sketches(
        contrib.drop("__src", "__w"), keys + [bucket_col]
    )


def sketch_cube(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    p: int = 14,
    subsets: Sequence[Sequence[str]] | None = None,
    hash_fn: str = "sha1",
    lattice: bool = True,
) -> DataFrame:
    """Distinct-count CUBE from ONE raw scan: build sketches at the
    finest grouping (all ``keys``) once, then derive every requested
    grouping subset by lossless register-max union along the subset
    LATTICE — each subset unions its smallest already-built strict
    superset (max is associative, so any derivation path yields
    byte-identical registers; the pytest asserts this). An exact-count
    CUBE re-scans (or re-shuffles) the raw table once per grouping set;
    here each coarser subset unions only |parent groups| sketch blobs
    (≤ |finest groups|, and typically far fewer once one level up the
    lattice — the win grows with k and key-domain width).

    ``subsets`` defaults to all 2^k subsets. Output: [*keys (NULL for
    keys absent from the subset), grouping_id bigint, p, registers] —
    ``grouping_id`` follows Spark/Hive ``grouping_id()`` convention:
    the FIRST grouping column occupies the MOST-significant bit
    (bit ``len(keys)-1-i`` set ⇔ keys[i] ABSENT), disambiguating a
    NULL key value from an aggregated-away key and joinable against
    SQL ``GROUPING__ID``. Feed through ``rollup_estimates``-style
    ``cardinality_col`` for serving.
    """
    from itertools import combinations

    from hyper_spark.operators.hll_agg import sketch_by, union_sketches

    keys = list(keys)
    if not keys:
        raise ValueError("sketch_cube needs at least one key")
    if subsets is None:
        subsets = [
            list(c)
            for r in range(len(keys) + 1)
            for c in combinations(keys, r)
        ]
    finest = sketch_by(df, keys, col, p, hash_fn=hash_fn).persist()
    finest.count()  # the ONE raw scan; everything derives from here
    finest_key = frozenset(keys)
    built: dict[frozenset, DataFrame] = {finest_key: finest}
    pinned = [finest]
    parts = []
    # largest subsets first so every child finds a built parent
    for sub in sorted((list(s) for s in subsets), key=len, reverse=True):
        sset = frozenset(sub)
        tbl = built.get(sset)
        if tbl is None:
            # smallest already-built strict superset = fewest input blobs
            # (lattice=False always unions from the finest table — the
            # pre-r04 behavior, kept for A/B measurement)
            parent = (
                min((k for k in built if sset < k), key=len)
                if lattice
                else finest_key
            )
            tbl = union_sketches(built[parent], sub).persist()
            tbl.count()
            pinned.append(tbl)
            built[sset] = tbl
        gid = sum(
            1 << (len(keys) - 1 - i)
            for i, k in enumerate(keys)
            if k not in sset
        )
        proj = tbl.select(
            *[
                (F.col(k) if k in sset else F.lit(None)).alias(k)
                for k in keys
            ],
            F.lit(gid).cast("bigint").alias("grouping_id"),
            "p",
            "registers",
        )
        parts.append(proj)
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    # materialize before releasing the lattice caches (callers get a
    # small, self-contained result: Σ_subsets |groups(subset)| rows)
    out = out.persist()
    out.count()
    for t in pinned:
        t.unpersist()
    return out
