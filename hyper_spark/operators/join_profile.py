"""Sketch-only equijoin planning: everything a planner needs to pick a
join strategy — output size, key cardinalities, per-side skew, key-set
containment — computed from two per-table sketch rows, never running
(or even re-scanning) the join itself.

Why this exists: on a 100-TB cluster the join you are ABOUT to run is
the expensive thing, so the planning statistics must come from
something asymptotically cheaper than the join. Each side is profiled
once into a single ~50 KB row (a count-min sketch of the key's
frequency vector + a theta sketch of the key set); profiles are plain
DataFrame rows, so they persist to parquet and amortize across every
future join against the same table/snapshot. ``join_profile`` then
combines any two profile rows in milliseconds on the driver:

- **output size**  |L ⋈ R| = Σ_v f_L(v)·f_R(v) via the count-min inner
  product (CM05 §4.2, `cms_agg.cms_inner_product`) — always an
  overcount, est ≤ true + (e/width)·n_l·n_r;
- **self-join sizes** Σ f(v)² per side (the second frequency moment's
  join form) → the dimensionless skew ratio Σf²·d/n², which is 1.0 for
  a uniform key and grows with hot keys — a hot key is visible here
  BEFORE it stalls a shuffle;
- **key cardinalities and set overlap** from the theta sketches:
  distinct keys per side, containment |K_L∩K_R|/|K_L| (the referential
  -integrity estimate: 1.0 means every left key has a right match),
  and key-set Jaccard — exact below saturation;
- **a strategy recommendation** (broadcast smaller side / plain
  shuffle / salted shuffle) from documented row-count and skew-ratio
  thresholds.

Reference parity note: the reference library (src/hyper.erl) stops at
HLL cardinalities; join planning is part of the engine surface this
repo adds (SURVEY.md §2.4), with semantics from the published CM05 and
KMV/theta papers.

Scale notes: profiling a side costs three column-pruned scans (one
tiny count aggregate, one count-min aggregate, one theta pass) — pass
a cached DataFrame to pay the IO once, or profile straight off the
parquet footprint of the single key column. ``join_profile`` collects
exactly two 1-row profiles (bounded by construction) and computes on
the driver: planning is a driver-side decision, so shipping the two
blobs to it is the correct topology.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.kernel.cms import CountMinSketch
from hyper_spark.kernel.theta import ThetaSketch
from hyper_spark.operators.cms_agg import cms_by
from hyper_spark.operators.theta_agg import theta_by

__all__ = ["join_key_profile", "join_profile"]

# Row-count ceiling under which a side is recommended for broadcast.
# Spark's own autoBroadcastJoinThreshold is 10 MB of *bytes*; at a
# conservative ~100 B/row of join payload that is ~10^5 rows, but
# executors on a 100-TB cluster run with tens of GB of memory, so the
# practical ceiling users configure is far higher. 8M rows (~1 GB at
# 128 B/row) is the documented default; callers tune it to their
# executor memory.
_BROADCAST_ROWS = 8_000_000

# Skew ratio (sum f^2 * distinct / n^2; 1.0 = perfectly uniform key)
# beyond which a salted shuffle is recommended. 8x means the expected
# collision mass is 8x the uniform baseline — at that point the
# largest task is likely several times the median and AQE skew splits
# or explicit salting pay for themselves.
_SKEW_RATIO = 8.0


def join_key_profile(
    df: DataFrame,
    col: str | Column,
    k: int = 1 << 14,
    depth: int = 5,
    width: int = 8192,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Profile one side of a future equijoin: a ONE-row DataFrame
    describing the join key's frequency vector and key set.

    Columns: ``n_rows`` (all rows), ``n_keys`` (non-NULL key rows —
    the rows an inner join can emit), ``n_nulls``, ``cms`` (struct:
    depth, width, n, counters, hash_fn) and ``theta`` (struct: k,
    n_entries, entries, hash_fn). The row is parquet-persistable;
    profile once per table snapshot, reuse for every join against it.

    NULL keys are counted but excluded from both sketches (equijoins
    never match NULLs — the sketch NULL contract).
    """
    c = F.col(col) if isinstance(col, str) else col
    key = c.alias("__key")
    counts = df.select(key).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("__key")).alias("n_keys"),
    )
    cms = cms_by(
        df.select(key), [], "__key", depth=depth, width=width, hash_fn=hash_fn
    ).select(
        F.struct("depth", "width", "n", "counters", "hash_fn").alias("cms")
    )
    theta = theta_by(df.select(key), [], "__key", k=k, hash_fn=hash_fn).select(
        F.struct("k", "n_entries", "entries", "hash_fn").alias("theta")
    )
    # left joins, not crossJoins: an all-NULL or empty side produces
    # ZERO sketch rows, and the profile must still be one row (with
    # null sketch structs — join_profile substitutes empty kernels)
    j = F.lit(0).alias("__j")
    return (
        counts.select("*", j)
        .join(cms.select("*", j), "__j", "left")
        .join(theta.select("*", j), "__j", "left")
        .select(
            "n_rows",
            "n_keys",
            (F.col("n_rows") - F.col("n_keys")).alias("n_nulls"),
            "cms",
            "theta",
        )
    )


def _collect_profile(prof: DataFrame, side: str):
    """Collect a one-row profile to (row, cms|None, theta|None, hash_fn|None).

    Null sketch structs (an empty/all-NULL side) come back as None —
    join_profile substitutes zeroed kernels using the other side's
    dimensions (dimensions must align anyway)."""
    rows = prof.collect()
    if len(rows) != 1:
        raise ValueError(
            f"{side} profile must be exactly one row (got {len(rows)}); "
            "build it with join_key_profile"
        )
    row = rows[0]
    if row["cms"] is None or row["theta"] is None:
        return row, None, None, None
    cms = CountMinSketch.from_bytes(
        int(row["cms"]["depth"]),
        int(row["cms"]["width"]),
        bytes(row["cms"]["counters"]),
        int(row["cms"]["n"]),
    )
    theta = ThetaSketch.from_bytes(
        int(row["theta"]["k"]), bytes(row["theta"]["entries"])
    )
    if row["cms"]["hash_fn"] != row["theta"]["hash_fn"]:
        raise ValueError(
            f"{side} profile mixes hash_fns "
            f"({row['cms']['hash_fn']!r} cms vs {row['theta']['hash_fn']!r} "
            "theta) — rebuild with join_key_profile"
        )
    return row, cms, theta, row["cms"]["hash_fn"]


def join_profile(
    left: DataFrame,
    right: DataFrame,
    broadcast_rows: int = _BROADCAST_ROWS,
    skew_ratio: float = _SKEW_RATIO,
) -> DataFrame:
    """Combine two ``join_key_profile`` rows into the equijoin plan
    report: a ONE-row DataFrame.

    Columns: ``n_l``/``n_r`` (non-NULL key rows), ``distinct_l``/
    ``distinct_r`` (theta estimates), ``est_join_rows`` (count-min
    inner product — an overcount within ``err_bound`` = e/width ·
    n_l·n_r), ``selfjoin_l``/``selfjoin_r`` (Σf² per side),
    ``skew_l``/``skew_r`` (Σf²·distinct/n² — 1.0 for a uniform key),
    ``containment_l_in_r``/``containment_r_in_l`` (fraction of one
    side's key SET present in the other — the referential-integrity
    estimate), ``key_jaccard``, and ``recommendation`` (one of
    ``broadcast_left``, ``broadcast_right``, ``shuffle_salted``,
    ``shuffle``).

    Empty sides are well-defined: estimates are 0, ratios 0, and the
    recommendation is ``broadcast_<empty side>``.
    """
    lrow, lcms, ltheta, lhash = _collect_profile(left, "left")
    rrow, rcms, rtheta, rhash = _collect_profile(right, "right")
    # an empty side has null sketches: substitute zeroed kernels with
    # the other side's dimensions (every estimate involving it is 0)
    if lcms is None and rcms is None:
        lcms = rcms = CountMinSketch(5, 2048)
        ltheta = rtheta = ThetaSketch.empty(4096)
        lhash = rhash = "xxhash64"
    elif lcms is None:
        lcms = CountMinSketch(rcms.depth, rcms.width)
        ltheta = ThetaSketch.empty(rtheta.k)
        lhash = rhash
    elif rcms is None:
        rcms = CountMinSketch(lcms.depth, lcms.width)
        rtheta = ThetaSketch.empty(ltheta.k)
        rhash = lhash
    if (lcms.depth, lcms.width) != (rcms.depth, rcms.width):
        raise ValueError(
            "count-min dimensions must match to inner-product: "
            f"{(lcms.depth, lcms.width)} vs {(rcms.depth, rcms.width)}"
        )
    if ltheta.k != rtheta.k:
        raise ValueError(
            f"theta k must match to intersect: {ltheta.k} vs {rtheta.k}"
        )
    if lhash != rhash:
        raise ValueError(
            f"profiles built with different hash_fns ({lhash!r} vs "
            f"{rhash!r}) do not bucket-align"
        )

    n_l, n_r = int(lrow["n_keys"]), int(rrow["n_keys"])
    est_join = lcms.inner_product(rcms)
    self_l = lcms.inner_product(lcms)
    self_r = rcms.inner_product(rcms)
    dist_l = ltheta.estimate()
    dist_r = rtheta.estimate()
    inter = ltheta.intersect_card(rtheta)
    union_est = ltheta.union(rtheta).estimate()
    skew_l = self_l * dist_l / (n_l * n_l) if n_l else 0.0
    skew_r = self_r * dist_r / (n_r * n_r) if n_r else 0.0

    if min(n_l, n_r) <= broadcast_rows:
        rec = "broadcast_left" if n_l <= n_r else "broadcast_right"
    elif max(skew_l, skew_r) >= skew_ratio:
        rec = "shuffle_salted"
    else:
        rec = "shuffle"

    spark = left.sparkSession
    return spark.createDataFrame(
        [
            (
                n_l,
                n_r,
                float(dist_l),
                float(dist_r),
                int(est_join),
                math.e / lcms.width * n_l * n_r,
                int(self_l),
                int(self_r),
                float(skew_l),
                float(skew_r),
                float(inter / dist_l) if dist_l else 0.0,
                float(inter / dist_r) if dist_r else 0.0,
                float(inter / union_est) if union_est else 0.0,
                rec,
            )
        ],
        "n_l bigint, n_r bigint, distinct_l double, distinct_r double, "
        "est_join_rows bigint, err_bound double, selfjoin_l bigint, "
        "selfjoin_r bigint, skew_l double, skew_r double, "
        "containment_l_in_r double, containment_r_in_l double, "
        "key_jaccard double, recommendation string",
    )
