"""VarOpt-style fixed-size weighted sampling with unbiased subset sums.

VarOpt_k (Cohen, Duffield, Kaplan, Lund, Thorup, SODA 2009) keeps, out
of n weighted items, every "heavy" item (weight > tau) exactly and a
variance-optimal fixed-size sample of the light rest, where the
threshold tau is the unique solution of

    sum_i min(w_i / tau, 1) = k            (n > k; tau = 0 otherwise)

so that |heavies| + E[light picks] = k. Kept lights get adjusted
weight tau; any post-hoc subset-sum estimate

    est(S) = sum of adjusted weights of sampled items in S

is unbiased (Horvitz-Thompson: every light is included with
probability exactly w_i / tau, heavies with probability 1).

This implementation realizes VarOpt's inclusion probabilities with
SYSTEMATIC PPS selection (Madow 1949) instead of the sequential
stream procedure: lights are laid out on a weight line in md5-shuffled
order and a deterministic grid of pitch tau with offset u0 ~ U(0, tau]
picks exactly k - |heavies| of them (every interval of length w_i <=
tau contains a grid point with probability w_i / tau). Per-item
inclusion probabilities — and hence unbiasedness and the exact sample
size — match VarOpt; only the joint inclusion law differs (systematic
vs the stream pair-drop), which the subset-sum variance inherits as
the classic systematic-sampling behaviour: zero variance for subsets
aligned with the layout order, never worse than Poisson for the
md5-shuffled order used here.

Determinism doctrine (sampling.py): the layout order, the grid offset,
and every tie-break are md5-derived pure functions of (item, group,
seed) — no RNG stream, no partition-order dependence. With count
weights (``weight=None``) every intermediate is integer-exact, so the
sampled SET and all adjusted weights are reproducible row-by-row by
the DuckDB oracle across re-runs, partitionings, and cluster sizes.
Explicit ``weight`` columns sum as doubles; tau then carries the usual
FP-reduction jitter (the estimates are unaffected at ~1e-15 relative).

Plan shape (the 100-TB contract): one shuffle for the per-(group,
item) weight aggregate; tau from the top-k weights only (partition-
local rank prune exactly as priority_sample.py — a group's millions of
distinct items never funnel through one window task) plus one tiny
per-group total; the light layout is the packing.py two-level prefix
sum (hash-bucketed local cumsums + a broadcast of n_buckets base
offsets — no corpus-wide single-partition window); the grid filter is
pure codegen arithmetic. Output <= k rows per group.

Merge contract: same-seed samples over DISJOINT item universes merge
by resampling the union with adjusted weights as the new weights —
unbiasedness composes by the tower rule (each adjusted weight is
already unbiased for its shard's subset sum). Same schema out, so
merges tree up across shards/checkpoints like the other sketches.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyper_spark.operators.sampling import (
    _HASH_SPACE,
    split_hash_col,
    uniform_draw_col,
)

__all__ = ["varopt_sample_by", "varopt_subset_sum", "varopt_merge"]


def varopt_sample_by(
    df: DataFrame,
    item: str,
    weight: str | Column | None = None,
    k: int = 64,
    by: Sequence[str] = (),
    seed: str | int = 0,
    n_buckets: int | None = None,
) -> DataFrame:
    """Build the sketch: DataFrame[*by, item, w, adjusted, tau], <= k
    rows per ``by`` group (exactly k when the group has > k items).

    ``weight`` None counts rows (w = item frequency, integer-exact
    path); otherwise w = sum(weight) per item — weights must be
    positive for the estimator guarantee (non-positive aggregate
    weights are dropped). ``tau`` is 0.0 for groups with <= k items
    (sample == whole group, every estimate exact); ``adjusted`` is w
    for heavies (w > tau) and tau for sampled lights.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bys = list(by)
    it = F.col(item)
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    count_path = weight is None
    base = df.filter(it.isNotNull())
    if count_path:
        w_agg = F.count(F.lit(1))
    else:
        wd = (F.col(weight) if isinstance(weight, str) else weight).cast(
            "double"
        )
        # NaN > 0 is TRUE in Spark SQL: row-level exclusion, or one NaN
        # row poisons its item's summed weight, then tau and W
        base = base.filter((wd > 0) & ~F.isnan(wd))
        w_agg = F.sum(wd)
    weighted = base.groupBy(*bys, it.alias(item)).agg(w_agg.alias("w"))

    # one tiny row per group: total weight + item count (the only
    # full-group facts tau needs beyond the top-k weights)
    tot = weighted.groupBy(*bys).agg(
        F.sum("w").alias("__W"), F.count(F.lit(1)).alias("__n")
    )

    # ---- tau: top-k waterfilling over the k largest weights --------
    # heavy boundary h* = min h in [0, k) with w(h+1) <= (W - C_h)/(k-h)
    # (unique; exists whenever n > k). Only ranks 1..k matter, so the
    # priority_sample partition-local prune bounds the per-group window
    # input at n_partitions * k rows.
    scored = weighted
    if bys:
        local = Window.partitionBy(F.spark_partition_id(), *bys).orderBy(
            F.desc("w"), F.col(item)
        )
        scored = (
            scored.withColumn("__lrn", F.row_number().over(local))
            .filter(F.col("__lrn") <= k)
            .drop("__lrn")
        )
    else:
        scored = scored.orderBy(F.desc("w"), F.col(item)).limit(k)
    part = Window.partitionBy(*bys) if bys else Window.partitionBy()
    rank_w = part.orderBy(F.desc("w"), F.col(item))
    cum_w = part.orderBy(F.desc("w"), F.col(item)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    topk = (
        scored.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") <= k)
        .withColumn("__C", F.sum("w").over(cum_w))
        .join(F.broadcast(tot), on=bys) if bys
        else scored.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") <= k)
        .withColumn("__C", F.sum("w").over(cum_w))
        .crossJoin(F.broadcast(tot))
    )
    # w_i * (k - rn + 1) <= W - C_{rn-1}  (division-free: exact on the
    # integer count path); restricted to groups that actually sample
    cond = (
        (F.col("__n") > k)
        & (
            F.col("w") * (k - F.col("__rn") + F.lit(1))
            <= F.col("__W") - F.col("__C") + F.col("w")
        )
    )
    r0 = (
        topk.filter(cond)
        .groupBy(*bys)
        .agg(F.min("__rn").alias("__r0"))
    )
    tau_tab = (
        (topk.join(F.broadcast(r0), on=bys) if bys
         else topk.crossJoin(F.broadcast(r0)))
        .filter(F.col("__rn") == F.col("__r0"))
        .select(
            *bys,
            (
                (F.col("__W") - F.col("__C") + F.col("w")).cast("double")
                / (k - F.col("__rn") + F.lit(1)).cast("double")
            ).alias("__tau"),
        )
    )

    if bys:
        tagged = weighted.join(F.broadcast(tau_tab), on=bys, how="left")
    else:
        # global path: tau_tab has 0 rows (n <= k) or 1 row — a
        # broadcast left join on a constant-true condition attaches it
        # without a key column
        tagged = weighted.join(
            F.broadcast(tau_tab), on=F.lit(True), how="left"
        )
    tagged = tagged.withColumn(
        "tau", F.coalesce(F.col("__tau"), F.lit(0.0))
    ).drop("__tau")

    heavies = tagged.filter(
        (F.col("tau") == 0.0) | (F.col("w") > F.col("tau"))
    ).select(
        *bys, item, F.col("w").cast("double").alias("w"),
        F.col("w").cast("double").alias("adjusted"), "tau",
    )

    # ---- lights: systematic PPS over the md5-shuffled weight line --
    lights = tagged.filter(
        (F.col("tau") > 0.0) & (F.col("w") <= F.col("tau"))
    )
    hv = F.conv(split_hash_col(item, seed), 16, 10).cast("long")
    # order-monotonic uniform bucketing of the 32-bit hash line: the
    # two-level prefix sum (packing.py shape) — per-(group, bucket)
    # local cumsums in parallel, only n_buckets base rows through the
    # per-group prefix window
    bucket = F.floor(hv * F.lit(n_buckets) / F.lit(float(_HASH_SPACE))).cast(
        "int"
    )
    lb = lights.withColumn("__hv", hv).withColumn("__b", bucket)
    intra = (
        Window.partitionBy(*bys, "__b")
        .orderBy("__hv", item)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_cum = lb.withColumn("__cum", F.sum("w").over(intra))
    btot = lb.groupBy(*bys, "__b").agg(F.sum("w").alias("__bt"))
    bprefix = (
        Window.partitionBy(*bys) if bys else Window.partitionBy()
    ).orderBy("__b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bases = btot.withColumn(
        "__base", F.sum("__bt").over(bprefix) - F.col("__bt")
    ).select(*bys, "__b", "__base")
    laid = local_cum.join(F.broadcast(bases), on=[*bys, "__b"]).withColumn(
        "__c", (F.col("__base") + F.col("__cum")).cast("double")
    )
    # grid offset: one uniform per group in (0, tau], md5 of the group
    # key — reproducible by the oracle, independent of the item draws
    gkey = (
        F.concat_ws("\x1f", *[F.col(b).cast("string") for b in bys])
        if bys
        else F.lit("")
    )
    u0 = uniform_draw_col(gkey, f"{seed}:off") * F.col("tau")
    picked = laid.withColumn("__u0", u0).filter(
        F.floor((F.col("__c") - F.col("__u0")) / F.col("tau"))
        > F.floor(
            (F.col("__c") - F.col("w") - F.col("__u0")) / F.col("tau")
        )
    )
    sampled = picked.select(
        *bys, item, F.col("w").cast("double").alias("w"),
        F.col("tau").alias("adjusted"), "tau",
    )
    return heavies.unionByName(sampled)


def varopt_subset_sum(
    sample: DataFrame,
    cond: Column,
    by: Sequence[str] = (),
) -> DataFrame:
    """Unbiased subset-sum estimate from the sketch:
    DataFrame[*by, est_sum, n_sample_hits]. ``cond`` is any predicate
    over the sample's columns (typically the item); est_sum =
    sum(adjusted) over matching sampled items — exact when the group
    had <= k items (tau 0, adjusted == w everywhere)."""
    bys = list(by)
    hit = F.when(cond, F.col("adjusted"))
    agg = sample.groupBy(*bys) if bys else sample.groupBy()
    return agg.agg(
        F.coalesce(F.sum(hit), F.lit(0.0)).alias("est_sum"),
        F.count(hit).alias("n_sample_hits"),
    )


def varopt_merge(
    samples: Sequence[DataFrame],
    item: str,
    k: int,
    by: Sequence[str] = (),
    seed: str | int = "m",
) -> DataFrame:
    """Merge same-build-seed sketches over DISJOINT item universes (see
    module doc): resample the union with each entry's adjusted weight
    as its new weight — the tower rule keeps every downstream subset
    sum unbiased. ``seed`` salts the merge pass so its draws are
    independent of the build draws. Same schema out."""
    if not samples:
        raise ValueError("no samples to merge")
    u = samples[0]
    for s in samples[1:]:
        u = u.unionByName(s)
    return varopt_sample_by(
        u, item, weight="adjusted", k=k, by=by, seed=seed
    )
