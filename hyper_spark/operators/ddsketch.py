"""DDSketch: fully-mergeable quantiles with a RELATIVE-error guarantee.

Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable Quantile Sketch
with Relative-Error Guarantees" (VLDB 2019). Complements the KLL /
t-digest family (operators/quantiles.py), whose guarantee is on *rank*:
DDSketch instead guarantees the returned value x̂ is within ``alpha`` of
the true q-quantile x_q in VALUE — ``|x̂ - x_q| <= alpha * x_q`` — which
is what latency SLOs ask for ("p99 within 1%"), and which rank-error
sketches cannot promise on heavy-tailed data.

The sketch is a log-spaced histogram: with gamma = (1+alpha)/(1-alpha),
every x > 0 lands in bucket i = ceil(log_gamma(x)); bucket i covers
(gamma^(i-1), gamma^i] and is answered by 2*gamma^i/(gamma+1), whose
relative distance to anything in the bucket is <= alpha. Zeros and
negatives get their own stores ('0', '-' on |x|), so the full real line
is covered (paper §2.3).

Spark-first shape — this is the one sketch family in the library whose
ENTIRE lifecycle is JVM codegen, zero Python anywhere:

* build   = one ``groupBy(keys, store, bucket).count()`` — map-side
  partial aggregation caps the shuffle at (stores x buckets) rows per
  partition regardless of input size (~2k buckets spans 1e-9..1e9 at
  alpha=0.01);
* merge   = ``groupBy(...).sum(count)`` — counts add, so union is
  associative, commutative, and loss-free (the paper's "fully
  mergeable");
* collapse = two window functions (bound the bucket count to m by
  folding the lowest-magnitude buckets into the m-th, paper §2.2 —
  relative error is preserved for every quantile above the collapsed
  mass);
* quantile eval = a window cumulative sum + a broadcast probe join —
  rank r = floor(q*(n-1)), answer the first bucket whose cumulative
  count exceeds r.

Because build/merge are plain integer aggregation, two sketches built
at different parallelism levels are BIT-IDENTICAL — the property the
north rule's two-cluster-size criterion checks on the HLL path holds
here by construction.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "dd_bucket_col",
    "dd_by",
    "dd_merge",
    "dd_collapse",
    "dd_quantiles",
    "dd_quantiles_by",
    "dd_ranks",
    "dd_trimmed_mean",
    "dd_histogram",
]

_STORE_ORDER = {"-": -1, "0": 0, "+": 1}


def _gamma(alpha: float) -> float:
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket_col(col: Column, alpha: float) -> tuple[Column, Column]:
    """(store, bucket) expressions for one value column.

    store: '+' / '-' / '0'; bucket: ceil(log_gamma(|x|)) for nonzero x,
    0 for the zero store. Pure codegen: one log, one division, one ceil.
    """
    gamma = _gamma(alpha)
    store = (
        F.when(col > 0, F.lit("+"))
        .when(col < 0, F.lit("-"))
        .otherwise(F.lit("0"))
    )
    bucket = F.when(
        col != 0,
        F.ceil(F.log(F.abs(col)) / F.lit(math.log(gamma))),
    ).otherwise(F.lit(0).cast("long"))
    return store, bucket


def dd_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    alpha: float = 0.01,
    weight: str | Column | None = None,
) -> DataFrame:
    """One DDSketch per group: DataFrame[*keys, store, bucket, count].

    Long (bucket-row) format rather than a blob: the bucket table IS the
    mergeable state, and keeping it relational means merge, collapse and
    quantile evaluation all stay in Catalyst (and the state is readable
    by any SQL engine — the oracle recomputes it verbatim). NULLs are
    skipped, matching the null contract of sketch_by/cms_by.

    ``weight`` turns the sketch into a WEIGHTED quantile state: bucket
    mass = SUM(weight) instead of COUNT — "of all TOKENS, what document
    length did the median token see", not "of all documents". Same
    shuffle bound (stores × buckets rows per partition) and lossless
    merge; note the bit-identical-at-any-parallelism property is for
    INTEGER counts — double masses sum in partition order, so two
    builds can differ in the last ULP (quantile answers only change in
    the measure-zero event that q×total lands exactly on a cumulative
    boundary). Rows with NULL, NaN, or non-positive weight contribute
    nothing (a weight is a mass, not a signed delta — use the
    count-sketch family for turnstile semantics; NaN > 0 is TRUE in
    Spark SQL, so it is excluded explicitly). Evaluate with
    ``dd_quantiles(..., weighted=True)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    keys = list(keys)
    store, bucket = dd_bucket_col(c, alpha)
    base = df.filter(c.isNotNull())
    cols = [store.alias("store"), bucket.alias("bucket")]
    if weight is None:
        mass = F.count(F.lit(1))
    else:
        w = F.col(weight) if isinstance(weight, str) else weight
        wd = w.cast("double")
        base = base.filter((wd > 0) & ~F.isnan(wd))
        cols.append(wd.alias("__w"))
        mass = F.sum("__w")
    return (
        base.select(*keys, *cols)
        .groupBy(*keys, "store", "bucket")
        .agg(mass.alias("count"))
    )


def dd_merge(sketch_df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge sketches onto coarser keys (or global with keys=()) —
    bucket counts add, so the fold is lossless at any tree shape."""
    keys = list(keys)
    return sketch_df.groupBy(*keys, "store", "bucket").agg(
        F.sum("count").alias("count")
    )


def _order_cols() -> tuple[Column, Column]:
    """Global ascending value order over (store, bucket) rows: the '-'
    store descends in bucket (bigger |x| = smaller x), then zeros, then
    the '+' store ascends."""
    store_rank = (
        F.when(F.col("store") == "-", F.lit(-1))
        .when(F.col("store") == "0", F.lit(0))
        .otherwise(F.lit(1))
    )
    signed_bucket = F.when(
        F.col("store") == "-", -F.col("bucket")
    ).otherwise(F.col("bucket"))
    return store_rank, signed_bucket


def _rep_col(gamma: float) -> Column:
    """Bucket representative: 0 for the zero store, ±2γ^i/(γ+1)
    otherwise — within alpha of everything in the bucket. Shared by
    every reader so the convention cannot drift between them."""
    return (
        F.when(F.col("store") == "0", F.lit(0.0))
        .when(
            F.col("store") == "+",
            F.lit(2.0) * F.pow(F.lit(gamma), F.col("bucket")) / F.lit(gamma + 1.0),
        )
        .otherwise(
            F.lit(-2.0) * F.pow(F.lit(gamma), F.col("bucket")) / F.lit(gamma + 1.0)
        )
    )


def dd_collapse(
    sketch_df: DataFrame, keys: Sequence[str], max_buckets: int
) -> DataFrame:
    """Bound each group's positive/negative stores to ``max_buckets``
    buckets by folding the lowest-magnitude buckets into the lowest
    RETAINED one (paper §2.2: collapse smallest — high quantiles keep
    their full guarantee; collapsed mass answers with the boundary
    bucket's value). The zero store is a single bucket already.

    Two window functions per store — no Python, no extra shuffle beyond
    the window's hash partitioning on (keys, store)."""
    if max_buckets < 1:
        raise ValueError("max_buckets must be >= 1")
    keys = list(keys)
    w = Window.partitionBy(*keys, "store").orderBy(F.desc("bucket"))
    ranked = sketch_df.withColumn("__rk", F.dense_rank().over(w))
    kept_floor = F.min(
        F.when(F.col("__rk") <= max_buckets, F.col("bucket"))
    ).over(Window.partitionBy(*keys, "store"))
    folded = ranked.withColumn(
        "bucket",
        F.when(F.col("store") == "0", F.col("bucket")).otherwise(
            F.greatest(F.col("bucket"), kept_floor)
        ),
    ).drop("__rk")
    return folded.groupBy(*keys, "store", "bucket").agg(
        F.sum("count").alias("count")
    )


def dd_quantiles(
    sketch_df: DataFrame,
    qs: Sequence[float],
    keys: Sequence[str] = (),
    alpha: float = 0.01,
    weighted: bool = False,
) -> DataFrame:
    """Evaluate quantiles from bucket rows: DataFrame[*keys, q, est]
    (long format). ``alpha`` must match the build.

    rank(q) = floor(q*(n-1)); the answer is the first bucket, in global
    value order, whose cumulative count covers rank+1 items. Implemented
    as one cumulative-sum window + a broadcast probe of the (tiny) qs
    literal + a min-struct aggregate — all codegen, no Python.

    ``weighted=True`` (for states built with ``dd_by(..., weight=...)``)
    switches to the mass convention: the answer is the first bucket
    whose cumulative weight reaches ``q × total_weight`` — the integer
    rank formula is meaningless when counts are continuous masses.
    """
    gamma = _gamma(alpha)
    keys = list(keys)
    qs = [float(q) for q in qs]
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be within [0, 1], got {qs!r}")
    store_rank, signed_bucket = _order_cols()
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(store_rank, signed_bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    ranked = sketch_df.select(
        *keys,
        "store",
        "bucket",
        store_rank.alias("__sr"),
        signed_bucket.alias("__sb"),
        F.sum("count").over(w_cum).alias("__cum"),
        F.sum("count").over(w_all).alias("__n"),
    )
    spark = sketch_df.sparkSession
    probes = spark.createDataFrame([(q,) for q in qs], "q double")
    if weighted:
        # masses are doubles summed in two different orders (__cum is
        # the ordered running sum, __n the partition sum) — at q=1.0 a
        # last-ULP gap between them would drop the row, so the last
        # bucket (running max of a positive-mass cumsum) always covers
        maxcum = F.max(F.col("__cum")).over(Window.partitionBy(*keys))
        ranked = ranked.withColumn("__maxcum", maxcum)
        covers = (F.col("__cum") >= F.col("q") * F.col("__n")) | (
            (F.col("q") >= 1.0) & (F.col("__cum") == F.col("__maxcum"))
        )
    else:
        covers = (
            F.col("__cum")
            >= F.floor(F.col("q") * (F.col("__n") - 1)).cast("long") + 1
        )
    hits = ranked.join(F.broadcast(probes)).filter(covers)
    return (
        hits.withColumn("__est", _rep_col(gamma))
        .groupBy(*keys, "q")
        .agg(
            F.min_by(
                F.col("__est"), F.struct(F.col("__sr"), F.col("__sb"))
            ).alias("est")
        )
    )


def dd_ranks(
    sketch_df: DataFrame,
    values: Sequence[float],
    keys: Sequence[str] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """The inverse read — CDF probes from the bucket table:
    DataFrame[*keys, value, rank] where ``rank`` is the estimated
    fraction of mass ≤ value ("what share of turns finished under
    500 ms"). Convention: the probe's own bucket counts as ≤ (every
    item there is within ``alpha`` of the probe in value, so the rank
    error is at most that bucket's mass — the value-domain analogue of
    quantiles.py::sketch_ranks' rank guarantee).

    The probe's (store, bucket) is computed with the SAME Catalyst
    expressions as the build (dd_bucket_col on a literal frame), so
    probe bucketing can never drift from data bucketing. Works
    unchanged on weighted states — ``rank`` is then a mass fraction.
    All codegen: one window pass + a broadcast probe join.
    """
    keys = list(keys)
    values = [float(v) for v in values]
    if not values:
        raise ValueError("no probe values")
    store_rank, signed_bucket = _order_cols()
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(store_rank, signed_bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = sketch_df.select(
        *keys,
        store_rank.alias("__sr"),
        signed_bucket.alias("__sb"),
        F.sum("count").over(w_cum).alias("__cum"),
    )
    spark = sketch_df.sparkSession
    pstore, pbucket = dd_bucket_col(F.col("value"), alpha)
    probes = spark.createDataFrame([(v,) for v in values], "value double").select(
        "value",
        F.when(pstore == "-", F.lit(-1))
        .when(pstore == "0", F.lit(0))
        .otherwise(F.lit(1))
        .alias("__psr"),
        F.when(pstore == "-", -pbucket).otherwise(pbucket).alias("__psb"),
    )
    le = (
        ranked.join(
            F.broadcast(probes),
            (F.col("__sr") < F.col("__psr"))
            | ((F.col("__sr") == F.col("__psr")) & (F.col("__sb") <= F.col("__psb"))),
        )
        .groupBy(*keys, "value")
        .agg(F.max("__cum").alias("__le"))
    )
    totals = sketch_df.groupBy(*keys).agg(F.sum("count").alias("__n"))
    out = totals.join(F.broadcast(probes.select("value"))).join(
        le, [*keys, "value"], "left"
    )
    return out.select(
        *keys,
        "value",
        (F.coalesce(F.col("__le"), F.lit(0)) / F.col("__n")).alias("rank"),
    )


def dd_trimmed_mean(
    sketch_df: DataFrame,
    lo: float = 0.05,
    hi: float = 0.95,
    keys: Sequence[str] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """Robust mean of the mass between rank fractions ``lo`` and
    ``hi``: DataFrame[*keys, trimmed_mean] — the outlier-proof center
    a plain AVG can't give on heavy-tailed latencies, read straight
    from the stored bucket table without touching raw rows.

    Per bucket, the portion inside the [lo·n, hi·n] mass band is
    ``max(0, min(cum, hi·n) − max(cum − count, lo·n))``; the estimate
    is the mass-weighted average of bucket representatives over those
    portions (each representative within ``alpha`` of everything in
    its bucket, so the trimmed mean inherits the relative bound up to
    edge-bucket granularity). ``lo=0, hi=1`` degrades to the sketch's
    full mean. Weighted states work unchanged. One window pass + one
    aggregate, zero Python.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    gamma = _gamma(alpha)
    keys = list(keys)
    store_rank, signed_bucket = _order_cols()
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(store_rank, signed_bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    rows = sketch_df.select(
        *keys,
        "store",
        "bucket",
        F.col("count").alias("__c"),
        F.sum("count").over(w_cum).alias("__cum"),
        F.sum("count").over(w_all).alias("__n"),
    )
    amount = F.greatest(
        F.lit(0.0),
        F.least(F.col("__cum").cast("double"), F.lit(hi) * F.col("__n"))
        - F.greatest(
            (F.col("__cum") - F.col("__c")).cast("double"),
            F.lit(lo) * F.col("__n"),
        ),
    )
    return (
        rows.withColumn("__amt", amount)
        .withColumn("__est", _rep_col(gamma))
        .groupBy(*keys)
        .agg(
            (F.sum(F.col("__est") * F.col("__amt")) / F.sum("__amt")).alias(
                "trimmed_mean"
            )
        )
    )


def dd_histogram(
    sketch_df: DataFrame,
    keys: Sequence[str] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """The bucket table as a human-readable histogram:
    DataFrame[*keys, lo, hi, count, frac] ordered by value — what a
    dashboard plots straight from the stored state, no raw re-scan.
    Positive bucket i covers (γ^(i-1), γ^i]; negatives mirror with
    (−γ^i, −γ^(i-1)]; the zero store is the degenerate [0, 0] bar.
    ``frac`` is the bucket's share of the group mass (works on
    weighted states too). Pure codegen: one window for the totals.
    """
    gamma = _gamma(alpha)
    keys = list(keys)
    store_rank, signed_bucket = _order_cols()
    w_all = Window.partitionBy(*keys)
    pos_lo = F.pow(F.lit(gamma), F.col("bucket") - 1)
    pos_hi = F.pow(F.lit(gamma), F.col("bucket"))
    lo = (
        F.when(F.col("store") == "0", F.lit(0.0))
        .when(F.col("store") == "+", pos_lo)
        .otherwise(-pos_hi)
    )
    hi = (
        F.when(F.col("store") == "0", F.lit(0.0))
        .when(F.col("store") == "+", pos_hi)
        .otherwise(-pos_lo)
    )
    return (
        sketch_df.select(
            *keys,
            lo.alias("lo"),
            hi.alias("hi"),
            "count",
            (F.col("count") / F.sum("count").over(w_all)).alias("frac"),
            store_rank.alias("__sr"),
            signed_bucket.alias("__sb"),
        )
        .orderBy(*keys, "__sr", "__sb")
        .drop("__sr", "__sb")
    )


def dd_quantiles_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
    max_buckets: int | None = None,
    weight: str | Column | None = None,
) -> DataFrame:
    """End-to-end grouped relative-error quantiles: build, optionally
    collapse to ``max_buckets``, evaluate. One shuffle for the build,
    one window pass for the eval. ``weight`` gives mass-weighted
    quantiles ("half of all tokens live in docs longer than X")."""
    sk = dd_by(df, keys, col, alpha, weight=weight)
    if max_buckets is not None:
        sk = dd_collapse(sk, keys, max_buckets)
    return dd_quantiles(sk, qs, keys, alpha, weighted=weight is not None)
