"""Misra-Gries / frequent-items summaries: DETERMINISTIC heavy
hitters with per-item lower AND upper count bounds from one bounded
mergeable state.

Why this exists next to the count-min family: `heavy_hitters` gives
randomized over-estimates (CMS never under-counts but inflates by
collision noise with probability delta), and its exact-guarantee mode
pays a second scan. The Misra-Gries summary (Misra & Gries 1982;
merge rule from Agarwal, Cormode, Huang, Phillips, Wei, Yi,
"Mergeable Summaries", PODS 2012 §3 — the same paper the reference's
HLL merge contract leans on) is the deterministic complement: k
counters guarantee, with NO randomness and NO second scan,

    c(v) <= f(v) <= c(v) + err,       err <= n / (k + 1),

for EVERY item v (absent items have f(v) <= err), and every item with
f(v) > err is guaranteed retained. This is the Apache DataSketches
"Frequent Items" sketch's contract, built Spark-first.

Representation — RELATIONAL (the sliding/tuple-family doctrine):
state rows ``(*keys, item:string, c:double, k)`` — at most k counter
rows per group plus ONE sentinel row (``item IS NULL``) whose ``c``
is the group's EXACT total counted weight n. The sentinel makes the
whole algebra relational: total weight is additive, so shard merges
are ``groupBy(keys, item).sum(c)`` — the sentinel sums like any
counter — followed by the relational compress step below; and the
error bound is DERIVED from the state alone,

    err = (n - sum(retained c)) / (k + 1),

because every decrement step (batch compress or merge compress) that
subtracts d from the counters removes at least (k+1)*d of accounted
mass: at least k+1 items have count >= d at that moment (d is the
(k+1)-th largest), and each loses exactly min(c, d) = d of retained
mass. So the residual n - sum(c) always dominates (k+1) * (total
subtracted), and the classical per-item error (<= total subtracted)
is bounded by the derived err. No separate error column to carry.

Batch-compress equivalence (what makes the build vectorizable): the
MG summary of a COUNTED batch is "subtract the (k+1)-th largest
count from every counter, keep positives" — order-free, one sort per
group, no per-row stream loop. Arrow batches accumulate into exact
per-partition counter tables that compress whenever they exceed
4k per group, so partial state is O(k) per (partition, group) and
the build never shuffles raw items: one mapInPandas stage emits
<= (k+1) rows per group per partition, then one relational
merge-compress produces the final state. Shuffle volume is
O(groups x partitions x k) — never O(distinct items), which is the
entire point at 10^12 turns.

Merge contract: the CMS counter doctrine — shards must partition the
underlying ROWS (self-merge double counts). Merging is associative
bound-wise: any merge tree yields a state satisfying the same
c/err contract with n = total weight (PODS'12 Thm 1); counter VALUES
near the retention boundary may differ by tree shape, the contract
is the guarantee, not bit equality (asserted in tests). In the exact
regime (global distinct items <= k) no compress ever fires, counters
are exact, err = 0, and any merge order is bit-identical — that is
the SQL-replayable regime the correctness gates pin.

Weighted mode: ``weight_col`` generalizes to nonnegative weights
(batch MG subtracts the (k+1)-th largest weighted count; the bound
argument is weight-for-weight identical). Negative weights are the
caller's contract violation — the turnstile case belongs to
count-sketch (countsketch.py), not MG.

NULL items are skipped (the sketch_by contract); NULL weights count
as 0. ``item`` is stored as its string form so one state schema
serves every input type and the exact-regime oracle replays it in
ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = ["mg_by", "mg_merge", "mg_summary", "mg_topk"]


def _compress_pdf(df: pd.DataFrame, keys: list[str], k: int) -> pd.DataFrame:
    """Batch MG compress: per group, subtract the (k+1)-th largest
    count from every counter and keep the positives (<= k survive)."""
    if keys:
        r = df.groupby(keys, sort=False, dropna=False)["__c"].rank(
            method="first", ascending=False
        )
        d = (
            df["__c"]
            .where(r == k + 1, 0.0)
            .groupby([df[c] for c in keys], sort=False, dropna=False)
            .transform("max")
        )
    else:
        r = df["__c"].rank(method="first", ascending=False)
        d = df["__c"].where(r == k + 1, 0.0).max()
    out = df.assign(__c=df["__c"] - d)
    return out[(r <= k) & (out["__c"] > 0)]


def mg_by(
    df: DataFrame,
    keys: Sequence[str],
    item_col: str | Column,
    k: int = 256,
    weight_col: str | Column | None = None,
) -> DataFrame:
    """Build per-group Misra-Gries states: DataFrame[*keys,
    item:string, c:double, k] — at most k counter rows per group plus
    the ``item IS NULL`` sentinel carrying the exact total weight n.
    Guarantee read off any state: c <= f <= c + err with
    err = (n - sum c)/(k+1) <= n/(k+1); every item with f > err is
    present. One Python stage (the Arrow-vectorized partition-local
    partial — it IS the mergeable partial aggregate), then a pure-JVM
    merge-compress; raw items never shuffle."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = list(keys)
    itemc = F.col(item_col) if isinstance(item_col, str) else item_col
    if weight_col is None:
        w = F.lit(1.0)
    else:
        wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
        w = F.coalesce(wc.cast("double"), F.lit(0.0))
    prepared = df.select(
        *keys, itemc.cast("string").alias("__item"), w.alias("__w")
    ).filter(F.col("__item").isNotNull())

    key_fields = [prepared.schema[c] for c in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("item", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    cap = 4 * k
    gb_item = [*keys, "__item"]

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None  # (keys..., __item) -> count
        totals: pd.Series | None = None  # (keys...) -> n  (scalar if no keys)
        n_groups = 1
        for pdf in batches:
            if pdf.empty:
                continue
            part = pdf.groupby(gb_item, sort=False, dropna=False)["__w"].sum()
            acc = part if acc is None else acc.add(part, fill_value=0.0)
            if keys:
                t = pdf.groupby(keys, sort=False, dropna=False)["__w"].sum()
                totals = t if totals is None else totals.add(t, fill_value=0.0)
                n_groups = len(totals)
            else:
                t = float(pdf["__w"].sum())
                totals = t if totals is None else totals + t
            if len(acc) > cap * n_groups:
                flat = acc.rename("__c").reset_index()
                flat = _compress_pdf(flat, keys, k)
                acc = flat.set_index(gb_item)["__c"]
        if acc is None:
            return
        flat = _compress_pdf(acc.rename("__c").reset_index(), keys, k)
        flat = flat.rename(columns={"__item": "item", "__c": "c"})
        if keys:
            sent = totals.rename("c").reset_index()
            sent["item"] = None
        else:
            sent = pd.DataFrame({"item": [None], "c": [totals]})
        yield pd.concat(
            [flat[[*keys, "item", "c"]], sent[[*keys, "item", "c"]]],
            ignore_index=True,
        )

    partials = prepared.mapInPandas(partial, schema=out_schema)
    return _merge_compress(partials, keys, k)


def _merge_compress(rows: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Pointwise counter add (sentinels sum like counters) + the
    relational compress: rank counts per group, subtract the (k+1)-th
    largest, keep positives. Pure JVM."""
    combined = rows.groupBy(*keys, "item").agg(F.sum("c").alias("c"))
    w = (
        Window.partitionBy(*keys)
        if keys
        else Window.partitionBy(F.lit(1))
    )
    is_sent = F.col("item").isNull()
    # ONE window pass over one subtree (a filter/union split would
    # recompute the whole upstream — including the partial-aggregate
    # Python stage — once per branch): sentinels order LAST so item
    # ranks are unaffected, and a sentinel landing at rank k+1 yields
    # d = 0 via the not-null guard.
    ranked = combined.withColumn(
        "__r",
        F.row_number().over(
            w.orderBy(
                is_sent.cast("int").asc(), F.desc("c"), F.asc("item")
            )
        ),
    ).withColumn(
        "__d",
        F.max(
            F.when(
                (F.col("__r") == k + 1) & ~is_sent, F.col("c")
            ).otherwise(0.0)
        ).over(w),
    )
    kept = ranked.filter(
        is_sent | ((F.col("__r") <= k) & (F.col("c") - F.col("__d") > 0))
    )
    return kept.select(
        *keys,
        "item",
        F.when(is_sent, F.col("c"))
        .otherwise(F.col("c") - F.col("__d"))
        .alias("c"),
        F.lit(k).alias("k"),
    )


def _meta_k(state: DataFrame) -> int:
    ks = state.select("k").distinct().take(2)
    if not ks:
        raise ValueError("empty Misra-Gries state")
    if len(ks) > 1:
        raise ValueError("mixed-k Misra-Gries states")
    return int(ks[0]["k"])


def mg_merge(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Merge shard/checkpoint states (rows must partition the
    underlying data; self-merge double counts). ``keys`` may be a
    SUBSET of the build keys — a rollup: finer groups fold together
    first, then compress, the bound holding with n summed across the
    folded groups. Exact regime (combined distinct <= k) is lossless
    and bit-identical to the direct build."""
    if not states:
        raise ValueError("no states to merge")
    keys = list(keys)
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    k = _meta_k(u)
    return _merge_compress(u.select(*keys, "item", "c"), keys, k)


def mg_summary(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Per-group accounting: DataFrame[*keys, n, n_items, err, exact].
    ``err`` is the derived deterministic bound (n - sum c)/(k+1):
    every count is within [c, c+err], absent items have f <= err,
    ``exact`` means no compress ever fired (err == 0)."""
    keys = list(keys)
    k = _meta_k(state)
    agg = state.groupBy(*keys).agg(
        F.max(F.when(F.col("item").isNull(), F.col("c"))).alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("item").isNotNull(), F.col("c"))), F.lit(0.0)
        ).alias("__retained"),
        F.sum(F.col("item").isNotNull().cast("long")).alias("n_items"),
    )
    err = F.greatest(
        (F.col("n") - F.col("__retained")) / F.lit(float(k + 1)), F.lit(0.0)
    )
    return agg.select(
        *keys,
        "n",
        "n_items",
        err.alias("err"),
        (err == 0.0).alias("exact"),
    )


def mg_topk(
    state: DataFrame,
    keys: Sequence[str],
    limit: int | None = None,
    min_count: float | None = None,
) -> DataFrame:
    """Read the state: DataFrame[*keys, item, count_lo, count_hi, n,
    exact, guaranteed?] ordered by count_lo descending per group.
    ``count_lo <= f(item) <= count_hi`` deterministically. With
    ``min_count``, rows where even count_hi falls short are dropped
    and ``guaranteed`` marks count_lo >= min_count (no false
    negatives among f >= min_count + err). One aggregate + one
    broadcast join over <= k rows/group, pure JVM."""
    keys = list(keys)
    bounds = mg_summary(state, keys)
    items = state.filter(F.col("item").isNotNull()).join(
        F.broadcast(bounds), keys if keys else None, "inner"
        if keys
        else "cross",
    )
    out = items.select(
        *keys,
        "item",
        F.col("c").alias("count_lo"),
        (F.col("c") + F.col("err")).alias("count_hi"),
        "n",
        "exact",
    )
    if min_count is not None:
        mc = F.lit(float(min_count))
        out = out.filter(F.col("count_hi") >= mc).withColumn(
            "guaranteed", F.col("count_lo") >= mc
        )
    if limit is not None:
        w = (
            Window.partitionBy(*keys)
            if keys
            else Window.partitionBy(F.lit(1))
        ).orderBy(F.desc("count_lo"), F.asc("item"))
        out = (
            out.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= limit)
            .drop("__r")
        )
    return out
