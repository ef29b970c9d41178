"""One-pass-per-stage table profiling: the data-quality report every
ingest runs before training (row/null counts, value ranges, distinct
cardinality estimates per column).

Two bounded passes over the table, regardless of column count:

1. ONE aggregate computes count / non-null count / min / max for every
   profiled column simultaneously (Catalyst partial aggregation — a
   single scan, one 1-row result);
2. ONE ``multi_sketch_by`` pass builds an HLL sketch per column from a
   single scan (tagged (col, idx, rho) explode; shuffle bounded by
   |columns| × 2^p rows — `operators/hll_agg.py`).

N columns cost two reads total, not 2·N. Estimates carry the standard
1.04/√2^p bound; the ``table_profile`` gate asserts it per column
against exact distinct counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import AtomicType

from hyper_spark.operators.hll_agg import cardinality_col, multi_sketch_by

__all__ = [
    "profile_table",
    "category_stats",
    "cooccurrence",
    "vocab_stats",
    "vocab_drift",
    "vocab_divergence",
    "numeric_drift",
]


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    p: int = 14,
    hash_fn: str = "sha1",
) -> DataFrame:
    """Per-column profile: DataFrame[column, n_rows, n_nulls, null_frac,
    approx_distinct, min_value, max_value] — min/max rendered as strings
    so heterogeneous column types share one schema.

    ``columns`` defaults to every atomic-typed column (arrays, maps,
    structs are skipped — profile their exploded projections
    explicitly). Estimates are deterministic (sketch-based), so the
    output is stable across runs and partitionings.
    """
    if columns is None:
        columns = [
            f.name for f in df.schema.fields if isinstance(f.dataType, AtomicType)
        ]
    columns = list(columns)
    if not columns:
        raise ValueError("no atomic columns to profile")
    spark = df.sparkSession

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    stats = df.agg(*aggs).collect()[0]  # one row — driver assembly is tiny

    sketches = multi_sketch_by(df, [], {c: c for c in columns}, p, hash_fn)
    ests = {
        r["metric"]: r["est"]
        for r in sketches.select(
            "metric", cardinality_col("p", "registers").alias("est")
        ).collect()
    }

    n = stats["__n"]
    rows = []
    for c in columns:
        nn = stats[f"__nn_{c}"]
        rows.append(
            (
                c,
                n,
                n - nn,
                float((n - nn) / n) if n else 0.0,
                float(ests.get(c, 0.0)),
                stats[f"__min_{c}"],
                stats[f"__max_{c}"],
            )
        )
    return spark.createDataFrame(
        rows,
        "column string, n_rows bigint, n_nulls bigint, null_frac double, "
        "approx_distinct double, min_value string, max_value string",
    )


def category_stats(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
) -> DataFrame:
    """Exact categorical-distribution summary per group: how
    concentrated / diverse a category column is — the balance check a
    corpus pipeline runs on domains, languages, tool usage, or label
    columns before training.

    Output: DataFrame[*keys, n bigint, n_distinct bigint,
    entropy_bits double, gini_impurity double, top_share double] where
    over each group's non-NULL values with per-value counts c_i and
    total N:

    - ``entropy_bits`` = −Σ (c_i/N)·log2(c_i/N), computed as
      log2(N) − (Σ c_i·log2(c_i))/N (one aggregate, no per-row p);
      0 for a single-valued group, log2(n_distinct) when uniform.
    - ``gini_impurity`` = 1 − Σ (c_i/N)² — 0 pure, →1 diverse.
    - ``top_share`` = max(c_i)/N, the majority-class share.

    NULL values are excluded (profile NULL mass with
    ``profile_table``); groups with no non-NULL values don't appear
    (with ``keys=[]`` an empty input yields Spark's usual one-row
    global aggregate: n NULL, n_distinct 0).

    Scale shape: groupBy(keys, value) with map-side partial counts
    (shuffle = |keys × vocabulary| partial rows, never raw rows), then
    a second aggregate over those counts keyed by ``keys`` alone —
    both stages whole-stage-codegen, no windows, no Python. Counts are
    squared as doubles so a 10^10-row hot value cannot overflow the
    Σ c_i² term (the ~1e-16 relative error is invisible in a ratio).
    """
    keys = list(keys)
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, F.col(col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    c = F.col("__c").cast("double")
    n = F.sum("__c")
    nd = n.cast("double")  # n*n as bigint would overflow past ~3e9 rows
    return counts.groupBy(*keys).agg(
        n.cast("bigint").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.log2(n) - F.sum(c * F.log2(c)) / n).alias("entropy_bits"),
        (F.lit(1.0) - F.sum(c * c) / (nd * nd)).alias("gini_impurity"),
        (F.max("__c") / n).alias("top_share"),
    )


def cooccurrence(
    df: DataFrame,
    key: str,
    value: str,
    min_count: int = 1,
    max_per_key: int | None = None,
) -> DataFrame:
    """Which categories appear TOGETHER: for every unordered pair of
    distinct ``value``s sharing a ``key`` (tools used in the same
    conversation, domains in the same crawl batch), the key count and
    association strength.

    Output: DataFrame[v1, v2, n_pair bigint, n_v1 bigint, n_v2 bigint,
    lift double, pmi_bits double] with v1 < v2 (string order),
    ``n_pair`` = keys containing both, ``n_vX`` = keys containing that
    value at all, lift = n_pair·n_keys/(n_v1·n_v2) (1 = independent),
    pmi_bits = log2(lift). Pairs below ``min_count`` are dropped.
    NULL keys/values are excluded.

    ``transitions`` (temporal.py) answers "what comes NEXT from each
    state"; this answers "what coexists at all" — order-free, so it
    catches associations sequencing hides (two tools always used in
    the same conversations but never adjacently).

    Skew control — the 100 TB hazard is quadratic per-key blowup: a
    key with d distinct values contributes d·(d−1)/2 pairs, so one
    megakey (a crawl batch touching every domain) floods the pair
    shuffle. ``max_per_key`` EXCLUDES keys with more distinct values
    than the cap from pair counting entirely (their values still count
    toward n_vX and n_keys); exclusion is exact, deterministic, and
    the honest semantics — sampling a megakey's pairs would bias lift
    downward for everything it touches. Set it to the d where d²/2
    pairs per key stops being acceptable (e.g. 10^3 → ≤ 500k pairs).
    (The megakey's distinct SET is still collected before the size
    filter drops it — per-key distinct values must fit a task, the
    same per-key-state constraint as sessionize's plain path.)

    Plan shape: ONE wide shuffle — groupBy(key).collect_set(value)
    deduplicates and groups in the same exchange (map-side partial
    sets) — then pairs are generated JVM-SIDE by exploding the sorted
    set's i<j combinations (arrays are ≤ max_per_key long, so the
    nested-lambda CodegenFallback cost is bounded), a groupBy on the
    pair [≤ |vocab|² rows], and per-value counts from a second explode
    of the SAME tiny per-key set table. Totals ride a broadcast 1-row
    join; no driver action, no self-join (a first-cut distinct +
    equi-join version measured 47 s on 74.5M transcript turns; this
    plan: one pass).
    """
    if max_per_key is not None and max_per_key < 2:
        raise ValueError("max_per_key must be >= 2")
    sets = (
        df.filter(F.col(key).isNotNull() & F.col(value).isNotNull())
        .groupBy(F.col(key).alias("__k"))
        .agg(F.sort_array(F.collect_set(F.col(value).cast("string"))).alias("__vs"))
        .select("__vs")
    )
    n_keys_df = sets.agg(F.count(F.lit(1)).alias("__nk"))
    val_counts = (
        sets.select(F.explode("__vs").alias("__v"))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__nv"))
    )
    paired_sets = sets
    if max_per_key is not None:
        paired_sets = sets.filter(F.size("__vs") <= max_per_key)
    vs = F.col("__vs")
    # i<j combinations of the sorted set, all in one generator column:
    # slice(vs, i+2, ...) pairs each element with its strict successors,
    # so v1 < v2 by construction (string sort order)
    pair_arr = F.flatten(
        F.transform(
            vs,
            lambda x, i: F.transform(
                F.slice(vs, i + F.lit(2), F.size(vs) - i - 1),
                lambda y: F.struct(x.alias("v1"), y.alias("v2")),
            ),
        )
    )
    pairs = (
        paired_sets.select(F.explode(pair_arr).alias("__p"))
        .select(F.col("__p.v1").alias("v1"), F.col("__p.v2").alias("v2"))
        .groupBy("v1", "v2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    out = (
        pairs.join(val_counts.withColumnRenamed("__v", "v1"), on="v1")
        .withColumnRenamed("__nv", "n_v1")
        .join(val_counts.withColumnRenamed("__v", "v2"), on="v2")
        .withColumnRenamed("__nv", "n_v2")
        .crossJoin(F.broadcast(n_keys_df))
    )
    lift = (
        F.col("n_pair").cast("double")
        * F.col("__nk").cast("double")
        / (F.col("n_v1").cast("double") * F.col("n_v2").cast("double"))
    )
    return out.select(
        "v1",
        "v2",
        "n_pair",
        "n_v1",
        "n_v2",
        lift.alias("lift"),
        F.log2(lift).alias("pmi_bits"),
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    normalized: bool = True,
) -> DataFrame:
    """Exact corpus token-frequency table: the top-``top_k`` tokens by
    count with corpus coverage — what tokenizer training and corpus
    drift checks read first.

    Returns DataFrame[rank, token, count, frac, cum_frac] ordered by
    (count desc, token asc); ``frac`` = count / total token
    occurrences, ``cum_frac`` the running coverage of the top-rank
    prefix. ``normalized=True`` tokenizes `normalized_text` (the
    dedup-consistent stream); ``False`` splits the raw text on
    whitespace runs.

    Scale shape: explode tokens → ONE partial-aggregated groupBy
    (shuffle = |vocab| partial counts, not |tokens| rows) → global
    top-k via a single ordered limit (Spark's TakeOrderedAndProject —
    no full sort materialization); the total-occurrence count is a
    second aggregate over the SAME shuffled vocab exchange — AQE's
    runtime ReusedExchange serves it from the existing shuffle files
    (test-asserted), so the corpus is scanned and exploded once. The
    final window for cum_frac runs over top_k rows only.
    """
    from pyspark.sql import Window

    from hyper_spark.functions.text import word_tokens_col

    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    toks = (
        word_tokens_col(F.col(text_col))
        if normalized
        else F.split(F.trim(F.col(text_col)), r"\s+")
    )
    exploded = df.select(F.explode(toks).alias("token"))
    counts = exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("count")
    )
    # one tiny second aggregate over |vocab| rows (already shuffled
    # data, no second scan of the corpus)
    total = counts.agg(F.sum("count").alias("__t"))
    top = (
        counts.orderBy(F.col("count").desc(), F.col("token").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.col("count").desc(), F.col("token").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.col("count").desc(), F.col("token").asc()))
        .cast("bigint")
        .alias("rank"),
        "token",
        F.col("count").cast("bigint").alias("count"),
        (F.col("count") / F.col("__t")).alias("frac"),
        (F.sum("count").over(w) / F.col("__t")).alias("cum_frac"),
    )


def _token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(token, c) exact counts over the normalized token stream —
    shuffle = |vocab| partial counts (shared by the drift ops)."""
    from hyper_spark.functions.text import word_tokens_col

    toks = F.filter(word_tokens_col(F.col(text_col)), lambda t: t != F.lit(""))
    return (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _joined_fracs(a: DataFrame, b: DataFrame, text_col: str) -> DataFrame:
    """Full-outer join of the two corpora's token tables with
    per-corpus fractions: (token, c_a, c_b, frac_a, frac_b). Each
    grand total rides its own vocab exchange (AQE ReusedExchange);
    the join shuffles |vocab| rows, never raw tokens."""
    ca, cb = _token_counts(a, text_col), _token_counts(b, text_col)
    ta = ca.agg(F.sum("c").alias("__ta"))
    tb = cb.agg(F.sum("c").alias("__tb"))
    return (
        ca.withColumnRenamed("c", "c_a")
        .join(cb.withColumnRenamed("c", "c_b"), ["token"], "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            "token",
            F.coalesce("c_a", F.lit(0)).cast("bigint").alias("c_a"),
            F.coalesce("c_b", F.lit(0)).cast("bigint").alias("c_b"),
            (F.coalesce("c_a", F.lit(0)) / F.col("__ta")).alias("frac_a"),
            (F.coalesce("c_b", F.lit(0)) / F.col("__tb")).alias("frac_b"),
        )
    )


def vocab_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` token movers between two corpus snapshots:
    DataFrame[token, c_a, c_b, frac_a, frac_b, delta] ordered by
    |frac_b - frac_a| descending (ties to the token) — the
    "what changed in my crawl this week" report. Plan: two vocab
    aggregates + one |vocab|-row full-outer join + an ordered limit;
    raw tokens never shuffle."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    j = _joined_fracs(a, b, text_col)
    delta = (F.col("frac_b") - F.col("frac_a")).alias("delta")
    return (
        j.select("token", "c_a", "c_b", "frac_a", "frac_b", delta)
        .orderBy(F.abs(F.col("delta")).desc(), F.col("token").asc())
        .limit(top_k)
    )


def vocab_divergence(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus drift summary:
    DataFrame[jsd_bits, vocab_a, vocab_b, shared_vocab, total_a,
    total_b]. ``jsd_bits`` is the Jensen-Shannon divergence (log2;
    0 = identical distributions, 1 = disjoint) between the two token
    distributions over the union vocabulary — JSD needs no smoothing:
    a token absent from one side contributes only the other side's
    term, and the mixture M is positive everywhere on the union.
    If either corpus has NO tokens the distributions are undefined and
    ``jsd_bits`` is NULL (the SQL oracle agrees: division by a NULL
    total propagates). Same bounded plan shape as ``vocab_drift``."""
    j = _joined_fracs(a, b, text_col)
    m = (F.col("frac_a") + F.col("frac_b")) / 2
    term = lambda f: F.when(  # noqa: E731 — local expression builder
        F.col(f) > 0, F.col(f) * F.log2(F.col(f) / m)
    ).otherwise(F.lit(0.0))
    return j.agg(
        (F.sum(term("frac_a") + term("frac_b")) / 2).alias("jsd_bits"),
        F.sum((F.col("c_a") > 0).cast("bigint")).alias("vocab_a"),
        F.sum((F.col("c_b") > 0).cast("bigint")).alias("vocab_b"),
        F.sum(((F.col("c_a") > 0) & (F.col("c_b") > 0)).cast("bigint")).alias(
            "shared_vocab"
        ),
        F.sum("c_a").alias("total_a"),
        F.sum("c_b").alias("total_b"),
    )


def numeric_drift(
    a: DataFrame,
    b: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the numeric sibling of ``vocab_drift``: the feature-drift
    check every serving/training pipeline runs between corpus
    versions.

    Both sides are histogrammed over SHARED equi-width bins (edges
    from the combined [min, max] unless ``lo``/``hi`` pin them;
    out-of-range values clamp into the edge bins, the standard PSI
    convention; NULLs are excluded — profile them with
    ``profile_table``). Output: one row per bin,
    DataFrame[bin, bin_lo, bin_hi, n_a, n_b, frac_a, frac_b,
    psi_term] with psi_term = (f_b − f_a)·ln(f_b/f_a) under add-half
    Laplace smoothing ((n + 0.5)/(N + 0.5·bins)) so empty bins are
    deterministic, never ±inf. Σ psi_term is the PSI; the usual
    reading: <0.1 stable, 0.1–0.25 moderate shift, >0.25 investigate.

    Scale: one tiny min/max agg per unpinned bound, then ONE bucketed
    aggregate per side (map-side partial; shuffle = ``bins`` rows) and
    a ``bins``-row join. The raw column crosses the network never.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    ca, cb = F.col(col).cast("double"), F.col(col).cast("double")
    if lo is None or hi is None:
        stats_a = a.agg(F.min(ca).alias("lo"), F.max(ca).alias("hi")).collect()[0]
        stats_b = b.agg(F.min(cb).alias("lo"), F.max(cb).alias("hi")).collect()[0]
        los = [s["lo"] for s in (stats_a, stats_b) if s["lo"] is not None]
        his = [s["hi"] for s in (stats_a, stats_b) if s["hi"] is not None]
        if not los:
            raise ValueError(f"no non-NULL values in {col!r} on either side")
        lo = min(los) if lo is None else lo
        hi = max(his) if hi is None else hi
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        raise ValueError(f"degenerate range [{lo}, {hi}]")
    width = (hi - lo) / bins

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        c = F.col(col).cast("double")
        bucket = F.when(c <= lo, 0).when(c >= hi, bins - 1).otherwise(
            F.floor((c - F.lit(lo)) / F.lit(width)).cast("int")
        )
        return (
            df.filter(c.isNotNull())
            .select(bucket.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    spark = a.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    j = (
        grid.join(bucketed(a, "n_a"), on="bin", how="left")
        .join(bucketed(b, "n_b"), on="bin", how="left")
        .select(
            "bin",
            F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
        )
    )
    tot = j.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")).collect()[0]
    ta, tb = int(tot["ta"] or 0), int(tot["tb"] or 0)
    fa = (F.col("n_a") + F.lit(0.5)) / F.lit(ta + 0.5 * bins)
    fb = (F.col("n_b") + F.lit(0.5)) / F.lit(tb + 0.5 * bins)
    return j.select(
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
        (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
        "n_a",
        "n_b",
        fa.alias("frac_a"),
        fb.alias("frac_b"),
        ((fb - fa) * F.log(fb / fa)).alias("psi_term"),
    )
