"""Deterministic sampling and dataset splitting for training pipelines.

The reference (GameAnalytics/hyper) has no sampling surface; these are the
"beyond the reference" training-data operators. Everything here is
*deterministic by construction* — membership is a pure function of
(key, seed), never of partitioning, task order, or a RNG stream — which is
what a 100 TB pipeline actually needs:

- re-running the job (or one failed task) yields the identical split;
- the same document lands in the same split across corpus versions, so
  train/test contamination can't creep in when data is re-ingested;
- any engine (here: the DuckDB oracle) can reproduce membership row-by-row.

Mechanics: a row's "coin flip" is the first 8 hex chars of
``md5(key || ':' || seed)`` — a uniform 32-bit value compared *as a
fixed-width hex string* against precomputed thresholds, so the whole
predicate is native Catalyst (md5/substring/comparison, whole-stage
codegen) and pushes through scans as an ordinary filter. No shuffle is
introduced by ``hash_split`` / ``hash_sample``; ``deterministic_sample``
is sort+limit (TakeOrdered) globally or one window shuffle per group.
"""

from __future__ import annotations

import functools
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "split_hash_col",
    "uniform_draw_col",
    "hash_split",
    "hash_sample",
    "deterministic_sample",
    "distinct_sample",
    "distinct_sample_by",
]

_HASH_BITS = 32
_HASH_SPACE = 1 << _HASH_BITS


def split_hash_col(key: str | Column, seed: str | int = 0) -> Column:
    """Uniform 32-bit draw for a row, as an 8-char lowercase hex string.

    ``md5(cast(key as string) || ':' || seed)`` truncated to 8 hex chars.
    Fixed-width lowercase hex compares identically as a string and as the
    integer it encodes, so thresholds can stay string literals and the
    expression never leaves codegen. NULL keys hash to NULL (callers get
    NULL splits / are never sampled), matching the sketch NULL contract.
    """
    key = F.col(key) if isinstance(key, str) else key
    # F.concat (not concat_ws) so a NULL key yields a NULL draw — the SQL
    # `key || ':' || seed` oracle propagates NULL the same way
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":" + str(seed)))), 1, 8
    )


def _hex_threshold(fraction: float) -> str:
    """Exclusive upper bound in hex for ``P(draw < t) == fraction``."""
    t = int(round(fraction * _HASH_SPACE))
    t = max(0, min(_HASH_SPACE, t))
    # 2^32 itself can't be an 8-char hex; 'g' sorts after every hex digit,
    # giving an always-true bound for fraction == 1.0.
    return "g" if t == _HASH_SPACE else format(t, "08x")


def hash_split(
    df: DataFrame,
    on: str | Column,
    weights: Mapping[str, float],
    seed: str | int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by key hash.

    ``weights`` maps split name -> weight (normalized internally; dict
    order defines the threshold order). Rows with equal ``on`` values land
    in the same split — pass the *dedup key* (e.g. document fingerprint)
    to keep near-identical rows from straddling train/test.

    Scale: pure map-side column (no shuffle, no state); the assignment is
    a when-chain over one md5 call, fully inside whole-stage codegen.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    h = split_hash_col(on, seed)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names:
        acc += weights[name] / total
        cond = h < F.lit(_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    # float rounding can leave a sliver above the last threshold
    assert expr is not None
    expr = expr.otherwise(F.lit(names[-1]))
    expr = F.when(h.isNotNull(), expr)  # NULL key -> NULL split
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame,
    on: str | Column,
    fraction: float | None = None,
    seed: str | int = 0,
    by: str | None = None,
    fractions: Mapping[object, float] | None = None,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its key hash falls
    below the fraction threshold.

    Global mode: ``fraction`` in [0, 1]. Stratified mode: ``by`` names a
    stratum column and ``fractions`` maps stratum value -> fraction
    (strata not listed are dropped), the deterministic analogue of
    ``DataFrame.sampleBy``.

    Unlike ``df.sample`` this is stable under re-execution, retries, and
    repartitioning, and the *same keys* are kept at a smaller fraction
    (f' < f samples a subset of f's rows) — the property that makes
    nested-subset ablation corpora possible.

    Scale: a plain filter — no shuffle; pushes down past column pruning.
    """
    h = split_hash_col(on, seed)
    if fractions is not None:
        if by is None:
            raise ValueError("stratified sampling needs `by`")
        cond: Column = F.lit(False)
        for value, frac in fractions.items():
            cond = F.when(
                F.col(by) == F.lit(value), h < F.lit(_hex_threshold(frac))
            ).otherwise(cond)
        return df.filter(cond)
    if fraction is None:
        raise ValueError("pass either fraction or (by, fractions)")
    return df.filter(h < F.lit(_hex_threshold(fraction)))


def uniform_draw_col(key: str | Column, seed: str | int = 0) -> Column:
    """Deterministic uniform draw in (0, 1]: the 32-bit hash as a
    double, ``(h + 1) / 2^32``. DuckDB reproduces it bit-for-bit via
    ``(('0x' || substring(md5(k||':'||seed),1,8))::BIGINT + 1) /
    4294967296.0`` (integer add + one division — identical IEEE ops)."""
    h = split_hash_col(key, seed)
    return (F.conv(h, 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(_HASH_SPACE)
    )


def deterministic_sample(
    df: DataFrame,
    n: int,
    on: str | Column,
    seed: str | int = 0,
    by: Sequence[str] | None = None,
    hash_col: str | None = None,
    weight: str | Column | None = None,
) -> DataFrame:
    """Exact-size uniform sample: the ``n`` rows with the smallest key
    hashes (per group when ``by`` is given) — a deterministic reservoir.

    Ties (md5 collisions on distinct keys are ~2^-32, but equal keys tie
    exactly) break on the key's string value, so the selected *set* is a
    pure function of (keys, seed). Keep ``hash_col`` to chain samples:
    the union of per-shard deterministic samples re-sampled to ``n`` is
    exactly the sample of the union (min-wise property), so shards can be
    sampled independently and merged — the treeAggregate shape.

    ``weight``: weighted-without-replacement sampling
    (Efraimidis–Spirakis A-ES): each row draws a deterministic uniform
    u and ranks by ``u^(1/w)`` descending — inclusion probability
    proportional to weight, still a pure function of (key, seed).
    Non-positive/NULL weights are excluded. Training pipelines use this
    to over-sample high-quality or rare-domain documents while keeping
    re-runs identical.

    Scale: global mode compiles to TakeOrderedAndProject (per-partition
    top-n, tiny merge at the driver-side limit — no full sort); grouped
    mode is one window shuffle keyed by ``by``.
    """
    key = F.col(on) if isinstance(on, str) else on
    if weight is not None:
        w = F.col(weight) if isinstance(weight, str) else weight
        wd = w.cast("double")
        u = uniform_draw_col(key, seed)
        # rank key: u^(1/w), LARGEST win — negate so the shared
        # ascending top-n path below selects them
        aes = -F.pow(u, F.lit(1.0) / wd)
        # NaN > 0 is TRUE in Spark SQL — exclude it explicitly or NaN
        # weights leak into the sample (and DuckDB would sort them first)
        tagged = df.filter(
            wd.isNotNull() & ~F.isnan(wd) & (wd > 0)
        ).withColumn("__h", aes)
        tagged = tagged.filter(F.col("__h").isNotNull())
    else:
        h = split_hash_col(key, seed)
        tagged = df.withColumn("__h", h).filter(F.col("__h").isNotNull())
    if by:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*by).orderBy(F.col("__h"), key.cast("string"))
        out = (
            tagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn")
        )
    else:
        out = tagged.orderBy(F.col("__h"), key.cast("string")).limit(n)
    if hash_col:
        return out.withColumnRenamed("__h", hash_col)
    return out.drop("__h")


def distinct_sample(
    df: DataFrame,
    on: str | Sequence[str],
    n: int,
    seed: str | int = 0,
    oversample: float = 8.0,
    est_distinct: float | None = None,
) -> DataFrame:
    """Exact-``n`` uniform sample of the DISTINCT key set — "give me
    500 random users", not 500 random rows (where heavy users would
    dominate). ``deterministic_sample`` cannot answer this: equal keys
    share a hash, so its bottom-n can be n copies of one hot key.

    KMV property: the n smallest ``md5(key||':'||seed)`` values over
    the distinct set are a uniform without-replacement sample of it,
    and a pure function of (keys, seed) — re-runs, re-partitions, and
    the DuckDB oracle all reproduce the same set row-for-row. Ties
    break on the key string (md5 collisions on distinct keys ~2^-32).

    Scale shape: when the estimated distinct count is large, a hash
    PREFILTER (``__h < threshold`` with ``oversample × n`` expected
    survivors) runs inside whole-stage codegen at the scan, so the
    dedup exchange carries ~8n candidate rows instead of every
    distinct key — the difference between a metadata-sized shuffle
    and a 10^10-key shuffle at transcript scale. Survivorship below n
    is a Chernoff-tail event (P < e^{-n}); the guard re-runs without
    the filter rather than returning short, so the output is exact-n
    whenever n distinct keys exist. One approx_count_distinct pass
    decides whether the prefilter is safe to engage.

    NULL keys are excluded (a NULL is not a sampleable identity) —
    the oracle mirrors with ``WHERE key IS NOT NULL``.

    ``est_distinct``: pass a known/rough distinct count to skip the
    estimate pass — the whole sample is then ONE scan. Measured at
    74.5M rows / 4M keys: the auto estimate pass costs a full extra
    scan, which only pays for itself when the distinct exchange
    dominates (very wide keys or |distinct| ≈ |rows|); with the
    cardinality supplied the prefiltered single scan wins outright.
    Any positive rough figure works — the prefilter keeps exactness
    via the shortfall retry regardless of estimate error.
    """
    keys = [on] if isinstance(on, str) else list(on)
    base = df.select(*keys).na.drop()
    # \x1f separator: unambiguous multi-column key ("a:b","c" vs "a","b:c")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in keys])
    h = split_hash_col(key, seed)

    def bottom_n(tagged: DataFrame) -> DataFrame:
        return (
            tagged.dropDuplicates(keys)
            .orderBy(F.col("__h"), key)
            .limit(n)
            .drop("__h")
        )

    tagged = base.withColumn("__h", h)
    est = (
        est_distinct
        if est_distinct is not None
        else base.agg(F.approx_count_distinct(F.struct(*keys))).collect()[0][0]
    )
    if est > oversample * n:
        frac = min(1.0, oversample * n / est)
        pre = tagged.filter(F.col("__h") < F.lit(_hex_threshold(frac)))
        # materialize the ≤ n sample rows ONCE: a count()-then-return
        # would execute the scan for the guard and the caller's first
        # action would silently re-run the whole thing
        rows = bottom_n(pre).collect()
        if len(rows) >= n:
            return df.sparkSession.createDataFrame(rows, base.schema)
    return bottom_n(tagged)


def distinct_sample_by(
    df: DataFrame,
    group: str | Sequence[str],
    on: str | Sequence[str],
    n: int,
    seed: str | int = 0,
    oversample: float = 8.0,
) -> DataFrame:
    """Stratified ``distinct_sample``: up to ``n`` uniformly-sampled
    DISTINCT keys PER GROUP ("10 random documents per language") —
    small strata return their full distinct set, never padded.

    Same KMV property per stratum (the n smallest md5 draws over that
    group's distinct keys), so the draw is deterministic and
    SQL-replayable: ``row_number() OVER (PARTITION BY group ORDER BY
    md5, key) <= n``.

    Scale shape: the per-group hash PREFILTER thresholds come from one
    grouped ``approx_count_distinct`` pass (driver state = one row per
    stratum — strata are assumed enumerable, the usual case for
    lang/source/role dimensions). Groups below ``oversample × n``
    distinct keys keep threshold 1.0 (exactness unthreatened); large
    groups prune to ~``oversample × n`` expected survivors inside
    codegen before the distinct exchange and the window sort. A
    post-check re-runs unfiltered if ANY prefiltered stratum came up
    short (P < e^-n per stratum) — exact-n whenever the stratum has n
    distinct keys. NULL keys are excluded; NULL-valued group columns
    form their own stratum (a missing dimension is still a stratum).
    """
    from pyspark.sql.window import Window

    groups = [group] if isinstance(group, str) else list(group)
    keys = [on] if isinstance(on, str) else list(on)
    base = df.select(*groups, *keys).na.drop(subset=keys)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in keys])
    tagged = base.withColumn("__h", split_hash_col(key, seed))

    def top_per_group(t: DataFrame) -> DataFrame:
        w = Window.partitionBy(*groups).orderBy(F.col("__h"), key)
        return (
            t.dropDuplicates([*groups, *keys])
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__h", "__rn")
        )

    ests = (
        base.groupBy(*groups)
        .agg(F.approx_count_distinct(F.struct(*keys)).alias("__est"))
        .collect()
    )
    fracs = [
        tuple(r[g] for g in groups)
        + (min(1.0, oversample * n / r["__est"]),)
        for r in ests
        if r["__est"] > oversample * n
    ]
    if not fracs:
        return top_per_group(tagged)
    spark = df.sparkSession
    th = spark.createDataFrame(
        [(*g_frac[:-1], _hex_threshold(g_frac[-1])) for g_frac in fracs],
        base.select(*groups).schema.add("__th", "string"),
    )
    # eqNullSafe join: a NULL stratum is a real stratum, and a plain
    # name join (NULL != NULL) would never prune it AND would make the
    # shortfall check fire on every run, silently killing the scale path
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"t.{g}").eqNullSafe(F.col(f"th.{g}")) for g in groups],
    )
    pre = (
        tagged.alias("t")
        .join(F.broadcast(th.alias("th")), cond, "left")
        .filter(F.col("__th").isNull() | (F.col("__h") < F.col("__th")))
        .select("t.*")
    )
    # materialize the ≤ n-per-stratum rows once (same enumerable-strata
    # assumption as the threshold collect) and check shortfall locally —
    # no persist lifetime to manage, no second execution of the scan
    rows = top_per_group(pre).collect()
    got = {}
    for r in rows:
        g = tuple(r[g_] for g_ in groups)
        got[g] = got.get(g, 0) + 1
    prefiltered = {tuple(g_frac[:-1]) for g_frac in fracs}
    if all(got.get(g, 0) >= n for g in prefiltered):
        return spark.createDataFrame(rows, base.schema)
    return top_per_group(tagged)
