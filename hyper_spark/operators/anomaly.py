"""Rate anomaly detection over event streams: per-bucket event counts
scored against a trailing baseline — the monitoring primitive that
watches a 100-TB ingest for broken producers (silent drops) and
runaway emitters (spikes) without any model state.

``rate_spikes`` is deliberately pure Catalyst: one time-bucketed
aggregate (map-side partial, shuffle bounded by |groups × buckets|)
followed by one window pass per group ordered by bucket. The baseline
is the trailing-N-bucket mean/std (ROWS frame over OBSERVED buckets —
an entirely-silent period contributes no buckets, which is itself the
'gap' signal the companion ``rate_gaps`` reports). The z-score is the
classic (x − μ)/σ; σ = 0 (a perfectly constant series) yields a NULL
z and never flags, avoiding the divide-by-zero spike storm on
heartbeat-regular series.

Reference parity note: the reference (src/hyper.erl) has no
monitoring surface; this is engine surface (SURVEY.md §2.4), the
batch sibling of the streaming windowed aggregates in
``hyper_spark/streaming``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rate_spikes",
    "rate_gaps",
    "rate_drops",
    "series_spikes",
    "series_drops",
    "seasonal_spikes",
    "seasonal_drops",
    "burn_rate_alerts",
    "burn_rate_read",
]

_BUCKETS = {"minute", "hour", "day", "week", "month"}


def _bucket_counts(df, time_col, by, bucket, season=None):
    """The shared OBSERVED-bucket count table: one time-bucketed
    aggregate, shuffle bounded by |groups × buckets|. ``season`` =
    (step, cycle) adds the epoch-arithmetic season cell column."""
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}")
    counts = (
        df.filter(F.col(time_col).isNotNull())
        .groupBy(*by, F.date_trunc(bucket, F.col(time_col)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    if season is not None:
        step, cycle = season
        counts = counts.withColumn(
            "season",
            ((F.unix_timestamp("bucket") / step).cast("long") % cycle).cast(
                "int"
            ),
        )
    return counts


def series_spikes(
    series: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    order_col: str = "bucket",
    trailing: int = 24,
    z_threshold: float = 3.0,
    min_value: float | None = None,
    alias: str = "value",
) -> DataFrame:
    """Trailing-baseline z-scores over an ARBITRARY per-group series —
    rate_spikes' scoring stage exposed for series that are not raw
    event counts: daily DISTINCT-user estimates read off stored HLL /
    theta states, sketch-derived quantile series, drift norms. One
    window pass per group ordered by ``order_col``; same contracts as
    rate_spikes (baseline = trailing OBSERVED rows strictly before the
    current one, first row never flags, σ=0 yields NULL z and never
    flags; ``min_value`` optionally suppresses flags below a floor).
    Output: DataFrame[*by, order_col, alias, baseline_mean,
    baseline_std, z_score, is_spike]."""
    if trailing < 2:
        raise ValueError(
            "trailing must be >= 2 (std of one point is undefined)"
        )
    by = list(by)
    w = (
        Window.partitionBy(*by)
        .orderBy(order_col)
        .rowsBetween(-trailing, -1)
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    z = F.when(std > 0, (v - mean) / std)
    flag = z.isNotNull() & (z >= F.lit(float(z_threshold)))
    if min_value is not None:
        flag = flag & (v >= F.lit(float(min_value)))
    return series.select(
        *by,
        order_col,
        v.alias(alias),
        mean.alias("baseline_mean"),
        std.alias("baseline_std"),
        z.alias("z_score"),
        flag.alias("is_spike"),
    )


def rate_spikes(
    df: DataFrame,
    time_col: str,
    by: Sequence[str] = (),
    bucket: str = "hour",
    trailing: int = 24,
    z_threshold: float = 3.0,
    min_events: int = 10,
) -> DataFrame:
    """Per (group, bucket) event counts with trailing-baseline
    z-scores: DataFrame[*by, bucket, n_events, baseline_mean,
    baseline_std, z_score, is_spike].

    The baseline frame is the ``trailing`` OBSERVED buckets strictly
    before the current one (``ROWS BETWEEN trailing PRECEDING AND 1
    PRECEDING``); the first bucket of a group has no baseline and
    never flags. ``is_spike`` additionally requires ``n_events >=
    min_events`` so near-empty groups can't flag on noise.
    """
    if trailing < 2:
        raise ValueError("trailing must be >= 2 (std of one point is undefined)")
    by = list(by)
    counts = _bucket_counts(df, time_col, by, bucket)
    scored = series_spikes(
        counts,
        "n_events",
        by=by,
        order_col="bucket",
        trailing=trailing,
        z_threshold=z_threshold,
        min_value=float(min_events),
        alias="n_events",
    )
    # rate_spikes' published schema keeps n_events an integer count
    return scored.withColumn(
        "n_events", F.col("n_events").cast("long")
    )


def rate_gaps(
    df: DataFrame,
    time_col: str,
    by: Sequence[str] = (),
    bucket: str = "hour",
) -> DataFrame:
    """Silent periods per group: consecutive observed buckets whose
    distance exceeds one bucket — DataFrame[*by, gap_start (last bucket
    WITH data), gap_end (next bucket with data), missed_buckets].

    The complement of ``rate_spikes``: a producer that stops emitting
    produces NO buckets, so no z-score can fire — the gap list is how
    silence becomes visible. Same two-shuffle shape (bucketed count +
    per-group lag window).
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}")
    by = list(by)
    buckets = (
        df.filter(F.col(time_col).isNotNull())
        .select(*by, F.date_trunc(bucket, F.col(time_col)).alias("bucket"))
        .distinct()
    )
    w = Window.partitionBy(*by).orderBy("bucket")
    prev = F.lag("bucket").over(w)
    step = {"minute": 60, "hour": 3600, "day": 86400,
            "week": 604800, "month": None}[bucket]
    if step is None:
        raise ValueError("rate_gaps does not support month buckets "
                         "(variable length); use day")
    missed = (
        (F.unix_timestamp("bucket") - F.unix_timestamp(prev)) / step - 1
    ).cast("long")
    return (
        buckets.select(
            *by,
            prev.alias("gap_start"),
            F.col("bucket").alias("gap_end"),
            missed.alias("missed_buckets"),
        )
        .filter(F.col("missed_buckets") > 0)
    )


_BUCKET_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


def burn_rate_alerts(
    df: DataFrame,
    bad,
    time_col: str = "ts",
    by: Sequence[str] = (),
    bucket: str = "hour",
    objective: float = 0.999,
    short_buckets: int = 6,
    long_buckets: int = 24,
    factor: float = 1.0,
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE-workbook
    alerting policy, Beyer et al. 2018 ch.5): per (group, bucket),
    error ratio over a SHORT and a LONG trailing wall-clock window,
    each divided by the error budget ``1 - objective``; an alert fires
    only when BOTH windows burn at ≥ ``factor``× budget — the long
    window suppresses one-bucket blips, the short window makes the
    alert reset quickly once the incident ends.

    ``bad`` is a boolean Column (or SQL string) marking an
    SLO-violating event. Windows are WALL-CLOCK (``RANGE`` frames over
    the bucket epoch, width ``N buckets × bucket seconds``), not
    observed-row frames: a silent period inside the window simply
    contributes no events, so gaps don't stretch the window the way a
    ROWS frame would — the complementary design choice to
    ``rate_spikes`` (whose trailing BASELINE deliberately skips silent
    buckets) because a burn rate is a ratio over elapsed time, not a
    deviation from typical traffic.

    Distributed shape (the same one-aggregate doctrine as
    rate_spikes): one time-bucketed groupBy bounds the shuffle at
    |groups × buckets|; both rolling ratios come from ONE window pass
    (two frames share the partition/ordering); everything is
    whole-stage codegen — no Python, no second scan.

    Output: DataFrame[*by, bucket, n_total, n_bad, err_short,
    err_long, burn_short, burn_long, is_alert].
    """
    # parameter validation happens once, in burn_rate_read below
    by = list(by)
    if isinstance(bad, str):
        bad = F.expr(bad)
    counts = (
        df.filter(F.col(time_col).isNotNull())
        .groupBy(*by, F.date_trunc(bucket, F.col(time_col)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(bad.cast("long")).alias("n_bad"),
        )
    )
    return burn_rate_read(
        counts,
        by=by,
        bucket=bucket,
        objective=objective,
        short_buckets=short_buckets,
        long_buckets=long_buckets,
        factor=factor,
    )


def burn_rate_read(
    counts: DataFrame,
    by: Sequence[str] = (),
    bucket: str = "hour",
    objective: float = 0.999,
    short_buckets: int = 6,
    long_buckets: int = 24,
    factor: float = 1.0,
) -> DataFrame:
    """The read stage of ``burn_rate_alerts``, exposed for STORED
    bucket-counter tables: input DataFrame[*by, bucket (timestamp),
    n_total, n_bad] — exactly what the batch bucketizer above and
    ``streaming/burn_stream.py::streaming_bucket_counts`` both
    produce. Counters are plain sums, so rows from incremental /
    streaming builds merge losslessly before this read (the stored-
    state + reader split used across the library, e.g. dd_histogram
    over the DDSketch bucket table). If the store can hold the same
    (group, bucket) twice — e.g. one row per streaming run — sum
    n_total/n_bad per (group, bucket) first; the read assumes one row
    per bucket. Same output schema and semantics as
    ``burn_rate_alerts``."""
    if bucket not in _BUCKET_SECONDS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKET_SECONDS)}")
    if not 0.0 < objective < 1.0:
        raise ValueError(f"objective must be in (0, 1), got {objective}")
    if short_buckets < 1 or long_buckets < short_buckets:
        raise ValueError(
            "need 1 <= short_buckets <= long_buckets, got "
            f"{short_buckets}/{long_buckets}"
        )
    by = list(by)
    sec = _BUCKET_SECONDS[bucket]
    budget = 1.0 - objective
    counts = counts.withColumn("__sec", F.unix_timestamp("bucket"))

    def rolling(n_buckets: int):
        w = (
            Window.partitionBy(*by)
            .orderBy("__sec")
            .rangeBetween(-(n_buckets - 1) * sec, 0)
        )
        return (
            F.sum("n_bad").over(w) / F.sum("n_total").over(w)
        )

    err_s = rolling(short_buckets)
    err_l = rolling(long_buckets)
    out = counts.select(
        *by,
        "bucket",
        "n_total",
        "n_bad",
        F.round(err_s, 6).alias("err_short"),
        F.round(err_l, 6).alias("err_long"),
        F.round(err_s / F.lit(budget), 6).alias("burn_short"),
        F.round(err_l / F.lit(budget), 6).alias("burn_long"),
        (
            (err_s >= F.lit(factor * budget))
            & (err_l >= F.lit(factor * budget))
        ).alias("is_alert"),
    )
    return out


_SEASONS = {
    # epoch-arithmetic season keys: identical in any SQL engine and
    # timezone-free (the alternative — dayofweek()/hour() builtins —
    # numbers weekdays differently across engines)
    "hour_of_day": (3600, 24),
    "hour_of_week": (3600, 168),
    "day_of_week": (86400, 7),
}

_SEASONAL_BUCKET_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


def _check_seasonal(bucket: str, season: str) -> tuple[int, int]:
    """Reject incompatible bucket/season combinations instead of
    silently degenerating: a bucket grain that is a whole multiple of
    the season's full cycle (e.g. day buckets with hour_of_day) lands
    EVERY bucket in cell 0 — a plain trailing window wearing a
    seasonal name. week/month buckets have no fixed epoch arithmetic
    and are rejected outright."""
    if bucket not in _SEASONAL_BUCKET_SECONDS:
        raise ValueError(
            "seasonal detectors support buckets "
            f"{sorted(_SEASONAL_BUCKET_SECONDS)}, got {bucket!r}"
        )
    if season not in _SEASONS:
        raise ValueError(f"season must be one of {sorted(_SEASONS)}")
    step, cycle = _SEASONS[season]
    if _SEASONAL_BUCKET_SECONDS[bucket] % (step * cycle) == 0:
        raise ValueError(
            f"bucket {bucket!r} is a whole multiple of season "
            f"{season!r}'s cycle — every bucket would land in one "
            "seasonal cell; pick a finer bucket or a longer season"
        )
    return step, cycle


def seasonal_spikes(
    df: DataFrame,
    time_col: str,
    by: Sequence[str] = (),
    bucket: str = "hour",
    season: str = "hour_of_day",
    trailing: int = 7,
    z_threshold: float = 3.0,
    min_events: int = 10,
) -> DataFrame:
    """Seasonal-baseline rate anomalies: each (group, bucket) count is
    scored against the trailing observations of the SAME seasonal cell
    — Monday-9am traffic against previous Monday-9ams (or same
    hour-of-day against the previous days' same hour) — the detector
    for periodic traffic where ``rate_spikes``' plain trailing window
    would flag every morning ramp-up as an anomaly and mask a real
    incident inside the daily trough.

    ``season`` keys are epoch arithmetic ((epoch // step) % cycle), so
    the oracle replays them engine-independently: ``hour_of_day`` (24
    cells), ``hour_of_week`` (168), ``day_of_week`` (7). ``trailing``
    counts OBSERVED same-cell buckets strictly before the current one
    (for hour_of_day that means the same hour over the previous
    ``trailing`` days with any traffic); first observation of a cell
    never flags; σ = 0 never flags; ``min_events`` suppresses
    noise-floor flags, all exactly the ``rate_spikes`` contracts.

    Distributed shape: identical to rate_spikes — one time-bucketed
    aggregate (shuffle bounded by |groups × buckets|) + one window
    pass, now partitioned by (group, season cell); all codegen.

    Output: DataFrame[*by, bucket, season, n_events, baseline_mean,
    baseline_std, z_score, is_spike].
    """
    step, cycle = _check_seasonal(bucket, season)
    if trailing < 2:
        raise ValueError("trailing must be >= 2 (std of one point is undefined)")
    by = list(by)
    counts = _bucket_counts(df, time_col, by, bucket, season=(step, cycle))
    scored = series_spikes(
        counts,
        "n_events",
        by=[*by, "season"],
        order_col="bucket",
        trailing=trailing,
        z_threshold=z_threshold,
        min_value=float(min_events),
        alias="n_events",
    )
    return scored.select(
        *by,
        "bucket",
        "season",
        F.col("n_events").cast("long").alias("n_events"),
        "baseline_mean",
        "baseline_std",
        "z_score",
        "is_spike",
    )


def series_drops(
    series: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    order_col: str = "bucket",
    trailing: int = 24,
    z_threshold: float = 3.0,
    min_baseline: float | None = None,
    alias: str = "value",
) -> DataFrame:
    """The DOWNWARD mirror of ``series_spikes``: flags values that fall
    ``z_threshold`` sample-stddevs BELOW the trailing baseline — the
    degraded-but-alive producer (traffic halved, a consumer lagging,
    a feed thinning out). Structural contract with its siblings: a
    COMPLETELY silent bucket emits no row at all and is therefore
    invisible here — total silence is ``rate_gaps``' domain; this
    operator covers the partial losses gaps can't see. ``min_baseline``
    suppresses flags when the trailing mean itself is below a floor
    (a series hovering near zero "drops" on every tick of noise).
    Same window shape, NULL-σ and first-row contracts as
    series_spikes. Output: DataFrame[*by, order_col, alias,
    baseline_mean, baseline_std, z_score, is_drop]."""
    if trailing < 2:
        raise ValueError(
            "trailing must be >= 2 (std of one point is undefined)"
        )
    by = list(by)
    w = (
        Window.partitionBy(*by)
        .orderBy(order_col)
        .rowsBetween(-trailing, -1)
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    z = F.when(std > 0, (v - mean) / std)
    flag = z.isNotNull() & (z <= F.lit(-float(z_threshold)))
    if min_baseline is not None:
        flag = flag & (mean >= F.lit(float(min_baseline)))
    return series.select(
        *by,
        order_col,
        v.alias(alias),
        mean.alias("baseline_mean"),
        std.alias("baseline_std"),
        z.alias("z_score"),
        flag.alias("is_drop"),
    )


def rate_drops(
    df: DataFrame,
    time_col: str,
    by: Sequence[str] = (),
    bucket: str = "hour",
    trailing: int = 24,
    z_threshold: float = 3.0,
    min_baseline: float = 10.0,
) -> DataFrame:
    """Partial-loss rate anomalies: per (group, bucket) event counts
    scored against the trailing baseline, flagging buckets
    ``z_threshold`` stddevs BELOW it — completing the monitoring
    triptych (``rate_spikes``: runaway emitters; ``rate_gaps``: total
    silence; this: the silent 75%-drop in between, which neither
    sibling reports). Same one-aggregate + one-window codegen shape
    and OBSERVED-bucket contract as rate_spikes; ``min_baseline``
    (on the trailing MEAN, not the current value — the current value
    is exactly what's suspect) keeps near-idle groups from flagging
    on noise. Output: DataFrame[*by, bucket, n_events, baseline_mean,
    baseline_std, z_score, is_drop]."""
    by = list(by)
    counts = _bucket_counts(df, time_col, by, bucket)
    scored = series_drops(
        counts,
        "n_events",
        by=by,
        order_col="bucket",
        trailing=trailing,
        z_threshold=z_threshold,
        min_baseline=min_baseline,
        alias="n_events",
    )
    return scored.withColumn("n_events", F.col("n_events").cast("long"))


def seasonal_drops(
    df: DataFrame,
    time_col: str,
    by: Sequence[str] = (),
    bucket: str = "hour",
    season: str = "hour_of_day",
    trailing: int = 7,
    z_threshold: float = 3.0,
    min_baseline: float = 10.0,
) -> DataFrame:
    """The downward seasonal detector: each (group, bucket) count
    scored against its own seasonal cell's trailing baseline, flagging
    buckets that fall ``z_threshold`` stddevs BELOW it — "this
    Monday-9am is a fraction of the last seven Monday-9ams", the
    weekday-traffic collapse a plain trailing window reads as the
    nightly trough and ``seasonal_spikes`` by construction ignores.
    Same epoch-arithmetic season keys and contracts as
    seasonal_spikes; ``min_baseline`` applies to the trailing seasonal
    MEAN (the current value is exactly what's suspect), the
    ``rate_drops`` convention. Output: DataFrame[*by, bucket, season,
    n_events, baseline_mean, baseline_std, z_score, is_drop]."""
    step, cycle = _check_seasonal(bucket, season)
    by = list(by)
    counts = _bucket_counts(df, time_col, by, bucket, season=(step, cycle))
    scored = series_drops(
        counts,
        "n_events",
        by=[*by, "season"],
        order_col="bucket",
        trailing=trailing,
        z_threshold=z_threshold,
        min_baseline=min_baseline,
        alias="n_events",
    )
    return scored.select(
        *by,
        "bucket",
        "season",
        F.col("n_events").cast("long").alias("n_events"),
        "baseline_mean",
        "baseline_std",
        "z_score",
        "is_drop",
    )
