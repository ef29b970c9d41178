"""rate_spikes / rate_gaps (operators/anomaly.py): trailing-baseline
anomaly scores on crafted series with known spikes and gaps."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.anomaly import rate_gaps, rate_spikes


def _series(spark):
    # group 'a': 20..24/hour (varying, so std > 0) for hours 0..23,
    # then 200 at hour 24 (spike)
    # group 'b': constant 30/hour for hours 0..24 (never flags: std 0)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(24):
        rows += [
            ("a", base + dt.timedelta(hours=h, seconds=s))
            for s in range(20 + h % 5)
        ]
    rows += [("a", base + dt.timedelta(hours=24, seconds=s)) for s in range(200)]
    for h in range(25):
        rows += [("b", base + dt.timedelta(hours=h, seconds=s)) for s in range(30)]
    return spark.createDataFrame(rows, "g string, ts timestamp")


def test_spike_flags_only_the_spike(spark):
    out = rate_spikes(_series(spark), "ts", by=["g"], trailing=24).collect()
    spikes = [(r["g"], r["bucket"], r["n_events"]) for r in out if r["is_spike"]]
    assert spikes == [("a", dt.datetime(2024, 1, 1, 0) + dt.timedelta(hours=24), 200)]
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    # constant series: std 0 -> z NULL everywhere after the first bucket
    assert all(r["z_score"] is None for r in by_g["b"])
    # first bucket of each group has no baseline
    firsts = [min(v, key=lambda r: r["bucket"]) for v in by_g.values()]
    assert all(r["baseline_mean"] is None and not r["is_spike"] for r in firsts)


def test_spike_thresholds(spark):
    df = _series(spark)
    # absurd threshold: nothing flags
    assert not any(
        r["is_spike"]
        for r in rate_spikes(df, "ts", by=["g"], z_threshold=1e6).collect()
    )
    # min_events above the spike count: nothing flags
    assert not any(
        r["is_spike"]
        for r in rate_spikes(df, "ts", by=["g"], min_events=500).collect()
    )
    with pytest.raises(ValueError, match="bucket must be"):
        rate_spikes(df, "ts", bucket="fortnight")
    with pytest.raises(ValueError, match="trailing"):
        rate_spikes(df, "ts", trailing=1)


def test_gaps_found_exactly(spark):
    base = dt.datetime(2024, 1, 1)
    hours = [0, 1, 2, 7, 8, 9, 10, 20]  # gaps: 3-6 (4 missed), 11-19 (9)
    rows = [("a", base + dt.timedelta(hours=h)) for h in hours]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    gaps = sorted(
        (r["gap_start"].hour, r["gap_end"].hour, r["missed_buckets"])
        for r in rate_gaps(df, "ts", by=["g"]).collect()
    )
    assert gaps == [(2, 7, 4), (10, 20, 9)]
    # a dense series has no gaps
    dense = spark.createDataFrame(
        [("a", base + dt.timedelta(hours=h)) for h in range(5)],
        "g string, ts timestamp",
    )
    assert rate_gaps(dense, "ts", by=["g"]).count() == 0


def test_series_spikes_generic_and_sketch_series(spark):
    """series_spikes scores an arbitrary series (numpy-replay parity)
    and wires a SKETCH-BUILT daily distinct series — the stored-state
    monitoring composition: approx_distinct per day -> trailing z."""
    import numpy as np

    from hyper_spark.operators import approx_distinct, series_spikes

    # 12 days, ~40 distinct users/day, day 9 planted with 160 distinct
    rows = []
    for d in range(12):
        # small day-to-day variance so the baseline sigma is nonzero
        n = 160 if d == 9 else 38 + (d * 7) % 5
        for u in range(n):
            rows.append(
                (
                    f"2024-05-{d + 1:02d} {u % 24:02d}:00:00",
                    (d * 1000 + u) if d == 9 else u,
                )
            )
    df = spark.createDataFrame(rows, "ts string, user_id long").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )
    daily = approx_distinct(
        df.withColumn("day", F.to_date("ts")), ["day"], "user_id", p=14
    )
    scored = series_spikes(
        daily, "estimate", order_col="day", trailing=5, z_threshold=3.0
    ).collect()
    flagged = [r["day"].day for r in scored if r["is_spike"]]
    assert flagged == [10]  # 2024-05-10 is the planted day

    # numpy replay of the scoring on the same series (value parity)
    ordered = sorted(scored, key=lambda x: x["day"])
    vals = [r["value"] for r in ordered]
    for i, r in enumerate(ordered):
        base = vals[max(0, i - 5):i]
        if len(base) >= 2 and float(np.std(base, ddof=1)) > 0:
            z = (vals[i] - float(np.mean(base))) / float(
                np.std(base, ddof=1)
            )
            assert r["z_score"] == pytest.approx(z, rel=1e-9)
        else:
            assert r["z_score"] is None

    # min_value floor suppresses flags; guard fires
    assert not any(
        r["is_spike"]
        for r in series_spikes(
            daily, "estimate", order_col="day", trailing=5,
            z_threshold=3.0, min_value=1e9,
        ).collect()
    )
    with pytest.raises(ValueError, match="trailing"):
        series_spikes(daily, "estimate", order_col="day", trailing=1)


# ------------------------------------------------------------ burn rate


def _burn_events(spark):
    """Hour buckets with 10 events each: hours 0-9 healthy (1 bad),
    hours 10-12 incident (8 bad), hours 13-20 healthy again. A 3-hour
    silent gap separates hours 20 and 24 (bucket 21-23 empty)."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    for h in list(range(21)) + [24]:
        n_bad = 8 if 10 <= h <= 12 else 1
        for i in range(10):
            rows.append(
                (base + dt.timedelta(hours=h, seconds=i), i < n_bad)
            )
    return spark.createDataFrame(rows, "ts timestamp, is_bad boolean")


def test_burn_rate_dual_window(spark):
    from hyper_spark.operators.anomaly import burn_rate_alerts

    out = {
        r["bucket"]: r
        for r in burn_rate_alerts(
            _burn_events(spark),
            F.col("is_bad"),
            time_col="ts",
            bucket="hour",
            objective=0.75,   # budget 0.25
            short_buckets=3,
            long_buckets=12,
            factor=1.0,
        ).collect()
    }
    base = dt.datetime(2024, 3, 1)
    # healthy steady state: err 0.1 in both windows, no alert
    r9 = out[base + dt.timedelta(hours=9)]
    assert r9["err_short"] == pytest.approx(0.1)
    assert r9["err_long"] == pytest.approx(0.1)
    assert not r9["is_alert"]
    # incident hour 12: short window = hours 10..12 all bad-heavy
    # (err 0.8); long window hours 1..12 = (9*1+3*8)/120 = 0.275
    r12 = out[base + dt.timedelta(hours=12)]
    assert r12["err_short"] == pytest.approx(0.8)
    assert r12["err_long"] == pytest.approx(0.275)
    assert r12["is_alert"]  # both windows >= 0.25 budget
    # hour 11: short = hours 9..11 = (1+8+8)/30 ~ 0.567, but long =
    # hours 0..11 = (10*1+2*8)/120 ~ 0.217 < 0.25 -> suppressed
    r11 = out[base + dt.timedelta(hours=11)]
    assert r11["err_short"] == pytest.approx(17 / 30)
    assert not r11["is_alert"]
    # burn = err / budget
    assert r12["burn_short"] == pytest.approx(0.8 / 0.25)


def test_burn_rate_wallclock_gap(spark):
    """The RANGE frame is wall-clock: after the 3-hour silence, hour
    24's short window (3 buckets wide) covers hours 22-24 — only hour
    24 has data, so the silent hours neither stretch the window back
    to hour 20 (a ROWS frame would) nor contribute rows."""
    from hyper_spark.operators.anomaly import burn_rate_alerts

    out = {
        r["bucket"]: r
        for r in burn_rate_alerts(
            _burn_events(spark),
            "is_bad",
            time_col="ts",
            bucket="hour",
            objective=0.75,
            short_buckets=3,
            long_buckets=12,
        ).collect()
    }
    r24 = out[dt.datetime(2024, 3, 1) + dt.timedelta(hours=24)]
    # only hour 24's own 10 events (1 bad) are inside the 3h frame
    assert r24["err_short"] == pytest.approx(0.1)
    assert r24["n_total"] == 10


def test_burn_rate_validation(spark):
    from hyper_spark.operators.anomaly import burn_rate_alerts

    df = _burn_events(spark)
    with pytest.raises(ValueError):
        burn_rate_alerts(df, "is_bad", bucket="fortnight")
    with pytest.raises(ValueError):
        burn_rate_alerts(df, "is_bad", objective=1.0)
    with pytest.raises(ValueError):
        burn_rate_alerts(df, "is_bad", short_buckets=8, long_buckets=4)


# ---------------------------------------------------------- seasonal


def test_seasonal_spikes_daily_pattern(spark):
    """A 10x daily peak hour is NORMAL under the seasonal baseline
    (plain rate_spikes would flag every morning); a 4x burst in a
    normally-quiet hour flags."""
    from hyper_spark.operators.anomaly import seasonal_spikes

    base = dt.datetime(2024, 4, 1)
    rows = []
    for d in range(10):
        for h in range(24):
            # hour 9 peaks at ~100 (with variation so std > 0),
            # everything else ~10 (also varied)
            n = (100 + d % 3) if h == 9 else (10 + (d + h) % 3)
            # day 9 hour 3: incident — 40 events in a quiet hour
            if d == 9 and h == 3:
                n = 40
            rows += [
                (base + dt.timedelta(days=d, hours=h, seconds=s))
                for s in range(n)
            ]
    df = spark.createDataFrame([(t,) for t in rows], "ts timestamp")
    out = seasonal_spikes(
        df, "ts", bucket="hour", season="hour_of_day",
        trailing=7, z_threshold=3.0, min_events=10,
    ).collect()
    spikes = [(r["bucket"], r["season"]) for r in out if r["is_spike"]]
    assert spikes == [(base + dt.timedelta(days=9, hours=3), 3)]
    # the seasonal key is the hour of day
    assert all(r["season"] == r["bucket"].hour for r in out)
    # peak hours scored against their own cell: z stays small
    peak = [r for r in out if r["season"] == 9 and r["z_score"] is not None]
    assert peak and all(abs(r["z_score"]) < 3 for r in peak)


def test_seasonal_spikes_validation(spark):
    from hyper_spark.operators.anomaly import seasonal_spikes

    df = spark.createDataFrame(
        [(dt.datetime(2024, 4, 1),)], "ts timestamp"
    )
    with pytest.raises(ValueError):
        seasonal_spikes(df, "ts", season="phase_of_moon")
    with pytest.raises(ValueError):
        seasonal_spikes(df, "ts", trailing=1)
    with pytest.raises(ValueError):
        seasonal_spikes(df, "ts", bucket="fortnight")


# ------------------------------------------------------------- drops


def test_rate_drops_partial_loss(spark):
    """A 70% partial loss flags as a drop; the spike detector stays
    silent on it; near-idle series never flag (min_baseline)."""
    from hyper_spark.operators.anomaly import rate_drops

    base = dt.datetime(2024, 5, 1)
    rows = []
    for h in range(30):
        # group 'a': ~40/hour with variation; hour 24 drops to 12
        n = 12 if h == 24 else 40 + h % 3
        rows += [("a", base + dt.timedelta(hours=h, seconds=s)) for s in range(n)]
        # group 'b': near-idle 2-3/hour, dips to 0-row silence at
        # hour 24 (no bucket emitted -> invisible here by contract)
        if h != 24:
            rows += [("b", base + dt.timedelta(hours=h, seconds=s)) for s in range(2 + h % 2)]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = rate_drops(
        df, "ts", by=["g"], bucket="hour", trailing=24,
        z_threshold=3.0, min_baseline=5.0,
    ).collect()
    drops = [(r["g"], r["bucket"]) for r in out if r["is_drop"]]
    assert drops == [("a", base + dt.timedelta(hours=24))]
    # group b emitted no hour-24 bucket at all: silence is rate_gaps'
    # domain, and its low-baseline buckets never flag
    assert all(not r["is_drop"] for r in out if r["g"] == "b")
    # the drop hour is invisible to the spike detector
    from hyper_spark.operators.anomaly import rate_spikes

    spikes = rate_spikes(
        df, "ts", by=["g"], bucket="hour", trailing=24, z_threshold=3.0
    ).collect()
    assert all(not r["is_spike"] for r in spikes)


def test_rate_drops_validation(spark):
    from hyper_spark.operators.anomaly import rate_drops, series_drops

    df = spark.createDataFrame(
        [(dt.datetime(2024, 5, 1),)], "ts timestamp"
    )
    with pytest.raises(ValueError):
        rate_drops(df, "ts", bucket="fortnight")
    with pytest.raises(ValueError):
        series_drops(df.selectExpr("ts as bucket", "1 as v"), "v", trailing=1)


def test_seasonal_drops_onset(spark):
    """A collapsed peak hour flags against its own seasonal cell on
    the onset day; the plain trailing window reads the same bucket as
    an ordinary trough (rate_drops stays silent on it)."""
    from hyper_spark.operators.anomaly import rate_drops, seasonal_drops

    base = dt.datetime(2024, 4, 1)
    rows = []
    for d in range(10):
        for h in range(24):
            n = (100 + d % 3) if h == 9 else (10 + (d + h) % 3)
            if d == 9 and h == 9:
                n = 20  # the peak hour collapses to 20%
            rows += [
                (base + dt.timedelta(days=d, hours=h, seconds=s))
                for s in range(n)
            ]
    df = spark.createDataFrame([(t,) for t in rows], "ts timestamp")
    out = seasonal_drops(
        df, "ts", bucket="hour", season="hour_of_day",
        trailing=7, z_threshold=3.0, min_baseline=10.0,
    ).collect()
    drops = [(r["bucket"], r["season"]) for r in out if r["is_drop"]]
    assert drops == [(base + dt.timedelta(days=9, hours=9), 9)]
    # the plain trailing detector reads 20-at-hour-9 as a trough:
    # its baseline mixes the 10-ish off-peak hours, so no drop flag
    plain = rate_drops(
        df, "ts", bucket="hour", trailing=7,
        z_threshold=3.0, min_baseline=10.0,
    ).collect()
    target = base + dt.timedelta(days=9, hours=9)
    assert all(not r["is_drop"] for r in plain if r["bucket"] == target)


def test_seasonal_drops_validation(spark):
    from hyper_spark.operators.anomaly import seasonal_drops

    df = spark.createDataFrame(
        [(dt.datetime(2024, 4, 1),)], "ts timestamp"
    )
    with pytest.raises(ValueError):
        seasonal_drops(df, "ts", season="phase_of_moon")
    with pytest.raises(ValueError):
        seasonal_drops(df, "ts", bucket="fortnight")


def test_seasonal_degenerate_combo_rejected(spark):
    """day buckets with hour_of_day would land every bucket in cell 0
    (a plain trailing window wearing a seasonal name) — rejected."""
    from hyper_spark.operators.anomaly import seasonal_drops, seasonal_spikes

    df = spark.createDataFrame([(dt.datetime(2024, 4, 1),)], "ts timestamp")
    with pytest.raises(ValueError):
        seasonal_spikes(df, "ts", bucket="day", season="hour_of_day")
    with pytest.raises(ValueError):
        seasonal_drops(df, "ts", bucket="week", season="day_of_week")
    # day buckets against the WEEK-cycle seasons are meaningful
    assert seasonal_spikes(df, "ts", bucket="day", season="day_of_week").count() >= 0
