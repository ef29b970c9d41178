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
