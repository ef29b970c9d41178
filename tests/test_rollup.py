"""Time-grain sketch rollup: lossless coarsening + single-scan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.hll_agg import sketch_by
from hyper_spark.operators.rollup import rollup_estimates, sketch_time_rollup


@pytest.fixture(scope="module")
def ts_events(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [
        Row(
            ts=base + dt.timedelta(minutes=17 * i),
            uid=f"u{i % 97}",
            site=f"s{i % 2}",
        )
        for i in range(800)  # ~9.4 days of data
    ]
    return spark.createDataFrame(rows)


def test_rollup_byte_identical_to_direct_build(ts_events):
    """A rolled-up coarse sketch must equal one built directly from raw
    rows (register max is associative), at every grain."""
    p = 12
    roll = sketch_time_rollup(
        ts_events, "ts", "uid", p=p, grains=["hour", "day", "week"]
    )
    got = {
        (r["grain"], r["bucket"]): bytes(r["registers"]) for r in roll.collect()
    }
    for grain in ("hour", "day", "week"):
        direct = sketch_by(
            ts_events.withColumn("b", F.date_trunc(grain, "ts")), ["b"], "uid", p
        )
        want = {r["b"]: bytes(r["registers"]) for r in direct.collect()}
        assert {b: v for (g, b), v in got.items() if g == grain} == want, grain


def test_rollup_with_keys_and_estimates(ts_events):
    roll = sketch_time_rollup(
        ts_events, "ts", "uid", p=12, grains=["day"], keys=["site"]
    )
    est = rollup_estimates(roll).collect()
    exact = {
        (r["site"], r["b"]): r["x"]
        for r in ts_events.groupBy(
            "site", F.date_trunc("day", "ts").alias("b")
        )
        .agg(F.countDistinct("uid").alias("x"))
        .collect()
    }
    assert len(est) == len(exact)
    bound = 1.04 / (2**12) ** 0.5 * 3
    for r in est:
        x = exact[(r["site"], r["bucket"])]
        assert abs(r["estimate"] - x) <= max(1.0, bound * x), r


def test_rollup_grain_validation(ts_events):
    with pytest.raises(ValueError):
        sketch_time_rollup(ts_events, "ts", "uid", grains=["day", "hour"])
    with pytest.raises(ValueError):
        sketch_time_rollup(ts_events, "ts", "uid", grains=["fortnight"])
    # weeks straddle month boundaries: month cannot derive from week
    with pytest.raises(ValueError, match="week"):
        sketch_time_rollup(ts_events, "ts", "uid", grains=["week", "month"])
    # packed6 is checkpointed-merge-only (length-ambiguous for the
    # rollup's 'auto'-decoding consumers)
    with pytest.raises(ValueError, match="packed6"):
        sketch_time_rollup(ts_events, "ts", "uid", grains=["day"], encoding="packed6")


def test_rollup_month_skips_week_when_deriving(spark):
    """Review fix: with grains [day, week, month], month sketches must
    derive from DAY (weeks straddle month boundaries — deriving from
    week misattributes whole weeks). Data spans a Jan/Feb boundary whose
    containing week starts in January."""
    import datetime as dt

    rows = [
        Row(ts=dt.datetime(2026, 1, 28) + dt.timedelta(hours=6 * i), uid=f"j{i}")
        for i in range(8)  # Jan 28..29 (week of Mon Jan 26)
    ] + [
        Row(ts=dt.datetime(2026, 2, 1) + dt.timedelta(hours=6 * i), uid=f"f{i}")
        for i in range(8)  # Feb 1..2 (SAME week of Mon Jan 26)
    ]
    df = spark.createDataFrame(rows)
    p = 12
    roll = sketch_time_rollup(df, "ts", "uid", p=p, grains=["day", "week", "month"])
    got = {
        r["bucket"]: bytes(r["registers"])
        for r in roll.filter(F.col("grain") == "month").collect()
    }
    direct = {
        r["b"]: bytes(r["registers"])
        for r in sketch_by(
            df.withColumn("b", F.date_trunc("month", "ts")), ["b"], "uid", p
        ).collect()
    }
    assert got == direct  # byte-identical: Feb users not leaked into Jan


def test_rollup_checkpointed_single_scan_and_resume(spark, tmp_path):
    """With checkpoint_dir the raw table is scanned once: every grain in
    the FINAL plan reads back its parquet level (zero scans of the raw
    source), and a rerun resumes from the persisted grains."""
    import os

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "roll")
    roll = sketch_time_rollup(
        ev, "ts", "user_id", p=10, grains=["hour", "day", "week"],
        checkpoint_dir=d,
    )
    lazy = sketch_time_rollup(ev, "ts", "user_id", p=10, grains=["hour", "day", "week"])
    got = {(r["grain"], r["bucket"]): bytes(r["registers"]) for r in roll.collect()}
    want = {(r["grain"], r["bucket"]): bytes(r["registers"]) for r in lazy.collect()}
    assert got == want
    for g in ("hour", "day", "week"):
        assert os.path.exists(os.path.join(d, f"grain_{g}", "_SUCCESS"))
    # final plan reads only the persisted grains — the events scan is gone
    plan = roll._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in plan, plan
    assert plan.count("FileScan") == 3  # one per grain level
    # resume: a fresh call over a DIFFERENT (empty-ish) frame still
    # serves the persisted grains rather than rebuilding
    again = sketch_time_rollup(
        ev.limit(0), "ts", "user_id", p=10, grains=["hour", "day", "week"],
        checkpoint_dir=d,
    )
    got2 = {(r["grain"], r["bucket"]): bytes(r["registers"]) for r in again.collect()}
    assert got2 == got


def test_retention_estimates_matches_exact_overlap(spark, sf_correct):
    """Day-over-day retention from per-day sketches: estimates within
    bound of exact next-day user overlap (no raw rescan in the op)."""
    from pyspark.sql import functions as F

    from hyper_spark.operators.hll_agg import sketch_by
    from hyper_spark.operators.rollup import retention_estimates

    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    p = 14
    daily = sketch_by(
        events.withColumn("bucket", F.date_trunc("day", "ts")),
        ["bucket"], "user_id", p,
    )
    got = {r["bucket"]: r for r in retention_estimates(daily).collect()}
    assert len(got) >= 25  # ~29 consecutive day pairs in a 30-day fixture
    days = sorted(got)
    for d in days[:5]:
        r = got[d]
        a = events.filter(F.date_trunc("day", "ts") == d).select("user_id")
        b = events.filter(
            F.date_trunc("day", "ts") == r["next_bucket"]
        ).select("user_id")
        exact_prev = a.distinct().count()
        exact_overlap = a.intersect(b).count()
        assert abs(r["prev_estimate"] - exact_prev) / exact_prev < 0.05
        # inclusion-exclusion intersection: generous tolerance (the
        # reference itself gives "no guarantees", hyper.erl:97)
        assert abs(r["overlap_estimate"] - exact_overlap) <= max(
            10.0, 0.15 * exact_overlap
        )
        assert 0 <= r["retention_rate"] <= 1.2


def test_retention_sparse_blobs_and_grain_guard(spark):
    """Review findings: retention must decode sparse ('auto') blobs, and
    must refuse a multi-grain rollup table outright."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hyper_spark.operators.hll_agg import sketch_by
    from hyper_spark.operators.rollup import (
        retention_estimates,
        sketch_time_rollup,
    )

    base = dt.datetime(2026, 3, 1)
    rows = []
    for d in range(3):
        for u in range(20 + d):
            rows.append((base + dt.timedelta(days=d, hours=1), u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id bigint")
    daily = sketch_by(
        df.withColumn("bucket", F.date_trunc("day", "ts")),
        ["bucket"], "user_id", 14, encoding="auto",  # sparse blobs
    )
    got = retention_estimates(daily).collect()
    assert len(got) == 2
    for r in got:
        assert abs(r["prev_estimate"] - 20) < 3 or abs(r["prev_estimate"] - 21) < 3
        assert r["overlap_estimate"] >= 0
    rolled = sketch_time_rollup(df, "ts", "user_id", p=12,
                                grains=["hour", "day"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grain"):
        retention_estimates(rolled)


def test_sliding_sketch_union_matches_direct_windows(spark, sf_correct):
    """Rolling 3-day sketches derived from daily sketches are
    BYTE-IDENTICAL to sketches built directly from the raw rows of each
    window (union losslessness over sliding frames), and only observed
    buckets are served."""
    from pyspark.sql import functions as F

    from hyper_spark.operators.hll_agg import sketch_by
    from hyper_spark.operators.rollup import sliding_sketch_union

    events = spark.read.parquet(f"{sf_correct}/events.parquet").withColumn(
        "bucket", F.date_trunc("day", "ts")
    )
    daily = sketch_by(events, ["bucket"], "user_id", 12)
    rolled = sliding_sketch_union(daily, "bucket", window=3)
    got = {r["bucket"]: bytes(r["registers"]) for r in rolled.collect()}
    days = sorted(
        r["bucket"] for r in events.select("bucket").distinct().collect()
    )
    assert set(got) == set(days)  # no phantom trailing targets
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=2)
        direct = sketch_by(
            events.filter(
                (F.col("bucket") >= F.lit(lo)) & (F.col("bucket") <= F.lit(d))
            ),
            [],
            "user_id",
            12,
        ).collect()[0]
        assert got[d] == bytes(direct["registers"]), d


def test_sketch_cube_matches_direct_builds(spark, sf_correct):
    """Every cube subset's sketch is BYTE-IDENTICAL to a direct
    sketch_by at that grouping (union losslessness over the key
    lattice), from one raw scan."""
    from pyspark.sql import functions as F

    from hyper_spark.operators.hll_agg import sketch_by
    from hyper_spark.operators.rollup import sketch_cube

    events = spark.read.parquet(f"{sf_correct}/events.parquet").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    cube = sketch_cube(events, ["event_type", "day"], "user_id", p=12)
    got = {
        (r["grouping_id"], r["event_type"], r["day"]): bytes(r["registers"])
        for r in cube.collect()
    }
    cube.unpersist()
    # gid 3 = both keys absent = global sketch
    direct_global = sketch_by(events, [], "user_id", 12).collect()[0]
    assert got[(3, None, None)] == bytes(direct_global["registers"])
    # gid 1 = day absent = per-event_type (Spark bit order: first key MSB)
    for r in sketch_by(events, ["event_type"], "user_id", 12).collect():
        assert got[(1, r["event_type"], None)] == bytes(r["registers"])
    # gid 2 = event_type absent = per-day (spot check)
    per_day = sketch_by(events, ["day"], "user_id", 12).collect()
    for r in per_day[:5]:
        assert got[(2, None, r["day"])] == bytes(r["registers"])
    # lattice vs always-from-finest derivation: byte-identical output
    # (max is associative — any derivation path yields the same registers)
    flat = sketch_cube(
        events, ["event_type", "day"], "user_id", p=12, lattice=False
    )
    got_flat = {
        (r["grouping_id"], r["event_type"], r["day"]): bytes(r["registers"])
        for r in flat.collect()
    }
    flat.unpersist()
    assert got_flat == got
