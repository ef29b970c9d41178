"""Sliding-window DDSketch (operators/sliding_dd.py): window-slice
bit-parity with direct builds, relative-error bound, lossless merge /
expire / coarsen, streaming bridge, guards, plan hygiene."""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.ddsketch import dd_quantiles_by
from hyper_spark.operators.sliding_dd import (
    sliding_dd_coarsen,
    sliding_dd_expire,
    sliding_dd_merge,
    sliding_dd_quantiles,
    sliding_dd_table,
)

T_REF = "2024-01-31 00:00:00"
WINDOWS = {"7d": "7 days", "30d": "30 days"}
QS = [0.5, 0.9, 0.99]
ALPHA = 0.01


def _rows(n_days=30, per_day=200):
    rows = []
    for d in range(n_days):
        for i in range(per_day):
            x = (7919 * (d * per_day + i)) % 10007
            # spread across magnitudes, include negatives and zeros
            v = (x - 300) * math.exp(x % 7)
            rows.append(
                (f"2024-01-{d + 1:02d} 11:00:00", f"g{i % 2}", float(v))
            )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, grp string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_windows_bit_match_direct_builds(spark):
    """Each window's sliding answer equals dd_quantiles_by over that
    window's raw rows EXACTLY (counts sum; same eval code path)."""
    rows = _rows()
    df = _df(spark, rows)
    state = sliding_dd_table(df, "ts", ["grp"], "v", alpha=ALPHA)
    got = sliding_dd_quantiles(state, ["grp"], T_REF, WINDOWS, QS).collect()
    by_win = {}
    for lab, days in (("7d", 7), ("30d", 30)):
        lo = F.lit(T_REF).cast("timestamp") - F.expr(f"INTERVAL {days} DAYS")
        sliced = df.filter(F.col("ts") >= lo)
        for r in dd_quantiles_by(sliced, ["grp"], "v", QS, alpha=ALPHA).collect():
            by_win[(r["grp"], lab, r["q"])] = r["est"]
    assert len(got) == 2 * 2 * 3
    for r in got:
        assert r["est"] == by_win[(r["grp"], r["window"], r["q"])], r


def test_relative_error_bound(spark):
    rows = _rows()
    df = _df(spark, rows)
    state = sliding_dd_table(df, "ts", [], "v", alpha=ALPHA)
    got = sliding_dd_quantiles(state, [], T_REF, {"30d": "30 days"}, QS)
    ref = datetime(2024, 1, 31)
    vals = np.sort(
        np.array(
            [
                v
                for ts, _g, v in rows
                if (ref - datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")).total_seconds()
                <= 30 * 86400
            ]
        )
    )
    for r in got.collect():
        true = vals[int(math.floor(r["q"] * (len(vals) - 1)))]
        assert abs(r["est"] - true) <= ALPHA * abs(true) + 1e-12, r


def test_merge_expire_coarsen_lossless(spark):
    rows = _rows()
    df = _df(spark, rows)
    direct = sliding_dd_table(df, "ts", ["grp"], "v", alpha=ALPHA)
    shards = [
        sliding_dd_table(
            df.filter(F.dayofmonth("ts") % 3 == i), "ts", ["grp"], "v",
            alpha=ALPHA,
        )
        for i in range(3)
    ]
    merged = sliding_dd_merge(shards, ["grp"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    kept = sliding_dd_expire(direct, "2024-01-24 00:00:00")
    a = sliding_dd_quantiles(kept, ["grp"], T_REF, {"7d": "7 days"}, QS)
    b = sliding_dd_quantiles(direct, ["grp"], T_REF, {"7d": "7 days"}, QS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # coarsen at the epoch-aligned Jan 18 boundary; aligned windows
    # (13d edge = cutoff, 23d edge = Jan 8, 45d = all data) bit-match
    coarse = sliding_dd_coarsen(direct, ["grp"], "2024-01-18 00:00:00", "10 days")
    assert (
        coarse.select("bucket_ts").distinct().count()
        < direct.select("bucket_ts").distinct().count()
    )
    wins = {"13d": "13 days", "23d": "23 days", "45d": "45 days"}
    ca = sliding_dd_quantiles(coarse, ["grp"], T_REF, wins, QS)
    cb = sliding_dd_quantiles(direct, ["grp"], T_REF, wins, QS)
    assert sorted(map(tuple, ca.collect())) == sorted(map(tuple, cb.collect()))


def test_streaming_bridge(spark, tmp_path):
    """streaming_windowed_dd_by's sink IS the sliding state: renaming
    window_start -> bucket_ts + alpha lineage makes it directly
    queryable with bit-identical answers."""
    from hyper_spark.streaming.dd_stream import streaming_windowed_dd_by

    rows = _rows(n_days=6, per_day=80)
    df = _df(spark, rows)
    # batch-mode application of the same streaming transformation
    out = streaming_windowed_dd_by(
        df, "ts", ["grp"], "v", alpha=ALPHA, window="1 day"
    )
    bridged = out.select(
        "grp",
        F.col("window_start").alias("bucket_ts"),
        "store",
        "bucket",
        F.col("count").alias("cnt"),
        F.lit(ALPHA).alias("alpha"),
    )
    state = sliding_dd_table(df, "ts", ["grp"], "v", alpha=ALPHA)
    t = "2024-01-07 00:00:00"
    a = sliding_dd_quantiles(bridged, ["grp"], t, {"3d": "3 days"}, QS)
    b = sliding_dd_quantiles(state, ["grp"], t, {"3d": "3 days"}, QS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_guards(spark):
    rows = _rows(n_days=2, per_day=40)
    df = _df(spark, rows)
    s1 = sliding_dd_table(df, "ts", [], "v", alpha=0.01)
    s2 = sliding_dd_table(df, "ts", [], "v", alpha=0.02)
    with pytest.raises(ValueError, match="mixed"):
        sliding_dd_quantiles(
            s1.unionByName(s2), [], T_REF, {"7d": "7 days"}, QS
        )
    with pytest.raises(ValueError, match="empty"):
        sliding_dd_quantiles(s1.filter("false"), [], T_REF, {"7d": "7 days"}, QS)
    with pytest.raises(ValueError, match="no states"):
        sliding_dd_merge([], [])


def test_plan_python_free(spark):
    rows = _rows(n_days=3, per_day=50)
    state = sliding_dd_table(_df(spark, rows), "ts", ["grp"], "v", alpha=ALPHA)
    plan = (
        sliding_dd_quantiles(state, ["grp"], T_REF, WINDOWS, QS, alpha=ALPHA)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas"):
        assert marker not in plan


def test_drift_cross_range(spark):
    """KS between two ranges: zero for identical ranges, matches a
    pandas replay of the bucket arithmetic for disjoint ones, NULL for
    groups empty on one side."""
    rows = _rows()
    # g2 exists only in the late range
    rows += [(f"2024-01-{d:02d} 11:00:00", "g2", float(d * 3 + 1)) for d in range(25, 30)]
    df = _df(spark, rows)
    state = sliding_dd_table(df, "ts", ["grp"], "v", alpha=ALPHA)
    from hyper_spark.operators.sliding_dd import sliding_dd_drift

    ra = ("2024-01-01 00:00:00", "2024-01-15 00:00:00")
    rb = ("2024-01-15 00:00:00", "2024-01-31 00:00:00")
    same = sliding_dd_drift(state, ["grp"], ra, ra).collect()
    assert all(r["ks"] == 0.0 for r in same if r["n_a"] > 0)
    got = {r["grp"]: r for r in sliding_dd_drift(state, ["grp"], ra, rb).collect()}
    assert got["g2"]["n_a"] == 0 and got["g2"]["ks"] is None
    # pandas replay over the DD bucketization
    import pandas as pd

    def buckets(pred):
        out = {}
        for ts, g, v in rows:
            d = datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
            if not pred(d) or v is None:
                continue
            gamma = (1 + ALPHA) / (1 - ALPHA)
            if v > 0:
                key = ("+", math.ceil(math.log(abs(v)) / math.log(gamma)))
            elif v < 0:
                key = ("-", math.ceil(math.log(abs(v)) / math.log(gamma)))
            else:
                key = ("0", 0)
            out.setdefault(g, {}).setdefault(key, 0)
            out[g][key] += 1
        return out

    A = buckets(lambda d: datetime(2024, 1, 1) <= d < datetime(2024, 1, 15))
    B = buckets(lambda d: datetime(2024, 1, 15) <= d < datetime(2024, 1, 31))
    for g in ("g0", "g1"):
        keys_union = sorted(
            set(A[g]) | set(B[g]),
            key=lambda sk: ({"-": -1, "0": 0, "+": 1}[sk[0]],
                            -sk[1] if sk[0] == "-" else sk[1]),
        )
        na, nb = sum(A[g].values()), sum(B[g].values())
        ca = cb = 0
        ks = 0.0
        for sk in keys_union:
            ca += A[g].get(sk, 0)
            cb += B[g].get(sk, 0)
            ks = max(ks, abs(ca / na - cb / nb))
        assert got[g]["ks"] == pytest.approx(ks, abs=1e-12), g


def test_weighted_sliding_windows_match_direct_weighted_builds(spark):
    """weight= in the sliding state: each trailing window's quantiles
    equal the direct weighted DDSketch of that window's raw rows
    (mass addition is lossless, exactly like counts)."""
    from pyspark.sql import Row

    from hyper_spark.operators.ddsketch import dd_quantiles_by
    from hyper_spark.operators.sliding_dd import (
        sliding_dd_quantiles,
        sliding_dd_table,
    )

    rows = []
    for d in range(10):
        for i in range(120):
            rows.append(
                Row(
                    ts=f"2024-03-{d + 1:02d} 06:00:00",
                    g=f"g{i % 2}",
                    v=float(1 + (i * 31 + d * 7) % 300),
                    w=float(1 + (i + d) % 6),
                )
            )
    df = spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "g", "v", "w"
    )
    state = sliding_dd_table(df, "ts", ["g"], "v", alpha=0.01, weight="w")
    got = {
        (r["g"], r["window"], r["q"]): r["est"]
        for r in sliding_dd_quantiles(
            state, ["g"], "2024-03-11 00:00:00",
            {"3d": "3 days", "7d": "7 days"}, [0.5, 0.9],
            alpha=0.01, weighted=True,
        ).collect()
    }
    for label, days in (("3d", 3), ("7d", 7)):
        span = df.filter(F.col("ts") >= f"2024-03-{11 - days:02d} 00:00:00")
        direct = {
            (r["g"], r["q"]): r["est"]
            for r in dd_quantiles_by(
                span, ["g"], "v", [0.5, 0.9], alpha=0.01, weight="w"
            ).collect()
        }
        for (g, q), est in direct.items():
            assert got[(g, label, q)] == est, (g, label, q)
