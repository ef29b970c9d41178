"""Sliding HLL: front correctness vs python reference, aligned-window
bit-parity with batch sketches, merge/expiry losslessness, plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.kernel.hll import error_bound
from hyper_spark.operators.hll_agg import approx_distinct
from hyper_spark.operators.sliding_hll import (
    sliding_estimates,
    sliding_expire,
    sliding_merge,
    sliding_register_table,
)

P = 12
T_REF = "2024-04-11 00:00:00"


def _rows(n=6000):
    # 10 days of events, user ids revisiting with a drifting pool so
    # different windows see genuinely different cardinalities
    out = []
    for i in range(n):
        day = (i * 7919) % 10
        hour = (i * 13) % 24
        uid = (i * 31) % (300 + 100 * day)
        out.append(
            Row(
                ts=f"2024-04-{day + 1:02d} {hour:02d}:{i % 60:02d}:00",
                user=f"u{uid}",
            )
        )
    return out


def _typed(spark, rows):
    return spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "user"
    )


def test_aligned_windows_bit_match_batch_sketch(spark):
    df = _typed(spark, _rows())
    state = sliding_register_table(df, "ts", [], "user", p=P, grain="1 day")
    ests = {
        r["window"]: r["estimate"]
        for r in sliding_estimates(
            state, [], T_REF,
            {"3d": "3 days", "7d": "7 days", "30d": "30 days"}, P,
        ).collect()
    }
    for lab, days in [("3d", 3), ("7d", 7), ("30d", 30)]:
        lo = f"2024-04-{max(11 - days, 1):02d} 00:00:00"
        sliced = df.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
        batch = approx_distinct(sliced, [], "user", p=P).collect()[0][
            "estimate"
        ]
        assert ests[lab] == batch, (lab, ests[lab], batch)  # bit-identical
        exact = sliced.select("user").distinct().count()
        assert abs(ests[lab] - exact) / exact <= 3 * error_bound(P)


def test_front_matches_python_reference(spark):
    import hashlib

    rows = _rows(1500)
    df = _typed(spark, rows)
    state = sliding_register_table(df, "ts", [], "user", p=P, grain="1 day")
    got = {
        (r["idx"], str(r["bucket_ts"])): r["rho"] for r in state.collect()
    }
    # python reference: bucket-max then strict Pareto front per register
    buckets: dict = {}
    for r in rows:
        h = int.from_bytes(
            hashlib.sha1(r.user.encode()).digest()[:4], "big"
        )
        idx = h >> (32 - P)
        window = (h >> (32 - 2 * P)) & ((1 << P) - 1)
        rho = P + 1 if window == 0 else P + 1 - window.bit_length()
        day = r.ts.split(" ")[0] + " 00:00:00"
        k = (idx, day)
        buckets[k] = max(buckets.get(k, 0), rho)
    front = {}
    for (idx, day), rho in buckets.items():
        later_max = max(
            (v for (i2, d2), v in buckets.items() if i2 == idx and d2 > day),
            default=0,
        )
        if rho > later_max:
            front[(idx, day)] = rho
    assert got == front


def test_merge_and_expiry_lossless(spark):
    df = _typed(spark, _rows())
    direct = sliding_register_table(df, "ts", [], "user", p=P, grain="1 day")
    # split NOT on a bucket boundary: merge must re-run the bucket max
    a = df.filter(F.hour("ts") < 13)
    b = df.subtract(a)
    merged = sliding_merge(
        [
            sliding_register_table(x, "ts", [], "user", p=P, grain="1 day")
            for x in (a, b)
        ],
        [],
    )
    d = {(r["idx"], str(r["bucket_ts"])): r["rho"] for r in direct.collect()}
    m = {(r["idx"], str(r["bucket_ts"])): r["rho"] for r in merged.collect()}
    assert d == m
    # expiry: dropping buckets older than the 7d horizon leaves 7d/3d
    # queries bit-identical
    kept = sliding_expire(direct, "2024-04-04 00:00:00")
    full = sliding_estimates(
        direct, [], T_REF, {"3d": "3 days", "7d": "7 days"}, P
    ).collect()
    trimmed = sliding_estimates(
        kept, [], T_REF, {"3d": "3 days", "7d": "7 days"}, P
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, trimmed))


def test_grouped_state_and_estimates(spark):
    rows = [
        Row(ts=r.ts, user=r.user, g=f"g{int(r.user[1:]) % 2}")
        for r in _rows(3000)
    ]
    df = spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "user", "g"
    )
    state = sliding_register_table(df, "ts", ["g"], "user", p=P, grain="1 day")
    out = sliding_estimates(state, ["g"], T_REF, {"7d": "7 days"}, P).collect()
    assert {r["g"] for r in out} == {"g0", "g1"}
    for r in out:
        sliced = df.filter(
            (F.col("g") == r["g"])
            & (F.col("ts") >= F.lit("2024-04-04 00:00:00").cast("timestamp"))
        )
        exact = sliced.select("user").distinct().count()
        assert abs(r["estimate"] - exact) / exact <= 3 * error_bound(P)


def test_front_is_compact(spark):
    """Dominated buckets are gone: per register, rhos strictly decrease
    as buckets get later... i.e. strictly increase toward the past."""
    df = _typed(spark, _rows())
    state = sliding_register_table(df, "ts", [], "user", p=P, grain="1 day")
    per_reg: dict = {}
    for r in state.collect():
        per_reg.setdefault(r["idx"], []).append(
            (str(r["bucket_ts"]), r["rho"])
        )
    n_buckets = 10
    for idx, entries in per_reg.items():
        entries.sort()  # by bucket_ts asc
        rhos = [rho for _, rho in entries]
        assert all(a > b for a, b in zip(rhos, rhos[1:])), (idx, entries)
        assert len(entries) <= n_buckets


def test_build_plan_python_free(spark):
    df = _typed(spark, _rows(500))
    plan = (
        sliding_register_table(df, "ts", [], "user", p=P, grain="1 day")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_coarsen_preserves_aligned_windows(spark):
    """Day buckets older than the cutoff re-bucket to 10-day archive
    buckets; a window whose oldest edge sits on the archive boundary
    estimates bit-identically from the smaller state."""
    from hyper_spark.operators.sliding_hll import (
        sliding_coarsen,
        sliding_estimates,
        sliding_register_table,
    )

    p = 12
    # per-day churned users: old days hold registers no later day
    # re-hits, so the Pareto front RETAINS archive entries to coarsen
    rows = [
        (f"2024-01-{d + 1:02d} 09:00:00", f"u{d}_{i}")
        for d in range(30)
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "ts string, u string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    state = sliding_register_table(df, "ts", [], "u", p=p, grain="1 day")
    # F.window('10 days') starts are epoch-aligned: ...Jan 8, 18, 28.
    # Coarsen at the Jan 18 boundary; query windows whose cutoffs are
    # Jan 18 (13d), Jan 8 (23d), and before all data (45d)
    coarse = sliding_coarsen(state, [], "2024-01-18 00:00:00", "10 days")
    # the front already thins history to ~one entry per (idx, level),
    # so ROW count may not drop; the archive's bucket GRANULARITY must
    # (17 fine buckets re-bucket to 2 coarse ones here)
    assert coarse.count() <= state.count()
    assert (
        coarse.select("bucket_ts").distinct().count()
        < state.select("bucket_ts").distinct().count()
    )
    wins = {"13d": "13 days", "23d": "23 days", "45d": "45 days"}
    t_ref = "2024-01-31 00:00:00"
    a = sorted(
        map(tuple, sliding_estimates(state, [], t_ref, wins, p).collect())
    )
    b = sorted(
        map(tuple, sliding_estimates(coarse, [], t_ref, wins, p).collect())
    )
    assert a == b
