"""Sliding moments: window slices == direct builds, coarsen/merge
algebra, exact window stats, Python-free build plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.moments import moments_by, moments_quantiles
from hyper_spark.operators.sliding_moments import (
    sliding_moments_coarsen,
    sliding_moments_expire,
    sliding_moments_merge,
    sliding_moments_quantiles,
    sliding_moments_stats,
    sliding_moments_table,
)

T_REF = "2024-02-01 00:00:00"


def _rows(seed=7, n=4000):
    """Per-day lognormal latencies over January for two groups."""
    rng = np.random.default_rng(seed)
    days = rng.integers(1, 32, n)
    vals = np.exp(rng.normal(3.0, 1.0, n))
    return [
        Row(
            g=("a" if i % 2 == 0 else "b"),
            ts=f"2024-01-{int(d):02d} {int(i % 24):02d}:00:00",
            v=float(v),
        )
        for i, (d, v) in enumerate(zip(days, vals))
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))


def test_window_slice_matches_direct_build(spark):
    rows = _rows()
    df = _df(spark, rows)
    state = sliding_moments_table(df, "ts", ["g"], "v", k=6)
    est = sliding_moments_quantiles(
        state, ["g"], T_REF, {"7d": "7 days", "all": "40 days"}, [0.5, 0.9]
    ).collect()
    # direct build over the same trailing-window rows
    for label, days in (("7d", 7), ("all", 40)):
        cut = f"2024-01-{32 - days:02d} 00:00:00" if days < 31 else "2023-12-31"
        sub = df.filter(F.col("ts") >= F.lit(cut).cast("timestamp"))
        direct = {
            (r["g"], r["q"]): r["value"]
            for r in moments_quantiles(
                moments_by(sub, ["g"], "v", k=6), ["g"], [0.5, 0.9]
            ).collect()
        }
        for r in est:
            if r["window"] != label:
                continue
            assert r["value"] == pytest.approx(
                direct[(r["g"], r["q"])], rel=1e-9
            ), (label, r["g"], r["q"])


def test_window_stats_exact_vs_numpy(spark):
    rows = _rows(seed=3)
    df = _df(spark, rows)
    state = sliding_moments_table(df, "ts", ["g"], "v", k=4, log_moments=False)
    st = {
        (r["g"], r["window"]): r
        for r in sliding_moments_stats(
            state, ["g"], T_REF, {"7d": "7 days"}
        ).collect()
    }
    for g in ("a", "b"):
        data = np.array(
            [r.v for r in rows if r.g == g and r.ts >= "2024-01-25 00:00:00"]
        )
        row = st[(g, "7d")]
        assert row["n"] == len(data)
        assert row["mean"] == pytest.approx(float(np.mean(data)), rel=1e-9)
        assert row["variance"] == pytest.approx(float(np.var(data)), rel=1e-9)


def test_merge_and_coarsen_lossless_for_aligned_windows(spark):
    rows = _rows(seed=11)
    df = _df(spark, rows)
    full = sliding_moments_table(df, "ts", ["g"], "v", k=4)
    # shard merge: two halves regroup to the full state
    h1 = sliding_moments_table(df.filter(F.dayofmonth("ts") <= 15), "ts", ["g"], "v", k=4)
    h2 = sliding_moments_table(df.filter(F.dayofmonth("ts") > 15), "ts", ["g"], "v", k=4)
    merged = sliding_moments_merge([h1, h2], ["g"])
    direct = {(r["g"], r["bucket_ts"]): r for r in full.collect()}
    for r in merged.collect():
        d = direct[(r["g"], r["bucket_ts"])]
        assert r["n"] == d["n"] and r["mn"] == d["mn"] and r["mx"] == d["mx"]
        for i in range(1, 5):
            assert r[f"m{i}"] == pytest.approx(d[f"m{i}"], rel=1e-12)
    # coarsen to 10-day archive at an aligned cutoff; the aligned
    # window's summed sketch matches the fine state's
    coarse = sliding_moments_coarsen(full, ["g"], "2024-01-18 00:00:00", "10 days")
    assert coarse.count() < full.count()
    for st in (full, coarse):
        est = sliding_moments_stats(st, ["g"], T_REF, {"14d": "14 days"})
        vals = {r["g"]: (r["n"], r["mean"]) for r in est.collect()}
        if st is full:
            fine_vals = vals
        else:
            for g, (n, mean) in vals.items():
                assert n == fine_vals[g][0]
                assert mean == pytest.approx(fine_vals[g][1], rel=1e-12)


def test_expire_drops_only_old_buckets(spark):
    df = _df(spark, _rows(seed=5))
    state = sliding_moments_table(df, "ts", ["g"], "v", k=4)
    kept = sliding_moments_expire(state, "2024-01-20 00:00:00")
    assert kept.filter(F.col("bucket_ts") < "2024-01-20").count() == 0
    assert kept.count() == state.filter(F.col("bucket_ts") >= "2024-01-20").count()


def test_guards_and_python_free_plan(spark):
    df = _df(spark, _rows(seed=1, n=50))
    with pytest.raises(ValueError, match="k must be"):
        sliding_moments_table(df, "ts", ["g"], "v", k=1)
    with pytest.raises(ValueError, match="no states"):
        sliding_moments_merge([], ["g"])
    state = sliding_moments_table(df, "ts", ["g"], "v", k=6)
    with pytest.raises(ValueError, match="not a sliding moments state"):
        sliding_moments_merge([state.select("g", "bucket_ts", "n")], ["g"])
    plan = state._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan
    # the stats query path is also pure codegen
    stats_plan = (
        sliding_moments_stats(state, ["g"], T_REF, {"7d": "7 days"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in stats_plan
