"""Sliding-window Theta/KMV (operators/sliding_theta.py): exact-below-k
contract, kernel bit-parity when saturated, cross-range set algebra,
lossless merge, expiry, guards, plan hygiene."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hyper_spark.kernel.theta import ThetaSketch, theta_rse
from hyper_spark.operators.sliding_theta import (
    sliding_theta_estimates,
    sliding_theta_expire,
    sliding_theta_merge,
    sliding_theta_overlap,
    sliding_theta_table,
)

T_REF = "2024-01-29 00:00:00"
WINDOWS = {"7d": "7 days", "28d": "28 days"}


def _rows(n_days=28, per_day=400, pool=800):
    rows = []
    for d in range(n_days):
        for i in range(per_day):
            rows.append(
                (
                    f"2024-01-{d + 1:02d} 08:00:00",
                    f"g{i % 2}",
                    (d * 13 + i) % pool,
                )
            )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, grp string, uid int"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _exact_windows(rows):
    out = defaultdict(set)
    ref = datetime(2024, 1, 29)
    for ts, g, u in rows:
        day = datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
        for lab, days in (("7d", 7), ("28d", 28)):
            if (ref - day).total_seconds() <= days * 86400:
                out[(g, lab)].add(u)
    return out


def test_exact_below_k(spark):
    rows = _rows()
    state = sliding_theta_table(
        _df(spark, rows), "ts", ["grp"], "uid", k=2048, grain="1 day"
    )
    exact = _exact_windows(rows)
    got = sliding_theta_estimates(state, ["grp"], T_REF, WINDOWS).collect()
    assert len(got) == 4
    for r in got:
        assert r["exact"]
        assert r["estimate"] == float(len(exact[(r["grp"], r["window"])]))
        assert r["n_entries"] == len(exact[(r["grp"], r["window"])])


def test_saturated_matches_kernel_and_bound(spark):
    k = 256
    rows = _rows()
    state = sliding_theta_table(
        _df(spark, rows), "ts", [], "uid", k=k, grain="1 day"
    ).cache()
    got = sliding_theta_estimates(
        state, [], T_REF, {"28d": "28 days"}
    ).collect()[0]
    hs = [r["h"] for r in state.select("h").distinct().collect()]
    kernel = ThetaSketch.from_signed_hashes(k, hs).estimate()
    assert got["estimate"] == pytest.approx(kernel, rel=1e-12)
    assert not got["exact"]
    true = len({u for _, _, u in rows})
    assert abs(got["estimate"] - true) / true <= 3 * theta_rse(k)


def test_overlap_exact_counts(spark):
    rows = _rows()
    state = sliding_theta_table(
        _df(spark, rows), "ts", ["grp"], "uid", k=2048, grain="1 day"
    )
    ra = ("2024-01-15 00:00:00", "2024-01-22 00:00:00")
    rb = ("2024-01-22 00:00:00", "2024-01-29 00:00:00")
    sets: dict = defaultdict(set)
    for ts, g, u in rows:
        d = datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
        if datetime(2024, 1, 15) <= d < datetime(2024, 1, 22):
            sets[(g, "a")].add(u)
        if datetime(2024, 1, 22) <= d < datetime(2024, 1, 29):
            sets[(g, "b")].add(u)
    for r in sliding_theta_overlap(state, ["grp"], ra, rb).collect():
        A, B = sets[(r["grp"], "a")], sets[(r["grp"], "b")]
        assert r["exact"]
        assert r["est_a"] == len(A) and r["est_b"] == len(B)
        assert r["intersect_est"] == len(A & B)
        assert r["union_est"] == len(A | B)
        assert r["jaccard"] == pytest.approx(len(A & B) / len(A | B))


def test_overlap_global_and_disjoint_group(spark):
    """No-keys path, plus a group present in only one range."""
    rows = [("2024-01-10 00:00:00", "only_a", 9999)] + [
        (f"2024-01-{d:02d} 00:00:00", "both", u)
        for d in (10, 20)
        for u in range(50)
    ]
    state = sliding_theta_table(
        _df(spark, rows), "ts", ["grp"], "uid", k=512, grain="1 day"
    )
    ra = ("2024-01-09 00:00:00", "2024-01-12 00:00:00")
    rb = ("2024-01-19 00:00:00", "2024-01-22 00:00:00")
    by_g = {
        r["grp"]: r
        for r in sliding_theta_overlap(state, ["grp"], ra, rb).collect()
    }
    assert by_g["only_a"]["est_a"] == 1.0
    assert by_g["only_a"]["est_b"] == 0.0
    assert by_g["only_a"]["intersect_est"] == 0.0
    assert by_g["both"]["intersect_est"] == 50.0
    g = sliding_theta_overlap(state, [], ra, rb).collect()
    assert len(g) == 1 and g[0]["intersect_est"] == 50.0
    assert g[0]["est_a"] == 51.0 and g[0]["union_est"] == 51.0


def test_merge_and_expire(spark):
    rows = _rows()
    df = _df(spark, rows)
    direct = sliding_theta_table(df, "ts", ["grp"], "uid", k=1024)
    shards = [
        sliding_theta_table(
            df.filter(F.col("uid") % 3 == i), "ts", ["grp"], "uid", k=1024
        )
        for i in range(3)
    ]
    merged = sliding_theta_merge(shards, ["grp"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    kept = sliding_theta_expire(direct, "2024-01-22 00:00:00")
    a = sliding_theta_estimates(kept, ["grp"], T_REF, {"7d": "7 days"})
    b = sliding_theta_estimates(direct, ["grp"], T_REF, {"7d": "7 days"})
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_guards(spark):
    rows = _rows(n_days=2, per_day=40)
    df = _df(spark, rows)
    with pytest.raises(ValueError, match="k must be"):
        sliding_theta_table(df, "ts", [], "uid", k=2)
    s1 = sliding_theta_table(df, "ts", [], "uid", k=64)
    s2 = sliding_theta_table(df, "ts", [], "uid", k=128)
    with pytest.raises(ValueError, match="mixed"):
        sliding_theta_estimates(
            s1.unionByName(s2), [], T_REF, {"7d": "7 days"}
        )
    with pytest.raises(ValueError, match="empty"):
        sliding_theta_estimates(
            s1.filter("false"), [], T_REF, {"7d": "7 days"}
        )
    with pytest.raises(ValueError, match="no states"):
        sliding_theta_merge([], [])


def test_plans_python_free(spark):
    rows = _rows(n_days=3, per_day=60)
    state = sliding_theta_table(_df(spark, rows), "ts", ["grp"], "uid", k=64)
    plans = [
        state._jdf.queryExecution().executedPlan().toString(),
        sliding_theta_estimates(state, ["grp"], T_REF, WINDOWS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
        sliding_theta_overlap(
            state,
            ["grp"],
            ("2024-01-01 00:00:00", "2024-01-02 00:00:00"),
            ("2024-01-02 00:00:00", "2024-01-04 00:00:00"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
    ]
    for plan in plans:
        for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas"):
            assert marker not in plan


def test_coarsen_preserves_aligned_windows(spark):
    """Day buckets older than the cutoff re-bucket to epoch-aligned
    10-day archive buckets; k-min of unioned fine k-mins equals k-min
    of the coarse raw set, so aligned windows (oldest edge Jan 8/18)
    estimate bit-identically from the smaller state. Covers both the
    exact (k=2048) and saturated (k=256) regimes."""
    from hyper_spark.operators.sliding_theta import sliding_theta_coarsen

    rows = _rows()
    df = _df(spark, rows)
    for k in (2048, 256):
        state = sliding_theta_table(
            df, "ts", ["grp"], "uid", k=k, grain="1 day"
        )
        coarse = sliding_theta_coarsen(
            state, ["grp"], "2024-01-18 00:00:00", "10 days"
        )
        assert (
            coarse.select("bucket_ts").distinct().count()
            < state.select("bucket_ts").distinct().count()
        )
        wins = {"11d": "11 days", "21d": "21 days", "45d": "45 days"}
        a = sliding_theta_estimates(coarse, ["grp"], T_REF, wins)
        b = sliding_theta_estimates(state, ["grp"], T_REF, wins)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        ), k
