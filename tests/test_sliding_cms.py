"""Sliding-window count-min heavy hitters (operators/sliding_cms.py):
exact top-k at collision-free width, CMS bounds under collisions,
lossless shard merge, expiry, candidate guarantee, guards, plan."""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.sliding_cms import (
    sliding_cms_expire,
    sliding_cms_merge,
    sliding_cms_table,
    sliding_cms_topk,
)

T_REF = "2024-01-31 00:00:00"
WINDOWS = {"7d": "7 days", "30d": "30 days"}


def _rows(n_days=30, per_day=300):
    from bisect import bisect_right

    thresholds = [400, 650, 800, 890, 940, 970, 985, 995, 1000]
    rows = []
    for d in range(n_days):
        for i in range(per_day):
            # skewed over 9 items: shares 40/25/15/9/5/3/1.5/1/0.5 %
            x = (7919 * (d * per_day + i)) % 1000
            j = bisect_right(thresholds, x)
            rows.append(
                (f"2024-01-{d + 1:02d} 10:00:00", f"g{i % 2}", f"t{j:02d}")
            )
    return rows


def _exact(rows):
    ref = datetime(2024, 1, 31)
    exact: Counter = Counter()
    for ts, g, t in rows:
        day = datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
        for lab, days in (("7d", 7), ("30d", 30)):
            if (ref - day).total_seconds() <= days * 86400:
                exact[(g, lab, t)] += 1
    return exact


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, grp string, tool string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _topk_exact(exact, g, lab, k):
    items = sorted(
        ((t, c) for (gg, ll, t), c in exact.items() if gg == g and ll == lab),
        key=lambda tc: (-tc[1], tc[0]),
    )
    return items[:k]


def test_topk_matches_exact_at_wide_width(spark):
    rows = _rows()
    exact = _exact(rows)
    cells, cands = sliding_cms_table(
        _df(spark, rows), "ts", ["grp"], "tool", grain="1 day", width=4096, k=8
    )
    got = sliding_cms_topk(
        cells, cands, ["grp"], "tool", T_REF, WINDOWS, k=4
    ).collect()
    assert len(got) == 16  # 2 groups x 2 windows x 4
    for g in ("g0", "g1"):
        for lab in WINDOWS:
            have = sorted(
                (r["tool"], r["estimate"])
                for r in got
                if r["grp"] == g and r["window"] == lab
            )
            assert have == sorted(_topk_exact(exact, g, lab, 4)), (g, lab)


def test_bounds_under_collisions(spark):
    """width=8 forces collisions: estimates stay one-sided
    (exact <= est <= exact + eps*N per window)."""
    rows = _rows()
    exact = _exact(rows)
    cells, cands = sliding_cms_table(
        _df(spark, rows), "ts", [], "tool", grain="1 day", width=8, k=8
    )
    got = sliding_cms_topk(cells, cands, [], "tool", T_REF, WINDOWS, k=6)
    eps = math.e / 8
    n_w = {
        lab: sum(c for (g, ll, _t), c in exact.items() if ll == lab)
        for lab in WINDOWS
    }
    ex = Counter()
    for (g, lab, t), c in exact.items():
        ex[(lab, t)] += c
    for r in got.collect():
        true = ex[(r["window"], r["tool"])]
        assert true <= r["estimate"] <= true + eps * n_w[r["window"]], r


def test_merge_equals_direct(spark):
    rows = _rows()
    df = _df(spark, rows)
    direct = sliding_cms_table(df, "ts", ["grp"], "tool", grain="1 day", k=8)
    halves = [
        sliding_cms_table(
            df.filter(F.dayofmonth("ts") <= 15), "ts", ["grp"], "tool",
            grain="1 day", k=8,
        ),
        sliding_cms_table(
            df.filter(F.dayofmonth("ts") > 15), "ts", ["grp"], "tool",
            grain="1 day", k=8,
        ),
    ]
    mc, md = sliding_cms_merge(
        [h[0] for h in halves], [h[1] for h in halves], ["grp"]
    )
    a = sliding_cms_topk(mc, md, ["grp"], "tool", T_REF, WINDOWS, k=4)
    b = sliding_cms_topk(*direct, ["grp"], "tool", T_REF, WINDOWS, k=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_expire_preserves_covered_windows(spark):
    rows = _rows()
    cells, cands = sliding_cms_table(
        _df(spark, rows), "ts", ["grp"], "tool", grain="1 day", k=8
    )
    ec, ed = sliding_cms_expire(cells, cands, "2024-01-24 00:00:00")
    a = sliding_cms_topk(
        ec, ed, ["grp"], "tool", T_REF, {"7d": "7 days"}, k=4
    )
    b = sliding_cms_topk(
        cells, cands, ["grp"], "tool", T_REF, {"7d": "7 days"}, k=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_candidate_guarantee_share_item(spark):
    """An item with in-window share >= 1/k is emitted even at fanout=1
    with a hot head crowding the local top-k (Misra-Gries clause via
    one in-window bucket)."""
    rows = []
    for d in range(10):
        for i in range(400):
            rows.append((f"2024-01-{d + 21:02d} 09:00:00", "g0", "head"))
        # 'mid' holds share 100/500 = 1/5 >= 1/k (k=4) every day
        for i in range(100):
            rows.append((f"2024-01-{d + 21:02d} 09:30:00", "g0", "mid"))
    cells, cands = sliding_cms_table(
        _df(spark, rows).repartition(8), "ts", ["grp"], "tool",
        grain="1 day", k=4, fanout=1,
    )
    got = sliding_cms_topk(
        cells, cands, ["grp"], "tool", T_REF, {"7d": "7 days"}, k=4
    ).collect()
    tools = {r["tool"] for r in got}
    assert {"head", "mid"} <= tools


def test_guards(spark):
    rows = _rows(n_days=2, per_day=50)
    df = _df(spark, rows)
    c1, d1 = sliding_cms_table(df, "ts", [], "tool", width=64, k=4)
    c2, _ = sliding_cms_table(df, "ts", [], "tool", width=128, k=4)
    with pytest.raises(ValueError, match="mixed"):
        sliding_cms_topk(
            c1.unionByName(c2), d1, [], "tool", T_REF, {"7d": "7 days"}, k=3
        )
    with pytest.raises(ValueError, match="empty"):
        sliding_cms_topk(
            c1.filter("false"), d1, [], "tool", T_REF, {"7d": "7 days"}, k=3
        )
    with pytest.raises(ValueError, match="no states"):
        sliding_cms_merge([], [], [])


def test_plan_is_python_free(spark):
    rows = _rows(n_days=3, per_day=60)
    cells, cands = sliding_cms_table(
        _df(spark, rows), "ts", ["grp"], "tool", grain="1 day", k=4
    )
    plan = (
        sliding_cms_topk(cells, cands, ["grp"], "tool", T_REF, WINDOWS, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas"):
        assert marker not in plan


def test_coarsen_preserves_aligned_windows(spark):
    """Day cells older than the cutoff re-bucket to epoch-aligned
    10-day archive buckets; counter sums commute with re-bucketing, so
    windows whose oldest edge sits on an archive boundary (Jan 8/18)
    return identical top-k from the smaller state."""
    from hyper_spark.operators.sliding_cms import sliding_cms_coarsen

    rows = _rows()
    cells, cands = sliding_cms_table(
        _df(spark, rows), "ts", ["grp"], "tool", grain="1 day", k=8
    )
    cc, cd = sliding_cms_coarsen(
        cells, cands, ["grp"], "2024-01-18 00:00:00", "10 days"
    )
    assert (
        cc.select("bucket_ts").distinct().count()
        < cells.select("bucket_ts").distinct().count()
    )
    wins = {"13d": "13 days", "23d": "23 days", "45d": "45 days"}
    a = sliding_cms_topk(cc, cd, ["grp"], "tool", T_REF, wins, k=4)
    b = sliding_cms_topk(cells, cands, ["grp"], "tool", T_REF, wins, k=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
