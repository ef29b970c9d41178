"""Exponential decay: exact weights, merge additivity, trending flip,
interval parsing, guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.decay import decayed_counts, decayed_topk

T0 = "2024-03-01 00:00:00"


def _ts(minutes: float) -> str:
    m, s = divmod(int(minutes * 60), 60)
    h, m = divmod(m, 60)
    return f"2024-03-01 {h:02d}:{m:02d}:{s:02d}"


def _df(spark, rows):
    return spark.createDataFrame(rows, "ts string, v string").select(
        F.col("ts").cast("timestamp").alias("ts"), "v"
    )


def test_exact_weights_vs_python(spark):
    rows = [Row(ts=_ts(m), v=f"x{m % 3}") for m in range(0, 120, 7)]
    df = _df(spark, rows)
    ref = _ts(120)
    hl = 1800.0  # 30 min
    got = {
        r["v"]: r["decayed_count"]
        for r in decayed_counts(df, "ts", "v", hl, t_ref=ref).collect()
    }
    exact: dict[str, float] = {}
    ref_s = 120 * 60
    for r in rows:
        m = int(r.ts.split(":")[1]) + 60 * int(r.ts.split(" ")[1].split(":")[0])
        dt = ref_s - m * 60
        exact[r.v] = exact.get(r.v, 0.0) + 2.0 ** (-dt / hl)
    for v, e in exact.items():
        assert math.isclose(got[v], e, rel_tol=1e-12), (v, got[v], e)


def test_recency_beats_frequency(spark):
    """'old' appears 20x an hour ago, 'new' 5x in the last minute —
    with a 5-minute half-life, new trends above old (the window-free
    trending semantics); with a huge half-life, raw frequency wins."""
    rows = [Row(ts=_ts(0 + i * 0.2), v="old") for i in range(20)]
    rows += [Row(ts=_ts(59 + i * 0.2), v="new") for i in range(5)]
    df = _df(spark, rows)
    top_fast = decayed_topk(df, "ts", "v", 300.0, k=1).collect()[0]["v"]
    top_slow = decayed_topk(df, "ts", "v", 1e9, k=1).collect()[0]["v"]
    assert top_fast == "new" and top_slow == "old"


def test_merge_additivity_and_parallelism_invariance(spark):
    """Scores from two disjoint halves sum exactly to the full score
    (origin-anchored partials are plain additive), and repartitioning
    changes nothing beyond float addition order (~1 ulp)."""
    rows = [Row(ts=_ts(m * 1.5), v=f"x{m % 4}") for m in range(80)]
    df = _df(spark, rows)
    ref = _ts(200)
    whole = {
        r["v"]: r["decayed_count"]
        for r in decayed_counts(df, "ts", "v", 600.0, t_ref=ref).collect()
    }
    a = df.filter(F.minute("ts") % 2 == 0)
    b = df.subtract(a)
    pa = {
        r["v"]: r["decayed_count"]
        for r in decayed_counts(a, "ts", "v", 600.0, t_ref=ref).collect()
    }
    pb = {
        r["v"]: r["decayed_count"]
        for r in decayed_counts(b, "ts", "v", 600.0, t_ref=ref).collect()
    }
    for v, s in whole.items():
        assert math.isclose(pa.get(v, 0.0) + pb.get(v, 0.0), s, rel_tol=1e-9)
    rep = {
        r["v"]: r["decayed_count"]
        for r in decayed_counts(
            df.repartition(13), "ts", "v", 600.0, t_ref=ref
        ).collect()
    }
    for v, s in whole.items():
        assert math.isclose(rep[v], s, rel_tol=1e-12)


def test_grouped_topk_and_interval_string(spark):
    rows = [
        Row(ts=_ts(i * 2.0), v=f"x{i % 5}", g=f"g{i % 2}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "ts string, v string, g string").select(
        F.col("ts").cast("timestamp").alias("ts"), "v", "g"
    )
    out = decayed_topk(df, "ts", "v", "30 minutes", k=2, by=["g"]).collect()
    per_g = {}
    for r in out:
        per_g.setdefault(r["g"], []).append(r)
    assert set(per_g) == {"g0", "g1"}
    for g, rs in per_g.items():
        assert len(rs) == 2
        assert rs[0]["decayed_count"] >= rs[1]["decayed_count"]


def test_guards(spark):
    df = _df(spark, [Row(ts=_ts(0), v="x")])
    with pytest.raises(ValueError):
        decayed_counts(df, "ts", "v", 0.0)
    empty = df.filter(F.lit(False))
    with pytest.raises(ValueError):
        decayed_counts(empty, "ts", "v", 60.0)
    # pinned t_ref makes empty input fine (zero rows out)
    assert decayed_counts(empty, "ts", "v", 60.0, t_ref=T0).count() == 0


def test_plan_is_one_jvm_aggregate(spark):
    df = _df(spark, [Row(ts=_ts(i), v=f"x{i}") for i in range(10)])
    plan = (
        decayed_counts(df, "ts", "v", 60.0, t_ref=T0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1
