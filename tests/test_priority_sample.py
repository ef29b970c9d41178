"""Priority sampling: exactness below k, unbiased estimation accuracy,
python-oracle parity, shard merge, determinism, guards, plan."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.priority_sample import (
    priority_merge,
    priority_sample_by,
    priority_subset_sum,
)


def _u(item, seed=0) -> float:
    h = hashlib.md5(f"{item}:{seed}".encode()).hexdigest()[:8]
    return (int(h, 16) + 1) / 2**32


def _py_sample(weights: dict, k: int, seed=0):
    """Reference implementation straight from the DLT paper."""
    scored = sorted(
        ((w / _u(i, seed), i, w) for i, w in weights.items()),
        key=lambda t: (-t[0], t[1]),
    )
    tau = scored[k][0] if len(scored) > k else 0.0
    return {i: (w, q) for q, i, w in scored[:k]}, tau


def _rows(n=400):
    # zipf-ish integer weights over distinct items
    return [Row(item=f"it{i:04d}", w=1 + (7919 * i) % 50) for i in range(n)]


def test_matches_python_oracle_exactly(spark):
    rows = _rows()
    df = spark.createDataFrame(rows)
    got = priority_sample_by(
        df, "item", weight="w", k=25, seed=3
    ).collect()
    ref, tau = _py_sample({r.item: float(r.w) for r in rows}, 25, seed=3)
    assert {r["item"] for r in got} == set(ref)
    for r in got:
        w, q = ref[r["item"]]
        assert r["w"] == w
        assert math.isclose(r["priority"], q, rel_tol=0, abs_tol=0)
        assert math.isclose(r["threshold"], tau, rel_tol=0, abs_tol=0)


def test_exact_when_k_covers_group(spark):
    rows = _rows(30)
    df = spark.createDataFrame(rows)
    s = priority_sample_by(df, "item", weight="w", k=64)
    out = s.collect()
    assert len(out) == 30 and all(r["threshold"] == 0.0 for r in out)
    est = priority_subset_sum(s, F.lit(True)).collect()[0]
    assert est["est_sum"] == sum(r.w for r in rows)


def test_subset_sum_accuracy_and_count_semantics(spark):
    # weight=None counts rows: 5000 events over 250 users
    rows = [
        Row(user=f"u{(i * 13) % 250:03d}", g="g0") for i in range(5000)
    ]
    df = spark.createDataFrame(rows)
    s = priority_sample_by(df, "user", k=100, by=["g"], seed=1)
    cond = F.substring("user", 2, 3).cast("int") % 3 == 0
    est = priority_subset_sum(s, cond, by=["g"]).collect()[0]
    true = sum(
        1 for r in rows if int(r.user[1:]) % 3 == 0
    )
    assert est["est_sum"] == pytest.approx(true, rel=0.25)
    # estimator is exact on the total when k covers: k=300 > 250 users
    s_all = priority_sample_by(df, "user", k=300, by=["g"], seed=1)
    tot = priority_subset_sum(s_all, F.lit(True), by=["g"]).collect()[0]
    assert tot["est_sum"] == 5000.0


def test_shard_merge_equals_direct(spark):
    """Item-disjoint shards (the merge contract) re-merge to the exact
    direct sample: same items, same threshold, same estimates."""
    rows = _rows(600)
    df = spark.createDataFrame(rows)
    direct = priority_sample_by(df, "item", weight="w", k=40, seed=7)
    shards = [
        priority_sample_by(
            df.filter(F.crc32(F.col("item")) % 3 == i),
            "item",
            weight="w",
            k=40,
            seed=7,
        )
        for i in range(3)
    ]
    merged = priority_merge(shards, k=40)
    d = {(r["item"]): (r["w"], r["priority"], r["threshold"])
         for r in direct.collect()}
    m = {(r["item"]): (r["w"], r["priority"], r["threshold"])
         for r in merged.collect()}
    assert set(d) == set(m)
    for it, (w, q, tau_d) in d.items():
        assert m[it][0] == w and m[it][1] == q
        # merged tau >= direct tau always (DLT §4); equality whenever the
        # union still contains the global (k+1)-th priority item
        assert m[it][2] >= tau_d - 1e-15


def test_determinism_across_partitionings(spark):
    rows = _rows(500)
    df = spark.createDataFrame(rows)
    a = priority_sample_by(df, "item", weight="w", k=20, seed=5).collect()
    b = priority_sample_by(
        spark.createDataFrame(rows).repartition(17), "item", weight="w",
        k=20, seed=5,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_guards_and_plan(spark):
    df = spark.createDataFrame(_rows(50))
    with pytest.raises(ValueError):
        priority_sample_by(df, "item", k=0)
    with pytest.raises(ValueError):
        priority_merge([], k=5)
    plan = (
        priority_sample_by(df.withColumn("g", F.crc32("item") % 2),
                           "item", weight="w", k=10, by=["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_grouped_prune_partitioning_invariance(spark):
    """The grouped partition-local rank prune must be invisible: a
    skewed-group sample (one group holds 10x the items of the other)
    is identical at 1 partition (prune is a no-op — every group row
    sits in one partition) and at 16 partitions (prune active)."""
    rows = [
        Row(item=f"a{i:04d}", w=1 + (104729 * i) % 90, g="big")
        for i in range(1000)
    ] + [
        Row(item=f"b{i:04d}", w=1 + (7919 * i) % 90, g="small")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    one = priority_sample_by(
        df.coalesce(1), "item", weight="w", k=30, by=["g"], seed=11
    ).collect()
    many = priority_sample_by(
        df.repartition(16), "item", weight="w", k=30, by=["g"], seed=11
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
    assert len(one) == 60


def test_nan_weight_rows_excluded(spark):
    from pyspark.sql import Row

    from hyper_spark.operators.priority_sample import priority_sample_by

    clean = [Row(g="a", item=f"i{j}", w=float(1 + j % 5)) for j in range(40)]
    dirty = clean + [Row(g="a", item="i3", w=float("nan"))]
    ref = sorted(
        (r["item"], r["w"]) for r in
        priority_sample_by(spark.createDataFrame(clean), "item", "w", k=8, by=["g"]).collect()
    )
    got = sorted(
        (r["item"], r["w"]) for r in
        priority_sample_by(spark.createDataFrame(dirty), "item", "w", k=8, by=["g"]).collect()
    )
    assert got == ref
