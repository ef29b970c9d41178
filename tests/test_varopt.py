"""VarOpt systematic-PPS sampling: python-oracle parity, exact sample
size, heavy retention, unbiasedness, determinism, merge, guards, plan."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.varopt import (
    varopt_merge,
    varopt_sample_by,
    varopt_subset_sum,
)


def _u(key, seed) -> float:
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8]
    return (int(h, 16) + 1) / 2**32


def _hv(item, seed) -> int:
    return int(hashlib.md5(f"{item}:{seed}".encode()).hexdigest()[:8], 16)


def _py_varopt(weights: dict, k: int, seed=0, group_key=""):
    """Reference replica of the module's deterministic arithmetic:
    top-k waterfilled tau, heavies exact, systematic PPS over the
    md5-shuffled light line. Returns {item: (w, adjusted, tau)}."""
    n = len(weights)
    if n <= k:
        return {i: (float(w), float(w), 0.0) for i, w in weights.items()}
    W = sum(weights.values())
    ranked = sorted(weights.items(), key=lambda t: (-t[1], str(t[0])))
    C = 0
    tau = None
    for rn, (i, w) in enumerate(ranked[:k], start=1):
        C += w
        if w * (k - rn + 1) <= W - C + w:
            tau = float(W - C + w) / float(k - rn + 1)
            break
    assert tau is not None
    out = {
        i: (float(w), float(w), tau)
        for i, w in weights.items()
        if w > tau
    }
    lights = sorted(
        ((i, w) for i, w in weights.items() if w <= tau),
        key=lambda t: (_hv(t[0], seed), str(t[0])),
    )
    u0 = _u(group_key, f"{seed}:off") * tau
    c = 0
    for i, w in lights:
        c += w
        if math.floor((float(c) - u0) / tau) > math.floor(
            (float(c) - w - u0) / tau
        ):
            out[i] = (float(w), tau, tau)
    return out


def _rows(n=400):
    return [Row(item=f"it{i:04d}", w=1 + (7919 * i) % 50) for i in range(n)]


@pytest.mark.parametrize("seed", [0, 3, "s7"])
def test_matches_python_oracle_exactly(spark, seed):
    rows = _rows()
    # count path: each item repeated w times so weight=None counts
    flat = [Row(item=r.item) for r in rows for _ in range(r.w)]
    df = spark.createDataFrame(flat)
    got = varopt_sample_by(df, "item", k=25, seed=seed).collect()
    ref = _py_varopt({r.item: r.w for r in rows}, 25, seed=seed)
    assert {r["item"] for r in got} == set(ref)
    for r in got:
        w, adj, tau = ref[r["item"]]
        assert r["w"] == w
        assert math.isclose(r["adjusted"], adj, rel_tol=0, abs_tol=0)
        assert math.isclose(r["tau"], tau, rel_tol=0, abs_tol=0)


def test_grouped_parity_and_exact_size(spark):
    rows = [
        Row(g=f"g{j}", item=f"it{i:04d}", w=1 + ((7919 + j) * i) % 40)
        for j in range(3)
        for i in range(150 + 40 * j)
    ]
    df = spark.createDataFrame(
        [Row(g=r.g, item=r.item) for r in rows for _ in range(r.w)]
    )
    k = 20
    got = varopt_sample_by(df, "item", k=k, by=["g"], seed=1).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, {})[r.item] = r.w
    for g, weights in by_g.items():
        ref = _py_varopt(weights, k, seed=1, group_key=g)
        mine = {r["item"]: r for r in got if r["g"] == g}
        assert set(mine) == set(ref), g
        assert len(mine) == k  # n > k in every group: exactly k rows
        for i, (w, adj, tau) in ref.items():
            assert mine[i]["adjusted"] == adj and mine[i]["tau"] == tau


def test_exact_when_k_covers_group(spark):
    rows = _rows(30)
    df = spark.createDataFrame(rows)
    s = varopt_sample_by(df, "item", weight="w", k=64)
    out = s.collect()
    assert len(out) == 30
    assert all(r["tau"] == 0.0 and r["adjusted"] == r["w"] for r in out)
    est = varopt_subset_sum(s, F.lit(True)).collect()[0]
    assert est["est_sum"] == sum(r.w for r in rows)


def test_heavies_always_kept_and_equal_weights_degenerate(spark):
    # one whale + uniform shrimp: the whale must be in every sample
    rows = [Row(item="whale", w=10_000)] + [
        Row(item=f"s{i:03d}", w=2) for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    for seed in range(4):
        got = {
            r["item"]: r
            for r in varopt_sample_by(
                df, "item", weight="w", k=16, seed=seed
            ).collect()
        }
        assert "whale" in got and got["whale"]["adjusted"] == 10_000.0
        assert len(got) == 16
    # all-equal weights, n > k: tau = W/k, every item light, size == k
    eq = spark.createDataFrame([Row(item=f"e{i:03d}", w=5) for i in range(100)])
    out = varopt_sample_by(eq, "item", weight="w", k=10, seed=2).collect()
    assert len(out) == 10
    assert all(math.isclose(r["tau"], 50.0) for r in out)


def test_reference_unbiased_over_seeds():
    # HT unbiasedness of the systematic selection, measured on the
    # pure-python replica (cheap): mean est over many seeds -> truth
    weights = {f"it{i:04d}": 1 + (7919 * i) % 50 for i in range(300)}
    subset = {i for i in weights if int(i[2:]) % 3 == 0}
    true = sum(weights[i] for i in subset)
    k = 40
    tot = 0.0
    n_seeds = 2000
    for s in range(n_seeds):
        samp = _py_varopt(weights, k, seed=s)
        tot += sum(adj for i, (w, adj, tau) in samp.items() if i in subset)
        # fixed size every draw
        assert len(samp) == k
    assert tot / n_seeds == pytest.approx(true, rel=0.02)


def test_partitioning_invariance(spark):
    flat = [Row(item=r.item) for r in _rows(250) for _ in range(r.w)]
    df = spark.createDataFrame(flat)
    a = sorted(
        map(tuple, varopt_sample_by(df.repartition(3), "item", k=30).collect())
    )
    b = sorted(
        map(tuple, varopt_sample_by(df.repartition(17), "item", k=30).collect())
    )
    assert a == b


def test_merge_disjoint_shards(spark):
    rows = _rows(600)
    shard_a = spark.createDataFrame(
        [r for i, r in enumerate(rows) if i < 300]
    )
    shard_b = spark.createDataFrame(
        [r for i, r in enumerate(rows) if i >= 300]
    )
    sa = varopt_sample_by(shard_a, "item", weight="w", k=40, seed=5)
    sb = varopt_sample_by(shard_b, "item", weight="w", k=40, seed=5)
    merged = varopt_merge([sa, sb], "item", k=40, seed="m1")
    out = merged.collect()
    assert len(out) == 40
    assert set(merged.columns) == {"item", "w", "adjusted", "tau"}
    # total estimate from the merged sketch is in the right ballpark
    est = varopt_subset_sum(merged, F.lit(True)).collect()[0]["est_sum"]
    true = sum(r.w for r in rows)
    assert est == pytest.approx(true, rel=0.30)


def test_guards_and_plan(spark):
    df = spark.createDataFrame(_rows(50))
    with pytest.raises(ValueError):
        varopt_sample_by(df, "item", k=0)
    plan = varopt_sample_by(
        df, "item", weight="w", k=8, seed=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_nan_weight_rows_excluded(spark):
    """A NaN-weight row must not poison its item's summed weight (NaN
    passes `> 0` in Spark SQL) — the sample equals the clean-data run."""
    from pyspark.sql import Row

    from hyper_spark.operators.varopt import varopt_sample_by

    clean = [Row(g="a", item=f"i{j}", w=float(1 + j % 5)) for j in range(40)]
    dirty = clean + [Row(g="a", item="i3", w=float("nan"))]
    ref = sorted(
        (r["item"], r["w"]) for r in
        varopt_sample_by(spark.createDataFrame(clean), "item", "w", k=8, by=["g"]).collect()
    )
    got = sorted(
        (r["item"], r["w"]) for r in
        varopt_sample_by(spark.createDataFrame(dirty), "item", "w", k=8, by=["g"]).collect()
    )
    assert got == ref
