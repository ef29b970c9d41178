"""Moments sketch: maxent rank accuracy, merge algebra, codegen plan.

Differential strategy (the DDSketch file's): estimates are checked by
RANK against the same data — |P(X <= est) - q| <= eps — because the
moments sketch's published contract is approximate rank, not value;
merge is checked as exact sum/min/max algebra against a single-pass
build; the build plan is asserted Python-free.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.kernel.moments import maxent_quantiles
from hyper_spark.operators.moments import (
    moments_by,
    moments_merge,
    moments_quantiles,
    moments_stats,
)

QS = [0.05, 0.25, 0.5, 0.75, 0.95]
EPS = 0.02  # operator-level rank-error contract (kernel measured <= 0.006)


def _rows(seed=7, n=3000):
    """Three groups with different shapes: lognormal latencies, uniform,
    and a signed bimodal mixture."""
    rng = np.random.default_rng(seed)
    rows = []
    for i, v in enumerate(np.exp(rng.normal(3.0, 1.0, n))):
        rows.append(Row(g="lognormal", v=float(v)))
    for v in rng.uniform(-5.0, 12.0, n):
        rows.append(Row(g="uniform", v=float(v)))
    for v in np.concatenate([rng.normal(0, 1, n // 2), rng.normal(9, 0.5, n // 2)]):
        rows.append(Row(g="bimodal", v=float(v)))
    return rows


def _rank_errors(rows, est_rows):
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r.v)
    errs = []
    for r in est_rows:
        data = np.asarray(by_g[r["g"]])
        errs.append(abs(float(np.mean(data <= r["value"])) - r["q"]))
    return errs


def test_rank_accuracy_per_group(spark):
    rows = _rows()
    df = spark.createDataFrame(rows)
    sk = moments_by(df, ["g"], "v", k=8)
    est = moments_quantiles(sk, ["g"], QS).collect()
    assert len(est) == 3 * len(QS)
    assert max(_rank_errors(rows, est)) <= EPS
    # estimates always inside [min, max]
    bounds = {r["g"]: (r["mn"], r["mx"]) for r in sk.collect()}
    for r in est:
        mn, mx = bounds[r["g"]]
        assert mn <= r["value"] <= mx


def test_merge_matches_single_build(spark):
    rows = _rows(seed=11)
    df = spark.createDataFrame(rows).withColumn(
        "half", (F.crc32(F.col("v").cast("string")) % 2).cast("int")
    )
    split = moments_by(df, ["g", "half"], "v", k=6)
    merged = moments_merge(split, ["g"]).collect()
    direct = {r["g"]: r for r in moments_by(df, ["g"], "v", k=6).collect()}
    assert len(merged) == 3
    for m in merged:
        d = direct[m["g"]]
        assert m["n"] == d["n"] and m["mn"] == d["mn"] and m["mx"] == d["mx"]
        for i in range(1, 7):
            assert m[f"m{i}"] == pytest.approx(d[f"m{i}"], rel=1e-12)
        assert m["n_pos"] == d["n_pos"]


def test_stats_match_numpy_and_nulls_skipped(spark):
    rng = np.random.default_rng(3)
    vals = rng.gamma(2.0, 10.0, 2000)
    rows = [Row(g="a", v=float(v)) for v in vals] + [Row(g="a", v=None)]
    sk = moments_by(spark.createDataFrame(rows), ["g"], "v", k=4)
    st = moments_stats(sk).collect()[0]
    assert st["n"] == len(vals)  # the NULL row did not count
    assert st["mean"] == pytest.approx(float(np.mean(vals)), rel=1e-9)
    assert st["variance"] == pytest.approx(float(np.var(vals)), rel=1e-9)
    mu = np.mean(vals)
    sd = np.sqrt(np.var(vals))
    assert st["skewness"] == pytest.approx(
        float(np.mean((vals - mu) ** 3) / sd**3), rel=1e-6
    )
    assert st["kurtosis"] == pytest.approx(
        float(np.mean((vals - mu) ** 4) / sd**4), rel=1e-6
    )


def test_degenerate_groups(spark):
    rows = [Row(g="const", v=42.0)] * 50 + [Row(g="one", v=-3.5)]
    sk = moments_by(spark.createDataFrame(rows), ["g"], "v", k=8)
    est = {(r["g"], r["q"]): r["value"] for r in
           moments_quantiles(sk, ["g"], [0.1, 0.9]).collect()}
    assert est[("const", 0.1)] == 42.0 and est[("const", 0.9)] == 42.0
    assert est[("one", 0.1)] == -3.5 and est[("one", 0.9)] == -3.5


def test_kernel_discrete_atom_fallback_bounded():
    """A 50%-mass atom defeats any smooth density (documented); the
    estimate must still come back finite and inside [min, max]."""
    rng = np.random.default_rng(5)
    data = np.where(rng.uniform(size=5000) < 0.5, 1.0, rng.uniform(2, 100, 5000))
    sums = np.array([np.sum(data**i) for i in range(1, 9)])
    est = maxent_quantiles(len(data), data.min(), data.max(), sums,
                           np.array([0.25, 0.75]))
    assert np.all(np.isfinite(est))
    assert np.all((est >= data.min()) & (est <= data.max()))


def test_guards(spark):
    df = spark.createDataFrame([Row(g="a", v=1.0)])
    with pytest.raises(ValueError, match="k must be"):
        moments_by(df, ["g"], "v", k=1)
    with pytest.raises(ValueError, match="k must be"):
        moments_by(df, ["g"], "v", k=13)
    sk = moments_by(df, ["g"], "v", k=8)
    with pytest.raises(ValueError, match="qs must be"):
        moments_quantiles(sk, ["g"], [])
    with pytest.raises(ValueError, match="qs must be"):
        moments_quantiles(sk, ["g"], [1.5])
    with pytest.raises(ValueError, match="not a moments sketch"):
        moments_merge(df.select("g"), ["g"])
    with pytest.raises(ValueError, match="stats need"):
        moments_stats(moments_by(df, ["g"], "v", k=2))


def test_build_plan_is_python_free(spark):
    df = spark.createDataFrame([Row(g="a", v=1.0)] * 10)
    plan = (
        moments_by(df, ["g"], "v", k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan


def test_ranks_inverse_of_quantiles_and_bounds(spark):
    rows = _rows(seed=17)
    df = spark.createDataFrame(rows)
    sk = moments_by(df, ["g"], "v", k=8)
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r.v)
    # query each group's true quartiles: estimated rank ~ true rank
    probe = {g: np.quantile(np.array(vs), [0.25, 0.5, 0.75]) for g, vs in by_g.items()}
    vals = sorted({float(v) for vs in probe.values() for v in vs})
    from hyper_spark.operators.moments import moments_ranks

    got = moments_ranks(sk, ["g"], vals).collect()
    for r in got:
        data = np.asarray(by_g[r["g"]])
        true = float(np.mean(data <= r["value"]))
        # values outside a group's [min,max] clamp to 0/1 exactly
        if r["value"] < data.min():
            assert r["rank"] == 0.0
        elif r["value"] > data.max():
            assert r["rank"] == 1.0
        else:
            assert abs(r["rank"] - true) <= EPS
    with pytest.raises(ValueError, match="non-empty"):
        moments_ranks(sk, ["g"], [])
