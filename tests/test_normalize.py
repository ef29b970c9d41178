"""winsorize_by / robust_scale_by (operators/normalize.py): exact
bounds vs numpy, sketch bounds within the DD relative-error guarantee,
clip and scale contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.normalize import (
    group_bounds,
    robust_scale_by,
    winsorize_by,
)


def _df(spark):
    rng = np.random.default_rng(3)
    rows = []
    for g, scale in (("a", 10.0), ("b", 100.0)):
        for i, v in enumerate(rng.lognormal(0, 1, 400) * scale):
            rows.append(Row(g=g, i=i, v=float(v)))
    # a heavy outlier per group: winsorization's reason to exist
    rows.append(Row(g="a", i=400, v=1e9))
    rows.append(Row(g="b", i=400, v=1e9))
    return spark.createDataFrame(rows)


def test_winsorize_exact_matches_numpy(spark):
    df = _df(spark)
    pdf = df.toPandas()
    out = winsorize_by(df, "v", by=["g"], lower=0.05, upper=0.95).collect()
    for g in ("a", "b"):
        vals = pdf[pdf.g == g]["v"].to_numpy()
        lo = np.quantile(vals, 0.05, method="linear")
        hi = np.quantile(vals, 0.95, method="linear")
        got = [r for r in out if r["g"] == g]
        assert got[0]["lo"] == pytest.approx(lo, rel=1e-9)
        assert got[0]["hi"] == pytest.approx(hi, rel=1e-9)
        for r in got:
            orig = vals[r["i"]]
            assert r["v_w"] == pytest.approx(min(max(orig, lo), hi), rel=1e-9)
    # the outlier is clipped to hi in both groups
    clipped = {(r["g"], r["i"]): r for r in out}
    for g in ("a", "b"):
        r = clipped[(g, 400)]
        assert r["v_w"] == pytest.approx(r["hi"], rel=1e-9)


def test_sketch_bounds_within_relative_error(spark):
    df = _df(spark).filter(F.col("v") < 1e8)  # drop the planted outliers
    alpha = 0.01
    exact = {
        r["g"]: (r["q_0"], r["q_1"])
        for r in group_bounds(df, "v", ["g"], (0.25, 0.75), "exact").collect()
    }
    sk = {
        r["g"]: (r["q_0"], r["q_1"])
        for r in group_bounds(
            df, "v", ["g"], (0.25, 0.75), "sketch", alpha=alpha
        ).collect()
    }
    for g, (lo, hi) in exact.items():
        # DDSketch guarantee is relative error on the VALUE at a rank
        # within the bucket resolution; allow 2*alpha for the rank
        # convention difference between exact interpolation and the
        # sketch's floor-rank read
        assert abs(sk[g][0] - lo) / lo < 3 * alpha
        assert abs(sk[g][1] - hi) / hi < 3 * alpha


def test_robust_scale_contract(spark):
    df = _df(spark)
    out = robust_scale_by(df, "v", by=["g"]).collect()
    pdf = df.toPandas()
    for g in ("a", "b"):
        vals = pdf[pdf.g == g]["v"].to_numpy()
        med = np.quantile(vals, 0.5, method="linear")
        iqr = np.quantile(vals, 0.75, method="linear") - np.quantile(
            vals, 0.25, method="linear"
        )
        got = [r for r in out if r["g"] == g]
        assert got[0]["median"] == pytest.approx(med, rel=1e-9)
        assert got[0]["iqr"] == pytest.approx(iqr, rel=1e-9)
        # the scaled outlier is still huge (robust scaling tames the
        # CENTER, not the tail — that's winsorize's job), but the
        # median row scales to ~0
        near_med = min(got, key=lambda r: abs(r["v"] - med))
        assert abs(near_med["v_rs"]) < 0.01
    # constant group: IQR 0 -> NULL scale
    const = spark.createDataFrame([Row(g="c", i=i, v=5.0) for i in range(10)])
    res = robust_scale_by(const, "v", by=["g"]).collect()
    assert all(r["v_rs"] is None for r in res)


def test_normalize_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        winsorize_by(df, "v", by=["g"], lower=0.9, upper=0.1)
    with pytest.raises(ValueError):
        group_bounds(df, "v", ["g"], (1.5,))
    with pytest.raises(ValueError):
        group_bounds(df, "v", ["g"], (0.5,), mode="magic")


def test_winsorize_null_contract(spark):
    """Review-hardened contracts: NULL values stay NULL (Spark's
    least/greatest SKIP nulls — unguarded, a NULL came back as hi);
    NULL group keys and all-NULL groups survive the bounds join with
    passthrough values."""
    rows = [
        Row(g="a", i=0, v=1.0), Row(g="a", i=1, v=2.0),
        Row(g="a", i=2, v=100.0), Row(g="a", i=3, v=None),
        Row(g=None, i=4, v=7.0),          # NULL group key
        Row(g="c", i=5, v=None),          # all-NULL group
    ]
    df = spark.createDataFrame(rows, "g string, i int, v double")
    out = {r["i"]: r for r in winsorize_by(df, "v", by=["g"], lower=0.0, upper=0.5).collect()}
    assert len(out) == 6                   # every input row survives
    assert out[3]["v_w"] is None           # NULL value -> NULL, not hi
    assert out[4]["v_w"] == 7.0            # NULL key: passthrough
    assert out[4]["lo"] is None and out[4]["hi"] is None
    assert out[5]["v_w"] is None           # all-NULL group
    rs = {r["i"]: r for r in robust_scale_by(df, "v", by=["g"]).collect()}
    assert len(rs) == 6
    assert rs[4]["v_rs"] is None and rs[4]["median"] is None
