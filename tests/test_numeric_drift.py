"""numeric_drift (operators/profile.py): PSI over shared equi-width
bins, hand-verified against a numpy re-computation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.profile import numeric_drift


def _psi(rows):
    return sum(r["psi_term"] for r in rows)


def test_identical_distributions_near_zero(spark):
    a = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    rows = numeric_drift(a, a, "v", bins=10).collect()
    assert len(rows) == 10
    assert all(r["n_a"] == r["n_b"] == 100 for r in rows)
    assert abs(_psi(rows)) < 1e-12  # identical -> every term exactly 0


def test_shift_detected_and_matches_numpy(spark):
    import numpy as np

    a = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    b = a.select((F.col("v") * 1.5).alias("v"))  # stretch right
    rows = sorted(numeric_drift(a, b, "v", bins=8, lo=0.0, hi=160.0).collect(),
                  key=lambda r: r["bin"])
    va = np.arange(2000) % 100
    vb = va * 1.5
    w = 160.0 / 8

    def hist(x):
        bins = np.clip(np.floor((x - 0.0) / w).astype(int), 0, 7)
        bins[x <= 0.0] = 0
        bins[x >= 160.0] = 7
        return np.bincount(bins, minlength=8)

    ha, hb = hist(va), hist(vb)
    fa = (ha + 0.5) / (len(va) + 0.5 * 8)
    fb = (hb + 0.5) / (len(vb) + 0.5 * 8)
    want = ((fb - fa) * np.log(fb / fa)).sum()
    assert [r["n_a"] for r in rows] == ha.tolist()
    assert [r["n_b"] for r in rows] == hb.tolist()
    assert _psi(rows) == pytest.approx(want, abs=1e-12)
    assert _psi(rows) > 0.25  # a 1.5x stretch is a real shift


def test_clamping_smoothing_and_guards(spark):
    a = spark.range(100).select((F.col("id")).cast("double").alias("v"))
    b = spark.range(100).select((F.col("id") + 1000).cast("double").alias("v"))
    # disjoint supports with pinned range: everything in b clamps to
    # the top bin; empty bins stay finite thanks to smoothing
    rows = numeric_drift(a, b, "v", bins=4, lo=0.0, hi=100.0).collect()
    assert all(math.isfinite(r["psi_term"]) for r in rows)
    top = max(rows, key=lambda r: r["bin"])
    assert top["n_b"] == 100
    with pytest.raises(ValueError, match="bins"):
        numeric_drift(a, b, "v", bins=1)
    with pytest.raises(ValueError, match="degenerate"):
        numeric_drift(a, a.limit(0), "v", lo=5.0, hi=5.0)
    empty = a.filter("v < 0")
    with pytest.raises(ValueError, match="no non-NULL"):
        numeric_drift(empty, empty, "v")
