"""REQ sketch (kernel/req.py + operators/quantiles.py::req_by):
relative-rank-error properties from Cormode et al. PODS 2021, plus the
distributed build/merge shape. The headline property — and the reason
the sketch exists next to KLL — is that tail quantiles stay accurate:
the rank error at q scales with (1 − q), not with n."""

from __future__ import annotations

import json

import numpy as np
import pytest

from hyper_spark.kernel.kll import KllSketch
from hyper_spark.kernel.req import ReqSketch

# relative slack asserted at the tail: |est_rank − q| ≤ REL · (1 − q)
# (generous vs the measured ~0.00–0.02 at k=32 so the test is not flaky
# across rng seeds)
REL = 0.15
# and a small absolute floor for the body (q ≤ 0.9)
ABS = 0.01


def _true_rank(sorted_data: np.ndarray, value: float) -> float:
    return float(np.searchsorted(sorted_data, value, side="right")) / len(sorted_data)


def _data(n: int = 300_000, seed: int = 11) -> np.ndarray:
    return np.random.default_rng(seed).lognormal(3.0, 1.2, n)


def test_req_tail_relative_error():
    data = _data()
    sk = ReqSketch(32).update_batch(data)
    s = np.sort(data)
    for q in (0.5, 0.9, 0.99, 0.999, 0.9999):
        err = abs(_true_rank(s, sk.quantile(q)) - q)
        assert err <= max(REL * (1 - q), ABS), (q, err)


def test_req_beats_kll_at_extreme_tail():
    """The raison d'être, asserted: at p99.99 of 300k lognormal items
    REQ's relative rank error is a small fraction of KLL's at a
    comparable (indeed larger-k) configuration."""
    data = _data(seed=13)
    s = np.sort(data)
    req = ReqSketch(32).update_batch(data)
    kll = KllSketch(200).update_batch(data)
    q = 0.9999
    req_err = abs(_true_rank(s, req.quantile(q)) - q) / (1 - q)
    kll_err = abs(_true_rank(s, kll.quantile(q)) - q) / (1 - q)
    assert req_err <= 0.2
    assert req_err < kll_err


def test_req_weight_conservation_and_bounded_state():
    data = _data(n=200_000)
    sk = ReqSketch(32).update_batch(data)
    total = sum(len(c.buf) * (1 << h) for h, c in enumerate(sk.compactors))
    assert total == sk.n == len(data)
    # O(k · log(n/k) · sections) state, nowhere near n
    assert sum(len(c.buf) for c in sk.compactors) < 20_000


def test_req_merge_bound_any_order():
    data = _data(n=240_000, seed=17)
    s = np.sort(data)
    shards = np.array_split(data, 8)
    sks = [ReqSketch(32).update_batch(sh) for sh in shards]
    left = sks[0]
    for x in sks[1:]:
        left = left.merge(x)
    right = sks[-1]
    for x in reversed(sks[:-1]):
        right = right.merge(x)
    assert left.n == right.n == len(data)
    for m in (left, right):
        for q in (0.9, 0.999, 0.9999):
            err = abs(_true_rank(s, m.quantile(q)) - q)
            assert err <= max(REL * (1 - q), ABS), (q, err)


def test_req_min_max_exact_and_rank_inverse():
    data = _data(n=100_000, seed=23)
    sk = ReqSketch(32).update_batch(data)
    assert sk.quantile(0.0) == data.min()
    assert sk.quantile(1.0) == data.max()
    # rank() is the CDF inverse of quantile() within the same bound
    v = sk.quantile(0.999)
    assert abs(sk.rank(v) - 0.999) <= 0.01


def test_req_serde_roundtrip():
    sk = ReqSketch(16).update_batch(_data(n=50_000, seed=3))
    rt = ReqSketch.from_dict(json.loads(json.dumps(sk.to_dict())))
    for q in (0.1, 0.5, 0.99, 0.9999):
        assert rt.quantile(q) == sk.quantile(q)
    assert rt.n == sk.n


def test_req_rejects_bad_k_and_mismatched_merge():
    with pytest.raises(ValueError):
        ReqSketch(2)
    with pytest.raises(ValueError):
        ReqSketch(16).merge(ReqSketch(32))
    with pytest.raises(ValueError):
        ReqSketch(16).quantile(0.5)  # empty


def test_req_nan_skipped_and_empty_batch():
    sk = ReqSketch(16)
    sk.update_batch(np.array([1.0, np.nan, 3.0, np.nan]))
    assert sk.n == 2
    sk.update_batch(np.array([]))
    assert sk.n == 2


# ----------------------------------------------------------- Spark shape


def test_req_by_grouped_tail_quantiles(spark):
    import pandas as pd

    from hyper_spark.operators.quantiles import quantiles_by, ranks_by

    rng = np.random.default_rng(41)
    n = 120_000
    pdf = pd.DataFrame(
        {
            "role": np.where(rng.random(n) < 0.5, "user", "assistant"),
            "latency": rng.lognormal(2.0, 1.0, n),
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    got = {
        r["role"]: r
        for r in quantiles_by(
            df, ["role"], "latency", qs=[0.5, 0.99, 0.999], method="req"
        ).collect()
    }
    for role in ("user", "assistant"):
        sub = np.sort(pdf.loc[pdf["role"] == role, "latency"].to_numpy())
        for q in (0.5, 0.99, 0.999):
            est = got[role][f"q_{int(q * 1000):04d}"]
            err = abs(_true_rank(sub, est) - q)
            assert err <= max(REL * (1 - q), ABS), (role, q, err)
    # ranks_by accepts REQ states through sketch_ranks
    from hyper_spark.operators.quantiles import req_by, sketch_ranks

    probe = float(np.quantile(pdf["latency"], 0.999))
    ranks = {
        r["role"]: r["rank"]
        for r in sketch_ranks(
            req_by(df, ["role"], "latency"), [probe], ["role"]
        ).collect()
    }
    for role, est_rank in ranks.items():
        sub = np.sort(pdf.loc[pdf["role"] == role, "latency"].to_numpy())
        assert abs(est_rank - _true_rank(sub, probe)) <= 0.01
