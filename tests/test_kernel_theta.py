"""Theta/KMV kernel: exactness below k, published error bounds,
merge algebra, integer-domain theta, serde."""

from __future__ import annotations

import numpy as np
import pytest

from hyper_spark.kernel.theta import ThetaSketch, theta_rse


def _hashes(n, seed=0):
    """Simulated 64-bit hashes of n distinct items: draw WITHOUT
    replacement semantics via unique()."""
    rng = np.random.default_rng(seed)
    h = rng.integers(-(2**63), 2**63, size=int(n * 1.1), dtype=np.int64)
    h = np.unique(h)  # sorts — MUST reshuffle before truncating, or
    rng.shuffle(h)    # [:n] would keep the smallest hashes (biased)
    return h[:n]


def test_exact_below_k():
    h = _hashes(500)
    sk = ThetaSketch.from_signed_hashes(4096, h)
    assert not sk.saturated
    assert sk.theta == 1.0
    assert sk.estimate() == 500.0
    # duplicates don't change anything
    sk2 = ThetaSketch.from_signed_hashes(4096, np.concatenate([h, h, h]))
    assert sk == sk2


@pytest.mark.parametrize("n", [50_000, 300_000])
def test_estimate_within_bound(n):
    sk = ThetaSketch.from_signed_hashes(4096, _hashes(n, seed=n))
    rse = theta_rse(4096)
    assert abs(sk.estimate() - n) / n <= 3 * rse


def test_union_properties():
    a = ThetaSketch.from_signed_hashes(1024, _hashes(30_000, 1))
    b = ThetaSketch.from_signed_hashes(1024, _hashes(30_000, 2))
    c = ThetaSketch.from_signed_hashes(1024, _hashes(30_000, 3))
    assert a.union(b) == b.union(a)
    assert a.union(b).union(c) == a.union(b.union(c))
    assert a.union(a) == a
    assert a.union(ThetaSketch.empty(1024)) == a
    with pytest.raises(ValueError):
        a.union(ThetaSketch.empty(512))


def test_union_is_sketch_of_concatenation():
    """k smallest of A∪B from the two sketches == sketch built from
    the concatenated stream (the mergeability proof, empirically)."""
    ha, hb = _hashes(20_000, 7), _hashes(20_000, 8)
    a = ThetaSketch.from_signed_hashes(512, ha)
    b = ThetaSketch.from_signed_hashes(512, hb)
    direct = ThetaSketch.from_signed_hashes(512, np.concatenate([ha, hb]))
    assert a.union(b) == direct


def test_intersection_exact_when_unsaturated():
    base = _hashes(900, 11)
    a = ThetaSketch.from_signed_hashes(2048, base[:600])
    b = ThetaSketch.from_signed_hashes(2048, base[300:])
    assert a.intersect_card(b) == 300.0
    assert a.a_not_b_card(b) == 300.0
    assert b.a_not_b_card(a) == 300.0


def test_intersection_bound_when_saturated():
    """|A∩B| = 40k out of |A|=|B|=100k: direct estimate lands within
    3·RSE of the intersection (scaled by union/intersection ratio per
    the published error analysis — use a generous 3x bound on the
    union-rate error)."""
    base = _hashes(160_000, 13)
    a_h = base[:100_000]
    b_h = base[60_000:160_000]
    k = 4096
    a = ThetaSketch.from_signed_hashes(k, a_h)
    b = ThetaSketch.from_signed_hashes(k, b_h)
    est = a.intersect_card(b)
    true = 40_000
    # sample size at min-theta for the intersection ~ k * true/|larger|
    rse = 1.0 / np.sqrt(k * true / 100_000)
    assert abs(est - true) / true <= 3 * rse
    # and inclusion-exclusion consistency: |A| ~ |A\B| + |A∩B|
    assert abs((a.a_not_b_card(b) + est) - a.estimate()) / a.estimate() <= 0.05


def test_serde_roundtrip():
    sk = ThetaSketch.from_signed_hashes(256, _hashes(10_000, 5))
    back = ThetaSketch.from_bytes(256, sk.to_bytes())
    assert back == sk
    assert back.estimate() == sk.estimate()
    empty = ThetaSketch.empty(256)
    assert ThetaSketch.from_bytes(256, empty.to_bytes()) == empty


def test_validation():
    with pytest.raises(ValueError):
        ThetaSketch.empty(2)
    with pytest.raises(ValueError):
        theta_rse(2)
    with pytest.raises(ValueError):
        ThetaSketch(4, np.arange(10, dtype=np.uint64))  # entries > k
