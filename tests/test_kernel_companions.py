"""Companion sketch kernels: paper-bound error + mergeability properties
(no reference implementation exists — SURVEY.md §2.4)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from hyper_spark.kernel.bloom import BloomFilter
from hyper_spark.kernel.cms import CountMinSketch
from hyper_spark.kernel.kll import KllSketch
from hyper_spark.kernel.tdigest import TDigest


# ------------------------------------------------------------- count-min


def zipf_stream(n: int, vocab: int = 50, seed: int = 5) -> list[str]:
    rng = random.Random(seed)
    return [f"item{min(vocab - 1, int(rng.random() ** 3 * vocab))}" for _ in range(n)]


def test_cms_never_undercounts_and_bounded():
    stream = zipf_stream(20000)
    cms = CountMinSketch(depth=5, width=2048).add_many(stream)
    from collections import Counter

    exact = Counter(stream)
    for item, true_count in exact.items():
        est = cms.estimate(item)
        assert est >= true_count
        assert est <= true_count + cms.eps * cms.n


def test_cms_merge_equals_single_build():
    stream = zipf_stream(10000)
    whole = CountMinSketch(4, 1024).add_many(stream)
    parts = [CountMinSketch(4, 1024) for _ in range(4)]
    for i, v in enumerate(stream):
        parts[i % 4].add(v)
    merged = parts[0].merge(parts[1]).merge(parts[2]).merge(parts[3])
    assert merged == whole  # counter-exact: merge is lossless addition
    assert merged.n == whole.n


def test_cms_serde_roundtrip():
    cms = CountMinSketch(3, 256).add_many(zipf_stream(500))
    back = CountMinSketch.from_bytes(3, 256, cms.to_bytes(), cms.n)
    assert back == cms


def test_cms_dimension_mismatch():
    with pytest.raises(ValueError):
        CountMinSketch(3, 256).merge(CountMinSketch(3, 512))


# ------------------------------------------------------------- bloom


def test_bloom_no_false_negatives():
    bf = BloomFilter.from_expected(1000, fpr=0.01)
    items = [f"key-{i}" for i in range(1000)]
    bf.add_many(items)
    assert all(bf.might_contain(v) for v in items)


def test_bloom_fpr_reasonable():
    bf = BloomFilter.from_expected(1000, fpr=0.01)
    bf.add_many(f"key-{i}" for i in range(1000))
    fp = sum(bf.might_contain(f"other-{i}") for i in range(5000))
    assert fp / 5000 < 0.03  # 3x slack on the 1% design point


def test_bloom_merge_equals_single_build():
    items = [f"k{i}" for i in range(2000)]
    whole = BloomFilter(1 << 14, 5).add_many(items)
    a = BloomFilter(1 << 14, 5).add_many(items[::2])
    b = BloomFilter(1 << 14, 5).add_many(items[1::2])
    assert a.merge(b) == whole


def test_bloom_serde():
    bf = BloomFilter(1 << 10, 3).add_many(["a", "b", "c"])
    assert BloomFilter.from_bytes(1 << 10, 3, bf.to_bytes()) == bf


# ------------------------------------------------------------- kll


def test_kll_rank_error_bound():
    rng = random.Random(11)
    values = [rng.gauss(0, 1) for _ in range(50000)]
    sk = KllSketch(k=200).update_many(values)
    sorted_v = sorted(values)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantile(q)
        # normalized rank error of the estimate
        true_rank = np.searchsorted(sorted_v, est, side="right") / len(values)
        assert abs(true_rank - q) <= 2.0 / 200 + 1e-9, (q, true_rank)


def test_kll_weight_conservation():
    sk = KllSketch(k=64).update_many(range(10000))
    total_weight = sum(len(lv) * (1 << h) for h, lv in enumerate(sk.levels))
    assert total_weight == 10000


def test_kll_merge_bound():
    rng = random.Random(13)
    values = [rng.random() for _ in range(30000)]
    parts = [KllSketch(k=200) for _ in range(6)]
    for i, v in enumerate(values):
        parts[i % 6].update(v)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.n == 30000
    sorted_v = sorted(values)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        true_rank = np.searchsorted(sorted_v, est, side="right") / len(values)
        assert abs(true_rank - q) <= 3.0 / 200, (q, true_rank)


def test_kll_min_max_exact():
    sk = KllSketch(k=32).update_many([5.0, -3.0, 7.5, 0.0])
    assert sk.quantile(0.0) == -3.0
    assert sk.quantile(1.0) == 7.5


def test_kll_serde():
    sk = KllSketch(k=64).update_many(range(5000))
    back = KllSketch.from_dict(sk.to_dict())
    assert back.n == sk.n
    for q in (0.1, 0.5, 0.9):
        assert back.quantile(q) == sk.quantile(q)


# ------------------------------------------------------------- t-digest


def test_tdigest_quantile_accuracy():
    rng = random.Random(17)
    values = [rng.gauss(100, 15) for _ in range(50000)]
    td = TDigest(delta=200).update_many(values)
    sorted_v = sorted(values)
    for q in (0.001, 0.01, 0.5, 0.99, 0.999):
        est = td.quantile(q)
        true_rank = np.searchsorted(sorted_v, est, side="right") / len(values)
        # t-digest rank error scales with q(1-q); generous envelope
        tol = max(0.005, 4 * q * (1 - q) / 200)
        assert abs(true_rank - q) <= tol, (q, true_rank)


def test_tdigest_centroid_count_bounded():
    td = TDigest(delta=100).update_many(np.random.default_rng(3).random(20000))
    td._flush()
    assert len(td.means) <= 2 * 100  # ~delta centroids


def test_tdigest_merge_accuracy():
    rng = random.Random(19)
    values = [rng.expovariate(1.0) for _ in range(40000)]
    parts = [TDigest(delta=200) for _ in range(8)]
    for i, v in enumerate(values):
        parts[i % 8].update(v)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.n == pytest.approx(40000)
    sorted_v = sorted(values)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = merged.quantile(q)
        true_rank = np.searchsorted(sorted_v, est, side="right") / len(values)
        assert abs(true_rank - q) <= 0.02, (q, true_rank)


def test_tdigest_serde():
    td = TDigest(delta=100).update_many(range(1000))
    back = TDigest.from_dict(td.to_dict())
    for q in (0.25, 0.5, 0.75):
        assert back.quantile(q) == pytest.approx(td.quantile(q))


def test_tdigest_weighted_updates():
    td = TDigest(delta=100)
    td.update(1.0, weight=99.0)
    td.update(100.0, weight=1.0)
    # mass below the first centroid midpoint interpolates to its mean;
    # between-centroid interpolation applies above it
    assert td.quantile(0.3) == pytest.approx(1.0, abs=1e-6)
    assert 1.0 <= td.quantile(0.5) <= 3.0
    assert td.quantile(0.9999) == pytest.approx(100.0, rel=0.05)


def test_kll_rank_exact_below_compaction():
    from hyper_spark.kernel.kll import KllSketch

    sk = KllSketch(200)
    vals = list(range(100))
    for v in vals:
        sk.update(float(v))
    # no compaction at n=100 < k: rank is the exact empirical CDF
    assert sk.rank(49.0) == 50 / 100
    assert sk.rank(-1.0) == 0.0
    assert sk.rank(99.0) == 1.0
