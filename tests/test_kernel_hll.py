"""Kernel parity tests mirroring the reference test suite
(/root/reference/test/hyper_test.erl) — see SURVEY.md §5 for the layer map.
"""

from __future__ import annotations

import base64
import json
import random
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hyper_spark.kernel.hll import (
    HllSketch,
    alpha,
    error_bound,
    estimate_bias,
    hash_value,
)

GOLDEN = "/root/reference/test/filter.txt"


def generate_unique(n: int, seed: int = 1) -> list[bytes]:
    """Reference value generator: unique 8-byte big-endian ints uniform in
    [1, 1e14] (hyper_test.erl:504-523)."""
    rng = random.Random(seed)
    out: set[bytes] = set()
    while len(out) < n:
        out.add(rng.randint(1, 100000000000000).to_bytes(8, "big"))
    return list(out)


# ---------------------------------------------------------------- layer 1


def test_hash_value_semantics():
    # independent oracle: recompute from the digest bit string
    import hashlib

    for p in (4, 11, 14, 16):
        for v in [b"foo", b"bar", (123456).to_bytes(8, "big"), b"\x00" * 8]:
            bits = bin(int.from_bytes(hashlib.sha1(v).digest(), "big"))[2:].zfill(160)
            idx_oracle = int(bits[:p], 2)
            window = bits[p : 2 * p]
            zeros = len(window) - len(window.lstrip("0"))
            rho_oracle = zeros + 1
            assert hash_value(v, p) == (idx_oracle, rho_oracle)


def test_rho_range():
    p = 14
    for v in generate_unique(2000, seed=7):
        _, rho = hash_value(v, p)
        assert 1 <= rho <= p + 1


def test_alpha_constants():
    assert alpha(16) == 0.673
    assert alpha(32) == 0.697
    assert alpha(64) == 0.709
    assert alpha(1 << 14) == pytest.approx(0.7213 / (1 + 1.079 / (1 << 14)))


def test_basic_estimate():
    # mirrors basic_t (hyper_test.erl:47-51): small set, sane estimate
    sk = HllSketch(14).insert_many([b"a", b"b", b"c"])
    assert sk.cardinality() == pytest.approx(3, abs=0.5)


def test_insert_non_bytes_raises():
    with pytest.raises(TypeError):
        HllSketch(14).insert(123)  # type: ignore[arg-type]


def test_precision_bounds():
    for bad in (3, 17, 0):
        with pytest.raises(ValueError):
            HllSketch(bad)


def test_register_sum_closed_form():
    # mirrors register_sum_t (hyper_test.erl:178-197): hand-set registers,
    # estimator consumes exact sum of 2^-reg
    p = 4
    sk = HllSketch(p)
    sk.registers[0] = 1
    sk.registers[1] = 2
    s = float(np.exp2(-sk.registers.astype(float)).sum())
    assert s == pytest.approx(14 * 1.0 + 0.5 + 0.25)


# ---------------------------------------------------------------- layer 3 (golden)


def test_golden_fixture_roundtrip():
    """bad_serialization_t (hyper_test.erl:343-375): decode the reference's
    P=15 register dump, re-encode byte-identically, and the estimator runs."""
    p, m = 15, 1 << 15
    with open(GOLDEN, "rb") as f:
        b64 = f.read().replace(b"\n", b"")
    raw = zlib.decompress(base64.b64decode(b64), wbits=47)
    assert len(raw) in (m, m + 1)
    if len(raw) == m + 1:
        assert raw[-1] == 0
        raw = raw[:-1]

    sk = HllSketch.from_bytes(p, raw)
    assert sk.to_bytes() == raw

    # JSON envelope round-trip preserves registers exactly
    sk2 = HllSketch.from_json(sk.to_json())
    assert sk2 == sk
    assert json.loads(sk.to_json())["p"] == 15

    card = sk.cardinality()
    assert np.isfinite(card) and card > 0


def test_pad_tolerance():
    p = 11
    sk = HllSketch(p).insert_many(generate_unique(100))
    padded = sk.to_bytes() + b"\x00"
    assert HllSketch.from_bytes(p, padded) == sk


# ---------------------------------------------------------------- layer 4 (properties)


@settings(max_examples=100, deadline=None)
@given(
    p=st.integers(4, 16),
    pairs=st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(1, 6)), max_size=200
    ),
)
def test_prop_set_monotone_max(p, pairs):
    """prop_set (hyper_test.erl:429-469): registers equal a per-index max
    oracle dict."""
    sk = HllSketch(p)
    oracle: dict[int, int] = {}
    for idx, val in pairs:
        idx %= 1 << p
        if val > sk.registers[idx]:
            sk.registers[idx] = val
        oracle[idx] = max(oracle.get(idx, 0), val)
    expect = np.zeros(1 << p, dtype=np.uint8)
    for idx, val in oracle.items():
        expect[idx] = val
    assert np.array_equal(sk.registers, expect)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(1, 500),
    chunks=st.integers(2, 10),
    seed=st.integers(0, 2**16),
)
def test_prop_union_lossless(n, chunks, seed):
    """prop_union (hyper_test.erl:486-496): partition values into 2-10
    filters; union == single sequential build, register-exact."""
    values = generate_unique(n, seed=seed)
    whole = HllSketch(11).insert_many(values)
    parts = [HllSketch(11) for _ in range(chunks)]
    for i, v in enumerate(values):
        parts[i % chunks].insert(v)
    assert HllSketch.merge_all(parts) == whole


def test_merge_assoc_comm_idempotent():
    a = HllSketch(12).insert_many(generate_unique(300, seed=1))
    b = HllSketch(12).insert_many(generate_unique(300, seed=2))
    c = HllSketch(12).insert_many(generate_unique(300, seed=3))
    assert a.merge(b) == b.merge(a)
    assert a.merge(b).merge(c) == a.merge(b.merge(c))
    assert a.merge(a) == a


@settings(max_examples=30, deadline=None)
@given(n=st.integers(0, 300), seed=st.integers(0, 2**16))
def test_prop_serde_roundtrip(n, seed):
    sk = HllSketch(13).insert_many(generate_unique(n, seed=seed)) if n else HllSketch(13)
    assert HllSketch.from_json(sk.to_json()) == sk
    assert HllSketch.from_bytes(13, sk.to_bytes()) == sk


def test_mixed_precision_union():
    """union_mixed_precision_t (hyper_test.erl:286-296): union folds to min
    P and still estimates the combined cardinality."""
    values = generate_unique(5000, seed=9)
    ps = [9, 11, 13, 16]
    parts = [HllSketch(p) for p in ps]
    for i, v in enumerate(values):
        parts[i % 4].insert(v)
    merged = HllSketch.merge_all(parts)
    assert merged.p == 9
    # equivalent to building everything at p=9 after folding
    whole9 = HllSketch.merge_all(
        [HllSketch(p).insert_many([v for i, v in enumerate(values) if i % 4 == k]).reduce_precision(9)
         for k, p in enumerate(ps)]
    )
    assert merged == whole9
    assert abs(merged.cardinality() - 5000) / 5000 < 3 * error_bound(9)


def test_reduce_precision_fold_is_index_mod():
    p, new_p = 10, 7
    sk = HllSketch(p)
    rng = random.Random(3)
    oracle = np.zeros(1 << new_p, dtype=np.uint8)
    for _ in range(400):
        idx, val = rng.randrange(1 << p), rng.randint(1, 11)
        sk.registers[idx] = max(sk.registers[idx], val)
    for idx in range(1 << p):
        fold = idx % (1 << new_p)  # hyper_binary.erl:150-155
        oracle[fold] = max(oracle[fold], sk.registers[idx])
    assert np.array_equal(sk.reduce_precision(new_p).registers, oracle)


def test_reduce_precision_estimate_error():
    # reduce_precision_t (hyper_test.erl:67-82): folded estimate within the
    # coarser precision's bound
    values = generate_unique(10000, seed=4)
    sk = HllSketch(14).insert_many(values)
    for new_p in (12, 10):
        est = sk.reduce_precision(new_p).cardinality()
        assert abs(est - 10000) / 10000 < 3 * error_bound(new_p)


# ---------------------------------------------------------------- layer 5 (statistical)


def test_error_range_p14():
    """error_range_t (hyper_test.erl:200-215): P=14, cards 1000..50000 step
    5000, |est - card| < 2%·card."""
    p = 14
    for card in range(1000, 50001, 5000):
        values = generate_unique(card, seed=card)
        est = HllSketch(p).insert_many(values).cardinality()
        assert abs(est - card) / card < 0.02, (card, est)


def test_small_big_union():
    """small_big_union_t (hyper_test.erl:299-316): 100 + 15000 values
    crossing the sparse→dense regime."""
    small = generate_unique(100, seed=10)
    big = generate_unique(15000, seed=11)
    u = HllSketch(15).insert_many(small).merge(HllSketch(15).insert_many(big))
    exact = len(set(small) | set(big))
    assert abs(u.cardinality() - exact) / exact < 0.02


def test_intersect_card():
    """intersect_card_t (hyper_test.erl:320-339): 50%-overlap 10k sets at
    P=13, intersection estimate within 5%."""
    rng = random.Random(20)
    left = [i.to_bytes(8, "big") for i in range(1, 10001)]
    right = [i.to_bytes(8, "big") for i in range(5001, 15001)]
    a = HllSketch(13).insert_many(left)
    b = HllSketch(13).insert_many(right)
    inter = a.intersect_cardinality(b)
    assert inter <= a.merge(b).cardinality()
    assert abs(5000 - inter) / 5000 <= 0.05


def test_estimate_bias_is_6nn_mean():
    # spot-check against a direct recomputation (hyper.erl:202-218)
    import json as _json
    from pathlib import Path

    raw = _json.loads(
        (Path("hyper_spark/kernel") / "hll_constants.json").read_text()
    )
    p = 14
    est_vec = np.asarray(raw["estimate_data"][str(p)])
    bias_vec = np.asarray(raw["bias_data"][str(p)])
    e = float(est_vec[37]) + 0.1
    nearest = np.argsort((est_vec - e) ** 2, kind="stable")[:6]
    assert estimate_bias(e, p) == pytest.approx(float(bias_vec[nearest].mean()))


# ---------------------------------------------------------------- encodings


def test_golden_insert_vector_packed6():
    """README.md:51-53 publishes insert(<<"foo">>, new(4)) as the 6-bit
    dense binary <<4,0,0,0,0,0,0,0,0,0,0,0>> — pins SHA-1/idx/rho parity
    against reference output we did not produce ourselves."""
    sk = HllSketch(4).insert(b"foo")
    assert sk.registers[0] == 1 and sk.nnz() == 1
    golden = bytes([4] + [0] * 11)
    assert sk.to_packed6() == golden
    # and the 6->8 widening decode (hyper_binary.erl:176-180)
    assert HllSketch.from_packed6(4, golden) == sk


def test_packed6_roundtrip_random():
    rng = np.random.default_rng(3)
    for p in (4, 10, 14):
        regs = rng.integers(0, p + 2, size=1 << p, dtype=np.uint8)
        sk = HllSketch(p, regs)
        assert HllSketch.from_packed6(p, sk.to_packed6()) == sk
        assert len(sk.to_packed6()) == 3 * (1 << p) // 4


def test_sparse_encoding_roundtrip_and_threshold():
    from hyper_spark.kernel.hll import (
        decode_register_blob,
        encode_registers,
        sparse_threshold,
    )

    p = 10
    m = 1 << p
    sk = HllSketch(p).insert_many(generate_unique(40, seed=5))
    blob = sk.encode("auto")
    # low fill -> sparse: 3 bytes per non-zero register, far below 2^p
    assert len(blob) == 3 * sk.nnz() < m
    assert HllSketch.from_blob(p, blob) == sk
    # dense stays canonical and also decodes
    assert HllSketch.from_blob(p, sk.encode("dense")) == sk
    # promotion policy: fill >= 2^p/3 -> dense (hyper_bisect.erl:25-29)
    full = HllSketch(p).insert_many(generate_unique(20 * m, seed=6))
    assert full.nnz() >= sparse_threshold(p)
    assert len(full.encode("auto")) == m
    # forced sparse above the threshold is an explicit error
    with pytest.raises(ValueError):
        encode_registers(full.registers, mode="sparse")
    # pad tolerance still applies to dense blobs
    assert np.array_equal(
        decode_register_blob(p, sk.encode("dense") + b"\x00"), sk.registers
    )


def test_sparse_promotion_threshold_exact_boundary():
    """ADVICE r02: promotion must fire AT nnz == 2^p div 3, exactly like
    hyper_bisect (num_keys >= Threshold = 2^p div 3, erl:38-43) — the
    earlier 3·nnz < 2^p form stayed sparse one step too long."""
    from hyper_spark.kernel.hll import encode_registers, sparse_threshold

    p = 10
    m = 1 << p
    thr = sparse_threshold(p)
    for nnz, want_dense in ((thr - 1, False), (thr, True), (thr + 1, True)):
        regs = np.zeros(m, dtype=np.uint8)
        regs[:nnz] = 1
        blob = encode_registers(regs, "auto")
        assert (len(blob) == m) == want_dense, (nnz, len(blob))


def test_packed6_mode_roundtrip_and_arms():
    """encoding='packed6': sparse arm below 6·2^p/8 bytes, 6-bit packed
    at/above; both decode with the declared mode; boundary nnz == 2^p/4
    goes packed (lengths would collide)."""
    from hyper_spark.kernel.hll import decode_register_blob, encode_registers

    p = 10
    m = 1 << p
    packed_len = 6 * m // 8
    for nnz in (0, 5, m // 4 - 1, m // 4, m // 3, m // 2, m):
        regs = np.zeros(m, dtype=np.uint8)
        rng = np.random.default_rng(nnz)
        idx = rng.choice(m, size=nnz, replace=False)
        regs[idx] = rng.integers(1, 18, size=nnz)
        blob = encode_registers(regs, "packed6")
        nz = int((regs != 0).sum())
        if 3 * nz < packed_len:
            assert len(blob) == 3 * nz  # sparse arm, strictly shorter
        else:
            assert len(blob) == packed_len
        assert np.array_equal(decode_register_blob(p, blob, "packed6"), regs)


def test_sparse_dense_length_disjoint():
    # the dual-format binary column relies on length disambiguation:
    # 2^p is never a multiple of 3, sparse is always < 2^p bytes
    for p in range(4, 17):
        assert (1 << p) % 3 != 0


@given(
    st.integers(min_value=4, max_value=14),
    st.lists(st.integers(min_value=0, max_value=17), min_size=0, max_size=200),
)
@settings(max_examples=60, deadline=None)
def test_prop_encode_decode_roundtrip(p, updates):
    """Any register state round-trips through every codec (sparse is
    only valid below the fill threshold; auto always round-trips)."""
    from hyper_spark.kernel.hll import decode_register_blob, encode_registers

    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    rng = np.random.default_rng(7)
    for v in updates:
        regs[rng.integers(0, m)] = v
    blob = encode_registers(regs, "auto")
    assert np.array_equal(decode_register_blob(p, blob), regs)
    assert np.array_equal(
        decode_register_blob(p, encode_registers(regs, "dense")), regs
    )
    sk = HllSketch(p, regs)
    assert HllSketch.from_packed6(p, sk.to_packed6()) == sk


@given(st.lists(st.binary(min_size=1, max_size=12), min_size=1, max_size=300))
@settings(max_examples=30, deadline=None)
def test_prop_sparse_merge_equals_dense_merge(values):
    """Merging via sparse-encoded blobs is indistinguishable from dense
    merging (the gate's sparse_dense_parity as a property)."""
    from hyper_spark.kernel.hll import decode_register_blob

    p = 11
    half = len(values) // 2
    a = HllSketch(p).insert_many(values[:half] or [b"x"])
    b = HllSketch(p).insert_many(values[half:] or [b"y"])
    via_sparse = HllSketch(p, decode_register_blob(p, a.encode("auto"))).merge(
        HllSketch(p, decode_register_blob(p, b.encode("auto")))
    )
    assert via_sparse == a.merge(b)
