"""Frequent-Directions matrix sketch: kernel certificate, mergeability,
distributed build, rollup, and projection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyper_spark.kernel.fd import FrequentDirections
from hyper_spark.operators.matrix_sketch import (
    fd_covariance_diag,
    fd_components,
    fd_merge,
    fd_project,
    fd_sketch_by,
)


def _rand(n, d, seed):
    rng = np.random.default_rng(seed)
    # low-rank + noise: the regime FD is for
    basis = rng.normal(size=(4, d))
    return rng.normal(size=(n, 4)) @ basis + 0.1 * rng.normal(size=(n, d))


def _check_certificate(sk: FrequentDirections, a: np.ndarray):
    """The published FD guarantee, checked against the exact matrix."""
    dev = a.T @ a - sk.covariance()
    eig = np.linalg.eigvalsh(dev)
    assert eig.min() >= -1e-6 * sk.fnorm2  # A'A - B'B is PSD
    assert eig.max() <= sk.delta + 1e-6 * sk.fnorm2  # within certificate
    assert sk.delta <= sk.delta_bound() + 1e-9  # delta <= |A|_F^2 / ell
    assert abs(sk.fnorm2 - np.einsum("ij,ij->", a, a)) <= 1e-6 * sk.fnorm2
    assert sk.n == a.shape[0]


def test_kernel_certificate_and_batching():
    a = _rand(1000, 32, seed=7)
    sk = FrequentDirections(12, 32)
    # uneven batch sizes exercise the buffer wrap
    for lo, hi in [(0, 1), (1, 400), (400, 403), (403, 1000)]:
        sk.update_batch(a[lo:hi])
    _check_certificate(sk, a)
    assert sk.sketch_rows().shape[0] <= 11  # < ell rows


def test_kernel_merge_certificate():
    a1, a2 = _rand(700, 24, seed=1), _rand(300, 24, seed=2)
    s1, s2 = FrequentDirections(10, 24), FrequentDirections(10, 24)
    s1.update_batch(a1)
    s2.update_batch(a2)
    merged = s1.merge(s2)
    _check_certificate(merged, np.vstack([a1, a2]))


def test_kernel_serde_roundtrip():
    a = _rand(257, 16, seed=3)
    sk = FrequentDirections(8, 16)
    sk.update_batch(a)
    back = FrequentDirections.from_bytes(sk.to_bytes())
    assert back.n == sk.n and back.delta == sk.delta
    np.testing.assert_allclose(back.covariance(), sk.covariance())
    _check_certificate(back, a)


def test_kernel_shape_mismatch_raises():
    with pytest.raises(ValueError):
        FrequentDirections(8, 4).merge(FrequentDirections(8, 5))
    with pytest.raises(ValueError):
        FrequentDirections(8, 4).update_batch(np.zeros((3, 5)))


def _to_df(spark, a, labels=None):
    rows = [
        (int(i), [float(x) for x in a[i]],
         int(labels[i]) if labels is not None else 0)
        for i in range(a.shape[0])
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).repartition(8)


def test_distributed_build_matches_certificate(spark):
    a = _rand(2000, 16, seed=11)
    df = _to_df(spark, a)
    row = fd_sketch_by(df, [], "embedding", ell=10, dim=16).collect()[0]
    sk = FrequentDirections.from_bytes(bytes(row["state"]))
    _check_certificate(sk, a)
    # stats columns mirror the state
    assert row["n"] == 2000 and row["ell"] == 10 and row["dim"] == 16
    assert row["delta"] == sk.delta and row["fnorm2"] == sk.fnorm2


def test_grouped_build_and_rollup(spark):
    a = _rand(1200, 8, seed=13)
    labels = np.arange(1200) % 3
    df = _to_df(spark, a, labels)
    per = fd_sketch_by(df, ["label"], "embedding", ell=8, dim=8)
    rows = {r["label"]: r for r in per.collect()}
    assert set(rows) == {0, 1, 2}
    for lab, r in rows.items():
        _check_certificate(
            FrequentDirections.from_bytes(bytes(r["state"])), a[labels == lab]
        )
    # rollup: drop the key via sketch merge only — no raw rescan
    glob = fd_merge(per, []).collect()[0]
    _check_certificate(FrequentDirections.from_bytes(bytes(glob["state"])), a)


def test_null_and_bad_length_skipped(spark):
    a = _rand(300, 8, seed=17)
    rows = [(i, [float(x) for x in a[i]], 0) for i in range(300)]
    rows += [(1000, None, 0), (1001, [1.0, 2.0], 0)]  # NULL + wrong dim
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).repartition(4)
    row = fd_sketch_by(df, [], "embedding", ell=6, dim=8).collect()[0]
    sk = FrequentDirections.from_bytes(bytes(row["state"]))
    assert sk.n == 300
    _check_certificate(sk, a)


def test_components_capture_low_rank_structure(spark):
    a = _rand(3000, 32, seed=19)  # rank ~4 + noise
    df = _to_df(spark, a)
    row = fd_sketch_by(df, [], "embedding", ell=16, dim=32).collect()[0]
    comp, _ = fd_components(row["state"], 4)
    # exact top-4 subspace
    _, _, vt = np.linalg.svd(a, full_matrices=False)
    exact_energy = np.linalg.norm(a @ vt[:4].T) ** 2
    fd_energy = np.linalg.norm(a @ comp.T) ** 2
    assert fd_energy >= 0.98 * exact_energy  # sketched subspace ~ exact

    # projection column: matches numpy matmul, NULL-preserving
    out = _to_df(spark, a[:50]).select(
        "vec_id", fd_project("embedding", comp).alias("proj")
    ).orderBy("vec_id").collect()
    got = np.array([r["proj"] for r in out])
    np.testing.assert_allclose(got, a[:50] @ comp.T, rtol=1e-9, atol=1e-9)


def test_diag_helper_within_delta(spark):
    a = _rand(800, 16, seed=23)
    df = _to_df(spark, a)
    row = fd_sketch_by(df, [], "embedding", ell=8, dim=16).collect()[0]
    diag = fd_covariance_diag(row["state"])
    exact = np.einsum("ij,ij->j", a, a)
    dev = exact - diag
    assert (dev >= -1e-6 * row["fnorm2"]).all()
    assert (dev <= row["delta"] + 1e-6 * row["fnorm2"]).all()


def test_gram_exact_global_and_grouped(spark):
    from hyper_spark.operators.matrix_sketch import (
        gram_by,
        gram_components,
        gram_covariance,
        gram_matrix,
        gram_merge,
    )

    a = _rand(1500, 12, seed=29)
    labels = np.arange(1500) % 4
    df = _to_df(spark, a, labels)

    row = gram_by(df, [], "embedding", dim=12).collect()[0]
    np.testing.assert_allclose(gram_matrix(row), a.T @ a, rtol=1e-12)
    assert row["n"] == 1500
    np.testing.assert_allclose(gram_covariance(row), np.cov(a.T), rtol=1e-10)

    per = gram_by(df, ["label"], "embedding", dim=12)
    rows = {r["label"]: r for r in per.collect()}
    assert set(rows) == {0, 1, 2, 3}
    for lab, r in rows.items():
        sub = a[labels == lab]
        np.testing.assert_allclose(gram_matrix(r), sub.T @ sub, rtol=1e-12)
        assert r["n"] == sub.shape[0]

    # rollup by blob addition == global build, exactly
    glob = gram_merge(per, []).collect()[0]
    np.testing.assert_allclose(gram_matrix(glob), a.T @ a, rtol=1e-12)
    assert glob["n"] == 1500

    # principal directions of the exact Gram == numpy SVD of A
    comp, sv = gram_components(row, 3)
    _, s_exact, vt = np.linalg.svd(a, full_matrices=False)
    np.testing.assert_allclose(sv, s_exact[:3], rtol=1e-9)
    # direction equality up to sign
    for i in range(3):
        assert abs(float(np.dot(comp[i], vt[i]))) > 1 - 1e-9


def test_gram_null_skip_and_guards(spark):
    from hyper_spark.operators.matrix_sketch import gram_by, gram_covariance, gram_matrix

    a = _rand(200, 6, seed=31)
    rows = [(i, [float(x) for x in a[i]], 0) for i in range(200)]
    rows += [(900, None, 0), (901, [1.0], 0)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).repartition(4)
    r = gram_by(df, [], "embedding", dim=6).collect()[0]
    assert r["n"] == 200
    np.testing.assert_allclose(gram_matrix(r), a.T @ a, rtol=1e-12)
    with pytest.raises(ValueError):
        gram_covariance({"n": 1, "dim": 6, "s": r["s"], "gram": r["gram"]})
