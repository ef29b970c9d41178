"""Distributed Lloyd k-means (operators/clustering.py).

The oracle gate (kmeans_cluster_profile) checks the 3-iteration SQL
unroll end-to-end; these tests pin the algorithmic contract pieces the
gate can't isolate: parity with a sequential numpy Lloyd under the same
determinism rules, non-increasing inertia, empty-cell retention,
partitioning invariance of the reduced state, and the spherical-mode
bridge into knn_ivf.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_profile,
)


def _reference_lloyd(mat: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Sequential Lloyd under clustering.py's determinism contract:
    seeds = k smallest ids, L2 argmin (first-minimum tie-break), empty
    cells keep their centroid."""
    order = np.argsort(ids)
    cents = mat[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None]) ** 2).sum(axis=2)
        cells = np.argmin(d2, axis=1)
        new = cents.copy()
        for c in range(k):
            members = mat[cells == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cents = new
    d2 = ((mat[:, None, :] - cents[None]) ** 2).sum(axis=2)
    return cents, np.argmin(d2, axis=1)


def _toy(spark, n=400, d=16, k=4, parts=6, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 4.0
    mat = centers[rng.integers(0, k, size=n)] + rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, mat)],
        "vec_id long, embedding array<double>",
    ).repartition(parts)
    return df, mat, ids


def test_matches_sequential_lloyd(spark):
    df, mat, ids = _toy(spark)
    cents = kmeans_fit(df, k=4, iters=3)
    ref_cents, ref_cells = _reference_lloyd(mat, ids, k=4, iters=3)
    # float sum ORDER differs between the distributed reduce and numpy,
    # so allclose, not equality
    assert np.allclose(cents, ref_cents, atol=1e-9)
    got = {
        r["vec_id"]: r["cell"]
        for r in kmeans_assign(df, cents).select("vec_id", "cell").collect()
    }
    assert [got[int(i)] for i in ids] == list(ref_cells)


def test_inertia_non_increasing(spark):
    df, _, _ = _toy(spark, seed=11)
    _, trace = kmeans_fit(df, k=4, iters=5, return_inertia=True)
    assert len(trace) == 5
    assert all(b <= a * (1 + 1e-12) for a, b in zip(trace, trace[1:]))


def test_empty_cell_retains_centroid(spark):
    # ids 0 and 1 carry the SAME point: both seed a cell, the tie sends
    # every member to the lower cell, cell 1 stays empty at the fixed
    # point and must keep its seed centroid across every iteration
    pts = [[0.0, 0.0], [0.0, 0.0], [9.0, 9.0]]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(df, k=3, iters=3)
    assert np.allclose(cents[1], [0.0, 0.0])
    prof = {
        r["cell"]: r["n_members"]
        for r in kmeans_profile(df, k=3, iters=3).collect()
    }
    assert prof == {0: 2, 2: 1}


def test_partitioning_invariance(spark):
    df, _, _ = _toy(spark, seed=3)
    c1 = kmeans_fit(df.repartition(1), k=4, iters=3)
    c7 = kmeans_fit(df.repartition(7), k=4, iters=3)
    assert np.allclose(c1, c7, atol=1e-9)


def test_k_exceeds_rows_raises(spark):
    df = spark.createDataFrame(
        [(0, [1.0]), (1, [2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(df, k=5, iters=1)
    with pytest.raises(ValueError, match="mode"):
        kmeans_fit(df, k=2, iters=1, mode="cosine")


def test_spherical_feeds_knn_ivf(spark):
    from hyper_spark.operators.similarity import knn_brute, knn_ivf

    df, mat, _ = _toy(spark, n=300, d=8, k=3, seed=5)
    cents = kmeans_fit(df, k=3, iters=4, mode="spherical")
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    q = mat[:2]
    got = knn_ivf(df, q, k=5, n_probe=3, centroids=cents)  # probe-all: exact
    want = knn_brute(df, q, k=5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["rank"], r["vec_id"]) for r in got.collect()],
        key=lambda t: t[:2],
    ) == sorted(
        [(r["query_id"], r["rank"], r["vec_id"]) for r in want.collect()],
        key=lambda t: t[:2],
    )


def test_tol_early_exit(spark):
    # tight clusters converge after ~2 iterations: tol stops early and
    # the centroids match the full-iteration run
    df, _, _ = _toy(spark, seed=3)
    full = kmeans_fit(df, k=4, iters=8)
    early, trace = kmeans_fit(
        df, k=4, iters=8, tol=1e-6, return_inertia=True
    )
    assert len(trace) < 8
    assert np.allclose(early, full, atol=1e-9)
