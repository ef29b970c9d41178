"""Product quantization (operators/quantize.py).

The oracle gate (pq_codebook_profile) checks codebook training
end-to-end against per-subspace SQL Lloyd unrolls; these tests pin
the rest: encode/search consistency with a sequential numpy PQ, ADC
recall on separable data, reconstruction-MSE monotonicity in k, and
the shape guards.
"""

from __future__ import annotations

import numpy as np
import pytest

from hyper_spark.operators.quantize import (
    pq_encode,
    pq_profile,
    pq_reconstruction_mse,
    pq_search,
    pq_train,
)


def _ref_pq_train(mat, ids, m, k, iters):
    n, d = mat.shape
    dsub = d // m
    subs = mat.reshape(n, m, dsub).transpose(1, 0, 2)
    order = np.argsort(ids)
    books = subs[:, order[:k], :].copy()
    for _ in range(iters):
        for s in range(m):
            d2 = ((subs[s][:, None, :] - books[s][None]) ** 2).sum(axis=2)
            cells = np.argmin(d2, axis=1)
            for c in range(k):
                members = subs[s][cells == c]
                if len(members):
                    books[s, c] = members.mean(axis=0)
    return books


def _toy(spark, n=240, d=8, m=2, seed=3, parts=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, d)) * 5.0
    mat = centers[rng.integers(0, 4, size=n)] + rng.normal(size=(n, d)) * 0.1
    ids = np.arange(n, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, mat)],
        "vec_id long, embedding array<double>",
    ).repartition(parts)
    return df, mat, ids


def test_train_matches_sequential(spark):
    df, mat, ids = _toy(spark)
    books = pq_train(df, m=2, k=4, iters=3)
    ref = _ref_pq_train(mat, ids, m=2, k=4, iters=3)
    assert books.shape == (2, 4, 4)
    assert np.allclose(books, ref, atol=1e-9)


def test_encode_and_search_match_numpy_adc(spark):
    df, mat, ids = _toy(spark)
    books = pq_train(df, m=2, k=4, iters=3)
    codes = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(df, books).select("vec_id", "pq_code").collect()
    }
    n, d = mat.shape
    subs = mat.reshape(n, 2, d // 2).transpose(1, 0, 2)
    for s in range(2):
        d2 = ((subs[s][:, None, :] - books[s][None]) ** 2).sum(axis=2)
        want = np.argmin(d2, axis=1)
        assert [codes[int(i)][s] for i in ids] == list(want)

    q = mat[:3]
    got = pq_search(df.transform(lambda x: pq_encode(x, books)), books, q, k=5)
    rows = sorted(
        [(r["query_id"], r["rank"], r["vec_id"], r["adc_dist"]) for r in got.collect()]
    )
    # numpy ADC reference
    code_mat = np.array([codes[int(i)] for i in ids])
    qsubs = q.reshape(len(q), 2, d // 2).transpose(1, 0, 2)
    tables = np.stack(
        [((qsubs[s][:, None, :] - books[s][None]) ** 2).sum(axis=2) for s in range(2)],
        axis=1,
    )
    for qi in range(len(q)):
        dist = tables[qi, np.arange(2)[None, :], code_mat].sum(axis=1)
        order = np.lexsort((ids, dist))[:5]
        mine = [r for r in rows if r[0] == qi]
        assert [r[2] for r in mine] == [int(ids[j]) for j in order]
        assert np.allclose([r[3] for r in mine], dist[order])


def test_adc_top1_exact_on_separated_clusters(spark):
    # 0.1-sigma clusters 5 units apart: quantization error << cluster
    # gap, so ADC's nearest cluster == exact nearest cluster
    df, mat, ids = _toy(spark, n=200)
    books = pq_train(df, m=2, k=4, iters=4)
    encoded = pq_encode(df, books)
    q = mat[7][None, :]
    top = pq_search(encoded, books, q, k=20).collect()
    exact = np.argsort(((mat - q) ** 2).sum(axis=1))[:1]
    got_ids = {r["vec_id"] for r in top}
    assert int(exact[0]) in got_ids


def test_mse_decreases_with_k(spark):
    df, _, _ = _toy(spark, n=200)
    m1 = pq_reconstruction_mse(df, pq_train(df, m=2, k=2, iters=3))
    m2 = pq_reconstruction_mse(df, pq_train(df, m=2, k=4, iters=3))
    assert m2 < m1


def test_profile_counts_and_guards(spark):
    df, mat, _ = _toy(spark, n=120)
    prof = pq_profile(df, m=2, k=4, iters=2).collect()
    by_sub = {}
    for r in prof:
        by_sub.setdefault(r["subspace"], 0)
        by_sub[r["subspace"]] += r["n_members"]
    assert by_sub == {0: 120, 1: 120}
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, m=3, k=4, iters=1)


def test_ivfpq_index_roundtrip(spark, tmp_path):
    """Build the persisted IVFPQ layout, then: probe-all == plain ADC
    over every code (the IVF mask only restricts, never reorders), a
    1-probe query reads ONLY the probed cells' files (partition
    pruning), and the index files carry codes, not vectors."""
    import os

    from hyper_spark.operators.quantize import build_ivfpq_index, knn_ivfpq

    df, mat, ids = _toy(spark, n=200)
    path = str(tmp_path / "ivfpq")
    cents, books = build_ivfpq_index(
        df, path, n_cells=4, m=2, k_pq=4, iters=3
    )
    assert cents.shape == (4, 8) and books.shape == (2, 4, 4)

    q = mat[:2]
    full = pq_search(pq_encode(df, books), books, q, k=5)
    want = sorted(
        (r["query_id"], r["rank"], r["vec_id"]) for r in full.collect()
    )
    got_df = knn_ivfpq(spark, path, q, k=5, n_probe=4)  # probe-all
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"]) for r in got_df.collect()
    )
    assert got == want

    narrow = knn_ivfpq(spark, path, q[:1], k=3, n_probe=1)
    # partition pruning is physical: inputFiles() lists leaves
    # pre-pruning, so assert the pushed PartitionFilters instead
    import re

    plan = narrow._jdf.queryExecution().executedPlan().toString()
    seg = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    # single-cell isin compiles to (cell = N) — any cell predicate in
    # PartitionFilters proves the probe reached the directory listing
    assert seg and "cell" in seg.group(1)
    assert narrow.count() == 3

    codes = spark.read.parquet(os.path.join(path, "codes"))
    assert set(codes.columns) == {"vec_id", "pq_code", "cell"}


def test_ivfpq_residual_mode(spark, tmp_path):
    """IVFADC residual encoding: on clustered data the residual
    codebooks spend their budget on within-cell variation, so (a)
    reconstruction of x via centroid[cell] + decode(code) beats the
    raw-PQ reconstruction, and (b) residual search still finds the
    exact nearest neighbor on separated clusters."""
    import json
    import os

    from hyper_spark.operators.quantize import build_ivfpq_index, knn_ivfpq

    df, mat, ids = _toy(spark, n=200)
    raw_path, res_path = str(tmp_path / "raw"), str(tmp_path / "res")
    cents_raw, books_raw = build_ivfpq_index(
        df, raw_path, n_cells=4, m=2, k_pq=4, iters=3
    )
    cents_res, books_res = build_ivfpq_index(
        df, res_path, n_cells=4, m=2, k_pq=4, iters=3, residual=True
    )
    assert json.load(open(os.path.join(res_path, "meta.json")))["residual"]

    # reconstruction: residual mode reconstructs x ≈ centroid + decode
    def recon_mse(path, cents, books, residual):
        codes = {
            r["vec_id"]: (r["cell"], list(r["pq_code"]))
            for r in spark.read.parquet(os.path.join(path, "codes")).collect()
        }
        m, _, dsub = books.shape
        err = 0.0
        for i, x in zip(ids, mat):
            cell, code = codes[int(i)]
            dec = np.concatenate([books[s, code[s]] for s in range(m)])
            if residual:
                dec = cents[cell] + dec
            err += ((x - dec) ** 2).sum()
        return err / len(ids)

    mse_raw = recon_mse(raw_path, cents_raw, books_raw, False)
    mse_res = recon_mse(res_path, cents_res, books_res, True)
    assert mse_res < mse_raw

    # recall on separated clusters (vectors sharing a residual code tie
    # on ADC distance, so membership, not rank-1, is the contract)
    for qi in (3, 42):
        q = mat[qi][None, :]
        top = {
            r["vec_id"]
            for r in knn_ivfpq(spark, res_path, q, k=20, n_probe=4).collect()
        }
        exact = int(np.argmin(((mat - q) ** 2).sum(axis=1)))
        assert exact == qi and qi in top
