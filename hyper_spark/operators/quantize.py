"""Product quantization (PQ) for embedding compression + ADC search.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split d dims into m subspaces, vector-quantize
each with its own k-codeword codebook, store each vector as m small
codes (m bytes at k=256 — a 64-dim float32 embedding compresses
256 B → 8 B, 32×), and answer queries by Asymmetric Distance
Computation: per query, one m×k table of exact subspace distances,
then every database vector scores as m table lookups. This is the
scale path past IVF: at 10⁹+ vectors the raw vectors no longer fit
anywhere, the codes do.

Spark shape (same mergeable-partial discipline as clustering.py,
which this module generalizes to m codebooks trained in ONE pass per
iteration):

- ``pq_train``: per iteration, one ``mapInPandas`` pass reduces every
  Arrow batch to ≤ m·k rows ``(subspace, cell, [Σsubvec ++ count ++
  Σmin-d²])``; a posexplode aggregate map-side-combines them to
  m·k·(d/m + 2) per partition and only that reaches the driver.
- ``pq_encode``: codebooks ride the UDF closure; one matmul per
  subspace per batch; output is an ``array<int>`` of m codes.
- ``pq_search``: ADC — the per-query distance tables are built
  driver-side (m·k·|Q| floats), shipped in the closure, and each
  partition emits only its top-k candidates (the knn_brute partial
  top-k shape); no raw vector is ever read at query time.

Determinism contract (inherited from clustering.py, which buys the
SQL oracle ``pq_codebook_profile`` — per-subspace Lloyd unrolled as
chained CTEs over DuckDB list SLICES): subspace s of a vector is
``embedding[s·d/m+1 : (s+1)·d/m]``; seeds = the k smallest ids'
subvectors; fixed iterations; L2 argmin with ties to the smaller
cell; empty cells retain their centroid.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hyper_spark.operators.clustering import _assign_batch, _seed_centroids

__all__ = [
    "build_ivfpq_index",
    "knn_ivfpq",
    "pq_train",
    "pq_encode",
    "pq_search",
    "pq_profile",
    "pq_reconstruction_mse",
]


def _split(mat: np.ndarray, m: int) -> np.ndarray:
    """(n, d) → (m, n, d/m) subspace views."""
    n, d = mat.shape
    return mat.reshape(n, m, d // m).transpose(1, 0, 2)


def _train_partial_fn(books: np.ndarray, vec_col: str):
    m, k, dsub = books.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            subs = _split(mat, m)
            out_s, out_c, out_state = [], [], []
            for s in range(m):
                cells = _assign_batch(subs[s], books[s])
                counts = np.bincount(cells, minlength=k).astype(np.float64)
                state = np.zeros((k, dsub + 2))
                np.add.at(state[:, :dsub], cells, subs[s])
                state[:, dsub] = counts
                diffs = subs[s] - books[s][cells]
                np.add.at(state[:, dsub + 1], cells, (diffs * diffs).sum(axis=1))
                nz = counts > 0
                out_s.extend([s] * int(nz.sum()))
                out_c.extend(np.nonzero(nz)[0].tolist())
                out_state.extend(list(state[nz]))
            yield pd.DataFrame(
                {"subspace": out_s, "cell": out_c, "state": out_state}
            )

    return run


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 256,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train m codebooks of k codewords each; returns (m, k, d/m)
    float64. All m subspace Lloyd loops advance together — one
    mapInPandas pass + one m·k·(d/m+2) collect per iteration."""
    seeds = _seed_centroids(df, k, id_col, vec_col)  # (k, d)
    d = seeds.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = _split(seeds, m).transpose(0, 1, 2).copy()  # (m, k, dsub)
    vecs = df.select(vec_col).filter(F.col(vec_col).isNotNull())
    for _ in range(iters):
        partials = vecs.mapInPandas(
            _train_partial_fn(books, vec_col),
            schema="subspace int, cell long, state array<double>",
        )
        rows = (
            partials.select(
                "subspace", "cell", F.posexplode("state").alias("pos", "val")
            )
            .groupBy("subspace", "cell", "pos")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        state = np.zeros((m, k, dsub + 2))
        for r in rows:
            state[r["subspace"], r["cell"], r["pos"]] = r["s"]
        counts = state[:, :, dsub]
        nz = counts > 0
        new = books.copy()  # empty cells retain their codeword
        new[nz] = state[nz][:, :dsub] / counts[nz][:, None]
        books = new
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Adds ``code_col`` = array<int> of m codes (the 32× compression
    step). Codebooks ride the closure; one matmul per subspace per
    Arrow batch; nothing shuffles."""
    books = np.asarray(codebooks, dtype=np.float64)
    m = books.shape[0]

    @F.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        subs = _split(mat, m)
        codes = np.stack(
            [_assign_batch(subs[s], books[s]) for s in range(m)], axis=1
        ).astype(np.int32)
        return pd.Series(list(codes))

    return df.withColumn(code_col, encode(F.col(vec_col)))


def pq_search(
    df: DataFrame,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    query_ids: np.ndarray | None = None,
) -> DataFrame:
    """ADC top-k over PQ codes: [query_id, id, adc_dist, rank], rank by
    ascending approximate L2. Partial per-partition top-k (the
    knn_brute shape) — shuffle is candidates only, ≤ partitions·|Q|·k
    rows."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, kc, dsub = books.shape
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(queries)),
        dtype=np.int64,
    )
    qsubs = _split(queries, m)  # (m, nq, dsub)
    # exact subspace distances: tables[q, s, c] = ||q_s - book[s, c]||²
    tables = np.stack(
        [
            ((qsubs[s][:, None, :] - books[s][None]) ** 2).sum(axis=2)
            for s in range(m)
        ],
        axis=1,
    )  # (nq, m, kc)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf[code_col].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            # ADC: m gather-sums per query over the whole batch
            for qi in range(len(qids)):
                dist = tables[qi, np.arange(m)[None, :], codes].sum(axis=1)
                # (dist, id) is a TOTAL order, so the per-partition
                # top-k provably contains the global top-k even when
                # identical codes tie on distance (row order varies
                # between a DataFrame and its parquet round-trip)
                top = np.lexsort((ids, dist))[:k]
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        id_col: ids[top],
                        "adc_dist": dist[top],
                    }
                )

    partials = df.select(id_col, code_col).mapInPandas(
        run, schema=f"query_id long, {id_col} long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", F.col(id_col))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_profile(
    df: DataFrame,
    m: int = 2,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Train + per-(subspace, cell) summary — the gate surface:
    [subspace, cell, n_members, avg_dist] with avg Euclidean SUBSPACE
    distance to the final codeword (empty cells absent)."""
    books = pq_train(df, m=m, k=k, iters=iters, id_col=id_col, vec_col=vec_col)

    # one ARRAY of m (subspace, cell, dist) structs per row, exploded
    # JVM-side — all m subspace labels in a single Arrow pass
    @F.pandas_udf("array<struct<subspace:int,cell:bigint,dist:double>>")
    def label_all(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        subs = _split(mat, m)
        per_s = []
        for s in range(m):
            cells = _assign_batch(subs[s], books[s])
            diffs = subs[s] - books[s][cells]
            per_s.append(
                (cells, np.sqrt((diffs * diffs).sum(axis=1)))
            )
        out = [
            [
                {"subspace": s, "cell": int(per_s[s][0][i]),
                 "dist": float(per_s[s][1][i])}
                for s in range(m)
            ]
            for i in range(len(mat))
        ]
        return pd.Series(out)

    labeled = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.explode(label_all(F.col(vec_col))).alias("sc"))
        .select("sc.subspace", "sc.cell", "sc.dist")
    )
    return labeled.groupBy("subspace", "cell").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("dist"), round_to).alias("avg_dist"),
    )


def _residualize(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    cell_col: str = "cell",
    out_col: str = "__resid",
) -> DataFrame:
    """Adds ``out_col`` = x − centroid[cell] (the IVFADC residual).
    Centroids ride the closure; one gather-subtract per Arrow batch."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def resid(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        out = mat - cents[cells.to_numpy().astype(np.int64)]
        return pd.Series(list(out))

    return df.withColumn(out_col, resid(F.col(vec_col), F.col(cell_col)))


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    k_pq: int = 256,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Persist the FAISS-style IVFPQ layout: coarse spherical k-means
    cells (partition-pruned directories, like `build_ivf_index`) whose
    files hold ONLY ``(id, pq_code)`` — m bytes of payload per vector,
    never the raw embedding, so a 10⁹×768-float32 corpus's hot index is
    ~8 GB instead of ~3 TB and a 25%-probe query reads 25% of THAT.
    Returns (centroids, codebooks); both persist as JSON beside a
    meta.json recording the encoding mode.

    ``residual=False`` quantizes RAW vectors (one global codebook set,
    query tables independent of the probed cell). ``residual=True`` is
    the original IVFADC (Jégou et al. §IV.B): codebooks quantize
    x − centroid[cell], which spends the code budget on WITHIN-cell
    variation — lower quantization error on clustered corpora for the
    price of per-(query, probed-cell) ADC tables at search time."""
    import json
    import os

    from hyper_spark.operators.clustering import kmeans_assign, kmeans_fit

    centroids = kmeans_fit(
        df, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col,
        mode="spherical",
    )
    assigned = kmeans_assign(df, centroids, vec_col=vec_col)
    if residual:
        assigned = _residualize(assigned, centroids, vec_col).persist()
        codebooks = pq_train(
            assigned, m=m, k=k_pq, iters=iters,
            id_col=id_col, vec_col="__resid",
        )
        encoded = pq_encode(assigned, codebooks, vec_col="__resid")
    else:
        codebooks = pq_train(
            df, m=m, k=k_pq, iters=iters, id_col=id_col, vec_col=vec_col
        )
        encoded = pq_encode(assigned, codebooks, vec_col=vec_col)
    encoded.select(id_col, "cell", "pq_code").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(path, "codes"))
    if residual:
        assigned.unpersist()
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)
    with open(os.path.join(path, "codebooks.json"), "w") as f:
        json.dump(codebooks.tolist(), f)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"residual": residual, "id_col": id_col}, f)
    return centroids, codebooks


def knn_ivfpq(
    spark,
    path: str,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    query_ids: np.ndarray | None = None,
) -> DataFrame:
    """Query a persisted IVFPQ index: the ``cell IN (...)`` filter
    prunes to the probed cells' DIRECTORIES (the `knn_with_index`
    partition-pruning shape), the per-query probe mask lives inside
    the map-side ADC top-k (a query's heap never sees cells it did not
    probe), and scoring reads only (id, cell, pq_code) — m bytes per
    candidate. Returns [query_id, id, adc_dist, rank].

    Residual-mode indexes (meta.json) get per-(query, probed-cell) ADC
    tables — |Q|·n_probe·m·k doubles built driver-side, still tiny —
    because the stored code quantizes x − centroid[cell]."""
    import json
    import os

    from hyper_spark.operators.similarity import _probe

    centroids = np.asarray(
        json.load(open(os.path.join(path, "centroids.json")))
    )
    books = np.asarray(json.load(open(os.path.join(path, "codebooks.json"))))
    meta_path = os.path.join(path, "meta.json")
    residual = (
        json.load(open(meta_path)).get("residual", False)
        if os.path.exists(meta_path)
        else False
    )
    m, kc, dsub = books.shape
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(queries)),
        dtype=np.int64,
    )
    _qn, probe_cells, all_cells = _probe(queries, centroids, n_probe)
    # probe mask as a (nq, n_cells) boolean — rides the closure
    mask = np.zeros((len(queries), len(centroids)), dtype=bool)
    for qi, cells in enumerate(probe_cells):
        mask[qi, cells] = True

    def _adc_tables(qmat: np.ndarray) -> np.ndarray:
        qsubs = _split(qmat, m)
        return np.stack(
            [
                ((qsubs[s][:, None, :] - books[s][None]) ** 2).sum(axis=2)
                for s in range(m)
            ],
            axis=1,
        )

    if residual:
        # tables keyed (query, probed cell): code quantizes x − c_cell,
        # so the query must be residualized against the SAME centroid
        rtables = {
            (qi, int(c)): _adc_tables((queries[qi] - centroids[c])[None])[0]
            for qi in range(len(queries))
            for c in probe_cells[qi]
        }
    else:
        tables = _adc_tables(queries)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["pq_code"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            for qi in range(len(qids)):
                sel = mask[qi, cells]
                if not sel.any():
                    continue
                if residual:
                    dist = np.empty(int(sel.sum()))
                    sel_cells = cells[sel]
                    sel_codes = codes[sel]
                    for c in np.unique(sel_cells):
                        mc = sel_cells == c
                        t = rtables[(qi, int(c))]
                        dist[mc] = t[np.arange(m)[None, :], sel_codes[mc]].sum(axis=1)
                else:
                    dist = tables[qi, np.arange(m)[None, :], codes[sel]].sum(axis=1)
                top = np.lexsort((ids[sel], dist))[:k]  # total order (see pq_search)
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        id_col: ids[sel][top],
                        "adc_dist": dist[top],
                    }
                )

    codes_df = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("cell").isin([int(c) for c in all_cells])
    )
    partials = codes_df.select(id_col, "cell", "pq_code").mapInPandas(
        run, schema=f"query_id long, {id_col} long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", F.col(id_col))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_reconstruction_mse(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> float:
    """Mean ||x − decode(encode(x))||² — the PQ quality number (equals
    the sum of the m subspace quantization MSEs)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m = books.shape[0]

    @F.pandas_udf("double")
    def err(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        subs = _split(mat, m)
        total = np.zeros(len(mat))
        for s in range(m):
            cells = _assign_batch(subs[s], books[s])
            diffs = subs[s] - books[s][cells]
            total += (diffs * diffs).sum(axis=1)
        return pd.Series(total)

    row = (
        df.filter(F.col(vec_col).isNotNull())
        .select(err(F.col(vec_col)).alias("e"))
        .agg(F.avg("e").alias("mse"))
        .first()
    )
    return float(row["mse"])
