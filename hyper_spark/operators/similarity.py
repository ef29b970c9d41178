"""Similarity search over embedding columns (array<float>).

``knn_brute``: the exactness baseline — per-partition top-k via one numpy
matmul per Arrow batch (queries broadcast in the closure), then a global
top-k window over the ≤ partitions × queries × k survivors. No raw
vector ever shuffles; the shuffle is the candidate rows only. This is
the map-side-combine shape again: wall-clock scales with partitions,
result is exact.

``knn_ivf``: the scale path — coarse k-means-style centroids (sampled
deterministically, refined with a few Lloyd iterations on a sample),
vectors assigned to their nearest centroid (one matmul), queries probe
``n_probe`` nearest cells; brute search within probed cells. Recall
depends on n_probe/n_cells; exactness returns at n_probe = n_cells.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

__all__ = ["knn_brute", "knn_ivf", "ivf_assign", "build_ivf_index", "knn_with_index"]


def _topk_map_fn(queries: np.ndarray, query_ids: np.ndarray, k: int, id_col: str, vec_col: str):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best_scores = np.full((len(qn), k), -np.inf)
        best_ids = np.full((len(qn), k), -1, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            scores = qn @ mat.T  # (q, batch)
            take = min(k, scores.shape[1])
            part = np.argpartition(-scores, take - 1, axis=1)[:, :take]
            cand_scores = np.concatenate(
                [best_scores, np.take_along_axis(scores, part, axis=1)], axis=1
            )
            cand_ids = np.concatenate([best_ids, ids[part]], axis=1)
            sel = np.argpartition(-cand_scores, k - 1, axis=1)[:, :k]
            best_scores = np.take_along_axis(cand_scores, sel, axis=1)
            best_ids = np.take_along_axis(cand_ids, sel, axis=1)
        mask = best_ids.reshape(-1) >= 0
        yield pd.DataFrame(
            {
                "query_id": np.repeat(query_ids, k)[mask],
                id_col: best_ids.reshape(-1)[mask],
                "score": best_scores.reshape(-1)[mask],
            }
        )

    return run


def knn_brute(
    df: DataFrame,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: Sequence[int] | None = None,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Returns DataFrame[query_id, id_col, score, rank] with rank 1..k."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(queries)),
        dtype=np.int64,
    )
    partials = df.select(id_col, vec_col).mapInPandas(
        _topk_map_fn(queries, qids, k, id_col, vec_col),
        schema=f"query_id long, {id_col} long, score double",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _train_centroids(
    df: DataFrame, vec_col: str, n_cells: int, sample: int, iters: int, seed: int
) -> np.ndarray:
    rows = (
        df.select(vec_col)
        .sample(False, 1.0, seed=seed)
        .limit(sample)
        .toPandas()[vec_col]
        .to_numpy()
    )
    mat = np.stack(rows).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    return centroids


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Adds a ``cell`` column = nearest centroid id (one matmul per batch)."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(LongType())
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ cents.T, axis=1))

    return df.withColumn("cell", assign(F.col(vec_col)))


def knn_ivf(
    df: DataFrame,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    sample: int = 10000,
    iters: int = 5,
    seed: int = 23,
    query_ids: Sequence[int] | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the n_probe nearest cells per query,
    brute-search only those cells' vectors."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(queries)),
        dtype=np.int64,
    )
    centroids = _train_centroids(df, vec_col, n_cells, sample, iters, seed)
    assigned = ivf_assign(df, centroids, vec_col)

    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    probe_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    # (query, cell) probe list — tiny, broadcast into a join
    probes = [
        (int(qids[qi]), int(c)) for qi in range(len(qids)) for c in probe_cells[qi]
    ]
    spark = df.sparkSession
    probe_df = spark.createDataFrame(probes, schema="query_id long, cell long")
    candidates = assigned.join(
        F.broadcast(probe_df.select("cell").distinct()), on="cell"
    )

    partials = candidates.select(id_col, vec_col, "cell").mapInPandas(
        _topk_map_fn(qn, qids, k, id_col, vec_col),
        schema=f"query_id long, {id_col} long, score double",
    )
    # keep only hits whose vector lives in a cell this query probed
    cell_of = assigned.select(F.col(id_col), F.col("cell"))
    filtered = partials.join(cell_of, on=id_col).join(
        F.broadcast(probe_df), on=["query_id", "cell"], how="leftsemi"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        filtered.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def build_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    sample: int = 10000,
    iters: int = 5,
    seed: int = 23,
) -> np.ndarray:
    """Persist an IVF index: centroids (JSON) + vectors parquet
    partitioned by cell. Queries then touch only the probed cells'
    *directories* — classic partition pruning, so at 100 TB a 1%-probe
    query reads 1% of the index. Returns the centroids."""
    import json
    import os

    centroids = _train_centroids(df, vec_col, n_cells, sample, iters, seed)
    assigned = ivf_assign(df, centroids, vec_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "vectors")
    )
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)
    return centroids


def knn_with_index(
    spark,
    path: str,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: Sequence[int] | None = None,
) -> DataFrame:
    """Query a persisted IVF index: probe the n_probe nearest cells per
    query via a partition-pruning filter (``cell IN (...)`` reaches the
    directory listing), brute-search only those vectors."""
    import json
    import os

    from pyspark.sql import Window

    centroids = np.asarray(json.load(open(os.path.join(path, "centroids.json"))))
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(queries)),
        dtype=np.int64,
    )
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    probe_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    all_cells = sorted({int(c) for row in probe_cells for c in row})

    vectors = spark.read.parquet(os.path.join(path, "vectors")).filter(
        F.col("cell").isin(all_cells)
    )
    partials = vectors.select(id_col, vec_col, "cell").mapInPandas(
        _topk_map_fn(qn, qids, k, id_col, vec_col),
        schema=f"query_id long, {id_col} long, score double",
    )
    probe_df = spark.createDataFrame(
        [(int(qids[qi]), int(c)) for qi in range(len(qids)) for c in probe_cells[qi]],
        schema="query_id long, cell long",
    )
    cell_of = spark.read.parquet(os.path.join(path, "vectors")).select(
        F.col(id_col), F.col("cell")
    )
    filtered = partials.join(cell_of, on=id_col).join(
        F.broadcast(probe_df), on=["query_id", "cell"], how="leftsemi"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        filtered.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )
