"""Distributed Lloyd k-means over an embedding column.

Why this exists next to ``similarity._train_centroids``: that trainer
Lloyd-refines a driver-side UNIFORM SAMPLE (a documented trade — one
TakeOrdered pass, refinement free, but the centroids only ever see
``sample`` rows). ``kmeans_fit`` is the full-corpus trainer: every
iteration is ONE ``mapInPandas`` pass that reduces each Arrow batch to
at most k partial rows ``(cell, [sum-vector ++ count ++ sum-min-d2])``
and one tiny JVM aggregate over them; the only data that ever reaches
the driver is the k x (d+2) reduced state. That is the classic
scalable-k-means shape — centroids broadcast down in the UDF closure,
partials tree-reduced up — so shuffle bytes per iteration are
O(partitions x k x d), independent of row count, and the plan survives
a 100-TB corpus where a sample trainer's centroids go stale.

Determinism contract (what makes a DuckDB SQL oracle for an ITERATIVE
algorithm possible, gate ``kmeans_cluster_profile``):

- init = the k rows with the SMALLEST id (TakeOrdered; no ``rand()``),
  cell c = rank of its seed id;
- fixed iteration count, no tolerance-based early exit;
- assignment = squared-L2 argmin in float64 with ties broken toward
  the smaller cell id (``np.argmin`` picks the first minimum; the
  oracle's window orders by ``(dist, cell)``);
- empty cells retain their previous centroid (never re-seeded from a
  random point).

``mode='spherical'`` row-normalizes the input and re-normalizes
centroids each round (cosine / spherical k-means) — this is the
variant ``similarity.ivf_assign`` expects, so a full-corpus training
run can feed ``knn_ivf(..., centroids=...)`` / ``build_ivf_index``
directly.

Reference parity: the reference engine has no clustering surface
(it is an HLL library); this operator is part of the training-data
pipeline mandate (SemDeDup's cluster-then-screen stage, IVF coarse
quantizer training). Algorithm: Lloyd 1982; the partial-aggregate
shape follows the mergeable-state design used across this repo
(SURVEY §3).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_assign", "kmeans_profile"]


def _seed_centroids(
    df: DataFrame, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """k seed vectors = the k smallest ids. orderBy(id).limit(k) compiles
    to TakeOrderedAndProject: per-partition top-k heap + driver merge,
    one scan, never a full sort."""
    rows = (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds non-null row count {len(rows)}")
    return np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])


def _assign_batch(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 via the -2x.c + |c|^2 expansion (|x|^2 is
    constant per row and cannot change the argmin). One matmul per
    batch; float64 throughout. Margins between cells dwarf the ~1e-14
    relative error of the expansion, so the ranking matches an exact
    per-cell difference (and the SQL oracle's list_distance)."""
    scores = mat @ cents.T
    scores *= -2.0
    scores += (cents * cents).sum(axis=1)[None, :]
    return np.argmin(scores, axis=1)


def _partial_fn(
    cents: np.ndarray, vec_col: str, normalize: bool
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    k, d = cents.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                mat /= np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
                )
            cells = _assign_batch(mat, cents)
            counts = np.bincount(cells, minlength=k).astype(np.float64)
            nz = counts > 0
            # state = [sum-vector (d) | count | sum of min squared dist]
            state = np.zeros((k, d + 2))
            np.add.at(state[:, :d], cells, mat)
            state[:, d] = counts
            diffs = mat - cents[cells]
            d2 = (diffs * diffs).sum(axis=1)
            np.add.at(state[:, d + 1], cells, d2)
            yield pd.DataFrame(
                {
                    "cell": np.nonzero(nz)[0].astype(np.int64),
                    "state": list(state[nz]),
                }
            )

    return run


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "l2",
    return_inertia: bool = False,
    tol: float | None = None,
) -> np.ndarray | tuple[np.ndarray, list[float]]:
    """Full-corpus Lloyd k-means; returns k x d float64 centroids
    (optionally with the per-iteration inertia trace, which is
    non-increasing — each trace entry is sum of min squared distances
    to the centroids *entering* that iteration).

    ``tol`` opts into early exit when the RELATIVE inertia improvement
    drops below it (checked from the second iteration on). The default
    None keeps the fixed-iteration determinism contract the SQL oracle
    unrolls; with tol set, the iteration count becomes data-dependent
    (still deterministic for a given input).

    Each iteration: one scan, one mapInPandas reduce to <=k rows per
    Arrow batch, one posexplode + groupBy over those partials (map-side
    combined to k x (d+2) per partition), one k x (d+2) collect."""
    if mode not in ("l2", "spherical"):
        raise ValueError(f"mode must be 'l2' or 'spherical', got {mode!r}")
    normalize = mode == "spherical"
    cents = _seed_centroids(df, k, id_col, vec_col)
    d = cents.shape[1]
    if normalize:
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    vecs = df.select(vec_col).filter(F.col(vec_col).isNotNull())
    inertia: list[float] = []
    for _ in range(iters):
        partials = vecs.mapInPandas(
            _partial_fn(cents, vec_col, normalize),
            schema="cell long, state array<double>",
        )
        rows = (
            partials.select(
                "cell", F.posexplode("state").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        state = np.zeros((k, d + 2))
        for r in rows:
            state[r["cell"], r["pos"]] = r["s"]
        counts = state[:, d]
        inertia.append(float(state[:, d + 1].sum()))
        nz = counts > 0
        new = cents.copy()  # empty cells retain their previous centroid
        new[nz] = state[nz, :d] / counts[nz, None]
        if normalize:
            new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cents = new
        if (
            tol is not None
            and len(inertia) >= 2
            and inertia[-2] > 0
            and (inertia[-2] - inertia[-1]) / inertia[-2] < tol
        ):
            break
    return (cents, inertia) if return_inertia else cents


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
    dist_col: str | None = None,
    mode: str = "l2",
) -> DataFrame:
    """Labels every row with its nearest centroid (and, if ``dist_col``,
    the Euclidean distance to it). Centroids ride the UDF closure
    (broadcast); one matmul per Arrow batch; nothing shuffles."""
    cents = np.asarray(centroids, dtype=np.float64)
    normalize = mode == "spherical"

    @F.pandas_udf("cell long, dist double")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        if normalize:
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cells = _assign_batch(mat, cents)
        diffs = mat - cents[cells]
        return pd.DataFrame(
            {"cell": cells, "dist": np.sqrt((diffs * diffs).sum(axis=1))}
        )

    out = df.withColumn("_km", assign(F.col(vec_col)))
    out = out.withColumn(cell_col, F.col("_km.cell"))
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("_km.dist"))
    return out.drop("_km")


def kmeans_profile(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "l2",
    round_to: int = 4,
) -> DataFrame:
    """Train + label + per-cluster summary: (cell, n_members, avg_dist).
    Empty cells are absent (they have no members to summarize). The
    rounding keeps the value stable under float summation order, which
    Spark and the SQL oracle are free to differ on."""
    cents = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, mode=mode)
    assigned = kmeans_assign(df, cents, vec_col=vec_col, dist_col="dist", mode=mode)
    return (
        assigned.filter(F.col(vec_col).isNotNull())
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("dist"), round_to).alias("avg_dist"),
        )
    )
