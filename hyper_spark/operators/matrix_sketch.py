"""Distributed Frequent-Directions matrix sketching over embedding columns.

Shape matches the package's other sketches (quantiles.py, hll_agg.py):
per-partition FD build inside ``mapInPandas`` (the map-side combine —
Arrow batches of the embedding column stacked into one numpy matmul-
friendly matrix), then ``groupBy(keys)`` merge of serialized sketches.
The shuffle carries partitions x groups blobs of at most
``(ell-1) * dim`` float64s plus four stats — never raw vectors — so a
100-TB embedding table ships kilobytes per group to the reducer, the
same treeAggregate shape the north rule requires of every sketch here.

What it buys at scale: one pass over the corpus yields a certified
low-rank summary of the (uncentered) second-moment matrix A'A —
principal directions for semantic-dedup pruning, whitening/projection
matrices for ANN, and per-group covariance drift — without ever
materializing the dim x dim Gram matrix per executor or collecting
vectors to the driver.  The per-dimension error certificate
(0 <= exact_diag - sketch_diag <= delta_total, delta_total <=
|A|_F^2/ell) is checked end-to-end by the ``fd_covariance_bound`` gate.

No reference counterpart (GameAnalytics/hyper is scalar-cardinality
only); the FD algebra mirrors hyper's union contract (src/hyper.erl:
union/2 — commutative, associative up to certificate) applied to
matrices, per Liberty KDD'13 / Ghashami et al. SICOMP'16.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from hyper_spark.kernel.fd import FrequentDirections

__all__ = [
    "fd_sketch_by",
    "fd_merge",
    "fd_components",
    "fd_project",
    "fd_covariance_diag",
]

_GROUP_COL = "__fd_group"

FD_STATE_FIELDS = [
    StructField("ell", IntegerType(), False),
    StructField("dim", IntegerType(), False),
    StructField("n", LongType(), False),
    StructField("fnorm2", DoubleType(), False),
    StructField("delta", DoubleType(), False),
    StructField("state", BinaryType(), False),
]


def _stack(series: pd.Series, dim: int) -> np.ndarray:
    """Arrow list column -> (m, dim) float64 matrix, one vstack."""
    vals = [v for v in series if v is not None and len(v) == dim]
    if not vals:
        return np.zeros((0, dim), dtype=np.float64)
    return np.asarray(np.vstack(vals), dtype=np.float64)


def _build_fn(ell: int, dim: int, keys: Sequence[str], col: str):
    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, FrequentDirections] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if keys:
                for gkey, sub in pdf.groupby(list(keys), sort=False, dropna=False):
                    gkey = gkey if isinstance(gkey, tuple) else (gkey,)
                    sk = acc.get(gkey)
                    if sk is None:
                        sk = acc.setdefault(gkey, FrequentDirections(ell, dim))
                    sk.update_batch(_stack(sub[col], dim))
            else:
                sk = acc.get(())
                if sk is None:
                    sk = acc.setdefault((), FrequentDirections(ell, dim))
                sk.update_batch(_stack(pdf[col], dim))
        if acc:
            rows = {k: [g[i] for g in acc] for i, k in enumerate(keys)}
            # serialize FIRST: to_bytes runs the final shrink, which can
            # grow delta — the stats columns must mirror the state bytes
            blobs = [sk.to_bytes() for sk in acc.values()]
            rows["ell"] = [ell] * len(acc)
            rows["dim"] = [dim] * len(acc)
            rows["n"] = [sk.n for sk in acc.values()]
            rows["fnorm2"] = [sk.fnorm2 for sk in acc.values()]
            rows["delta"] = [sk.delta for sk in acc.values()]
            rows["state"] = blobs
            yield pd.DataFrame(rows)

    return build


def _build_arrow_fn(ell: int, dim: int):
    """Ungrouped build over raw Arrow record batches (``mapInArrow``):
    the list<float> column's values buffer is reshaped zero-copy into
    the (m, dim) matrix — no per-row numpy-object materialization.
    Measured ~4x the mapInPandas decode path at dim=64 (the pandas
    conversion allocates one ndarray per row before the kernel ever
    sees a batch)."""

    def build(batches):
        import pyarrow as pa

        sk = FrequentDirections(ell, dim)
        for rb in batches:
            arr = rb.column(0)
            if isinstance(arr, pa.ChunkedArray):
                chunks = arr.chunks
            else:
                chunks = [arr]
            for chunk in chunks:
                if len(chunk) == 0:
                    continue
                lengths = chunk.value_lengths().to_numpy(zero_copy_only=False)
                if chunk.null_count == 0 and (lengths == dim).all():
                    mat = (
                        chunk.flatten()
                        .to_numpy(zero_copy_only=False)
                        .reshape(-1, dim)
                    )
                    sk.update_batch(mat)
                else:
                    # rare path: NULLs or ragged rows in this chunk
                    sk.update_batch(_stack(chunk.to_pandas(), dim))
        blob = sk.to_bytes()  # final shrink first (can grow delta)
        yield pa.RecordBatch.from_pydict(
            {
                "ell": [sk.ell],
                "dim": [sk.dim],
                "n": [sk.n],
                "fnorm2": [sk.fnorm2],
                "delta": [sk.delta],
                "state": [blob],
            },
            schema=pa.schema(
                [
                    pa.field("ell", pa.int32(), nullable=False),
                    pa.field("dim", pa.int32(), nullable=False),
                    pa.field("n", pa.int64(), nullable=False),
                    pa.field("fnorm2", pa.float64(), nullable=False),
                    pa.field("delta", pa.float64(), nullable=False),
                    pa.field("state", pa.binary(), nullable=False),
                ]
            ),
        )

    return build


def _merge_fn(keys: Sequence[str]):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        sketches = [FrequentDirections.from_bytes(bytes(b)) for b in pdf["state"]]
        out_sk = sketches[0]
        for s in sketches[1:]:
            out_sk = out_sk.merge(s)
        blob = out_sk.to_bytes()  # first: the final shrink can grow delta
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["ell"] = [out_sk.ell]
        out["dim"] = [out_sk.dim]
        out["n"] = [out_sk.n]
        out["fnorm2"] = [out_sk.fnorm2]
        out["delta"] = [out_sk.delta]
        out["state"] = [blob]
        return pd.DataFrame(out)

    return merge


def fd_sketch_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    ell: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """One FD sketch per group: DataFrame[*keys, ell, dim, n, fnorm2,
    delta, state].  ``dim`` is inferred from the first row when omitted
    (one tiny driver action; pass it explicitly in pipelines).

    Rows with NULL embeddings or the wrong length are skipped (the
    library-wide NULL-skip contract, cf. hll_agg.sketch_by)."""
    keys = list(keys)
    col_name = col if isinstance(col, str) else "__vec"
    selected = df.select(
        *keys, (F.col(col) if isinstance(col, str) else col).alias(col_name)
    )
    if dim is None:
        first = selected.select(col_name).filter(F.col(col_name).isNotNull()).first()
        if first is None:
            raise ValueError("cannot infer dim from an all-NULL column")
        dim = len(first[0])
    schema = StructType([selected.schema[k] for k in keys] + FD_STATE_FIELDS)
    if keys:
        partials = selected.mapInPandas(
            _build_fn(ell, int(dim), keys, col_name), schema
        )
        return partials.groupBy(*keys).applyInPandas(_merge_fn(keys), schema)
    partials = selected.mapInArrow(
        _build_arrow_fn(ell, int(dim)), StructType(FD_STATE_FIELDS)
    )
    grouped = partials.withColumn(_GROUP_COL, F.lit(0))
    return grouped.groupBy(_GROUP_COL).applyInPandas(
        _merge_fn([]), StructType(FD_STATE_FIELDS)
    )


def fd_merge(sketch_df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Union FD sketches down to one row per ``keys`` (e.g. drop a
    grouping column from a finer sketch table): same merge the builder
    uses, so a rollup never rescans raw vectors."""
    keys = list(keys)
    if keys:
        out_schema = StructType(
            [sketch_df.schema[k] for k in keys] + FD_STATE_FIELDS
        )
        return sketch_df.groupBy(*keys).applyInPandas(_merge_fn(keys), out_schema)
    grouped = sketch_df.withColumn(_GROUP_COL, F.lit(0))
    return grouped.groupBy(_GROUP_COL).applyInPandas(
        _merge_fn([]), StructType(FD_STATE_FIELDS)
    )


def fd_components(state: bytes, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side: top-k principal directions (k x dim) + singular
    values from one serialized sketch row."""
    sk = FrequentDirections.from_bytes(bytes(state))
    return sk.components(k)


def fd_project(col: str | Column, components: np.ndarray) -> Column:
    """Project an embedding column onto FD principal directions: an
    array<double> column of length k.  The (k x dim) matrix is closed
    over by a vectorized pandas UDF (one matmul per Arrow batch); at
    k*dim ~ 10^3 floats the closure broadcast is negligible."""
    comp = np.ascontiguousarray(np.asarray(components, dtype=np.float64))
    k, dim = comp.shape

    @F.pandas_udf(ArrayType(DoubleType()))
    def proj(series: pd.Series) -> pd.Series:
        mat = _stack(series, dim)
        mask = series.map(lambda v: v is not None and len(v) == dim)
        out = np.full((len(series), k), np.nan)
        if mat.shape[0]:
            out[np.asarray(mask, dtype=bool)] = mat @ comp.T
        return pd.Series([None if not m else row.tolist()
                          for m, row in zip(mask, out)])

    return proj(F.col(col) if isinstance(col, str) else col)


def fd_covariance_diag(state: bytes) -> np.ndarray:
    """diag(B'B) from one serialized sketch (the gate's check surface:
    every entry must sit within [exact - delta_total, exact])."""
    sk = FrequentDirections.from_bytes(bytes(state))
    b = sk.sketch_rows()
    return np.einsum("ij,ij->j", b, b)
