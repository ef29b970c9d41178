"""Sketch-column serde + precision ops — API parity with the reference's
serialization surface (``src/hyper.erl:151-173``) at DataFrame level.

The JSON envelope is ``{"p": P, "registers": base64(gzip(bytes))}``
exactly as the reference writes it, always over the canonical *dense*
register bytes — the reference's sparse/6-bit backends also "serialize in
exactly the same way" (README.md:60-62). Decoded register *bytes* are the
cross-runtime equality surface (gzip output may differ across zlib
builds — SURVEY §1.4 / hard-parts #5).

Physical storage codecs for persisted sketch tables:

* ``hll_encode_col(..., "auto"|"sparse"|"dense")`` — re-encode the blob
  column; sparse is hyper_bisect's ⟨idx:16, rho:8⟩ pairs
  (src/hyper_bisect.erl:18-29), length-disambiguated from dense so both
  share one column and every consumer decodes either.
* ``hll_pack6_col`` / ``hll_unpack6_col`` — hyper_binary's 6-bit dense
  packing (VALUE_SIZE=6, src/hyper_binary.erl:25,176-189), 25% smaller
  than dense; NOT length-disambiguable from sparse, so it is an explicit
  opt-in format for whole tables, never mixed into the shared column.
"""

from __future__ import annotations

import base64
import gzip
import json
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType, StringType

from hyper_spark.kernel.hll import (
    decode_register_blob,
    encode_registers,
    pack6,
    unpack6,
)

__all__ = [
    "hll_to_json_col",
    "hll_from_json_cols",
    "hll_reduce_precision",
    "hll_precision_col",
    "hll_bytes_col",
    "hll_encode_col",
    "hll_pack6_col",
    "hll_unpack6_col",
]


@F.pandas_udf(StringType())
def _to_json(p: pd.Series, registers: pd.Series) -> pd.Series:
    out = []
    for p_i, blob in zip(p, registers):
        dense = decode_register_blob(int(p_i), blob).tobytes()
        payload = base64.b64encode(gzip.compress(dense, mtime=0)).decode()
        out.append(json.dumps({"p": int(p_i), "registers": payload}))
    return pd.Series(out)


@F.pandas_udf(IntegerType())
def _json_p(doc: pd.Series) -> pd.Series:
    return pd.Series([int(json.loads(d)["p"]) for d in doc])


@F.pandas_udf(BinaryType())
def _json_registers(doc: pd.Series) -> pd.Series:
    out = []
    for d in doc:
        obj = json.loads(d)
        raw = zlib.decompress(base64.b64decode(obj["registers"]), wbits=47)
        m = 1 << int(obj["p"])
        if len(raw) == m + 1 and raw[-1] == 0:
            raw = raw[:-1]  # trailing pad tolerance (hyper_binary.erl:182-189)
        out.append(raw)
    return pd.Series(out)


def hll_to_json_col(p: Column | str, registers: Column | str) -> Column:
    """Sketch → reference-compatible JSON envelope string (sparse blobs
    densify first; the envelope is always canonical dense bytes)."""
    return _to_json(p, registers)


def hll_from_json_cols(doc: Column | str) -> tuple[Column, Column]:
    """JSON envelope string → (p, registers) columns."""
    return _json_p(doc), _json_registers(doc)


def _encode_udf(mode: str):
    @F.pandas_udf(BinaryType())
    def enc(p: pd.Series, registers: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_registers(decode_register_blob(int(p_i), blob), mode)
                for p_i, blob in zip(p, registers)
            ]
        )

    return enc


def hll_encode_col(
    p: Column | str, registers: Column | str, mode: str = "auto"
) -> Column:
    """Re-encode a sketch blob column dense/sparse (``auto`` = sparse
    below the 2^p/3 fill threshold, src/hyper_bisect.erl:25-29). Use
    before persisting high-cardinality-key sketch tables: low-fill groups
    shrink from 2^p bytes to 3·nnz."""
    if mode not in ("auto", "sparse", "dense"):
        raise ValueError(f"unknown encoding mode {mode!r}")
    return _encode_udf(mode)(p, registers)


@F.pandas_udf(BinaryType())
def _pack6_udf(p: pd.Series, registers: pd.Series) -> pd.Series:
    return pd.Series(
        [pack6(decode_register_blob(int(p_i), b)) for p_i, b in zip(p, registers)]
    )


@F.pandas_udf(BinaryType())
def _unpack6_udf(p: pd.Series, packed: pd.Series) -> pd.Series:
    return pd.Series(
        [unpack6(int(p_i), b).tobytes() for p_i, b in zip(p, packed)]
    )


def hll_pack6_col(p: Column | str, registers: Column | str) -> Column:
    """Dense/sparse blob → 6-bit packed dense blob (3·2^p/4 bytes)."""
    return _pack6_udf(p, registers)


def hll_unpack6_col(p: Column | str, packed: Column | str) -> Column:
    """6-bit packed blob → canonical dense blob (6→8 widening,
    src/hyper_binary.erl:176-180)."""
    return _unpack6_udf(p, packed)


@F.pandas_udf(BinaryType())
def _fold_registers(p: pd.Series, registers: pd.Series, new_p: pd.Series) -> pd.Series:
    out = []
    for p_i, blob, np_i in zip(p, registers, new_p):
        p_i, np_i = int(p_i), int(np_i)
        if np_i > p_i:
            # mirror HllSketch.reduce_precision's explicit guard instead
            # of an opaque executor-side reshape error
            raise ValueError(
                f"can only reduce precision: sketch p={p_i} < new_p={np_i}"
            )
        regs = decode_register_blob(p_i, blob)
        folded = regs.reshape(-1, 1 << np_i).max(axis=0)
        out.append(folded.tobytes())
    return pd.Series(out)


def hll_precision_col() -> Column:
    """Accessor parity (src/hyper.erl:132-133)."""
    return F.col("p")


def hll_bytes_col() -> Column:
    """Physical size of the stored sketch blob (src/hyper.erl:135-136) —
    dense 2^p, sparse 3·nnz, packed6 3·2^p/4."""
    return F.length(F.col("registers"))


def hll_reduce_precision(sketch_df: DataFrame, new_p: int) -> DataFrame:
    """Fold every sketch to a smaller precision (index mod 2^new_p, max —
    src/hyper_binary.erl:140-155). Sketches already at new_p pass through;
    smaller p raises the kernel's 'can only reduce precision' error."""
    return sketch_df.withColumn(
        "registers",
        F.when(F.col("p") == new_p, F.col("registers")).otherwise(
            _fold_registers(F.col("p"), F.col("registers"), F.lit(new_p))
        ),
    ).withColumn("p", F.lit(new_p).cast("int"))
