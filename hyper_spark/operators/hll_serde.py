"""Sketch-column serde + precision ops — API parity with the reference's
serialization surface (``src/hyper.erl:151-173``) at DataFrame level.

The JSON envelope is ``{"p": P, "registers": base64(gzip(bytes))}``
exactly as the reference writes it; decoded register *bytes* are the
cross-runtime equality surface (gzip output may differ across zlib
builds — SURVEY §1.4 / hard-parts #5)."""

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

from hyper_spark.kernel.hll import HllSketch

__all__ = [
    "hll_to_json_col",
    "hll_from_json_cols",
    "hll_reduce_precision",
    "hll_precision_col",
    "hll_bytes_col",
]


@F.pandas_udf(StringType())
def _to_json(p: pd.Series, registers: pd.Series) -> pd.Series:
    out = []
    for p_i, blob in zip(p, registers):
        payload = base64.b64encode(gzip.compress(bytes(blob), mtime=0)).decode()
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
    """Sketch → reference-compatible JSON envelope string."""
    return _to_json(p, registers)


def hll_from_json_cols(doc: Column | str) -> tuple[Column, Column]:
    """JSON envelope string → (p, registers) columns."""
    return _json_p(doc), _json_registers(doc)


@F.pandas_udf(BinaryType())
def _fold_registers(registers: pd.Series, new_p: pd.Series) -> pd.Series:
    out = []
    for blob, np_i in zip(registers, new_p):
        regs = np.frombuffer(bytes(blob), dtype=np.uint8)
        folded = regs.reshape(-1, 1 << int(np_i)).max(axis=0)
        out.append(folded.tobytes())
    return pd.Series(out)


def hll_reduce_precision(sketch_df: DataFrame, new_p: int) -> DataFrame:
    """Fold every sketch to a smaller precision (index mod 2^new_p, max —
    src/hyper_binary.erl:140-155). Sketches already at new_p pass through;
    smaller p is an error (checked kernel-side semantics)."""
    return sketch_df.withColumn(
        "registers",
        F.when(F.col("p") == new_p, F.col("registers")).otherwise(
            _fold_registers(F.col("registers"), F.lit(new_p))
        ),
    ).withColumn("p", F.lit(new_p).cast("int"))


def hll_precision_col() -> Column:
    """Accessor parity (src/hyper.erl:132-133)."""
    return F.col("p")


def hll_bytes_col() -> Column:
    """In-memory size of the dense sketch (src/hyper.erl:135-136)."""
    return F.length(F.col("registers"))
