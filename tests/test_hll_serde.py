"""DataFrame-level sketch serde + precision ops (reference parity:
src/hyper.erl:141-173)."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.kernel.hll import HllSketch
from hyper_spark.operators.hll_agg import sketch_by, sketch_collect
from hyper_spark.operators.hll_serde import (
    hll_bytes_col,
    hll_from_json_cols,
    hll_reduce_precision,
    hll_to_json_col,
)


def test_json_roundtrip_matches_kernel(spark):
    values = [f"v{i}" for i in range(800)]
    df = spark.createDataFrame([Row(v=v) for v in values])
    sk_df = sketch_by(df, [], "v", 12)
    doc = sk_df.select(hll_to_json_col("p", "registers").alias("doc"))
    row = doc.collect()[0]
    kern = HllSketch(12).insert_many(v.encode() for v in values)
    # envelope decodes to the exact kernel sketch
    assert HllSketch.from_json(row["doc"]) == kern
    assert json.loads(row["doc"])["p"] == 12

    p_col, reg_col = hll_from_json_cols("doc")
    back = doc.select(p_col.alias("p"), reg_col.alias("registers"))
    assert sketch_collect(back) == kern


def test_reduce_precision_df(spark):
    values = [f"v{i}" for i in range(2000)]
    df = spark.createDataFrame([Row(v=v) for v in values])
    sk_df = sketch_by(df, [], "v", 14)
    folded = hll_reduce_precision(sk_df, 11)
    got = sketch_collect(folded)
    kern = HllSketch(14).insert_many(v.encode() for v in values).reduce_precision(11)
    assert got == kern
    # pass-through at equal precision
    same = sketch_collect(hll_reduce_precision(sk_df, 14))
    assert same.p == 14


def test_bytes_col(spark):
    df = spark.createDataFrame([Row(v="a")])
    sk_df = sketch_by(df, [], "v", 10)
    assert sk_df.select(hll_bytes_col().alias("b")).collect()[0]["b"] == 1 << 10
