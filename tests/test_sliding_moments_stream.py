"""Streaming sliding-moments: batch-state parity through a
file-replayed stream, query parity via the batch sliding paths."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.sliding_moments import (
    sliding_moments_stats,
    sliding_moments_table,
)
from hyper_spark.streaming.sliding_moments_stream import (
    streaming_sliding_moments,
)

T_REF = "2024-04-06 00:00:00"
WINDOWS = {"2d": "2 days", "5d": "5 days"}


def _rows(n=2500, seed=7):
    rng = np.random.default_rng(seed)
    vals = np.exp(rng.normal(2.0, 1.0, n))
    out = []
    for i, v in enumerate(vals):
        day = (i * 7919) % 5
        out.append(
            Row(
                ts=f"2024-04-{day + 1:02d} {(i * 13) % 24:02d}:{i % 60:02d}:00",
                v=float(v),
            )
        )
    return out


def _typed(spark, rows):
    return spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "v"
    )


def _replay(spark, tmp_path, df, files=3):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    sentinel = _typed(spark, [Row(ts="2100-01-01 00:00:00", v=1.0)])
    parts = [
        df.filter(
            F.crc32(F.concat(F.col("v").cast("string"),
                             F.col("ts").cast("string"))) % files == i
        )
        for i in range(files)
    ] + [sentinel]
    for i, part in enumerate(parts):  # sentinel LAST, sequenced
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(f"{d}/*.parquet"):
            shutil.copy(f, os.path.join(src, f"{i:03d}.parquet"))
    return (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_streamed_state_matches_batch_and_queries_identically(spark, tmp_path):
    df = _typed(spark, _rows())
    stream = _replay(spark, tmp_path, df)
    out = streaming_sliding_moments(
        stream, "ts", [], "v", k=6, grain="1 day", watermark="10 days"
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink).filter(F.year("bucket_ts") < 2100)
    batch = sliding_moments_table(df, "ts", [], "v", k=6, grain="1 day")
    b = {r["bucket_ts"]: r for r in batch.collect()}
    g = {r["bucket_ts"]: r for r in got.collect()}
    assert set(b) == set(g)
    for ts, br in b.items():
        gr = g[ts]
        # counts and min/max bit-exact; float sums to fp-associativity
        assert gr["n"] == br["n"] and gr["mn"] == br["mn"] and gr["mx"] == br["mx"]
        assert gr["n_pos"] == br["n_pos"]
        for i in range(1, 7):
            assert gr[f"m{i}"] == pytest.approx(br[f"m{i}"], rel=1e-12)
            assert gr[f"lm{i}"] == pytest.approx(br[f"lm{i}"], rel=1e-12)
    # the sink is directly queryable by the batch query path
    from_sink = {
        (r["window"],): (r["n"], r["mean"])
        for r in sliding_moments_stats(got, [], T_REF, WINDOWS).collect()
    }
    from_batch = {
        (r["window"],): (r["n"], r["mean"])
        for r in sliding_moments_stats(batch, [], T_REF, WINDOWS).collect()
    }
    assert set(from_sink) == set(from_batch)
    for k_, (n, mean) in from_batch.items():
        assert from_sink[k_][0] == n
        assert from_sink[k_][1] == pytest.approx(mean, rel=1e-12)


def test_batch_mode_plan_python_free_and_guards(spark):
    df = _typed(spark, _rows(400))
    with pytest.raises(ValueError, match="k must be"):
        streaming_sliding_moments(df, "ts", [], "v", k=1)
    plan = (
        streaming_sliding_moments(df, "ts", [], "v", k=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
