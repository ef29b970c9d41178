"""Streaming sliding-HLL build: exact batch state parity, front
compaction equivalence, estimate bit-parity through the sink."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.sliding_hll import (
    sliding_estimates,
    sliding_merge,
    sliding_register_table,
)
from hyper_spark.streaming.sliding_hll_stream import (
    streaming_sliding_register_by,
)

P = 12
T_REF = "2024-04-06 00:00:00"


def _rows(n=2500):
    out = []
    for i in range(n):
        day = (i * 7919) % 5
        out.append(
            Row(
                ts=f"2024-04-{day + 1:02d} {(i * 13) % 24:02d}:{i % 60:02d}:00",
                user=f"u{(i * 31) % (200 + 80 * day)}",
            )
        )
    return out


def _typed(spark, rows):
    return spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "user"
    )


def _replay(spark, tmp_path, df, files=3):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    sentinel = _typed(spark, [Row(ts="2100-01-01 00:00:00", user="u0")])
    parts = [
        df.filter(
            F.crc32(F.concat("user", F.col("ts").cast("string"))) % files == i
        )
        for i in range(files)
    ] + [sentinel]
    for i, part in enumerate(parts):  # sentinel LAST, sequenced
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(f"{d}/*.parquet"):
            shutil.copy(f, os.path.join(src, f"{i:03d}.parquet"))
    return (
        spark.readStream.schema("ts timestamp, user string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_streamed_state_queries_and_compacts_like_batch(spark, tmp_path):
    df = _typed(spark, _rows())
    stream = _replay(spark, tmp_path, df)
    out = streaming_sliding_register_by(
        stream, "ts", [], "user", p=P, grain="1 day", watermark="10 days"
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
    # the streamed bucket rows equal the batch bucketization exactly:
    # compacting them to the front reproduces the batch state verbatim
    batch_state = sliding_register_table(
        df, "ts", [], "user", p=P, grain="1 day"
    )
    compacted = sliding_merge([got], [])
    b = {(r["idx"], str(r["bucket_ts"])): r["rho"]
         for r in batch_state.collect()}
    c = {(r["idx"], str(r["bucket_ts"])): r["rho"]
         for r in compacted.collect()}
    assert b == c
    # and the UNfronted sink is directly queryable with bit-identical
    # estimates (the front is a compaction, not a correctness need)
    wins = {"2d": "2 days", "5d": "5 days"}
    from_sink = sorted(
        map(tuple, sliding_estimates(got, [], T_REF, wins, P).collect())
    )
    from_batch = sorted(
        map(tuple, sliding_estimates(batch_state, [], T_REF, wins, P).collect())
    )
    assert from_sink == from_batch


def test_batch_mode_plan_python_free(spark):
    df = _typed(spark, _rows(400))
    plan = (
        streaming_sliding_register_by(df, "ts", [], "user", p=P, grain="1 day")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
