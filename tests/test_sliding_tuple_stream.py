"""Streaming sliding-tuple build (streaming/sliding_tuple_stream.py):
admission rows + summary deltas → merge == batch state (hash-set row
parity, summaries to fp tolerance; bit-exact on integer values),
estimates parity through the sink."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.sliding_tuple import (
    sliding_tuple_estimates,
    sliding_tuple_merge,
    sliding_tuple_table,
)
from hyper_spark.streaming.sliding_tuple_stream import (
    streaming_sliding_tuple_entries,
)

T_REF = "2024-04-06 00:00:00"


def _rows(n=2500):
    out = []
    for i in range(n):
        day = (i * 7919) % 5
        out.append(
            Row(
                ts=f"2024-04-{day + 1:02d} {(i * 13) % 24:02d}:{i % 60:02d}:00",
                user=f"u{(i * 31) % (200 + 80 * day)}",
                # integer-valued doubles -> summary sums bit-exact at
                # any addition order; every third row NULL (counts 0)
                v=float((i * 17) % 23) if i % 3 else None,
            )
        )
    return out


def _typed(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, user string, v double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user", "v")


def _replay(spark, tmp_path, df, files=3):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    sentinel = _typed(
        spark, [Row(ts="2100-01-01 00:00:00", user="u0", v=0.0)]
    )
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
        spark.readStream.schema("ts timestamp, user string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _run(spark, tmp_path, k, watermark="10 days"):
    df = _typed(spark, _rows())
    stream = _replay(spark, tmp_path, df)
    out = streaming_sliding_tuple_entries(
        stream, "ts", [], "user", "v", k=k, grain="1 day",
        watermark=watermark,
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
    return df, got


def test_streamed_deltas_merge_to_batch_state_saturated(spark, tmp_path):
    """k=64 (saturated buckets): evicted hashes' partial deltas are
    dropped by the merge re-trim; the compacted state equals the batch
    build row-for-row (integer-valued summaries -> bit-exact), and the
    tuple estimates match through the sink."""
    k = 64
    df, got = _run(spark, tmp_path, k)
    batch = sliding_tuple_table(df, "ts", [], "user", "v", k=k, grain="1 day")
    merged = sliding_tuple_merge([got], [])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )
    wins = {"2d": "2 days", "5d": "5 days"}
    a = sliding_tuple_estimates(merged, [], T_REF, wins)
    b = sliding_tuple_estimates(batch, [], T_REF, wins)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_streamed_exact_regime_and_null_values_count_zero(spark, tmp_path):
    """k=4096 (exact regime, nothing evicted): merged state == batch
    state, estimates exact, and all-NULL keys still appear as entries
    with summary 0 (the admission-with-zero-delta emission)."""
    df, got = _run(spark, tmp_path, 4096)
    batch = sliding_tuple_table(
        df, "ts", [], "user", "v", k=4096, grain="1 day"
    )
    merged = sliding_tuple_merge([got], [])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )
    est = sliding_tuple_estimates(merged, [], T_REF, {"5d": "5 days"}).collect()
    exact_n = df.select(F.countDistinct("user").alias("n")).collect()[0]["n"]
    exact_sum = df.select(F.coalesce(F.sum("v"), F.lit(0.0)).alias("s")).collect()[
        0
    ]["s"]
    assert est[0]["exact"]
    assert est[0]["distinct_est"] == float(exact_n)
    assert est[0]["sum_est"] == pytest.approx(exact_sum, abs=1e-9)


def test_grouped_keys_and_guard(spark, tmp_path):
    """Grouped build: per-key states are independent; k guard fires."""
    df = _typed(spark, _rows(800)).withColumn(
        "grp", F.when(F.length("user") % 2 == 0, "a").otherwise("b")
    )
    stream = _replay(spark, tmp_path, _typed(spark, _rows(800))).withColumn(
        "grp", F.when(F.length("user") % 2 == 0, "a").otherwise("b")
    )
    out = streaming_sliding_tuple_entries(
        stream, "ts", ["grp"], "user", "v", k=32, grain="1 day",
        watermark="10 days",
    )
    sink = str(tmp_path / "gsink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "gckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink).filter(F.year("bucket_ts") < 2100)
    merged = sliding_tuple_merge([got], ["grp"])
    batch = sliding_tuple_table(
        df, "ts", ["grp"], "user", "v", k=32, grain="1 day"
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )
    with pytest.raises(ValueError, match="k must be"):
        streaming_sliding_tuple_entries(df, "ts", [], "user", "v", k=2)
