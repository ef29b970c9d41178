"""Streaming sliding-theta build (streaming/sliding_theta_stream.py):
admission-delta emission → merge == batch state row parity, estimate
and overlap bit-parity through the sink."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.sliding_theta import (
    sliding_theta_estimates,
    sliding_theta_merge,
    sliding_theta_overlap,
    sliding_theta_table,
)
from hyper_spark.streaming.sliding_theta_stream import (
    streaming_sliding_theta_entries,
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


def _run(spark, tmp_path, k, watermark="10 days"):
    df = _typed(spark, _rows())
    stream = _replay(spark, tmp_path, df)
    out = streaming_sliding_theta_entries(
        stream, "ts", [], "user", k=k, grain="1 day", watermark=watermark
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
    """k=64 (saturated buckets): admitted-then-evicted extras in the
    sink are dropped by the merge re-trim; the compacted state equals
    the batch build row-for-row, and estimates/overlap bit-match."""
    k = 64
    df, got = _run(spark, tmp_path, k)
    batch = sliding_theta_table(df, "ts", [], "user", k=k, grain="1 day")
    merged = sliding_theta_merge([got], [])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )
    wins = {"2d": "2 days", "5d": "5 days"}
    a = sliding_theta_estimates(merged, [], T_REF, wins)
    b = sliding_theta_estimates(batch, [], T_REF, wins)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    ra = ("2024-04-01 00:00:00", "2024-04-03 00:00:00")
    rb = ("2024-04-03 00:00:00", "2024-04-06 00:00:00")
    oa = sliding_theta_overlap(merged, [], ra, rb)
    ob = sliding_theta_overlap(batch, [], ra, rb)
    assert sorted(map(tuple, oa.collect())) == sorted(map(tuple, ob.collect()))


def test_streamed_exact_regime_and_sink_is_small(spark, tmp_path):
    """k=4096 (exact regime): every bucket below k, so the sink IS the
    state (no evictions — sink rows == distinct (bucket, h) pairs) and
    estimates are exact."""
    df, got = _run(spark, tmp_path, 4096)
    batch = sliding_theta_table(df, "ts", [], "user", k=4096, grain="1 day")
    assert got.count() == batch.count()
    merged = sliding_theta_merge([got], [])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )
    est = sliding_theta_estimates(merged, [], T_REF, {"5d": "5 days"}).collect()
    exact = df.select(F.countDistinct("user").alias("n")).collect()[0]["n"]
    assert est[0]["exact"] and est[0]["estimate"] == float(exact)
