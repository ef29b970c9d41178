"""Streaming SLO burn-rate: exact batch parity of the bucket counters
and of the dual-window alert read over the sink."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.anomaly import burn_rate_alerts, burn_rate_read
from hyper_spark.streaming.burn_stream import streaming_bucket_counts


def _rows():
    # 8 event-time hours; hours 3-4 are an incident (80% bad)
    out = []
    for h in range(8):
        bad_n = 8 if h in (3, 4) else 1
        for i in range(10):
            out.append(
                Row(
                    ts=f"2024-06-01 {h:02d}:{i:02d}:00",
                    is_bad=i < bad_n,
                )
            )
    return out


def _typed(spark, rows):
    return spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "is_bad"
    )


def _replay(spark, tmp_path, df, sentinel_df, files=3):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    parts = [
        df.filter(F.crc32(F.col("ts").cast("string")) % files == i)
        for i in range(files)
    ] + [sentinel_df]
    for i, part in enumerate(parts):
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(f"{d}/*.parquet"):
            shutil.copy(f, os.path.join(src, f"{i:03d}.parquet"))
    return (
        spark.readStream.schema("ts timestamp, is_bad boolean")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_streaming_burn_counters_and_read_match_batch(spark, tmp_path):
    df = _typed(spark, _rows())
    sentinel = _typed(spark, [Row(ts="2100-01-01 00:00:00", is_bad=False)])
    stream = _replay(spark, tmp_path, df, sentinel)
    out = streaming_bucket_counts(
        stream, "is_bad", ts_col="ts", bucket="hour",
        # the crc32 split disorders event time across the full span;
        # watermark must exceed max disorder or stragglers drop
        watermark="12 hours",
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
    assert q.awaitTermination(180), "streaming query timed out"
    got = spark.read.parquet(sink).filter(F.year("bucket") < 2100)
    # counters: the same operator applied to the bounded frame
    ref = streaming_bucket_counts(df, "is_bad", ts_col="ts", bucket="hour")
    assert got.subtract(ref).count() == 0
    assert ref.subtract(got).count() == 0
    # alert read over the sink == end-to-end batch operator
    read = burn_rate_read(
        got, bucket="hour", objective=0.75, short_buckets=2, long_buckets=6
    )
    batch = burn_rate_alerts(
        df, F.col("is_bad"), time_col="ts", bucket="hour",
        objective=0.75, short_buckets=2, long_buckets=6,
    )
    assert read.subtract(batch).count() == 0
    assert batch.subtract(read).count() == 0
    # the incident actually alerts in the parity result
    alerts = [r["bucket"].hour for r in read.collect() if r["is_alert"]]
    assert 4 in alerts


def test_streaming_bucket_counts_validation(spark):
    import pytest

    df = _typed(spark, _rows())
    with pytest.raises(ValueError):
        streaming_bucket_counts(df, "is_bad", bucket="fortnight")


def test_streaming_bucket_alignment_guard(spark):
    """F.window tumbles UTC-epoch-aligned while the batch bucketizer
    truncates in the session timezone: day buckets outside UTC (and
    hour buckets in fractional-offset zones) are rejected so merged
    counter stores can't mix conventions."""
    import pytest

    df = _typed(spark, _rows())
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError):
            streaming_bucket_counts(df, "is_bad", bucket="day")
        # whole-hour-offset zone: hour buckets still align
        assert streaming_bucket_counts(df, "is_bad", bucket="hour").count() > 0
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        with pytest.raises(ValueError):
            streaming_bucket_counts(df, "is_bad", bucket="hour")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert streaming_bucket_counts(df, "is_bad", bucket="day").count() > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
