"""Streaming DDSketch: exact batch parity, watermark semantics,
Python-free plan."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.streaming.dd_stream import (
    streaming_windowed_dd_by,
    windowed_dd_quantiles,
)

ALPHA = 0.01


def _rows():
    # three event-time hours, values spanning several buckets
    out = []
    for h in range(3):
        for i in range(400):
            out.append(
                Row(
                    ts=f"2024-05-01 {h:02d}:{i % 60:02d}:{(7 * i) % 60:02d}",
                    g=f"g{i % 2}",
                    v=float(1 + (i * 37) % 500) / (1 + h),
                )
            )
    return out


def _typed(spark, rows):
    return spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "g", "v"
    )


def _replay(
    spark, tmp_path, df, sentinel_df, files=3,
    schema="ts timestamp, g string, v double",
):
    """Write df as several files + the sentinel LAST (explicitly
    sequenced — parallel writes can commit the sentinel first and
    watermark-drop everything), return the file-stream DataFrame."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    parts = [
        df.filter(
            F.crc32(F.concat(F.col("g"), F.col("ts").cast("string"))) % files
            == i
        )
        for i in range(files)
    ] + [sentinel_df]
    for i, part in enumerate(parts):
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(f"{d}/*.parquet"):
            shutil.copy(f, os.path.join(src, f"{i:03d}.parquet"))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_streaming_bucket_table_matches_batch_exactly(spark, tmp_path):
    df = _typed(spark, _rows())
    sentinel = _typed(
        spark, [Row(ts="2100-01-01 00:00:00", g="g0", v=1.0)]
    )
    stream = _replay(spark, tmp_path, df, sentinel)
    # the crc32 file split disorders event time by up to the full 3-hour
    # span; parity replays need watermark delay > max disorder (else
    # Spark silently drops the stragglers — the known replay trap)
    out = streaming_windowed_dd_by(
        stream, "ts", ["g"], "v", alpha=ALPHA,
        window="1 hour", watermark="4 hours",
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
    got = spark.read.parquet(sink).filter(F.year("window_start") < 2100)
    # batch reference: the same operator applied to the bounded df
    # (identical plan, no watermark effect on complete data)
    ref = streaming_windowed_dd_by(
        df, "ts", ["g"], "v", alpha=ALPHA, window="1 hour"
    )
    assert got.subtract(ref).count() == 0
    assert ref.subtract(got).count() == 0
    # quantile evaluation over the sink: per (g, window) p50/p99 within
    # the relative bound of the exact per-window quantiles
    import math

    ests = {
        (r["g"], r["window_start"], r["q"]): r["est"]
        for r in windowed_dd_quantiles(got, [0.5, 0.99], ["g"], ALPHA).collect()
    }
    vals = {}
    for r in df.collect():
        key = (r["g"], r["ts"].replace(minute=0, second=0))
        vals.setdefault(key, []).append(r["v"])
    assert len(ests) == 2 * len(vals)
    for (g, ws), xs in vals.items():
        xs.sort()
        for q in (0.5, 0.99):
            exact = xs[int(math.floor(q * (len(xs) - 1)))]
            est = ests[(g, ws, q)]
            assert abs(est - exact) <= ALPHA * abs(exact) + 1e-12


def test_late_within_watermark_folds_in(spark, tmp_path):
    """A late row that arrives inside the watermark still lands in its
    window's final bucket table (counts add; emission waits on the
    watermark, not arrival order)."""
    on_time = _typed(
        spark,
        [Row(ts="2024-05-01 00:10:00", g="a", v=10.0),
         Row(ts="2024-05-01 00:20:00", g="a", v=20.0)],
    )
    # late row: event time inside hour 0, arriving in a later file
    # while the max seen event time (00:20) keeps the watermark
    # (2h delay) far before the window end
    late = _typed(spark, [Row(ts="2024-05-01 00:15:00", g="a", v=10.0)])
    sentinel = _typed(spark, [Row(ts="2100-01-01 00:00:00", g="a", v=1.0)])
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i, part in enumerate([on_time, late, sentinel]):
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(f"{d}/*.parquet"):
            shutil.copy(f, os.path.join(src, f"{i:03d}.parquet"))
    stream = (
        spark.readStream.schema("ts timestamp, g string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_windowed_dd_by(
        stream, "ts", ["g"], "v", alpha=ALPHA,
        window="1 hour", watermark="2 hours",
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
    got = spark.read.parquet(sink).filter(F.year("window_start") < 2100)
    # the v=10 bucket must count BOTH the on-time and the late row
    total = got.agg(F.sum("count")).collect()[0][0]
    assert total == 3


def test_streaming_plan_has_no_python(spark):
    df = _typed(spark, _rows())
    plan = (
        streaming_windowed_dd_by(df, "ts", ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "FlatMapGroupsInPandas",
        "MapInPandas",
        "FlatMapGroupsInPandasWithState",
    ):
        assert marker not in plan


def test_sliding_windows_cover_each_row_k_times(spark):
    """window=1h slide=30m: every row lands in exactly 2 windows, and
    each sliding window's bucket table equals the union of its two
    half-hour tumbling constituents (counts add — the mergeable-state
    property in window form)."""
    df = _typed(spark, _rows())
    n = df.count()
    slid = streaming_windowed_dd_by(
        df, "ts", ["g"], "v", alpha=ALPHA, window="1 hour", slide="30 minutes"
    )
    assert slid.agg(F.sum("count")).collect()[0][0] == 2 * n
    # exact check: for one specific sliding window, the bucket table
    # equals dd_by of exactly the rows in that span
    from hyper_spark.operators.ddsketch import dd_by

    some = slid.select("window_start", "window_end").distinct().orderBy(
        "window_start"
    ).collect()[2]
    span = df.filter(
        (F.col("ts") >= some["window_start"]) & (F.col("ts") < some["window_end"])
    )
    direct = dd_by(span, ["g"], "v", ALPHA)
    got = slid.filter(
        (F.col("window_start") == some["window_start"])
    ).select("g", "store", "bucket", "count")
    assert got.subtract(direct).count() == 0
    assert direct.subtract(got).count() == 0


def test_streaming_weighted_matches_batch_weighted(spark, tmp_path):
    """weight= in the streaming build: sink bucket MASSES equal the
    batch weighted dd_by of the same rows per window, and the weighted
    quantile read answers the exact weighted per-window quantile
    within alpha."""
    rows = []
    for h in range(2):
        for i in range(300):
            rows.append(
                Row(
                    ts=f"2024-05-01 {h:02d}:{i % 60:02d}:{(11 * i) % 60:02d}",
                    g=f"g{i % 2}",
                    v=float(1 + (i * 53) % 400),
                    w=float(1 + i % 9),
                )
            )
    df = spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "g", "v", "w"
    )
    sentinel = spark.createDataFrame(
        [Row(ts="2100-01-01 00:00:00", g="g0", v=1.0, w=1.0)]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "g", "v", "w")
    stream = _replay(
        spark, tmp_path, df, sentinel,
        schema="ts timestamp, g string, v double, w double",
    )
    out = streaming_windowed_dd_by(
        stream, "ts", ["g"], "v", alpha=ALPHA,
        window="1 hour", watermark="4 hours", weight="w",
    )
    sink = str(tmp_path / "wsink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink).filter(F.year("window_start") < 2100)
    ref = streaming_windowed_dd_by(
        df, "ts", ["g"], "v", alpha=ALPHA, window="1 hour", weight="w"
    )
    assert got.subtract(ref).count() == 0
    assert ref.subtract(got).count() == 0

    ests = {
        (r["g"], r["window_start"], r["q"]): r["est"]
        for r in windowed_dd_quantiles(
            got, [0.5], ["g"], ALPHA, weighted=True
        ).collect()
    }
    groups = {}
    for r in df.collect():
        key = (r["g"], r["ts"].replace(minute=0, second=0))
        groups.setdefault(key, []).append((r["v"], r["w"]))
    assert len(ests) == len(groups)
    for (g, ws), vw in groups.items():
        vw.sort()
        total = sum(w for _, w in vw)
        cum = 0.0
        for v, w in vw:
            cum += w
            if cum >= 0.5 * total:
                exact = v
                break
        est = ests[(g, ws, 0.5)]
        assert abs(est - exact) <= ALPHA * abs(exact) + 1e-12
