"""Streaming count-sketch cell build (streaming/cs_stream.py):
file-replayed stream -> sink cells -> cs_from_cells equals the batch
cs_by bit-exactly (signed sums are order-insensitive), change
detection reads from the sink, turnstile weights survive the stream."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.countsketch import (
    cs_by,
    cs_diff,
    cs_from_cells,
    heavy_changers,
)
from hyper_spark.streaming.cs_stream import streaming_cs_cells


def _rows(n=2400):
    out = []
    for i in range(n):
        day = (i * 7919) % 4
        out.append(
            Row(
                ts=f"2024-03-{day + 1:02d} {(i * 13) % 24:02d}:{i % 60:02d}:00",
                item=f"item{(i * 31) % (40 + 25 * day)}" if i % 11 else None,
                w=1 + (i % 3),
            )
        )
    return out


def _typed(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, item string, w long"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "item", "w")


def _replay(spark, tmp_path, df, files=3):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    # sentinel LAST: advances the watermark past every real window so
    # append mode flushes them (its own 2100 bucket is filtered on read)
    sentinel = _typed(
        spark, [Row(ts="2100-01-01 00:00:00", item="sentinel", w=1)]
    )
    parts = [
        df.filter(F.crc32(F.coalesce("item", F.lit("-"))) % files == i)
        for i in range(files)
    ] + [sentinel]
    for i, part in enumerate(parts):
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(f"{d}/*.parquet"):
            shutil.copy(f, os.path.join(src, f"{i:03d}.parquet"))
    return (
        spark.readStream.schema("ts timestamp, item string, w long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _state(df):
    r = df.collect()
    assert len(r) == 1
    return r[0]


def _run_stream(spark, tmp_path, name, **kw):
    stream = _replay(spark, tmp_path, _typed(spark, _rows()))
    cells = streaming_cs_cells(stream, "ts", [], "item", **kw)
    sink = str(tmp_path / f"{name}_sink")
    q = (
        cells.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(sink).filter(F.year("bucket_ts") < 2100)


def test_streamed_cells_densify_to_batch_state_bit_exact(spark, tmp_path):
    df = _typed(spark, _rows())
    got = _run_stream(
        spark, tmp_path, "a", grain="1 day", depth=5, width=128,
        watermark="10 days",
    )
    merged = _state(cs_from_cells(got, [], 5, 128))
    batch = _state(cs_by(df, [], "item", depth=5, width=128))
    assert bytes(merged["counters"]) == bytes(batch["counters"])
    assert merged["n"] == batch["n"]


def test_change_detection_reads_from_sink(spark, tmp_path):
    """Period states built from the SINK (range filter + densify) feed
    cs_diff/heavy_changers identically to batch builds over the raw
    halves — live windowed deltoids end to end."""
    df = _typed(spark, _rows())
    got = _run_stream(
        spark, tmp_path, "b", grain="1 day", depth=5, width=256,
        watermark="10 days",
    )
    split = F.lit("2024-03-03").cast("date")
    sa = cs_from_cells(got.filter(F.to_date("bucket_ts") < split), [], 5, 256)
    sb = cs_from_cells(got.filter(F.to_date("bucket_ts") >= split), [], 5, 256)
    ba = cs_by(df.filter(F.to_date("ts") < split), [], "item", depth=5, width=256)
    bb = cs_by(df.filter(F.to_date("ts") >= split), [], "item", depth=5, width=256)
    d_stream = _state(cs_diff(sa, sb))
    d_batch = _state(cs_diff(ba, bb))
    assert bytes(d_stream["counters"]) == bytes(d_batch["counters"])
    assert d_stream["n"] == d_batch["n"]
    cands = spark.createDataFrame([Row(item=f"item{i}") for i in range(60)])
    top_s = heavy_changers(sa, sb, cands, "item", k=5).collect()
    top_b = heavy_changers(ba, bb, cands, "item", k=5).collect()
    assert [tuple(r) for r in top_s] == [tuple(r) for r in top_b]


def test_turnstile_weights_through_stream(spark, tmp_path):
    """weight='w' streams signed multiplicity; the densified state
    equals the batch weighted build bit-exactly."""
    df = _typed(spark, _rows())
    stream = _replay(spark, tmp_path, df)
    cells = streaming_cs_cells(
        stream, "ts", [], "item", grain="1 day", depth=3, width=64,
        watermark="10 days", weight="w",
    )
    sink = str(tmp_path / "w_sink")
    q = (
        cells.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "w_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    merged = _state(
        cs_from_cells(
            spark.read.parquet(sink).filter(F.year("bucket_ts") < 2100),
            [],
            3,
            64,
        )
    )
    batch = _state(cs_by(df, [], "item", depth=3, width=64, weight="w"))
    assert bytes(merged["counters"]) == bytes(batch["counters"])
    assert merged["n"] == batch["n"]


def test_bounded_batch_mode_and_null_skip(spark):
    """streaming_cs_cells on a bounded frame (no watermark branch) is
    the same relation; NULL items are skipped per the cs_by contract."""
    df = _typed(spark, _rows(600))
    cells = streaming_cs_cells(df, "ts", [], "item", grain="1 day",
                               depth=3, width=64)
    merged = _state(cs_from_cells(cells, [], 3, 64))
    batch = _state(cs_by(df, [], "item", depth=3, width=64))
    assert bytes(merged["counters"]) == bytes(batch["counters"])
    n_nonnull = df.filter(F.col("item").isNotNull()).count()
    assert merged["n"] == n_nonnull
