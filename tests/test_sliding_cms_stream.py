"""Streaming sliding-CMS cells: exact batch-state parity through a
file-replayed stream, query parity via sliding_cms_topk on the sink."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.sliding_cms import (
    sliding_cms_table,
    sliding_cms_topk,
)
from hyper_spark.streaming.sliding_cms_stream import (
    streaming_sliding_cms_cells,
)

T_REF = "2024-04-06 00:00:00"
WINDOWS = {"2d": "2 days", "5d": "5 days"}


def _rows(n=2500):
    out = []
    for i in range(n):
        day = (i * 7919) % 5
        out.append(
            Row(
                ts=f"2024-04-{day + 1:02d} {(i * 13) % 24:02d}:{i % 60:02d}:00",
                tool=f"t{(i * 31) % (5 + 3 * day):02d}",
            )
        )
    return out


def _typed(spark, rows):
    return spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "tool"
    )


def _replay(spark, tmp_path, df, files=3):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    sentinel = _typed(spark, [Row(ts="2100-01-01 00:00:00", tool="t00")])
    parts = [
        df.filter(
            F.crc32(F.concat("tool", F.col("ts").cast("string"))) % files == i
        )
        for i in range(files)
    ] + [sentinel]
    for i, part in enumerate(parts):  # sentinel LAST, sequenced
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(f"{d}/*.parquet"):
            shutil.copy(f, os.path.join(src, f"{i:03d}.parquet"))
    return (
        spark.readStream.schema("ts timestamp, tool string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_streamed_cells_match_batch_and_query_identically(spark, tmp_path):
    df = _typed(spark, _rows())
    stream = _replay(spark, tmp_path, df)
    out = streaming_sliding_cms_cells(
        stream, "ts", [], "tool", grain="1 day", width=512,
        watermark="10 days",
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
    batch_cells, batch_cands = sliding_cms_table(
        df, "ts", [], "tool", grain="1 day", width=512, k=8
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch_cells.collect()))
    assert a == b
    # the sink is directly queryable: identical top-k to the batch state
    from_sink = sorted(
        map(
            tuple,
            sliding_cms_topk(
                got, batch_cands, [], "tool", T_REF, WINDOWS, k=4
            ).collect(),
        )
    )
    from_batch = sorted(
        map(
            tuple,
            sliding_cms_topk(
                batch_cells, batch_cands, [], "tool", T_REF, WINDOWS, k=4
            ).collect(),
        )
    )
    assert from_sink == from_batch and len(from_sink) == 8


def test_batch_mode_plan_python_free(spark):
    df = _typed(spark, _rows(400))
    plan = (
        streaming_sliding_cms_cells(df, "ts", [], "tool", grain="1 day")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
