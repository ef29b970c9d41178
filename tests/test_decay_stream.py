"""Streaming forward decay: batch parity, re-referencing identity,
horizon pruning bound, overflow guard, Python-free plan."""

from __future__ import annotations

import glob
import math
import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.decay import decayed_counts
from hyper_spark.streaming.decay_stream import (
    streaming_windowed_decay_by,
    windowed_decayed_counts,
    windowed_decayed_topk,
)

HL = 3600.0  # 1 hour
T_REF = "2024-05-01 06:00:00"


def _rows():
    out = []
    for h in range(5):
        for i in range(60):
            out.append(
                Row(
                    ts=f"2024-05-01 {h:02d}:{i:02d}:{(13 * i) % 60:02d}",
                    v=f"x{(i + h) % 4}",
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
    sentinel = _typed(spark, [Row(ts="2100-01-01 00:00:00", v="x0")])
    parts = [
        df.filter(
            F.crc32(F.concat(F.col("v"), F.col("ts").cast("string"))) % files
            == i
        )
        for i in range(files)
    ] + [sentinel]
    for i, part in enumerate(parts):  # sentinel LAST, sequenced
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(f"{d}/*.parquet"):
            shutil.copy(f, os.path.join(src, f"{i:03d}.parquet"))
    return (
        spark.readStream.schema("ts timestamp, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _run_stream(spark, tmp_path, stream):
    out = streaming_windowed_decay_by(
        stream, "ts", [], "v", HL, window="1 hour", watermark="6 hours"
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
    return spark.read.parquet(sink).filter(F.year("window_start") < 2100)


def test_stream_matches_batch_and_reref_identity(spark, tmp_path):
    df = _typed(spark, _rows())
    got = _run_stream(spark, tmp_path, _replay(spark, tmp_path, df))
    # same operator on the bounded frame = the batch reference
    ref = streaming_windowed_decay_by(df, "ts", [], "v", HL, window="1 hour")
    g = {
        (r["v"], r["window_start"]): (r["partial"], r["n"])
        for r in got.collect()
    }
    r = {
        (r["v"], r["window_start"]): (r["partial"], r["n"])
        for r in ref.collect()
    }
    assert set(g) == set(r)
    for k, (p, n) in r.items():
        assert g[k][1] == n
        assert math.isclose(g[k][0], p, rel_tol=1e-12), (k, g[k][0], p)
    # re-referencing identity: windowed eval at T == single-pass
    # batch decayed_counts at the same T (math equal, float ~1 ulp)
    ev = {
        r["v"]: r["decayed_count"]
        for r in windowed_decayed_counts(got, "v", HL, T_REF).collect()
    }
    direct = {
        r["v"]: r["decayed_count"]
        for r in decayed_counts(df, "ts", "v", HL, t_ref=T_REF).collect()
    }
    assert set(ev) == set(direct)
    for v, s in direct.items():
        assert math.isclose(ev[v], s, rel_tol=1e-9), (v, ev[v], s)


def test_horizon_pruning_bound_and_topk(spark, tmp_path):
    df = _typed(spark, _rows())
    sink = streaming_windowed_decay_by(df, "ts", [], "v", HL, window="1 hour")
    exact = {
        r["v"]: r["decayed_count"]
        for r in windowed_decayed_counts(sink, "v", HL, T_REF).collect()
    }
    pruned_rows = windowed_decayed_counts(
        sink, "v", HL, T_REF, horizon=3.0
    ).collect()
    pruned = {r["v"]: r["decayed_count"] for r in pruned_rows}
    n_total = sum(r["n"] for r in sink.collect())
    for v, s in exact.items():
        # pruning only removes mass, each pruned obs weighed < 2^-3
        assert pruned[v] <= s + 1e-12
        assert s - pruned[v] <= n_total * 2.0**-3.0
    top = windowed_decayed_topk(sink, "v", HL, T_REF, k=2).collect()
    ranked = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["v"]) for r in top] == [v for v, _ in ranked]


def test_overflow_guard(spark):
    df = _typed(spark, _rows())
    with pytest.raises(ValueError, match="half-lives per window"):
        streaming_windowed_decay_by(df, "ts", [], "v", 1.0, window="30 days")


def test_plan_python_free_single_exchange(spark):
    df = _typed(spark, _rows())
    plan = (
        streaming_windowed_decay_by(df, "ts", [], "v", HL, window="1 hour")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1
