"""Checkpoint-resumable merge + lineage (plans/) and Structured
Streaming sketch state (streaming/)."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.hll_agg import sketch_by, sketch_collect
from hyper_spark.plans.merge import (
    checkpointed_sketch_build,
    lineage_table,
    resume_info,
)
from hyper_spark.streaming.hll_stream import streaming_sketch_by


@pytest.fixture()
def ckpt_dir():
    d = tempfile.mkdtemp(prefix="hyper_spark_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_checkpointed_build_matches_sketch_by(spark, ckpt_dir):
    rows = [Row(g=f"g{i % 3}", v=f"user-{i % 700}") for i in range(5000)]
    df = spark.createDataFrame(rows).repartition(8)
    out = checkpointed_sketch_build(
        spark, df, ["g"], "v", ckpt_dir, p=12, num_salts=16, fanout=4
    ).collect()
    direct = {r["g"]: bytes(r["registers"]) for r in sketch_by(df, ["g"], "v", 12).collect()}
    assert len(out) == 3
    for r in out:
        assert bytes(r["registers"]) == direct[r["g"]]  # lossless salting

    info = resume_info(ckpt_dir)
    # 16 salts, fanout 4: levels 0 (partials), 1 (→4), 2 (→1)
    assert info["completed_levels"] == [0, 1, 2]
    metrics = sorted(glob.glob(os.path.join(ckpt_dir, "metrics_*.json")))
    assert len(metrics) == 3
    m0 = json.load(open(metrics[0]))
    assert m0["rows"] > 0 and m0["wall_ms"] > 0

    lin = lineage_table(spark, ckpt_dir)
    stats = lin.agg(
        F.sum("rows_in").alias("total"), F.countDistinct("partition_id").alias("pids")
    ).collect()[0]
    assert stats["total"] == 5000  # every input row accounted for
    assert stats["pids"] >= 2


def test_resume_skips_completed_levels(spark, ckpt_dir):
    rows = [Row(g="a", v=f"x{i}") for i in range(1000)]
    df = spark.createDataFrame(rows)
    checkpointed_sketch_build(spark, df, ["g"], "v", ckpt_dir, p=11, num_salts=8, fanout=2)
    # tamper: record mtimes, rerun, levels must not be rewritten
    marker = os.path.join(ckpt_dir, "level_00", "_SUCCESS")
    mtime_before = os.path.getmtime(marker)
    time.sleep(0.05)
    out = checkpointed_sketch_build(
        spark, df, ["g"], "v", ckpt_dir, p=11, num_salts=8, fanout=2
    )
    assert os.path.getmtime(marker) == mtime_before
    got = sketch_collect(out)
    direct = sketch_collect(sketch_by(df, [], "v", 11))
    assert got == direct


def test_partial_resume_after_simulated_failure(spark, ckpt_dir):
    """Kill the build after level 0 (simulated by only building level 0
    via a low num_salts run interrupted at the directory level), then
    resume and verify completion."""
    rows = [Row(g="a", v=f"y{i % 400}") for i in range(2000)]
    df = spark.createDataFrame(rows).repartition(4)
    checkpointed_sketch_build(spark, df, ["g"], "v", ckpt_dir, p=11, num_salts=8, fanout=2)
    # wipe everything above level 0 — as if the job died mid-merge
    for path in glob.glob(os.path.join(ckpt_dir, "level_0[1-9]")):
        shutil.rmtree(path)
    assert resume_info(ckpt_dir)["completed_levels"] == [0]
    out = checkpointed_sketch_build(
        spark, df, ["g"], "v", ckpt_dir, p=11, num_salts=8, fanout=2
    )
    assert sketch_collect(out) == sketch_collect(sketch_by(df, [], "v", 11))


def test_streaming_sketch_matches_batch(spark, tmp_path):
    """Feed the same rows through the streaming operator (rate-limited
    file source, several micro-batches) and the batch operator; final
    sketches must be byte-identical."""
    rows = [Row(g=f"g{i % 2}", v=f"u{i % 300}") for i in range(2000)]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "stream_src")
    # several files → several micro-batches
    for part in range(4):
        df.filter(F.crc32(F.col("v")) % 4 == part).write.mode(
            "overwrite" if part == 0 else "append"
        ).parquet(src)

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "2"
    ).parquet(src)
    # parquet sinks only support append mode; the operator emits its
    # current state each micro-batch either way
    out = streaming_sketch_by(stream, ["g"], "v", p=11, output_mode="append")
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(sink)
    # last emitted state per group = the complete sketch
    import pandas as pd

    pdf = got.toPandas()
    batch = {
        r["g"]: bytes(r["registers"])
        for r in sketch_by(df, ["g"], "v", 11).collect()
    }
    for g in ("g0", "g1"):
        sub = pdf[pdf["g"] == g]
        # registers grow monotonically; the union of all emitted states
        # equals the batch sketch, and the largest-estimate row is final
        import numpy as np

        final = None
        for blob in sub["registers"]:
            regs = np.frombuffer(bytes(blob), dtype=np.uint8)
            final = regs if final is None else np.maximum(final, regs)
        assert final.tobytes() == batch[g]


def test_streaming_cms_matches_batch(spark, tmp_path):
    from hyper_spark.kernel.cms import CountMinSketch
    from hyper_spark.streaming.hll_stream import streaming_cms_by

    rows = [Row(g=f"g{i % 2}", v=f"item{i % 40}") for i in range(3000)]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "cms_src")
    for part in range(3):
        df.filter(F.crc32(F.col("v")) % 3 == part).write.mode(
            "overwrite" if part == 0 else "append"
        ).parquet(src)

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    # parquet sinks only take append; the operator defaults to 'update'
    # (one refreshed row per key per batch) so opt in to append here
    out = streaming_cms_by(
        stream, ["g"], "v", depth=3, width=256, output_mode="append",
        hash_fn="md5",  # kernel byte-parity comparison below
    )
    sink = str(tmp_path / "cms_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import numpy as np

    got = spark.read.parquet(sink).toPandas()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r.v)
    for g, items in by_g.items():
        sub = got[got["g"] == g]
        final = None
        for blob in sub["counters"]:
            c = np.frombuffer(bytes(blob), dtype="<i8").reshape(3, 256)
            final = c if final is None or c.sum() > final.sum() else final
        kern = CountMinSketch(3, 256).add_many(items)
        assert np.array_equal(final, kern.counters), g


def test_salting_spreads_hot_key(spark, ckpt_dir):
    """North-rule skew clause: a conv_id-style hot key (95% of rows) is
    spread over num_salts distinct reducer keys at level 0 — the salted
    pre-aggregation actually defeats the skew rather than funneling the
    hot group through one reducer — and the final sketch is lossless."""
    hot = [Row(g="hot", v=f"u{i % 5000}") for i in range(9500)]
    cold = [Row(g=f"c{i % 7}", v=f"w{i}") for i in range(500)]
    df = spark.createDataFrame(hot + cold).repartition(8)
    out = checkpointed_sketch_build(
        spark, df, ["g"], "v", ckpt_dir, p=12, num_salts=8, fanout=4
    )
    lvl0 = spark.read.parquet(os.path.join(ckpt_dir, "level_00"))
    hot_salts = lvl0.filter(F.col("g") == "hot").select("__salt").distinct().count()
    assert hot_salts == 8  # xxhash64(value) % 8 covers all salts
    direct = {r["g"]: bytes(r["registers"]) for r in sketch_by(df, ["g"], "v", 12).collect()}
    got = {r["g"]: bytes(r["registers"]) for r in out.collect()}
    assert got == direct


def test_streaming_sparse_state_roundtrip(spark, tmp_path):
    """state_encoding='auto' stores low-fill groups as sparse pair blobs
    in the state store and still emits canonical dense output that
    matches batch byte-for-byte across micro-batches."""
    rows = [Row(g=f"g{i % 2}", v=f"u{i % 25}") for i in range(600)]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "sp_src")
    for part in range(3):
        df.filter(F.crc32(F.col("v")) % 3 == part).write.mode(
            "overwrite" if part == 0 else "append"
        ).parquet(src)
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming_sketch_by(
        stream, ["g"], "v", p=14, output_mode="append", state_encoding="auto"
    )
    sink = str(tmp_path / "sp_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "sp_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import numpy as np

    got = spark.read.parquet(sink).toPandas()
    batch = {
        r["g"]: bytes(r["registers"])
        for r in sketch_by(df, ["g"], "v", 14).collect()
    }
    for g in ("g0", "g1"):
        sub = got[got["g"] == g]
        final = None
        for blob in sub["registers"]:
            regs = np.frombuffer(bytes(blob), dtype=np.uint8)
            assert len(regs) == 1 << 14  # output stays canonical dense
            final = regs if final is None else np.maximum(final, regs)
        assert final.tobytes() == batch[g]


def test_streaming_quantiles_matches_kernel(spark, tmp_path):
    """Streaming quantile state over multiple micro-batches converges to
    the same estimates a single kernel sketch gives over all values (KLL
    is deterministic for our seedless compaction path only in aggregate;
    t-digest is deterministic — use tdigest for exact state parity)."""
    import numpy as np

    from hyper_spark.kernel.tdigest import TDigest
    from hyper_spark.streaming.hll_stream import streaming_quantiles_by

    rows = [Row(g="a", v=float(i % 997)) for i in range(4000)]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "q_src")
    for part in range(3):
        df.filter(F.crc32(F.col("v").cast("string")) % 3 == part).write.mode(
            "overwrite" if part == 0 else "append"
        ).parquet(src)
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming_quantiles_by(
        stream, ["g"], "v", [0.5, 0.9], method="tdigest", output_mode="append"
    )  # parquet sink requires append; default is 'update'
    sink = str(tmp_path / "q_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "q_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink).toPandas()
    final = got.loc[got["n"].idxmax()]  # last emitted state has all rows
    assert final["n"] == 4000
    exact = np.sort(np.array([r.v for r in rows]))
    for qq, cname in ((0.5, "q_0500"), (0.9, "q_0900")):
        est = final[cname]
        rank = np.searchsorted(exact, est) / len(exact)
        assert abs(rank - qq) <= 0.02, (qq, est, rank)


def test_streaming_windowed_sketch_watermark_expiry(spark, tmp_path):
    """Event-time windowed sketches with bounded state: windows emit
    live updates, close with ONE final row when the watermark passes
    their end (state removed — the property that bounds state on an
    endless stream), fold late-but-in-watermark rows, and drop rows
    older than the watermark."""
    import datetime as dt
    import shutil
    from pathlib import Path

    from hyper_spark.streaming.hll_stream import streaming_windowed_sketch_by

    base = dt.datetime(2024, 5, 1, 0, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    batches = [
        # window [0,30): u0..u4 distinct=5 ; window [30,60): v0..v2 =3
        [Row(g="a", ts=t(m), v=f"u{m // 5}") for m in range(0, 25, 5)]
        + [Row(g="a", ts=t(m), v=f"v{m % 3}") for m in range(30, 55, 5)],
        # advances watermark to 110-10=100 -> closes [0,30) and [30,60);
        # also a LATE row for window [60,90): ts=62 > wm(=40 at batch-1
        # end) when processed here, folds in
        [Row(g="a", ts=t(m), v=f"w{m}" ) for m in range(100, 111, 5)]
        + [Row(g="a", ts=t(62), v="late-ok")],
        # a row for the long-closed [0,30) window: older than the
        # watermark (100) -> dropped by Spark, must NOT reopen the window
        [Row(g="a", ts=t(2), v="too-late")]
        + [Row(g="a", ts=t(200), v="tail")],
    ]
    raw = tmp_path / "wsrc"
    flat = tmp_path / "wflat"
    flat.mkdir()
    k = 0
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
            str(raw / f"b{i}")
        )
        for f in sorted(Path(raw / f"b{i}").glob("*.parquet")):
            shutil.copy(f, flat / f"{k:03d}.parquet")
            k += 1
    stream = (
        spark.readStream.schema("g string, ts timestamp, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(flat))
    )
    out = streaming_windowed_sketch_by(
        stream, "ts", ["g"], "v", p=12, window="30 minutes", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wsk_gate")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from wsk_gate").collect()
    finals = {
        r["window_start"]: r for r in rows if r["final"]
    }
    # exactly one final per closed window, estimates exact at these sizes
    assert len([r for r in rows if r["final"]]) == len(finals)
    assert round(finals[t(0)]["estimate"]) == 5
    assert round(finals[t(30)]["estimate"]) == 3
    # the late-but-in-watermark row made it into [60,90)'s sketch
    w60 = [r for r in rows if r["window_start"] == t(60)]
    assert w60 and max(round(r["estimate"]) for r in w60) == 1
    # the too-late row did NOT reopen [0,30): its only final stays 5 and
    # no post-final live row exists
    assert [round(r["estimate"]) for r in rows if r["window_start"] == t(0)].count(5) == len(
        [r for r in rows if r["window_start"] == t(0)]
    )


def test_streaming_sliding_windows_match_batch(spark, tmp_path):
    """slide= makes the windowed sketches SLIDING: each event folds into
    its window/slide overlapping windows; every closed window's final
    registers are byte-identical to a batch sketch_by over the raw rows
    inside that window's range."""
    import datetime as dt

    from hyper_spark.operators.hll_agg import sketch_by
    from hyper_spark.streaming.hll_stream import streaming_windowed_sketch_by

    base = dt.datetime(2024, 5, 1, 0, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = [Row(g="a", ts=t(m), v=f"u{(m * 7) % 13}") for m in range(0, 56, 1)]
    tail = [Row(g="a", ts=t(500), v="tail")]  # advances watermark, closes all
    src = str(tmp_path / "slide_src")
    spark.createDataFrame(rows).coalesce(1).write.parquet(src)
    spark.createDataFrame(tail).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("g string, ts timestamp, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_windowed_sketch_by(
        stream, "ts", ["g"], "v", p=12, window="30 minutes",
        watermark="5 minutes", slide="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("slide_gate")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    finals = {
        r["window_start"]: bytes(r["registers"])
        for r in spark.sql("select * from slide_gate").collect()
        if r["final"]
    }
    df = spark.createDataFrame(rows)
    # sliding window starts at 10-min marks from -20 to 50
    closed = [s for s in finals if s < t(100)]
    assert len(closed) >= 6  # -20, -10, 0, 10, 20, 30, 40, 50 era
    for s in closed:
        e = s + dt.timedelta(minutes=30)
        sub = df.filter((F.col("ts") >= F.lit(s)) & (F.col("ts") < F.lit(e)))
        direct = sketch_by(sub, [], "v", 12).collect()
        assert finals[s] == bytes(direct[0]["registers"]), s


def test_streaming_packed6_state_roundtrip(spark, tmp_path):
    """Review fix: state written with state_encoding='packed6' must be
    decoded with the same hint on the next micro-batch (its length is
    ambiguous with sparse — the 'auto' decode scattered out-of-range
    indices). Multi-batch run, final registers byte-equal to batch."""
    from hyper_spark.operators.hll_agg import sketch_by
    from hyper_spark.streaming.hll_stream import streaming_sketch_by

    rows = [Row(g=f"g{i % 2}", v=f"u{i}") for i in range(1200)]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "p6_src")
    for part in range(3):
        df.filter(F.crc32(F.col("v")) % 3 == part).write.mode(
            "overwrite" if part == 0 else "append"
        ).parquet(src)
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    p = 8  # 600 distinct per group >> 2^8 registers: dense fill -> packed arm
    out = streaming_sketch_by(
        stream, ["g"], "v", p=p, output_mode="append", state_encoding="packed6"
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "p6_sink"))
        .option("checkpointLocation", str(tmp_path / "p6_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import numpy as np

    emitted = spark.read.parquet(str(tmp_path / "p6_sink")).collect()
    folded = {}
    for r in emitted:
        regs = np.frombuffer(bytes(r["registers"]), dtype=np.uint8)
        g = r["g"]
        folded[g] = regs if g not in folded else np.maximum(folded[g], regs)
    batch = {
        r["g"]: bytes(r["registers"])
        for r in sketch_by(df, ["g"], "v", p).collect()
    }
    assert {g: v.tobytes() for g, v in folded.items()} == batch


def test_streaming_windowed_sketch_non_utc_timezone(spark, tmp_path):
    """Review fix: the window_end grouping key arrives tz-naive in the
    SESSION timezone; taking epoch millis as UTC shifted expiry by the
    tz offset (early close + state resurrection west of UTC). Under a
    non-UTC session tz every closed window must emit exactly ONE final
    row with the exact distinct count."""
    import datetime as dt
    import shutil
    from pathlib import Path

    from hyper_spark.streaming.hll_stream import streaming_windowed_sketch_by

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        base = dt.datetime(2024, 5, 1, 0, 0, 0)

        def t(minutes):
            return base + dt.timedelta(minutes=minutes)

        batches = [
            [Row(g="a", ts=t(m), v=f"u{m // 5}") for m in range(0, 25, 5)],
            # advances watermark past [0,30)'s end; also a late row for
            # the still-open [30,60) window
            [Row(g="a", ts=t(m), v=f"w{m}") for m in range(45, 56, 5)],
            [Row(g="a", ts=t(200), v="tail")],
        ]
        raw, flat = tmp_path / "tzsrc", tmp_path / "tzflat"
        flat.mkdir()
        k = 0
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(raw / f"b{i}"))
            for f in sorted(Path(raw / f"b{i}").glob("*.parquet")):
                shutil.copy(f, flat / f"{k:03d}.parquet")
                k += 1
        stream = (
            spark.readStream.schema("g string, ts timestamp, v string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(flat))
        )
        out = streaming_windowed_sketch_by(
            stream, "ts", ["g"], "v", p=12, window="30 minutes",
            watermark="5 minutes",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("wsk_tz")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql("select * from wsk_tz").collect()
        finals = [r for r in rows if r["final"]]
        by_start = {}
        for r in finals:
            by_start.setdefault(r["window_start"], []).append(r)
        # exactly one final per closed window, no duplicates from
        # early-expiry state resurrection
        assert all(len(v) == 1 for v in by_start.values()), by_start
        w0 = [v[0] for s, v in by_start.items() if s == t(0)]
        assert w0 and round(w0[0]["estimate"]) == 5
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_sparse_checkpoint_shrinks_partials(spark, ckpt_dir):
    """encoding='auto' (default) stores low-fill salted partials as
    3-byte-per-register sparse blobs: lineage records the actual blob
    bytes, and the final output is register-identical to sketch_by."""
    rows = [Row(u=i % 500, v=f"e{i}") for i in range(5000)]
    df = spark.createDataFrame(rows).repartition(8)
    p = 14
    out = checkpointed_sketch_build(
        spark, df, ["u"], "v", ckpt_dir, p=p, num_salts=4, fanout=4
    )
    lin = lineage_table(spark, ckpt_dir)
    stats = lin.agg(
        F.max("sketch_bytes").alias("mx"), F.avg("sketch_bytes").alias("avg")
    ).collect()[0]
    # ~10 values per (user, salt, partition) partial -> ~30 bytes, never
    # anywhere near the 16384-byte dense blob
    assert stats["mx"] < (1 << p) // 3, stats
    direct = {r["u"]: bytes(r["registers"]) for r in sketch_by(df, ["u"], "v", p).collect()}
    got = {r["u"]: bytes(r["registers"]) for r in out.collect()}
    assert got == direct


def test_packed6_checkpoint_shrinks_dense_levels(spark, ckpt_dir):
    """encoding='packed6' (VERDICT r02 next #8): dense-fill partials
    persist at 6 bits/register (exactly 3/4 the dense blob), low-fill
    ones still go sparse, and the final output is byte-identical to a
    dense-encoded build. A GLOBAL sketch over many distinct values makes
    every salted partial near-full — the packed6 case."""
    import tempfile as _tf

    rows = [Row(v=f"user-{i}") for i in range(60000)]
    df = spark.createDataFrame(rows).repartition(4)
    p = 10  # 2^10 registers, ~15k distinct per salt -> full registers
    out = checkpointed_sketch_build(
        spark, df, [], "v", ckpt_dir, p=p, num_salts=4, fanout=4,
        encoding="packed6",
    )
    lin = lineage_table(spark, ckpt_dir)
    mx = lin.agg(F.max("sketch_bytes").alias("mx")).collect()[0]["mx"]
    assert mx == 6 * (1 << p) // 8, mx  # the 25%-smaller packed layout
    d2 = _tf.mkdtemp(prefix="hyper_spark_ckpt_dense_")
    try:
        dense = checkpointed_sketch_build(
            spark, df, [], "v", d2, p=p, num_salts=4, fanout=4,
            encoding="dense",
        )
        assert [bytes(r["registers"]) for r in out.collect()] == [
            bytes(r["registers"]) for r in dense.collect()
        ]
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_streaming_sessionize_late_row_bridges_sessions(spark, tmp_path):
    """The session-window MERGE property: two provisional sessions must
    not be finalized while an in-watermark late row could still bridge
    them into one — the defining difference from naive incremental
    sessionization."""
    import datetime as dt
    import shutil
    from pathlib import Path

    from hyper_spark.streaming import streaming_sessionize

    base = dt.datetime(2024, 5, 1)

    def t(m):
        return base + dt.timedelta(minutes=m)

    gap = 30 * 60.0
    batches = [
        # two runs 50 minutes apart: provisionally TWO sessions at gap=30m
        [Row(k="a", ts=t(0)), Row(k="a", ts=t(50))],
        # late row at 25m (watermark after batch 1 = 50m - 40m = 10m, so
        # it is accepted) bridges them: gaps 25m and 25m <= 30m
        [Row(k="a", ts=t(25))],
        [Row(k="__flush", ts=t(5000))],
    ]
    raw, flat = tmp_path / "br_src", tmp_path / "br_flat"
    flat.mkdir()
    n = 0
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
            str(raw / f"b{i}")
        )
        for f in sorted(Path(raw / f"b{i}").glob("*.parquet")):
            shutil.copy(f, flat / f"{n:03d}.parquet")
            n += 1
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(flat))
    )
    out = streaming_sessionize(stream, ["k"], "ts", gap=gap, watermark="40 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_bridge")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ss_bridge where k = 'a'").collect()
    assert len(rows) == 1, rows  # ONE bridged session, emitted once
    assert rows[0]["n_events"] == 3
    assert rows[0]["session_start"] == t(0) and rows[0]["session_end"] == t(50)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """After a sentinel flush, streaming sessions == batch sessionize
    partition of the same rows (count and membership per key)."""
    import datetime as dt
    import shutil
    from pathlib import Path

    from hyper_spark.operators.temporal import sessionize
    from hyper_spark.streaming import streaming_sessionize

    rng = __import__("random").Random(7)
    base = dt.datetime(2024, 5, 1)
    rows = []
    for k in ("a", "b", "c"):
        m = 0.0
        for _ in range(40):
            m += rng.choice([1, 2, 5, 90, 200])  # minutes; gap = 60min
            rows.append(Row(k=k, ts=base + dt.timedelta(minutes=m)))
    df = spark.createDataFrame(rows)
    batch = (
        sessionize(df, "k", "ts", gap=3600.0)
        .groupBy("k")
        .agg(F.max("session_idx").alias("mx"))
        .collect()
    )
    want = {r["k"]: r["mx"] + 1 for r in batch}

    raw, flat = tmp_path / "sb_src", tmp_path / "sb_flat"
    flat.mkdir()
    ordered = sorted(rows, key=lambda r: r.ts)
    thirds = [ordered[:40], ordered[40:80], ordered[80:]]
    thirds.append([Row(k="__flush", ts=base + dt.timedelta(days=30))])
    n = 0
    for i, chunk in enumerate(thirds):
        spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(
            str(raw / f"b{i}")
        )
        for f in sorted(Path(raw / f"b{i}").glob("*.parquet")):
            shutil.copy(f, flat / f"{n:03d}.parquet")
            n += 1
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(flat))
    )
    out = streaming_sessionize(stream, ["k"], "ts", gap=3600.0, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_batch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {}
    for r in spark.sql("select k, count(*) c from ss_batch where k <> '__flush' group by k").collect():
        got[r["k"]] = r["c"]
    assert got == want, (got, want)


def test_streaming_dedup_first_arrival_only(spark, tmp_path):
    """Across micro-batches, each fingerprint is admitted exactly once;
    the final fingerprint set equals the batch distinct set."""
    from hyper_spark.streaming.dedup_stream import streaming_dedup

    rows = [
        Row(doc_id=i, text=f"document body {i % 40}")  # 40 distinct texts
        for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "dd_src")
    for part in range(4):
        df.filter(F.col("doc_id") % 4 == part).write.mode(
            "overwrite" if part == 0 else "append"
        ).parquet(src)

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming_dedup(stream)
    sink = str(tmp_path / "dd_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(sink).collect()
    # exactly one row per distinct fingerprint
    assert len(got) == 40
    assert len({r["fingerprint"] for r in got}) == 40
    from hyper_spark.functions.text import fingerprint_col as fpc

    batch_fps = {
        r["fp"] for r in df.select(fpc(F.col("text")).alias("fp")).distinct().collect()
    }
    assert {r["fingerprint"] for r in got} == batch_fps
    # resuming the same checkpoint with a replayed (duplicate) source
    # admits nothing new
    df.limit(100).write.mode("append").parquet(src)
    q2 = (
        streaming_dedup(
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 40


def test_streaming_dedup_bloom_bounded_state(spark, tmp_path):
    """Bounded-state mode contract: output ⊆ exact output (a Bloom
    filter has no false negatives, so true duplicates are ALWAYS
    dropped and nothing is emitted twice); divergence is only
    false-positive drops of new docs, bounded by fpp; state survives a
    checkpoint resume (replayed duplicates admit nothing)."""
    from hyper_spark.functions.text import fingerprint_col as fpc
    from hyper_spark.streaming.dedup_stream import streaming_dedup

    rows = [
        Row(doc_id=i, text=f"bloom mode body {i % 60}")  # 60 distinct
        for i in range(480)
    ]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "bl_src")
    for part in range(4):
        df.filter(F.col("doc_id") % 4 == part).write.mode(
            "overwrite" if part == 0 else "append"
        ).parquet(src)

    def run(tag):
        q = (
            streaming_dedup(
                spark.readStream.schema(df.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src),
                state="bloom",
                n_shards=8,
                capacity_per_shard=5000,
                fpp=0.01,
            )
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "bl_sink"))
            .option("checkpointLocation", str(tmp_path / "bl_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("first")
    got = spark.read.parquet(str(tmp_path / "bl_sink")).collect()
    batch_fps = {
        r["fp"] for r in df.select(fpc(F.col("text")).alias("fp")).distinct().collect()
    }
    got_fps = [r["fingerprint"] for r in got]
    # no fingerprint admitted twice, all admitted ones are real
    assert len(got_fps) == len(set(got_fps))
    assert set(got_fps) <= batch_fps
    # far under capacity: FP drops should be ~0; allow the fpp bound's
    # slack (60 distinct * 0.01 rounds to ~1)
    assert len(batch_fps) - len(set(got_fps)) <= 2
    # resume from the checkpoint with replayed duplicates: no new rows
    df.limit(120).write.mode("append").parquet(src)
    run("resume")
    again = spark.read.parquet(str(tmp_path / "bl_sink")).collect()
    assert len(again) == len(got)


def test_streaming_dedup_bloom_fp_rate_bound():
    """The divergence from exact is the Bloom FP rate: sequentially
    admit `capacity` distinct keys through the same filter the stream
    shards use and count false-positive drops — must stay within a few
    multiples of the configured fpp (the standard sizing analysis)."""
    from hyper_spark.kernel.bloom import BloomFilter

    cap, fpp = 4000, 0.01
    bf = BloomFilter.from_expected(cap, fpp)
    drops = 0
    for i in range(cap):
        key = f"distinct document {i}"
        if bf.might_contain(key):
            drops += 1
        else:
            bf.add(key)
    # average fill over the run is half the final, so observed FP rate
    # sits well under fpp; 3x guards seed variance
    assert drops / cap <= 3 * fpp


def test_streaming_dedup_bad_state_mode(spark):
    from hyper_spark.streaming.dedup_stream import streaming_dedup

    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        streaming_dedup(df, state="probabilistic")


def _run_topk_stream(spark, tmp_path, rows_df, tag, **kw):
    from hyper_spark.streaming.topk_stream import streaming_windowed_topk

    src = str(tmp_path / f"tk_src_{tag}")
    rows_df.write.mode("overwrite").parquet(src)
    out = streaming_windowed_topk(
        spark.readStream.schema(rows_df.schema).parquet(src),
        "ts", [], "v", **kw,
    )
    sink = str(tmp_path / f"tk_sink_{tag}")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / f"tk_ckpt_{tag}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(sink)


def test_streaming_windowed_topk_exact_when_capacity_fits(spark, tmp_path):
    """capacity >= vocab: final top-k per closed window is exact."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 30)
    rows = []
    for h, counts in enumerate([{"a": 5, "b": 3, "c": 1}, {"x": 7, "a": 2}]):
        for v, c in counts.items():
            rows += [(base + dt.timedelta(hours=h), v)] * c
    rows.append((base + dt.timedelta(days=30), "sentinel"))  # flush
    df = spark.createDataFrame(rows, "ts timestamp, v string")
    got = _run_topk_stream(
        spark, tmp_path, df, "exact", k=2, capacity=16,
        window="1 hour", watermark="10 minutes",
    ).collect()
    by_win = {}
    for r in got:
        by_win.setdefault(r["window_start"].hour, []).append(
            (r["rank"], r["value"], r["est_count"], r["err_bound"])
        )
    assert sorted(by_win[0]) == [(1, "a", 5, 0), (2, "b", 3, 0)]
    assert sorted(by_win[1]) == [(1, "x", 7, 0), (2, "a", 2, 0)]


def test_streaming_windowed_topk_space_saving_bounds(spark, tmp_path):
    """capacity < vocab: heavy value still guaranteed in the summary,
    est in [true, true+err]."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 10)
    rows = [(base, "heavy")] * 60
    rows += [(base, f"n{i}") for i in range(40)]  # 40 singletons
    rows.append((base + dt.timedelta(days=30), "sentinel"))
    df = spark.createDataFrame(rows, "ts timestamp, v string")
    got = _run_topk_stream(
        spark, tmp_path, df, "ss", k=3, capacity=8,
        window="1 hour", watermark="5 minutes",
    ).collect()
    win0 = [r for r in got if r["window_start"].hour == 0]
    top1 = next(r for r in win0 if r["rank"] == 1)
    assert top1["value"] == "heavy"  # freq > n/capacity => guaranteed
    assert 60 <= top1["est_count"] <= 60 + top1["err_bound"]


def test_streaming_windowed_quantiles_final_per_window(spark, tmp_path):
    """Each closed window emits one final quantile row within rank
    bound of the exact per-window quantiles; state drops at close."""
    import datetime as dt

    import numpy as np

    from hyper_spark.streaming.quantiles_window_stream import (
        streaming_windowed_quantiles,
    )

    rng = np.random.default_rng(11)
    base = dt.datetime(2026, 2, 1, 0, 0)
    rows = []
    vals = {0: rng.normal(100, 10, 800), 1: rng.normal(50, 5, 600)}
    for h, xs in vals.items():
        for x in xs:
            rows.append((base + dt.timedelta(hours=h, minutes=30), float(x)))
    rows.append((base + dt.timedelta(days=30), 0.0))  # sentinel flush
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    src = str(tmp_path / "wq_src")
    df.write.parquet(src)
    out = streaming_windowed_quantiles(
        spark.readStream.schema(df.schema).parquet(src),
        "ts", [], "v", qs=[0.1, 0.5, 0.9],
        window="1 hour", watermark="5 minutes",
    )
    sink = str(tmp_path / "wq_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "wq_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["window_start"].hour: r
           for r in spark.read.parquet(sink).collect()
           if r["window_start"].year == 2026 and r["window_start"].month == 2
           and r["window_start"].day == 1}
    assert set(got) == {0, 1}
    for h, xs in vals.items():
        r = got[h]
        assert r["n"] == len(xs)
        s = np.sort(xs)
        for q_ in (0.1, 0.5, 0.9):
            est = r[f"q_{int(q_*1000):04d}"]
            rank = np.searchsorted(s, est, side="right") / len(s)
            assert abs(rank - q_) <= 0.03, (h, q_, rank)


def test_streaming_theta_matches_batch(spark, tmp_path):
    """Same rows through streaming_theta_by (several micro-batches)
    and batch theta_by: the union of emitted states equals the batch
    sketch byte-for-byte (each emitted row is a prefix union, so the
    order-free union is the final state)."""
    from hyper_spark.kernel.theta import ThetaSketch
    from hyper_spark.operators.theta_agg import theta_by, theta_collect
    from hyper_spark.streaming.hll_stream import streaming_theta_by

    rows = [Row(g=f"g{i % 2}", v=f"u{i % 900}") for i in range(3000)]
    df = spark.createDataFrame(rows)
    src = str(tmp_path / "theta_src")
    for part in range(4):
        df.filter(F.crc32(F.col("v")) % 4 == part).write.mode(
            "overwrite" if part == 0 else "append"
        ).parquet(src)

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "2"
    ).parquet(src)
    out = streaming_theta_by(stream, ["g"], "v", k=256, output_mode="append")
    sink = str(tmp_path / "theta_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "theta_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    pdf = spark.read.parquet(sink).toPandas()
    for g in ("g0", "g1"):
        sub = pdf[pdf["g"] == g]
        assert len(sub) >= 2  # several micro-batches actually emitted
        acc = ThetaSketch.empty(256)
        for blob in sub["entries"]:
            acc = acc.union(ThetaSketch.from_bytes(256, bytes(blob)))
        batch = theta_collect(
            theta_by(df.filter(F.col("g") == g), [], "v", k=256)
        )
        assert acc == batch
    # and the emitted rows are a valid sketch table for the batch
    # set-algebra operators
    from hyper_spark.operators.theta_agg import theta_union

    merged = theta_union(spark.read.parquet(sink), ["g"]).collect()
    assert len(merged) == 2


def test_streaming_transitions_matches_batch(spark, tmp_path):
    """Replay out-of-order conversation turns through the stream; after
    a sentinel flush, summed per-conv pair counts must equal the batch
    transitions() counts (incl. START/END bounds)."""
    import datetime as dt

    from hyper_spark.operators.temporal import transitions
    from hyper_spark.streaming import streaming_transitions

    base = dt.datetime(2026, 1, 1)
    rows = []
    rng = __import__("random").Random(13)
    for c in range(12):
        n = rng.randint(1, 8)
        for i in rng.sample(range(n), n):  # out-of-order turn arrival
            rows.append(
                (
                    f"c{c}",
                    base + dt.timedelta(seconds=60 * c + i),
                    i,
                    rng.choice(["search", "code", "browse", None]),
                )
            )
    schema = "conv string, ts timestamp, turn int, tool string"
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    # three micro-batch files in arrival order + a far-future sentinel
    # that advances the watermark past every close_after deadline
    chunks = [rows[i::3] for i in range(3)]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(src)
    sentinel = [("__flush__", base + dt.timedelta(days=30), 0, "x")]
    spark.createDataFrame(sentinel, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    # two contract knobs, both exercised here: the WATERMARK delay must
    # cover arrival disorder (round-robin chunks deliver turns ~12 min
    # out of order; "0 seconds" made Spark drop them as late input),
    # and close_after must exceed watermark-lag skew so no conv closes
    # while its turns are still arriving — the sentinel then advances
    # the watermark past every deadline at once
    out = streaming_transitions(
        stream, "conv", "ts", "turn", "tool",
        close_after=3600.0, watermark="1 hour",
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

    got = (
        spark.read.parquet(sink)
        .filter(F.col("conv") != "__flush__")
        .groupBy("from_state", "to_state")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    got_map = {(r["from_state"], r["to_state"]): r["n"] for r in got}
    batch = transitions(df, "conv", "turn", "tool", include_bounds=True)
    exp = {
        (r["from_state"], r["to_state"]): r["n"] for r in batch.collect()
    }
    assert got_map == exp


def _run_transitions_stream(spark, tmp_path, files, schema, **kwargs):
    import pyspark.sql.functions as F  # noqa: F811

    src = str(tmp_path / "src")
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(src)
    from hyper_spark.streaming import streaming_transitions

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming_transitions(
        stream, "conv", "ts", "turn", "tool",
        close_after=3600.0, watermark="1 hour", **kwargs,
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
    rows = (
        spark.read.parquet(sink)
        .filter(F.col("conv") != "__flush__")
        .groupBy("from_state", "to_state")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    return {(r["from_state"], r["to_state"]): r["n"] for r in rows}


def test_streaming_transitions_bounded_exact_when_in_order(spark, tmp_path):
    """max_buffer=4 forces repeated folds (keys have up to 10 turns);
    with in-order arrival the disorder is zero, so the bounded mode must
    equal batch transitions EXACTLY — the fold is lossless whenever
    per-key disorder stays within the retained tail."""
    import datetime as dt

    from hyper_spark.operators.temporal import transitions

    base = dt.datetime(2026, 1, 1)
    rng = __import__("random").Random(29)
    rows = []
    for c in range(10):
        for i in range(rng.randint(1, 10)):
            rows.append(
                (
                    f"c{c}",
                    base + dt.timedelta(seconds=60 * c + i),
                    i,
                    rng.choice(["search", "code", "browse"]),
                )
            )
    schema = "conv string, ts timestamp, turn int, tool string"
    third = len(rows) // 3
    sentinel = [("__flush__", base + dt.timedelta(days=30), 0, "x")]
    got = _run_transitions_stream(
        spark, tmp_path,
        [rows[:third], rows[third:2 * third], rows[2 * third:], sentinel],
        schema, max_buffer=4,
    )
    df = spark.createDataFrame(rows, schema)
    exp = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transitions(df, "conv", "turn", "tool", include_bounds=True).collect()
    }
    assert got == exp


def test_streaming_transitions_bounded_drops_beyond_horizon(spark, tmp_path):
    """A straggler whose order precedes the fold frontier is dropped —
    the result equals batch transitions over the OTHER rows (one-sided:
    nothing already counted is wrong, only the straggler's own
    transitions are lost)."""
    import datetime as dt

    from hyper_spark.operators.temporal import transitions

    base = dt.datetime(2026, 1, 1)
    mk = lambda t: ("c0", base + dt.timedelta(seconds=t), t, f"s{t}")  # noqa: E731
    batch1 = [mk(t) for t in [0, 1, 2, 4, 5, 6, 7]]  # len 7 > 4: folds to tail [6,7], horizon=5
    batch2 = [mk(3), mk(8), mk(9)]  # turn 3 <= horizon: dropped
    sentinel = [("__flush__", base + dt.timedelta(days=30), 0, "x")]
    schema = "conv string, ts timestamp, turn int, tool string"
    got = _run_transitions_stream(
        spark, tmp_path, [batch1, batch2, sentinel], schema, max_buffer=4
    )
    survivors = spark.createDataFrame(batch1 + batch2[1:], schema)
    exp = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transitions(
            survivors, "conv", "turn", "tool", include_bounds=True
        ).collect()
    }
    assert got == exp
    assert ("s2", "s3") not in got and ("s2", "s4") in got


def test_streaming_transitions_bounded_guard(spark):
    import pytest as _pytest

    from hyper_spark.streaming import streaming_transitions

    df = spark.readStream.format("rate").load()
    with _pytest.raises(ValueError, match="max_buffer"):
        streaming_transitions(df, "value", "timestamp", "value", "value", max_buffer=2)
