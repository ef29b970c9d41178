"""File-skipping index (operators/skipping.py): per-file Bloom +
zone-map pruning with exact point-lookup semantics.

Verification: lookups are compared row-for-row against the full-scan
filter (the no-false-negative contract), pruning effectiveness is
asserted on a layout where each key lives in one file, and the
all-NULL-file / empty-probe / mixed-parameter edges are exercised."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.skipping import (
    build_file_index,
    file_candidates,
    point_lookup,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    # 8 hash-partitioned files: every key lives in exactly one file
    path = str(tmp_path_factory.mktemp("skip") / "t")
    df = spark.range(4000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 500).alias("key"),
        F.concat(F.lit("v"), F.col("id")).alias("payload"),
    )
    df.repartition(8, "key").write.parquet(path)
    return path


def _index(spark, path, col="key"):
    return build_file_index(spark.read.parquet(path), col, m_bits=1 << 16)


def test_index_shape(spark, table):
    idx = _index(spark, table).collect()
    assert len(idx) == 8
    assert sum(r["n_rows"] for r in idx) == 4000
    assert all(r["bits"] is not None and r["m_bits"] == 1 << 16 for r in idx)
    lo = min(r["min_value"] for r in idx)
    hi = max(r["max_value"] for r in idx)
    assert (lo, hi) == (0, 499)


def test_point_lookup_exact_and_pruned(spark, table):
    idx = _index(spark, table)
    probes = [7, 123, 499]
    got = sorted(
        (r["rid"], r["key"], r["payload"])
        for r in point_lookup(spark, table, idx, "key", probes).collect()
    )
    want = sorted(
        (r["rid"], r["key"], r["payload"])
        for r in spark.read.parquet(table)
        .filter(F.col("key").isin(probes))
        .collect()
    )
    assert got == want and len(got) == 3 * 8  # 4000/500 rows per key
    # each key lives in one file -> candidates <= 3 of 8 (bloom FPs
    # can only add, and at m/n ~ 26 bits/key they effectively never do)
    n_cand = file_candidates(idx, probes).count()
    assert 1 <= n_cand <= 3


def test_string_column_and_missing_value(spark, table):
    idx = _index(spark, table, col="payload")
    hit = point_lookup(spark, table, idx, "payload", ["v42"]).collect()
    assert [(r["rid"], r["payload"]) for r in hit] == [(42, "v42")]
    # absent value: no false negatives means possibly files read, but
    # the exact filter returns nothing
    assert point_lookup(spark, table, idx, "payload", ["nope"]).count() == 0


def test_all_null_file_is_skippable(spark, tmp_path):
    path = str(tmp_path / "nulls")
    spark.range(100).select(
        F.col("id").alias("rid"), (F.col("id") % 10).alias("key")
    ).coalesce(1).write.parquet(path)
    spark.range(50).select(
        F.col("id").alias("rid"), F.lit(None).cast("long").alias("key")
    ).coalesce(1).write.mode("append").parquet(path)
    idx = build_file_index(spark.read.parquet(path), "key", m_bits=1 << 16)
    rows = idx.collect()
    assert len(rows) == 2
    assert any(r["bits"] is None for r in rows)  # the all-NULL file
    cand = file_candidates(idx, [3]).collect()
    assert len(cand) == 1 and cand[0]["bits"] is not None
    got = point_lookup(spark, path, idx, "key", [3]).count()
    assert got == 10


def test_empty_probe_and_mixed_params(spark, table):
    idx = _index(spark, table)
    assert file_candidates(idx, []).count() == 0
    assert file_candidates(idx, [None]).count() == 0
    assert point_lookup(spark, table, idx, "key", []).count() == 0
    mixed = idx.union(
        build_file_index(spark.read.parquet(table), "key", m_bits=1 << 15)
    )
    with pytest.raises(ValueError, match="mixes bloom parameters"):
        file_candidates(mixed, [7]).count()


def test_index_persists(spark, table, tmp_path):
    idx_path = str(tmp_path / "idx")
    _index(spark, table).write.parquet(idx_path)
    reloaded = spark.read.parquet(idx_path)
    probes = [11, 250]
    a = sorted(
        r["rid"] for r in point_lookup(spark, table, reloaded, "key", probes).collect()
    )
    b = sorted(
        r["rid"]
        for r in spark.read.parquet(table).filter(F.col("key").isin(probes)).collect()
    )
    assert a == b


# ------------------------------------------------------------- z-order


from hyper_spark.operators.skipping import (  # noqa: E402
    build_zone_maps,
    range_scan,
    save_zordered,
    zone_candidates,
)


@pytest.fixture(scope="module")
def grid(spark):
    # 100x100 uniform grid, shuffled-ish ordering via a hash sort so
    # the input has no accidental locality
    return (
        spark.range(10_000)
        .select(
            F.col("id").alias("rid"),
            (F.col("id") % 100).cast("double").alias("x"),
            (F.col("id") / 100).cast("long").cast("double").alias("y"),
        )
        .orderBy(F.xxhash64("id"))
    )


def test_zorder_range_scan_exact(spark, grid, tmp_path):
    path = str(tmp_path / "z")
    save_zordered(grid, path, ["x", "y"], n_files=16)
    zm = build_zone_maps(spark.read.parquet(path), ["x", "y"])
    preds = {"x": (10.0, 19.0), "y": (30.0, 39.0)}
    got = sorted(
        r["rid"] for r in range_scan(spark, path, zm, preds).collect()
    )
    want = sorted(
        r["rid"]
        for r in grid.filter(
            F.col("x").between(10.0, 19.0) & F.col("y").between(30.0, 39.0)
        ).collect()
    )
    assert got == want and len(got) == 100


def test_zorder_prunes_both_dims(spark, grid, tmp_path):
    zpath = str(tmp_path / "zz")
    lpath = str(tmp_path / "lin")
    save_zordered(grid, zpath, ["x", "y"], n_files=16)
    # linear layout: range-partitioned on x only
    grid.repartitionByRange(16, "x").write.parquet(lpath)
    zzm = build_zone_maps(spark.read.parquet(zpath), ["x", "y"])
    lzm = build_zone_maps(spark.read.parquet(lpath), ["x", "y"])
    n_z_files = zzm.count()
    # predicate on y ONLY: the x-sorted layout can't prune at all; the
    # z-curve keeps y clustered too and must drop at least half
    preds = {"y": (0.0, 9.0)}
    assert zone_candidates(lzm, preds).count() == lzm.count()
    assert zone_candidates(zzm, preds).count() <= n_z_files // 2
    # and the scan is still exact
    got = range_scan(spark, zpath, zzm, preds).count()
    assert got == grid.filter(F.col("y").between(0.0, 9.0)).count() == 1000


def test_zorder_open_bounds_and_nulls(spark, tmp_path):
    path = str(tmp_path / "zn")
    df = spark.range(1000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise((F.col("id") % 50).cast("double"))
        .alias("x"),
        (F.col("id") % 7).cast("double").alias("y"),
    )
    save_zordered(df, path, ["x", "y"], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 1000  # NULL-dim rows are written, not lost
    zm = build_zone_maps(back, ["x", "y"])
    got = range_scan(spark, path, zm, {"x": (40.0, None)}).count()
    assert got == df.filter(F.col("x") >= 40.0).count()
    got2 = range_scan(spark, path, zm, {"x": (None, 5.0), "y": (2.0, 2.0)}).count()
    assert got2 == df.filter((F.col("x") <= 5.0) & (F.col("y") == 2.0)).count()


def test_zorder_rejects_strings_and_constant_dim(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("rid"),
        F.lit("s").alias("s"),
        F.lit(1.0).alias("c"),
        (F.col("id") % 10).cast("double").alias("x"),
    )
    with pytest.raises(ValueError, match="non-numeric"):
        save_zordered(df, str(tmp_path / "bad"), ["s", "x"])
    # constant dim contributes nothing but must not break the write
    path = str(tmp_path / "const")
    save_zordered(df, path, ["c", "x"], n_files=4)
    assert spark.read.parquet(path).count() == 100


# ------------------------------------------------- incremental index


from hyper_spark.operators.skipping import update_file_index  # noqa: E402


def test_update_file_index_incremental(spark, tmp_path):
    path = str(tmp_path / "inc")
    spark.range(1000).select(
        F.col("id").alias("rid"), (F.col("id") % 100).alias("key")
    ).repartition(4, "key").write.parquet(path)
    idx0 = build_file_index(spark.read.parquet(path), "key", m_bits=1 << 16)
    rows0 = {r["file"]: bytes(r["bits"]) for r in idx0.collect()}
    assert all(r["column"] == "key" for r in idx0.collect())

    # append new keys in new files
    spark.range(1000, 1500).select(
        F.col("id").alias("rid"), (F.col("id") % 100 + 1000).alias("key")
    ).repartition(2, "key").write.mode("append").parquet(path)
    idx1 = update_file_index(idx0, spark.read.parquet(path))
    rows1 = {r["file"]: bytes(r["bits"]) for r in idx1.collect()}
    assert len(rows1) == len(spark.read.parquet(path).inputFiles())
    # surviving files keep their EXACT old rows (no rescan, no drift)
    for f, b in rows0.items():
        assert rows1[f] == b
    # lookups stay exact across old and new keys
    for probe in [7, 1042]:
        got = sorted(
            r["rid"]
            for r in point_lookup(spark, path, idx1, "key", [probe]).collect()
        )
        want = sorted(
            r["rid"]
            for r in spark.read.parquet(path)
            .filter(F.col("key") == probe)
            .collect()
        )
        assert got == want and got
    # idempotent when nothing changed
    idx2 = update_file_index(idx1, spark.read.parquet(path))
    assert idx2.count() == idx1.count()


def test_update_file_index_drops_vanished(spark, tmp_path):
    import os
    import glob

    path = str(tmp_path / "van")
    spark.range(400).select(
        F.col("id").alias("rid"), (F.col("id") % 20).alias("key")
    ).repartition(4, "key").write.parquet(path)
    # persist the index (real usage) so it outlives the deleted file
    idx_path = str(tmp_path / "van_idx")
    build_file_index(
        spark.read.parquet(path), "key", m_bits=1 << 16
    ).write.parquet(idx_path)
    idx0 = spark.read.parquet(idx_path)
    n0 = idx0.count()
    victim = sorted(glob.glob(os.path.join(path, "part-*.parquet")))[0]
    os.remove(victim)
    idx1 = update_file_index(idx0, spark.read.parquet(path))
    assert idx1.count() == n0 - 1
    assert victim not in {r["file"].replace("file://", "").replace("file:", "")
                          for r in idx1.select("file").collect()}


# ------------------------------------------------------------ compaction


from hyper_spark.operators.skipping import (  # noqa: E402
    compact_files,
    plan_compaction,
)


def test_plan_compaction_bin_packs_small_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    # 10 tiny files of 100 rows each + 1 big file of 5000
    for i in range(10):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("rid"), F.lit(i).alias("b")
        ).coalesce(1).write.mode("append").parquet(path)
    spark.range(1000, 6000).select(
        F.col("id").alias("rid"), F.lit(99).alias("b")
    ).coalesce(1).write.mode("append").parquet(path)
    zm = build_zone_maps(spark.read.parquet(path), ["rid"])
    plan = plan_compaction(zm, target_rows=500)
    # 10 small files of ~100 rows -> groups of <=5 files each; the big
    # file must appear in no group
    packed = [f for g in plan for f in g]
    assert len(packed) == len(set(packed)) == 10
    assert all(2 <= len(g) <= 5 for g in plan)
    big = zm.orderBy(F.desc("n_rows")).first()["file"]
    assert big not in packed
    # deterministic: same input -> same plan
    assert plan == plan_compaction(zm, target_rows=500)


def test_compact_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag2")
    for i in range(8):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("rid"), F.lit(i).alias("b")
        ).coalesce(1).write.mode("append").parquet(path)
    zm = build_zone_maps(spark.read.parquet(path), ["rid"])
    plan = plan_compaction(zm, target_rows=400)
    dest = str(tmp_path / "compacted")
    manifest = compact_files(spark, plan, dest)
    assert manifest.count() == sum(len(g) for g in plan)
    # rows of the rewritten groups survive exactly
    got = sorted(r["rid"] for r in spark.read.parquet(dest).collect())
    want = sorted(
        r["rid"] for r in spark.read.parquet(*[f for g in plan for f in g]).collect()
    )
    assert got == want
    # each group produced exactly one data file
    import glob
    import os

    for gid in range(len(plan)):
        files = glob.glob(os.path.join(dest, f"group={gid}", "part-*.parquet"))
        assert len(files) == 1
    with pytest.raises(ValueError, match="empty compaction plan"):
        compact_files(spark, [], dest)
