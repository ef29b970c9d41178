"""Deterministic sharded export (operators/export.py): assignment
oracle, one-file-per-shard layout, in-file order, re-run determinism,
NULL-id contract."""

from __future__ import annotations

import glob
import hashlib

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.export import (
    export_shards,
    shard_assignment,
    shard_manifest,
)


def _docs(spark, n=100):
    rows = [(i, f"doc text {i}") for i in range(n)] + [(None, "null id")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shard_assignment_matches_md5_oracle(spark):
    df = _docs(spark)
    rows = shard_assignment(df, 5, seed=7).collect()
    assert len(rows) == 100  # NULL id dropped
    for r in rows:
        h = hashlib.md5(f"{r['doc_id']}:7".encode()).hexdigest()[:8]
        assert r["order_key"] == h
        assert r["shard"] == int(h, 16) % 5
    with pytest.raises(ValueError):
        shard_assignment(df, 0)


def test_export_one_file_per_shard_ordered(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "shards")
    manifest = export_shards(df, path, n_shards=5, seed=3).collect()

    present = sorted(r["shard"] for r in manifest)
    assert set(present) <= set(range(5))
    assert sum(r["n_rows"] for r in manifest) == 100
    assert all(r["n_files"] == 1 for r in manifest)

    for shard in present:
        files = glob.glob(f"{path}/shard={shard}/*.parquet")
        assert len(files) == 1
        t = pq.read_table(files[0])
        keys = t.column("order_key").to_pylist()
        assert keys == sorted(keys)  # deterministic in-shard order
        # shard column lives in the directory, not the file
        assert "shard" not in t.column_names

    # read-back round-trips the payload
    back = spark.read.parquet(path)
    assert sorted(
        (r["doc_id"], r["text"]) for r in back.collect()
    ) == sorted((i, f"doc text {i}") for i in range(100))


def test_export_is_rerun_deterministic(spark, tmp_path):
    """Same input + seed => identical shard contents on a fresh run
    (the resume/retry contract), regardless of input partitioning."""
    df = _docs(spark)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    export_shards(df, a, n_shards=4, seed=1)
    export_shards(df.repartition(13), b, n_shards=4, seed=1)
    for shard_dir in sorted(glob.glob(f"{a}/shard=*")):
        shard = shard_dir.rsplit("=", 1)[1]
        ta = pq.read_table(glob.glob(f"{shard_dir}/*.parquet")[0])
        tb = pq.read_table(glob.glob(f"{b}/shard={shard}/*.parquet")[0])
        assert ta.to_pylist() == tb.to_pylist()


def test_export_columns_subset_and_manifest(spark, tmp_path):
    df = _docs(spark).withColumn("extra", F.lit("x"))
    path = str(tmp_path / "subset")
    export_shards(df, path, n_shards=2, columns=["text"])
    back = spark.read.parquet(path)
    assert set(back.columns) == {"doc_id", "order_key", "text", "shard"}
    m = shard_manifest(spark, path).collect()
    assert sum(r["n_rows"] for r in m) == 100
    for r in m:
        assert r["min_key"] <= r["max_key"]


def test_export_resume_backfills_missing_shards(spark, tmp_path):
    """Kill-and-resume: delete two committed shard dirs, resume, and
    the backfilled shards are byte-identical content to the original
    export; untouched shards are not rewritten."""
    import os
    import shutil

    df = _docs(spark)
    path = str(tmp_path / "resume")
    export_shards(df, path, n_shards=5, seed=3)
    orig = {}
    for d in glob.glob(f"{path}/shard=*"):
        shard = d.rsplit("=", 1)[1]
        orig[shard] = pq.read_table(glob.glob(f"{d}/*.parquet")[0]).to_pylist()

    victims = sorted(orig)[:2]
    survivors = {s: os.path.getmtime(glob.glob(f"{path}/shard={s}/*.parquet")[0])
                 for s in orig if s not in victims}
    for s in victims:
        shutil.rmtree(f"{path}/shard={s}")

    m = export_shards(df, path, n_shards=5, seed=3, resume=True).collect()
    assert sum(r["n_rows"] for r in m) == 100
    for s, rows in orig.items():
        got = pq.read_table(glob.glob(f"{path}/shard={s}/*.parquet")[0]).to_pylist()
        assert got == rows
    # survivors were trusted, not rewritten
    for s, mtime in survivors.items():
        assert os.path.getmtime(glob.glob(f"{path}/shard={s}/*.parquet")[0]) == mtime

    # fully-present resume is a no-op returning the manifest
    m2 = export_shards(df, path, n_shards=5, seed=3, resume=True).collect()
    assert sorted((r["shard"], r["n_rows"]) for r in m2) == sorted(
        (r["shard"], r["n_rows"]) for r in m
    )


def test_export_resume_on_fresh_path(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "fresh")
    m = export_shards(df, path, n_shards=3, resume=True).collect()
    assert sum(r["n_rows"] for r in m) == 100
