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
