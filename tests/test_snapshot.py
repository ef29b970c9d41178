"""merge_upsert / snapshot_diff (operators/snapshot.py): MERGE INTO
semantics and row-level snapshot diffing, hand-verified on small
deterministic tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.snapshot import (
    diff_summary,
    merge_upsert,
    snapshot_diff,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_merge_update_insert_delete(spark):
    target = _df(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
                 "k bigint, s string, v double")
    changes = _df(
        spark,
        [(2, "B", 200.0, False), (4, "d", 40.0, False), (3, "c", 30.0, True)],
        "k bigint, s string, v double, is_del boolean",
    )
    got = sorted(
        tuple(r)
        for r in merge_upsert(target, changes, ["k"], delete_col="is_del").collect()
    )
    assert got == [(1, "a", 10.0), (2, "B", 200.0), (4, "d", 40.0)]


def test_merge_duplicate_changes_need_version(spark):
    target = _df(spark, [(1, 10.0)], "k bigint, v double")
    dup = _df(spark, [(1, 11.0), (1, 12.0)], "k bigint, v double")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(target, dup, ["k"])


def test_merge_versioned_stale_updates_are_noops(spark):
    target = _df(spark, [(1, 10.0, 5), (2, 20.0, 1)], "k bigint, v double, ver int")
    changes = _df(
        spark,
        [
            (1, 99.0, 3, False),   # stale: target ver 5 wins
            (2, 21.0, 2, False),   # fresh: replaces
            (2, 22.0, 4, False),   # fresher duplicate: wins among changes
            (3, 30.0, 1, False),   # insert
        ],
        "k bigint, v double, ver int, is_del boolean",
    )
    got = sorted(
        tuple(r)
        for r in merge_upsert(
            target, changes, ["k"], version_col="ver", delete_col="is_del"
        ).collect()
    )
    assert got == [(1, 10.0, 5), (2, 22.0, 4), (3, 30.0, 1)]
    # a stale delete is also a no-op
    stale_del = _df(spark, [(1, 0.0, 2, True)], "k bigint, v double, ver int, is_del boolean")
    kept = merge_upsert(target, stale_del, ["k"], version_col="ver", delete_col="is_del")
    assert sorted(r["k"] for r in kept.collect()) == [1, 2]


def test_merge_requires_full_rows(spark):
    target = _df(spark, [(1, 10.0)], "k bigint, v double")
    partial = _df(spark, [(1,)], "k bigint")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, partial, ["k"])


def test_snapshot_diff_kinds_and_null_semantics(spark):
    old = _df(
        spark,
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0), (5, 50.0)],
        "k bigint, v double",
    )
    new = _df(
        spark,
        [(1, 10.0), (2, 21.0), (3, None), (4, None), (6, 60.0)],
        "k bigint, v double",
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 unchanged (omitted), 3 NULL==NULL unchanged (omitted)
    assert got == {2: "changed", 4: "changed", 5: "removed", 6: "added"}
    counts = {r["change"]: r["n_rows"] for r in
              diff_summary(snapshot_diff(old, new, ["k"])).collect()}
    assert counts == {"changed": 2, "removed": 1, "added": 1}


def test_snapshot_diff_compare_subset(spark):
    old = _df(spark, [(1, 10.0, "x")], "k bigint, v double, note string")
    new = _df(spark, [(1, 10.0, "y")], "k bigint, v double, note string")
    # full compare sees the note change; v-only compare sees nothing
    assert snapshot_diff(old, new, ["k"]).count() == 1
    assert snapshot_diff(old, new, ["k"], compare_cols=["v"]).count() == 0
    with pytest.raises(ValueError, match="no columns to compare"):
        snapshot_diff(old.select("k"), new.select("k"), ["k"])


def test_merge_then_diff_roundtrip(spark):
    target = _df(spark, [(i, float(i)) for i in range(100)], "k bigint, v double")
    changes = _df(
        spark,
        [(i, float(i) * 2, i % 20 == 0) for i in range(0, 100, 5)]
        + [(100 + i, -1.0, False) for i in range(3)],
        "k bigint, v double, is_del boolean",
    )
    merged = merge_upsert(target, changes, ["k"], delete_col="is_del")
    counts = {r["change"]: r["n_rows"] for r in
              diff_summary(snapshot_diff(target, merged, ["k"])).collect()}
    # 20 change keys: 5 of them (k%20==0) deletes, 15 updates; 3 inserts
    assert counts == {"changed": 15, "removed": 5, "added": 3}
