"""Sorted-neighborhood blocking (operators/snm.py): brute-force
parity, exactly-once pairs across block/partition boundaries, NULL and
tie contracts, guards, plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.snm import sorted_neighborhood_pairs


@pytest.fixture(scope="module")
def records(spark):
    """Keys with ties, NULLs, and enough rows to span several range
    partitions at the test session's 8 shuffle partitions."""
    rows = []
    for i in range(100):
        key = f"k{(i * 7) % 25:03d}"  # 4 ids per key value -> ties
        rows.append(Row(doc_id=i, k=key))
    rows.append(Row(doc_id=100, k=None))
    rows.append(Row(doc_id=101, k=None))
    return spark.createDataFrame(rows, "doc_id long, k string")


def _brute(rows, w):
    order = sorted(
        (r["k"], r["doc_id"]) for r in rows if r["k"] is not None
    )
    out = []
    for i in range(len(order)):
        for j in range(i + 1, min(i + w, len(order))):
            out.append((order[i][1], order[j][1], i, j))
    return sorted(out)


@pytest.mark.parametrize("w", [2, 5, 11])
def test_brute_force_parity(spark, records, w):
    """Every pair within the window, exactly once, with the 0-based
    global ranks as the audit trail."""
    res = sorted_neighborhood_pairs(records, key="k", window=w)
    got = sorted(
        (r["id_a"], r["id_b"], r["rank_a"], r["rank_b"])
        for r in res.collect()
    )
    res.unpersist()
    assert got == _brute(records.collect(), w)


def test_expression_key(spark, records):
    """Column-expression keys work (the normalized-composite-key
    record-linkage shape)."""
    res = sorted_neighborhood_pairs(
        records, key=F.concat(F.col("k"), F.lit("|")), window=3
    )
    got = sorted((r["id_a"], r["id_b"]) for r in res.collect())
    res.unpersist()
    exp = sorted((a, b) for a, b, _, _ in _brute(records.collect(), 3))
    assert got == exp


def test_null_keys_excluded(spark, records):
    res = sorted_neighborhood_pairs(records, key="k", window=5)
    ids = {r["id_a"] for r in res.collect()} | {
        r["id_b"] for r in res.collect()
    }
    res.unpersist()
    assert 100 not in ids and 101 not in ids


def test_guards(spark, records):
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(records, key="k", window=1)


def test_plan_python_free(spark, records):
    res = sorted_neighborhood_pairs(records, key="k", window=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    res.unpersist()
    for marker in (
        "ArrowEvalPython",
        "BatchEvalPython",
        "CartesianProduct",
        "BroadcastNestedLoop",
    ):
        assert marker not in plan
