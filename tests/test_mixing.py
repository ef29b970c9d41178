"""Corpus mixing (operators/mixing.py): plan arithmetic vs a Python
oracle, md5-exact sample membership, determinism, edge contracts."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.mixing import apply_mixture, mixture_plan


def _corpus(spark):
    rows = []
    for s, n in [("web", 40), ("code", 20), ("books", 10), ("junk", 5)]:
        rows += [(f"{s}-{i}", s, "tok " * (i % 7 + 1)) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_mixture_plan_rows_oracle(spark):
    df = _corpus(spark)
    plan = {
        r["source"]: r
        for r in mixture_plan(
            df, {"web": 2, "code": 1, "books": 1}, by="source"
        ).collect()
    }
    # normalized weights 0.5/0.25/0.25; feasible budget =
    # min(40/.5, 20/.25, 10/.25) = 40
    assert set(plan) == {"web", "code", "books"}  # junk excluded
    assert plan["web"]["weight"] == 0.5
    assert plan["web"]["available"] == 40
    budget = min(40 / 0.5, 20 / 0.25, 10 / 0.25)
    for s, a in [("web", 40), ("code", 20), ("books", 10)]:
        w = plan[s]["weight"]
        assert plan[s]["target"] == w * budget
        assert plan[s]["fraction"] == min(1.0, w * budget / a)
    # books is the binding constraint: fraction exactly 1.0
    assert plan["books"]["fraction"] == 1.0


def test_mixture_plan_tokens_and_explicit_budget(spark):
    df = _corpus(spark)
    tok = {
        r["source"]: r["n"]
        for r in df.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n"))
        .collect()
    }
    plan = {
        r["source"]: r
        for r in mixture_plan(
            df, {"web": 1, "code": 1}, unit="tokens", budget=1e9
        ).collect()
    }
    for s in ("web", "code"):
        assert plan[s]["available"] == tok[s]
        assert plan[s]["fraction"] == 1.0  # infeasible budget caps at 1


def test_mixture_plan_validation(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        mixture_plan(df, {})
    with pytest.raises(ValueError):
        mixture_plan(df, {"web": -1, "code": 2})
    with pytest.raises(ValueError):
        mixture_plan(df, {"web": 1}, unit="bytes")
    with pytest.raises(ValueError):
        mixture_plan(df, {"web": 1, "nosuch": 1})


def test_apply_mixture_md5_exact_membership(spark):
    df = _corpus(spark)
    plan = mixture_plan(df, {"web": 1, "code": 3})
    got = {r["doc_id"] for r in apply_mixture(df, plan, seed=5).collect()}
    fr = {r["source"]: r["fraction"] for r in plan.collect()}
    exp = set()
    for r in df.collect():
        f = fr.get(r["source"])
        if f is None:
            continue
        h = int(hashlib.md5(f"{r['doc_id']}:5".encode()).hexdigest()[:8], 16)
        if f >= 1.0 or h < math.floor(f * 2**32):
            exp.add(r["doc_id"])
    assert got == exp
    # domains outside the plan never leak in
    assert not any(d.startswith(("books", "junk")) for d in got)


def test_apply_mixture_is_partitioning_invariant(spark):
    df = _corpus(spark)
    plan = mixture_plan(df, {"web": 2, "code": 1})
    a = sorted(r["doc_id"] for r in apply_mixture(df, plan).collect())
    b = sorted(
        r["doc_id"] for r in apply_mixture(df.repartition(17), plan).collect()
    )
    assert a == b


def test_apply_mixture_plan_is_broadcast(spark):
    df = _corpus(spark)
    plan = mixture_plan(df, {"web": 1, "code": 1})
    p = (
        apply_mixture(df, plan)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
