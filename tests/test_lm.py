"""Bigram stupid-backoff LM (operators/lm.py) vs an independent
Python oracle, plus plan hygiene: broadcast scoring must be map-only
over the corpus (no shuffle join of raw bigram occurrences)."""

from __future__ import annotations

import collections
import math
import re

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.lm import ngram_lm_score, ngram_lm_train, ppl_buckets

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat"),
    (2, "dog"),
    (3, None),
    (4, "the dog ZZZ unseen the cat"),
    (5, "  Punct!! the,cat the cat  "),
    (6, ""),
]


def _toks(t):
    if not t:
        return []
    return [x for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ") if x]


def _oracle(docs, min_count=2, alpha=0.4):
    uni: collections.Counter = collections.Counter()
    bi: collections.Counter = collections.Counter()
    for _, t in docs:
        tt = _toks(t)
        uni.update(tt)
        bi.update(zip(tt, tt[1:]))
    total = sum(uni.values())
    bi = {k: v for k, v in bi.items() if v >= min_count}
    out = {}
    for d, t in docs:
        tt = _toks(t)
        lps = []
        for a, b in zip(tt, tt[1:]):
            if (a, b) in bi:
                lp = math.log10(bi[(a, b)] / uni[a])
            else:
                backoff = (
                    math.log10(uni[b] / total) if b in uni else math.log10(1 / total)
                )
                lp = math.log10(alpha) + backoff
            lps.append(lp)
        out[d] = (len(lps), sum(lps) / len(lps) if lps else None)
    return out


def test_lm_score_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = ngram_lm_train(df, min_count=2)
    rows = ngram_lm_score(df, model, alpha=0.4).orderBy("doc_id").collect()
    exp = _oracle(DOCS)
    assert len(rows) == len(DOCS)
    for r in rows:
        n, avg = exp[r["doc_id"]]
        assert r["n_scored"] == n
        if avg is None:
            assert r["avg_logp"] is None and r["ppl"] is None
        else:
            assert r["avg_logp"] == pytest.approx(avg, abs=1e-12)
            assert r["ppl"] == pytest.approx(10 ** -avg, rel=1e-12)


def test_lm_unpruned_bigrams_and_oov(spark):
    """min_count=1 keeps every bigram; scoring a doc with tokens the
    model never saw exercises the OOV floor."""
    train = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = ngram_lm_train(train, min_count=1)
    novel = [(99, "totally novel wording here")]
    rows = ngram_lm_score(
        spark.createDataFrame(novel, ["doc_id", "text"]), model
    ).collect()
    uni = collections.Counter()
    for _, t in DOCS:
        uni.update(_toks(t))
    total = sum(uni.values())
    # every bigram unseen, every token OOV -> each position scores
    # log10(alpha) + log10(1/total)
    exp = math.log10(0.4) + math.log10(1 / total)
    assert rows[0]["n_scored"] == 3
    assert rows[0]["avg_logp"] == pytest.approx(exp, abs=1e-12)


def test_lm_model_is_parquet_stable(spark, tmp_path):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = ngram_lm_train(df)
    p = str(tmp_path / "lm_model")
    model.write.parquet(p)
    reloaded = spark.read.parquet(p)
    a = ngram_lm_score(df, model).orderBy("doc_id").collect()
    b = ngram_lm_score(df, reloaded).orderBy("doc_id").collect()
    assert a == b


def test_lm_score_plan_is_broadcast_and_shuffle_bounded(spark, sf_correct):
    """With broadcast_model=True the occurrence stream must never hit
    a SortMergeJoin; the only Exchange over corpus-sized data is the
    final per-doc aggregate, and no Python appears in the plan."""
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    model = ngram_lm_train(docs)
    plan = (
        ngram_lm_score(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan


def test_lm_validation_errors(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        ngram_lm_train(df, min_count=0)
    model = ngram_lm_train(df)
    with pytest.raises(ValueError):
        ngram_lm_score(df, model, alpha=0.0)
    with pytest.raises(ValueError):
        ngram_lm_score(df, model.filter(F.col("kind") != "meta"))


def test_ppl_buckets(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    model = ngram_lm_train(df, min_count=1)
    scores = ngram_lm_score(df, model)
    b = ppl_buckets(scores, cuts=(1 / 3, 2 / 3))
    rows = {r["doc_id"]: r["bucket"] for r in b.collect()}
    # unscoreable docs land in tail
    assert rows[2] == "tail" and rows[3] == "tail" and rows[6] == "tail"
    scored = (
        scores.filter(F.col("ppl").isNotNull()).orderBy("ppl").collect()
    )
    # lowest-ppl doc is head, highest is tail (or middle boundary)
    assert rows[scored[0]["doc_id"]] == "head"
    assert {v for v in rows.values()} <= {"head", "middle", "tail"}
    with pytest.raises(ValueError):
        ppl_buckets(scores, cuts=(0.5, 0.5))
