"""Exact sparse TF-IDF cosine join (operators/cosjoin.py): brute-force
python oracle parity, zero-norm exclusion, shingles mode, guards, plan
hygiene."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import Row

from hyper_spark.operators.cosjoin import cosine_similarity_join


def _norm_text(s: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", s.lower())).strip()


def _tfidf_vecs(rows, tokens="words", shingle_n=5):
    tf = {}
    for r in rows:
        if r["text"] is None:
            continue
        norm = _norm_text(r["text"])
        if tokens == "words":
            toks = [t for t in norm.split(" ") if t]
        else:
            toks = [
                norm[i : i + shingle_n]
                for i in range(max(len(norm) - shingle_n + 1, 0))
            ]
        if toks:
            tf[r["doc_id"]] = Counter(toks)
    n = len(tf)
    df = Counter()
    for c in tf.values():
        for tok in c:
            df[tok] += 1
    vecs = {}
    for did, c in tf.items():
        w = {tok: cnt * math.log(n / df[tok]) for tok, cnt in c.items()}
        nrm = math.sqrt(sum(v * v for v in w.values()))
        if nrm > 0:
            vecs[did] = {tok: v / nrm for tok, v in w.items()}
    return vecs


def _brute(rows, t, tokens="words", shingle_n=5):
    vecs = _tfidf_vecs(rows, tokens, shingle_n)
    ids = sorted(vecs)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            dot = sum(va[k] * vb.get(k, 0.0) for k in va)
            if dot >= t:
                out.append((a, b, round(dot, 6)))
    return sorted(out)


@pytest.fixture(scope="module")
def corpus(spark):
    """Shared-template docs with varying discriminative tails, exact
    dups, an all-ubiquitous-tokens doc (zero norm), and a NULL."""
    rows = []
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    i = 0
    for k in range(25):
        tail = " ".join(words[(k + j) % 10] for j in range(1 + k % 6))
        base = f"common template header {tail} tag{k % 7}"
        rows.append(Row(doc_id=i, text=base)); i += 1
        if k % 5 == 0:
            rows.append(Row(doc_id=i, text=base)); i += 1  # exact dup
        if k % 4 == 0:
            rows.append(Row(doc_id=i, text=base + " extra zulu")); i += 1
    rows.append(Row(doc_id=i, text="common template header")); i += 1
    rows.append(Row(doc_id=i, text=None)); i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("t", [0.5, 0.8, 0.99])
def test_brute_force_parity_words(spark, corpus, t):
    got = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in cosine_similarity_join(
            corpus, threshold=t, tokens="words"
        ).collect()
    )
    assert got == _brute(corpus.collect(), t, "words")


def test_brute_force_parity_shingles(spark, corpus):
    got = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in cosine_similarity_join(
            corpus, threshold=0.7, tokens="shingles", shingle_n=4
        ).collect()
    )
    assert got == _brute(corpus.collect(), 0.7, "shingles", 4)


def test_zero_norm_docs_excluded(spark):
    """A corpus where one token appears in EVERY doc: the doc made
    only of that token has zero tf-idf norm and must vanish, while
    the others still pair on their discriminative terms."""
    rows = [
        Row(doc_id=0, text="ubiq rare1 rare1"),
        Row(doc_id=1, text="ubiq rare1 rare1"),
        Row(doc_id=2, text="ubiq other"),
        Row(doc_id=3, text="ubiq"),  # zero norm
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in cosine_similarity_join(df, threshold=0.5).collect()
    )
    assert got == [(0, 1)]  # exact dup on the rare term; doc 3 gone


def test_guards(spark, corpus):
    with pytest.raises(ValueError, match="threshold"):
        cosine_similarity_join(corpus, threshold=0.0)
    with pytest.raises(ValueError, match="tokens"):
        cosine_similarity_join(corpus, tokens="chars")


def test_plan_python_free(spark, corpus):
    res = cosine_similarity_join(corpus, threshold=0.8)
    plan = res._jdf.queryExecution().executedPlan().toString()
    res.unpersist()
    for marker in (
        "ArrowEvalPython",
        "BatchEvalPython",
        "CartesianProduct",
        "BroadcastNestedLoop",
    ):
        assert marker not in plan
