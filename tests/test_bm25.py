"""BM25 lexical retrieval vs a brute-force python oracle."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from hyper_spark.operators.bm25 import (
    bm25_build,
    bm25_score,
    bm25_topk,
    query_tokens,
)


def _norm_tokens(text: str) -> list[str]:
    return [
        t
        for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")
        if t
    ]


def _oracle_scores(docs, query, k1=1.2, b=0.75):
    toks = {i: _norm_tokens(t) for i, t in docs}
    toks = {i: ts for i, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    terms = query_tokens(query)
    df = Counter(t for ts in toks.values() for t in set(ts) if t in terms)
    out = {}
    for i, ts in toks.items():
        tf = Counter(ts)
        s = 0.0
        m = 0
        for t in terms:
            if tf[t] == 0:
                continue
            m += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf[t] / (tf[t] + k1 * (1 - b + b * len(ts) / avgdl))
        if m:
            out[i] = (s, m)
    return out


DOCS = [
    (1, "The quick brown fox jumps over the lazy dog."),
    (2, "A fast auburn fox vaulted a sleepy hound, quick as light!"),
    (3, "Quick quick quick — repetition saturates, not dominates."),
    (4, "Entirely unrelated text about spark shuffles and parquet files."),
    (5, "the the the the the the the the the the"),  # long, common terms
    (6, ""),  # empty: contributes no postings
    (7, "Dog dog? DOG! dog."),
]


def test_bm25_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string").repartition(3)
    query = "quick fox dog"
    got = {
        r["doc_id"]: (r["score"], r["n_terms"])
        for r in bm25_topk(df, query, top_k=None).collect()
    }
    exp = _oracle_scores(DOCS, query)
    assert set(got) == set(exp)
    for i, (s, m) in exp.items():
        assert got[i][1] == m
        assert got[i][0] == pytest.approx(s, rel=1e-12)
    # term saturation: doc 3's triple "quick" must not beat doc 1's
    # quick+fox+dog triple match
    assert got[1][0] > got[3][0]


def test_bm25_postings_reusable_and_deterministic(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    post = bm25_build(df)
    rows = post.collect()
    # doc 6 (empty) absent; dl is the token count of the normalized text
    ids = {r["doc_id"] for r in rows}
    assert 6 not in ids
    dl7 = {r["dl"] for r in rows if r["doc_id"] == 7}
    assert dl7 == {4}
    tf7 = {r["token"]: r["tf"] for r in rows if r["doc_id"] == 7}
    assert tf7 == {"dog": 4}

    top = bm25_score(post, "lazy dog", top_k=2).collect()
    assert [r["doc_id"] for r in top] == sorted(
        [r["doc_id"] for r in top],
        key=lambda i: (-dict((x["doc_id"], x["score"]) for x in top)[i], i),
    )
    assert top[0]["doc_id"] == 1  # only doc with both terms

    with pytest.raises(ValueError):
        bm25_score(post, "?!—")


def test_bm25_build_normalizes_once(spark):
    # the token array is staged in its own projection: the normalize
    # regex must appear exactly once in the optimized plan (Catalyst
    # does not CSE across lambda/projection boundaries if inlined)
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    plan = bm25_build(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_replace") == 1, plan


def test_bm25_consts_path_identical(spark):
    from hyper_spark.operators.bm25 import bm25_consts

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    post = bm25_build(df)
    n, avgdl = bm25_consts(post)
    assert n == 6  # doc 6 (empty) excluded
    inline = bm25_score(post, "quick fox dog", top_k=None).collect()
    precomp = bm25_score(
        post, "quick fox dog", top_k=None, consts=(n, avgdl)
    ).collect()
    assert {(r["doc_id"], r["score"]) for r in inline} == {
        (r["doc_id"], r["score"]) for r in precomp
    }


def test_bm25_prune_min_max_df(spark):
    """Pruning semantics vs the python oracle: a max_df_frac bound
    removes exactly the tokens appearing in more than that fraction of
    docs, min_df removes hapaxes; dl is untouched so surviving-term
    scores are IDENTICAL to the unpruned index's for the same query."""
    from hyper_spark.operators.bm25 import bm25_consts, bm25_prune

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings = bm25_build(df).persist()
    try:
        n_docs, avgdl = bm25_consts(postings)

        # python oracle for surviving vocabulary
        toks = {i: _norm_tokens(t) for i, t in DOCS}
        toks = {i: ts for i, ts in toks.items() if ts}
        from collections import Counter as _C

        dfc = _C(t for ts in toks.values() for t in set(ts))
        keep = {
            t
            for t, c in dfc.items()
            if c >= 2 and c <= 0.4 * len(toks)
        }
        pruned = bm25_prune(postings, min_df=2, max_df_frac=0.4)
        got_vocab = {r["token"] for r in pruned.select("token").distinct().collect()}
        assert got_vocab == keep
        assert "quick" not in keep and "fox" in keep and "dog" in keep

        # dl unchanged: every surviving row carries the original length
        orig_dl = {r["doc_id"]: r["dl"] for r in postings.select("doc_id", "dl").distinct().collect()}
        for r in pruned.select("doc_id", "dl").distinct().collect():
            assert r["dl"] == orig_dl[r["doc_id"]]

        # scoring a query of SURVIVING terms with pre-pruning consts ==
        # scoring the unpruned index (identical rows feed the sum)
        q = "fox dog"
        a = bm25_score(postings, q, consts=(n_docs, avgdl), top_k=None).collect()
        bres = bm25_score(pruned, q, consts=(n_docs, avgdl), top_k=None).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
            (r["doc_id"], round(r["score"], 9)) for r in bres
        ]

        # pruned-out frequent term: no matches at all against the
        # pruned index (it would match 3 docs unpruned)
        assert bm25_score(pruned, "quick", consts=(n_docs, avgdl), top_k=None).count() == 0
        assert bm25_score(postings, "quick", consts=(n_docs, avgdl), top_k=None).count() == 3

        # no bounds = identity (the gate pins this path)
        assert bm25_prune(postings).count() == postings.count()

        with pytest.raises(ValueError):
            bm25_prune(postings, max_df_frac=1.5)
    finally:
        postings.unpersist()
