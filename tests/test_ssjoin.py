"""Prefix-filtered exact set-similarity join (operators/ssjoin.py):
parity with the full inverted-index join, brute-force oracle for words
mode, position-filter output invariance, guards, plan hygiene."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.dedup import ngram_jaccard_pairs
from hyper_spark.operators.ssjoin import similarity_join


@pytest.fixture(scope="module")
def corpus(spark):
    """Deterministic corpus with exact dups, near dups, and noise docs
    across a spread of lengths (exercises the length filter)."""
    rows = []
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    for i in range(30):
        ln = 10 + (i * 7) % 25
        base = " ".join(words[(i + j) % 10] for j in range(ln)) + f" doc{i}"
        rows.append(Row(doc_id=i * 10, text=base))
        rows.append(Row(doc_id=i * 10 + 1, text=base.upper() + "!!"))
        near = base.replace(words[i % 10], "zulu") + " tail"
        rows.append(Row(doc_id=i * 10 + 2, text=near))
    return spark.createDataFrame(rows)


def _brute_words(rows, t):
    sets = {}
    for r in rows:
        toks = set(re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).split())
        toks.discard("")
        sets[r["doc_id"]] = toks if toks else {""}
    ids = sorted(sets)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            jac = inter / len(sets[a] | sets[b])
            if jac >= t:
                out.append((a, b, round(jac, 9)))
    return sorted(out)


@pytest.mark.parametrize("t", [0.5, 0.8])
def test_matches_inverted_index(spark, corpus, t):
    """Same pairs AND same jaccard values as the full inverted-index
    join (which indexes every shingle) — the prefix filter is
    recall-lossless."""
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in similarity_join(corpus, threshold=t).collect()
    }
    ref = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, threshold=t, max_df=None).collect()
    }
    assert got == ref and len(got) > 0


def test_words_mode_brute_force(spark, corpus):
    rows = corpus.collect()
    for t in (0.4, 0.9):
        got = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in similarity_join(corpus, threshold=t, tokens="words").collect()
        )
        assert got == _brute_words(rows, t), t


def test_position_filter_output_invariant(spark, corpus):
    a = similarity_join(corpus, threshold=0.6, position_filter=True)
    b = similarity_join(corpus, threshold=0.6, position_filter=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_threshold_one_is_exact_set_dups(spark, corpus):
    got = similarity_join(corpus, threshold=1.0, tokens="words").collect()
    assert got and all(r["jaccard"] == 1.0 for r in got)
    # every (i*10, i*10+1) pair normalizes to the same token set
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert all((i * 10, i * 10 + 1) in pairs for i in range(30))


def test_empty_and_singleton(spark):
    one = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    assert similarity_join(one, threshold=0.5).count() == 0
    empties = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="!!!")]
    )
    got = similarity_join(empties, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in got] == [(1, 2, 1.0)]


def test_guards(spark, corpus):
    with pytest.raises(ValueError, match="threshold"):
        similarity_join(corpus, threshold=0.0)
    with pytest.raises(ValueError, match="tokens"):
        similarity_join(corpus, tokens="chars")


def test_plan_python_free_no_cartesian(spark, corpus):
    plan = (
        similarity_join(corpus, threshold=0.7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in (
        "ArrowEvalPython",
        "BatchEvalPython",
        "CartesianProduct",
        "BroadcastNestedLoop",
    ):
        assert marker not in plan


def _brute_cross(left_rows, right_rows, t):
    def tokset(txt):
        toks = set(re.sub(r"[^a-z0-9]+", " ", txt.lower()).split())
        toks.discard("")
        return toks if toks else {""}

    L = {r["doc_id"]: tokset(r["text"]) for r in left_rows}
    R = {r["eval_id"]: tokset(r["body"]) for r in right_rows}
    out = []
    for a, sa in L.items():
        for b, sb in R.items():
            inter = len(sa & sb)
            jac = inter / len(sa | sb)
            if jac >= t:
                out.append((a, b, round(jac, 9)))
    return sorted(out)


def test_cross_corpus_brute_force(spark, corpus):
    """R-S mode (exact decontamination shape): every qualifying
    cross pair, custom id/text column names on the right side."""
    from pyspark.sql import Row

    right = spark.createDataFrame(
        [
            Row(eval_id=1000 + r["doc_id"], body=r["text"] + " extra words here")
            for r in corpus.collect()
            if r["doc_id"] % 30 == 0
        ]
    )
    got = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in similarity_join(
            corpus,
            threshold=0.5,
            tokens="words",
            other=right,
            other_id_col="eval_id",
            other_text_col="body",
        ).collect()
    )
    assert got == _brute_cross(corpus.collect(), right.collect(), 0.5)
    assert got  # the planted overlaps qualify


def test_cross_of_self_equals_self_join(spark, corpus):
    """cross(df, df) restricted to id_a < id_b must equal the
    self-join; the diagonal comes back at jaccard 1.0."""
    cross = similarity_join(corpus, threshold=0.6, other=corpus).collect()
    diag = [r for r in cross if r["id_a"] == r["id_b"]]
    assert len(diag) == corpus.count()
    assert all(r["jaccard"] == 1.0 for r in diag)
    lower = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in cross
        if r["id_a"] < r["id_b"]
    )
    self_j = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in similarity_join(corpus, threshold=0.6).collect()
    )
    assert lower == self_j
