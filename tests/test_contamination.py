"""ngram_overlap / overlap_summary vs pure-python replay."""

import pytest
from pyspark.sql import Row


def _grams(text, n):
    toks = [t for t in text.strip().lower().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def corpora(spark):
    train = [
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="pack my box with five dozen liquor jugs"),
        Row(doc_id=2, text="sphinx of black quartz judge my vow"),
    ]
    evals = [
        Row(doc_id=10, text="The quick brown fox jumps high"),  # partial
        Row(doc_id=11, text="pack my box with five dozen liquor jugs"),  # full
        Row(doc_id=12, text="completely novel words here only"),  # none
        Row(doc_id=13, text="too short"),  # < n tokens
    ]
    return spark.createDataFrame(train), spark.createDataFrame(evals)


def test_overlap_matches_python(spark, corpora):
    from hyper_spark.operators.contamination import ngram_overlap

    train, evals = corpora
    n = 3
    got = {
        r["doc_id"]: (r["n_grams"], r["n_overlap"], r["overlap_frac"])
        for r in ngram_overlap(train, evals, n=n).collect()
    }
    tr_grams = set()
    for r in train.collect():
        tr_grams |= _grams(r["text"], n)
    for r in evals.collect():
        g = _grams(r["text"], n)
        hit = len(g & tr_grams)
        want = (len(g), hit, hit / len(g) if g else None)
        assert got[r["doc_id"]] == pytest.approx(want), r["doc_id"]
    assert got[11][2] == 1.0 and got[12][2] == 0.0 and got[13][2] is None


def test_overlap_shuffle_fallback_matches(spark, corpora):
    from hyper_spark.operators.contamination import ngram_overlap

    train, evals = corpora
    a = sorted(ngram_overlap(train, evals, n=2).collect())
    b = sorted(
        ngram_overlap(train, evals, n=2, broadcast_grams=False).collect()
    )
    assert a == b


def test_summary_counts_thresholds(spark, corpora):
    from hyper_spark.operators.contamination import (
        ngram_overlap,
        overlap_summary,
    )

    train, evals = corpora
    ov = ngram_overlap(train, evals, n=3)
    rows = {
        r["threshold"]: r
        for r in overlap_summary(ov, thresholds=(0.5, 1.0)).collect()
    }
    # doc 11 fully overlaps; doc 10 partially (4/4 of its first grams?)
    fr = {r["doc_id"]: r["overlap_frac"] for r in ov.collect()}
    for t, r in rows.items():
        want = sum(1 for v in fr.values() if v is not None and v >= t)
        assert r["n_contaminated"] == want, t
        assert r["n_docs"] == 4
        assert r["contaminated_frac"] == pytest.approx(want / 4)


def test_guards_and_plan(spark, corpora):
    from hyper_spark.operators.contamination import (
        ngram_overlap,
        overlap_summary,
    )

    train, evals = corpora
    with pytest.raises(ValueError, match="n must"):
        ngram_overlap(train, evals, n=0)
    with pytest.raises(ValueError, match="thresholds"):
        overlap_summary(ngram_overlap(train, evals), thresholds=())
    plan = (
        ngram_overlap(train, evals, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # train grams never shuffle
