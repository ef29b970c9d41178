"""DSIR data selection (operators/selection.py) vs pure-python replay."""

import hashlib
import math

import pytest
from pyspark.sql import Row


def _bucket(f: str, buckets: int) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % buckets


def _instances(text: str, buckets: int):
    toks = [t for t in text.strip().lower().split() if t]
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(f, buckets) for f in feats]


def _weights(docs, target_ids, buckets):
    """docs: {id: text}. Returns {id: log_weight}, Laplace-smoothed."""
    q, p = {}, {}
    tq = tp = 0
    inst = {d: _instances(t, buckets) for d, t in docs.items()}
    for d, bs in inst.items():
        for b in bs:
            q[b] = q.get(b, 0) + 1
            tq += 1
            if d in target_ids:
                p[b] = p.get(b, 0) + 1
                tp += 1
    out = {}
    for d, bs in inst.items():
        out[d] = sum(
            math.log((p.get(b, 0) + 1) / (tp + buckets))
            - math.log((q[b] + 1) / (tq + buckets))
            for b in bs
        )
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(60):
        if i % 3 == 0:
            rows.append(Row(doc_id=i, text=f"alpha bravo charlie delta {i}"))
        elif i % 3 == 1:
            rows.append(Row(doc_id=i, text=f"xray yankee zulu {i} {i + 1}"))
        else:
            rows.append(Row(doc_id=i, text="  "))  # empty after trim
    return spark.createDataFrame(rows)


def test_weights_match_python_replay(spark, corpus):
    from hyper_spark.operators.selection import dsir_weights

    target = corpus.filter("doc_id % 3 = 0")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(corpus, target, buckets=256).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in corpus.collect()}
    want = _weights(docs, {i for i in docs if i % 3 == 0}, 256)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d
    # target-like docs score above pool-unlike docs; tokenless score 0
    assert min(got[i] for i in got if i % 3 == 0) > max(
        got[i] for i in got if i % 3 == 1
    )
    assert all(got[i] == 0.0 for i in got if i % 3 == 2)
    # length_normalize = raw weight / feature-instance count
    norm = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(
            corpus, target, buckets=256, length_normalize=True
        ).collect()
    }
    for d, t in docs.items():
        n = len(_instances(t, 256))
        if n:
            assert norm[d] == pytest.approx(want[d] / n, abs=1e-9), d
        else:
            assert norm[d] == 0.0


def test_select_is_gumbel_top_k(spark, corpus):
    from hyper_spark.operators.selection import dsir_select, dsir_weights

    target = corpus.filter("doc_id % 3 = 0")
    k, seed = 10, 7
    got = sorted(
        r["doc_id"]
        for r in dsir_select(corpus, target, k=k, buckets=256, seed=seed).collect()
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(corpus, target, buckets=256).collect()
    }

    def key(d):
        u = (
            int(hashlib.md5(f"{d}:{seed}".encode()).hexdigest()[:8], 16) + 0.5
        ) / 2**32
        return w[d] - math.log(-math.log(u))

    want = sorted(sorted(w, key=lambda d: (-key(d), d))[:k])
    assert got == want
    # selected rows carry the original columns + log_weight
    cols = dsir_select(corpus, target, k=3, buckets=256).columns
    assert set(cols) == {"doc_id", "text", "log_weight"}


def test_guards_and_plan(spark, corpus):
    from hyper_spark.operators.selection import dsir_select, dsir_weights

    target = corpus.limit(5)
    with pytest.raises(ValueError, match="buckets"):
        dsir_weights(corpus, target, buckets=1)
    with pytest.raises(ValueError, match="k must"):
        dsir_select(corpus, target, k=0)
    plan = (
        dsir_weights(corpus, target, buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the log-ratio table rides a broadcast join, not a shuffle join
    assert "BroadcastHashJoin" in plan
