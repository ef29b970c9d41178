"""Round-6 optimization parity tests: the dense small-vocab fast paths
(ssjoin/cosjoin GEMM screening) and the sparse grouped-array candidate
generation (incl. the hot-token chunk fan-out) must all produce the
SAME pairs and values as each other. The driver gates now exercise the
dense path (tiny-vocab corpora), so the sparse path needs its own
coverage here."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.cosjoin import cosine_similarity_join
from hyper_spark.operators.ssjoin import (
    _candidates_cross,
    _candidates_self,
    similarity_join,
)


@pytest.fixture(scope="module")
def corpus(spark):
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


def _pairs(df, val):
    return {
        (r["id_a"], r["id_b"]): round(r[val], 6) for r in df.collect()
    }


@pytest.mark.parametrize("t", [0.5, 0.8])
def test_ssjoin_dense_matches_sparse(spark, corpus, t):
    dense = similarity_join(corpus, threshold=t)
    sparse = similarity_join(corpus, threshold=t, dense_max_vocab=0)
    assert _pairs(dense, "jaccard") == _pairs(sparse, "jaccard")
    dense.unpersist()
    sparse.unpersist()


def test_ssjoin_cross_dense_matches_sparse(spark, corpus):
    right = corpus.filter(F.col("doc_id") % 3 == 0)
    dense = similarity_join(corpus, threshold=0.5, other=right)
    sparse = similarity_join(
        corpus, threshold=0.5, other=right, dense_max_vocab=0
    )
    assert _pairs(dense, "jaccard") == _pairs(sparse, "jaccard")
    dense.unpersist()
    sparse.unpersist()


def test_ssjoin_dense_bytes_guard_falls_back(spark, corpus):
    """A zero byte budget must reject the dense path and still answer
    through the sparse one."""
    out = similarity_join(corpus, threshold=0.5, dense_max_bytes=0)
    ref = similarity_join(corpus, threshold=0.5, dense_max_vocab=0)
    assert _pairs(out, "jaccard") == _pairs(ref, "jaccard")
    out.unpersist()
    ref.unpersist()


def test_cosjoin_dense_matches_sparse(spark, corpus):
    dense = cosine_similarity_join(corpus, threshold=0.8, tokens="words")
    sparse = cosine_similarity_join(
        corpus, threshold=0.8, tokens="words", dense_max_vocab=0
    )
    assert _pairs(dense, "cosine") == _pairs(sparse, "cosine")
    dense.unpersist()
    sparse.unpersist()


def _entries(spark):
    """Synthetic prefix entries with one hot token (m=40) and several
    cool ones, ids deliberately interleaved across chunks."""
    rows = []
    for i in range(40):
        rows.append(Row(id=i, n=10 + i % 3, pos=1 + i % 5, token="hot"))
    for i in range(12):
        rows.append(Row(id=i * 3, n=10, pos=2, token=f"cool{i % 4}"))
    return spark.createDataFrame(rows)


def _pair_multiset(df):
    return sorted(
        (r["id_a"], r["id_b"], r["n_a"], r["n_b"], r["pa"], r["pb"])
        for r in df.collect()
    )


def test_candidates_self_chunked_parity(spark):
    """hot_min=5 + chunk=7 forces all three hybrid regimes at once
    (cool join for the m=3 tokens, hot arrays + cross-chunk units for
    the m=40 token); the emitted pair multiset must equal the all-cool
    (hot_min high) and the all-array (hot_min=0) forms."""
    ent = _entries(spark)
    big = _pair_multiset(_candidates_self(ent, chunk=1000, hot_min=1000))
    hybrid = _pair_multiset(_candidates_self(ent, chunk=7, hot_min=5))
    arrays = _pair_multiset(_candidates_self(ent, chunk=7, hot_min=0))
    assert hybrid == big
    assert arrays == big
    # sanity: hot token with m=40 contributes 40*39/2 pairs
    assert len(big) == 40 * 39 // 2 + sum(
        k * (k - 1) // 2 for k in (3, 3, 3, 3)
    )


def test_candidates_cross_chunked_parity(spark):
    ent = _entries(spark)
    other = ent.filter(F.col("id") % 2 == 0)
    big = _pair_multiset(_candidates_cross(ent, other, chunk=1000, hot_min=1000))
    hybrid = _pair_multiset(_candidates_cross(ent, other, chunk=7, hot_min=5))
    arrays = _pair_multiset(_candidates_cross(ent, other, chunk=7, hot_min=0))
    assert hybrid == big
    assert arrays == big
