"""BPE train/encode (operators/bpe.py): hand-computed golden merges,
a differential encoder oracle (apply-merges-in-rank-order formulation
vs the operator's lowest-rank-pair formulation), reconstruction and
convergence properties."""

from __future__ import annotations

import pytest

from hyper_spark.operators.bpe import (
    bpe_encode,
    bpe_merge_list,
    bpe_train,
)

EOW = "</w>"


def _oracle_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent formulation: apply each merge in rank order,
    replacing ALL occurrences before moving to the next merge. For
    BPE this is equivalent to repeatedly merging the lowest-rank
    present pair (the operator's loop)."""
    seq = list(word) + [EOW]
    for a, b in merges:
        i = 0
        while i < len(seq) - 1:
            if seq[i] == a and seq[i + 1] == b:
                seq[i : i + 2] = [a + b]
            else:
                i += 1
    return seq


def test_bpe_golden_tiny_corpus(spark):
    """Corpus 'aa aa ab': merge order is fully hand-derivable,
    including the lexicographic tie-break ('a','</w>') before
    ('a','a') at count 2."""
    df = spark.createDataFrame([(0, "aa aa ab")], ["doc_id", "text"])
    model = bpe_train(df, n_merges=4)
    assert bpe_merge_list(model) == [
        ("a", EOW),
        ("a", "a" + EOW),
        ("a", "b"),
        ("ab", EOW),
    ]
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(
            spark.createDataFrame(
                [(0, "aa"), (1, "ab"), (2, "aab"), (3, None)],
                ["doc_id", "text"],
            ),
            model,
        ).collect()
    }
    assert enc[0] == ["aa" + EOW]
    assert enc[1] == ["ab" + EOW]
    assert enc[2] == ["a", "ab" + EOW]  # unseen word: partial merges
    assert enc[3] is None


def test_bpe_encode_matches_rank_order_oracle(spark, sf_correct):
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet").limit(60)
    model = bpe_train(docs, n_merges=80)
    merges = bpe_merge_list(model)
    rows = bpe_encode(docs, model).select("text", "bpe_tokens").collect()
    import re

    checked = 0
    for r in rows:
        if r["text"] is None:
            continue
        words = [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).strip().split(" ")
            if w
        ]
        exp: list[str] = []
        for w in words:
            exp.extend(_oracle_encode(w, merges))
        assert r["bpe_tokens"] == exp
        checked += 1
    assert checked > 0


def test_bpe_reconstruction_and_convergence(spark):
    text = "the quick brown fox jumps over the lazy dog the end"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    # enough merges: every training word becomes ONE token
    model = bpe_train(df, n_merges=500)
    toks = bpe_encode(df, model).collect()[0]["bpe_tokens"]
    words = text.split()
    assert toks == [w + EOW for w in words]
    # reconstruction: stripping </w> and joining restores the text
    assert " ".join(t[: -len(EOW)] for t in toks) == text
    # empty model edge: n_merges beyond available pairs just stops
    assert len(bpe_merge_list(model)) < 500


def test_bpe_determinism_and_validation(spark):
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3}") for i in range(30)],
        ["doc_id", "text"],
    )
    m1 = bpe_merge_list(bpe_train(df, n_merges=40))
    m2 = bpe_merge_list(bpe_train(df.repartition(7), n_merges=40))
    assert m1 == m2  # partitioning-invariant
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)
    with pytest.raises(ValueError):
        bpe_train(df, max_words=0)


def test_bpe_max_words_cap(spark):
    """Capping the word table trains only on the most frequent words
    (ties to lexicographically smallest) but still encodes any text."""
    df = spark.createDataFrame(
        [(0, "hot hot hot hot cold cold rare")], ["doc_id", "text"]
    )
    model = bpe_train(df, n_merges=50, max_words=1)  # only 'hot'
    merges = bpe_merge_list(model)
    assert all("o" in a + b or "h" in a + b or EOW in a + b for a, b in merges)
    toks = bpe_encode(
        spark.createDataFrame([(0, "cold")], ["doc_id", "text"]), model
    ).collect()[0]["bpe_tokens"]
    assert toks == ["c", "o", "l", "d", EOW]  # no applicable merges


def test_indexed_trainer_matches_naive_oracle():
    """The incremental (heap + pair->word index) merge loop must
    produce byte-identical merge lists to the textbook recount loop,
    including tie-breaks — fuzzed over random word tables."""
    import random

    from hyper_spark.operators.bpe import _train_merges, _train_merges_naive

    for seed in range(12):
        rng = random.Random(seed)
        alphabet = "abcde"
        words = []
        for _ in range(rng.randint(1, 40)):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 8))
            )
            words.append((w, rng.randint(1, 9)))
        # dedupe words keeping the first count (the real word table
        # is grouped, so keys are unique)
        seen = {}
        for w, c in words:
            seen.setdefault(w, c)
        table = sorted(seen.items())
        n = rng.randint(1, 60)
        assert _train_merges(table, n) == _train_merges_naive(table, n), (
            seed,
            n,
            table,
        )
