"""Frequent gapped-subsequence mining: brute-force parity, gap
constraint, Apriori monotonicity, guards, plan purity."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import Row

from hyper_spark.operators.seqmine import frequent_sequences


def _brute(seqs: dict, min_support: int, max_len: int, max_gap=None):
    """Enumerate every gapped subsequence up to max_len with support
    counted greedily-matchable (== exists) semantics."""

    def contains(seq, pat):
        # greedy subsequence match with optional gap bound on positions
        pos = -1
        for x in pat:
            nxt = None
            for i in range(pos + 1, len(seq)):
                if max_gap is not None and pos >= 0 and i - pos > max_gap:
                    break
                if seq[i] == x:
                    nxt = i
                    break
            if nxt is None:
                return False
            pos = nxt
        return True

    # candidate patterns: all orderings that appear in at least one
    # sequence (enumerate per-seq index subsets — fine at test size)
    cands = set()
    for seq in seqs.values():
        for ln in range(1, max_len + 1):
            for idxs in combinations(range(len(seq)), ln):
                ok = max_gap is None or all(
                    b - a <= max_gap for a, b in zip(idxs, idxs[1:])
                )
                if ok:
                    cands.add(tuple(seq[i] for i in idxs))
    out = {}
    for pat in cands:
        sup = sum(1 for seq in seqs.values() if contains(seq, pat))
        if sup >= min_support:
            out["→".join(pat)] = (len(pat), sup)
    return out


def _df(spark, seqs: dict):
    rows = [
        Row(conv=cid, idx=i, tool=t)
        for cid, seq in seqs.items()
        for i, t in enumerate(seq)
    ]
    return spark.createDataFrame(rows)


SEQS = {
    "c1": ["a", "x", "b", "x", "c"],
    "c2": ["a", "b", "c"],
    "c3": ["b", "a", "c", "b"],
    "c4": ["a", "x", "x", "b"],
    "c5": ["c", "b", "a"],
    "c6": ["a", "b", "x", "c", "a"],
}


@pytest.mark.parametrize("minsup,maxlen", [(2, 3), (3, 2), (2, 4)])
def test_matches_bruteforce(spark, minsup, maxlen):
    got = {
        r["pattern"]: (r["length"], r["support"])
        for r in frequent_sequences(
            _df(spark, SEQS), "idx", "tool", ["conv"],
            min_support=minsup, max_len=maxlen,
        ).collect()
    }
    assert got == _brute(SEQS, minsup, maxlen)


def test_gap_constraint_matches_bruteforce(spark):
    got = {
        r["pattern"]: (r["length"], r["support"])
        for r in frequent_sequences(
            _df(spark, SEQS), "idx", "tool", ["conv"],
            min_support=2, max_len=3, max_gap=1,
        ).collect()
    }
    ref = _brute(SEQS, 2, 3, max_gap=1)
    assert got == ref
    # gap=1 means contiguous: 'a→b' supported only where adjacent
    # (c2 and c6; c1/c4 have chatter between, c3's a→b gap is 2, c5 reversed)
    assert got["a→b"] == (2, 2)
    # gapped a→…→c present unconstrained but a 2-gap chain dies here
    unbounded = _brute(SEQS, 2, 3)
    assert set(got) <= set(unbounded)


def test_apriori_monotone_and_prefix_closed(spark):
    out = frequent_sequences(
        _df(spark, SEQS), "idx", "tool", ["conv"], min_support=2, max_len=4
    ).collect()
    sup = {r["pattern"]: r["support"] for r in out}
    for p, s in sup.items():
        parts = p.split("→")
        if len(parts) > 1:
            prefix = "→".join(parts[:-1])
            assert prefix in sup and sup[prefix] >= s


def test_guards_and_plan(spark):
    df = _df(spark, SEQS)
    with pytest.raises(ValueError):
        frequent_sequences(df, "idx", "tool", ["conv"], min_support=0)
    with pytest.raises(ValueError):
        frequent_sequences(df, "idx", "tool", [], min_support=2)
    plan = frequent_sequences(
        df, "idx", "tool", ["conv"], min_support=2, max_len=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
