"""q-gram prefix-filtered exact edit-distance join (operators/
editjoin.py): brute-force DP oracle parity, short-string pool, cross
mode, d=0 exact dups, guards, plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.editjoin import (
    banded_token_lev,
    edit_distance_join,
    token_edit_distance_join,
)


def _lev(a: str, b: str) -> int:
    """Plain DP Levenshtein — the independent python oracle."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(rows, d, id_key="doc_id", text_key="text"):
    items = sorted(
        (r[id_key], r[text_key]) for r in rows if r[text_key] is not None
    )
    out = []
    for i, (ia, sa) in enumerate(items):
        for ib, sb in items[i + 1 :]:
            if abs(len(sa) - len(sb)) <= d:
                dist = _lev(sa, sb)
                if dist <= d:
                    out.append((ia, ib, dist))
    return sorted(out)


@pytest.fixture(scope="module")
def corpus(spark):
    """Typo clusters, exact dups, short strings (below q and inside
    the short pool), an empty string, a NULL, and length spread."""
    rows = []
    bases = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "how vexingly quick daft zebras jump",
    ]
    i = 0
    for b in bases:
        rows.append(Row(doc_id=i, text=b)); i += 1
        rows.append(Row(doc_id=i, text=b)); i += 1  # exact dup
        rows.append(Row(doc_id=i, text=b.replace("o", "0", 1))); i += 1
        rows.append(Row(doc_id=i, text=b[:-1] + "!?")); i += 1
        rows.append(Row(doc_id=i, text="x" + b)); i += 1
    for s in ["", "a", "ab", "abc", "abd", "ba", "cab", "abcd", "zzzz"]:
        rows.append(Row(doc_id=i, text=s)); i += 1
    rows.append(Row(doc_id=i, text=None)); i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("d,q", [(1, 2), (2, 2), (3, 3)])
def test_brute_force_parity(spark, corpus, d, q):
    """Every pair at distance <= d, with the exact distance value —
    against an independent python DP oracle."""
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(corpus, max_dist=d, q=q).collect()
    )
    assert got == _brute(corpus.collect(), d)


def test_d0_is_exact_dup_pairs(spark, corpus):
    """max_dist=0 degenerates to exact-duplicate pairing."""
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(corpus, max_dist=0).collect()
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in corpus.collect()
        if r["text"] is not None
    }
    exp = sorted(
        (a, b, 0)
        for a in texts
        for b in texts
        if a < b and texts[a] == texts[b]
    )
    assert got == exp


def test_short_pool_only_strings(spark):
    """Corpus entirely below the gram-count guarantee (len <= q*d+q-1)
    — the length-band pool must carry the whole join."""
    rows = [Row(doc_id=i, text=s) for i, s in enumerate(
        ["", "a", "b", "ab", "ba", "abc", "acb", "abcd", "wxyz"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, max_dist=2, q=2).collect()
    )
    assert got == _brute(rows, 2)


def test_cross_mode_brute_parity(spark, corpus):
    """R-S mode with renamed columns: every cross pair, including the
    dist-0 diagonal for docs present in both corpora."""
    right_rows = [
        Row(eval_id=r["doc_id"] + 1000, body=r["text"])
        for r in corpus.collect()
        if r["doc_id"] % 3 == 0
    ]
    right = spark.createDataFrame(right_rows, "eval_id long, body string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(
            corpus,
            max_dist=2,
            other=right,
            other_id_col="eval_id",
            other_text_col="body",
        ).collect()
    )
    L = {r["doc_id"]: r["text"] for r in corpus.collect()
         if r["text"] is not None}
    R = {r["eval_id"]: r["body"] for r in right_rows
         if r["body"] is not None}
    exp = sorted(
        (ia, ib, _lev(sa, sb))
        for ia, sa in L.items()
        for ib, sb in R.items()
        if abs(len(sa) - len(sb)) <= 2 and _lev(sa, sb) <= 2
    )
    assert got == exp


def test_guards(spark, corpus):
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(corpus, max_dist=-1)
    with pytest.raises(ValueError, match="q must"):
        edit_distance_join(corpus, q=0)


def test_plan_python_free_no_cartesian(spark, corpus):
    plan = (
        edit_distance_join(corpus, max_dist=2)
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


# ----------------------------------------------------------- token mode


def test_banded_lev_matches_dp():
    """Ukkonen band vs the plain DP across random-ish token seqs and
    every dmax regime (inside, boundary, outside)."""
    seqs = [
        [],
        ["a"],
        ["a", "b", "c"],
        ["a", "c", "b"],
        ["a", "b", "c", "d", "e"],
        ["a", "b", "x", "d", "e"],
        ["x", "a", "b", "c", "d", "e"],
        ["a", "b"] * 6,
        ["b", "a"] * 6,
        ["t1", "t2", "t3", "t1", "t2"],
    ]
    for x in seqs:
        for y in seqs:
            true = _lev(x, y)
            for dmax in (0, 1, 2, 3, 5, 12):
                got = banded_token_lev(x, y, dmax)
                assert got == (true if true <= dmax else -1), (x, y, dmax)


@pytest.fixture(scope="module")
def token_corpus(spark):
    """Turn-path-shaped sequences: templated bases, single-edit
    variants, short sequences (below and at d), and empties."""
    rows = []
    base = ["u:-", "a:search", "t:result", "a:code", "t:ok", "a:-"]
    i = 0
    for rep in range(4):
        seq = base * (rep + 1)
        rows.append(Row(doc_id=i, toks=seq)); i += 1
        rows.append(Row(doc_id=i, toks=seq)); i += 1  # exact dup
        rows.append(Row(doc_id=i, toks=seq[:-1])); i += 1  # 1 deletion
        sub = list(seq); sub[2] = "t:error"
        rows.append(Row(doc_id=i, toks=sub)); i += 1  # 1 substitution
        rows.append(Row(doc_id=i, toks=["x:boot"] + seq)); i += 1
    for s in ([], ["a:-"], ["a:-", "t:ok"], ["t:ok"], ["z:zz"]):
        rows.append(Row(doc_id=i, toks=s)); i += 1
    rows.append(Row(doc_id=i, toks=None)); i += 1
    return spark.createDataFrame(
        rows, "doc_id long, toks array<string>"
    )


def _brute_tokens(rows, d):
    items = sorted(
        (r["doc_id"], tuple(r["toks"]))
        for r in rows
        if r["toks"] is not None
    )
    out = []
    for i, (ia, sa) in enumerate(items):
        for ib, sb in items[i + 1 :]:
            if abs(len(sa) - len(sb)) <= d:
                dist = _lev(sa, sb)
                if dist <= d:
                    out.append((ia, ib, dist))
    return sorted(out)


@pytest.mark.parametrize("d,q", [(0, 1), (1, 1), (2, 1), (1, 2), (2, 3)])
def test_token_brute_force_parity(spark, token_corpus, d, q):
    """Output is q-invariant (recall-lossless at any gram width) and
    matches the brute-force DP at every (d, q)."""
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in token_edit_distance_join(
            token_corpus, tokens_col="toks", max_dist=d, q=q
        ).collect()
    )
    assert got == _brute_tokens(token_corpus.collect(), d)


def test_token_cross_mode(spark, token_corpus):
    right_rows = [
        Row(rid=r["doc_id"] + 500, seq=r["toks"])
        for r in token_corpus.collect()
        if r["doc_id"] % 2 == 0
    ]
    right = spark.createDataFrame(
        right_rows, "rid long, seq array<string>"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in token_edit_distance_join(
            token_corpus,
            tokens_col="toks",
            max_dist=1,
            other=right,
            other_id_col="rid",
            other_tokens_col="seq",
        ).collect()
    )
    L = {
        r["doc_id"]: tuple(r["toks"])
        for r in token_corpus.collect()
        if r["toks"] is not None
    }
    R = {r["rid"]: tuple(r["seq"]) for r in right_rows
         if r["seq"] is not None}
    exp = sorted(
        (ia, ib, _lev(sa, sb))
        for ia, sa in L.items()
        for ib, sb in R.items()
        if abs(len(sa) - len(sb)) <= 1 and _lev(sa, sb) <= 1
    )
    assert got == exp


def test_token_matches_char_join_on_char_arrays(spark, corpus):
    """Splitting strings into char arrays makes the token join compute
    the char join exactly — cross-implementation parity."""
    chars = corpus.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split(F.col("text"), "").alias("toks")
    ).withColumn(
        "toks", F.filter(F.col("toks"), lambda c: c != F.lit(""))
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in token_edit_distance_join(
            chars, tokens_col="toks", max_dist=2
        ).collect()
    )
    ref = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(corpus, max_dist=2).collect()
    )
    assert got == ref


def test_token_plan_single_arrow_stage(spark, token_corpus):
    """The ONE python stage is the Arrow-batched banded-DP verifier —
    and it runs AFTER candidate dedup (its child contains the pair
    aggregate), so candidate volume never crosses into python. No
    row-at-a-time python, no cartesian. (The persisted result renders
    the stage repeatedly inside InMemoryRelation, so this asserts
    presence + ordering, not a string count.)"""
    plan = (
        token_edit_distance_join(token_corpus, tokens_col="toks", max_dist=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    first_arrow = plan.index("ArrowEvalPython")
    # a pair-dedup HashAggregate appears BELOW the arrow stage (later
    # in the tree rendering = upstream of it)
    assert "HashAggregate" in plan[first_arrow:]
    for marker in ("BatchEvalPython", "CartesianProduct", "BroadcastNestedLoop"):
        assert marker not in plan
