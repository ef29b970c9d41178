"""Gopher-style repetition metrics (operators/quality.py) vs an
independent pure-Python oracle."""

from __future__ import annotations

import random
from collections import Counter

from hyper_spark.operators.quality import repetition_stats


def py_oracle(text, ns=(2, 3, 4)):
    t = (text or "").strip()
    lines = [ln.strip() for ln in t.split("\n")]
    lines = [ln for ln in lines if ln != ""]
    toks = t.split() if t else []
    lc = Counter(lines)
    dup_n = sum(c - 1 for c in lc.values())
    dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
    tot_chars = sum(len(ln) for ln in lines)
    out = dict(
        n_lines=len(lines),
        n_tokens=len(toks),
        dup_line_frac=dup_n / len(lines) if lines else 0.0,
        dup_line_char_frac=dup_chars / tot_chars if tot_chars else 0.0,
    )
    ttl = len(" ".join(toks))
    for n in ns:
        grams = (
            [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if len(toks) >= n
            else []
        )
        if grams:
            c = Counter(grams)
            m = max(c.values())
            best = min(g for g, v in c.items() if v == m)
            frac = m * len(best) / ttl if ttl else 0.0
        else:
            frac = 0.0
        out[f"top_{n}gram_char_frac"] = frac
    return out


CRAFTED = [
    "a b a b a b c",                                     # overlapping top grams
    "line one\nline one\nline two\n\n  line one  ",      # dup lines + blank
    "", None, "   ", "single",                           # degenerate docs
    "x y x y\nx y x y\nunique tail z z z z z z",
    "aa bb aa bb cc aa bb",                              # tie-break: smallest gram
    "\t tabbed \t\n\tline\t\n tabbed \t",                # non-space whitespace
]


def test_repetition_stats_matches_python_oracle(spark):
    rng = random.Random(11)
    docs = list(CRAFTED)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    for _ in range(150):
        s = ""
        for _w in range(rng.randrange(0, 15)):
            s += rng.choice(vocab) + rng.choice([" ", " ", "\n", "\t"])
        docs.append(s)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    for i, d in enumerate(docs):
        for k, v in py_oracle(d).items():
            gv = got[i][k]
            if isinstance(v, float):
                assert abs(gv - v) < 1e-12, (i, k, gv, v, repr(d))
            else:
                assert gv == v, (i, k, gv, v, repr(d))


def test_repetition_stats_plan_is_map_only(spark):
    """The metrics are per-document, so the right plan has NO shuffle
    and evaluates each O(doc) array aggregate exactly once (staged
    columns defeat the higher-order-function CSE exclusion)."""
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # 1 line-stats + 3 gram-stats aggregates, each appearing once
    assert plan.count("aggregate(array_sort") == 4


def test_repetition_stats_flags_boilerplate(spark):
    """The operator's purpose: templated/boilerplate docs score high,
    natural-ish text scores low — the Gopher-rule discrimination."""
    df = spark.createDataFrame(
        [
            (1, "buy now click here buy now click here buy now click here"),
            (2, "the quick brown fox jumps over a lazy dog near the river"),
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in repetition_stats(df).collect()}
    assert r[1]["top_4gram_char_frac"] > 0.5
    assert r[2]["top_4gram_char_frac"] < 0.3
