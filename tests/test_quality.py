"""Gopher-style repetition metrics (operators/quality.py) vs an
independent pure-Python oracle."""

from __future__ import annotations

import random
from collections import Counter

import pytest

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


def py_gopher_oracle(text):
    import re

    t = text or ""
    toks = t.split()
    lines = [ln.strip() for ln in t.split("\n")]
    lines = [ln for ln in lines if ln]
    paras = [p.strip() for p in re.split(r"\n{2,}", t)]
    paras = [p for p in paras if p]
    d = {}
    d["n_tokens"] = len(toks)
    d["mean_word_len"] = sum(map(len, toks)) / len(toks) if toks else 0.0
    dots = (len(t) - len(t.replace("...", ""))) / 3
    sym = t.count("#") + dots + t.count("…")
    d["symbol_word_ratio"] = sym / len(toks) if toks else 0.0
    d["bullet_line_frac"] = (
        sum(1 for ln in lines if ln[:1] in "-*•‣▪") / len(lines)
        if lines
        else 0.0
    )
    d["ellipsis_line_frac"] = (
        sum(1 for ln in lines if ln.endswith("...") or ln.endswith("…"))
        / len(lines)
        if lines
        else 0.0
    )
    d["alpha_word_frac"] = (
        sum(1 for w in toks if re.search("[a-zA-Z]", w)) / len(toks)
        if toks
        else 0.0
    )
    lt = [w.lower() for w in toks]
    from hyper_spark.operators.quality import GOPHER_REQUIRED_STOPWORDS

    d["n_required_stopwords"] = sum(
        1 for w in GOPHER_REQUIRED_STOPWORDS if w in lt
    )
    d["n_paras"] = len(paras)
    pc = Counter(paras)
    d["dup_para_frac"] = (
        sum(v - 1 for v in pc.values()) / len(paras) if paras else 0.0
    )
    tot = sum(len(p) * v for p, v in pc.items())
    d["dup_para_char_frac"] = (
        sum(len(p) * (v - 1) for p, v in pc.items()) / tot if tot else 0.0
    )
    ttl = len(" ".join(toks))
    for n in range(5, 11):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        dup = sum(len(g) * (v - 1) for g, v in c.items())
        d[f"dup_{n}gram_char_frac"] = dup / ttl if ttl else 0.0
    return d


GOPHER_CRAFTED = [
    "- one\n- two\n- three\nplain",                      # bullet lines
    "going on...\nand on…\nand stopping",                # ellipsis ends
    "#tag ## x ... .... odd…stuff",                      # symbols incl 4-dot
    "para a\n\npara a\n\n\npara b",                      # dup paras, \n{2,}
    "the be to of and that have with none else 42 7",    # all 8 stopwords
    "12 34 56 78",                                       # zero alpha words
    "", None, "  \n \n\n ",                              # degenerate
    ("u v w x y z " * 4) + "tail",                       # long dup 5-grams
]


def test_gopher_stats_matches_python_oracle(spark):
    from hyper_spark.operators.quality import gopher_stats

    rng = random.Random(23)
    docs = list(GOPHER_CRAFTED)
    vocab = ["the", "fox#", "b...", "•", "- x", "longword", "7"]
    for _ in range(120):
        s = ""
        for _w in range(rng.randrange(0, 20)):
            s += rng.choice(vocab) + rng.choice([" ", " ", "\n", "\n\n", "\t"])
        docs.append(s)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_stats(df).collect()}
    for i, d in enumerate(docs):
        for k, v in py_gopher_oracle(d).items():
            gv = got[i][k]
            if isinstance(v, float):
                assert abs(gv - v) < 1e-12, (i, k, gv, v, repr(d))
            else:
                assert gv == v, (i, k, gv, v, repr(d))


def test_gopher_filter_rules_and_overrides(spark):
    from hyper_spark.operators.quality import gopher_filter

    clean_words = (
        "the history of science shows that careful measurement and "
        "honest review have improved almost every field with time. "
        "researchers keep refining their methods because each result "
        "suggests another question worth asking about nature itself. "
        "students learn these habits slowly, first copying examples "
        "then designing experiments that test a single clear idea. "
        "over many years such patient work builds reliable knowledge "
        "which society can use for medicine, farming and industry."
    )
    docs = [
        (1, clean_words),                  # passes everything
        (2, "too short to be kept"),       # min_words
        (3, ("spam line\n" * 40)),         # dup lines + ngram repetition
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_filter(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["min_words"] is False
    assert out[3]["keep"] is False and out[3]["max_dup_line_frac"] is False
    # rule booleans AND together into keep
    for r in out.values():
        rules = [v for k, v in r.items() if isinstance(v, bool) and k != "keep"]
        assert r["keep"] == all(rules)
    # threshold override: a rule mapped to None is disabled. A 5-word
    # doc trips min_words AND the top-gram rules (its most frequent
    # 2-gram occurs once yet covers >20% of chars — short docs are
    # exactly what those rules assume away), so rescue needs both off.
    relaxed = {
        r["doc_id"]: r["keep"]
        for r in gopher_filter(
            df,
            thresholds={
                "min_words": None,
                "min_required_stopwords": 1,
                **{f"max_top_{n}gram_char_frac": None for n in (2, 3, 4)},
            },
        ).collect()
    }
    assert relaxed[2] is True


def test_gopher_filter_plan_is_map_only(spark):
    from hyper_spark.operators.quality import gopher_filter

    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    plan = gopher_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def py_c4_oracle(text, min_words_per_line=3, min_sentences=5, badwords=()):
    import re

    t = text or ""
    lines = [ln.strip() for ln in t.split("\n")]
    lines = [ln for ln in lines if ln]
    kept = [
        ln
        for ln in lines
        if ln.endswith((".", "!", "?", '"'))
        and len(ln.split()) >= min_words_per_line
        and "javascript" not in ln.lower()
    ]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    page_ok = "lorem ipsum" not in t.lower() and "{" not in t
    if badwords:
        lw = [w.lower() for w in t.split()]
        page_ok = page_ok and not any(w in lw for w in badwords)
    return dict(
        clean_text=clean,
        n_lines_kept=len(kept),
        n_sentences=n_sent,
        keep=n_sent >= min_sentences and page_ok,
    )


C4_CRAFTED = [
    "Good line one.\nno terminal punct\nAnother fine line!\nShort.\n"
    'He said "stop".\nIs this kept?\nQuote end."',
    "This has javascript in it.\nJavaScript required to view.\nClean line here.",
    "Lorem Ipsum dolor sit amet.\nA real sentence follows here.",
    "code sample { return 1; }\nOtherwise a good long line.",
    "One. Two. Three. Four. Five sentences in one line, all kept here.",
    "", None, "   \n  ",
    "w1 w2.\nonly two?\nthree words here!\n\ttabbed line stays.\t\n",
]


def test_c4_clean_matches_python_oracle(spark):
    from hyper_spark.operators.quality import c4_clean

    rng = random.Random(31)
    docs = list(C4_CRAFTED)
    vocab = ["word.", "item", "thing!", "ok?", "{x}", "javascript", 'quo"']
    for _ in range(120):
        s = ""
        for _w in range(rng.randrange(0, 25)):
            s += rng.choice(vocab) + rng.choice([" ", " ", "\n", "\t"])
        docs.append(s)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in c4_clean(df).collect()}
    for i, d in enumerate(docs):
        for k, v in py_c4_oracle(d).items():
            assert got[i][k] == v, (i, k, got[i][k], v, repr(d))


def test_c4_clean_badwords_and_thresholds(spark):
    from hyper_spark.operators.quality import c4_clean

    doc = "A perfectly fine sentence.\nAnother one follows here!\nBadword zap here."
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    base = c4_clean(df, min_sentences=2).collect()[0]
    assert base["keep"] is True and base["n_lines_kept"] == 3
    flagged = c4_clean(df, min_sentences=2, badwords=("zap",)).collect()[0]
    assert flagged["keep"] is False  # badword hits on the RAW page words
    strict = c4_clean(df, min_sentences=5).collect()[0]
    assert strict["keep"] is False


def test_c4_clean_plan_is_map_only(spark):
    from hyper_spark.operators.quality import c4_clean

    df = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_gates_run_on_streams(spark, tmp_path):
    """gopher_filter and c4_clean are stateless map-only transforms, so
    they apply unchanged to a Structured Streaming DataFrame (the
    ingest-time quality-gate deployment): per-row output must equal the
    batch run on the same rows."""
    from hyper_spark.operators.quality import c4_clean, gopher_filter

    docs = [
        (i, f"Line number {i} is fine.\nno punct\nAnother {i} here!")
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "qsrc")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = gopher_filter(c4_clean(stream), text_col="clean_text")
    sink = str(tmp_path / "qsink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    want = gopher_filter(c4_clean(df), text_col="clean_text")
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


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


# ------------------------------------------------------------- scrubbing


def test_scrub_text_oracle(spark):
    """Python re oracle over crafted docs: overlapping entities, emails
    inside URLs (counted once as URL), NULLs, custom rules, in-place
    overwrite."""
    import re

    from hyper_spark.operators.quality import SCRUB_RULES, scrub_text

    docs = [
        (0, "mail me at a.b+c@foo.co or visit https://x.io/p?a=1 now"),
        (1, "server 192.168.0.1 and http://u:p@host.com/a#f plus end."),
        (2, "no entities at all here"),
        (3, None),
        (4, "double x@y.io z@w.org and 1.2.3.4 5.6.7.8 https://a.b https://c.d"),
        (5, "edge 999.999.999.999 and user@@nope and a@b.c"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in scrub_text(df).collect()}
    for i, t in docs:
        cur = t
        counts = {}
        for name, pat, repl in SCRUB_RULES:
            if cur is None:
                counts[name] = 0
                continue
            counts[name] = len(re.findall(pat, cur))
            cur = re.sub(pat, repl, cur)
        r = got[i]
        assert r["scrubbed_text"] == cur, i
        for name in counts:
            assert r[f"n_{name}"] == counts[name], (i, name)

    # in-place overwrite still counts against the original text
    over = {
        r["doc_id"]: r
        for r in scrub_text(df, out_col="text").collect()
    }
    assert over[0]["n_email"] == 1 and over[0]["n_url"] == 1
    assert "<EMAIL>" in over[0]["text"] and "<URL>" in over[0]["text"]

    # custom rules, order honored
    custom = [("word", r"edge", "<W>")]
    c = {r["doc_id"]: r for r in scrub_text(df, rules=custom).collect()}
    assert c[5]["n_word"] == 1 and c[5]["scrubbed_text"].startswith("<W> ")
    with pytest.raises(ValueError):
        scrub_text(df, rules=[("a", "x", "y"), ("a", "z", "w")])


def test_scrub_text_plan_map_only(spark):
    """scrub_text must stay a single map-only projection (no Exchange,
    no Python) — the 100-TB shape."""
    from hyper_spark.operators.quality import scrub_text

    df = spark.createDataFrame([(0, "a@b.co")], ["doc_id", "text"])
    plan = scrub_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
