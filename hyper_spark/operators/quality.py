"""Repetition-quality metrics for training-data filtering.

The repetition family of quality signals from the public Gopher rules
(Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher", App. A1.1) — duplicate-line fractions
and most-frequent-n-gram character fractions — used by every modern
web-corpus pipeline to drop boilerplate/spam documents before
training.

Scale design: every metric is PER DOCUMENT, so the right plan has NO
shuffle — and none exists here. The naive Spark shape (explode n-grams
→ groupBy(doc, gram) → max) shuffles the full token stream twice; this
module instead sorts each document's gram array and computes run
lengths with one ``F.aggregate`` pass per array (the most frequent
element of a sorted array is its longest run), all inside the row.
100 TB of documents = a single map-only stage.

Exact definitions (deterministic, DuckDB-reproducible — gated):

- lines = non-empty trimmed ``\\n`` segments;
  ``dup_line_frac``        = (n_lines − n_distinct_lines) / n_lines
  ``dup_line_char_frac``   = chars in occurrences after the first /
                             total line chars
- tokens = whitespace words of the trimmed text; an n-gram is n
  consecutive tokens joined by one space (overlapping);
  ``top_{n}gram_char_frac`` = count(most frequent n-gram) ×
    len(that n-gram) / len(single-spaced token text); ties broken
    toward the lexicographically smallest gram. 0.0 when the doc has
    fewer than n tokens.
- ``dup_{n}gram_char_frac`` (the Gopher rule for n=5..10) =
    Σ over grams occurring c>1 times of (c−1)×len(gram) /
    len(single-spaced token text) — chars in occurrences after the
    first, the same accounting the dup-line metric uses. (The paper
    says "characters contained within duplicated n-grams" without an
    overlap rule; this occurrence-based form is deterministic and is
    what the dup-line/paragraph metrics already mean here.)
- paragraphs = non-empty trimmed segments split on a blank line
  (``\\n\\n``); ``dup_para_frac`` / ``dup_para_char_frac`` mirror the
  line metrics.

``gopher_filter`` composes these with the non-repetition Gopher rules
(word count, mean word length, symbol/bullet/ellipsis ratios,
alphabetic-word fraction, required stopwords) into per-rule booleans
and one ``keep`` verdict — the standard pre-training quality gate,
still a single map-only stage. ``c4_clean`` is the other canonical
web-corpus cleaner (Raffel et al. 2020): line-level retention plus
page-level discard flags, same map-only shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "repetition_stats",
    "gopher_stats",
    "gopher_filter",
    "GOPHER_THRESHOLDS",
    "c4_clean",
    "scrub_text",
    "SCRUB_RULES",
]


def _run_stats(sorted_arr: Column) -> Column:
    """One pass over a SORTED array: total duplicate element count /
    duplicate chars (occurrences after the first), and the longest run
    (element + length) — i.e. the most frequent element, smallest-first
    on ties because the array is ascending and only strictly longer
    runs displace the incumbent."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup_n"),
        F.lit(0).cast("long").alias("dup_chars"),
        F.lit(0).cast("long").alias("best_run"),
        F.lit("").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x == acc["prev"]
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run > acc["best_run"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (acc["dup_n"] + F.when(same, 1).otherwise(0)).alias("dup_n"),
            (
                acc["dup_chars"] + F.when(same, F.length(x)).otherwise(0)
            ).alias("dup_chars"),
            F.when(better, run).otherwise(acc["best_run"]).alias("best_run"),
            F.when(better, x).otherwise(acc["best"]).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step)


def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(0.0)
    )


def _segments(txt: Column, sep_regex: str) -> Column:
    """Non-empty fully-whitespace-trimmed segments of ``txt`` split on
    ``sep_regex``. F.trim strips ONLY the space character; strip the
    full whitespace class so '\\t'/'\\r'-padded segments behave like
    Python's str.strip(). split keeps leading/trailing empty fields
    (limit -1) — filter them rather than trusting trim."""
    strip_ws = lambda c: F.regexp_replace(c, r"^\s+|\s+$", "")  # noqa: E731
    return F.filter(
        F.transform(F.split(txt, sep_regex), strip_ws), lambda x: x != ""
    )


def _seg_metrics(out: DataFrame, arr_col: str, prefix: str) -> DataFrame:
    """n_{prefix}s, dup_{prefix}_frac, dup_{prefix}_char_frac from a
    staged segment-array column. Every aggregate struct is STAGED as a
    column before its fields are read: higher-order functions are
    CodegenFallback and excluded from runtime subexpression
    elimination, so referencing two fields of an un-staged struct
    evaluates the whole O(doc) aggregate twice."""
    st_c, ch_c = f"__{prefix}st", f"__{prefix}ch"
    out = (
        out.withColumn(st_c, _run_stats(F.array_sort(F.col(arr_col))))
        .withColumn(
            ch_c,
            F.aggregate(
                F.col(arr_col),
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.length(x),
            ),
        )
        .withColumn(f"n_{prefix}s", F.size(arr_col).cast("long"))
        .withColumn(
            f"dup_{prefix}_frac",
            _safe_div(F.col(st_c)["dup_n"], F.col(f"n_{prefix}s")),
        )
        .withColumn(
            f"dup_{prefix}_char_frac",
            _safe_div(F.col(st_c)["dup_chars"], F.col(ch_c)),
        )
    )
    return out.drop(st_c, ch_c)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_ns: Sequence[int] = (2, 3, 4),
    dup_ngram_ns: Sequence[int] = (),
    include_paragraphs: bool = False,
) -> DataFrame:
    """[id_col, n_lines, n_tokens, dup_line_frac, dup_line_char_frac,
    top_{n}gram_char_frac ..., dup_{n}gram_char_frac ...,
    (n_paras, dup_para_frac, dup_para_char_frac)] — see module
    docstring for the exact definitions. Pure per-row JVM expressions;
    the plan is map-only."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    tokens = F.filter(F.split(txt, r"\s+"), lambda x: x != "")
    # staged columns: each array is referenced several times below, and
    # CollapseProject keeps multi-referenced non-cheap expressions in
    # their own projection (no re-inline)
    out = (
        df.withColumn("__lines", _segments(txt, r"\n"))
        .withColumn("__tokens", tokens)
        .withColumn("n_tokens", F.size("__tokens").cast("long"))
    )
    out = _seg_metrics(out, "__lines", "line")
    drop = ["__lines", "__tokens", "__ttl"]
    if include_paragraphs:
        out = _seg_metrics(
            out.withColumn("__paras", _segments(txt, r"\n{2,}")),
            "__paras",
            "para",
        )
        drop.append("__paras")
    token_text_len = F.when(
        F.col("n_tokens") > 0,
        F.length(F.concat_ws(" ", F.col("__tokens"))),
    ).otherwise(F.lit(0)).cast("long")
    out = out.withColumn("__ttl", token_text_len)

    def _gram_lambda(n: int):
        # a closure, NOT a default-arg lambda: PySpark dispatches on the
        # lambda's arity, and a second parameter (even defaulted) turns
        # the callback into the (element, index) form — `n` would
        # silently receive the array index
        return lambda i: F.concat_ws(" ", F.slice(F.col("__tokens"), i, n))

    for n in sorted(set(ngram_ns) | set(dup_ngram_ns)):
        grams = F.when(
            F.size("__tokens") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("__tokens") - (n - 1)),
                _gram_lambda(n),
            ),
        ).otherwise(F.array().cast("array<string>"))
        st_col = f"__st{n}"
        out = out.withColumn(st_col, _run_stats(F.array_sort(grams)))
        st = F.col(st_col)
        if n in ngram_ns:
            out = out.withColumn(
                f"top_{n}gram_char_frac",
                _safe_div(
                    st["best_run"] * F.length(st["best"]), F.col("__ttl")
                ),
            )
        if n in dup_ngram_ns:
            out = out.withColumn(
                f"dup_{n}gram_char_frac",
                _safe_div(st["dup_chars"], F.col("__ttl")),
            )
        out = out.drop(st_col)
    return out.drop(*drop)


# Gopher App. A1 thresholds (Rae et al. 2021), the published defaults.
# Keys are also the rule-column names gopher_filter emits.
GOPHER_THRESHOLDS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_required_stopwords": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_para_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_dup_para_char_frac": 0.20,
    "max_top_2gram_char_frac": 0.20,
    "max_top_3gram_char_frac": 0.18,
    "max_top_4gram_char_frac": 0.16,
    "max_dup_5gram_char_frac": 0.15,
    "max_dup_6gram_char_frac": 0.14,
    "max_dup_7gram_char_frac": 0.13,
    "max_dup_8gram_char_frac": 0.12,
    "max_dup_9gram_char_frac": 0.11,
    "max_dup_10gram_char_frac": 0.10,
}

# the paper's rule: a document must contain >= 2 of these words
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLETS = ("-", "*", "•", "‣", "▪")  # - * • ‣ ▪
_ELLIPSES = ("...", "…")  # ... …


def gopher_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All per-document signals the Gopher quality rules read, in one
    map-only pass: the repetition family (lines, paragraphs, top 2-4
    grams, dup 5-10 grams) plus

    - ``mean_word_len``      — Σ len(word) / n_tokens (whitespace words)
    - ``symbol_word_ratio``  — (# count + non-overlapping '...' count +
                               '…' count) / n_tokens
    - ``bullet_line_frac``   — non-empty lines starting with -, *, •,
                               ‣ or ▪ / n_lines
    - ``ellipsis_line_frac`` — non-empty lines ending with '...' or
                               '…' / n_lines
    - ``alpha_word_frac``    — words containing ≥1 [a-zA-Z] / n_tokens
    - ``n_required_stopwords`` — distinct hits among
                               GOPHER_REQUIRED_STOPWORDS over
                               lowercased words

    Everything is JVM expressions over staged arrays; no shuffle."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    out = repetition_stats(
        df,
        text_col=text_col,
        id_col=id_col,
        ngram_ns=(2, 3, 4),
        dup_ngram_ns=(5, 6, 7, 8, 9, 10),
        include_paragraphs=True,
    )
    # repetition_stats dropped its staged arrays (they are internal to
    # its contract); re-stage the two this function reads. Catalyst
    # collapses the duplicate split into one projection per branch.
    out = (
        out.withColumn(
            "__tokens", F.filter(F.split(txt, r"\s+"), lambda x: x != "")
        )
        .withColumn("__lines", _segments(txt, r"\n"))
    )
    sum_word_len = F.aggregate(
        F.col("__tokens"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    hash_count = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    # replace() consumes non-overlapping occurrences left-to-right —
    # the deterministic '...' count ('....' counts once)
    dots_count = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / 3
    uni_ellipsis = F.length(txt) - F.length(
        F.replace(txt, F.lit("…"), F.lit(""))
    )
    bullet_lines = F.filter(
        F.col("__lines"),
        lambda x: F.array_contains(
            F.array(*[F.lit(b) for b in _BULLETS]), F.substring(x, 1, 1)
        ),
    )
    ellipsis_lines = F.filter(
        F.col("__lines"),
        lambda x: x.endswith(_ELLIPSES[0]) | x.endswith(_ELLIPSES[1]),
    )
    alpha_words = F.filter(F.col("__tokens"), lambda x: x.rlike("[a-zA-Z]"))
    lower_toks = F.transform(F.col("__tokens"), F.lower)
    out = out.withColumn("__lt", lower_toks)
    n_req = sum(
        F.array_contains(F.col("__lt"), w).cast("int")
        for w in GOPHER_REQUIRED_STOPWORDS
    )
    out = (
        out.withColumn(
            "mean_word_len", _safe_div(sum_word_len, F.col("n_tokens"))
        )
        .withColumn(
            "symbol_word_ratio",
            _safe_div(hash_count + dots_count + uni_ellipsis, F.col("n_tokens")),
        )
        .withColumn(
            "bullet_line_frac",
            _safe_div(F.size(bullet_lines), F.col("n_lines")),
        )
        .withColumn(
            "ellipsis_line_frac",
            _safe_div(F.size(ellipsis_lines), F.col("n_lines")),
        )
        .withColumn(
            "alpha_word_frac",
            _safe_div(F.size(alpha_words), F.col("n_tokens")),
        )
        .withColumn("n_required_stopwords", n_req.cast("long"))
    )
    return out.drop("__tokens", "__lines", "__lt")


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Gopher quality gate: every input column plus one boolean per
    rule (named after its GOPHER_THRESHOLDS key, True = rule SATISFIED)
    and ``keep`` = AND of all rules. ``thresholds`` overrides
    individual defaults (a key mapped to None disables that rule).

    Still one map-only stage — filtering 100 TB of documents is a scan,
    a projection, and a write. Compose with ``near_dedup`` (dedup
    first: quality metrics are per-row, dedup is the only shuffle)."""
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})
    stats = gopher_stats(df, text_col=text_col, id_col=id_col)
    metric_of = {
        "min_words": ("n_tokens", "min"),
        "max_words": ("n_tokens", "max"),
        "min_mean_word_len": ("mean_word_len", "min"),
        "max_mean_word_len": ("mean_word_len", "max"),
        "max_symbol_word_ratio": ("symbol_word_ratio", "max"),
        "max_bullet_line_frac": ("bullet_line_frac", "max"),
        "max_ellipsis_line_frac": ("ellipsis_line_frac", "max"),
        "min_alpha_word_frac": ("alpha_word_frac", "min"),
        "min_required_stopwords": ("n_required_stopwords", "min"),
        "max_dup_line_frac": ("dup_line_frac", "max"),
        "max_dup_para_frac": ("dup_para_frac", "max"),
        "max_dup_line_char_frac": ("dup_line_char_frac", "max"),
        "max_dup_para_char_frac": ("dup_para_char_frac", "max"),
        **{
            f"max_top_{n}gram_char_frac": (f"top_{n}gram_char_frac", "max")
            for n in (2, 3, 4)
        },
        **{
            f"max_dup_{n}gram_char_frac": (f"dup_{n}gram_char_frac", "max")
            for n in (5, 6, 7, 8, 9, 10)
        },
    }
    rule_cols = []
    for rule, (metric, kind) in metric_of.items():
        if th.get(rule) is None:
            continue
        lim = F.lit(th[rule])
        cond = F.col(metric) >= lim if kind == "min" else F.col(metric) <= lim
        stats = stats.withColumn(rule, cond)
        rule_cols.append(rule)
    keep = F.lit(True)
    for rule in rule_cols:
        keep = keep & F.col(rule)
    return stats.withColumn("keep", keep)


# C4 (Raffel et al. 2020, §2.2): a line survives if it ends in terminal
# punctuation. "End quotation mark" is included per the paper.
C4_TERMINAL_PUNCT = (".", "!", "?", '"')


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: Sequence[str] = (),
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, §2.2) as one map-only
    stage: line-level retention + page-level discard flags.

    Line rules (a line = non-empty fully-trimmed ``\\n`` segment):
    ends with terminal punctuation (``C4_TERMINAL_PUNCT``), has ≥
    ``min_words_per_line`` whitespace words, and does not contain the
    word "javascript" (case-insensitive).

    Page rules: ≥ ``min_sentences`` sentences in the CLEANED text
    (sentence count = occurrences of ``.``/``!``/``?`` — a
    deterministic stand-in for the paper's sentence splitter), the RAW
    page contains neither "lorem ipsum" (case-insensitive) nor "{",
    and no lowercased whitespace word of the raw page is in
    ``badwords`` (the paper screens against a public blocklist; pass
    your own — the default is empty, which disables the rule).

    Output: every input column plus ``clean_text`` (kept lines joined
    with ``\\n``), ``n_lines_kept``, ``n_sentences``, ``keep``.
    Filtering 100 TB is scan → project → write; no shuffle."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    out = df.withColumn("__lines", _segments(txt, r"\n"))

    def line_ok(ln: Column) -> Column:
        ends = F.lit(False)
        for p in C4_TERMINAL_PUNCT:
            ends = ends | ln.endswith(p)
        enough_words = (
            F.size(F.filter(F.split(ln, r"\s+"), lambda x: x != ""))
            >= min_words_per_line
        )
        no_js = ~F.lower(ln).contains("javascript")
        return ends & enough_words & no_js

    out = out.withColumn("__kept", F.filter(F.col("__lines"), line_ok))
    clean = F.array_join(F.col("__kept"), "\n")
    out = out.withColumn("clean_text", clean)
    n_sent = F.length("clean_text") - F.length(
        F.regexp_replace(F.col("clean_text"), r"[.!?]", "")
    )
    page_ok = (
        ~F.lower(txt).contains("lorem ipsum") & ~txt.contains("{")
    )
    if badwords:
        lower_words = F.transform(
            F.filter(F.split(txt, r"\s+"), lambda x: x != ""), F.lower
        )
        out = out.withColumn("__lw", lower_words)
        hit = F.lit(False)
        for w in badwords:
            hit = hit | F.array_contains(F.col("__lw"), w)
        page_ok = page_ok & ~hit
    out = (
        out.withColumn("n_lines_kept", F.size("__kept").cast("long"))
        .withColumn("n_sentences", n_sent.cast("long"))
        .withColumn(
            "keep", (F.col("n_sentences") >= min_sentences) & page_ok
        )
    )
    return out.drop("__lines", "__kept", "__lw") if badwords else out.drop(
        "__lines", "__kept"
    )


# ----------------------------------------------------------- scrubbing

#: Default redaction rules, applied IN ORDER (URLs first so an email or
#: IP inside a URL is counted once, as a URL). Patterns deliberately use
#: the regex subset Java and RE2 agree on (no lookaround, no
#: backreferences) so the DuckDB oracle runs the same expressions.
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_text(
    df: DataFrame,
    text_col: str = "text",
    rules: Sequence[tuple[str, str, str]] | None = None,
    out_col: str = "scrubbed_text",
) -> DataFrame:
    """Redact PII-shaped substrings (URLs, emails, IPv4 by default)
    with typed placeholders, counting what each rule replaced — the
    standard pre-training scrub stage (see e.g. the public C4/Dolma
    pipeline write-ups; the exact rule list is deployment policy, so
    it is injectable: ``rules`` = ordered ``(name, pattern,
    replacement)`` triples).

    Appends ``out_col`` plus one ``n_<name>`` count per rule. Each
    rule counts matches in the text AS THE PREVIOUS RULES LEFT IT
    (order = precedence: with the defaults, an email inside a URL is
    one URL, not a URL and an email).

    Scale shape: pure JVM ``regexp_count``/``regexp_replace`` chained
    in one projection — map-only, no shuffle, no Python; at 100 TB
    this fuses into the scan's whole-stage codegen like `c4_clean`.
    NULL text scrubs to NULL with zero counts.
    """
    if rules is None:
        rules = SCRUB_RULES
    names = [n for n, _, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    cur = F.col(text_col)
    out = df
    count_cols: list[tuple[str, Column]] = []
    for name, pat, repl in rules:
        count_cols.append(
            (f"n_{name}", F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0)))
        )
        cur = F.regexp_replace(cur, pat, repl)
    # counts first, scrubbed text last: if out_col == text_col the
    # counts must still see the ORIGINAL column, not the overwrite
    for cname, c in count_cols:
        out = out.withColumn(cname, c.cast("bigint"))
    return out.withColumn(out_col, cur)
