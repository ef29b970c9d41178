"""Text-analysis Column expressions for training-data pipelines.

Everything here is a native Catalyst expression tree (JVM-side,
whole-stage codegen) — no Python on the per-row path. Where an
equivalent exists in DuckDB (md5, regexp_replace, length) the same
computation is exactly reproducible in the SQL oracle, which the
correctness gate exploits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalized_text",
    "fingerprint_col",
    "token_count_col",
    "word_tokens_col",
    "punct_ratio_col",
    "stopword_ratio_col",
    "quality_score_col",
    "quality_score_from_parts",
    "lang_guess_col",
    "lang_hit_counts",
    "lang_guess_from_counts",
    "char_shingles_col",
    "word_shingles_col",
    "LANG_STOPWORDS",
]

# small per-language common-word profiles for the stopword language
# heuristic (public frequency lists, truncated to 10)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "es": ["el", "de", "que", "y", "los", "se", "un", "una", "con", "para"],
}


def normalized_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, strip non-alnum to
    spaces, collapse whitespace, trim. DuckDB-reproducible.

    ONE fused regex: any run of non-alnum characters (punctuation and
    whitespace alike) becomes a single space — provably identical to
    the original two-pass form (per-char ``[^a-z0-9\\s]``→space, then
    ``\\s+`` collapse: any mixed punct/space run still collapses to one
    space), property-tested in tests/test_transcripts.py. Halves the
    regex passes over what is, at sf16, a regex-bound 19 GB scan
    (measured: exact dedup 640 s → see BENCH §6)."""
    lowered = F.lower(col)
    collapsed = F.regexp_replace(lowered, r"[^a-z0-9]+", " ")
    return F.trim(collapsed)


def fingerprint_col(col: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (exact-dup key).
    DuckDB-reproducible (md5 exists in both engines)."""
    return F.md5(normalized_text(col))


def word_tokens_col(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalized_text(col), " ")


def token_count_col(col: Column, mode: str = "whitespace") -> Column:
    """Token count. ``whitespace``: split on runs of whitespace.
    ``bpe``: BPE-ish pre-tokenization — alpha runs, single digits, and
    punctuation marks each count (rough GPT-style splitting)."""
    if mode == "whitespace":
        return F.size(F.split(F.trim(col), r"\s+"))
    if mode == "bpe":
        spaced = F.regexp_replace(col, r"([^a-zA-Z0-9\s])", r" $1 ")
        spaced = F.regexp_replace(spaced, r"([0-9])", r" $1 ")
        return F.size(F.split(F.trim(spaced), r"\s+"))
    raise ValueError(f"unknown token mode {mode!r}")


def punct_ratio_col(col: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    total = F.length(col)
    stripped = F.length(F.regexp_replace(col, r"[^a-zA-Z0-9\s]", ""))
    return F.when(total > 0, (total - stripped) / total).otherwise(F.lit(0.0))


def stopword_ratio_col(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords (JVM lambda filter)."""
    toks = word_tokens_col(col)
    hits = F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS[lang]))
    return F.when(F.size(toks) > 0, F.size(hits) / F.size(toks)).otherwise(F.lit(0.0))


def quality_score_from_parts(
    n_tokens: Column, punct_ratio: Column, stop_ratio: Column
) -> Column:
    """Quality score from pre-computed parts (see ``quality_score_col``).
    Callers annotating whole tables should materialize the parts as real
    columns first and combine here — handing the composed expression a
    raw text column re-runs the regex/lambda chains once per reference
    (Catalyst can't CSE across lambda boundaries, and ArrayFilter is
    CodegenFallback, outside runtime subexpression elimination)."""
    n_tokens = n_tokens.cast("double")
    length_score = F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * F.least(
        F.lit(2000.0) / F.greatest(n_tokens, F.lit(1.0)), F.lit(1.0)
    )
    punct_penalty = F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))
    stop_score = F.greatest(
        F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)) / F.lit(0.6),
        F.lit(0.0),
    )
    return F.round(
        length_score * 0.4 + punct_penalty * 0.3 + stop_score * 0.3, 6
    )


def quality_score_col(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: rewards moderate length,
    penalizes extreme punctuation density and stopword-free word salads
    (all JVM arithmetic)."""
    return quality_score_from_parts(
        token_count_col(col), punct_ratio_col(col), stopword_ratio_col(col)
    )


def lang_hit_counts(toks: Column) -> dict[str, Column]:
    """Per-language stopword hit counts over a token-array column."""

    def hit_counter(sw: list[str]):
        return lambda t: t.isin(*sw)

    return {
        lang: F.size(F.filter(toks, hit_counter(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_guess_from_counts(counts: dict[str, Column]) -> Column:
    """Language pick from per-language hit-count columns. Pass real
    (materialized) columns when annotating whole tables: the when-chain
    references every count up to 3x, and ``greatest`` of all of them per
    branch — with inline ArrayFilter counts that's ~20 lambda evaluations
    per row."""
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # iterate in reverse so earlier languages win ties (when-chains nest)
    for lang in reversed(list(counts)):
        expr = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def lang_guess_col(col: Column) -> Column:
    """Stopword-profile language heuristic: language with the highest
    stopword hit count among the profiled set; 'und' (undetermined) when
    nothing matches. Pure JVM (greatest/when over per-language counts)."""
    return lang_guess_from_counts(lang_hit_counts(word_tokens_col(col)))


def char_shingles_col(
    col: Column, n: int = 5, pre_normalized: bool = False, distinct: bool = True
) -> Column:
    """Distinct character n-grams of the normalized text (array<string>)
    via JVM sequence/transform — no Python, no explode until the caller
    wants one.

    PERFORMANCE: expressions referenced inside a ``transform`` lambda are
    re-evaluated per array element (Catalyst does not CSE across lambda
    boundaries) — shingling directly over ``normalized_text(text)`` re-ran
    the regex chain once per position, turning shingling quadratic
    (measured 50 s for 5k docs at sf0.1). Callers processing whole tables
    should project the normalized text into a real column first and pass
    ``pre_normalized=True``; this function then only does cheap substr
    per element (same 5k docs: <1 s)."""
    norm = col if pre_normalized else normalized_text(col)
    positions = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    raw = F.transform(positions, lambda i: F.substr(norm, i, F.lit(n)))
    return raw if not distinct else F.array_distinct(raw)


def word_shingles_col(col: Column, n: int = 3, pre_tokenized: bool = False) -> Column:
    """Distinct word n-grams (array<string>) of the normalized text.
    Same lambda-CSE caveat as char_shingles_col: pass a materialized
    token-array column with ``pre_tokenized=True`` for table-scale use."""
    toks = col if pre_tokenized else word_tokens_col(col)
    positions = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            positions, lambda i: F.array_join(F.slice(toks, i, n), " ")
        )
    )
