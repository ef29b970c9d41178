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
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["repetition_stats"]


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


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_ns: Sequence[int] = (2, 3, 4),
) -> DataFrame:
    """[id_col, n_lines, n_tokens, dup_line_frac, dup_line_char_frac,
    top_{n}gram_char_frac ...] — see module docstring for the exact
    definitions. Pure per-row JVM expressions; the plan is map-only."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    # F.trim strips ONLY the space character; strip the full whitespace
    # class so '\t'/'\r'-padded lines and token streams behave like
    # Python's str.strip()/str.split()
    strip_ws = lambda c: F.regexp_replace(c, r"^\s+|\s+$", "")  # noqa: E731
    lines = F.filter(
        F.transform(F.split(txt, r"\n"), strip_ws), lambda x: x != ""
    )
    # split keeps leading/trailing empty fields (limit -1) — filter
    # them rather than trusting trim
    tokens = F.filter(F.split(txt, r"\s+"), lambda x: x != "")
    # staged columns: each array is referenced several times below, and
    # CollapseProject keeps multi-referenced non-cheap expressions in
    # their own projection (no re-inline)
    out = df.withColumn("__lines", lines).withColumn("__tokens", tokens)
    line_stats = _run_stats(F.array_sort(F.col("__lines")))
    line_chars = F.aggregate(
        F.col("__lines"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    # every aggregate struct is STAGED as a column before its fields are
    # read: higher-order functions are CodegenFallback and excluded from
    # runtime subexpression elimination, so referencing two fields of an
    # un-staged struct evaluates the whole O(doc) aggregate twice
    out = (
        out.withColumn("__ls", line_stats)
        .withColumn("__lc", line_chars)
        .withColumn("n_lines", F.size("__lines").cast("long"))
        .withColumn("n_tokens", F.size("__tokens").cast("long"))
        .withColumn(
            "dup_line_frac",
            _safe_div(F.col("__ls")["dup_n"], F.col("n_lines")),
        )
        .withColumn(
            "dup_line_char_frac",
            _safe_div(F.col("__ls")["dup_chars"], F.col("__lc")),
        )
    )
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

    for n in ngram_ns:
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
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            _safe_div(st["best_run"] * F.length(st["best"]), F.col("__ttl")),
        ).drop(st_col)
    return out.drop("__lines", "__tokens", "__ls", "__lc", "__ttl")
