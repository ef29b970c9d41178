"""End-to-end training-corpus preparation: one declarative pipeline.

The composition every pretraining ingest runs — annotate, quality- and
language-filter, dedup, split — expressed as a single Catalyst plan over
one scan of the documents table:

- annotation (language guess, quality score, token count, fingerprint)
  is pure codegen column math (`functions/text.py`) — no Python, no
  shuffle;
- filtering happens before any shuffle, so the scan-side volume drop
  (often 10-50% of a web corpus) is free;
- exact dedup is the only shuffling stage: winner-per-fingerprint
  (min id) — one window over the survivors;
- the split assignment is a deterministic hash of the FINGERPRINT, not
  the doc id: if a near-identical doc re-enters the corpus later under
  a new id, it lands in the same split — the train/test-contamination
  guard (`operators/sampling.py` rationale).

Every stage is individually oracle-gated elsewhere; the composed gate
(`corpus_prepare` in ``__spark_entry__``) proves the stages compose
without semantic drift.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hyper_spark.functions.text import (
    LANG_STOPWORDS,
    lang_guess_from_counts,
    lang_hit_counts,
    normalized_text,
    punct_ratio_col,
    quality_score_from_parts,
    token_count_col,
)
from hyper_spark.operators.sampling import hash_split
from hyper_spark.operators.util import spread

__all__ = ["prepare_corpus", "chunk_documents"]


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: Sequence[str] | None = ("en", "de", "fr", "es"),
    min_quality: float = 0.35,
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    dedup: bool = True,
    splits: Mapping[str, float] | None = None,
    seed: str | int = 0,
) -> DataFrame:
    """Prepare a raw documents table for training.

    Returns the surviving rows of ``df`` plus ``lang_guess``,
    ``quality``, ``n_tokens``, ``fingerprint`` and (when ``splits`` is
    given) ``split`` columns. ``langs=None`` skips the language filter;
    ``dedup=False`` keeps exact duplicates.

    Scale: annotate+filter are shuffle-free codegen over the scan;
    dedup adds ONE fingerprint-keyed shuffle (window winner — see the
    inline note for why not agg+semi-join); the split is a map-side
    hash. Nothing leaves the JVM.
    """
    text = F.col(text_col)
    # Stage the expensive intermediates as REAL columns, one per
    # projection level: the normalized text (3 regexes) feeds the token
    # array, which feeds 5 ArrayFilter stopword counts, which feed both
    # the language when-chain and the quality formula. Handing the raw
    # column to the composed lang_guess_col/quality_score_col instead
    # re-evaluates the regex chain ~20x per row (lambda-CSE +
    # CodegenFallback; measured ~3x the whole pipeline cost at sf0.1).
    # CollapseProject keeps non-cheap exprs referenced more than once in
    # their own projection, so the staging survives optimization.
    counts = {lang: F.col(f"__c_{lang}") for lang in LANG_STOPWORDS}
    # spread(): a small-file table arrives as ONE scan partition and the
    # whole annotate stage would run on one core (no-op on wide inputs)
    staged = (
        spread(df).withColumn("__norm", normalized_text(text))
        .withColumn("__toks", F.split(F.col("__norm"), " "))
        .withColumns(
            {f"__c_{lang}": c for lang, c in lang_hit_counts(F.col("__toks")).items()}
        )
        .withColumn("n_tokens", token_count_col(text).cast("long"))
    )
    stop_ratio = F.when(
        F.size("__toks") > 0, counts["en"] / F.size("__toks")
    ).otherwise(F.lit(0.0))
    annotated = (
        staged.withColumn("lang_guess", lang_guess_from_counts(counts))
        .withColumn(
            "quality",
            quality_score_from_parts(
                F.col("n_tokens"), punct_ratio_col(text), stop_ratio
            ),
        )
        .withColumn("fingerprint", F.md5(F.col("__norm")))
        .drop("__norm", "__toks", *[f"__c_{lang}" for lang in LANG_STOPWORDS])
    )

    cond = (
        (F.col("quality") >= F.lit(float(min_quality)))
        & (F.col("n_tokens") >= F.lit(int(min_tokens)))
        & (F.col("n_tokens") <= F.lit(int(max_tokens)))
    )
    if langs is not None:
        cond = cond & F.col("lang_guess").isin(*langs)
    kept = annotated.filter(cond)

    if dedup:
        # winner-per-fingerprint via ONE window over the surviving rows.
        # The agg + semi-join formulation (exact_dedup) re-evaluates the
        # whole annotate subtree on the winners branch — measured ~1.7x
        # the pipeline cost at sf0.1 with the lambda-heavy lang counts.
        # One fingerprint-keyed shuffle of annotated rows is cheaper than
        # computing the annotation twice.
        from pyspark.sql.window import Window

        w = Window.partitionBy("fingerprint").orderBy(id_col)
        kept = (
            kept.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    if splits:
        kept = hash_split(kept, "fingerprint", splits, seed=seed)
    return kept


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
    overlap: int = 0,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Split documents into (optionally overlapping) token-window chunks
    — the retrieval/packing preprocessing step.

    Output: one row per chunk with ``id_col``, ``chunk_idx`` (0-based),
    ``chunk_text`` (tokens re-joined with single spaces), and
    ``n_chunk_tokens``; ``keep_cols`` pass through. Tokenization is the
    same whitespace split as ``token_count_col`` (so
    ``sum(n_chunk_tokens)`` over non-overlapping chunks equals the doc's
    token count). A non-NULL document always yields at least one chunk;
    NULL-text rows are skipped (the sketch-operator NULL contract).
    Chunk starts stop once a chunk reaches the document end, so with
    overlap no trailing chunk is a subset of its predecessor.

    Scale: pure Catalyst — tokenize once, posexplode a
    ``sequence(0, n-1, step)`` of chunk starts, slice + rejoin per
    chunk. No shuffle, no Python; the fan-out is rows->chunks, the
    volume fan-out is ~1x (+overlap fraction) of the text bytes.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # last start = smallest multiple of step whose chunk reaches the end:
    # ceil(max(n - chunk, 0) / step) * step
    over = F.greatest(F.size("__toks") - chunk_tokens, F.lit(0))
    last_start = F.floor((over + step - 1) / F.lit(step)) * step
    starts = F.sequence(F.lit(0).cast("long"), last_start, F.lit(step).cast("long"))
    out = (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("__toks", toks)
        .select(
            id_col,
            *keep_cols,
            "__toks",
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        .withColumn(
            "chunk_text",
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens), " "
            ),
        )
        .withColumn(
            "n_chunk_tokens",
            F.least(
                F.size("__toks") - F.col("__start"), F.lit(chunk_tokens)
            ).cast("long"),
        )
        .drop("__toks", "__start")
    )
    return out
