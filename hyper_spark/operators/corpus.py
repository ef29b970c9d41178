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
  (min id) — one groupBy plus one semi join;
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
    fingerprint_col,
    lang_guess_col,
    quality_score_col,
    token_count_col,
)
from hyper_spark.operators.sampling import hash_split

__all__ = ["prepare_corpus"]


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
    dedup adds one fingerprint-keyed aggregate and a semi join (the
    winners side is O(distinct surviving docs) — AQE picks the join
    strategy); the split is a map-side hash. Nothing leaves the JVM.
    """
    text = F.col(text_col)
    annotated = df.withColumn("lang_guess", lang_guess_col(text)).withColumn(
        "quality", quality_score_col(text)
    ).withColumn(
        "n_tokens", token_count_col(text).cast("long")
    ).withColumn("fingerprint", fingerprint_col(text))

    cond = (
        (F.col("quality") >= F.lit(float(min_quality)))
        & (F.col("n_tokens") >= F.lit(int(min_tokens)))
        & (F.col("n_tokens") <= F.lit(int(max_tokens)))
    )
    if langs is not None:
        cond = cond & F.col("lang_guess").isin(*langs)
    kept = annotated.filter(cond)

    if dedup:
        winners = kept.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
        kept = kept.join(winners.select(id_col), on=id_col, how="leftsemi")

    if splits:
        kept = hash_split(kept, "fingerprint", splits, seed=seed)
    return kept
