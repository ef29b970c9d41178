"""CCNet-style n-gram language-model quality scoring.

The reference (GameAnalytics/hyper) has no LM component — this module
belongs to the training-data-pipeline surface (SURVEY §2.4/§6),
modeled on the published CCNet pipeline (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): score every document by a small language model's perplexity,
then bucket the corpus into head/middle/tail quality tiers. CCNet uses
a 5-gram KenLM; absent a KenLM binary this implements the same
*pipeline semantics* with a bigram stupid-backoff model (Brants et al.
2007, "Large Language Models in Machine Translation") — the published
large-scale n-gram smoothing that needs only counts, no discounting
constants, and is therefore exactly reproducible in the SQL oracle.

Model (``ngram_lm_train``): one DataFrame of rows
``(kind, w1, w2, logp)`` —

- ``kind='bi'``:   logp = log10( c(w1,w2) / c(w1) ) for every bigram
  with c(w1,w2) >= min_count,
- ``kind='uni'``:  logp = log10( c(w) / total ) for every token,
- ``kind='meta'``: the OOV floor, logp = log10( 1 / total ).

Being a plain DataFrame, the model persists as parquet and merges
across corpus shards by re-aggregation of counts — no opaque binary.

Scoring (``ngram_lm_score``): per position i >= 2,

    P(w_i | w_{i-1}) = c(w_{i-1}, w_i) / c(w_{i-1})   if bigram kept
                     = alpha * P_uni(w_i)             else
    P_uni(w)         = c(w) / total  if seen, else 1 / total

``avg_logp`` = mean log10 P over scored positions, ``ppl`` =
10^(-avg_logp). Documents with fewer than two tokens score
``n_scored = 0`` with NULL avg/ppl.

Scale shape: training is two partial-aggregated groupBys (shuffle =
|vocab| and |bigram vocab| partial counts, never raw tokens — the
grand total reuses the unigram exchange under AQE) plus one bounded
join of bigram counts against unigram counts. Scoring is one explode
of bigram occurrences and two joins against the model — the model is
tiny relative to the corpus, so pass ``broadcast_model=True`` (or let
AQE pick it) and the scoring stage is map-only: 100 TB of documents
never shuffles. Tokenization matches the dedup-consistent
``normalized_text`` stream, so the same tokens feed dedup, vocab
stats, and LM scoring from one definition.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hyper_spark.functions.text import word_tokens_col

__all__ = ["ngram_lm_train", "ngram_lm_score", "ppl_buckets"]


def _tokens_df(df: DataFrame, text_col: str, extra: list[str]) -> DataFrame:
    """(extra..., toks) with empty tokens dropped — materialized as a
    real column BEFORE any lambda consumes it (Catalyst does not CSE
    across lambda boundaries)."""
    toks = F.filter(word_tokens_col(F.col(text_col)), lambda t: t != F.lit(""))
    return df.select(*extra, toks.alias("toks"))


_BIGRAMS = (
    "CASE WHEN size(toks) >= 2 THEN "
    "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), "
    "(a, b) -> struct(a AS w1, b AS w2)) "
    "ELSE array() END"
)


def ngram_lm_train(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Train the bigram stupid-backoff model; returns the model
    DataFrame described in the module docstring. ``min_count`` prunes
    bigrams (rare bigrams back off to unigrams at score time);
    unigrams are never pruned — they are the backoff floor."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = _tokens_df(df, text_col, [])

    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # grand total rides the same shuffled unigram exchange (AQE
    # ReusedExchange — same shape vocab_stats asserts)
    total = uni.agg(F.sum("c").alias("__t"))

    bi = (
        toks.select(F.explode(F.expr(_BIGRAMS)).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bi"))
        .filter(F.col("c_bi") >= min_count)
    )
    bi_rows = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_w1")), "w1")
        .select(
            F.lit("bi").alias("kind"),
            "w1",
            "w2",
            F.log10(F.col("c_bi") / F.col("c_w1")).alias("logp"),
        )
    )
    uni_rows = uni.crossJoin(F.broadcast(total)).select(
        F.lit("uni").alias("kind"),
        F.col("w").alias("w1"),
        F.lit(None).cast("string").alias("w2"),
        F.log10(F.col("c") / F.col("__t")).alias("logp"),
    )
    meta_row = total.select(
        F.lit("meta").alias("kind"),
        F.lit(None).cast("string").alias("w1"),
        F.lit(None).cast("string").alias("w2"),
        (-F.log10(F.col("__t"))).alias("logp"),
    )
    return bi_rows.unionByName(uni_rows).unionByName(meta_row)


def ngram_lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    broadcast_model: bool = True,
    cache_model: bool = True,
) -> DataFrame:
    """Score documents against a trained model. Returns
    DataFrame[id_col, n_scored, avg_logp, ppl].

    ``broadcast_model=True`` (default) broadcasts both model slices so
    scoring is a map-only stage over the corpus — the right call
    whenever the model fits an executor (CCNet's pruned LMs do); set
    False to let AQE choose a shuffle join for an oversized model.

    Scoring reads the model THREE times (the one-row meta collect
    below, then the bi and uni branches), so an unmaterialized model
    would re-run its training lineage — two corpus aggregates — three
    times. ``cache_model=True`` (default) persists the model first
    (the eager meta collect warms the cache); the entry stays cached
    for the caller to ``model.unpersist()`` after the scoring job, the
    same injected-frame contract the dedup signature paths use. Pass
    False when the model is already materialized (a parquet read)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if cache_model and not model.is_cached:
        model.persist()
    bi = model.filter(F.col("kind") == "bi").select("w1", "w2", F.col("logp").alias("lp_bi"))
    uni = model.filter(F.col("kind") == "uni").select(
        F.col("w1").alias("w2"), F.col("logp").alias("lp_uni")
    )
    # the OOV floor is ONE row — bounded collect, becomes a literal
    meta = model.filter(F.col("kind") == "meta").select("logp").collect()
    if len(meta) != 1:
        raise ValueError("model has no (or multiple) meta rows — not a trained model")
    oov_logp = float(meta[0]["logp"])

    if broadcast_model:
        bi, uni = F.broadcast(bi), F.broadcast(uni)

    # explode_outer keeps docs with <2 tokens as one NULL-pair row, so
    # no join-back is needed to report them — the whole scoring plan is
    # scan -> explode -> two broadcast joins -> ONE per-doc aggregate
    occ = (
        _tokens_df(df, text_col, [id_col])
        .select(id_col, F.explode_outer(F.expr(_BIGRAMS)).alias("p"))
        .select(id_col, "p.w1", "p.w2")
    )
    lp = F.when(
        F.col("w1").isNotNull(),
        F.coalesce(
            F.col("lp_bi"),
            F.lit(math.log10(alpha)) + F.coalesce(F.col("lp_uni"), F.lit(oov_logp)),
        ),
    )
    return (
        occ.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w2"], "left")
        .select(id_col, F.col("w1").alias("__w1"), lp.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count("__w1").cast("bigint").alias("n_scored"),
            F.avg("lp").alias("avg_logp"),
        )
        .withColumn("ppl", F.pow(F.lit(10.0), -F.col("avg_logp")))
    )


def ppl_buckets(
    scores: DataFrame,
    cuts: tuple[float, float] = (1 / 3, 2 / 3),
    ppl_col: str = "ppl",
    cache_scores: bool = True,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket by perplexity quantiles
    (lower ppl = the model finds the text more natural = head).
    Unscored docs (NULL ppl) land in ``tail``. The two cut points are
    a bounded ``approxQuantile`` driver pull; the labeling itself is a
    map-only projection.

    ``scores`` is evaluated twice (the quantile job now, the labeled
    frame when consumed); ``cache_scores=True`` (default) persists it
    so the scoring pass over the corpus runs once — caller unpersists
    when done. Pass False for an already-materialized frame."""
    lo, hi = sorted(cuts)
    if not 0.0 < lo < hi < 1.0:
        raise ValueError("cuts must satisfy 0 < lo < hi < 1")
    if cache_scores and not scores.is_cached:
        scores.persist()
    q = scores.filter(F.col(ppl_col).isNotNull()).approxQuantile(
        ppl_col, [lo, hi], 1e-4
    )
    if len(q) < 2:  # empty input
        q = [float("inf"), float("inf")]
    return scores.withColumn(
        "bucket",
        F.when(F.col(ppl_col).isNull(), F.lit("tail"))
        .when(F.col(ppl_col) <= F.lit(q[0]), F.lit("head"))
        .when(F.col(ppl_col) <= F.lit(q[1]), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
