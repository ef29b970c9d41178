"""Data selection by importance resampling (DSIR).

Selecting pretraining data that LOOKS LIKE a trusted target corpus is
the published, measured alternative to hand-tuned quality heuristics:
Xie, Santurkar, Ma & Liang, "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023) fit two bag-of-hashed-n-grams
distributions — target p̂ and raw pool q̂ — weight every raw document
by its likelihood ratio, and Gumbel-top-k sample proportionally to the
weights. This module is that pipeline as pure Spark codegen:

- features: unigram + bigram token instances hashed into ``buckets``
  cells with the repo's md5→conv trick (classifier.py:9 — the same
  public construction CMS rows and deterministic sampling use), so the
  whole feature pipeline is reproducible in ANSI SQL;
- fit: one groupBy(bucket) per corpus — after map-side partial
  aggregation the shuffle is ≤ ``buckets`` rows per partition, never
  the token stream; totals ride a broadcast 1-row crossJoin;
- score: the ≤ ``buckets``-row log-ratio table BROADCAST-joins onto
  the raw pool's feature instances, one groupBy(doc) sum — a single
  document-keyed shuffle for the whole corpus, nothing else;
- select: Gumbel-top-k in log space (log w + Gumbel(u) with u drawn
  from md5 of the doc id — exactly reproducible in SQL), which is
  sampling WITHOUT replacement with probability ∝ exp(log w), the
  paper's resampling step; global top-k is a TakeOrdered (per-partition
  heads then a k-row merge), never a full sort.

Smoothing is Laplace (+1 on every bucket), so unseen-in-target buckets
penalize rather than zero out; documents with no tokens weight 0 (the
neutral ratio). At 100 TB the raw pool is touched twice (fit + score):
both passes are one scan + one bounded shuffle each, and the model
state that moves between them is two ≤ ``buckets``-row tables.

No Python touches a row anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dsir_weights",
    "dsir_select",
]

_MAX_BUCKETS = 1 << 20  # log-ratio table must broadcast


def _bucket(col: Column | str, buckets: int) -> Column:
    """md5→conv→pmod feature hash (classifier.py contract): first 8
    md5 hex chars as an unsigned 32-bit int, mod ``buckets``. DuckDB
    replays it as ('0x' || substring(md5(f), 1, 8))::BIGINT % B."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )


def _feature_instances(
    df: DataFrame, text_col: str, id_col: str, buckets: int
) -> DataFrame:
    """[id, __b]: one row per unigram/bigram token INSTANCE, hashed.
    Tokens are the classifier contract (whitespace split of
    trim(lower(text))); bigrams join consecutive tokens with one
    space. The token array is materialized as a column BEFORE the
    bigram lambda (Catalyst does not CSE across lambda boundaries),
    and the explode is explode_outer + post-filter so the feature
    expression tree never sinks into the Generate's inferred filter."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        ).alias("__t"),
    )
    feats = toks.select(
        "id",
        F.concat(
            F.col("__t"),
            F.transform(
                F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                lambda x, i: F.concat_ws(
                    " ", x, F.element_at(F.col("__t"), i + 2)
                ),
            ),
        ).alias("__f"),
    )
    return (
        feats.select("id", F.explode_outer("__f").alias("__tok"))
        .filter(F.col("__tok").isNotNull())
        .select("id", _bucket("__tok", buckets).alias("__b"))
    )


def _bucket_counts(inst: DataFrame) -> DataFrame:
    """[__b, c]: feature-instance counts per hash bucket — the fitted
    (unnormalized) bag-of-hashed-n-grams distribution."""
    return inst.groupBy("__b").agg(F.count(F.lit(1)).alias("c"))


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    target_text_col: str | None = None,
    length_normalize: bool = False,
) -> DataFrame:
    """Per-document DSIR importance log-weights: [id_col, log_weight]
    for EVERY row of ``df``, where

        log_weight(d) = Σ_{feature instances f ∈ d}
            ln((p̂[f]+1)/(T_p+B)) − ln((q̂[f]+1)/(T_q+B))

    with p̂ fitted on ``target``, q̂ on ``df`` itself, B = ``buckets``,
    T = total feature instances (Laplace smoothing). Positive means
    "more target-like than pool-average". Deterministic — md5-hashed
    features, closed-form fit — so the whole computation replays in
    SQL (gate ``dsir_weights_docs``).

    The POOL-mean of the per-instance log ratio is −KL(q̂‖p̂) ≤ 0 by
    Jensen, so raw log weights scale with document LENGTH times a
    negative constant — harmless for same-length pools (the paper's
    Pile chunks) but a systematic short-doc bias on mixed-length ones.
    ``length_normalize=True`` divides by the document's feature count
    (mean per-instance log ratio), making the score length-free; the
    selection gate pins the raw paper formula."""
    if not 2 <= buckets <= _MAX_BUCKETS:
        raise ValueError(f"buckets must be in [2, {_MAX_BUCKETS}]")
    raw = _feature_instances(df, text_col, id_col, buckets)
    tgt = _feature_instances(
        target, target_text_col or text_col, id_col, buckets
    )
    q = _bucket_counts(raw)
    p = _bucket_counts(tgt)
    tot_q = q.agg(F.sum("c").alias("__tq"))
    tot_p = p.agg(F.sum("c").alias("__tp"))
    # every raw feature instance has a bucket in q by construction, so
    # q LEFT JOIN p covers the whole scoring domain; smoothing keeps
    # target-unseen buckets finite
    lr = (
        q.join(p.withColumnRenamed("c", "cp"), "__b", "left")
        .crossJoin(F.broadcast(tot_q))
        .crossJoin(F.broadcast(tot_p))
        .select(
            "__b",
            (
                F.log(
                    (F.coalesce("cp", F.lit(0)) + 1)
                    / (F.col("__tp") + F.lit(buckets)).cast("double")
                )
                - F.log(
                    (F.col("c") + 1)
                    / (F.col("__tq") + F.lit(buckets)).cast("double")
                )
            ).alias("__lr"),
        )
    )
    agg = (
        (F.sum("__lr") / F.count(F.lit(1)))
        if length_normalize
        else F.sum("__lr")
    )
    scores = (
        raw.join(F.broadcast(lr), "__b")
        .groupBy("id")
        .agg(agg.alias("log_weight"))
    )
    return df.select(F.col(id_col)).join(
        scores.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    seed: str | int = 0,
    target_text_col: str | None = None,
    length_normalize: bool = False,
) -> DataFrame:
    """The paper's resampling step: draw ``k`` documents from ``df``
    WITHOUT replacement with probability ∝ exp(log_weight), via the
    Gumbel-top-k identity — rank by log_weight + Gumbel(u_d) and take
    the k largest, where u_d = (md5-uniform of ``id:seed``) is the
    repo's deterministic-draw contract (exactly reproducible in SQL,
    gate ``dsir_select_docs``). Returns the selected rows of ``df``
    plus ``log_weight``; global top-k is a TakeOrdered, not a sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_weights(
        df, target, text_col, id_col, buckets, target_text_col,
        length_normalize,
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    keyed = w.withColumn("__g", -F.log(-F.log(u)))
    picked = (
        keyed.select(id_col, "log_weight", (F.col("log_weight") + F.col("__g")).alias("__key"))
        .orderBy(F.desc("__key"), F.asc(id_col))
        .limit(k)
        .drop("__key")
    )
    return df.join(picked, id_col)
