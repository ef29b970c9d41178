"""Eval-set contamination measurement: n-gram overlap reporting.

`dedup.decontaminate` / `ssjoin.similarity_join(other=)` FIND
train↔eval near-duplicate pairs so they can be dropped; this module
answers the complementary reporting question every model card needs
(GPT-2/GPT-3-style "percentage of the eval set with n-gram overlap
against the training corpus", Brown et al. 2020 Appendix C; Radford
et al. 2019 §4): for each EVAL document, what fraction of its word
n-grams appears ANYWHERE in the training corpus.

Scale shape (the part worth getting right at 100 TB): the train-side
distinct n-gram set is trillions of grams — never shuffled here.
The eval gram set is small (eval suites are thousands of documents),
so it BROADCASTS, and the train gram stream inner-joins against it
MAP-SIDE: misses — almost everything — die in place without a
shuffle. Survivors are bounded by |eval grams| after map-side partial
distinct, so the only shuffle is ≤ |eval grams| rows per partition.
One scan of train, one bounded shuffle, done. For eval sets too big
to broadcast, ``broadcast_grams=False`` falls back to a shuffled
semi-join keyed on the gram.

Tokens are the classifier contract (whitespace split of
trim(lower(text))), n-grams join ``n`` consecutive tokens with one
space — both exactly reproducible in SQL (gates
``ngram_overlap_docs`` / ``contamination_summary_docs``). No Python
touches a row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ngram_overlap",
    "overlap_summary",
]


def _gram_col(text: Column, n: int) -> Column:
    """Array of word ``n``-grams of ``text`` (space-joined), [] when
    the document has fewer than ``n`` tokens — guarded explicitly
    because Spark's sequence(1, 0) yields a DESCENDING [1, 0], not []."""
    toks = F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda t: t != ""
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_grams: bool = True,
) -> DataFrame:
    """Per-eval-document n-gram overlap against the training corpus:
    [id_col, n_grams, n_overlap, overlap_frac], where ``n_grams``
    counts the document's DISTINCT word n-grams, ``n_overlap`` how
    many of them occur in ANY train document, and ``overlap_frac``
    their ratio (NULL for documents shorter than ``n`` tokens).
    Exact — gram strings join directly, no hashing, no collision
    caveat."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    ev = (
        eval_df.select(
            F.col(id_col).alias("id"),
            F.explode_outer(_gram_col(F.col(text_col), n)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    ev_grams = ev.select("g").distinct()
    if broadcast_grams:
        ev_grams = F.broadcast(ev_grams)
    tr = train.select(
        F.explode_outer(_gram_col(F.col(text_col), n)).alias("g")
    ).filter(F.col("g").isNotNull())
    # map-side broadcast inner join kills misses in place; partial-agg
    # distinct bounds the shuffle at |eval grams| rows per partition
    hits = tr.join(ev_grams, "g").distinct()
    per_doc = (
        ev.join(hits.withColumn("__hit", F.lit(1)), "g", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_overlap"),
        )
    )
    return eval_df.select(F.col(id_col)).join(
        per_doc.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.coalesce("n_overlap", F.lit(0))
            / F.col("n_grams").cast("double"),
        ).alias("overlap_frac"),
    )


def overlap_summary(
    overlap: DataFrame, thresholds=(0.2, 0.5, 0.8)
) -> DataFrame:
    """The model-card table: for each threshold, how many / what
    fraction of eval documents have ``overlap_frac`` >= it (documents
    with NULL overlap_frac — too short to carry any n-gram — count in
    the denominator, never the numerator). Input is ``ngram_overlap``
    output; one scan, all thresholds at once."""
    ths = sorted(set(float(t) for t in thresholds))
    if not ths:
        raise ValueError("thresholds must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum(
            F.when(F.col("overlap_frac") >= F.lit(t), 1).otherwise(0)
        ).alias(f"__c{i}")
        for i, t in enumerate(ths)
    ]
    row = overlap.agg(*aggs)
    out = None
    for i, t in enumerate(ths):
        one = row.select(
            F.lit(t).alias("threshold"),
            F.col(f"__c{i}").cast("long").alias("n_contaminated"),
            "n_docs",
            (F.col(f"__c{i}") / F.col("n_docs").cast("double")).alias(
                "contaminated_frac"
            ),
        )
        out = one if out is None else out.unionByName(one)
    return out
