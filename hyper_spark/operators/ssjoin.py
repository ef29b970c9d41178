"""Exact set-similarity self-join via prefix filtering (AllPairs /
PPJoin family).

Finds EVERY pair of documents with token-set Jaccard >= threshold —
same output contract as ``dedup.ngram_jaccard_pairs`` — but indexes
only each document's *prefix* instead of its whole token set, following
Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search"
(WWW'07) and Xiao et al., "Efficient Similarity Joins for Near
Duplicate Detection" (WWW'08, PPJoin's position filter).

Why this exists next to the LSH path (dedup.minhash_lsh_pairs) and the
full inverted-index path (dedup.ngram_jaccard_pairs):

* LSH is probabilistic — it misses true pairs with band-dependent
  probability. This join is exact and recall-lossless.
* The full inverted index joins on EVERY token, so its candidate count
  is sum over tokens of df(token)^2 — stop-word-shaped tokens dominate
  and the only defense is the recall-lossy ``max_df`` drop. The prefix
  filter is the recall-LOSSLESS version of the same idea: order tokens
  rarest-first globally, and index only the first
  ``n - ceil(t*n) + 1`` tokens of each document. Two sets with
  Jaccard >= t must share a prefix token (each needs overlap
  >= ceil(t*n) with the other, so disjoint prefixes cap the overlap at
  ceil(t*n) - 1), hence no candidate is ever lost — while frequent
  tokens appear in prefixes only for documents large enough that they
  genuinely need them.

100-TB shape: one shuffle for document frequencies, one groupBy to
order each document's tokens, a self-equi-join on slim
``(id, n, pos, token)`` prefix entries (full token arrays never ride
the join — the minhash "bare band entries" lesson), a candidate-level
position filter (PPJoin Lemma 2 shape: shared-prefix count plus the
tokens remaining after the LAST shared prefix position bounds the
overlap), and an exact verification that joins the token arrays back
for surviving candidates only. Deduplication of candidates happens in
the counting groupBy itself, never as a separate distinct. All stages
are JVM codegen — no Python in the plan.

Reference scope note: the reference engine (GameAnalytics/hyper) has no
similarity-join surface; this operator is part of the engine's
training-data-pipeline extension (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyper_spark.functions.text import (
    char_shingles_col,
    normalized_text,
)
from hyper_spark.operators.util import spread

__all__ = ["similarity_join"]

# Integer-boundary guard for float threshold arithmetic: ceil(t*n) must
# equal the REAL ceil even when the nearest double to t sits above the
# decimal (e.g. t=0.1, n=10 -> 1.0000000000000002 would ceil to 2 and
# silently shorten the prefix — a recall bug). Sizes are integers, so
# backing off by 1e-9 can only ADD candidates; exact verification
# prunes them.
_EPS = 1e-9


def _token_arrays(
    df: DataFrame, id_col: str, text_col: str, tokens: str, shingle_n: int
) -> DataFrame:
    """(id, toks) with toks = DISTINCT token array. Normalized text is
    materialized as a real column first (lambda-CSE: shingling straight
    over normalized_text(text) re-runs the regex per position)."""
    # spread(): a small-file scan arrives as ONE partition and would
    # serialize the regex+shingle stage onto one core (measured 19 s ->
    # ~2 s at sf0.1); no-op on already-wide inputs.
    norm = spread(df).select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__norm")
    )
    if tokens == "shingles":
        arr: Column = char_shingles_col(
            F.col("__norm"), shingle_n, pre_normalized=True
        )
    elif tokens == "words":
        arr = F.array_distinct(F.split(F.col("__norm"), " "))
    else:
        raise ValueError(f"tokens must be 'shingles' or 'words', got {tokens!r}")
    return norm.select(F.col(id_col), arr.alias("toks"))


def similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    tokens: str = "shingles",
    shingle_n: int = 5,
    position_filter: bool = True,
) -> DataFrame:
    """All pairs with exact token-set Jaccard >= ``threshold``.

    Returns DataFrame[id_a, id_b, jaccard] with id_a < id_b; jaccard is
    the exact double |A∩B| / |A∪B| (bit-reproducible in ANSI SQL — the
    driver oracle recomputes it). ``position_filter=False`` disables
    the PPJoin candidate bound (kept for A/B measurement; output is
    identical either way — pytest-asserted).

    CALLER CONTRACT (the minhash_lsh_pairs one): the returned DataFrame
    is eagerly materialized and **persisted** — the token-order table
    feeds the prefix index AND both verification sides, so an uncached
    lineage would re-run the tokenize+order build three times. The big
    intermediate caches are released before return; call
    ``.unpersist()`` on the (small) result when done with it."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)

    sets = _token_arrays(df, id_col, text_col, tokens, shingle_n)
    # explode_outer, not explode: a plain explode INFERS
    # size(toks)>0 AND isnotnull(toks) and pushes the whole
    # regex+shingle tree into that filter, re-evaluating it per row;
    # the post-filter on the GENERATED column cannot sink below the
    # Generate. cached: the token table feeds the frequency count AND
    # the order join — uncached, the tokenize scan runs twice.
    tok = (
        sets.select(
            F.col(id_col).alias("id"), F.explode_outer("toks").alias("token")
        )
        .filter(F.col("token").isNotNull())
        .persist()
    )

    # global rarest-first total order: (document frequency, token)
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df_count"))

    # per-document tokens sorted by that order (struct sort is
    # field-lexicographic), sizes, and the prefix of length
    # n - ceil(t*n) + 1
    ordered = (
        tok.join(dfreq, "token")
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list(F.struct("df_count", "token"))).alias(
                "__ord"
            )
        )
        .select(
            "id",
            F.col("__ord.token").alias("toks"),
            F.size("__ord").alias("n"),
        )
    ).persist()
    ordered.count()  # materialize, then drop the token-table cache
    tok.unpersist()
    prefix_len = (
        F.col("n") - F.ceil(F.lit(t) * F.col("n") - F.lit(_EPS)) + F.lit(1)
    ).cast("int")
    # slice length is per-row; stage it as a real column
    pref = (
        ordered.withColumn("__plen", prefix_len)
        .select(
            "id", "n", F.posexplode(F.slice("toks", F.lit(1), F.col("__plen")))
        )
        .toDF("id", "n", "pos", "token")
        .withColumn("pos", F.col("pos") + F.lit(1))
    )

    a = pref.select(
        F.col("id").alias("id_a"),
        F.col("n").alias("n_a"),
        F.col("pos").alias("pa"),
        "token",
    )
    b = pref.select(
        F.col("id").alias("id_b"),
        F.col("n").alias("n_b"),
        F.col("pos").alias("pb"),
        "token",
    )
    cand = a.join(b, "token").filter(
        (F.col("id_a") < F.col("id_b"))
        # length filter: Jaccard >= t forces t*n_a <= n_b <= n_a/t
        & (F.col("n_b") >= F.lit(t) * F.col("n_a") - F.lit(_EPS))
        & (F.col("n_a") >= F.lit(t) * F.col("n_b") - F.lit(_EPS))
    )
    # candidate dedup AND the position-filter statistics in ONE
    # exchange: both prefixes follow the same global order, so the
    # shared token maximizing pa is the one maximizing pb — every
    # shared token before it is itself a shared prefix token (counted
    # in c), and shared tokens after it number at most
    # min(n_a - pa_max, n_b - pb_max).
    grouped = cand.groupBy("id_a", "id_b", "n_a", "n_b").agg(
        F.count(F.lit(1)).alias("__c"),
        F.max("pa").alias("__pa"),
        F.max("pb").alias("__pb"),
    )
    if position_filter:
        minoverlap = F.ceil(
            F.lit(t / (1.0 + t)) * (F.col("n_a") + F.col("n_b")) - F.lit(_EPS)
        )
        grouped = grouped.filter(
            F.col("__c")
            + F.least(F.col("n_a") - F.col("__pa"), F.col("n_b") - F.col("__pb"))
            >= minoverlap
        )

    # exact verification: token arrays join back for survivors only
    sa = ordered.select(F.col("id").alias("id_a"), F.col("toks").alias("__ta"))
    sb = ordered.select(F.col("id").alias("id_b"), F.col("toks").alias("__tb"))
    inter = F.size(F.array_intersect("__ta", "__tb"))
    verified = (
        grouped.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("__i", inter)
        .withColumn(
            "jaccard",
            F.col("__i") / (F.col("n_a") + F.col("n_b") - F.col("__i")),
        )
        .filter(F.col("jaccard") >= F.lit(t))
        .select("id_a", "id_b", "jaccard")
    ).persist()
    verified.count()  # materialize, then drop the big upstream cache
    ordered.unpersist()
    return verified
