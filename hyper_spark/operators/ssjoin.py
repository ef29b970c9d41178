"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin
family) — self-join and cross-corpus (R-S) modes.

Finds EVERY pair of documents with token-set Jaccard >= threshold —
same output contract as ``dedup.ngram_jaccard_pairs`` — but indexes
only each document's *prefix* instead of its whole token set, following
Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search"
(WWW'07) and Xiao et al., "Efficient Similarity Joins for Near
Duplicate Detection" (WWW'08, PPJoin's position filter).

Why this exists next to the LSH path (dedup.minhash_lsh_pairs) and the
full inverted-index path (dedup.ngram_jaccard_pairs):

* LSH is probabilistic — it misses true pairs with band-dependent
  probability. This join is exact and recall-lossless (the
  cross-corpus mode is therefore the exact upgrade of
  ``dedup.decontaminate``'s minhash screen).
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
  genuinely need them. Measured at sf0.1: 23.4 s vs 482 s (20.6x) for
  identical output (BENCH/BASELINE.md).

100-TB shape: one shuffle for document frequencies (over the UNION of
both corpora in R-S mode — the total order must be shared), one
groupBy per corpus to order each document's tokens, an equi-join on
slim ``(id, n, pos, token)`` prefix entries (full token arrays never
ride the join — the minhash "bare band entries" lesson), a
candidate-level position filter (PPJoin shape: shared-prefix count
plus the tokens remaining after the LAST shared prefix position bounds
the overlap), and an exact verification that joins the token arrays
back for surviving candidates only. Deduplication of candidates
happens in the counting groupBy itself, never as a separate distinct.
All stages are JVM codegen — no Python in the plan.

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
        F.col(id_col).alias("id"),
        normalized_text(F.col(text_col)).alias("__norm"),
    )
    if tokens == "shingles":
        arr: Column = char_shingles_col(
            F.col("__norm"), shingle_n, pre_normalized=True
        )
    elif tokens == "words":
        arr = F.array_distinct(F.split(F.col("__norm"), " "))
    else:
        raise ValueError(f"tokens must be 'shingles' or 'words', got {tokens!r}")
    return norm.select("id", arr.alias("toks"))


def _exploded(sets: DataFrame) -> DataFrame:
    """(id, token) rows. explode_outer, not explode: a plain explode
    INFERS size(toks)>0 AND isnotnull(toks) and pushes the whole
    regex+shingle tree into that filter, re-evaluating it per row; the
    post-filter on the GENERATED column cannot sink below the
    Generate."""
    return sets.select(
        "id", F.explode_outer("toks").alias("token")
    ).filter(F.col("token").isNotNull())


def _ordered(tok: DataFrame, dfreq: DataFrame) -> DataFrame:
    """(id, toks sorted rarest-first, n): per-document tokens sorted by
    the global (document frequency, token) total order — struct sort is
    field-lexicographic."""
    return (
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
    )


def _prefix_entries(ordered: DataFrame, t: float) -> DataFrame:
    """Slim (id, n, pos, token) rows for the first n - ceil(t*n) + 1
    tokens of each document (pos is 1-based)."""
    prefix_len = (
        F.col("n") - F.ceil(F.lit(t) * F.col("n") - F.lit(_EPS)) + F.lit(1)
    ).cast("int")
    return (
        ordered.withColumn("__plen", prefix_len)
        .select(
            "id", "n", F.posexplode(F.slice("toks", F.lit(1), F.col("__plen")))
        )
        .toDF("id", "n", "pos", "token")
        .withColumn("pos", F.col("pos") + F.lit(1))
    )


def similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    tokens: str = "shingles",
    shingle_n: int = 5,
    position_filter: bool = True,
    other: DataFrame | None = None,
    other_id_col: str | None = None,
    other_text_col: str | None = None,
) -> DataFrame:
    """All pairs with exact token-set Jaccard >= ``threshold``.

    Self-join (default): DataFrame[id_a, id_b, jaccard] with
    id_a < id_b. Cross-corpus mode (``other`` given, the exact
    decontamination shape): id_a comes from ``df``, id_b from
    ``other``, every qualifying cross pair is returned (no ordering
    constraint — the two id namespaces are independent), and the
    rarest-first token order is computed over the UNION of both
    corpora so both prefix indexes follow one shared total order.

    jaccard is the exact double |A∩B| / |A∪B| (bit-reproducible in
    ANSI SQL — the driver oracle recomputes it). ``position_filter=
    False`` disables the PPJoin candidate bound (kept for A/B
    measurement; output is identical either way — pytest-asserted).

    CALLER CONTRACT (the minhash_lsh_pairs one): the returned DataFrame
    is eagerly materialized and **persisted** — each token-order table
    feeds its prefix index AND a verification side, so an uncached
    lineage would re-run the tokenize+order build three times. The big
    intermediate caches are released before return; call
    ``.unpersist()`` on the (small) result when done with it."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)
    cross = other is not None

    sets_a = _token_arrays(df, id_col, text_col, tokens, shingle_n)
    # cached: each token table feeds the frequency count AND the order
    # join — uncached, the tokenize scan runs twice per corpus.
    tok_a = _exploded(sets_a).persist()
    if cross:
        sets_b = _token_arrays(
            other,
            other_id_col or id_col,
            other_text_col or text_col,
            tokens,
            shingle_n,
        )
        tok_b = _exploded(sets_b).persist()
        dfreq = (
            tok_a.unionByName(tok_b)
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("df_count"))
        )
    else:
        tok_b = tok_a
        dfreq = tok_a.groupBy("token").agg(F.count(F.lit(1)).alias("df_count"))

    ordered_a = _ordered(tok_a, dfreq).persist()
    ordered_a.count()  # materialize, then drop the token-table cache
    ordered_b = ordered_a
    if cross:
        ordered_b = _ordered(tok_b, dfreq).persist()
        ordered_b.count()
        tok_b.unpersist()
    tok_a.unpersist()

    a = _prefix_entries(ordered_a, t).select(
        F.col("id").alias("id_a"),
        F.col("n").alias("n_a"),
        F.col("pos").alias("pa"),
        "token",
    )
    b = _prefix_entries(ordered_b, t).select(
        F.col("id").alias("id_b"),
        F.col("n").alias("n_b"),
        F.col("pos").alias("pb"),
        "token",
    )
    # length filter: Jaccard >= t forces t*n_a <= n_b <= n_a/t
    length_ok = (F.col("n_b") >= F.lit(t) * F.col("n_a") - F.lit(_EPS)) & (
        F.col("n_a") >= F.lit(t) * F.col("n_b") - F.lit(_EPS)
    )
    cand = a.join(b, "token").filter(
        length_ok if cross else (F.col("id_a") < F.col("id_b")) & length_ok
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
    sa = ordered_a.select(F.col("id").alias("id_a"), F.col("toks").alias("__ta"))
    sb = ordered_b.select(F.col("id").alias("id_b"), F.col("toks").alias("__tb"))
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
    verified.count()  # materialize, then drop the big upstream caches
    ordered_a.unpersist()
    if cross:
        ordered_b.unpersist()
    return verified
