"""Exact sparse TF-IDF cosine similarity join (the original AllPairs
workload) — every doc pair with cosine(tfidf(a), tfidf(b)) >= t.

This is the WEIGHTED-term similarity axis, completing the module
family: ssjoin answers "same token set" (Jaccard ignores weights and
repetition), editjoin answers "same sequence", semantic_dedup answers
"same dense embedding" — this one answers "same discriminative terms
in similar proportions", the classic near-dup signal for templated /
boilerplate corpora where Jaccard saturates on stop-structure and
embeddings are unavailable.

Weighting (chosen to be exactly ANSI-SQL-replayable, no smoothing
knobs): w(t, d) = tf(t, d) * ln(N / df_t), L2-normalized per doc.
Tokens appearing in EVERY doc get idf 0 and contribute nothing; docs
whose every token is corpus-ubiquitous have zero norm and are
EXCLUDED (no discriminative features — the contract mirrors the NULL
exclusions elsewhere in the family).

Filter chain (Bayardo, Ma & Srikant WWW'07, adapted to the module's
shared-order prefix machinery):

1. **suffix bound**: order every doc's features by the global
   (df, token) rarest-first total order and compute the running
   suffix bound S_k = sum_{j>=k} x_j * maxw(tok_j), where maxw is the
   corpus-wide max normalized weight of the token. If a candidate
   shares nothing with x before position k, their cosine is at most
   S_k — so indexing exactly the positions with S_k >= t loses no
   pair. (S_1 >= sum x_j^2 = 1 >= t, so every living doc indexes at
   least one feature.) A 1e-9 slack absorbs float drift in the
   running sum — extra candidates only, exact verification prunes.
2. **two-sided prefix join**: a qualifying pair must share a token
   inside BOTH prefixes. Proof mirrors ssjoin/editjoin: by (1) each
   side's prefix shares SOME token with the other's full list; if no
   token were common to both prefixes, x's shared token a sits in
   y's suffix (ordered after all of y's prefix, which contains y's
   shared token b), so a > b, and symmetrically b > a — contradiction
   under the shared total order. So the candidate join is slim
   prefix-entry vs prefix-entry on token equality, id_a < id_b.
3. **exact verification**: candidate pairs (deduplicated in the
   counting groupBy) join their tok->weight maps back; the dot
   product is one map_zip_with + aggregate, pure JVM. Unit vectors,
   so the dot product IS the cosine.

100-TB shape: one shuffle for document frequencies, one for per-doc
feature ordering (features of a doc are co-located by construction),
a broadcast of the 1-row corpus count, slim (id, tok) prefix entries
on the candidate join (weights never ride it), and survivor-only
verification. All stages JVM codegen — zero Python in the plan.

Reference scope note: the reference engine (GameAnalytics/hyper) has
no similarity-join surface; this operator is part of the engine's
training-data-pipeline extension (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hyper_spark.functions.text import char_shingles_col, normalized_text
from hyper_spark.operators.util import spread

__all__ = ["cosine_similarity_join"]

_EPS = 1e-9


def _term_freqs(
    df: DataFrame, id_col: str, text_col: str, tokens: str, shingle_n: int
) -> DataFrame:
    """(id, tok, tf) — term OCCURRENCE counts (tf matters here, unlike
    the set-semantics joins)."""
    norm = spread(df).select(
        F.col(id_col).alias("id"),
        normalized_text(F.col(text_col)).alias("__norm"),
    )
    if tokens == "shingles":
        # positional shingles WITHOUT the distinct: multiplicity is tf
        n_sh = F.length("__norm") - F.lit(shingle_n - 1)
        positions = F.when(
            n_sh >= 1, F.sequence(F.lit(1), n_sh)
        ).otherwise(F.array().cast("array<int>"))
        arr: Column = F.transform(
            positions, lambda i: F.col("__norm").substr(i, F.lit(shingle_n))
        )
    elif tokens == "words":
        arr = F.filter(
            F.split(F.col("__norm"), " "), lambda t: t != F.lit("")
        )
    else:
        raise ValueError(f"tokens must be 'shingles' or 'words', got {tokens!r}")
    return (
        norm.select("id", F.explode_outer(arr).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def cosine_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    tokens: str = "words",
    shingle_n: int = 5,
) -> DataFrame:
    """All pairs with exact TF-IDF cosine >= ``threshold``:
    DataFrame[id_a, id_b, cosine] with id_a < id_b.

    ``threshold`` must be in (0, 1]. Weighting is fixed (raw tf x
    ln(N/df), L2-normalized) so the driver oracle can recompute it
    verbatim; zero-norm docs (all tokens ubiquitous) are excluded.

    CALLER CONTRACT (the family's): result eagerly materialized and
    persisted; ``.unpersist()`` when done."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)

    tfs = _term_freqs(df, id_col, text_col, tokens, shingle_n).persist()
    n_docs = tfs.select("id").distinct().count()
    dfreq = tfs.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))

    raw = tfs.join(dfreq, "tok").withColumn(
        "__w",
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t")),
    )
    norms = raw.groupBy("id").agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__norm")
    )
    # cached: weights feed maxw, the prefix walk, AND both verify maps
    weights = (
        raw.join(norms, "id")
        .filter(F.col("__norm") > 0)
        .select(
            "id",
            "tok",
            "df_t",
            (F.col("__w") / F.col("__norm")).alias("w"),
        )
        .persist()
    )
    weights.count()
    tfs.unpersist()

    maxw = weights.groupBy("tok").agg(F.max("w").alias("__maxw"))
    # suffix bound along the global rarest-first (df_t, tok) order;
    # features of one doc are co-located, so this window shuffles by id
    # once. 1e-9 slack: candidates only, never recall.
    suffix_w = (
        Window.partitionBy("id")
        .orderBy("df_t", "tok")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prefix = (
        weights.join(maxw, "tok")
        .withColumn(
            "__sfx", F.sum(F.col("w") * F.col("__maxw")).over(suffix_w)
        )
        .filter(F.col("__sfx") >= F.lit(t - _EPS))
        .select("id", "tok")
    )

    a = prefix.select(F.col("id").alias("id_a"), "tok")
    b = prefix.select(F.col("id").alias("id_b"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .drop("__c")
    )

    vecs = weights.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("tok", "w"))).alias("__m")
    )
    ma = vecs.select(F.col("id").alias("id_a"), F.col("__m").alias("__ma"))
    mb = vecs.select(F.col("id").alias("id_b"), F.col("__m").alias("__mb"))
    dot = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "__ma",
                "__mb",
                lambda _, v1, v2: F.coalesce(v1, F.lit(0.0))
                * F.coalesce(v2, F.lit(0.0)),
            )
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    verified = (
        cand.join(ma, "id_a")
        .join(mb, "id_b")
        .withColumn("cosine", dot)
        .filter(F.col("cosine") >= F.lit(t))
        .select("id_a", "id_b", "cosine")
    ).persist()
    verified.count()
    weights.unpersist()
    return verified
