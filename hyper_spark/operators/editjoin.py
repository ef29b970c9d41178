"""Exact edit-distance (Levenshtein) similarity join via q-gram prefix
filtering — self-join and cross-corpus (R-S) modes.

Finds EVERY pair of strings with Levenshtein distance <= ``max_dist``,
following Gravano et al., "Approximate String Joins in a Database
(Almost) for Free" (VLDB'01, the q-gram count filter) and Xiao, Wang &
Lin, "Ed-Join: an efficient algorithm for similarity joins with edit
distance constraints" (VLDB'08, the prefix-filter shape). This is the
CHARACTER-level complement of operators/ssjoin.py's token-set join:
ssjoin answers "mostly the same tokens, any order"; this answers
"nearly the same string" — typo-level duplicates, templated IDs,
OCR/transcription noise — with an exact metric a token-set Jaccard
cannot express.

Filter chain (each stage recall-LOSSLESS; proofs in comments):

1. **q-gram count bound**: one edit operation changes at most ``q``
   of a string's overlapping q-grams (a substitution rewrites the q
   grams covering its position; an insert/delete rewrites <= q grams
   and only SHIFTS the rest, which as a multiset is identity), so
   ed(a,b) <= d forces the gram multisets to share >= max(Ga,Gb) - q*d
   occurrences (Ga = len(a)-q+1).
2. **prefix filter**: order every string's gram occurrences by the
   global (document frequency, gram) total order and index only the
   first min(Ga, q*d+1) of them. Two multisets with required overlap
   o >= 1 must share a gram VALUE inside both prefixes — if the
   prefixes were value-disjoint, the >= o shared occurrences would
   all sit in the two (o-1)-sized suffixes, and the global order
   makes that contradictory (a shared value in a's suffix is larger
   than all of a's prefix, hence larger than any shared value in b's
   prefix, and vice versa). o = max(Ga,Gb) - q*d >= 1 whenever either
   string has more than q*d grams.
3. **short pool**: strings with Ga <= q*d grams (length <= q*d+q-1,
   including the gram-less length < q) get no guarantee from (1), so
   they pair amongst themselves by a length-band equi-join instead
   (|len(a)-len(b)| <= d is necessary for ed <= d). A short x long
   pair still satisfies o >= 1 — the long side supplies it — so the
   gram join covers it; the pool is short x short only, and "short"
   is a constant-bounded length (q=2, d=3 -> <= 9 chars), so the
   band join's per-length group is the only skew surface and its
   membership is structurally tiny relative to the corpus.
4. **exact verification**: texts join back for DEDUPLICATED surviving
   candidates only; ``F.levenshtein(a, b, max_dist)`` is Spark's
   banded O(d*len) JVM kernel (returns -1 above the threshold), so
   the expensive unbanded DP never runs.

100-TB shape: one explicit-count gram exchange feeding BOTH the
global gram frequencies (over the UNION of both corpora in R-S mode —
the order must be shared) and the prefix build, one groupBy to sort
each string's grams, then the ssjoin HYBRID candidate generator over
slim ``(id, len, gram)`` prefix entries (texts never ride candidate
generation — the minhash "bare band entries" lesson; small-m grams
take the plain equi-join, hot grams id-sorted arrays with the chunked
skew fan-out), candidate dedup in the counting groupBy itself, and a
verification join that carries texts for survivors only. All
character-join stages are JVM codegen — no Python anywhere in the
plan (the token-sequence variant's banded DP verification is the one
Arrow-batched Python stage, as documented below).

Reference scope note: the reference engine (GameAnalytics/hyper) has no
string-join surface; this operator is part of the engine's
training-data-pipeline extension (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hyper_spark.operators.util import spread, widen_for_explosion

__all__ = ["edit_distance_join", "token_edit_distance_join"]


def _strings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, s, len) with NULL texts dropped (ed(NULL, x) is undefined;
    callers wanting NULL-as-empty can coalesce upstream)."""
    return (
        spread(df)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("s"))
        .filter(F.col("s").isNotNull())
        .withColumn("len", F.length("s"))
    )


def _grams(strings: DataFrame, q: int) -> DataFrame:
    """(id, len, gram) — one row per q-gram OCCURRENCE (multiset kept:
    the count bound is about occurrences, so duplicates must survive).
    sequence(1, n) with n < 1 would generate a DESCENDING range, hence
    the explicit empty-array guard for strings shorter than q."""
    n_grams = F.col("len") - F.lit(q - 1)
    positions = F.when(
        n_grams >= 1, F.sequence(F.lit(1), n_grams)
    ).otherwise(F.array().cast("array<int>"))
    return (
        strings.select(
            "id",
            "len",
            F.explode(
                F.transform(
                    positions, lambda i: F.col("s").substr(i, F.lit(q))
                )
            ).alias("gram"),
        )
    )


def _prefix_entries(
    grams: DataFrame, dfreq: DataFrame, q: int, d: int
) -> DataFrame:
    """Slim (id, len, gram) rows for the first min(G, q*d+1) gram
    occurrences of each string under the global rarest-first
    (df_count, gram) order. Struct sort is field-lexicographic, so one
    sort_array gives the total order; ties between equal grams are
    between identical values and cannot affect the prefix lemma."""
    plen = F.lit(q * d + 1)
    return (
        grams.join(dfreq, "gram")
        .groupBy("id", "len")
        .agg(
            F.sort_array(F.collect_list(F.struct("df_count", "gram"))).alias(
                "__ord"
            )
        )
        .select(
            "id",
            "len",
            F.explode(F.slice(F.col("__ord.gram"), F.lit(1), plen)).alias(
                "gram"
            ),
        )
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 2,
    q: int = 2,
    other: DataFrame | None = None,
    other_id_col: str | None = None,
    other_text_col: str | None = None,
) -> DataFrame:
    """All pairs with exact Levenshtein distance <= ``max_dist``.

    Self-join (default): DataFrame[id_a, id_b, dist] with id_a < id_b.
    Cross-corpus mode (``other`` given): id_a comes from ``df``, id_b
    from ``other``, every qualifying cross pair is returned (the two
    id namespaces are independent; a doc present in both corpora
    matches itself at dist 0), and the global gram-frequency order is
    computed over the UNION of both corpora so both prefix indexes
    follow one shared total order.

    ``dist`` is the exact integer Levenshtein distance (ANSI-SQL
    reproducible — the driver oracle recomputes it with DuckDB's
    ``levenshtein``). ``q`` trades candidate selectivity against
    prefix length q*max_dist+1; q=2 is the Ed-Join default for short-
    to-medium strings.

    CALLER CONTRACT (the ssjoin one): the returned DataFrame is
    eagerly materialized and **persisted** — the string table feeds
    the gram build, the short pool, AND two verification sides, so an
    uncached lineage would re-run the scan four times. The big
    intermediate caches are released before return; call
    ``.unpersist()`` on the (small) result when done with it."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    d = int(max_dist)
    cross = other is not None

    # cached: feeds grams, the short pool, and both verify sides.
    strs_a = _strings(df, id_col, text_col).persist()
    strs_b = strs_a
    if cross:
        strs_b = _strings(
            other, other_id_col or id_col, other_text_col or text_col
        ).persist()

    # widen_for_explosion BEFORE the frequency groupBy: dfreq and the
    # prefix build then share one explicit-count gram exchange, so the
    # whole gram pipeline runs wide — AQE used to coalesce the
    # join+collect_list stage to ONE task (3 s serialized, twice for
    # the self join's two aliases; guide §2.5).
    grams_a = widen_for_explosion(_grams(strs_a, q), "gram")
    grams_b = grams_a if not cross else widen_for_explosion(
        _grams(strs_b, q), "gram"
    )
    dfreq = (
        (grams_a.unionByName(grams_b) if cross else grams_a)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df_count"))
    )

    # candidate generation via the ssjoin grouped-array machinery: each
    # unordered pair emitted once per shared prefix-gram occurrence
    # pair (the same multiset the old a x b join produced), in one
    # explicitly-partitioned stage, hot grams chunk-fanned out. Self
    # mode filters the (id, id) diagonal that duplicate gram
    # occurrences of one string would otherwise pair with themselves.
    from hyper_spark.operators.ssjoin import (
        _candidates_cross,
        _candidates_self,
    )

    fields = (("len", "la", "lb"),)
    ea = _prefix_entries(grams_a, dfreq, q, d).withColumnRenamed(
        "gram", "token"
    )
    if cross:
        eb = _prefix_entries(grams_b, dfreq, q, d).withColumnRenamed(
            "gram", "token"
        )
        gram_cand = _candidates_cross(ea, eb, fields=fields)
    else:
        gram_cand = _candidates_self(ea, fields=fields).filter(
            F.col("id_a") != F.col("id_b")
        )
    # length filter: ed <= d forces |la - lb| <= d
    gram_cand = gram_cand.filter(
        F.abs(F.col("la") - F.col("lb")) <= F.lit(d)
    ).select("id_a", "id_b")

    # short pool: strings with G <= q*d grams pair by length band.
    # Probe emits every length in [len-d, len+d]; index keys its own
    # length — self mode therefore sees each unordered pair once per
    # orientation and the id_a < id_b filter keeps exactly one.
    smax = q * d + q - 1
    short_a = strs_a.filter(F.col("len") <= F.lit(smax))
    short_b = short_a if not cross else strs_b.filter(
        F.col("len") <= F.lit(smax)
    )
    probe = short_a.select(
        F.col("id").alias("id_a"),
        F.explode(
            F.sequence(F.col("len") - F.lit(d), F.col("len") + F.lit(d))
        ).alias("__band"),
    )
    index = short_b.select(F.col("id").alias("id_b"), F.col("len").alias("__band"))
    short_cand = probe.join(index, "__band").select("id_a", "id_b")
    if not cross:
        short_cand = short_cand.filter(F.col("id_a") < F.col("id_b"))

    # candidate dedup in the counting groupBy (one exchange), then
    # exact banded verification over texts joined back for survivors.
    cand = (
        gram_cand.unionByName(short_cand)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .drop("__c")
    )
    sa = strs_a.select(F.col("id").alias("id_a"), F.col("s").alias("__sa"))
    sb = strs_b.select(F.col("id").alias("id_b"), F.col("s").alias("__sb"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "dist", F.levenshtein(F.col("__sa"), F.col("__sb"), d)
        )
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    ).persist()
    verified.count()  # materialize, then drop the string-table caches
    strs_a.unpersist()
    if cross:
        strs_b.unpersist()
    return verified


def banded_token_lev(x, y, dmax: int) -> int:
    """Token-sequence Levenshtein, banded to |i-j| <= dmax (Ukkonen's
    O(dmax * len) diagonal band — cells outside the band cannot sit on
    any path of cost <= dmax). Returns -1 when the distance exceeds
    ``dmax``. Pure python on two sequences; the join calls it only for
    deduplicated candidate survivors."""
    n, m = len(x), len(y)
    if abs(n - m) > dmax:
        return -1
    big = dmax + 1
    prev = {j: j for j in range(0, min(m, dmax) + 1)}
    for i in range(1, n + 1):
        lo, hi = max(1, i - dmax), min(m, i + dmax)
        cur = {}
        if i <= dmax:
            cur[0] = i
        xi = x[i - 1]
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev.get(j, big) + 1,
                cur.get(j - 1, big) + 1,
                prev.get(j - 1, big) + (0 if xi == y[j - 1] else 1),
            )
        if not cur or min(cur.values()) > dmax:
            return -1
        prev = cur
    out = prev.get(m, big)
    return out if out <= dmax else -1


def _seqs(df: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """(id, toks, n) with NULL arrays dropped and NULL elements
    filtered (a NULL token is not a token; callers wanting a
    placeholder can coalesce upstream)."""
    return (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.filter(
                F.col(tokens_col), lambda t: t.isNotNull()
            ).alias("toks"),
        )
        .filter(F.col("toks").isNotNull())
        .withColumn("n", F.size("toks"))
    )


def _token_grams(seqs: DataFrame, q: int) -> DataFrame:
    """(id, n, tok) — one row per token q-GRAM occurrence (q
    consecutive tokens joined with an unprintable separator; q=1 is
    the plain unigram stream). Multiset kept. ``n`` stays the TOKEN
    count — the length filter and short pool reason about token
    edits, not gram counts."""
    if q == 1:
        return seqs.select("id", "n", F.explode("toks").alias("tok"))
    n_grams = F.col("n") - F.lit(q - 1)
    positions = F.when(
        n_grams >= 1, F.sequence(F.lit(1), n_grams)
    ).otherwise(F.array().cast("array<int>"))
    return seqs.select(
        "id",
        "n",
        F.explode(
            F.transform(
                positions,
                lambda i: F.array_join(
                    F.slice(F.col("toks"), i, F.lit(q)), "\x00"
                ),
            )
        ).alias("tok"),
    )


def _token_prefix_entries(
    grams: DataFrame, dfreq: DataFrame, q: int, d: int
) -> DataFrame:
    """Slim (id, n, tok) rows for each sequence's min(G, q*d+1)
    globally rarest gram OCCURRENCES — the same prefix lemma as the
    character join, over token q-grams: one token edit perturbs at
    most q gram occurrences, so ed <= d forces a shared occurrence
    inside both (q*d+1)-prefixes whenever either side has more than
    q*d grams."""
    return (
        grams.join(dfreq, "tok")
        .groupBy("id", "n")
        .agg(
            F.sort_array(F.collect_list(F.struct("df_count", "tok"))).alias(
                "__ord"
            )
        )
        .select(
            "id",
            "n",
            F.explode(
                F.slice(F.col("__ord.tok"), F.lit(1), F.lit(q * d + 1))
            ).alias("tok"),
        )
    )


def token_edit_distance_join(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_dist: int = 2,
    q: int = 1,
    other: DataFrame | None = None,
    other_id_col: str | None = None,
    other_tokens_col: str | None = None,
) -> DataFrame:
    """All pairs of token SEQUENCES within Levenshtein distance
    ``max_dist``, where an edit inserts, deletes, or substitutes one
    whole token — the ORDER-AWARE complement of ssjoin's token-set
    Jaccard (which cannot distinguish "same steps, different order"
    from "same steps"), and the token-level analogue of the character
    join above. The natural unit for agent-trajectory analysis: turn
    paths (role:tool per turn) within d edits are retries / forks of
    the same run.

    Input is an ``array<string>`` column (the caller owns
    tokenization — turn tokens, words, whatever). Self-join returns
    [id_a, id_b, dist] with id_a < id_b; cross mode mirrors
    ``edit_distance_join``.

    Filter chain: the module's gram machinery over token q-grams (q
    consecutive tokens; default q=1 = unigrams) — one token edit
    perturbs at most q gram occurrences, so ed <= d forces
    >= max(G_a, G_b) - q*d shared occurrences; prefix = the q*d+1
    globally rarest gram occurrences; sequences below the gram-count
    guarantee (n <= q*d + q - 1 tokens) pair by the length-band pool.
    ``q`` is the vocab-selectivity knob exactly as in the character
    join: templated turn-token vocabs (|V| ~ 64) drown q=1 in
    frequent-gram candidates at ~100k sequences, while q=2's |V|^2
    bigram space restores selectivity (measured in
    BENCH/BASELINE.md).
    Verification is the ONE Python stage in the module: Spark has no
    array Levenshtein, so survivors (already deduplicated, texts
    joined back) run ``banded_token_lev`` — Ukkonen-banded
    O(d * len) — inside an Arrow-batched pandas UDF. Candidates never
    touch Python; only verified-pair volume does.

    CALLER CONTRACT: result persisted (same as edit_distance_join);
    unpersist when done."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    d = int(max_dist)
    cross = other is not None

    @pandas_udf("int")
    def _dist(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [banded_token_lev(list(x), list(y), d) for x, y in zip(a, b)],
            dtype="int32",
        )

    seqs_a = _seqs(df, id_col, tokens_col).persist()
    seqs_b = seqs_a
    if cross:
        seqs_b = _seqs(
            other, other_id_col or id_col, other_tokens_col or tokens_col
        ).persist()

    # same wide-exchange + grouped-array candidate shape as the
    # character join above (see comments there)
    grams_a = widen_for_explosion(_token_grams(seqs_a, q), "tok")
    grams_b = grams_a if not cross else widen_for_explosion(
        _token_grams(seqs_b, q), "tok"
    )
    dfreq = (
        (grams_a.unionByName(grams_b) if cross else grams_a)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df_count"))
    )

    from hyper_spark.operators.ssjoin import (
        _candidates_cross,
        _candidates_self,
    )

    fields = (("n", "na", "nb"),)
    ea = _token_prefix_entries(grams_a, dfreq, q, d).withColumnRenamed(
        "tok", "token"
    )
    if cross:
        eb = _token_prefix_entries(grams_b, dfreq, q, d).withColumnRenamed(
            "tok", "token"
        )
        gram_cand = _candidates_cross(ea, eb, fields=fields)
    else:
        gram_cand = _candidates_self(ea, fields=fields).filter(
            F.col("id_a") != F.col("id_b")
        )
    gram_cand = gram_cand.filter(
        F.abs(F.col("na") - F.col("nb")) <= F.lit(d)
    ).select("id_a", "id_b")

    smax = q * d + q - 1
    short_a = seqs_a.filter(F.col("n") <= F.lit(smax))
    short_b = short_a if not cross else seqs_b.filter(
        F.col("n") <= F.lit(smax)
    )
    probe = short_a.select(
        F.col("id").alias("id_a"),
        F.explode(
            F.sequence(F.col("n") - F.lit(d), F.col("n") + F.lit(d))
        ).alias("__band"),
    )
    index = short_b.select(F.col("id").alias("id_b"), F.col("n").alias("__band"))
    short_cand = probe.join(index, "__band").select("id_a", "id_b")
    if not cross:
        short_cand = short_cand.filter(F.col("id_a") < F.col("id_b"))

    cand = (
        gram_cand.unionByName(short_cand)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .drop("__c")
    )
    sa = seqs_a.select(F.col("id").alias("id_a"), F.col("toks").alias("__ta"))
    sb = seqs_b.select(F.col("id").alias("id_b"), F.col("toks").alias("__tb"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", _dist(F.col("__ta"), F.col("__tb")))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    ).persist()
    verified.count()
    seqs_a.unpersist()
    if cross:
        seqs_b.unpersist()
    return verified
