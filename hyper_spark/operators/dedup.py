"""Deduplication operators for training-data pipelines.

Five strategies, all Spark-first (JVM expressions end-to-end unless
noted; nothing touches per-row Python):

exact
    winner-per-fingerprint (md5 of normalized text); groupBy + min —
    one shuffle keyed by the 128-bit fingerprint, trivially scalable and
    DuckDB-reproducible for the correctness oracle.

minhash + LSH
    normalized text → vectorized rolling-hash shingles + H universal-hash
    permutations h_i(x) = (a_i·x + b_i) mod p, all as one numpy broadcast
    per Arrow batch (only signatures shuffle) → band hashes (JVM) →
    candidate pairs from band-bucket self-join → two-stage signature-
    agreement filter (prefix then full, JVM zip_with) → exact Jaccard
    verification on hashed-shingle int arrays. Shuffles are keyed by
    (band, hash): hot buckets only form for genuinely similar docs.
    p = 2^31 - 1 keeps a·x inside signed-64 (no overflow).

simhash
    64-bit simhash: JVM xxhash64 per token, bit votes accumulated as one
    numpy broadcast per Arrow batch; candidate generation by 16-bit
    block equality (4 blocks cover all pairs with Hamming distance ≤ 3
    by pigeonhole), verification via bit_count(xor).

n-gram Jaccard (exact)
    inverted-index self-join on shingles with a document-frequency cap
    to bound join fan-out (the cap is the standard scale lever: a
    shingle in >max_df docs contributes O(df²) candidate pairs and near
    zero signal).

embedding cosine
    random-hyperplane LSH bucketing (the only pandas-UDF stage — one
    matmul per Arrow batch) → within-bucket pairs → cosine via JVM
    zip_with/aggregate; brute mode for small inputs / recall baselines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from hyper_spark.functions.text import (
    char_shingles_col,
    fingerprint_col,
    normalized_text,
    word_tokens_col,
)
from hyper_spark.operators.util import spread as _spread
from hyper_spark.operators.util import widen_for_explosion

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "incremental_dedup",
    "incremental_near_dedup",
    "write_signature_store",
    "read_signature_store",
    "minhash_join_pairs",
    "decontaminate",
    "simhash_col_agg",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_pairs",
    "embedding_join_pairs",
    "semantic_decontaminate",
    "cosine_col",
    "substring_dup_spans",
    "strip_dup_spans",
]

_MERSENNE31 = (1 << 31) - 1


# --------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one winner (min id) per normalized-text fingerprint."""
    fp = fingerprint_col(F.col(text_col)).alias("fingerprint")
    winners = (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
    )
    # no broadcast hint: winners is O(distinct docs) — let AQE choose
    return df.join(winners.select(id_col), on=id_col, how="leftsemi")


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fingerprint groups with >1 member: (fingerprint, dup_count, keep_id)."""
    fp = fingerprint_col(F.col(text_col)).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def incremental_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_bits: int | None = None,
    self_dedup: bool = True,
    seen_fp_col: str | None = None,
) -> DataFrame:
    """Rows of ``new_df`` not already present in a prior corpus: the
    cross-ingest dedup every growing training set needs (only fresh
    documents proceed to tokenization / packing).

    Membership is by normalized-text fingerprint (``fingerprint_col``).
    With ``self_dedup`` the new batch is also deduped against itself
    (min-id winner), so the output is ingestible as the next corpus
    increment with no internal dupes.

    Scale: the exact check is an anti join keyed by fingerprint — one
    shuffle bounded by the *new batch*, not the historical corpus, when
    ``seen_fp_col`` points at a pre-computed fingerprint store (a table
    of fingerprints maintained across ingests — pass the store as
    ``seen_df`` and name its column; without it the seen side re-scans
    and re-normalizes the whole history every increment). ``bloom_bits``
    enables a Bloom pre-filter built from the seen fingerprints: rows
    whose fingerprint is definitely-new skip the join entirely, so the
    shuffled volume drops to (true dupes + false-positive rate) — the
    right shape when daily increments are large and overlap is small.
    """
    from hyper_spark.operators.bloom_agg import bloom_by, bloom_might_contain

    fp = fingerprint_col(F.col(text_col))
    tagged = new_df.withColumn("__fp", fp)
    if seen_fp_col is not None:
        seen_fps = seen_df.select(F.col(seen_fp_col).alias("__fp")).distinct()
    else:
        seen_fps = seen_df.select(
            fingerprint_col(F.col(text_col)).alias("__fp")
        ).distinct()

    if bloom_bits:
        bloom = bloom_by(seen_fps, [], F.col("__fp"), m_bits=bloom_bits)
        flagged = bloom_might_contain(bloom, tagged, "__fp", alias="__maybe")
        definite_new = flagged.filter(~F.col("__maybe")).drop("__maybe")
        suspects = flagged.filter(F.col("__maybe")).drop("__maybe")
        checked = suspects.join(seen_fps, on="__fp", how="left_anti")
        fresh = definite_new.unionByName(checked)
    else:
        fresh = tagged.join(seen_fps, on="__fp", how="left_anti")

    if self_dedup:
        # window winner, not agg+semi-join: the semi join would evaluate
        # fresh's lineage (regex fingerprints + the bloom probe) once per
        # branch — the same tradeoff measured in corpus.prepare_corpus
        from pyspark.sql.window import Window

        w = Window.partitionBy("__fp").orderBy(id_col)
        fresh = (
            fresh.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return fresh.drop("__fp")


# ------------------------------------------------- signature store

_STORE_PARAM_KEYS = (
    "id_col", "text_col", "num_hashes", "bands", "shingle_n",
    "threshold", "seed",
)


def write_signature_store(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 7,
    mode: str = "overwrite",
) -> None:
    """Persist a corpus's minhash signatures (+ hashed shingle sets)
    so future ingests never re-scan its text: ``{path}/signatures``
    (parquet) plus ``{path}/params`` (one row pinning every parameter
    that makes signatures comparable — ``incremental_near_dedup`` reads
    THESE for the new batch, so two stores built with different seeds
    cannot be silently mixed).

    At 100-TB scale this is the difference between an increment costing
    O(|batch|) and O(|history|): the store is the only artifact of the
    history the fuzzy-dedup path needs."""
    sig = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_n, seed,
        include_shingle_hashes=True,
    )
    sig.write.mode(mode).parquet(f"{path}/signatures")
    # params row built from JVM literals over range(1), NOT
    # createDataFrame([dict]): the local-list path runs a Python task
    # whose worker spawn cost 4.5 s of the store build (profiled r6) —
    # for ONE row of constants.
    df.sparkSession.range(1).select(
        F.lit(bands).cast("long").alias("bands"),
        F.lit(id_col).alias("id_col"),
        F.lit(num_hashes).cast("long").alias("num_hashes"),
        F.lit(seed).cast("long").alias("seed"),
        F.lit(shingle_n).cast("long").alias("shingle_n"),
        F.lit(text_col).alias("text_col"),
        F.lit(float(threshold)).alias("threshold"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def read_signature_store(spark, path: str) -> tuple[DataFrame, dict]:
    """(signatures DataFrame, params dict) from a
    ``write_signature_store`` layout."""
    params = spark.read.parquet(f"{path}/params").collect()[0].asDict()
    missing = [k for k in _STORE_PARAM_KEYS if k not in params]
    if missing:
        raise ValueError(f"signature store {path} missing params {missing}")
    return spark.read.parquet(f"{path}/signatures"), params


def incremental_near_dedup(
    new_df: DataFrame,
    store_path: str,
    keep: str = "min_id",
    max_bucket: int | None = None,
    cross_cap: int | None = None,
    update_store: bool = True,
) -> DataFrame:
    """Fuzzy-dedup an ingest batch against a growing corpus WITHOUT
    re-scanning the corpus: rows of ``new_df`` that are near-dups
    (jaccard ≥ the store's threshold) of any historical doc are
    dropped, the remainder is near-deduped against itself
    (``near_dedup`` semantics, ``keep`` policy), and with
    ``update_store`` the survivors' signatures are appended so the next
    batch sees them.

    All comparison parameters come from the store's params row — a
    batch cannot be hashed incompatibly with the history it joins.
    ``max_bucket`` is passed to BOTH joins (the history-side cap on the
    cross join and the star-join cap on the within-batch self join) —
    set it for templated/boilerplate corpora, where it is the
    difference between O(|L_b|·|R_b|) and O(|L_b|) per band bucket.
    ``cross_cap`` bounds screened candidates per batch doc on the
    history join (``minhash_join_pairs(per_left_cap=)``) — existence
    semantics, opt-in: measured on the templated transcript corpus it
    trades ~4% missed contamination for ~1.4× speed (the band-count
    rank cannot separate one-band true matches from one-band noise),
    so the exact default is None.

    Scale shape: the history contributes only its signature table
    (O(|history|) longs, not text) to one banded join whose output is
    bounded by true near-dups; everything else is O(|batch|).
    """
    from hyper_spark.operators.graph import near_dedup

    spark = new_df.sparkSession
    store_sig, p = read_signature_store(spark, store_path)
    id_col, text_col = p["id_col"], p["text_col"]
    new_sig = minhash_signatures(
        new_df, id_col, text_col, p["num_hashes"], p["shingle_n"],
        p["seed"], include_shingle_hashes=True,
    ).persist()
    cross = minhash_join_pairs(
        None, None, id_col=id_col, text_col=text_col,
        num_hashes=p["num_hashes"], bands=p["bands"],
        shingle_n=p["shingle_n"], threshold=p["threshold"],
        seed=p["seed"], left_sig=new_sig, right_sig=store_sig,
        max_bucket=max_bucket, per_left_cap=cross_cap,
    )
    contaminated = (
        cross.select(F.col("id_l").alias(id_col)).distinct().persist()
    )
    contaminated.count()
    cross.unpersist()
    fresh = new_df.join(contaminated, on=id_col, how="left_anti")
    # persisted: the self-join reads the injected signature table ~6
    # times (band entries, two screens × two sides, verification) and
    # an un-persisted anti-join lineage would re-run for each
    fresh_sig = new_sig.join(
        contaminated, on=id_col, how="left_anti"
    ).persist()
    pairs_self = minhash_lsh_pairs(
        fresh, id_col=id_col, text_col=text_col,
        num_hashes=p["num_hashes"], bands=p["bands"],
        shingle_n=p["shingle_n"], threshold=p["threshold"],
        seed=p["seed"], max_bucket=max_bucket, sig=fresh_sig,
    )
    out = near_dedup(
        fresh, id_col=id_col, text_col=text_col, pairs=pairs_self,
        keep=keep,
    ).localCheckpoint(eager=True)
    pairs_self.unpersist()
    fresh_sig.unpersist()
    contaminated.unpersist()
    if update_store:
        new_sig.join(
            out.select(id_col), on=id_col, how="leftsemi"
        ).write.mode("append").parquet(f"{store_path}/signatures")
    new_sig.unpersist()
    return out


# --------------------------------------------------------------- minhash


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE31, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    shingle_n: int = 5,
    seed: int = 7,
    include_shingle_hashes: bool = False,
) -> DataFrame:
    """DataFrame[id, signature array<bigint>] (+ optional hashed shingle
    sets). Normalization is JVM; shingling + permutations are one numpy
    broadcast per Arrow batch in ``mapInPandas``; only signatures ever
    shuffle. Two earlier designs were measured and discarded: 128 JVM
    aggregate-min expressions (the wide hash-aggregate was ~100× slower
    than the numpy broadcast) and JVM transform+substr shingle
    materialization (3.8 s of a 4.7 s stage just allocating 1.5M
    UTF8Strings at sf0.1)."""
    a, b = _hash_params(num_hashes, seed)
    normed = _spread(df).select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__norm")
    )

    key_field = df.schema[id_col]
    schema = f"{key_field.name} {key_field.dataType.simpleString()}, signature array<bigint>"
    if include_shingle_hashes:
        # sorted unique rolling hashes of the shingle set — lets callers
        # verify (near-)exact Jaccard on int arrays instead of re-deriving
        # and shuffling string shingles (collision odds among ~300 values
        # in a 2^31 space ≈ 2e-5: identical sets always hash identically,
        # so jaccard == 1.0 is preserved exactly)
        schema += ", shingle_hashes array<bigint>"

    base = 257
    pow_vec = np.array(
        [pow(base, j, _MERSENNE31) for j in range(shingle_n)], dtype=np.int64
    )

    def partial_sigs(batches):
        """One Arrow batch of (id, normalized_text) in; signatures out.

        Batch-vectorized shingle hashing (VERDICT r02 next #7): all texts
        in the Arrow batch concatenate into ONE byte blob and the rolling
        polynomial hash runs as ONE sliding_window_view @ pow_vec matmul
        over it (windows crossing document boundaries are sliced away via
        per-doc offsets — slicing is a view, not a copy); per-doc
        np.unique dedups shingles. The permutation minima stay a per-doc
        (xs·a+b) mod p broadcast: a fully-batched
        np.minimum.reduceat over doc segments was MEASURED 8-12x slower
        than this loop at sf0.1 (reduceat's per-segment reduce doesn't
        vectorize across the hash axis; ~300-shingle docs amortize the
        small-matmul overhead fine).
        max window dot = 255·257^4·n ≈ 5.6e12 < 2^63: no overflow.
        Texts shorter than the shingle width hash as one window,
        mirroring char_shingles_col's substr behavior."""
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts = [(t or "").encode("utf-8") for t in pdf["__norm"]]
            lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            blob = np.frombuffer(b"".join(texts), dtype=np.uint8).astype(np.int64)
            if blob.size >= shingle_n:
                windows = np.lib.stride_tricks.sliding_window_view(blob, shingle_n)
                wh = (windows @ pow_vec) % _MERSENNE31
            else:
                wh = np.empty(0, dtype=np.int64)

            doc_xs = []
            for d in range(len(texts)):
                ln = lens[d]
                if ln == 0:
                    doc_xs.append(np.zeros(1, dtype=np.int64))
                elif ln < shingle_n:
                    seg = blob[starts[d] : starts[d] + ln]
                    doc_xs.append(
                        np.unique(np.atleast_1d((seg @ pow_vec[:ln]) % _MERSENNE31))
                    )
                else:
                    # full windows for this doc: blob positions
                    # starts[d] .. starts[d] + ln - shingle_n
                    doc_xs.append(
                        np.unique(wh[starts[d] : starts[d] + ln - shingle_n + 1])
                    )
            sigs = [
                ((xs[:, None] * a + b) % _MERSENNE31).min(axis=0) for xs in doc_xs
            ]
            # numpy arrays convert to Arrow lists directly — .tolist()
            # here built ~10M Python ints per sf0.1 batch
            out = {id_col: pdf[id_col].reset_index(drop=True), "signature": sigs}
            if include_shingle_hashes:
                out["shingle_hashes"] = doc_xs
            yield pd.DataFrame(out)

    # one input row per document ⇒ the per-batch signature is final
    # (documents split across rows are the caller's responsibility to
    # pre-concatenate, standard for a documents table)
    return normed.mapInPandas(partial_sigs, schema)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 7,
    max_bucket: int | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    ``sig`` injects a precomputed signature table (``minhash_signatures
    (..., include_shingle_hashes=True)`` output, or a signature-store
    read — same id_col/num_hashes/shingle_n/seed or the results are
    garbage): the raw text is then never scanned here. Pass a
    parquet-backed or persisted frame — it is read several times and,
    unlike the self-computed path, is NOT cached or unpersisted by this
    function (your persist stays yours).

    LSH recall: a pair with Jaccard s collides in ≥1 band with prob
    1-(1-s^r)^b, r = num_hashes/bands — with 128/32 the S-curve midpoint
    sits near s≈0.3, comfortably below the default 0.5 threshold.
    Verification computes *exact* Jaccard on distinct shingle arrays, so
    precision is 1.0 by construction; only recall depends on LSH.

    ``max_bucket`` guards against LSH bucket SKEW on boilerplate-heavy
    corpora: the band self-join emits |bucket|² candidates per bucket,
    and templated text concentrates thousands of docs in single buckets
    (measured on 465k synthetic transcript turns: max bucket 11,241,
    Σ|bucket|² ≈ 1.7e9 join rows — 341 s of candidate generation for 13
    true pairs). Buckets larger than ``max_bucket`` switch to a STAR
    join — every member pairs only with the bucket's min-id
    representative (linear in bucket size, still exact-verified), so
    dense near-dup clusters surface as rep↔member pairs while the
    member↔member closure is left to the caller's connected-components
    pass (the standard trade in web-scale dedup). Default None keeps
    the exhaustive behavior.

    CALLER CONTRACT (ADVICE r02): the returned DataFrame is eagerly
    materialized and **persisted** (so the signature lineage never
    re-runs and its much larger cache can be released before return).
    Call ``.unpersist()`` on the result when done with it — the returned
    handle IS the persisted DataFrame — or the (small) pair cache lives
    until the session ends / ``spark.catalog.clearCache()``."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    # cached: the signature table feeds band hashing AND both sides of
    # the estimate pre-filter join — without this the whole shingle+hash
    # lineage recomputes three times (measured ~3× the stage cost).
    # Released before return (VERDICT r01 wrong #5: the old version
    # leaked the cache across the session); the small verified pair set
    # is persisted + materialized so the sig lineage never re-runs.
    own_sig = sig is None
    if own_sig:
        sig = minhash_signatures(
            df, id_col, text_col, num_hashes, shingle_n, seed,
            include_shingle_hashes=True,
        ).cache()

    # band hash = xxhash64 over the band's r signature longs DIRECTLY
    # (multi-arg xxhash64). The earlier concat_ws-of-string-casts
    # expression allocated 128 UTF8Strings per row and cost 1.8 s per
    # evaluation at sf0.1 — and a self-join evaluates its source branch
    # TWICE, so it dominated the whole pipeline (3.7 s of the 4.3 s
    # candidate stage). The entries are also cached so the join's two
    # branches share one materialization; released before return.
    prefix = min(32, num_hashes)
    # band entries are BARE (id, band, band_hash) rows. An earlier
    # version carried the 32-long signature prefix on every entry so the
    # coarse Jaccard screen could run pre-distinct — fine at 5k docs,
    # but the array fans out into all `bands` rows: at 465k docs that is
    # 14.9M × 256 B through the cache and BOTH sides of the self-join
    # shuffle (measured 69 s to materialize + 123 s to join). Screening
    # AFTER distinct via est_filter joins the cached signature table
    # once per distinct candidate instead (676k rows at the same SF).
    band_entries = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col("signature")[i] for i in range(j * r, (j + 1) * r)]
                    )
                    for j in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    ).persist()

    star = None
    join_entries = band_entries
    if max_bucket is not None:
        sizes = band_entries.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("__bs")
        )
        small = sizes.filter(F.col("__bs") <= max_bucket).drop("__bs")
        big = sizes.filter(F.col("__bs") > max_bucket).drop("__bs")
        join_entries = band_entries.join(
            small, on=["band", "band_hash"], how="leftsemi"
        )
        big_entries = band_entries.join(
            big, on=["band", "band_hash"], how="leftsemi"
        )
        reps = big_entries.groupBy("band", "band_hash").agg(
            F.min(id_col).alias("__rep")
        )
        # rep = min id ⇒ id_a < id_b holds by construction
        star = (
            big_entries.join(reps, on=["band", "band_hash"])
            .filter(F.col(id_col) != F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b")
            )
            .distinct()
        )

    left = join_entries.select(
        F.col(id_col).alias("id_a"), "band", "band_hash"
    )
    right = join_entries.select(
        F.col(id_col).alias("id_b"), "band", "band_hash"
    )
    # NO distinct on raw candidates: a pair colliding in k bands
    # appears k times, but the collision set is within a few % of its
    # distinct form (same measurement as the cross join: 16.8M →
    # 16.36M) while the distinct is a full shuffle of the widest
    # intermediate. Duplicates ride through the screens and are
    # deduped after the fine screen, where the set is small.
    candidates = (
        left.join(right, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if star is not None:
        candidates = candidates.unionByName(star)
    # coarse screen (σ ≈ sqrt(s(1-s)/prefix) at s=threshold, margin
    # 2.2σ): one signature-prefix join per candidate
    coarse_margin = 2.2 * (threshold * (1 - threshold) / prefix) ** 0.5

    # stage 2 — full signature (σ = sqrt(s(1-s)/H), margin 2σ): only
    # coarse survivors join the cached signature table

    def est_filter(pairs: DataFrame, length: int, margin: float) -> DataFrame:
        sg = sig.select(
            F.col(id_col),
            (F.slice("signature", 1, length) if length < num_hashes else F.col("signature")).alias("s"),
        )
        sa = sg.select(F.col(id_col).alias("id_a"), F.col("s").alias("s_a"))
        sb = sg.select(F.col(id_col).alias("id_b"), F.col("s").alias("s_b"))
        return (
            pairs.join(sa, on="id_a")
            .join(sb, on="id_b")
            .withColumn(
                "est_jaccard",
                F.aggregate(
                    F.zip_with("s_a", "s_b", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(length),
            )
            .filter(F.col("est_jaccard") >= threshold - margin)
            .select("id_a", "id_b")
        )

    coarse = est_filter(candidates, prefix, margin=coarse_margin)
    fine = est_filter(
        coarse, num_hashes,
        margin=2.0 * (threshold * (1 - threshold) / num_hashes) ** 0.5,
    ).distinct()

    # exact verification on the hashed shingle *sets* (int arrays emitted
    # by the signature stage): no string shingles are recomputed or
    # shuffled; set equality/Jaccard is preserved by the injective-in-
    # practice rolling hash (collision note in minhash_signatures)
    sets = sig.select(F.col(id_col), F.col("shingle_hashes"))
    verified = (
        fine.join(
            sets.select(F.col(id_col).alias("id_a"), F.col("shingle_hashes").alias("sh_a")),
            on="id_a",
        )
        .join(
            sets.select(F.col(id_col).alias("id_b"), F.col("shingle_hashes").alias("sh_b")),
            on="id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    verified = verified.persist()
    verified.count()  # materialize, then drop the big upstream caches
    if own_sig:
        sig.unpersist()
    band_entries.unpersist()
    return verified


def minhash_join_pairs(
    left_df: DataFrame,
    right_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 7,
    left_sig: DataFrame | None = None,
    right_sig: DataFrame | None = None,
    max_bucket: int | None = None,
    per_left_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs ACROSS two corpora: (id_l, id_r, jaccard ≥
    threshold) — the contamination-detection join (which training docs
    are near-copies of an eval/benchmark set?).

    ``left_sig`` / ``right_sig`` inject precomputed signature tables
    (same contract as ``minhash_lsh_pairs(sig=)``): the incremental-
    ingest path, where the historical corpus's signatures live in a
    store and its text is never re-scanned. Injected frames are not
    cached or unpersisted here; the corresponding ``*_df`` argument is
    ignored (pass None).

    Two skew/volume guards for boilerplate-heavy corpora (both None =
    exhaustive; precision is always 1.0 — exact verification — only
    recall through the capped paths is heuristic):

    - ``max_bucket`` caps RIGHT-side band buckets: a (band, hash)
      bucket with more than ``max_bucket`` right members contributes
      only its min-id representative, dropping per-bucket join cost
      from |L|·|R| to |L|. A left doc truly similar to SOME member of
      an oversized templated bucket almost always matches the
      representative too (the bucket exists because its members are
      near-identical).
    - ``per_left_cap`` keeps only the smallest-id ``per_left_cap``
      candidate rights PER LEFT DOC before the screens — the
      EXISTENCE-semantics cap: when the question is "does this doc
      match ANY right doc" (decontamination, incremental ingest), a
      doc inside a near-dup family collides with every family mate
      (measured: 46k-batch ingest vs 419k templated store produced
      16.4M distinct candidates for 3.8k contaminated docs — the
      screens were 40× oversubscribed), and verifying a handful is
      enough. Candidates are ranked per left doc by colliding-band
      count (true near-dups hit several bands, chance collisions one)
      before the cap.

    Same three-stage shape as ``minhash_lsh_pairs`` (banded LSH join
    on bare (id, band, hash) entries → signature-prefix screen per
    DISTINCT candidate → full-signature screen → exact Jaccard on
    hashed shingle sets), but the band join pairs left against right
    instead of self-joining — both sides hash with the SAME seed so
    signatures are comparable. Only signatures and band keys shuffle,
    never text.

    CALLER CONTRACT: the returned pair DataFrame is materialized +
    persisted (the signature lineage never re-runs); call
    ``.unpersist()`` on it when done."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    prefix = min(32, num_hashes)

    def sig_of(df: DataFrame) -> DataFrame:
        return minhash_signatures(
            df, id_col, text_col, num_hashes, shingle_n, seed,
            include_shingle_hashes=True,
        )

    own_l, own_r = left_sig is None, right_sig is None
    sig_l = sig_of(left_df).cache() if own_l else left_sig
    sig_r = sig_of(right_df).cache() if own_r else right_sig

    def bands_of(sig: DataFrame, side: str) -> DataFrame:
        # bare (id, band, hash) entries — the signature prefix is NOT
        # carried (same lesson as the self-join: the prefix fans out
        # into every band row and through the join shuffle; screening
        # happens per DISTINCT candidate below instead)
        return sig.select(
            F.col(id_col).alias(f"id_{side}"),
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            *[
                                F.col("signature")[i]
                                for i in range(j * r, (j + 1) * r)
                            ]
                        )
                        for j in range(bands)
                    ]
                )
            ).alias("band", "band_hash"),
        )

    bl = bands_of(sig_l, "l")
    # the right band table is referenced three times under max_bucket
    # (sizes, semi-join, reps) but exactly ONCE without it — persisting
    # it then just adds a materialization pass (r6)
    br = bands_of(sig_r, "r")
    if max_bucket is not None:
        br = br.persist()
        rsizes = br.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("__bs")
        )
        small = rsizes.filter(F.col("__bs") <= max_bucket).drop("__bs")
        big = rsizes.filter(F.col("__bs") > max_bucket).drop("__bs")
        reps = (
            br.join(big, on=["band", "band_hash"], how="leftsemi")
            .groupBy("band", "band_hash")
            .agg(F.min("id_r").alias("id_r"))
        )
        join_r = br.join(
            small, on=["band", "band_hash"], how="leftsemi"
        ).unionByName(reps)
    else:
        join_r = br
    collisions = bl.join(join_r, on=["band", "band_hash"]).select(
        "id_l", "id_r"
    )
    if per_left_cap is not None:
        from pyspark.sql.window import Window

        # rank candidates by how many bands they collided in (a true
        # near-dup hits multiple bands; a chance collision hits one),
        # then id_r for determinism. The groupBy doubles as the
        # candidate distinct, so the cap costs one extra window pass
        # over the already-distinct set.
        w = Window.partitionBy("id_l").orderBy(
            F.col("__nb").desc(), F.col("id_r")
        )
        candidates = (
            collisions.groupBy("id_l", "id_r")
            .agg(F.count(F.lit(1)).alias("__nb"))
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= per_left_cap)
            .select("id_l", "id_r")
        )
    else:
        # NO distinct here: on dense corpora the collision set is
        # within a few % of its distinct form (measured 16.8M → 16.36M)
        # yet the distinct costs a full extra shuffle of the widest
        # intermediate; the few duplicate candidates ride through the
        # screens and are deduped with the post-fine distinct below,
        # where the set is small.
        candidates = collisions

    # coarse screen per candidate: one prefix join each side
    coarse_margin = 2.2 * (threshold * (1 - threshold) / prefix) ** 0.5
    coarse = (
        candidates.join(
            sig_l.select(
                F.col(id_col).alias("id_l"),
                F.slice("signature", 1, prefix).alias("p_l"),
            ),
            on="id_l",
        )
        .join(
            sig_r.select(
                F.col(id_col).alias("id_r"),
                F.slice("signature", 1, prefix).alias("p_r"),
            ),
            on="id_r",
        )
        .withColumn(
            "__est",
            F.aggregate(
                F.zip_with("p_l", "p_r", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(prefix),
        )
        .filter(F.col("__est") >= threshold - coarse_margin)
        .select("id_l", "id_r")
    )

    fine_margin = 2.0 * (threshold * (1 - threshold) / num_hashes) ** 0.5
    fine = (
        coarse.join(
            sig_l.select(F.col(id_col).alias("id_l"), F.col("signature").alias("s_l")),
            on="id_l",
        )
        .join(
            sig_r.select(F.col(id_col).alias("id_r"), F.col("signature").alias("s_r")),
            on="id_r",
        )
        .withColumn(
            "__est",
            F.aggregate(
                F.zip_with("s_l", "s_r", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(num_hashes),
        )
        .filter(F.col("__est") >= threshold - fine_margin)
        .select("id_l", "id_r")
        .distinct()
    )

    verified = (
        fine.join(
            sig_l.select(
                F.col(id_col).alias("id_l"), F.col("shingle_hashes").alias("sh_l")
            ),
            on="id_l",
        )
        .join(
            sig_r.select(
                F.col(id_col).alias("id_r"), F.col("shingle_hashes").alias("sh_r")
            ),
            on="id_r",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_l", "sh_r"))
            / F.size(F.array_union("sh_l", "sh_r")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", F.round("jaccard", 6).alias("jaccard"))
    )
    verified = verified.persist()
    verified.count()
    if max_bucket is not None:
        br.unpersist()
    if own_l:
        sig_l.unpersist()
    if own_r:
        sig_r.unpersist()
    return verified


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    exact_first: bool = True,
    **minhash_kwargs,
) -> DataFrame:
    """Remove training documents that are exact or near duplicates of an
    evaluation/benchmark set — the leakage guard a trustworthy training
    pipeline runs before every release.

    Two passes: an exact fingerprint anti join (cheap, catches verbatim
    copies), then ``minhash_join_pairs`` at ``threshold`` for
    near-copies. Returns the surviving train rows LAZILY; only the tiny
    contaminated-id set stays persisted (it anchors the result's
    lineage so the minhash pipeline never re-runs), and the pair cache
    is released before returning. Call ``.unpersist()`` on the returned
    frame only if you persisted it yourself.

    Scale: the eval side is tiny next to the corpus — its signatures
    broadcast; the training corpus is touched by one signature pass and
    one anti join keyed by id. The corpus itself is never cached."""
    train = train_df
    if exact_first:
        eval_fps = eval_df.select(
            fingerprint_col(F.col(text_col)).alias("__fp")
        ).distinct()
        train = (
            train.withColumn("__fp", fingerprint_col(F.col(text_col)))
            .join(F.broadcast(eval_fps), on="__fp", how="left_anti")
            .drop("__fp")
        )
    pairs = minhash_join_pairs(
        train, eval_df, id_col=id_col, text_col=text_col,
        threshold=threshold, **minhash_kwargs,
    )
    contaminated = pairs.select(F.col("id_l").alias(id_col)).distinct().persist()
    contaminated.count()  # materialize ids, then drop the pair cache
    pairs.unpersist()
    return train.join(F.broadcast(contaminated), on=id_col, how="left_anti")


# --------------------------------------------------------------- simhash


def simhash_col_agg(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DataFrame[id, simhash bigint]: 64-bit simhash of whitespace tokens.
    Bit k of the result = majority vote of bit k over xxhash64(token).

    Token hashing stays JVM-native; the 64 bit-votes accumulate as one
    numpy broadcast per Arrow batch in ``mapInPandas`` (an earlier
    variant used 64 JVM aggregate sums — the same wide-aggregate shape
    that made minhash signatures ~100× slower than a numpy broadcast).
    One input row per document assumed (explode keeps a row's tokens in
    its partition, so per-partition votes are final)."""
    tok = F.explode(word_tokens_col(F.col(text_col))).alias("tok")
    h = F.xxhash64(F.col("tok"))
    exploded = _spread(df).select(F.col(id_col), tok).select(id_col, h.alias("h"))

    key_field = df.schema[id_col]
    schema = f"{key_field.name} {key_field.dataType.simpleString()}, simhash bigint"
    shifts = np.arange(64, dtype=np.uint64)
    powers = (np.uint64(1) << shifts).astype(np.uint64)

    def build(batches):
        acc: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for gkey, sub in pdf.groupby(id_col, sort=False):
                hs = sub["h"].to_numpy(dtype=np.int64).view(np.uint64)
                bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                prev = acc.get(gkey)
                acc[gkey] = votes if prev is None else prev + votes
        if acc:
            ids, sims = [], []
            for gkey, votes in acc.items():
                sim = ((votes > 0).astype(np.uint64) * powers).sum(dtype=np.uint64)
                ids.append(gkey)
                sims.append(np.int64(sim))
            yield pd.DataFrame({id_col: ids, "simhash": sims})

    return exploded.mapInPandas(build, schema)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming (≤ 3 for
    full recall via the 4×16-bit block pigeonhole)."""
    sims = simhash_col_agg(df, id_col, text_col)
    blocks = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * blk).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for blk in range(4)
                ]
            )
        ).alias("blk", "blk_val"),
    )
    left = blocks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "blk", "blk_val"
    )
    right = blocks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "blk", "blk_val"
    )
    return (
        left.join(right, on=["blk", "blk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------- n-gram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    threshold: float = 0.7,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard pairs via inverted-index self-join on shingles.

    max_df drops shingles occurring in more than that many documents
    before the join — the fan-out guard that keeps the candidate count
    near-linear on real corpora (dropped shingles can only *lower*
    computed Jaccard for pairs that share nothing else; pairs above the
    threshold share many rarer shingles too)."""
    shingles = df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__norm")
    ).select(
        F.col(id_col),
        char_shingles_col(F.col("__norm"), shingle_n, pre_normalized=True).alias("sh"),
    )
    sizes = shingles.select(id_col, F.size("sh").alias("n_sh"))
    inv = shingles.select(id_col, F.explode("sh").alias("shingle"))
    if max_df is not None:
        rare = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_count"))
            .filter(F.col("df_count") <= max_df)
            .select("shingle")
        )
        inv = inv.join(rare, on="shingle")

    left = inv.select(F.col(id_col).alias("id_a"), "shingle")
    right = inv.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        left.join(right, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")),
            on="id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")),
            on="id_b",
        )
        .withColumn(
            "jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# --------------------------------------------------------------- embeddings


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — JVM
    zip_with + aggregate, no Python."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    norm_b = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm_a * norm_b)


def _hyperplane_bucket_udf(dim: int, n_planes: int, seed: int):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float64)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        signs = (mat @ planes.T) > 0  # (n, n_planes)
        return pd.Series(signs @ powers)

    return bucket


def _hyperplane_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """All-table hyperplane buckets in ONE pass: returns array<long> of
    length n_tables per vector. One matmul against the stacked
    (n_tables*n_planes, dim) plane matrix — the per-table variant scans
    the vector column (and pays the Arrow transfer) n_tables times.
    Plane rows per table match `_hyperplane_bucket_udf(dim, n_planes,
    seed + 1000*t)` exactly, so single-table callers stay compatible."""
    plane_stack = np.concatenate(
        [
            np.random.default_rng(seed + 1000 * t).standard_normal((n_planes, dim))
            for t in range(n_tables)
        ]
    )  # (n_tables*n_planes, dim)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        signs = (mat @ plane_stack.T) > 0  # (n, n_tables*n_planes)
        codes = signs.reshape(len(mat), -1, len(powers)) @ powers  # (n, n_tables)
        return pd.Series(list(codes))

    return buckets


def embedding_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    method: str = "lsh",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 11,
    max_bucket: int | None = None,
    n_cells: int = 256,
    kmeans_iters: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold.

    ``lsh``: random-hyperplane bucketing (n_tables independent tables —
    collision prob per table = (1 - θ/π)^n_planes) restricts the
    quadratic join to same-bucket pairs; cosine verification is exact,
    so precision is 1.0 and only recall depends on table count.
    ``kmeans``: the SemDeDup paper's own shape (Abbas et al. 2023 §2:
    cluster, then screen WITHIN clusters) — spherical k-means cells
    (`clustering.kmeans_fit`, full-corpus trainer) play the bucket
    role with a single table; candidate volume is Σ|cell|² capped by
    the same ``max_bucket`` star join. Recall trade differs from LSH:
    a pair split across a cell boundary is missed by construction
    (the paper accepts this), whereas LSH recall improves with table
    count; precision is 1.0 for both (exact cosine verification).
    Seeding caveat: the determinism contract seeds cells from the k
    SMALLEST ids — if ids correlate with embedding locality (e.g.
    insertion-ordered corpora), hash them first or the seeds cluster
    in one region and cell quality degrades.
    ``brute``: full id<id self-join — the recall baseline; quadratic,
    for small inputs or audits only.

    The LSH path mirrors the scale shape `minhash_lsh_pairs` converged
    on after measurement (VERDICT r04 #1): bucket entries are BARE
    (id, table, bucket) rows — the full embedding never rides the
    self-join shuffle (an earlier version carried the vector on BOTH
    sides; at d=128 that is ~1 KB × 2 per candidate row); vectors are
    joined back from the cached input once per candidate; the distinct
    runs AFTER the cosine screen, on the small surviving set, not on
    the wide candidate stream (a distinct on ~97%-unique candidates is
    a pure full-shuffle tax — measured 153→89 s on the minhash path).

    ``max_bucket`` guards bucket skew: with n_planes=8 there are only
    256 buckets per table, so one dense cluster (or a near-zero-vector
    pile-up) makes the same-bucket self-join Σ|bucket|². Buckets larger
    than ``max_bucket`` switch to a STAR join against the bucket's
    min-id representative (linear, still exact-verified) — dense
    near-dup clusters surface as rep↔member pairs and the member↔member
    closure is left to the caller's connected-components pass, same
    trade as `minhash_lsh_pairs`. Default None keeps the exhaustive
    behavior.

    CALLER CONTRACT: the returned LSH-path DataFrame is eagerly
    materialized and **persisted** (so the bucket lineage never re-runs
    and the entry/vector caches can be released before return). Call
    ``.unpersist()`` on the result when done."""
    cos = lambda a, b: cosine_col(a.cast("array<double>"), b.cast("array<double>"))  # noqa: E731
    if method == "brute":
        left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
        right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
        return (
            left.crossJoin(right)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos(F.col("v_a"), F.col("v_b")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        )
    if method not in ("lsh", "kmeans"):
        raise ValueError(f"unknown method {method!r}")

    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty embedding DataFrame")
        dim = first["d"]
    # cached: feeds the bucket UDF once and both vector-join sides
    vecs = df.select(F.col(id_col), F.col(vec_col)).persist()
    if method == "kmeans":
        from hyper_spark.operators.clustering import kmeans_assign, kmeans_fit

        cents = kmeans_fit(
            vecs, k=min(n_cells, vecs.count()), iters=kmeans_iters,
            id_col=id_col, vec_col=vec_col, mode="spherical",
        )
        # cells feed the SAME downstream machinery as LSH buckets
        # (skew cap, bare entries, post-screen distinct) as a single
        # table whose buckets are the k-means cells
        entries = kmeans_assign(vecs, cents, vec_col=vec_col).select(
            F.col(id_col),
            F.lit(0).alias("table"),
            F.col("cell").cast("int").alias("bucket"),
        ).persist()
    else:
        # ONE vector pass + ONE Arrow transfer computes every table's
        # bucket (the per-table loop ran the pandas UDF n_tables
        # times); entries are bare (id, table, bucket) — 24 B, not
        # 24 B + the vector
        all_buckets = _hyperplane_buckets_udf(dim, n_planes, n_tables, seed)
        entries = vecs.select(
            F.col(id_col),
            F.posexplode(all_buckets(F.col(vec_col))).alias("table", "bucket"),
        ).persist()

    star = None
    join_entries = entries
    if max_bucket is not None:
        sizes = entries.groupBy("table", "bucket").agg(
            F.count(F.lit(1)).alias("__bs")
        )
        small = sizes.filter(F.col("__bs") <= max_bucket).drop("__bs")
        big = sizes.filter(F.col("__bs") > max_bucket).drop("__bs")
        join_entries = entries.join(small, on=["table", "bucket"], how="leftsemi")
        big_entries = entries.join(big, on=["table", "bucket"], how="leftsemi")
        reps = big_entries.groupBy("table", "bucket").agg(
            F.min(id_col).alias("__rep")
        )
        # rep = min id ⇒ id_a < id_b holds by construction
        star = (
            big_entries.join(reps, on=["table", "bucket"])
            .filter(F.col(id_col) != F.col("__rep"))
            .select(F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b"))
            .distinct()
        )

    left = join_entries.select(F.col(id_col).alias("id_a"), "table", "bucket")
    right = join_entries.select(F.col(id_col).alias("id_b"), "table", "bucket")
    # NO distinct on raw candidates (a pair colliding in k≤n_tables
    # tables rides through the cosine screen k times; duplicates are
    # removed after the screen where the set is small)
    candidates = (
        left.join(right, on=["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if star is not None:
        candidates = candidates.unionByName(star)
    # widen_for_explosion: the cosine screen is the CPU-heavy stage
    # (interpreted zip_with+aggregate per candidate) and its shuffle
    # input is slim id pairs, so AQE coalesced it to ONE task (2.5 s
    # serialized at sf0.1 — profiled r6). Explicit-count exchanges on
    # the join keys keep it wide; they replace the joins' own
    # exchanges when those are shuffle joins.
    half = widen_for_explosion(candidates, "id_a").join(
        vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")),
        on="id_a",
    )
    verified = (
        widen_for_explosion(half, "id_b")
        .join(
            vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")),
            on="id_b",
        )
        .withColumn("cosine", cos(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = verified.persist()
    verified.count()  # materialize, then drop the upstream caches
    entries.unpersist()
    vecs.unpersist()
    return verified


def embedding_join_pairs(
    left_df: DataFrame,
    right_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    method: str = "lsh",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 11,
    max_bucket: int | None = None,
    per_left_cap: int | None = None,
) -> DataFrame:
    """Cosine ≥ threshold pairs ACROSS two embedding corpora:
    (id_l, id_r, cosine) — the embedding-space sibling of
    ``minhash_join_pairs`` (which answers the same cross-corpus
    question in n-gram space). The canonical use is SEMANTIC
    decontamination: which training vectors are paraphrase-level
    copies of an eval/benchmark set that exact and n-gram screens
    miss (the gap Abbas et al. 2023 §SemDeDup and the GPT-3 appendix-C
    protocol both call out).

    Scale shape (left = the 100-TB training corpus, right = the small
    eval set): BOTH sides hash with the SAME hyperplane stack
    (`_hyperplane_buckets_udf(dim, n_planes, n_tables, seed)`), so
    bucket codes are comparable. Right-side bare (id, table, bucket)
    entries — thousands of 24 B rows — BROADCAST into the bucket
    join, so the left corpus is touched by exactly ONE vector pass
    (the bucket UDF) plus one id-keyed join back for the surviving
    candidates; misses die map-side without a shuffle, exactly the
    ``ngram_overlap`` doctrine. The left corpus is never cached.

    Skew/volume guards, both measured on the minhash cross-join path
    (precision stays 1.0 — exact cosine verification — only recall
    through capped paths is heuristic):

    - ``max_bucket`` caps RIGHT-side buckets: an eval bucket with more
      than ``max_bucket`` members contributes only its min-id
      representative (near-identical eval entries collide together;
      matching the representative is existence-equivalent).
    - ``per_left_cap`` keeps the ``per_left_cap`` strongest candidate
      rights per left vector, ranked by colliding-table count (a true
      neighbor collides in several tables, a chance collision in one)
      then id_r — the existence-semantics cap for decontamination,
      same rationale as ``minhash_join_pairs(per_left_cap=)``.

    ``method='brute'`` is the exact-recall audit path (full cross
    join; gate/oracle scale only). Returns the LSH-path result
    eagerly materialized + persisted (caller calls ``.unpersist()``
    when done); the brute path returns lazily."""
    cos = lambda a, b: cosine_col(a.cast("array<double>"), b.cast("array<double>"))  # noqa: E731
    if method == "brute":
        left = left_df.select(
            F.col(id_col).alias("id_l"), F.col(vec_col).alias("v_l")
        )
        right = right_df.select(
            F.col(id_col).alias("id_r"), F.col(vec_col).alias("v_r")
        )
        return (
            left.crossJoin(F.broadcast(right))
            .withColumn("cosine", cos(F.col("v_l"), F.col("v_r")))
            .filter(F.col("cosine") >= threshold)
            .select("id_l", "id_r", F.round("cosine", 6).alias("cosine"))
        )
    if method != "lsh":
        raise ValueError(f"unknown method {method!r}")
    if dim is None:
        first = left_df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty left embedding DataFrame")
        dim = first["d"]
    all_buckets = _hyperplane_buckets_udf(dim, n_planes, n_tables, seed)

    def entries_of(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"id_{side}"),
            F.posexplode(all_buckets(F.col(vec_col))).alias("table", "bucket"),
        )

    # right side is small: persist entries and vectors so the bucket
    # UDF and the eval scan run once, not once per downstream join
    er = entries_of(right_df, "r").persist()
    vr = right_df.select(
        F.col(id_col).alias("id_r"), F.col(vec_col).alias("v_r")
    ).persist()
    join_r = er
    if max_bucket is not None:
        sizes = er.groupBy("table", "bucket").agg(
            F.count(F.lit(1)).alias("__bs")
        )
        small = sizes.filter(F.col("__bs") <= max_bucket).drop("__bs")
        big = sizes.filter(F.col("__bs") > max_bucket).drop("__bs")
        reps = (
            er.join(big, on=["table", "bucket"], how="leftsemi")
            .groupBy("table", "bucket")
            .agg(F.min("id_r").alias("id_r"))
        )
        join_r = er.join(
            small, on=["table", "bucket"], how="leftsemi"
        ).unionByName(reps)
    # ONE pass over the left corpus; broadcast right entries so the
    # bucket join is map-side (no left shuffle)
    collisions = entries_of(left_df, "l").join(
        F.broadcast(join_r), on=["table", "bucket"]
    ).select("id_l", "id_r")
    if per_left_cap is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("id_l").orderBy(
            F.col("__nt").desc(), F.col("id_r")
        )
        candidates = (
            collisions.groupBy("id_l", "id_r")
            .agg(F.count(F.lit(1)).alias("__nt"))
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= per_left_cap)
            .select("id_l", "id_r")
        )
    else:
        # no distinct on raw candidates (multi-table duplicates ride
        # through the screen and are deduped post-screen, where the
        # set is small — the measured minhash/self-join lesson)
        candidates = collisions
    verified = (
        candidates.join(
            left_df.select(
                F.col(id_col).alias("id_l"), F.col(vec_col).alias("v_l")
            ),
            on="id_l",
        )
        .join(F.broadcast(vr), on="id_r")
        .withColumn("cosine", cos(F.col("v_l"), F.col("v_r")))
        .filter(F.col("cosine") >= threshold)
        .select("id_l", "id_r", F.round("cosine", 6).alias("cosine"))
        .dropDuplicates(["id_l", "id_r"])
    )
    verified = verified.persist()
    verified.count()  # materialize, then release the eval-side caches
    er.unpersist()
    vr.unpersist()
    return verified


def semantic_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    **pair_kwargs,
) -> DataFrame:
    """Remove training rows whose EMBEDDING is cosine-≥-threshold close
    to any eval/benchmark vector — the semantic leakage guard that
    catches paraphrased eval copies `decontaminate` (n-gram space)
    cannot see. Same contract shape as `decontaminate`: returns the
    surviving train rows LAZILY; only the tiny contaminated-id set
    stays persisted (anchoring the result's lineage so the pair
    pipeline never re-runs). The train corpus itself is never cached —
    one bucket pass + one id-keyed anti join touch it."""
    pairs = embedding_join_pairs(
        train_df, eval_df, id_col=id_col, vec_col=vec_col,
        threshold=threshold, **pair_kwargs,
    )
    contaminated = (
        pairs.select(F.col("id_l").alias(id_col)).distinct().persist()
    )
    contaminated.count()  # materialize ids, then drop the pair cache
    pairs.unpersist()
    return train_df.join(F.broadcast(contaminated), on=id_col, how="left_anti")


# ------------------------------------------------- substring duplication
#
# Windowed exact-substring duplication (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better"): any run of >= `window`
# consecutive tokens whose exact content appears more than once in the
# corpus is a duplicated span. The published implementation builds a
# corpus-wide suffix array on one machine; the Spark-first equivalent is
# the windowed form — every doc emits its (n_tokens - window + 1)
# token-window hashes, duplicated windows are found by one groupBy on
# the 64-bit window hash (map-side partial counts make the shuffle
# |distinct windows|, not |windows|), and per-doc overlapping windows
# are merged into maximal spans with a single JVM `aggregate` lambda
# over the sorted start offsets. Recovers exactly the >=window-token
# duplicated spans a suffix array would report (any duplicated run of
# length L >= window is covered by its L - window + 1 duplicated
# windows; shorter runs produce no duplicated window), while every
# stage is a shuffle Spark already does well at 100 TB.
#
# Reference parity note: the reference repo (GameAnalytics/hyper) has
# no text-dedup surface; this operator is part of the training-data
# pipeline family (SURVEY §2.4 extension), semantics from the public
# paper.


def _merge_starts_to_spans(starts: Column, window: int) -> Column:
    """Merge a SORTED array of window-start offsets into maximal
    half-open token spans [start, end): one JVM `aggregate` pass, no
    Python. Overlapping or adjacent windows (next start <= current
    span end) extend the span; a gap opens a new one."""
    init = F.struct(
        F.lit([]).cast("array<array<bigint>>").alias("spans"),
        F.lit(-1).cast("bigint").alias("cs"),
        F.lit(-1).cast("bigint").alias("ce"),
    )

    def step(acc, s):
        first = acc["ce"] < F.lit(0)
        extends = s <= acc["ce"]
        return (
            F.when(
                first,
                F.struct(
                    acc["spans"].alias("spans"),
                    s.cast("bigint").alias("cs"),
                    (s + window).cast("bigint").alias("ce"),
                ),
            )
            .when(
                extends,
                F.struct(
                    acc["spans"].alias("spans"),
                    acc["cs"].alias("cs"),
                    F.greatest(acc["ce"], (s + window).cast("bigint")).alias("ce"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(
                        acc["spans"], F.array(F.array(acc["cs"], acc["ce"]))
                    ).alias("spans"),
                    s.cast("bigint").alias("cs"),
                    (s + window).cast("bigint").alias("ce"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["ce"] < F.lit(0), acc["spans"]).otherwise(
            F.concat(acc["spans"], F.array(F.array(acc["cs"], acc["ce"])))
        )

    return F.aggregate(starts, init, step, finish)


def _window_table(
    df: DataFrame, id_col: str, text_col: str, window: int, by: str
) -> DataFrame:
    """(id, start, win) — one row per token window. The token array is
    materialized as a real column BEFORE the transform lambda (Catalyst
    re-evaluates expressions referenced inside higher-order lambdas per
    element — a column reference is free, an inline regex split is
    O(n) per element)."""
    toks = df.select(
        F.col(id_col).alias("id"), word_tokens_col(F.col(text_col)).alias("__toks")
    )
    starts = F.sequence(
        F.lit(0), F.size("__toks") - F.lit(window)
    )  # only when n >= window
    win_of = lambda i: F.concat_ws(
        "\x1f", F.slice(F.col("__toks"), i + 1, window)
    )
    if by == "hash":
        wins = F.transform(starts, lambda i: F.xxhash64(win_of(i)))
    elif by == "content":
        wins = F.transform(starts, win_of)
    else:
        raise ValueError(f"unknown by mode {by!r}")
    return (
        toks.filter(F.size("__toks") >= window)
        .select("id", F.posexplode(wins).alias("start", "win"))
    )


def substring_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_count: int = 2,
    by: str = "hash",
) -> DataFrame:
    """Per-doc duplicated-substring spans: every maximal run of tokens
    covered by a >=``window``-token window whose content occurs at
    least ``min_count`` times corpus-wide (within-doc repeats count,
    matching the suffix-array semantics of the published method).

    Returns one row per input doc: ``(id_col, n_tokens, spans
    array<array<bigint>> of half-open [start, end) token offsets,
    n_spans, dup_tokens, dup_frac)``. Tokens are whitespace tokens of
    the NORMALIZED text (`normalized_text`), so span offsets index that
    token stream — `strip_dup_spans` consumes them consistently.

    ``by='hash'`` (default, the scale path) compares 64-bit xxhash64
    window hashes — a corpus would need ~2^32 distinct windows before a
    collision is likely; ``by='content'`` compares the window strings
    themselves (collision-free, more shuffle bytes).

    Scale shape: |windows| ~= |tokens| rows carrying (id, start, 8-byte
    hash); the dup-window groupBy partial-aggregates map-side so the
    shuffle is |distinct windows| counts; the per-doc merge works on
    dup starts only (bounded by tokens-per-doc, never corpus-wide).
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    wins = _window_table(df, id_col, text_col, window, by)
    dup = (
        wins.groupBy("win")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("win")
    )
    dup_starts = (
        wins.join(dup, on="win", how="leftsemi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("start")).alias("__starts"))
        .select(
            "id", _merge_starts_to_spans(F.col("__starts"), window).alias("spans")
        )
    )
    base = df.select(
        F.col(id_col),
        F.size(word_tokens_col(F.col(text_col))).alias("n_tokens"),
    )
    empty = F.lit([]).cast("array<array<bigint>>")
    out = base.join(
        dup_starts.withColumnRenamed("id", id_col), on=id_col, how="left"
    ).select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce("spans", empty).alias("spans"),
    )
    dup_tokens = F.aggregate(
        "spans",
        F.lit(0).cast("bigint"),
        lambda acc, sp: acc + sp[1] - sp[0],
    )
    return out.select(
        id_col,
        "n_tokens",
        "spans",
        F.size("spans").cast("bigint").alias("n_spans"),
        dup_tokens.alias("dup_tokens"),
        F.when(
            F.col("n_tokens") > 0, dup_tokens / F.col("n_tokens")
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def strip_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_count: int = 2,
    by: str = "hash",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Remove corpus-duplicated substrings from every document (the
    'dedup the spans, keep the docs' policy of the published method —
    both copies lose the run; pass ``min_count=3`` to keep one copy's
    worth of tolerance).

    ``spans`` defaults to ``substring_dup_spans(df, ...)`` with the
    same parameters; pass a precomputed one to reuse it across
    policies. Output: ``(id_col, clean_text, n_tokens, dup_tokens,
    dup_frac)`` where ``clean_text`` is the surviving NORMALIZED tokens
    re-joined with single spaces (span offsets index the normalized
    token stream, so reconstruction is exact over it).

    The strip is one JVM two-arg ``filter`` lambda over the token
    array (position not covered by any span — O(tokens x spans), spans
    per doc are few) plus one join keyed by id; nothing touches
    per-row Python.
    """
    if spans is None:
        spans = substring_dup_spans(
            df, id_col=id_col, text_col=text_col, window=window,
            min_count=min_count, by=by,
        )
    toks = df.select(
        F.col(id_col), word_tokens_col(F.col(text_col)).alias("__toks")
    )
    joined = toks.join(
        spans.select(id_col, "spans", "n_tokens", "dup_tokens", "dup_frac"),
        on=id_col,
        how="inner",
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("spans"), lambda sp: (i >= sp[0]) & (i < sp[1])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        "n_tokens",
        "dup_tokens",
        "dup_frac",
    )
