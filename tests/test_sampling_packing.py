"""Deterministic sampling/splitting and sequence-packing operators."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.dedup import incremental_dedup
from hyper_spark.operators.packing import chunk_stats, pack_offsets
from hyper_spark.operators.sampling import (
    deterministic_sample,
    distinct_sample,
    hash_sample,
    hash_split,
    split_hash_col,
)


def _draw(key: str, seed: str = "0") -> str:
    return hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8]


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet")


# ------------------------------------------------------------- splitting


def test_split_hash_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    rows = df.select("k", split_hash_col("k", 7).alias("h")).collect()
    for r in rows:
        assert r["h"] == _draw(str(r["k"]), "7")


def test_hash_split_deterministic_and_partitioned(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], ["k"])
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["k"]: r["split"] for r in hash_split(df, "k", w, seed=1).collect()}
    b = {r["k"]: r["split"] for r in hash_split(df, "k", w, seed=1).collect()}
    assert a == b  # re-execution identical
    counts = {s: 0 for s in w}
    for s in a.values():
        counts[s] += 1
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    # oracle replication: membership is a pure function of the hash
    for k, s in list(a.items())[:200]:
        h = _draw(str(k), "1")
        if h < format(int(round(0.8 * 2**32)), "08x"):
            assert s == "train"


def test_hash_split_null_key_gets_null_split(spark):
    df = spark.createDataFrame([("a",), (None,)], ["k"])
    rows = {r["k"]: r["split"] for r in hash_split(
        df, "k", {"x": 1.0}).collect()}
    assert rows["a"] == "x"
    assert rows[None] is None


def test_hash_split_seed_changes_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    w = {"a": 0.5, "b": 0.5}
    s1 = {r["k"]: r["split"] for r in hash_split(df, "k", w, seed=1).collect()}
    s2 = {r["k"]: r["split"] for r in hash_split(df, "k", w, seed=2).collect()}
    moved = sum(1 for k in s1 if s1[k] != s2[k])
    assert moved > 500  # ~50% expected


# -------------------------------------------------------------- sampling


def test_hash_sample_nested_subset_property(spark):
    df = spark.createDataFrame([(i,) for i in range(4000)], ["k"])
    small = {r["k"] for r in hash_sample(df, "k", 0.1, seed=3).collect()}
    big = {r["k"] for r in hash_sample(df, "k", 0.3, seed=3).collect()}
    assert small <= big  # smaller fraction samples a subset
    assert abs(len(big) / 4000 - 0.3) < 0.03


def test_hash_sample_stratified(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(3000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = hash_sample(
        df, "k", by="lang", fractions={"en": 0.5, "de": 0.1}, seed=5
    ).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    n_en = 2000
    n_de = 1000
    assert abs(got["en"] / n_en - 0.5) < 0.05
    assert abs(got["de"] / n_de - 0.1) < 0.04


def test_hash_sample_is_pure_filter_no_shuffle(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    plan = hash_sample(df, "k", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_deterministic_sample_global_and_grouped(spark):
    rows = [(i, "g%d" % (i % 4)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "g"])
    top = deterministic_sample(df, 50, on="k", seed=9)
    got = sorted(r["k"] for r in top.collect())
    # oracle: 50 smallest hashes
    expected = sorted(range(2000), key=lambda k: (_draw(str(k), "9"), str(k)))[:50]
    assert got == sorted(expected)

    per_g = deterministic_sample(df, 10, on="k", seed=9, by=["g"])
    counts = per_g.groupBy("g").count().collect()
    assert all(r["count"] == 10 for r in counts)


def test_deterministic_sample_minwise_merge(spark):
    """Sample-of-union == union-of-samples re-sampled (min-wise)."""
    df = spark.createDataFrame([(i,) for i in range(3000)], ["k"])
    shard_a = df.filter(F.col("k") < 1500)
    shard_b = df.filter(F.col("k") >= 1500)
    sa = deterministic_sample(shard_a, 40, on="k", seed=2, hash_col="h")
    sb = deterministic_sample(shard_b, 40, on="k", seed=2, hash_col="h")
    merged = deterministic_sample(
        sa.unionByName(sb).drop("h"), 40, on="k", seed=2
    )
    direct = deterministic_sample(df, 40, on="k", seed=2)
    assert sorted(r["k"] for r in merged.collect()) == sorted(
        r["k"] for r in direct.collect()
    )


# --------------------------------------------------------------- packing


def test_pack_offsets_matches_sequential(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 900)) for i in range(2500)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(8)
    packed = pack_offsets(df, "doc_id", "n_tokens", chunk_size=2048,
                          n_buckets=8)
    got = {r["doc_id"]: r for r in packed.collect()}
    off = 0
    for i, sz in rows:
        r = got[i]
        assert r["offset"] == off
        assert r["first_chunk"] == off // 2048
        assert r["last_chunk"] == max(off, off + sz - 1) // 2048
        assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1
        off += sz


def test_pack_offsets_zero_size_and_single_bucket(spark):
    rows = [(1, 0), (2, 5), (3, 0), (4, 4091)]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    got = {r["doc_id"]: r for r in pack_offsets(
        df, "doc_id", "n", chunk_size=4096, n_buckets=1).collect()}
    assert got[1]["offset"] == 0 and got[1]["n_chunks"] == 1
    assert got[2]["offset"] == 0
    assert got[3]["offset"] == 5 and got[3]["last_chunk"] == 0
    assert got[4]["offset"] == 5 and got[4]["last_chunk"] == 0
    assert got[4]["first_chunk"] == 0


def test_pack_offsets_no_global_single_partition_window(spark):
    """The corpus-side window must be partitioned (parallel), never a
    bare ORDER BY over everything."""
    df = spark.createDataFrame([(i, 10) for i in range(100)], ["doc_id", "n"])
    packed = pack_offsets(df, "doc_id", "n", chunk_size=64, n_buckets=4)
    import re

    plan = packed._jdf.queryExecution().executedPlan().toString()
    # the corpus-side running sum must be a window PARTITIONED by the
    # range bucket (parallel); the only unpartitioned window may be the
    # tiny per-bucket totals prefix (its input is the bucket aggregate)
    windows = re.findall(r"Window \[[^\n]*", plan)
    assert any("__pack_bucket" in w for w in windows)
    corpus_windows = [w for w in windows if "__cum" in w]
    assert corpus_windows and all("__pack_bucket" in w for w in corpus_windows)


def test_chunk_stats(spark):
    rows = [(1, 100), (2, 2000), (3, 100)]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    packed = pack_offsets(df, "doc_id", "n", chunk_size=1024, n_buckets=2)
    stats = chunk_stats(packed).collect()[0]
    assert stats["n_docs"] == 3
    assert stats["n_chunks_total"] == 3  # 2200 tokens / 1024 -> chunks 0..2
    assert stats["n_split_docs"] == 1  # doc 2 spans 0..2


# ----------------------------------------------------- incremental dedup


def test_incremental_dedup_exact_and_bloom(spark, docs):
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    plain = incremental_dedup(new, seen)
    bloomed = incremental_dedup(new, seen, bloom_bits=1 << 14)
    a = sorted(r["doc_id"] for r in plain.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in bloomed.select("doc_id").collect())
    assert a == b  # bloom is an optimization, never changes the answer
    # every surviving doc's fingerprint is absent from seen and unique
    from hyper_spark.functions.text import fingerprint_col as _fpc

    fps_seen = {
        r["fp"] for r in seen.select(_fpc(F.col("text")).alias("fp")).collect()
    }
    surv = [
        r["fp"] for r in plain.select(_fpc(F.col("text")).alias("fp")).collect()
    ]
    assert not (set(surv) & fps_seen)  # nothing seen survives
    assert len(surv) == len(set(surv))  # self-dedup holds
    assert a, "some odd docs must survive"


def test_incremental_dedup_self_dedup_flag(spark):
    seen = spark.createDataFrame([(100, "already seen")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(1, "fresh one"), (2, "fresh one"), (3, "already seen")],
        ["doc_id", "text"],
    )
    kept = sorted(
        r["doc_id"] for r in incremental_dedup(new, seen).collect()
    )
    assert kept == [1]  # 3 is seen; 2 loses self-dedup to 1
    kept_all = sorted(
        r["doc_id"]
        for r in incremental_dedup(new, seen, self_dedup=False).collect()
    )
    assert kept_all == [1, 2]


# ---------------------------------------------------------------- corpus


def test_prepare_corpus_composition(spark, docs):
    from hyper_spark.operators.corpus import prepare_corpus

    out = prepare_corpus(
        docs, splits={"train": 0.9, "val": 0.1}, seed=1
    )
    rows = out.collect()
    assert 0 < len(rows) <= docs.count()
    # every surviving row satisfies the filters
    for r in rows[:100]:
        assert r["quality"] >= 0.35 and r["n_tokens"] >= 5
        assert r["lang_guess"] in ("en", "de", "fr", "es")
        assert r["split"] in ("train", "val")
    # no duplicate fingerprints survive
    n_fp = out.select("fingerprint").distinct().count()
    assert n_fp == len(rows)
    # whole pipeline stays JVM: no Python eval nodes in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "ArrowEval" not in plan
    # the quality/lang/token filter sits under the dedup shuffle: the
    # aggregate's child already contains the Filter
    assert plan.index("Filter") > -1


def test_prepare_corpus_no_dedup_no_split(spark, docs):
    from hyper_spark.operators.corpus import prepare_corpus

    out = prepare_corpus(docs, dedup=False, splits=None, langs=None)
    assert "split" not in out.columns
    # language filter off: 'und'/zh docs may survive
    assert out.count() >= prepare_corpus(docs, splits=None).count()


# ----------------------------------------------- review regression tests


def test_chunk_documents_null_text_and_overlap_tail(spark):
    """Review findings: NULL text must be skipped (not emit a -1-token
    chunk), and with overlap no trailing chunk may be a subset of its
    predecessor."""
    from hyper_spark.operators.corpus import chunk_documents

    words = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, words), (2, None), (3, "short text")], ["doc_id", "text"]
    )
    got = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    ids = {r["doc_id"] for r in got}
    assert ids == {1, 3}  # NULL-text doc skipped entirely
    assert all(r["n_chunk_tokens"] > 0 for r in got)
    # 50 tokens < 64: exactly ONE chunk, no redundant tail
    assert sum(1 for r in got if r["doc_id"] == 1) == 1
    # 100 tokens, chunk 64, step 48: chunks at 0 and 48 (48+64 covers all)
    long = spark.createDataFrame(
        [(9, " ".join(f"t{i}" for i in range(100)))], ["doc_id", "text"]
    )
    starts = sorted(
        r["chunk_idx"]
        for r in chunk_documents(long, chunk_tokens=64, overlap=16).collect()
    )
    assert starts == [0, 1]


def test_pack_offsets_string_order_col_numeric_ordering(spark):
    """Review finding: a digit-string order column must order numerically
    (consistent with the quantile bucketing) at every n_buckets."""
    rows = [(str(i), 10 + i) for i in range(1, 30)]  # '1'..'29'
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    expected = {}
    off = 0
    for i in range(1, 30):
        expected[str(i)] = off
        off += 10 + i
    for nb in (1, 4):
        got = {
            r["doc_id"]: r["offset"]
            for r in pack_offsets(df, "doc_id", "n", 64, n_buckets=nb).collect()
        }
        assert got == expected, nb


def test_incremental_dedup_fingerprint_store(spark):
    """seen side can be a precomputed fingerprint store — no text rescan."""
    import hashlib

    seen_store = spark.createDataFrame(
        [(hashlib.md5(b"already seen").hexdigest(),)], ["fp"]
    )
    new = spark.createDataFrame(
        [(1, "fresh one"), (3, "already seen")], ["doc_id", "text"]
    )
    kept = sorted(
        r["doc_id"]
        for r in incremental_dedup(new, seen_store, seen_fp_col="fp").collect()
    )
    assert kept == [1]


def test_streaming_dedup_null_text_one_winner(spark, tmp_path):
    from pyspark.sql import Row

    from hyper_spark.streaming.dedup_stream import streaming_dedup

    rows = [Row(doc_id=1, text=None), Row(doc_id=2, text=None),
            Row(doc_id=3, text="real")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    src = str(tmp_path / "nsrc")
    df.write.parquet(src)
    q = (
        streaming_dedup(
            spark.readStream.schema(df.schema).parquet(src)
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "nsink"))
        .option("checkpointLocation", str(tmp_path / "nckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "nsink")).collect()
    by_fp = {r["fingerprint"]: r["doc_id"] for r in got}
    assert len(got) == 2  # one NULL-fp winner + one real
    assert by_fp[None] == 1  # min id among the NULL-text rows


def test_decontaminate_leaves_no_corpus_cache(spark):
    from hyper_spark.operators.dedup import decontaminate

    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    base = "shared leaked content words repeated here " * 8
    train = spark.createDataFrame(
        [(1, base), (2, "unrelated material entirely " * 8)],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(9, base)], ["doc_id", "text"])
    def persistent_ids():
        it = jsc.getPersistentRDDs().keySet().iterator()
        ids = set()
        while it.hasNext():
            ids.add(int(str(it.next())))
        return ids

    # compare RDD id SETS, not counts: sibling tests' async unpersists
    # can shrink the baseline mid-test and flake an equality on size
    baseline_ids = persistent_ids()
    kept = decontaminate(train, ev)
    # only the tiny contaminated-id set is cached, never the corpus
    assert len(persistent_ids() - baseline_ids) == 1
    assert [r["doc_id"] for r in kept.collect()] == [2]


# ------------------------------------------------------------ edge cases


def test_hash_split_unnormalized_weights(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    out = hash_split(df, "k", {"a": 2.0, "b": 2.0}, seed=4)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert abs(counts["a"] / 2000 - 0.5) < 0.05  # normalized internally


def test_hash_sample_extreme_fractions(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], ["k"])
    assert hash_sample(df, "k", 0.0).count() == 0
    assert hash_sample(df, "k", 1.0).count() == 300


def test_deterministic_sample_n_exceeds_group(spark):
    df = spark.createDataFrame([(i, i % 2) for i in range(10)], ["k", "g"])
    assert deterministic_sample(df, 100, on="k").count() == 10
    per_g = deterministic_sample(df, 100, on="k", by=["g"])
    assert per_g.count() == 10


def test_hash_split_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        hash_split(df, "k", {})
    with pytest.raises(ValueError):
        hash_split(df, "k", {"a": 0.0})
    with pytest.raises(ValueError):
        pack_offsets(df.withColumnRenamed("k", "doc_id")
                     .withColumn("n", F.lit(1)), "doc_id", "n", 0)


# ------------------------------------------------------- weighted sampling


def test_weighted_sample_matches_python_aes(spark):
    """A-ES weighted sample replicated key-for-key in pure Python."""
    import math

    rows = [(i, float(1 + (i % 7))) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "w"])
    got = sorted(
        r["k"] for r in deterministic_sample(
            df, 30, on="k", seed=5, weight="w").collect()
    )

    def aes_key(k, w):
        u = (int(_draw(str(k), "5"), 16) + 1) / 2**32
        return u ** (1.0 / w)

    expect = sorted(
        sorted(rows, key=lambda t: (-aes_key(t[0], t[1]), str(t[0])))[:30]
    )
    assert got == sorted(t[0] for t in expect)


def test_weighted_sample_prefers_heavy_rows(spark):
    rows = [(i, 50.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k", "w"])
    picked = [r["k"] for r in deterministic_sample(
        df, 100, on="k", seed=3, weight="w").collect()]
    heavy = sum(1 for k in picked if k < 50)
    # 50 heavy rows at 50x weight dominate the sample
    assert heavy >= 35
    # zero/NULL weights never selected
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, None), (3, 1.0)], "k bigint, w double"
    )
    assert [r["k"] for r in deterministic_sample(
        df2, 3, on="k", weight="w").collect()] == [3]


def test_weighted_sample_excludes_nan(spark):
    """Review finding: NaN > 0 is TRUE in Spark SQL — NaN weights must
    not leak into the sample."""
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 1.0), (3, float("nan")), (4, 2.0)],
        "k bigint, w double",
    )
    got = sorted(r["k"] for r in deterministic_sample(
        df, 4, on="k", weight="w").collect())
    assert got == [2, 4]


def test_load_table_parquet_wins_over_catalog(spark, sf_correct):
    """Review finding: a same-named temp/catalog table must never shadow
    an explicitly requested parquet sf_dir."""
    from hyper_spark.sources.tables import load_table

    fake = spark.createDataFrame([(1,)], ["only_col"])
    fake.write.mode("overwrite").saveAsTable("events")
    try:
        ev = load_table(spark, "events", sf_correct)
        assert "user_id" in ev.columns  # the parquet table, not the fake
    finally:
        spark.sql("DROP TABLE IF EXISTS events")


def test_distinct_sample_uniform_over_distinct_set(spark):
    """Bottom-n of md5 over the DISTINCT keys, regardless of row
    multiplicity — the hot key appears at most once."""
    rows = [(i % 200, "x") for i in range(5000)]  # 200 keys, heavy dups
    rows += [(0, "hot")] * 2000  # key 0 is 10% of all rows
    df = spark.createDataFrame(rows, ["k", "v"])
    got = sorted(r["k"] for r in distinct_sample(df, "k", 30, seed=3).collect())
    expected = sorted(
        sorted(range(200), key=lambda k: (_draw(str(k), "3"), str(k)))[:30]
    )
    assert got == expected
    assert len(set(got)) == 30


def test_distinct_sample_prefilter_matches_unfiltered(spark):
    """The hash-threshold scale path selects the identical set as the
    plain bottom-n (the filter can only prune keys above the n-th)."""
    df = spark.createDataFrame([(i,) for i in range(20000)], ["k"])
    pre = distinct_sample(df, "k", 25, seed=1, oversample=4.0)
    full = distinct_sample(df, "k", 25, seed=1, oversample=1e9)
    assert sorted(r["k"] for r in pre.collect()) == sorted(
        r["k"] for r in full.collect()
    )


def test_distinct_sample_row_multiplicity_invariant(spark):
    a = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    b = a.unionByName(a).unionByName(a)  # 3x duplication
    sa = sorted(r["k"] for r in distinct_sample(a, "k", 20, seed=7).collect())
    sb = sorted(r["k"] for r in distinct_sample(b, "k", 20, seed=7).collect())
    assert sa == sb


def test_distinct_sample_multicol_and_nulls(spark):
    rows = [("u1", "click"), ("u1", "view"), (None, "click"), ("u2", None)]
    rows += [(f"u{i}", "view") for i in range(3, 50)]
    df = spark.createDataFrame(rows, ["u", "e"])
    got = distinct_sample(df, ["u", "e"], 10, seed=0).collect()
    assert len(got) == 10
    assert all(r["u"] is not None and r["e"] is not None for r in got)
    # deterministic: second run identical
    again = distinct_sample(df, ["u", "e"], 10, seed=0).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_distinct_sample_n_exceeds_distinct(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(100)], ["k"])
    got = distinct_sample(df, "k", 50).collect()
    assert sorted(r["k"] for r in got) == [0, 1, 2, 3, 4]


def test_distinct_sample_by_per_group_bottom_n(spark):
    """Each stratum independently gets the bottom-n of md5 over ITS
    distinct keys; small strata return their full distinct set."""
    from hyper_spark.operators.sampling import distinct_sample_by

    rows = [(f"g{i % 3}", i) for i in range(300)]       # 100 keys per stratum
    rows += [("tiny", 9000 + i) for i in range(4)]      # stratum below n
    df = spark.createDataFrame(rows, ["g", "k"])
    got = {}
    for r in distinct_sample_by(df, "g", "k", 10, seed=2).collect():
        got.setdefault(r["g"], []).append(r["k"])
    for g in ("g0", "g1", "g2"):
        members = [i for i in range(300) if f"g{i % 3}" == g]
        expect = sorted(members, key=lambda k: (_draw(str(k), "2"), str(k)))[:10]
        assert sorted(got[g]) == sorted(expect)
    assert sorted(got["tiny"]) == [9000, 9001, 9002, 9003]


def test_distinct_sample_by_prefilter_matches_unfiltered(spark):
    from hyper_spark.operators.sampling import distinct_sample_by

    df = spark.createDataFrame(
        [(f"g{i % 2}", i) for i in range(20000)], ["g", "k"]
    )
    pre = distinct_sample_by(df, "g", "k", 15, seed=4, oversample=4.0)
    full = distinct_sample_by(df, "g", "k", 15, seed=4, oversample=1e9)
    assert sorted(map(tuple, pre.collect())) == sorted(map(tuple, full.collect()))


def test_distinct_sample_by_multiplicity_and_null_group(spark):
    from hyper_spark.operators.sampling import distinct_sample_by

    rows = [("a", i) for i in range(50)] + [(None, i) for i in range(50, 90)]
    df = spark.createDataFrame(rows, ["g", "k"])
    tripled = df.unionByName(df).unionByName(df)
    keyf = lambda t: (t[0] is None, t[0] or "", t[1])  # None-safe sort
    one = sorted(
        map(tuple, distinct_sample_by(df, "g", "k", 8, seed=1).collect()),
        key=keyf,
    )
    three = sorted(
        map(tuple, distinct_sample_by(tripled, "g", "k", 8, seed=1).collect()),
        key=keyf,
    )
    assert one == three
    assert len(one) == 16  # 8 from 'a', 8 from the NULL stratum
    assert sum(1 for g, _ in one if g is None) == 8


def test_distinct_sample_est_distinct_single_scan_same_set(spark):
    """Supplying the cardinality skips the estimate pass but returns
    the identical sample (exactness is retry-guarded, not
    estimate-dependent) — even when the estimate is badly wrong."""
    df = spark.createDataFrame([(i % 3000,) for i in range(30000)], ["k"])
    auto = sorted(r["k"] for r in distinct_sample(df, "k", 25, seed=5).collect())
    given = sorted(
        r["k"]
        for r in distinct_sample(df, "k", 25, seed=5, est_distinct=3000).collect()
    )
    wrong = sorted(
        r["k"]
        for r in distinct_sample(df, "k", 25, seed=5, est_distinct=3e9).collect()
    )
    assert auto == given == wrong


def test_distinct_sample_by_null_stratum_prefilter_engages(spark):
    """A LARGE NULL stratum must be prunable (eqNullSafe join) and must
    not trip the shortfall fallback — sample matches unfiltered."""
    from hyper_spark.operators.sampling import distinct_sample_by

    rows = [(None, i) for i in range(5000)] + [("a", i) for i in range(5000, 5050)]
    df = spark.createDataFrame(rows, ["g", "k"])
    keyf = lambda t: (t[0] is None, t[0] or "", t[1])
    pre = sorted(
        map(tuple, distinct_sample_by(df, "g", "k", 10, seed=3, oversample=4.0).collect()),
        key=keyf,
    )
    full = sorted(
        map(tuple, distinct_sample_by(df, "g", "k", 10, seed=3, oversample=1e12).collect()),
        key=keyf,
    )
    assert pre == full
    assert sum(1 for g, _ in pre if g is None) == 10
