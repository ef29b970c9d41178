"""Spark-vs-kernel / Spark-vs-exact differential tests for count-min,
KLL, t-digest, Bloom operators."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.kernel.bloom import BloomFilter
from hyper_spark.kernel.cms import CountMinSketch
from hyper_spark.operators.bloom_agg import (
    bloom_by,
    bloom_collect,
    bloom_might_contain,
    bloom_prune,
)
from hyper_spark.operators.cms_agg import (
    cms_by,
    cms_collect,
    cms_estimate,
    heavy_hitters,
)
from hyper_spark.operators.quantiles import quantiles_by, kll_by, sketch_quantiles


def zipf_rows(n: int, vocab: int = 40, seed: int = 3):
    import random

    rng = random.Random(seed)
    return [
        Row(item=f"item{min(vocab - 1, int(rng.random() ** 3 * vocab))}", g=i % 3)
        for i in range(n)
    ]


# ------------------------------------------------------------- count-min


def test_cms_spark_matches_kernel(spark):
    rows = zipf_rows(8000)
    df = spark.createDataFrame(rows).repartition(8)
    sk = cms_collect(cms_by(df, [], "item", depth=4, width=512, hash_fn="md5"))
    kern = CountMinSketch(4, 512).add_many(r.item for r in rows)
    assert sk == kern  # counter-exact
    assert sk.n == kern.n


def test_cms_grouped(spark):
    rows = zipf_rows(6000)
    df = spark.createDataFrame(rows)
    per_g = cms_by(df, ["g"], "item", depth=3, width=256, hash_fn="md5").collect()
    assert len(per_g) == 3
    by_g: dict[int, list] = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r.item)
    for row in per_g:
        kern = CountMinSketch(3, 256).add_many(by_g[row["g"]])
        assert bytes(row["counters"]) == kern.to_bytes()


def test_cms_estimate_bounds(spark):
    rows = zipf_rows(10000)
    df = spark.createDataFrame(rows).repartition(6)
    sketch = cms_by(df, [], "item", depth=5, width=2048)
    candidates = df.select("item").distinct()
    est = {
        r["item"]: r["est_count"]
        for r in cms_estimate(sketch, candidates, "item").collect()
    }
    exact = Counter(r.item for r in rows)
    eps_n = np.e / 2048 * len(rows)
    for item, true_count in exact.items():
        assert est[item] >= true_count
        assert est[item] <= true_count + eps_n


def test_heavy_hitters_exact_and_sketch(spark):
    rows = zipf_rows(12000)
    df = spark.createDataFrame(rows).repartition(8)
    exact_counts = Counter(r.item for r in rows)
    true_top5 = [v for v, _ in exact_counts.most_common(5)]

    hh_exact = heavy_hitters(df, "item", k=5, exact=True).collect()
    assert [r["item"] for r in hh_exact] == true_top5
    assert [r["est_count"] for r in hh_exact] == [exact_counts[v] for v in true_top5]

    hh_cms = heavy_hitters(df, "item", k=5, width=8192).collect()
    # sketch ordering can swap near-ties; membership of the top set must hold
    assert set(r["item"] for r in hh_cms) == set(true_top5)


# ------------------------------------------------------------- quantiles


@pytest.mark.parametrize("method", ["kll", "tdigest"])
def test_quantiles_within_rank_bound(spark, method):
    rng = np.random.default_rng(7)
    values = rng.normal(50, 10, 40000)
    df = spark.createDataFrame([Row(v=float(x)) for x in values]).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = quantiles_by(df, [], "v", qs, method=method).collect()[0]
    sorted_v = np.sort(values)
    for q in qs:
        est = got[f"q_{int(q * 1000):04d}"]
        true_rank = np.searchsorted(sorted_v, est, side="right") / len(values)
        assert abs(true_rank - q) <= 0.02, (method, q, true_rank)


def test_quantiles_grouped_vs_exact(spark, sf_correct):
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    got = quantiles_by(events, ["event_type"], "value", [0.5], method="kll").collect()
    exact = {
        r["event_type"]: r["m"]
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    values = {
        r["event_type"]: events.filter(F.col("event_type") == r["event_type"])
        for r in got
    }
    for r in got:
        # rank of our median estimate must be within 2% of 0.5
        df_t = values[r["event_type"]]
        n = df_t.count()
        rank = df_t.filter(F.col("value") <= r["q_0500"]).count() / n
        assert abs(rank - 0.5) <= 0.02, (r["event_type"], rank)


def test_kll_sketch_state_mergeable(spark):
    values = np.arange(20000, dtype=float)
    df = spark.createDataFrame([Row(v=float(x), h=int(x) % 4) for x in values])
    per_h = kll_by(df, ["h"], "v", k=200)
    rolled = sketch_quantiles(per_h.drop("h"), [0.5])
    got = rolled.collect()[0]["q_0500"]
    assert abs(got - 10000) / 10000 <= 0.02


# ------------------------------------------------------------- bloom


def test_bloom_spark_matches_kernel(spark):
    items = [f"key-{i}" for i in range(3000)]
    df = spark.createDataFrame([Row(v=v) for v in items]).repartition(8)
    bf = bloom_collect(bloom_by(df, [], "v", m_bits=1 << 15, k=5, hash_fn="md5"))
    kern = BloomFilter(1 << 15, 5).add_many(items)
    assert np.array_equal(bf.bits, kern.bits)  # bit-exact
    assert bf.n == 3000


def test_bloom_membership_no_false_negatives(spark):
    items = [f"key-{i}" for i in range(2000)]
    df = spark.createDataFrame([Row(v=v) for v in items])
    bloom = bloom_by(df, [], "v", m_bits=1 << 15, k=5)
    probes = spark.createDataFrame(
        [Row(v=v) for v in items[:500]] + [Row(v=f"miss-{i}") for i in range(500)]
    )
    got = bloom_might_contain(bloom, probes, "v").collect()
    hits = {r["v"]: r["might_contain"] for r in got}
    assert all(hits[v] for v in items[:500])
    fp = sum(hits[f"miss-{i}"] for i in range(500))
    assert fp / 500 < 0.05


def test_bloom_prune_keeps_all_matches(spark, sf_correct):
    orders = spark.read.parquet(f"{sf_correct}/orders.parquet")
    customer = spark.read.parquet(f"{sf_correct}/customer.parquet")
    small = customer.filter("c_custkey % 10 = 0")
    bloom = bloom_by(small, [], "c_custkey", m_bits=1 << 16, k=5)
    pruned = bloom_prune(bloom, orders, "o_custkey")
    exact_matches = orders.join(
        small.select(F.col("c_custkey").alias("o_custkey")), on="o_custkey", how="leftsemi"
    )
    # no false negatives: every truly-matching row survives pruning
    assert pruned.join(exact_matches, on=list(orders.columns), how="leftsemi").count() == exact_matches.count()
    # and pruning actually prunes
    assert pruned.count() < orders.count()


def test_heavy_hitters_grouped(spark):
    """Grouped top-k is independent per group: each group's winners are
    its OWN hot values even when they are globally rare, counts are
    exact, and ties break deterministically by value."""
    import pytest as _pytest

    rows = []
    # group g0: a dominates; group g1: z dominates but z is globally rare
    rows += [Row(g="g0", v="a")] * 50 + [Row(g="g0", v="b")] * 30
    rows += [Row(g="g0", v=f"noise{i}") for i in range(40)]
    rows += [Row(g="g1", v="z")] * 9 + [Row(g="g1", v="y")] * 7
    rows += [Row(g="g1", v=f"n{i}") for i in range(30)]
    df = spark.createDataFrame(rows).repartition(7)
    got = heavy_hitters(df, "v", k=2, by=["g"], exact=True).collect()
    per_g = {}
    for r in got:
        per_g.setdefault(r["g"], []).append((r["v"], r["est_count"]))
    assert sorted(per_g["g0"]) == [("a", 50), ("b", 30)]
    assert sorted(per_g["g1"]) == [("y", 7), ("z", 9)]
    with _pytest.raises(ValueError):
        heavy_hitters(df, "v", k=2, by=["g"], guarantee=True)


def test_heavy_hitters_grouped_null_group(spark):
    """Review fix: a NULL group key is a real group (groupBy semantics);
    the null-safe rescan must keep its top-k instead of dropping it."""
    rows = (
        [Row(g="a", v="x")] * 5
        + [Row(g=None, v="n1")] * 7
        + [Row(g=None, v="n2")] * 3
    )
    df = spark.createDataFrame(rows).repartition(3)
    got = heavy_hitters(df, "v", k=2, by=["g"], exact=True).collect()
    per_g = {}
    for r in got:
        per_g.setdefault(r["g"], []).append((r["v"], r["est_count"]))
    assert sorted(per_g[None]) == [("n1", 7), ("n2", 3)]
    assert per_g["a"] == [("x", 5)]


def test_heavy_hitters_guarantee_flat_skew(spark):
    """VERDICT r01 wrong #4: a true top-k item that is moderately
    frequent EVERYWHERE but local top-(k*fanout) NOWHERE. The heuristic
    candidate pass misses it by construction; guarantee=True (CMS
    threshold pass) must return the exact top-k."""
    from pyspark.sql import Row

    from hyper_spark.operators.cms_agg import heavy_hitters, local_topk_candidates

    rows = []
    for p in range(8):
        for i in range(20):
            rows += [Row(pkey=p, v=f"j{p}_{i}")] * 9  # 20 junk values x9
        for h in ("H1", "H2", "H3"):
            rows += [Row(pkey=p, v=h)] * 2  # heavies: 2 per partition
    df = spark.createDataFrame(rows).repartitionByRange(8, "pkey")
    # globally: H* count 16 each, junk 9 each -> true top-3 is H1..H3
    # locally: H* count ~2-4 < junk 9 -> never in local top-12
    cand = {r["v"] for r in local_topk_candidates(df, "v", k=3).collect()}
    assert not {"H1", "H2", "H3"} & cand  # the heuristic gap, by design
    heur = heavy_hitters(df, "v", k=3, exact=True).collect()
    assert {r["v"] for r in heur} != {"H1", "H2", "H3"}
    got = heavy_hitters(df, "v", k=3, exact=True, guarantee=True).collect()
    assert [(r["v"], r["est_count"]) for r in got] == [
        ("H1", 16), ("H2", 16), ("H3", 16),
    ]


def test_empty_input_operators(spark):
    """Empty inputs yield empty results, never executor crashes."""
    from hyper_spark.operators.bloom_agg import bloom_by
    from hyper_spark.operators.cms_agg import cms_by, heavy_hitters
    from hyper_spark.operators.hll_agg import (
        approx_distinct,
        sketch_by,
        union_sketches,
    )
    from hyper_spark.operators.quantiles import quantiles_by

    empty = spark.createDataFrame([], "g string, v string, x double")
    assert sketch_by(empty, ["g"], "v", 12).count() == 0
    assert sketch_by(empty, [], "v", 12, strategy="partial").count() == 0
    assert approx_distinct(empty, [], "v", 12).count() == 0
    assert union_sketches(sketch_by(empty, ["g"], "v", 12), []).count() == 0
    assert heavy_hitters(empty, "v", k=3, exact=True).count() == 0
    assert heavy_hitters(empty, "v", k=3, exact=True, guarantee=True).count() == 0
    assert cms_by(empty, [], "v").count() == 0
    assert bloom_by(empty, [], "v").count() == 0
    assert quantiles_by(empty, [], "x", [0.5], "kll").count() == 0


def test_cms_fast_hash_bounds_and_consistency(spark):
    """xxhash64 CMS fast path: estimates respect the CMS one-sided bound
    (never under, over by <= eps*n at prob 1-delta) and build/estimate
    are hash-consistent; heavy_hitters(hash_fn='xxhash64') finds the
    same exact top-k on a zipf-ish corpus."""
    from hyper_spark.operators.cms_agg import cms_by, cms_estimate, heavy_hitters

    rows = [(f"v{i % 100}",) for i in range(5000)]
    df = spark.createDataFrame(rows, ["v"]).cache()
    exact = {r["v"]: r["cnt"] for r in
             df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for hf in ("md5", "xxhash64"):
        sk = cms_by(df, [], "v", depth=5, width=2048, hash_fn=hf)
        cand = df.select("v").distinct()
        est = {r["v"]: r["est_count"] for r in
               cms_estimate(sk, cand, "v", hash_fn=hf).collect()}
        n = sum(exact.values())
        eps = 2.718281828 / 2048
        for v, cnt in exact.items():
            assert est[v] >= cnt, (hf, v)       # never underestimates
            assert est[v] <= cnt + eps * n * 3, (hf, v)
    # guarantee=True exercises the CMS threshold pass (exact=True alone
    # never touches hash_fn)
    hh_md5 = [(r["v"], r["est_count"]) for r in
              heavy_hitters(df, "v", k=5, guarantee=True).collect()]
    hh_xx = [(r["v"], r["est_count"]) for r in
             heavy_hitters(df, "v", k=5, guarantee=True,
                           hash_fn="xxhash64").collect()]
    assert hh_md5 == hh_xx
    df.unpersist()


def test_heavy_hitters_guarantee_fast_hash(spark):
    """The exact-top-k guarantee holds under the fast hash too (the
    threshold pass only needs the one-sided CMS bound, any hash)."""
    from hyper_spark.operators.cms_agg import heavy_hitters

    rows = [(f"x{i}",) for i in range(200) for _ in range(5)]
    rows += [("big1",)] * 40 + [("big2",)] * 30
    df = spark.createDataFrame(rows, ["v"])
    got = heavy_hitters(df, "v", k=2, guarantee=True, hash_fn="xxhash64")
    top = [(r["v"], r["est_count"]) for r in got.collect()]
    assert top == [("big1", 40), ("big2", 30)]


def test_bloom_fast_hash_no_false_negatives(spark):
    from hyper_spark.operators.bloom_agg import bloom_by, bloom_prune

    members = spark.createDataFrame([(i,) for i in range(0, 500, 5)], ["v"])
    probe = spark.createDataFrame([(i,) for i in range(500)], ["v"])
    bloom = bloom_by(members, [], "v", m_bits=1 << 14, hash_fn="xxhash64")
    kept = {r["v"] for r in bloom_prune(bloom, probe, "v",
                                        hash_fn="xxhash64").collect()}
    assert set(range(0, 500, 5)) <= kept  # no false negatives
    fp = len(kept) - 100
    assert fp <= 50  # loose FPR sanity at m=16k, n=100


def test_profile_table(spark, sf_correct):
    from hyper_spark.operators.profile import profile_table

    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    prof = {r["column"]: r for r in profile_table(events, p=12).collect()}
    n = events.count()
    assert set(prof) == set(events.columns)  # all atomic columns profiled
    for c, r in prof.items():
        assert r["n_rows"] == n
        nn = events.filter(F.col(c).isNotNull()).count()
        assert r["n_nulls"] == n - nn
        exact = events.select(c).distinct().filter(
            F.col(c).isNotNull()).count()
        if exact:
            assert abs(r["approx_distinct"] - exact) / exact < 0.1, c
    # min/max strings round-trip for a numeric column
    lo, hi = events.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    assert prof["event_id"]["min_value"] == str(lo)
    assert prof["event_id"]["max_value"] == str(hi)


def test_profile_table_skips_complex_and_handles_nulls(spark):
    from pyspark.sql import Row

    from hyper_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [Row(a=1, b=None, arr=[1, 2]), Row(a=2, b="x", arr=[])],
        "a bigint, b string, arr array<bigint>",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"a", "b"}  # array column skipped
    assert prof["b"]["n_nulls"] == 1 and prof["b"]["null_frac"] == 0.5


def test_companion_sql_scalars(spark):
    """SQL-only consumption of COMPANION sketch tables: quantile
    estimate + N-way merge over KLL/t-digest state rows, md5 CMS/Bloom
    probes, and the hash-mix guard raising for xxhash64-built rows."""
    import pytest

    from hyper_spark.kernel.kll import KllSketch
    from hyper_spark.operators.bloom_agg import bloom_by
    from hyper_spark.operators.cms_agg import cms_by
    from hyper_spark.operators.quantiles import kll_by
    from hyper_spark.sql import register_sql_functions

    names = register_sql_functions(spark)
    assert {"sketch_quantile", "sketch_merge_states", "cms_lookup",
            "bloom_contains"} <= set(names)
    rows = [Row(g=i % 3, v=float((i * 37) % 1000)) for i in range(3000)]
    df = spark.createDataFrame(rows).repartition(4)
    kll_by(df, ["g"], "v").createOrReplaceTempView("qsk")
    # per-group median via SQL == kernel quantile of the same state
    import json as _json

    got = {r["g"]: r["m"] for r in spark.sql(
        "SELECT g, sketch_quantile(kind, state, 0.5) AS m FROM qsk"
    ).collect()}
    for r in spark.table("qsk").collect():
        kern = KllSketch.from_dict(_json.loads(r["state"]))
        assert got[r["g"]] == kern.quantile(0.5)
    # N-way merge over collect_list == kernel merge of all states
    merged = spark.sql(
        "SELECT sketch_quantile('kll', sketch_merge_states('kll', "
        "collect_list(state)), 0.9) AS q90 FROM qsk"
    ).collect()[0]["q90"]
    kern_all = None
    for r in spark.table("qsk").collect():
        k = KllSketch.from_dict(_json.loads(r["state"]))
        kern_all = k if kern_all is None else kern_all.merge(k)
    assert merged == kern_all.quantile(0.9)

    items = spark.createDataFrame(
        [Row(v=f"item{i % 20}") for i in range(2000)]
    )
    cms_by(items, [], "v", depth=4, width=512, hash_fn="md5"
           ).createOrReplaceTempView("csk")
    est = spark.sql(
        "SELECT cms_lookup(depth, width, counters, hash_fn, 'item3') AS e"
        " FROM csk"
    ).collect()[0]["e"]
    assert est >= 100  # exact count of item3 is 100; CMS never under
    bloom_by(items, [], "v", m_bits=1 << 13, hash_fn="md5"
             ).createOrReplaceTempView("bsk")
    hits = spark.sql(
        "SELECT bloom_contains(m_bits, k, bits, hash_fn, 'item7') AS a,"
        " bloom_contains(m_bits, k, bits, hash_fn, 'nope_xyz') AS b"
        " FROM bsk"
    ).collect()[0]
    assert hits["a"] is True  # no false negatives
    # xxhash64-built rows refuse SQL (md5-kernel) probes
    cms_by(items, [], "v", depth=4, width=512).createOrReplaceTempView("cxx")
    with pytest.raises(Exception, match="hash_fn"):
        spark.sql(
            "SELECT cms_lookup(depth, width, counters, hash_fn, 'item3')"
            " FROM cxx"
        ).collect()


def test_hash_fn_mismatch_is_an_error_not_corruption(spark):
    """Build/probe hash mismatch must raise (it would otherwise produce
    silently-wrong CMS estimates and Bloom FALSE NEGATIVES)."""
    from hyper_spark.operators.bloom_agg import bloom_by, bloom_might_contain
    from hyper_spark.operators.cms_agg import cms_by, cms_collect, cms_estimate

    df = spark.createDataFrame([(f"v{i}",) for i in range(50)], ["v"])
    # md5-built sketches probed with the (xxhash64) default must raise
    sk_md5 = cms_by(df, [], "v", depth=3, width=256, hash_fn="md5")
    with pytest.raises(Exception, match="hash_fn"):
        cms_estimate(sk_md5, df.select("v").distinct(), "v").collect()
    sk_xx = cms_by(df, [], "v", depth=3, width=256)  # default = xxhash64
    with pytest.raises(Exception, match="hash_fn"):
        cms_collect(sk_xx)  # kernel is md5-only
    bl_md5 = bloom_by(df, [], "v", m_bits=1 << 12, hash_fn="md5")
    with pytest.raises(Exception, match="hash_fn"):
        bloom_might_contain(bl_md5, df, "v").collect()
    # matched hash fns work
    assert cms_estimate(
        sk_md5, df.select("v").distinct(), "v", hash_fn="md5"
    ).count() == 50
    assert cms_estimate(sk_xx, df.select("v").distinct(), "v").count() == 50


def test_vocab_stats_oracle(spark):
    """vocab_stats vs a Python Counter oracle: exact counts, tie order
    (count desc, token asc), frac/cum_frac arithmetic, top_k cut."""
    import re
    from collections import Counter

    from hyper_spark.operators.profile import vocab_stats

    docs = [
        (0, "b b b a a c"),
        (1, "a a d! e, c c"),
        (2, "E e e a"),
        (3, None),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cnt = Counter()
    for _i, t in docs:
        if t is None:
            continue
        cnt.update(re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" "))
    total = sum(cnt.values())
    expected = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]

    rows = vocab_stats(df, top_k=3).collect()
    assert [(r["token"], r["count"]) for r in rows] == expected
    cum = 0
    for i, r in enumerate(rows):
        cum += r["count"]
        assert r["rank"] == i + 1
        assert r["frac"] == pytest.approx(r["count"] / total)
        assert r["cum_frac"] == pytest.approx(cum / total)

    with pytest.raises(ValueError):
        vocab_stats(df, top_k=0)


def test_vocab_stats_single_scan(spark, sf_correct):
    """The total-occurrences aggregate must reuse the vocab shuffle
    (AQE ReusedExchange), not rescan+re-explode the corpus. Exchange
    reuse fires at runtime under AQE, so execute first, then inspect
    the final plan."""
    from hyper_spark.operators.profile import vocab_stats

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    df = vocab_stats(docs, top_k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


def test_vocab_drift_and_divergence_oracle(spark):
    """vocab_drift / vocab_divergence vs a Python oracle: exact
    counts, JSD arithmetic (log2), union-vocab handling of one-sided
    tokens, identical corpora -> jsd 0."""
    import math
    import re
    from collections import Counter

    from hyper_spark.operators.profile import vocab_divergence, vocab_drift

    a_docs = [(0, "a a b c"), (1, "a d! d")]
    b_docs = [(0, "a b b e"), (1, None), (2, "e e")]
    a = spark.createDataFrame(a_docs, ["doc_id", "text"])
    b = spark.createDataFrame(b_docs, ["doc_id", "text"])

    def counts(docs):
        c = Counter()
        for _, t in docs:
            if t:
                c.update(
                    x
                    for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ")
                    if x
                )
        return c

    ca, cb = counts(a_docs), counts(b_docs)
    ta, tb = sum(ca.values()), sum(cb.values())
    union = sorted(set(ca) | set(cb))
    jsd = 0.0
    for w in union:
        fa, fb = ca[w] / ta, cb[w] / tb
        m = (fa + fb) / 2
        if fa > 0:
            jsd += fa * math.log2(fa / m) / 2
        if fb > 0:
            jsd += fb * math.log2(fb / m) / 2

    row = vocab_divergence(a, b).collect()[0]
    assert row["jsd_bits"] == pytest.approx(jsd, abs=1e-12)
    assert row["vocab_a"] == len(ca) and row["vocab_b"] == len(cb)
    assert row["shared_vocab"] == len(set(ca) & set(cb))
    assert row["total_a"] == ta and row["total_b"] == tb

    movers = vocab_drift(a, b, top_k=3).collect()
    exp = sorted(
        ((w, ca[w], cb[w], ca[w] / ta, cb[w] / tb) for w in union),
        key=lambda r: (-abs(r[4] - r[3]), r[0]),
    )[:3]
    assert [(r["token"], r["c_a"], r["c_b"]) for r in movers] == [
        (w, x, y) for w, x, y, *_ in exp
    ]
    for r, (_, _, _, fa, fb) in zip(movers, exp):
        assert r["delta"] == pytest.approx(fb - fa, abs=1e-12)

    # identical corpora: zero divergence
    same = vocab_divergence(a, a).collect()[0]
    assert same["jsd_bits"] == pytest.approx(0.0, abs=1e-12)


def test_vocab_divergence_empty_side_is_null(spark):
    """An empty corpus has no token distribution: jsd_bits must be
    NULL (not 0, not an error) and the counts still report."""
    from hyper_spark.operators.profile import vocab_divergence

    docs = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    r = vocab_divergence(docs.filter("1=0"), docs).collect()[0]
    assert r["jsd_bits"] is None
    assert r["total_a"] == 0 and r["total_b"] == 3


# --------------------------------------------------- cms inner product
def test_cms_inner_product_exact_and_bound(spark):
    """Inner product vs the exact Σ f_L(v)·f_R(v): always an
    overcount, within eps·n_l·n_r. With width >> vocab, collisions
    are rare enough that the estimate is exact."""
    import math

    from hyper_spark.operators.cms_agg import cms_inner_product

    left_rows = zipf_rows(4000, vocab=30, seed=7)
    right_rows = zipf_rows(3000, vocab=30, seed=11)
    ldf, rdf = spark.createDataFrame(left_rows), spark.createDataFrame(right_rows)
    a = cms_by(ldf, [], "item", depth=5, width=4096)
    b = cms_by(rdf, [], "item", depth=5, width=4096)
    got = cms_inner_product(a, b).collect()[0]
    ca, cb = Counter(r.item for r in left_rows), Counter(r.item for r in right_rows)
    exact = sum(ca[v] * cb[v] for v in ca)
    eps = math.e / 4096
    assert got["inner_product"] >= exact
    assert got["inner_product"] <= exact + eps * got["n_l"] * got["n_r"]
    assert (got["n_l"], got["n_r"]) == (4000, 3000)
    # wide sketch, 30-value vocab: exact
    assert got["inner_product"] == exact


def test_cms_inner_product_is_join_size(spark):
    """Self inner product == Σ f(v)² == the self-equijoin row count."""
    from hyper_spark.operators.cms_agg import cms_inner_product

    df = spark.createDataFrame(zipf_rows(2000, vocab=20, seed=5))
    sk = cms_by(df, [], "item", depth=5, width=4096)
    est = cms_inner_product(sk, sk).collect()[0]["inner_product"]
    exact = (
        df.alias("a").join(df.alias("b"), on="item").count()
    )
    assert est == exact


def test_cms_inner_product_grouped_and_guards(spark):
    from hyper_spark.operators.cms_agg import cms_inner_product

    df = spark.createDataFrame(zipf_rows(3000, vocab=25, seed=9))
    a = cms_by(df, ["g"], "item", depth=5, width=4096)
    b = cms_by(df.filter("g != 2"), ["g"], "item", depth=5, width=4096)
    got = {r["g"]: r["inner_product"] for r in cms_inner_product(a, b, on=["g"]).collect()}
    assert set(got) == {0, 1}  # inner join on g
    by_g = {}
    for r in zipf_rows(3000, vocab=25, seed=9):
        by_g.setdefault(r.g, Counter())[r.item] += 1
    for g in (0, 1):
        assert got[g] == sum(c * c for c in by_g[g].values())
    # dimension mismatch refuses
    narrow = cms_by(df, [], "item", depth=5, width=2048)
    wide = cms_by(df, [], "item", depth=5, width=4096)
    with pytest.raises(Exception, match="dimensions"):
        cms_inner_product(narrow, wide).collect()
    # hash_fn mismatch refuses
    md5_sk = cms_by(df, [], "item", depth=5, width=4096, hash_fn="md5")
    with pytest.raises(Exception, match="hash_fn"):
        cms_inner_product(md5_sk, wide).collect()


def test_kernel_inner_product_overflow_safe():
    """Counts whose dot product exceeds int64 still compute exactly
    (the 100-TB case: n_l·n_b ~ 10^24)."""
    a = CountMinSketch(2, 8)
    b = CountMinSketch(2, 8)
    big = 3_000_000_000_000  # 3e12; squared = 9e24 >> int64 max
    a.add("k", big)
    b.add("k", big)
    assert a.inner_product(b) == big * big


def test_sketch_ranks_grouped_bounds(spark, sf_correct):
    """ranks_by: estimated CDF within the KLL normalized-rank bound of
    the exact per-group fraction; t-digest states refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from hyper_spark.operators.quantiles import ranks_by, sketch_ranks, tdigest_by

    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    probes = [50.0, 100.0, 250.0]
    got = ranks_by(events, ["event_type"], "value", probes).collect()
    assert len(got) == 5 * len(probes)
    for r in got:
        exact = (
            events.filter(F.col("event_type") == r["event_type"])
            .select(
                F.avg((F.col("value") <= r["value"]).cast("double")).alias("f")
            )
            .collect()[0]["f"]
        )
        assert abs(r["rank"] - exact) <= 0.02, (r, exact)
    # monotone CDF per group
    by_g = {}
    for r in got:
        by_g.setdefault(r["event_type"], []).append((r["value"], r["rank"]))
    for pairs in by_g.values():
        ranks = [rk for _, rk in sorted(pairs)]
        assert ranks == sorted(ranks)
    with _pytest.raises(Exception, match="needs KLL"):
        sketch_ranks(
            tdigest_by(events, [], "value"), [50.0]
        ).collect()


def test_category_stats_hand_case(spark):
    import math

    from hyper_spark.operators.profile import category_stats

    rows = [("g", "a"), ("g", "a"), ("g", "b"), ("g", "c"), ("g", None)]
    df = spark.createDataFrame(rows, "k string, v string").repartition(3)
    r = category_stats(df, ["k"], "v").collect()[0]
    # counts a:2 b:1 c:1 (NULL excluded): N=4
    assert r["n"] == 4 and r["n_distinct"] == 3
    assert abs(r["entropy_bits"] - 1.5) < 1e-12
    assert abs(r["gini_impurity"] - (1 - (4 + 1 + 1) / 16)) < 1e-12
    assert abs(r["top_share"] - 0.5) < 1e-12
    # uniform group hits log2(k); single-valued group hits 0
    uni = spark.createDataFrame(
        [("u", str(i % 8)) for i in range(64)], "k string, v string"
    )
    r = category_stats(uni, [], "v").collect()[0]
    assert abs(r["entropy_bits"] - 3.0) < 1e-12
    assert abs(r["gini_impurity"] - (1 - 8 / 64)) < 1e-12
    solo = spark.createDataFrame([("s", "x")] * 9, "k string, v string")
    r = category_stats(solo, ["k"], "v").collect()[0]
    assert r["entropy_bits"] == 0.0 and r["top_share"] == 1.0
    assert math.isclose(r["gini_impurity"], 0.0, abs_tol=1e-12)


def test_category_stats_matches_python(spark):
    import math
    import random
    from collections import Counter

    from hyper_spark.operators.profile import category_stats

    rng = random.Random(11)
    rows = [
        (f"g{i % 4}", rng.choice("abcdefgh"[: 2 + i % 4]))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, v string").repartition(7)
    got = {r["k"]: r for r in category_stats(df, ["k"], "v").collect()}
    by_k: dict[str, Counter] = {}
    for k, v in rows:
        by_k.setdefault(k, Counter())[v] += 1
    assert set(got) == set(by_k)
    for k, cnt in by_k.items():
        n = sum(cnt.values())
        ent = -sum(c / n * math.log2(c / n) for c in cnt.values())
        gini = 1 - sum((c / n) ** 2 for c in cnt.values())
        r = got[k]
        assert r["n"] == n and r["n_distinct"] == len(cnt)
        assert abs(r["entropy_bits"] - ent) < 1e-9
        assert abs(r["gini_impurity"] - gini) < 1e-9
        assert abs(r["top_share"] - max(cnt.values()) / n) < 1e-12


def test_cooccurrence_matches_python(spark):
    import math
    import random
    from collections import Counter
    from itertools import combinations

    from hyper_spark.operators.profile import cooccurrence

    rng = random.Random(23)
    rows = []
    by_key: dict[str, set] = {}
    for k in range(60):
        vals = set(rng.sample("abcdefg", rng.randint(1, 5)))
        by_key[f"k{k}"] = vals
        rows += [(f"k{k}", v) for v in vals for _ in range(rng.randint(1, 3))]
    rows.append((None, "a"))
    rows.append(("k0", None))
    df = spark.createDataFrame(rows, "k string, v string").repartition(7)
    got = {
        (r["v1"], r["v2"]): r for r in cooccurrence(df, "k", "v").collect()
    }

    n_keys = len(by_key)
    nv = Counter(v for vals in by_key.values() for v in vals)
    exp_pairs = Counter()
    for vals in by_key.values():
        for a, b in combinations(sorted(vals), 2):
            exp_pairs[(a, b)] += 1
    assert set(got) == set(exp_pairs)
    for (a, b), n_ab in exp_pairs.items():
        r = got[(a, b)]
        assert r["n_pair"] == n_ab and r["n_v1"] == nv[a] and r["n_v2"] == nv[b]
        lift = n_ab * n_keys / (nv[a] * nv[b])
        assert abs(r["lift"] - lift) < 1e-12
        assert abs(r["pmi_bits"] - math.log2(lift)) < 1e-12


def test_cooccurrence_max_per_key_excludes_megakey(spark):
    from itertools import combinations

    from hyper_spark.operators.profile import cooccurrence

    rows = [("mega", f"v{i}") for i in range(20)]          # 190 pairs if kept
    rows += [("a", "v0"), ("a", "v1"), ("b", "v0"), ("b", "v1"), ("b", "v2")]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {
        (r["v1"], r["v2"]): r
        for r in cooccurrence(df, "k", "v", max_per_key=5).collect()
    }
    # only the small keys pair up
    assert set(got) == set(combinations(["v0", "v1"], 2)) | set(
        combinations(["v0", "v1", "v2"], 2)
    )
    r = got[("v0", "v1")]
    assert r["n_pair"] == 2
    # megakey still counts toward totals: n_v0 includes it
    assert r["n_v1"] == 3 and r["n_v2"] == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cooccurrence(df, "k", "v", max_per_key=1)


def test_quantile_tail_probe_names_distinct(spark):
    """0.999 and 0.9999 must land in DIFFERENT columns (the old
    int(q*1000) name collapsed them — exactly the probes REQ exists
    for) while 3-decimal probes keep their historical names."""
    from hyper_spark.operators.quantiles import _q_name, req_by

    assert _q_name(0.5) == "q_0500"
    assert _q_name(0.9) == "q_0900"
    assert _q_name(0.999) == "q_0999"
    assert _q_name(0.9999) == "q_09999"
    assert _q_name(0.99999) == "q_099999"

    df = spark.range(100000).select((F.col("id") + 1).cast("double").alias("v"))
    sk = req_by(df, [], "v", 32)
    row = sketch_quantiles(sk, [0.5, 0.999, 0.9999]).collect()[0]
    assert set(row.asDict()) == {"q_0500", "q_0999", "q_09999"}
    # REQ tail estimates are near-exact: distinct probes, distinct values
    assert row["q_09999"] > row["q_0999"] > row["q_0500"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sketch_quantiles(sk, [0.5, 0.5]).collect()
