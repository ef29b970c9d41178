"""Misra-Gries frequent-items summaries: deterministic bound
contract, merge semantics, weighted mode, plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.frequent import mg_by, mg_merge, mg_summary, mg_topk
from hyper_spark.plans.report import assert_plan


def _exact_counts(df, item_col):
    rows = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).cast("double").alias("f"))
        .collect()
    )
    return {r["item"]: r["f"] for r in rows}


@pytest.fixture(scope="module")
def skewed(spark):
    # planted heavies: items h0..h4 get 1000+200*i rows; 5000 singleton
    # tail items. n = 1000+1200+1400+1600+1800 + 5000 = 12000.
    heavy = spark.range(0, 7000).select(
        F.concat(F.lit("h"), (F.col("id") % 5)).alias("item")
    ).filter(
        # h_i frequency proportional via modulus trick is uneven; use
        # explicit thresholds instead: id%5==i kept while id < bound_i
        (F.col("item") == "h0") & (F.col("id") < 5000)
        | (F.col("item") == "h1") & (F.col("id") < 6000)
        | (F.col("item") == "h2")
        | (F.col("item") == "h3") & (F.col("id") < 6500)
        | (F.col("item") == "h4") & (F.col("id") < 5500)
    )
    tail = spark.range(0, 5000).select(
        F.concat(F.lit("t"), F.col("id")).alias("item")
    )
    return heavy.unionByName(tail)


def test_exact_regime_matches_groupby(spark, sf_correct):
    ev = spark.read.parquet(f"{sf_correct}/events.parquet")
    st = mg_by(ev, [], "event_type", k=64)
    truth = _exact_counts(ev, "event_type")
    got = {
        r["item"]: r["c"]
        for r in st.filter(F.col("item").isNotNull()).collect()
    }
    assert got == truth
    s = mg_summary(st, []).collect()[0]
    assert s["err"] == 0.0 and s["exact"]
    assert s["n"] == sum(truth.values())
    top = mg_topk(st, [], limit=2).collect()
    ordered = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["item"], r["count_lo"], r["count_hi"]) for r in top] == [
        (i, f, f) for i, f in ordered
    ]


def test_saturated_bound_and_completeness(spark, skewed):
    st = mg_by(skewed, [], "item", k=32)
    truth = _exact_counts(skewed, "item")
    n = sum(truth.values())
    s = mg_summary(st, []).collect()[0]
    assert s["n"] == n
    assert 0 < s["err"] <= n / 33.0
    retained = {
        r["item"]: r["c"]
        for r in st.filter(F.col("item").isNotNull()).collect()
    }
    assert len(retained) <= 32
    # c <= f <= c + err for every retained item
    for item, c in retained.items():
        assert c <= truth[item] <= c + s["err"] + 1e-9
    # absent items have f <= err
    for item, f in truth.items():
        if item not in retained:
            assert f <= s["err"] + 1e-9
    # completeness: f > err  =>  retained (all five planted heavies)
    for item, f in truth.items():
        if f > s["err"]:
            assert item in retained
    assert {"h0", "h1", "h2", "h3", "h4"} <= set(retained)


def test_merge_shards_contract_and_exact_bit_parity(spark, skewed):
    a = skewed.filter(F.crc32(F.col("item").cast("binary")) % 2 == 0)
    b = skewed.filter(F.crc32(F.col("item").cast("binary")) % 2 == 1)
    merged = mg_merge(
        [mg_by(a, [], "item", k=32), mg_by(b, [], "item", k=32)], []
    )
    truth = _exact_counts(skewed, "item")
    s = mg_summary(merged, []).collect()[0]
    assert s["n"] == sum(truth.values())
    retained = {
        r["item"]: r["c"]
        for r in merged.filter(F.col("item").isNotNull()).collect()
    }
    for item, c in retained.items():
        assert c <= truth[item] <= c + s["err"] + 1e-9
    for item, f in truth.items():
        if f > s["err"]:
            assert item in retained

    # exact regime: shard merge bit-identical to the direct build
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    m = mg_merge(
        [mg_by(h1, [], "event_type", k=64), mg_by(h2, [], "event_type", k=64)],
        [],
    )
    direct = mg_by(ev, [], "event_type", k=64)
    assert sorted(map(tuple, m.collect()), key=repr) == sorted(
        map(tuple, direct.collect()), key=repr
    )


def test_rollup_merge_key_subset(spark, sf_correct):
    ev = spark.read.parquet(f"{sf_correct}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    daily = mg_by(ev, ["day"], "event_type", k=64)
    folded = mg_merge([daily], [])
    direct = mg_by(ev, [], "event_type", k=64)
    assert sorted(
        map(tuple, folded.select("item", "c", "k").collect()), key=repr
    ) == sorted(
        map(tuple, direct.select("item", "c", "k").collect()), key=repr
    )


def test_weighted_mode(spark, sf_correct):
    ev = spark.read.parquet(f"{sf_correct}/events.parquet")
    st = mg_by(ev, [], "event_type", k=64, weight_col="value")
    truth = {
        r["item"]: r["f"]
        for r in ev.filter(F.col("event_type").isNotNull())
        .groupBy(F.col("event_type").alias("item"))
        .agg(F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("f"))
        .collect()
    }
    got = {
        r["item"]: r["c"]
        for r in st.filter(F.col("item").isNotNull()).collect()
    }
    assert set(got) == set(truth)
    for item, c in got.items():
        assert c == pytest.approx(truth[item], rel=1e-9)
    s = mg_summary(st, []).collect()[0]
    assert s["err"] == 0.0
    assert s["n"] == pytest.approx(sum(truth.values()), rel=1e-9)


def test_grouped_and_null_items(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), ("b", "y"), (None, "z")],
        "g string, item string",
    )
    st = mg_by(df, ["g"], "item", k=4)
    rows = {
        (r["g"], r["item"]): r["c"] for r in st.collect()
    }
    # NULL items skipped; NULL group keys kept (Spark groupBy semantics)
    assert rows[("a", "x")] == 2.0 and rows[("a", None)] == 2.0
    assert rows[("b", "y")] == 1.0 and rows[(None, "z")] == 1.0
    assert (None, None) in rows  # NULL group's sentinel


def test_guards(spark, sf_correct):
    ev = spark.read.parquet(f"{sf_correct}/events.parquet")
    with pytest.raises(ValueError, match="k must be"):
        mg_by(ev, [], "event_type", k=0)
    with pytest.raises(ValueError, match="no states"):
        mg_merge([], [])
    a = mg_by(ev, [], "event_type", k=8)
    b = mg_by(ev, [], "event_type", k=16)
    with pytest.raises(ValueError, match="mixed-k"):
        mg_merge([a, b], []).collect()


def test_plan_hygiene(spark, sf_correct):
    ev = spark.read.parquet(f"{sf_correct}/events.parquet")
    st = mg_by(ev, ["event_type"], "user_id", k=16)
    # the ONE Python stage is the partition-local partial aggregate
    rep = assert_plan(st)
    assert rep["python_stages"] == ["MapInPandas"]
    # merge + reads over stored states are pure JVM
    stored = st.localCheckpoint()
    assert_plan(mg_merge([stored], []), no_python=True)
    assert_plan(mg_summary(stored, ["event_type"]), no_python=True)
    assert_plan(
        mg_topk(stored, ["event_type"], limit=5, min_count=3.0),
        no_python=True,
    )
