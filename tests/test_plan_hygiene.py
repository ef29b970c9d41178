"""Physical-plan hygiene: the properties that decide 100 TB behavior.

These assert on `.explain` output so regressions in pruning/pushdown/
codegen are caught by CI, not by a slow cluster bill.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hyper_spark.operators.hll_agg import register_table, sketch_by


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sketch_by_prunes_scan_columns(spark, sf_correct):
    """A sketch over one column must not read the whole table: ReadSchema
    carries only the key + value columns."""
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    plan = _executed_plan(sketch_by(events, ["event_type"], "user_id", 12))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    line = read_schema[0]
    assert "user_id" in line and "event_type" in line
    assert "props" not in line and "value" not in line  # pruned


def test_filter_pushdown_reaches_scan(spark, sf_correct):
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    df = register_table(events.filter(F.col("user_id") > 100), [], "user_id", 12)
    plan = _executed_plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "GreaterThan(user_id,100" in pushed[0], plan


def test_register_table_partial_aggregation(spark, sf_correct):
    """The idx/rho aggregation must have a map-side partial phase (two
    HashAggregates around the exchange) — this is what bounds the shuffle
    at groups × 2^p rows regardless of input size."""
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    plan = _executed_plan(register_table(events, [], "user_id", 12))
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_max" in plan, plan


def test_no_python_before_aggregation_boundary(spark, sf_correct):
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    plan = _executed_plan(register_table(events, ["event_type"], "user_id", 14))
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan


def test_cms_cells_jvm_partial_aggregation(spark, sf_correct):
    """CMS bucket exprs + posexplode + groupBy must stay JVM with a
    map-side partial (shuffle capped at d·w rows per partition), no
    Python before the densify boundary."""
    from hyper_spark.operators.cms_agg import md5_bucket_col

    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    col = F.col("event_type")
    buckets = F.posexplode(
        F.array(*[md5_bucket_col(col, i, 2048) for i in range(5)])
    )
    cells = (
        events.filter(col.isNotNull())
        .select(buckets.alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = _executed_plan(cells)
    assert "EvalPython" not in plan
    assert plan.count("HashAggregate") >= 2 and "partial_count" in plan, plan


def test_bloom_positions_jvm_distinct(spark, sf_correct):
    """Bloom set-bit distinct dedups map-side: partial aggregate before
    the exchange bounds the shuffle at <= m set bits per group."""
    from hyper_spark.operators.cms_agg import md5_bucket_col

    customer = spark.read.parquet(f"{sf_correct}/customer.parquet")
    col = F.col("c_custkey")
    positions = F.posexplode(
        F.array(*[md5_bucket_col(col, i, 1 << 16) for i in range(5)])
    )
    bits = (
        customer.filter(col.isNotNull())
        .select(positions.alias("__row", "pos"))
        .select("pos")
        .distinct()
    )
    plan = _executed_plan(bits)
    assert "EvalPython" not in plan
    assert plan.count("HashAggregate") >= 2, plan


def test_cms_estimate_lookup_is_jvm(spark, sf_correct):
    """For default-size sketches the candidate-count lookup must be pure
    JVM (array-literal element_at/array_min), no Arrow stage over the
    candidates (VERDICT r02 wrong #2)."""
    from hyper_spark.operators.cms_agg import cms_by, cms_estimate

    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    sketch = cms_by(events, [], "event_type", depth=5, width=8192)
    distinct_vals = events.select("event_type").dropna().distinct()
    est = cms_estimate(sketch, distinct_vals, "event_type")
    plan = _executed_plan(est)
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan
    # fallback path still exists for oversized sketches
    est_big = cms_estimate(
        sketch, distinct_vals, "event_type", max_jvm_cells=0
    )
    assert "EvalPython" in _executed_plan(est_big)


def test_heavy_hitters_guarantee_no_python_over_raw_scan(spark, sf_correct):
    """guarantee=True must not ship raw rows through Python: the only
    Arrow stage allowed is the post-aggregate densify
    (FlatMapGroupsInPandas over d·w cells), never an EvalPython projection
    over the scan (VERDICT r02 wrong #2)."""
    from hyper_spark.operators.cms_agg import heavy_hitters

    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    plan = _executed_plan(heavy_hitters(events, "event_type", k=3, guarantee=True))
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan


def test_heavy_hitters_rescan_is_broadcast(spark, sf_correct):
    """The exact-verification rescan must broadcast the tiny candidate
    set (no shuffle of the big table for the semi-join)."""
    from hyper_spark.operators.cms_agg import heavy_hitters

    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    plan = _executed_plan(heavy_hitters(events, "event_type", k=3, exact=True))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_substring_dup_jvm_with_partial_agg(spark, sf_correct):
    """Windowed substring dedup must stay JVM end-to-end (window
    hashing is xxhash64 inside a transform, never Python) and the
    dup-window count must partial-aggregate map-side so the shuffle is
    |distinct windows| counts, not |windows| rows. The scan reads only
    the id + text columns."""
    from hyper_spark.operators.dedup import substring_dup_spans

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    plan = _executed_plan(substring_dup_spans(docs, window=8))
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "partial_count" in plan, plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "lang" not in read_schema[0], plan


def test_new_op_plan_shapes(spark):
    """Scale-critical plan guards for the session-6 operators."""
    from hyper_spark.operators.bm25 import bm25_build
    from hyper_spark.operators.profile import category_stats, cooccurrence
    from hyper_spark.operators.temporal import rolling_features, transitions
    from hyper_spark.plans.report import assert_plan

    rows = [("c%d" % (i % 7), i, "s%d" % (i % 3), float(i % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, i int, s string, v double")

    # transitions: one window shuffle + one pair aggregate + the tiny
    # denominator window — 3 exchanges max, no Python anywhere
    assert_plan(
        transitions(df, "k", "i", "s", include_bounds=True),
        max_exchanges=3, no_python=True,
    )
    # category_stats: two stacked aggregates = 2 exchanges, JVM only
    assert_plan(category_stats(df, ["k"], "s"), max_exchanges=2, no_python=True)
    # cooccurrence: collect_set + pair agg + val-count agg + joins — the
    # wide data crosses the network ONCE (the collect_set exchange);
    # everything after operates on |vocab|-bounded tables
    assert_plan(cooccurrence(df, "k", "s"), no_python=True)
    # rolling_features: all frames share ONE exchange + sort, JVM only
    assert_plan(
        rolling_features(df, "k", "i", "v", [10, 100]),
        max_exchanges=1, no_python=True,
    )
    # bm25 postings build: explode + single aggregate, one exchange
    docs = df.select(F.col("i").alias("doc_id"), F.col("s").alias("text"))
    assert_plan(bm25_build(docs), max_exchanges=1, no_python=True)


def test_round5_op_plan_shapes(spark):
    """Scale-critical plan guards for the round-5 operators."""
    import numpy as np

    from hyper_spark.operators.classifier import (
        hash_text_features,
        logreg_predict,
    )
    from hyper_spark.operators.graph import pagerank
    from hyper_spark.plans.report import assert_plan, plan_report

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma spark"[: 5 + i % 15]) for i in range(100)],
        "doc_id long, text string",
    )
    # feature hashing: explode + md5/conv/pmod + ONE aggregate, pure JVM
    assert_plan(
        hash_text_features(docs, n_features=64),
        max_exchanges=1, no_python=True,
    )
    # classifier scoring: the weight table must come in as a BROADCAST
    # join (never a shuffled SortMergeJoin on the feature stream) and
    # stay Python-free end-to-end
    w = np.zeros(64)
    w[3] = 0.5
    pred = logreg_predict(docs, w)
    assert_plan(pred, no_python=True)
    plan = pred._jdf.queryExecution().executedPlan().toString()
    # the weight table joins the raw feature stream as a BROADCAST
    # (the doc_id score join may sort-merge — both sides are
    # corpus-sized there, which is the correct shape)
    assert "BroadcastHashJoin" in plan

    # pagerank iteration output: checkpointed per round, so the plan a
    # downstream consumer sees is FLAT (scan of the checkpoint), not
    # iters-deep — assert the returned frame's plan has no join chain
    edges = spark.createDataFrame(
        [(i % 7, (i + 1) % 7) for i in range(50)], "src long, dst long"
    )
    ranks = pagerank(edges, iters=3)
    rep = plan_report(ranks)
    assert rep["python_stages"] == []
    assert "Join" not in ranks._jdf.queryExecution().executedPlan().toString()


def test_change_family_plan_shapes(spark):
    """Scale-critical plan guards for the change-detection family."""
    from hyper_spark.operators.anomaly import series_spikes
    from hyper_spark.plans.report import assert_plan
    from hyper_spark.streaming.cs_stream import streaming_cs_cells

    df = spark.createDataFrame(
        [(f"g{i % 3}", i, float(i % 7)) for i in range(300)],
        "k string, i long, v double",
    )
    series = df.groupBy("k", (F.col("i") % 10).alias("b")).agg(
        F.sum("v").alias("val")
    )
    # series_spikes: the trailing window adds at most one exchange on
    # top of the series build and stays pure Catalyst
    assert_plan(
        series_spikes(series, "val", by=["k"], order_col="b", trailing=3),
        max_exchanges=2, no_python=True,
    )
    # streaming_cs_cells (bounded mode): one windowed aggregate — a
    # single exchange, zero Python in the distributed plan
    ts_df = spark.createDataFrame(
        [(f"2024-01-{1 + i % 9:02d} 00:00:00", f"u{i % 11}") for i in range(200)],
        "ts string, u string",
    ).select(F.to_timestamp("ts").alias("ts"), "u")
    cells = streaming_cs_cells(ts_df, "ts", [], "u", depth=3, width=32)
    assert_plan(cells, max_exchanges=1, no_python=True)
