"""Spark theta sketches vs the kernel (byte-exact differential) and
vs exact counts (published bounds)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.kernel.theta import ThetaSketch, theta_rse
from hyper_spark.operators.theta_agg import (
    theta_a_not_b_card,
    theta_by,
    theta_collect,
    theta_estimate,
    theta_intersect_card,
    theta_union,
)


def test_theta_spark_matches_kernel(spark):
    """Spark build == kernel build from the same xxhash64 stream,
    byte-exact, regardless of partitioning."""
    df = spark.createDataFrame(
        [Row(v=f"item-{i % 700}") for i in range(5000)]
    ).repartition(8)
    sk = theta_collect(theta_by(df, [], "v", k=256))
    hashes = [
        r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()
    ]
    kern = ThetaSketch.from_signed_hashes(256, np.array(hashes, dtype=np.int64))
    assert sk == kern
    # 700 distinct > k=256: saturated estimate within 3 RSE
    assert abs(sk.estimate() - 700) / 700 <= 3 * theta_rse(256)


def test_theta_exact_below_k_and_null_skip(spark):
    rows = [Row(g="a", v=str(i)) for i in range(150)] + [Row(g="a", v=None)]
    df = spark.createDataFrame(rows).repartition(5)
    est = theta_estimate(theta_by(df, ["g"], "v", k=1024), ["g"]).collect()
    assert est[0]["estimate"] == 150.0  # exact, NULL skipped


def test_theta_grouped_and_union_lossless(spark, sf_correct):
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    per_type = theta_by(events, ["event_type"], "user_id", k=512)
    direct = theta_collect(theta_by(events, [], "user_id", k=512))
    rolled = theta_collect(theta_union(per_type))
    assert rolled == direct  # lossless re-merge, byte-exact
    exact = events.select("user_id").distinct().count()
    assert abs(rolled.estimate() - exact) / exact <= 3 * theta_rse(512)


def test_theta_intersection_exact_when_unsaturated(spark, sf_correct):
    """customers-with-orders: below saturation the direct estimate is
    EXACT — the capability inclusion-exclusion HLL cannot offer."""
    orders = spark.read.parquet(f"{sf_correct}/orders.parquet")
    customer = spark.read.parquet(f"{sf_correct}/customer.parquet")
    k = 1 << 17  # larger than both distinct counts at sf0.01
    a = theta_by(customer, [], "c_custkey", k=k)
    b = theta_by(orders, [], F.col("o_custkey").alias("ck"), k=k)
    got = theta_intersect_card(a, b).collect()[0]["intersect_card"]
    exact = (
        customer.select(F.col("c_custkey").alias("ck"))
        .intersect(orders.select(F.col("o_custkey").alias("ck")))
        .count()
    )
    assert got == float(exact)
    diff = theta_a_not_b_card(a, b).collect()[0]["a_not_b_card"]
    assert diff == float(customer.select("c_custkey").distinct().count() - exact)


def test_theta_small_overlap_of_large_sets(spark):
    """The motivating case: 2% overlap of two 50k sets. Direct theta
    estimate stays within its sample bound."""
    n, overlap = 50_000, 1000
    left = spark.range(0, n).select(F.col("id").cast("string").alias("v"))
    right = spark.range(n - overlap, 2 * n - overlap).select(
        F.col("id").cast("string").alias("v")
    )
    k = 8192
    a, b = theta_by(left, [], "v", k=k), theta_by(right, [], "v", k=k)
    est = theta_intersect_card(a, b).collect()[0]["intersect_card"]
    rse = 1.0 / np.sqrt(k * overlap / n)  # expected intersection sample
    assert abs(est - overlap) / overlap <= 3 * rse


def test_theta_merge_guards(spark):
    df = spark.createDataFrame([Row(v="x"), Row(v="y")])
    a = theta_by(df, [], "v", k=64)
    b = theta_by(df, [], "v", k=128)
    with pytest.raises(Exception, match="different k"):
        theta_union(a.unionByName(b)).collect()
    with pytest.raises(ValueError, match="xxhash64"):
        theta_by(df, [], "v", hash_fn="md5")


def test_theta_jaccard_exact_when_unsaturated(spark):
    """Known-overlap sets below saturation: jaccard is exact."""
    from hyper_spark.operators.theta_agg import theta_jaccard

    left = spark.range(0, 600).select(F.col("id").cast("string").alias("v"))
    right = spark.range(300, 900).select(F.col("id").cast("string").alias("v"))
    a = theta_by(left, [], "v", k=2048)
    b = theta_by(right, [], "v", k=2048)
    got = theta_jaccard(a, b).collect()[0]["jaccard"]
    assert got == pytest.approx(300 / 900, abs=1e-12)
    # disjoint -> 0
    c = theta_by(
        spark.range(5000, 5100).select(F.col("id").cast("string").alias("v")),
        [], "v", k=2048,
    )
    assert theta_jaccard(a, c).collect()[0]["jaccard"] == 0.0


def test_theta_containment_exact_when_unsaturated(spark):
    from hyper_spark.operators.theta_agg import theta_containment

    left = spark.range(0, 400).select(F.col("id").cast("string").alias("v"))
    right = spark.range(300, 1300).select(F.col("id").cast("string").alias("v"))
    a = theta_by(left, [], "v", k=2048)
    b = theta_by(right, [], "v", k=2048)
    # 100 of A's 400 land in B
    got = theta_containment(a, b).collect()[0]["containment"]
    assert got == pytest.approx(100 / 400, abs=1e-12)
    # A ⊆ B -> 1.0; empty A -> 0.0
    sub = theta_by(
        spark.range(300, 400).select(F.col("id").cast("string").alias("v")),
        [], "v", k=2048,
    )
    assert theta_containment(sub, b).collect()[0]["containment"] == 1.0
    empty = theta_by(left.filter("1=0"), [], "v", k=2048)
    # empty sketch frame has zero rows -> no joined pair rows
    assert theta_containment(empty, b).count() == 0


def test_theta_pairwise_exact_when_unsaturated(spark):
    from hyper_spark.operators.theta_agg import theta_pairwise

    # three groups with known overlaps: g0 = 0..399, g1 = 200..699,
    # g2 = 600..649 (disjoint from g0, inside g1's tail)
    rows = (
        [("g0", str(i)) for i in range(0, 400)]
        + [("g1", str(i)) for i in range(200, 700)]
        + [("g2", str(i)) for i in range(600, 650)]
    )
    df = spark.createDataFrame(rows, "g string, v string").repartition(5)
    sk = theta_by(df, ["g"], "v", k=4096)
    got = {(r["key_1"], r["key_2"]): r for r in theta_pairwise(sk, "g").collect()}
    assert set(got) == {("g0", "g1"), ("g0", "g2"), ("g1", "g2")}

    r = got[("g0", "g1")]
    assert r["card_1"] == 400.0 and r["card_2"] == 500.0
    assert r["intersect_card"] == 200.0
    assert r["jaccard"] == pytest.approx(200 / 700, abs=1e-12)
    assert r["containment_1_in_2"] == pytest.approx(0.5, abs=1e-12)
    assert r["containment_2_in_1"] == pytest.approx(0.4, abs=1e-12)

    r = got[("g0", "g2")]
    assert r["intersect_card"] == 0.0 and r["jaccard"] == 0.0

    r = got[("g1", "g2")]
    assert r["intersect_card"] == 50.0
    assert r["containment_2_in_1"] == 1.0  # g2 ⊆ g1


def test_theta_pairwise_hash_fn_mismatch_refuses(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from hyper_spark.operators.theta_agg import theta_pairwise

    df = spark.createDataFrame(
        [("a", "1"), ("b", "2")], "g string, v string"
    )
    sk = theta_by(df, ["g"], "v", k=64)
    mixed = sk.withColumn(
        "hash_fn",
        F.when(F.col("g") == "a", F.lit("xxhash64")).otherwise(F.lit("md5")),
    )
    with pytest.raises(Exception, match="hash_fn"):
        theta_pairwise(mixed, "g").collect()
