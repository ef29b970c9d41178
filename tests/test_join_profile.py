"""join_profile: sketch-only equijoin planning (operators/join_profile.py).

Verification strategy: small key domains + wide sketches make every
estimate exact (CMS collision-free whp and deterministic given the
hash; theta below saturation is a complete sample), so the profile is
checked integer-equal against Spark's own join/groupBy on the same
data. Strategy thresholds are exercised by shrinking them, not by
synthesizing 8M rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.join_profile import join_key_profile, join_profile


def _sides(spark):
    # left: keys 0..19, key i appearing i+1 times (known skewed-ish
    # frequency vector); right: keys 10..29 once each + key 10 hot x5
    left = spark.range(20).selectExpr(
        "explode(sequence(0, cast(id as int))) as dummy", "id as k"
    ).select("k")
    right = (
        spark.range(10, 30)
        .select(F.col("id").alias("k"))
        .union(spark.range(4).select(F.lit(10).cast("long").alias("k")))
    )
    return left, right


def test_profile_row_shape_and_counts(spark):
    left, _ = _sides(spark)
    with_nulls = left.union(spark.sql("SELECT CAST(NULL AS BIGINT) AS k"))
    prof = join_key_profile(with_nulls, "k").collect()
    assert len(prof) == 1
    row = prof[0]
    n = left.count()
    assert row["n_rows"] == n + 1
    assert row["n_keys"] == n  # NULL key excluded from sketches
    assert row["n_nulls"] == 1
    assert row["cms"]["n"] == n
    assert row["theta"]["n_entries"] == 20


def test_join_profile_exact_below_saturation(spark):
    left, right = _sides(spark)
    lp = join_key_profile(left, "k", k=1 << 12, width=1 << 14)
    rp = join_key_profile(right, "k", k=1 << 12, width=1 << 14)
    got = join_profile(lp, rp).collect()[0]

    exact_join = left.join(right, "k").count()
    self_l = (
        left.groupBy("k").count().agg(F.sum(F.col("count") * F.col("count")))
    ).collect()[0][0]
    self_r = (
        right.groupBy("k").count().agg(F.sum(F.col("count") * F.col("count")))
    ).collect()[0][0]

    assert got["n_l"] == left.count() and got["n_r"] == right.count()
    assert got["distinct_l"] == 20.0 and got["distinct_r"] == 20.0
    # wide sketch, tiny domain: the inner products are exact and the
    # overcount guarantee still must hold structurally
    assert got["est_join_rows"] == exact_join
    assert got["selfjoin_l"] == self_l and got["selfjoin_r"] == self_r
    assert got["err_bound"] > 0
    # key sets: left {0..19}, right {10..29} -> |∩|=10, |∪|=30
    assert got["containment_l_in_r"] == 10 / 20
    assert got["containment_r_in_l"] == 10 / 20
    assert got["key_jaccard"] == 10 / 30
    # tiny sides -> broadcast the smaller one
    assert got["recommendation"] == (
        "broadcast_left" if got["n_l"] <= got["n_r"] else "broadcast_right"
    )


def test_skew_ratio_drives_salting_recommendation(spark):
    # uniform key -> skew ratio 1.0 -> plain shuffle once broadcast is
    # ruled out; a 500x hot key -> ratio >> 8 -> salted shuffle
    uniform = spark.range(1000).select((F.col("id") % 100).alias("k"))
    hot = uniform.union(
        spark.range(500).select(F.lit(0).cast("long").alias("k"))
    )
    up = join_key_profile(uniform, "k", width=1 << 14)
    hp = join_key_profile(hot, "k", width=1 << 14)

    plain = join_profile(up, up, broadcast_rows=0).collect()[0]
    assert plain["skew_l"] == pytest.approx(1.0)
    assert plain["recommendation"] == "shuffle"

    salted = join_profile(hp, up, broadcast_rows=0).collect()[0]
    assert salted["skew_l"] > 8.0
    assert salted["recommendation"] == "shuffle_salted"


def test_empty_side_is_all_zeros(spark):
    left, _ = _sides(spark)
    empty = spark.sql("SELECT CAST(NULL AS BIGINT) AS k").filter("k IS NOT NULL")
    lp = join_key_profile(left, "k")
    ep = join_key_profile(empty, "k")
    got = join_profile(lp, ep).collect()[0]
    assert got["n_r"] == 0
    assert got["est_join_rows"] == 0
    assert got["distinct_r"] == 0.0
    assert got["containment_l_in_r"] == 0.0
    assert got["key_jaccard"] == 0.0
    assert got["recommendation"] == "broadcast_right"

    both = join_profile(ep, ep).collect()[0]
    assert both["est_join_rows"] == 0
    assert both["recommendation"] == "broadcast_left"


def test_dimension_and_hash_guards(spark):
    left, right = _sides(spark)
    lp = join_key_profile(left, "k", width=1 << 14)
    with pytest.raises(ValueError, match="dimensions must match"):
        join_profile(lp, join_key_profile(right, "k", width=1 << 13)).collect()
    with pytest.raises(ValueError, match="theta k must match"):
        join_profile(
            lp, join_key_profile(right, "k", width=1 << 14, k=1 << 10)
        ).collect()


def test_profile_persists_to_parquet(spark, tmp_path):
    left, right = _sides(spark)
    path = str(tmp_path / "prof_l")
    join_key_profile(left, "k", width=1 << 14).write.parquet(path)
    reloaded = spark.read.parquet(path)
    rp = join_key_profile(right, "k", width=1 << 14)
    a = join_profile(reloaded, rp).collect()[0]
    b = join_profile(join_key_profile(left, "k", width=1 << 14), rp).collect()[0]
    assert a == b
