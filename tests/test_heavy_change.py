"""Heavy-change detection (countsketch.py::cs_diff / heavy_changers):
sketch linearity (diff == turnstile build, bit-exact), change-estimate
accuracy with planted changers, candidate-completeness argument,
grouped zero-sketch semantics, guards."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.countsketch import (
    cs_by,
    cs_diff,
    cs_estimate,
    cs_f2,
    heavy_changers,
)


def period_rows(seed: int, n: int, vocab: int, boost: dict | None = None):
    """Zipf-ish rows; ``boost`` multiplies specific items' counts by
    replicating their rows — the planted changers."""
    import random

    rng = random.Random(seed)
    rows = [
        Row(item=f"item{min(vocab - 1, int(rng.random() ** 3 * vocab))}")
        for i in range(n)
    ]
    if boost:
        extra = []
        for r in rows:
            times = boost.get(r.item, 0)
            extra.extend([r] * times)
        rows.extend(extra)
    return rows


def _blob(df):
    rows = df.select("depth", "width", "n", "counters").collect()
    assert len(rows) == 1
    r = rows[0]
    return (
        r["depth"],
        r["width"],
        r["n"],
        np.frombuffer(bytes(r["counters"]), dtype="<i8"),
    )


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_diff_equals_turnstile_build_bit_exact(spark, hash_fn):
    """Linearity: cs_diff(sketch(A), sketch(B)) counters are
    bit-identical to one cs_by over 'A then B with weight -1' — the
    property that makes stored-state change analysis exact."""
    a_rows = period_rows(1, 1500, 50)
    b_rows = period_rows(2, 1200, 50)
    a = spark.createDataFrame(a_rows)
    b = spark.createDataFrame(b_rows)
    sk_a = cs_by(a, [], "item", depth=5, width=128, hash_fn=hash_fn)
    sk_b = cs_by(b, [], "item", depth=5, width=128, hash_fn=hash_fn)
    diff = cs_diff(sk_a, sk_b)

    signed = a.withColumn("w", F.lit(1)).unionByName(
        b.withColumn("w", F.lit(-1))
    )
    direct = cs_by(
        signed, [], "item", depth=5, width=128, hash_fn=hash_fn, weight="w"
    )
    d1, w1, n1, c1 = _blob(diff)
    d2, w2, n2, c2 = _blob(direct)
    assert (d1, w1) == (d2, w2) == (5, 128)
    assert n1 == n2 == len(a_rows) - len(b_rows)
    assert (c1 == c2).all()


def test_self_diff_is_zero_sketch(spark):
    df = spark.createDataFrame(period_rows(3, 800, 40))
    sk = cs_by(df, [], "item", depth=5, width=64)
    _, _, n, c = _blob(cs_diff(sk, sk))
    assert n == 0 and (c == 0).all()
    cands = spark.createDataFrame([Row(item=f"item{i}") for i in range(10)])
    ests = cs_estimate(cs_diff(sk, sk), cands, "item").collect()
    assert all(r["est_count"] == 0 for r in ests)


def test_heavy_changers_find_planted_changes(spark):
    """Two periods sharing a base distribution; three items boosted in
    period B only. heavy_changers top-k must surface the planted
    changers with the right sign, and every |change| >= T key must be
    recoverable from candidates with per-period count >= T (the
    max(f_A, f_B) >= |change| completeness argument)."""
    base_a = period_rows(7, 4000, 30)
    boost = {"item7": 3, "item19": 5, "item29": 8}
    base_b = period_rows(7, 4000, 30, boost=boost)  # same seed: base equal
    a = spark.createDataFrame(base_a)
    b = spark.createDataFrame(base_b)
    truth_a = Counter(r.item for r in base_a)
    truth_b = Counter(r.item for r in base_b)
    true_change = {
        v: truth_a.get(v, 0) - truth_b.get(v, 0)
        for v in set(truth_a) | set(truth_b)
    }

    sk_a = cs_by(a, [], "item", depth=5, width=1024)
    sk_b = cs_by(b, [], "item", depth=5, width=1024)
    cands = spark.createDataFrame([Row(item=v) for v in true_change])

    expected = sorted(true_change, key=lambda v: (-abs(true_change[v]), v))[:3]
    assert set(expected) == set(boost)  # the planted items dominate
    top = heavy_changers(sk_a, sk_b, cands, "item", k=3).collect()
    assert [r["item"] for r in top] == expected
    # planted boosts REMOVE from A's perspective: change must be negative
    assert all(r["change_est"] < 0 for r in top)

    # threshold mode + completeness: candidates restricted to keys with
    # count >= T in EITHER period still contain every true >=T changer
    T = 100
    elig = {v for v in true_change if max(truth_a.get(v, 0), truth_b.get(v, 0)) >= T}
    true_heavy = {v for v, c in true_change.items() if abs(c) >= T}
    assert true_heavy <= elig  # the max >= |change| argument, concretely
    got = heavy_changers(
        sk_a,
        sk_b,
        spark.createDataFrame([Row(item=v) for v in elig]),
        "item",
        threshold=T,
    ).collect()
    f2 = sum(c * c for c in Counter(true_change.values()).elements())
    # estimates are within the count-sketch bound of truth
    bound = 3.0 * (sum(v * v for v in true_change.values()) / 1024) ** 0.5
    for r in got:
        assert abs(r["change_est"] - true_change[r["item"]]) <= bound
    assert {r["item"] for r in got} >= {
        v for v, c in true_change.items() if abs(c) >= T + bound
    }


def test_change_norm_via_f2(spark):
    """cs_f2 over the diff sketch estimates the squared L2 change norm
    sum_v (f_A - f_B)^2 within the AMS relative-error regime."""
    a_rows = period_rows(5, 3000, 25)
    b_rows = period_rows(6, 3000, 25)
    a = spark.createDataFrame(a_rows)
    b = spark.createDataFrame(b_rows)
    ca = Counter(r.item for r in a_rows)
    cb = Counter(r.item for r in b_rows)
    exact = sum(
        (ca.get(v, 0) - cb.get(v, 0)) ** 2 for v in set(ca) | set(cb)
    )
    sk_a = cs_by(a, [], "item", depth=5, width=2048)
    sk_b = cs_by(b, [], "item", depth=5, width=2048)
    est = cs_f2(cs_diff(sk_a, sk_b)).collect()[0]["f2_est"]
    assert est == pytest.approx(exact, rel=0.25)


def test_grouped_diff_missing_side_is_zero_sketch(spark):
    a = spark.createDataFrame(
        [Row(g="x", item=f"i{j % 5}") for j in range(50)]
        + [Row(g="y", item=f"i{j % 3}") for j in range(30)]
    )
    b = spark.createDataFrame([Row(g="x", item=f"i{j % 5}") for j in range(50)])
    sk_a = cs_by(a, ["g"], "item", depth=3, width=32)
    sk_b = cs_by(b, ["g"], "item", depth=3, width=32)
    out = {r["g"]: r for r in cs_diff(sk_a, sk_b, on=["g"]).collect()}
    assert set(out) == {"x", "y"}
    # x: identical on both sides -> zero sketch
    assert (
        np.frombuffer(bytes(out["x"]["counters"]), dtype="<i8") == 0
    ).all() and out["x"]["n"] == 0
    # y: only in A -> diff equals A's sketch
    ya = {r["g"]: r for r in sk_a.collect()}["y"]
    assert bytes(out["y"]["counters"]) == bytes(ya["counters"])
    assert out["y"]["n"] == 30


def test_guards(spark):
    df = spark.createDataFrame(period_rows(9, 100, 10))
    s1 = cs_by(df, [], "item", depth=5, width=64)
    s2 = cs_by(df, [], "item", depth=5, width=128)
    with pytest.raises(Exception, match="dimensions must match"):
        cs_diff(s1, s2).collect()
    s3 = cs_by(df, [], "item", depth=5, width=64, hash_fn="md5")
    with pytest.raises(Exception, match="hash_fn"):
        cs_diff(s1, s3).collect()


def test_heavy_changers_jvm_path(spark):
    """The estimate read stays whole-stage codegen for small sketches
    (no BatchEvalPython in the executed plan past the sketch build)."""
    a = spark.createDataFrame(period_rows(4, 500, 20))
    b = spark.createDataFrame(period_rows(8, 500, 20))
    sk_a = cs_by(a, [], "item", depth=5, width=64)
    sk_b = cs_by(b, [], "item", depth=5, width=64)
    cands = spark.createDataFrame([Row(item=f"item{i}") for i in range(20)])
    out = heavy_changers(sk_a, sk_b, cands, "item", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert out.count() == 5


def test_sql_change_pipeline_matches_operators(spark):
    """The SQL surface's cs_bucket/cs_sign reproduce the md5 operator
    columns exactly, and the WHOLE heavy-change pipeline — two periods'
    cell builds, FULL-JOIN diff, median probe — runs as one SQL
    statement value-identical to cs_by + cs_diff + heavy_changers."""
    from pyspark.sql import functions as F

    from hyper_spark.operators.cms_agg import cms_bucket_col
    from hyper_spark.operators.countsketch import cs_sign_col
    from hyper_spark.sql import register_sql_construction

    names = register_sql_construction(spark)
    assert {"cs_bucket", "cs_sign"} <= set(names)

    vals = spark.createDataFrame([Row(v=f"item{i}") for i in range(150)])
    vals.createOrReplaceTempView("__csql_vals")
    for i in (0, 3, 4):
        got = spark.sql(
            f"SELECT v, cs_bucket(v, {i}, 64) AS b, cs_sign(v, {i}) AS s "
            "FROM __csql_vals"
        ).collect()
        want = vals.select(
            "v",
            cms_bucket_col(F.col("v"), i, 64, "md5").alias("b"),
            cs_sign_col(F.col("v"), i, "md5").alias("s"),
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    a = spark.createDataFrame(period_rows(21, 1200, 35))
    b = spark.createDataFrame(period_rows(22, 1000, 35))
    a.createOrReplaceTempView("__csql_a")
    b.createOrReplaceTempView("__csql_b")
    cands = spark.createDataFrame([Row(item=f"item{i}") for i in range(35)])
    cands.createOrReplaceTempView("__csql_cands")
    cells = (
        "SELECT i, cs_bucket(item, i, 64) AS bucket, "
        "SUM(cs_sign(item, i)) AS csum "
        "FROM {src} CROSS JOIN (SELECT explode(sequence(0, 4)) AS i) "
        "WHERE item IS NOT NULL GROUP BY i, cs_bucket(item, i, 64)"
    )
    sql_out = spark.sql(
        f"""
        WITH ca AS ({cells.format(src='__csql_a')}),
        cb AS ({cells.format(src='__csql_b')}),
        diff AS (
          SELECT coalesce(ca.i, cb.i) AS i,
                 coalesce(ca.bucket, cb.bucket) AS bucket,
                 coalesce(ca.csum, 0) - coalesce(cb.csum, 0) AS dsum
          FROM ca FULL JOIN cb ON ca.i = cb.i AND ca.bucket = cb.bucket
        ),
        probe AS (
          SELECT c.item, i.i, cs_bucket(c.item, i.i, 64) AS bucket,
                 cs_sign(c.item, i.i) AS sign
          FROM __csql_cands c
          CROSS JOIN (SELECT explode(sequence(0, 4)) AS i) i
        )
        SELECT probe.item,
               CAST(median(probe.sign * coalesce(diff.dsum, 0)) AS BIGINT)
                 AS change_est
        FROM probe LEFT JOIN diff
          ON probe.i = diff.i AND probe.bucket = diff.bucket
        GROUP BY probe.item
        """
    ).collect()
    sk_a = cs_by(a, [], "item", depth=5, width=64, hash_fn="md5")
    sk_b = cs_by(b, [], "item", depth=5, width=64, hash_fn="md5")
    ops = heavy_changers(sk_a, sk_b, cands, "item", hash_fn="md5").collect()
    assert {r["item"]: r["change_est"] for r in sql_out} == {
        r["item"]: r["change_est"] for r in ops
    }
