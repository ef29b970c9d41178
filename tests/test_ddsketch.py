"""DDSketch: relative-error guarantee, merge algebra, collapse bound.

Differential strategy: every estimate is checked against the exact
quantile of the same data (rank r = floor(q*(n-1)), 0-indexed sorted
pick) under the paper's guarantee |est - x_q| <= alpha * |x_q|; merge
and collapse are checked as exact bucket-table algebra.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.ddsketch import (
    dd_by,
    dd_collapse,
    dd_merge,
    dd_quantiles,
    dd_quantiles_by,
)

ALPHA = 0.01
QS = [0.01, 0.1, 0.5, 0.9, 0.99]


def exact_quantile(values, q):
    xs = np.sort(np.asarray(values, dtype=np.float64))
    return float(xs[int(math.floor(q * (len(xs) - 1)))])


def lognormal_rows(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    vals = np.exp(rng.normal(3.0, 1.5, n))  # heavy-tailed latencies
    return [Row(g=int(i % 3), v=float(v)) for i, v in enumerate(vals)]


def assert_within_alpha(est, exact, alpha=ALPHA):
    assert abs(est - exact) <= alpha * abs(exact) + 1e-12, (est, exact)


def test_relative_error_guarantee_global(spark):
    rows = lognormal_rows()
    df = spark.createDataFrame(rows)
    got = {r["q"]: r["est"] for r in dd_quantiles_by(df, [], "v", QS, ALPHA).collect()}
    vals = [r.v for r in rows]
    for q in QS:
        assert_within_alpha(got[q], exact_quantile(vals, q))


def test_relative_error_guarantee_grouped(spark):
    rows = lognormal_rows()
    df = spark.createDataFrame(rows)
    got = {
        (r["g"], r["q"]): r["est"]
        for r in dd_quantiles_by(df, ["g"], "v", QS, ALPHA).collect()
    }
    for g in (0, 1, 2):
        vals = [r.v for r in rows if r.g == g]
        for q in QS:
            assert_within_alpha(got[(g, q)], exact_quantile(vals, q))


def test_negative_zero_and_mixed_stores(spark):
    vals = [-250.0, -3.7, -0.002, 0.0, 0.0, 0.004, 1.0, 8.5, 8.5, 4000.0]
    df = spark.createDataFrame([Row(v=v) for v in vals])
    got = {r["q"]: r["est"] for r in dd_quantiles_by(df, [], "v", QS, ALPHA).collect()}
    for q in QS:
        assert_within_alpha(got[q], exact_quantile(vals, q))
    # the exact median is 0.0 — only the zero store answers it exactly
    med = dd_quantiles_by(df, [], "v", [0.5], ALPHA).collect()[0]["est"]
    assert med == 0.0


def test_nulls_skipped(spark):
    df = spark.createDataFrame(
        [Row(v=1.0), Row(v=None), Row(v=100.0)], "v double"
    )
    sk = dd_by(df, [], "v", ALPHA)
    assert sk.agg(F.sum("count")).collect()[0][0] == 2


def test_merge_is_lossless_union(spark):
    """Grouped sketches merged to global == sketch built global: the
    bucket tables are bit-identical integer rows (fully mergeable)."""
    df = spark.createDataFrame(lognormal_rows())
    merged = dd_merge(dd_by(df, ["g"], "v", ALPHA), [])
    direct = dd_by(df, [], "v", ALPHA)
    assert merged.subtract(direct).count() == 0
    assert direct.subtract(merged).count() == 0


def test_merge_parallelism_invariance(spark):
    """Build at 2 vs 13 partitions: identical bucket tables — the
    two-cluster-size bit-identity the north rule checks on HLL holds
    here by construction (integer groupBy)."""
    df = spark.createDataFrame(lognormal_rows())
    a = dd_by(df.repartition(2), [], "v", ALPHA)
    b = dd_by(df.repartition(13), [], "v", ALPHA)
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_collapse_bounds_buckets_and_preserves_high_quantiles(spark):
    rows = lognormal_rows()
    df = spark.createDataFrame(rows)
    sk = dd_by(df, ["g"], "v", ALPHA)
    # the data spans ~530 buckets at alpha=0.01; m=256 folds roughly
    # half of them while the kept range still covers q >= ~0.5
    m = 256
    collapsed = dd_collapse(sk, ["g"], m)
    per_group = (
        collapsed.groupBy("g", "store").agg(F.count(F.lit(1)).alias("nb")).collect()
    )
    assert all(r["nb"] <= m for r in per_group)
    # total mass is preserved
    assert (
        collapsed.agg(F.sum("count")).collect()[0][0]
        == sk.agg(F.sum("count")).collect()[0][0]
    )
    # quantiles above the collapsed mass keep the full guarantee
    got = {
        (r["g"], r["q"]): r["est"]
        for r in dd_quantiles(collapsed, [0.9, 0.99], ["g"], ALPHA).collect()
    }
    for g in (0, 1, 2):
        vals = [r.v for r in rows if r.g == g]
        for q in (0.9, 0.99):
            assert_within_alpha(got[(g, q)], exact_quantile(vals, q))


def test_quantile_edges(spark):
    vals = [float(x) for x in range(1, 101)]
    df = spark.createDataFrame([Row(v=v) for v in vals])
    got = {
        r["q"]: r["est"]
        for r in dd_quantiles_by(df, [], "v", [0.0, 1.0], ALPHA).collect()
    }
    assert_within_alpha(got[0.0], 1.0)
    assert_within_alpha(got[1.0], 100.0)


def test_plan_is_python_free(spark):
    """The whole lifecycle (build -> collapse -> eval) contains no
    Python evaluation nodes — DDSketch is the library's pure-codegen
    sketch family."""
    df = spark.createDataFrame(lognormal_rows())
    plan = dd_quantiles_by(
        df, ["g"], "v", QS, ALPHA, max_buckets=128
    )._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan


def test_alpha_validation(spark):
    df = spark.createDataFrame([Row(v=1.0)])
    with pytest.raises(ValueError):
        dd_by(df, [], "v", alpha=1.5)
    with pytest.raises(ValueError):
        dd_quantiles_by(df, [], "v", [1.5])
    with pytest.raises(ValueError):
        dd_collapse(dd_by(df, [], "v"), [], 0)


def test_sql_construction_matches_dd_by(spark):
    """register_sql_construction's dd_store/dd_bucket build the exact
    bucket table dd_by builds, and dd_bucket_value reads back the same
    answers — the DD family end-to-end in pure SQL."""
    from hyper_spark.sql import register_sql_construction

    names = register_sql_construction(spark)
    assert {"dd_store", "dd_bucket", "dd_bucket_value"} <= set(names)
    df = spark.createDataFrame(lognormal_rows())
    df.createOrReplaceTempView("dd_src")
    sql_table = spark.sql(
        """
        SELECT g, dd_store(v) AS store, dd_bucket(v, 0.01) AS bucket,
               count(*) AS count
        FROM dd_src GROUP BY g, dd_store(v), dd_bucket(v, 0.01)
        """
    )
    direct = dd_by(df, ["g"], "v", 0.01)
    assert sql_table.subtract(direct).count() == 0
    assert direct.subtract(sql_table).count() == 0
    # value read-back parity with the operator's est expression
    import math

    gamma = (1 + 0.01) / (1 - 0.01)
    got = spark.sql(
        "SELECT dd_bucket_value('+', 25L, 0.01) AS v"
    ).collect()[0]["v"]
    assert got == 2.0 * gamma**25 / (gamma + 1.0)
    assert spark.sql(
        "SELECT dd_bucket_value('0', 0L, 0.01) AS v"
    ).collect()[0]["v"] == 0.0
    neg = spark.sql(
        "SELECT dd_bucket_value('-', 3L, 0.01) AS v"
    ).collect()[0]["v"]
    assert neg == -2.0 * gamma**3 / (gamma + 1.0)


def exact_weighted_quantile(values, weights, q):
    """First value (ascending) whose cumulative weight reaches q*W."""
    order = np.argsort(np.asarray(values, dtype=np.float64), kind="stable")
    vs = np.asarray(values, dtype=np.float64)[order]
    ws = np.asarray(weights, dtype=np.float64)[order]
    cum = np.cumsum(ws)
    return float(vs[int(np.searchsorted(cum, q * cum[-1]))])


def test_weighted_quantiles_within_bound(spark):
    """|est - x_q^w| <= alpha * x_q^w against the exact weighted
    quantile — the paper's guarantee holds per unit of MASS, since a
    weight w is indistinguishable from w unit rows in the same bucket."""
    rng = np.random.default_rng(11)
    vals = np.exp(rng.normal(3.0, 1.5, 3000))
    ws = rng.integers(1, 500, 3000).astype(float)
    df = spark.createDataFrame(
        [Row(v=float(v), w=float(w)) for v, w in zip(vals, ws)]
    )
    got = {
        r["q"]: r["est"]
        for r in dd_quantiles_by(df, [], "v", QS, ALPHA, weight="w").collect()
    }
    for q in QS:
        truth = exact_weighted_quantile(vals, ws, q)
        assert abs(got[q] - truth) <= ALPHA * abs(truth) + 1e-12, (q, got[q], truth)


def test_weighted_mass_dominates_median(spark):
    """One heavy row outweighs a thousand light ones: the weighted
    median sits at the heavy value while the unweighted sits at 1."""
    rows = [Row(v=1.0, w=1.0)] * 1000 + [Row(v=1000.0, w=5000.0)]
    df = spark.createDataFrame(rows)
    wq = dd_quantiles_by(df, [], "v", [0.5], ALPHA, weight="w").collect()[0]["est"]
    uq = dd_quantiles_by(df, [], "v", [0.5], ALPHA).collect()[0]["est"]
    assert abs(wq - 1000.0) <= ALPHA * 1000.0
    assert abs(uq - 1.0) <= ALPHA * 1.0


def test_weighted_equals_row_expansion(spark):
    """Integer weights ARE duplicate rows: the weighted bucket table
    matches dd_by on the physically-expanded frame exactly (masses as
    doubles), so merge/collapse algebra carries over unchanged."""
    rows = [Row(v=2.5, w=3), Row(v=40.0, w=1), Row(v=2.5, w=2), Row(v=-7.0, w=4)]
    df = spark.createDataFrame(rows)
    expanded = spark.createDataFrame(
        [Row(v=r.v) for r in rows for _ in range(r.w)]
    )
    got = {
        (r["store"], r["bucket"]): r["count"]
        for r in dd_by(df, [], "v", ALPHA, weight="w").collect()
    }
    want = {
        (r["store"], r["bucket"]): float(r["count"])
        for r in dd_by(expanded, [], "v", ALPHA).collect()
    }
    assert got == want


def test_weighted_skips_null_and_nonpositive_weights(spark):
    rows = [
        Row(v=5.0, w=2.0),
        Row(v=9.0, w=0.0),      # zero mass: no contribution
        Row(v=9.0, w=-3.0),     # negative mass: refused (filtered)
        Row(v=9.0, w=None),     # unknown mass: skipped
        Row(v=None, w=4.0),     # null value: skipped as always
    ]
    sk = dd_by(spark.createDataFrame(rows), [], "v", ALPHA, weight="w").collect()
    assert len(sk) == 1 and sk[0]["count"] == 2.0


def test_weighted_plan_is_python_free(spark):
    from hyper_spark.plans import assert_plan

    df = spark.range(1000).select(
        (F.col("id") + 1.0).alias("v"), (F.col("id") % 7 + 1.0).alias("w")
    )
    out = dd_quantiles_by(df, [], "v", [0.5, 0.99], ALPHA, weight="w")
    assert_plan(out, no_python=True)


def test_dd_ranks_within_bucket_mass(spark):
    """|est_rank - exact_rank| <= mass(probe's bucket)/n: items below
    the probe's bucket are certainly <= the probe; only the probe's own
    bucket is ambiguous."""
    rows = lognormal_rows()
    df = spark.createDataFrame(rows)
    from hyper_spark.operators.ddsketch import dd_ranks

    sk = dd_by(df, ["g"], "v", ALPHA)
    probes = [5.0, 20.0, 150.0, 3000.0]
    got = {(r["g"], r["value"]): r["rank"] for r in dd_ranks(sk, probes, ["g"], ALPHA).collect()}
    gamma = (1 + ALPHA) / (1 - ALPHA)
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r.v)
    for g, vs in by_g.items():
        xs = np.asarray(vs)
        for p in probes:
            pj = math.ceil(math.log(p) / math.log(gamma))
            bucket_mass = np.mean(
                np.ceil(np.log(xs) / math.log(gamma)).astype(int) == pj
            )
            exact = float(np.mean(xs <= p))
            assert abs(got[(g, p)] - exact) <= bucket_mass + 1e-12


def test_dd_ranks_edges_and_signs(spark):
    from hyper_spark.operators.ddsketch import dd_ranks

    df = spark.createDataFrame(
        [Row(v=-10.0), Row(v=-1.0), Row(v=0.0), Row(v=2.0), Row(v=100.0)]
    )
    sk = dd_by(df, [], "v", ALPHA)
    got = {r["value"]: r["rank"] for r in dd_ranks(sk, [-100.0, 0.0, 1e9], [], ALPHA).collect()}
    assert got[-100.0] == 0.0          # below everything
    assert got[0.0] == 0.6             # -10, -1, 0 are <= 0
    assert got[1e9] == 1.0             # above everything


def test_dd_ranks_weighted_mass_fraction(spark):
    from hyper_spark.operators.ddsketch import dd_ranks

    df = spark.createDataFrame([Row(v=1.0, w=1.0), Row(v=1000.0, w=9.0)])
    sk = dd_by(df, [], "v", ALPHA, weight="w")
    got = {r["value"]: r["rank"] for r in dd_ranks(sk, [5.0], [], ALPHA).collect()}
    assert got[5.0] == 0.1             # 10% of the MASS is <= 5


def test_dd_trimmed_mean_robust_center(spark):
    """5-95% trimmed mean tracks the exact trimmed mean on heavy-tailed
    data (alpha relative + edge-bucket granularity), while ignoring an
    injected outlier that wrecks the plain mean."""
    from hyper_spark.operators.ddsketch import dd_trimmed_mean

    rng = np.random.default_rng(5)
    vals = np.exp(rng.normal(3.0, 1.0, 4000)).tolist() + [1e12]
    df = spark.createDataFrame([Row(v=float(v)) for v in vals])
    est = dd_trimmed_mean(dd_by(df, [], "v", ALPHA), 0.05, 0.95, [], ALPHA).collect()[0][
        "trimmed_mean"
    ]
    xs = np.sort(np.asarray(vals))
    n = len(xs)
    exact = float(xs[int(math.ceil(0.05 * n)) : int(math.floor(0.95 * n))].mean())
    assert abs(est - exact) <= 0.03 * exact  # alpha + edge-bucket slack
    assert est < np.mean(vals) / 1000        # the outlier is gone


def test_dd_trimmed_mean_full_band_is_sketch_mean(spark):
    from hyper_spark.operators.ddsketch import dd_trimmed_mean

    rng = np.random.default_rng(9)
    vals = np.exp(rng.normal(2.0, 0.8, 2000))
    df = spark.createDataFrame([Row(v=float(v)) for v in vals])
    est = dd_trimmed_mean(dd_by(df, [], "v", ALPHA), 0.0, 1.0, [], ALPHA).collect()[0][
        "trimmed_mean"
    ]
    exact = float(np.mean(vals))
    assert abs(est - exact) <= ALPHA * exact  # every rep within alpha

    with pytest.raises(ValueError):
        dd_trimmed_mean(dd_by(df, [], "v", ALPHA), 0.9, 0.1)


def test_dd_readers_plan_python_free(spark):
    from hyper_spark.operators.ddsketch import dd_ranks, dd_trimmed_mean
    from hyper_spark.plans import assert_plan

    df = spark.range(1000).select((F.col("id") + 1.0).alias("v"))
    sk = dd_by(df, [], "v", ALPHA)
    assert_plan(dd_ranks(sk, [10.0, 100.0], [], ALPHA), no_python=True)
    assert_plan(dd_trimmed_mean(sk, 0.1, 0.9, [], ALPHA), no_python=True)


def test_weighted_nan_weight_excluded(spark):
    """NaN > 0 is TRUE in Spark SQL; an unguarded filter would let one
    NaN mass poison the cumulative sums and silently drop the whole
    group from the quantile output."""
    rows = [Row(v=float(1 + i % 20), w=1.0) for i in range(100)]
    rows.append(Row(v=5.0, w=float("nan")))
    df = spark.createDataFrame(rows)
    sk = dd_by(df, [], "v", ALPHA, weight="w")
    total = sum(r["count"] for r in sk.collect())
    assert total == 100.0  # the NaN row contributed nothing
    got = dd_quantiles_by(df, [], "v", [0.5, 1.0], ALPHA, weight="w").collect()
    assert len(got) == 2 and all(r["est"] == r["est"] for r in got)  # no NaN


def test_weighted_q1_returns_max_bucket(spark):
    """q=1.0 on a weighted state must always answer the top bucket even
    though masses are doubles (the covers guard, not float luck)."""
    df = spark.createDataFrame(
        [Row(v=1.0, w=0.1)] * 7 + [Row(v=900.0, w=0.3)] * 3
    )
    got = {r["q"]: r["est"] for r in
           dd_quantiles_by(df, [], "v", [1.0], ALPHA, weight="w").collect()}
    assert abs(got[1.0] - 900.0) <= ALPHA * 900.0


def test_dd_histogram_bounds_and_mass(spark):
    """Every value lands strictly inside its bar's (lo, hi]; fracs sum
    to 1 per group; bars come out in ascending value order."""
    from hyper_spark.operators.ddsketch import dd_histogram

    rows = [Row(g="a", v=float(v)) for v in (-50.0, -2.0, 0.0, 3.0, 3.1, 700.0)]
    df = spark.createDataFrame(rows)
    bars = dd_histogram(dd_by(df, ["g"], "v", ALPHA), ["g"], ALPHA).collect()
    assert abs(sum(b["frac"] for b in bars) - 1.0) < 1e-12
    los = [b["lo"] for b in bars]
    assert los == sorted(los)
    for v in (-50.0, -2.0, 3.0, 3.1, 700.0):
        holding = [b for b in bars if b["lo"] < v <= b["hi"]]
        assert len(holding) == 1, v
    zero = [b for b in bars if b["lo"] == 0.0 and b["hi"] == 0.0]
    assert len(zero) == 1 and zero[0]["count"] == 1
