"""Tuple sketches (operators/tuple_agg.py): exact-below-k contract,
saturated HT estimator accuracy, md5-vs-python hash parity, lossless
row-disjoint shard merge, intersection sums, guards, plan hygiene.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hyper_spark.kernel.theta import theta_rse
from hyper_spark.operators.tuple_agg import (
    tuple_estimates,
    tuple_intersect_sum,
    tuple_merge,
    tuple_sketch_by,
)

_TWO60 = float(1 << 60)


def _md5_60(v) -> int:
    """The md5 hash_fn's 60-bit integer, computed independently."""
    return int(hashlib.md5(f"{v}:t".encode()).hexdigest()[:15], 16)


def _rows(n_keys=500, per_key=3, groups=("a", "b")):
    rows = []
    for g in groups:
        for u in range(n_keys):
            for r in range(per_key):
                rows.append((g, f"{g}_u{u}", float(u % 7 + r)))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, uid string, v double")


def test_exact_below_k_matches_sql(spark):
    df = _df(spark, _rows(n_keys=40))
    for hash_fn in ("xxhash64", "md5"):
        state = tuple_sketch_by(
            df, ["grp"], "uid", "v", k=128, hash_fn=hash_fn
        )
        est = {
            r["grp"]: r
            for r in tuple_estimates(state, ["grp"]).collect()
        }
        truth = {
            r["grp"]: r
            for r in df.groupBy("grp")
            .agg(
                F.countDistinct("uid").alias("d"),
                F.sum("v").alias("s"),
            )
            .collect()
        }
        for g, t in truth.items():
            assert est[g]["exact"] is True
            assert est[g]["n_entries"] == t["d"]
            assert est[g]["distinct_est"] == pytest.approx(t["d"])
            assert est[g]["sum_est"] == pytest.approx(t["s"])
            assert est[g]["mean_est"] == pytest.approx(t["s"] / t["d"])


def test_saturated_estimates_within_bound(spark):
    # 5000 distinct keys into k=256: distinct within 3*RSE, and the
    # HT subset-sum within the same relative envelope (summary ~ O(1)
    # per key, so sum error tracks distinct error).
    n, k = 5000, 256
    rows = [("g", f"user_{u:05d}", float(u % 11 + 1)) for u in range(n)]
    df = _df(spark, rows)
    state = tuple_sketch_by(df, ["grp"], "uid", "v", k=k)
    row = tuple_estimates(state, ["grp"]).collect()[0]
    assert row["exact"] is False
    assert row["n_entries"] == k
    rse = theta_rse(k)
    assert abs(row["distinct_est"] - n) <= 3 * rse * n
    true_sum = sum(float(u % 11 + 1) for u in range(n))
    assert abs(row["sum_est"] - true_sum) <= 4 * rse * true_sum


def test_md5_hash_fn_replays_in_python(spark):
    # The oracle contract: the retained hashes and the saturated
    # estimator replay exactly from hashlib + the k-min walk.
    n, k = 300, 64
    rows = [("g", f"u{u}", float(u)) for u in range(n)]
    state = tuple_sketch_by(
        _df(spark, rows), ["grp"], "uid", "v", k=k, hash_fn="md5"
    )
    got = sorted((r["h"], r["summary"]) for r in state.collect())
    ref = sorted(
        (_md5_60(f"u{u}"), float(u)) for u in range(n)
    )[:k]
    assert got == ref
    kth = ref[-1][0]
    theta = kth / _TWO60
    sum_below = sum(s for h, s in ref if h < kth)
    row = tuple_estimates(state, ["grp"]).collect()[0]
    assert row["distinct_est"] == pytest.approx((k - 1) / theta)
    assert row["sum_est"] == pytest.approx(sum_below / theta)


def test_merge_row_disjoint_shards_lossless(spark):
    rows = _rows(n_keys=120, per_key=4)
    df = _df(spark, rows)
    half_a = _df(spark, rows[::2])
    half_b = _df(spark, rows[1::2])
    k = 48  # saturated: 120 keys/group into 48
    direct = tuple_sketch_by(df, ["grp"], "uid", "v", k=k)
    merged = tuple_merge(
        [
            tuple_sketch_by(half_a, ["grp"], "uid", "v", k=k),
            tuple_sketch_by(half_b, ["grp"], "uid", "v", k=k),
        ],
        ["grp"],
    )
    as_set = lambda s: sorted(  # noqa: E731
        (r["grp"], r["h"], r["summary"]) for r in s.collect()
    )
    assert as_set(merged) == as_set(direct)


def test_merge_fractional_summaries_within_float_order(spark):
    # non-integer values: the merged hash SET is exact; summaries
    # agree up to double addition order (the documented contract).
    rows = [
        ("g", f"u{u}", 0.1 + 0.01 * (u % 13) + 1e-3 * r)
        for u in range(150)
        for r in range(5)
    ]
    df = _df(spark, rows)
    direct = tuple_sketch_by(df, ["grp"], "uid", "v", k=48)
    merged = tuple_merge(
        [
            tuple_sketch_by(_df(spark, rows[::2]), ["grp"], "uid", "v", k=48),
            tuple_sketch_by(_df(spark, rows[1::2]), ["grp"], "uid", "v", k=48),
        ],
        ["grp"],
    )
    d = sorted((r["h"], r["summary"]) for r in direct.collect())
    m = sorted((r["h"], r["summary"]) for r in merged.collect())
    assert [h for h, _ in d] == [h for h, _ in m]
    for (_, a), (_, b) in zip(d, m):
        assert a == pytest.approx(b, rel=1e-9)


def test_partitioning_invariance(spark):
    df = _df(spark, _rows(n_keys=90, per_key=2))
    a = tuple_sketch_by(df.repartition(1), ["grp"], "uid", "v", k=32)
    b = tuple_sketch_by(df.repartition(13), ["grp"], "uid", "v", k=32)
    key = lambda s: sorted(  # noqa: E731
        (r["grp"], r["h"], r["summary"]) for r in s.collect()
    )
    assert key(a) == key(b)


def test_intersect_sum_exact_mode(spark):
    # users 0..59 in A, 30..89 in B; A-values = uid index.
    rows_a = [("x", f"u{u}", float(u)) for u in range(60)]
    rows_b = [("x", f"u{u}", 1.0) for u in range(30, 90)]
    a = tuple_sketch_by(_df(spark, rows_a), ["grp"], "uid", "v", k=256)
    b = tuple_sketch_by(_df(spark, rows_b), ["grp"], "uid", "v", k=256)
    row = tuple_intersect_sum(a, b, ["grp"]).collect()[0]
    assert row["exact"] is True
    assert row["n_common"] == 30
    assert row["intersect_distinct_est"] == pytest.approx(30.0)
    assert row["intersect_sum_est"] == pytest.approx(sum(range(30, 60)))


def test_intersect_empty_reports_zero(spark):
    a = tuple_sketch_by(
        _df(spark, [("x", "u1", 2.0)]), ["grp"], "uid", "v", k=8
    )
    b = tuple_sketch_by(
        _df(spark, [("x", "u9", 5.0)]), ["grp"], "uid", "v", k=8
    )
    row = tuple_intersect_sum(a, b, ["grp"]).collect()[0]
    assert row["n_common"] == 0
    assert row["intersect_sum_est"] == 0.0
    assert row["exact"] is True


def test_guards(spark):
    df = _df(spark, [("x", "u", 1.0)])
    with pytest.raises(ValueError, match="k must be"):
        tuple_sketch_by(df, ["grp"], "uid", "v", k=2)
    with pytest.raises(ValueError, match="hash_fn"):
        tuple_sketch_by(df, ["grp"], "uid", "v", hash_fn="sha1")
    with pytest.raises(ValueError, match="no states"):
        tuple_merge([], ["grp"])
    a = tuple_sketch_by(df, ["grp"], "uid", "v", k=8)
    b = tuple_sketch_by(df, ["grp"], "uid", "v", k=16)
    with pytest.raises(ValueError, match="mixed"):
        tuple_merge([a, b], ["grp"])
    c = tuple_sketch_by(df, ["grp"], "uid", "v", k=8, hash_fn="md5")
    with pytest.raises(ValueError, match="hash_fns"):
        tuple_intersect_sum(a, c, ["grp"])


def test_null_contract(spark):
    rows = [("x", "u1", 1.0), ("x", None, 9.0), ("x", "u2", None)]
    df = spark.createDataFrame(rows, "grp string, uid string, v double")
    state = tuple_sketch_by(df, ["grp"], "uid", "v", k=8)
    got = {r["summary"] for r in state.collect()}
    assert state.count() == 2  # NULL key skipped
    assert got == {1.0, 0.0}  # NULL value counts as 0


def test_plan_is_python_free(spark):
    df = _df(spark, _rows(n_keys=30))
    state = tuple_sketch_by(df, ["grp"], "uid", "v", k=16)
    for target in (
        tuple_estimates(state, ["grp"]),
        tuple_intersect_sum(state, state, ["grp"]),
    ):
        plan = (
            target._jdf.queryExecution().executedPlan().toString()
        )
        for marker in (
            "ArrowEvalPython",
            "BatchEvalPython",
            "FlatMapsInPandas",
            "MapInPandas",
        ):
            assert marker not in plan


def test_summary_modes_min_max(spark):
    """min/max summary modes: exact-regime parity with groupBy truth,
    NULL-skip contract (all-NULL key carries NULL), idempotent merge
    over OVERLAPPING shards (unlike sum), and threshold counts."""
    from hyper_spark.operators.tuple_agg import tuple_threshold_count

    rows = [("u%d" % (i % 20), float(i)) for i in range(200)]
    rows += [("nullkey", None), ("nullkey", None)]
    df = spark.createDataFrame(rows, "uid string, v double")

    for mode, fn in (("min", min), ("max", max)):
        st = tuple_sketch_by(df, [], "uid", "v", k=64, summary=mode)
        got = {r["h"]: r["summary"] for r in st.collect()}
        truth = {}
        for u, v in rows:
            if v is not None:
                truth[u] = fn(truth.get(u, v), v)
        # xxhash ids are opaque; compare the summary multiset + count
        assert len(got) == 21  # 20 keys + nullkey
        assert sorted(v for v in got.values() if v is not None) == sorted(
            truth.values()
        )
        assert sum(1 for v in got.values() if v is None) == 1  # nullkey

        # idempotent merge: the SAME state twice -> unchanged
        merged = tuple_merge([st, st], [], summary=mode)
        assert sorted(
            (r["h"], r["summary"]) for r in merged.collect()
        ) == sorted((h, s) for h, s in got.items())

    # last-seen threshold (max mode): uid u's max v is 180+u, so
    # threshold 190 keeps exactly uids 10..19
    st = tuple_sketch_by(df, [], "uid", "v", k=64, summary="max")
    out = tuple_threshold_count(st, [], 190.0).collect()[0]
    assert out["exact"] and out["n_passing"] == 10
    assert out["count_est"] == 10.0
    # NULL summaries never pass
    low = tuple_threshold_count(st, [], -1e9).collect()[0]
    assert low["n_passing"] == 20  # nullkey excluded

    # saturated regime: HT count within the theta RSE envelope
    big = spark.createDataFrame(
        [(f"w{i}", float(i)) for i in range(5000)], "uid string, v double"
    )
    stb = tuple_sketch_by(big, [], "uid", "v", k=256, summary="max")
    est = tuple_threshold_count(stb, [], 2500.0).collect()[0]
    assert not est["exact"]
    rse = theta_rse(256)
    assert abs(est["count_est"] - 2500.0) <= 4 * rse * 2500.0

    # guards
    with pytest.raises(ValueError, match="summary must be"):
        tuple_sketch_by(df, [], "uid", "v", k=8, summary="avg")
    with pytest.raises(ValueError, match="cmp must be"):
        tuple_threshold_count(st, [], 1.0, cmp="!=")
