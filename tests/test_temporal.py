"""sessionize + asof_join vs brute-force python oracles."""

from __future__ import annotations

import bisect

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.temporal import asof_join, range_join, sessionize


def test_sessionize_matches_python(spark):
    rows = [
        Row(k="a", t=0.0), Row(k="a", t=10.0), Row(k="a", t=100.0),
        Row(k="a", t=101.0), Row(k="b", t=5.0), Row(k="b", t=500.0),
    ]
    got = {
        (r["k"], r["t"]): r["session_idx"]
        for r in sessionize(spark.createDataFrame(rows).repartition(3), "k", "t", gap=60).collect()
    }
    assert got == {
        ("a", 0.0): 0, ("a", 10.0): 0, ("a", 100.0): 1, ("a", 101.0): 1,
        ("b", 5.0): 0, ("b", 500.0): 1,
    }


def test_asof_join_matches_python(spark):
    import random

    rng = random.Random(3)
    left = [Row(k=f"k{i % 3}", t=float(rng.randint(0, 1000)), lid=i) for i in range(200)]
    # unique right timestamps per key: with duplicates the "latest at t"
    # is ambiguous and any oracle comparison is arbitrary
    right = [
        Row(k=f"k{j % 3}", t=float(t), price=float(j))
        for j, t in enumerate(rng.sample(range(0, 3000), 60))
    ]
    got = asof_join(
        spark.createDataFrame(left).repartition(4),
        spark.createDataFrame(right).repartition(3),
        on="t", by="k",
    ).collect()
    # python oracle: latest right at-or-before per key
    by_key: dict = {}
    for r in right:
        by_key.setdefault(r.k, []).append((r.t, r.price))
    for k in by_key:
        by_key[k].sort()
    expect = {}
    for r in left:
        arr = by_key.get(r.k, [])
        i = bisect.bisect_right([t for t, _ in arr], r.t)
        expect[r.lid] = arr[i - 1][1] if i else None
    assert len(got) == len(left)
    for row in got:
        assert row["price_asof"] == expect[row["lid"]], row


def test_asof_join_directions_and_tolerance(spark):
    """forward/nearest + tolerance vs a brute python oracle (pandas
    merge_asof semantics; nearest ties go backward)."""
    import random

    rng = random.Random(11)
    left = [Row(k=f"k{i % 3}", t=float(rng.randint(0, 1000)), lid=i) for i in range(150)]
    right = [
        Row(k=f"k{j % 3}", t=float(t), price=float(j))
        for j, t in enumerate(rng.sample(range(0, 3000), 60))
    ]
    ldf = spark.createDataFrame(left).repartition(4)
    rdf = spark.createDataFrame(right).repartition(3)
    by_key: dict = {}
    for r in right:
        by_key.setdefault(r.k, []).append((r.t, r.price))
    for k in by_key:
        by_key[k].sort()

    def oracle(lrow, direction, tol):
        arr = by_key.get(lrow.k, [])
        back = fwd = None
        i = bisect.bisect_right([t for t, _ in arr], lrow.t)
        if i:
            back = arr[i - 1]
        j = bisect.bisect_left([t for t, _ in arr], lrow.t)
        if j < len(arr):
            fwd = arr[j]
        if direction == "backward":
            m = back
        elif direction == "forward":
            m = fwd
        else:
            if back is None:
                m = fwd
            elif fwd is None:
                m = back
            else:
                m = fwd if (fwd[0] - lrow.t) < (lrow.t - back[0]) else back
        if m is not None and tol is not None and abs(m[0] - lrow.t) > tol:
            m = None
        return None if m is None else m[1]

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 50.0):
            got = asof_join(
                ldf, rdf, on="t", by="k", direction=direction, tolerance=tol
            ).collect()
            assert len(got) == len(left)
            expect = {r.lid: oracle(r, direction, tol) for r in left}
            for row in got:
                assert row["price_asof"] == expect[row["lid"]], (
                    direction, tol, row,
                )


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-validation against pandas.merge_asof (the de-facto
    reference semantics) over a seeded random case per direction ×
    tolerance, including duplicate left timestamps and keys absent from
    one side."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    left = pd.DataFrame(
        {
            "k": [f"k{int(x)}" for x in rng.integers(0, 4, 120)],  # k3 absent right
            "t": rng.integers(0, 500, 120).astype("float64"),
            "lid": np.arange(120),
        }
    )
    right = pd.DataFrame(
        {
            "k": [f"k{int(x)}" for x in rng.integers(0, 3, 50)],
            "t": np.sort(rng.choice(np.arange(0, 1500, dtype="float64"), 50, replace=False)),
            "price": rng.standard_normal(50).round(3),
        }
    )
    ldf = spark.createDataFrame(left).repartition(5)
    rdf = spark.createDataFrame(right).repartition(3)
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 40.0):
            want = pd.merge_asof(
                left.sort_values(["t", "lid"]),
                right.sort_values("t"),
                on="t",
                by="k",
                direction=direction,
                tolerance=tol,
                suffixes=("", "_r"),
            ).set_index("lid")["price"]
            got = asof_join(
                ldf, rdf, on="t", by="k", right_cols=["price"],
                direction=direction, tolerance=tol,
            ).collect()
            assert len(got) == len(left)
            for row in got:
                w = want[row["lid"]]
                g = row["price_asof"]
                if pd.isna(w):
                    assert g is None, (direction, tol, row)
                else:
                    assert g is not None and abs(g - w) < 1e-9, (direction, tol, row, w)


def test_asof_join_rejects_non_numeric_on_for_tolerance(spark):
    """Review fix: tolerance/nearest do arithmetic on `on`; a string
    column would cast to NULL and silently null every match — reject."""
    import pytest

    left = spark.createDataFrame([Row(k="a", t="2024-01-01", lid=1)])
    right = spark.createDataFrame([Row(k="a", t="2024-01-01", price=1.0)])
    with pytest.raises(ValueError, match="timestamp or numeric"):
        asof_join(left, right, on="t", by="k", tolerance=5.0)
    with pytest.raises(ValueError, match="timestamp or numeric"):
        asof_join(left, right, on="t", by="k", direction="nearest")
    # plain backward on a string `on` column still works (lexicographic)
    got = asof_join(left, right, on="t", by="k").collect()
    assert got[0]["price_asof"] == 1.0


def test_asof_join_preserves_matched_row_nulls(spark):
    """ADVICE r02 medium: a matched right row's NULL value must come
    through as NULL (not a stale earlier value), and multiple carried
    columns must come from the SAME right row."""
    left = spark.createDataFrame(
        [Row(k="a", t=10.0, lid=1), Row(k="a", t=30.0, lid=2)]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", t=5.0, price=1.0, qty=100),
            # matched row for t=30: price is NULL, qty from the SAME row
            Row(k="a", t=25.0, price=None, qty=200),
        ]
    )
    got = {
        r["lid"]: (r["price_asof"], r["qty_asof"])
        for r in asof_join(left, right, on="t", by="k").collect()
    }
    assert got[1] == (1.0, 100)
    assert got[2] == (None, 200)  # NOT (1.0, 200): no cross-row mixing


def test_asof_join_plan_is_single_window_shuffle(spark):
    left = spark.createDataFrame([Row(k="a", t=1.0, lid=1)])
    right = spark.createDataFrame([Row(k="a", t=0.5, price=2.0)])
    plan = asof_join(left, right, on="t", by="k")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Window") >= 1


def test_range_join_matches_python(spark):
    import random

    rng = random.Random(9)
    left = [Row(k=f"k{i % 2}", t=float(rng.randint(0, 500)), lid=i) for i in range(150)]
    right = []
    for j in range(30):
        s = float(rng.randint(0, 480))
        right.append(Row(k=f"k{j % 2}", s=s, e=s + rng.randint(0, 60), rid=j))
    got = range_join(
        spark.createDataFrame(left).repartition(4),
        spark.createDataFrame(right).repartition(3),
        left_ts="t", right_start="s", right_end="e", by="k", bin_width=50.0,
    ).select("lid", "rid").collect()
    expect = {
        (l.lid, r.rid)
        for l in left
        for r in right
        if l.k == r.k and r.s <= l.t <= r.e
    }
    assert {(r["lid"], r["rid"]) for r in got} == expect
    assert len(got) == len(expect)  # no duplicate matches from bin overlap


def test_range_join_plan_is_hash_join(spark):
    left = spark.createDataFrame([Row(k="a", t=1.0, lid=1)])
    right = spark.createDataFrame([Row(k="a", s=0.0, e=2.0, rid=1)])
    plan = (
        range_join(left, right, "t", "s", "e", by="k", bin_width=10.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the whole point: an equi hash join, not BroadcastNestedLoopJoin
    assert "NestedLoop" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


# ---------------------------------------------------------------- funnel


def test_funnel_state_machine(spark):
    from hyper_spark.operators.temporal import funnel, funnel_counts

    rows = [
        # conv A completes a->b->c in order
        ("A", "2026-01-01 00:00:00", "a"),
        ("A", "2026-01-01 00:01:00", "b"),
        ("A", "2026-01-01 00:02:00", "c"),
        # conv B: b before a -> only reaches stage 1 (the later 'a')
        ("B", "2026-01-01 00:00:00", "b"),
        ("B", "2026-01-01 00:01:00", "a"),
        # conv C: a then c (skips b) -> stage 1
        ("C", "2026-01-01 00:00:00", "a"),
        ("C", "2026-01-01 00:01:00", "c"),
        # conv D: a and b at the SAME instant -> same-ts cannot satisfy
        # consecutive steps, stage 1
        ("D", "2026-01-01 00:00:00", "a"),
        ("D", "2026-01-01 00:00:00", "b"),
        # conv E: no step events
        ("E", "2026-01-01 00:00:00", "x"),
    ]
    df = spark.createDataFrame(rows, "conv string, ts string, ev string").select(
        "conv", F.col("ts").cast("timestamp").alias("ts"), "ev"
    )
    steps = [F.col("ev") == "a", F.col("ev") == "b", F.col("ev") == "c"]
    got = {r["conv"]: r for r in funnel(df, ["conv"], "ts", steps).collect()}
    assert got["A"]["stage"] == 3 and len(got["A"]["step_ts"]) == 3
    assert got["B"]["stage"] == 1
    assert got["C"]["stage"] == 1
    assert got["D"]["stage"] == 1
    assert got["E"]["stage"] == 0
    counts = {r["stage_at_least"]: r["n_keys"]
              for r in funnel_counts(df, ["conv"], "ts", steps).collect()}
    assert counts == {1: 4, 2: 1, 3: 1}
    # pure JVM: no Python eval in the plan
    plan = funnel(df, ["conv"], "ts", steps)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "EvalPython" not in plan and "ArrowEval" not in plan


def test_funnel_null_ts_and_zero_stage_rows(spark):
    """Review findings: NULL-ts rows must be skipped (a NULL first hit
    froze the key), and funnel_counts emits n_keys=0 for unreached
    stages."""
    from hyper_spark.operators.temporal import funnel, funnel_counts

    rows = [
        ("K", None, "a"),
        ("K", "2026-01-01 00:01:00", "a"),
        ("K", "2026-01-01 00:02:00", "b"),
        ("K", "2026-01-01 00:03:00", "c"),
    ]
    df = spark.createDataFrame(rows, "conv string, ts string, ev string").select(
        "conv", F.col("ts").cast("timestamp").alias("ts"), "ev"
    )
    steps = [F.col("ev") == "a", F.col("ev") == "b", F.col("ev") == "c"]
    got = funnel(df, ["conv"], "ts", steps).collect()[0]
    assert got["stage"] == 3  # NULL-ts 'a' did not freeze the funnel
    assert all(t is not None for t in got["step_ts"])
    # nobody reaches step 'z': ladder still shows stage 3 with 0
    steps0 = [F.col("ev") == "a", F.col("ev") == "b", F.col("ev") == "z"]
    counts = {r["stage_at_least"]: r["n_keys"]
              for r in funnel_counts(df, ["conv"], "ts", steps0).collect()}
    assert counts == {1: 1, 2: 1, 3: 0}


def test_sessionize_bucketed_matches_plain_on_hot_key(spark):
    """Skew path (VERDICT r03 missing #5): bucket_width spreads a hot
    key over (key, time-bucket) windows — per-task input is bounded by
    the largest bucket, not the hot key's total — while the session
    assignment is IDENTICAL to the plain single-window path, including
    sessions that straddle bucket boundaries."""
    import random

    from hyper_spark.operators.temporal import sessionize

    rng = random.Random(7)
    rows = []
    t = 0.0
    # hot key: 2000 events, gaps chosen to produce many sessions, some
    # crossing the 100s bucket boundary
    for i in range(2000):
        t += rng.choice([1.0, 2.0, 31.0])  # gap=30 → 31 starts a session
        rows.append(("hot", t))
    for i in range(50):  # cold keys
        rows.append((f"c{i % 7}", float(i * 13 % 97)))
    df = spark.createDataFrame(rows, "k string, ts double").repartition(8)
    plain = sessionize(df, "k", "ts", gap=30.0)
    bucketed = sessionize(df, "k", "ts", gap=30.0, bucket_width=100.0)
    a = {(r["k"], r["ts"]): r["session_idx"] for r in plain.collect()}
    b = {(r["k"], r["ts"]): r["session_idx"] for r in bucketed.collect()}
    assert a == b
    # bounded state: the big window partitions by (k, bucket) — the hot
    # key's 2000 rows never meet in one task
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "__b" in plan.split("Window")[1], plan[:2000]
    from pyspark.sql import functions as F

    max_bucket = (
        df.groupBy("k", F.floor(F.col("ts") / 100.0)).count()
        .agg(F.max("count")).collect()[0][0]
    )
    assert max_bucket < 300  # vs 2000 rows through one task un-bucketed


def test_asof_join_bucketed_matches_plain_on_hot_key(spark):
    """asof_join(bucket_width=...): identical matches to the plain path
    for all three directions and with tolerance, on a hot key whose
    matches often live in EARLIER buckets (exercises the carry table)."""
    import random

    from hyper_spark.operators.temporal import asof_join

    rng = random.Random(11)
    left_rows = [("hot", float(i) + 0.5) for i in range(1500)]
    left_rows += [(f"c{i}", float(i)) for i in range(20)]
    # sparse right side: long stretches of buckets with no right row
    right_rows = [("hot", float(rng.randrange(0, 1500)), f"m{i}")
                  for i in range(40)]
    right_rows += [("c3", 2.0, "x"), ("c19", 30.0, "y")]  # c19: after its left
    left = spark.createDataFrame(left_rows, "k string, t double").repartition(8)
    right = spark.createDataFrame(
        right_rows, "k string, t double, mark string"
    ).repartition(8)
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 50.0):
            plain = asof_join(left, right, on="t", by="k",
                              direction=direction, tolerance=tol)
            buck = asof_join(left, right, on="t", by="k",
                             direction=direction, tolerance=tol,
                             bucket_width=25.0)
            a = sorted((r["k"], r["t"], r["mark_asof"])
                       for r in plain.collect())
            b = sorted((r["k"], r["t"], r["mark_asof"])
                       for r in buck.collect())
            assert a == b, (direction, tol)


def test_funnel_hot_key_state_bounded_by_matches(spark):
    """VERDICT r03 wrong #2: a key whose non-matching events outnumber
    matches 1000:1 must not collect the chatter — the pre-groupBy filter
    keeps per-key state bounded by step-matching rows — while stage and
    hit timestamps are unchanged, and no-match keys still appear at
    stage 0."""
    from hyper_spark.operators.temporal import funnel

    rows = [("H", f"2026-01-01 00:00:{i % 50:02d}.{i % 1000:03d}", "noise")
            for i in range(3000)]
    rows += [("H", "2026-01-01 01:00:00", "a"),
             ("H", "2026-01-01 01:01:00", "b"),
             ("H", "2026-01-01 01:02:00", "c")]
    rows += [("Z", "2026-01-01 00:00:00", "noise")]  # no matches at all
    df = spark.createDataFrame(rows, "conv string, ts string, ev string").select(
        "conv", F.col("ts").cast("timestamp").alias("ts"), "ev"
    )
    steps = [F.col("ev") == "a", F.col("ev") == "b", F.col("ev") == "c"]
    q = funnel(df, ["conv"], "ts", steps)
    got = {r["conv"]: r for r in q.collect()}
    assert got["H"]["stage"] == 3 and len(got["H"]["step_ts"]) == 3
    assert got["Z"]["stage"] == 0 and list(got["Z"]["step_ts"]) == []
    # the collect_list aggregate's input is pre-filtered: the plan's
    # ObjectHashAggregate side must sit above a Filter on the step flags
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert "array_contains" in plan, plan


def test_funnel_durations(spark):
    from hyper_spark.operators.temporal import funnel_durations

    rows = [
        ("A", "2026-01-01 00:00:00", "a"),
        ("A", "2026-01-01 00:00:10", "b"),
        ("A", "2026-01-01 00:01:10", "c"),
        ("B", "2026-01-01 00:00:00", "a"),
        ("B", "2026-01-01 00:00:30", "b"),
        ("C", "2026-01-01 00:00:00", "a"),  # stage 1 only: no durations
    ]
    df = spark.createDataFrame(rows, "conv string, ts string, ev string").select(
        "conv", F.col("ts").cast("timestamp").alias("ts"), "ev"
    )
    steps = [F.col("ev") == "a", F.col("ev") == "b", F.col("ev") == "c"]
    got = {r["transition"]: r
           for r in funnel_durations(df, ["conv"], "ts", steps).collect()}
    assert got[1]["n"] == 2 and got[1]["mean_s"] == 20.0  # (10+30)/2
    assert got[1]["p50_s"] == 20.0
    assert got[2]["n"] == 1 and got[2]["mean_s"] == 60.0


def test_transitions_hand_case(spark):
    from hyper_spark.operators.temporal import transitions

    rows = [
        ("a", 0, "x"), ("a", 1, "y"), ("a", 2, "x"),
        ("b", 0, "y"), ("b", 1, "y"),
        ("c", 0, "x"), ("c", 1, None), ("c", 2, "y"),  # NULL skipped
    ]
    df = spark.createDataFrame(rows, "k string, i int, s string").repartition(3)
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["prob"])
        for r in transitions(df, "k", "i", "s").collect()
    }
    # a: (x,y),(y,x); b: (y,y); c skips the NULL turn: (x,y)
    assert got == {
        ("x", "y"): (2, 1.0),
        ("y", "x"): (1, 0.5),
        ("y", "y"): (1, 0.5),
    }


def test_transitions_bounds_and_prob_sums(spark):
    from hyper_spark.operators.temporal import transitions

    rows = [("a", 0, "x"), ("a", 1, "y"), ("b", 0, "y")]
    df = spark.createDataFrame(rows, "k string, i int, s string")
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["prob"])
        for r in transitions(df, "k", "i", "s", include_bounds=True).collect()
    }
    assert got == {
        ("__START__", "x"): (1, 0.5),
        ("__START__", "y"): (1, 0.5),
        ("x", "y"): (1, 1.0),
        ("y", "__END__"): (2, 1.0),
    }
    # Σ prob per from_state == 1 exactly for every state
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _t), (_n, p) in got.items():
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-12 for s in sums.values()), sums


def test_transitions_matches_python_oracle(spark):
    import random
    from collections import Counter

    from hyper_spark.operators.temporal import transitions

    rng = random.Random(7)
    states = ["s0", "s1", "s2", "s3", None]
    rows = []
    seqs = {}
    for k in range(40):
        n = rng.randint(1, 12)
        seq = [rng.choice(states) for _ in range(n)]
        seqs[f"k{k}"] = [s for s in seq if s is not None]
        rows += [(f"k{k}", i, s) for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "k string, i int, s string").repartition(5)

    expect = Counter()
    for seq in seqs.values():
        if not seq:
            continue
        expect[("__START__", seq[0])] += 1
        for a, b in zip(seq, seq[1:]):
            expect[(a, b)] += 1
        expect[(seq[-1], "__END__")] += 1
    out = transitions(df, "k", "i", "s", include_bounds=True).collect()
    got = {(r["from_state"], r["to_state"]): r["n"] for r in out}
    assert got == dict(expect)
    froms = Counter()
    for (f, _t), n in expect.items():
        froms[f] += n
    for r in out:
        assert abs(r["prob"] - got[(r["from_state"], r["to_state"])] / froms[r["from_state"]]) < 1e-12


def test_rolling_features_matches_python(spark):
    import random

    from hyper_spark.operators.temporal import rolling_features

    rng = random.Random(5)
    rows = []
    for k in ("a", "b"):
        for i in range(120):
            ts = float(rng.randint(0, 500))
            val = None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 3)
            rows.append((k, ts, val, len(rows)))
    df = spark.createDataFrame(rows, "k string, t double, v double, rid int").repartition(5)

    for include in (True, False):
        got = {
            r["rid"]: r
            for r in rolling_features(
                df, "k", "t", "v", windows=[60], include_current=include
            ).collect()
        }
        for k, t, v, rid in rows:
            in_win = [
                (t2, v2)
                for (k2, t2, v2, rid2) in rows
                if k2 == k and t - 60 <= t2 <= t and (include or rid2 != rid)
            ]
            vals = [v2 for _, v2 in in_win if v2 is not None]
            r = got[rid]
            assert r["n_60s"] == len(in_win), (rid, include)
            if vals:
                assert abs(r["sum_60s"] - sum(vals)) < 1e-9
                assert abs(r["mean_60s"] - sum(vals) / len(vals)) < 1e-9
            else:
                assert r["sum_60s"] is None and r["mean_60s"] is None


def test_rolling_features_leak_safe_self_exclusion(spark):
    from hyper_spark.operators.temporal import rolling_features

    # two rows at the SAME timestamp: exclude-current removes only the
    # row's own value, the tied other row still counts
    df = spark.createDataFrame(
        [("u", 100.0, 10.0, 1), ("u", 100.0, 4.0, 2), ("u", 50.0, 1.0, 3)],
        "k string, t double, v double, rid int",
    )
    got = {
        r["rid"]: r
        for r in rolling_features(
            df, "k", "t", "v", [60], include_current=False
        ).collect()
    }
    assert got[1]["n_60s"] == 2 and got[1]["sum_60s"] == 5.0   # tied 4 + older 1
    assert got[2]["n_60s"] == 2 and got[2]["sum_60s"] == 11.0  # tied 10 + older 1
    assert got[3]["n_60s"] == 0 and got[3]["sum_60s"] is None
    assert got[3]["mean_60s"] is None


def test_resample_matches_python(spark):
    import datetime as dt
    import random

    from hyper_spark.operators.temporal import resample

    rng = random.Random(17)
    base = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(400):
        k = f"u{i % 3}"
        ts = base + dt.timedelta(seconds=rng.randint(0, 4 * 3600 - 1))
        v = None if rng.random() < 0.2 else round(rng.uniform(-10, 10), 3)
        rows.append((k, ts, v))
    # a deliberate timestamp tie with two different values
    tie = base + dt.timedelta(seconds=30)
    rows += [("u0", tie, 5.0), ("u0", tie, -5.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double").repartition(5)
    got = {
        (r["k"], r["bucket_start"]): r
        for r in resample(df, "k", "ts", "v", bucket="1 hour").collect()
    }

    from collections import defaultdict

    buckets = defaultdict(list)
    for k, ts, v in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        buckets[(k, b)].append((ts, v))
    assert set(got) == set(buckets)
    for key, items in buckets.items():
        r = got[key]
        vals = [v for _, v in items if v is not None]
        assert r["n"] == len(items) and r["n_values"] == len(vals)
        if not vals:
            assert r["v_open"] is None and r["v_sum"] is None
            continue
        withv = [(ts, v) for ts, v in items if v is not None]
        assert r["v_open"] == min(withv)[1]
        assert r["v_close"] == max(withv)[1]
        assert r["v_min"] == min(vals) and r["v_max"] == max(vals)
        assert abs(r["v_sum"] - sum(vals)) < 1e-9
        assert abs(r["v_mean"] - sum(vals) / len(vals)) < 1e-9
    # the tie bucket: open takes the smaller value at the tied min ts,
    # close the larger at the tied max ts
    tb = got[("u0", tie.replace(minute=0, second=0, microsecond=0))]
    assert tb is not None  # tie rows folded deterministically


def test_resample_single_shuffle(spark):
    import datetime as dt

    from hyper_spark.operators.temporal import resample
    from hyper_spark.plans.report import assert_plan

    df = spark.createDataFrame(
        [("a", dt.datetime(2026, 1, 1), 1.0)], "k string, ts timestamp, v double"
    )
    assert_plan(resample(df, "k", "ts", "v"), max_exchanges=1, no_python=True)


def test_calendar_fill(spark):
    import datetime as dt

    import pytest

    from hyper_spark.operators.temporal import calendar_fill, resample

    base = dt.datetime(2026, 1, 1)
    rows = [
        ("a", base, 1.0),
        ("a", base + dt.timedelta(hours=3, minutes=5), 2.0),  # hours 1,2 missing
        ("b", base + dt.timedelta(hours=1), 7.0),             # single bucket
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    series = resample(df, "k", "ts", "v", bucket="1 hour")
    filled = calendar_fill(series, ["k"], fill={"n": 0, "n_values": 0})
    got = {(r["k"], r["bucket_start"].hour): r for r in filled.collect()}
    assert {(k, h) for k, h in got} == {("a", 0), ("a", 1), ("a", 2), ("a", 3), ("b", 1)}
    assert got[("a", 1)]["n"] == 0 and got[("a", 1)]["v_sum"] is None
    assert got[("a", 0)]["n"] == 1 and got[("a", 0)]["v_open"] == 1.0
    assert got[("a", 3)]["v_close"] == 2.0
    with pytest.raises(ValueError):
        calendar_fill(series, [])


def test_state_ngrams_matches_python(spark):
    import random
    from collections import Counter

    import pytest

    from hyper_spark.operators.temporal import state_ngrams

    rng = random.Random(29)
    rows = []
    seqs = {}
    for k in range(30):
        seq = [rng.choice(["a", "b", "c", None]) for _ in range(rng.randint(1, 10))]
        seqs[k] = [s for s in seq if s is not None]
        rows += [(f"k{k}", i, s) for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "k string, i int, s string").repartition(5)

    for n in (2, 3):
        got = {
            tuple(r[f"s{j + 1}"] for j in range(n)): r["n_gram"]
            for r in state_ngrams(df, "k", "i", "s", n=n).collect()
        }
        exp = Counter()
        for seq in seqs.values():
            for j in range(len(seq) - n + 1):
                exp[tuple(seq[j : j + n])] += 1
        assert got == dict(exp), n
    with pytest.raises(ValueError):
        state_ngrams(df, "k", "i", "s", n=1)


class TestAcf:
    @staticmethod
    def _acf(xs, max_lag):
        import numpy as np

        x = np.asarray(xs, dtype=float)
        n = len(x)
        xbar = x.mean()
        den = ((x - xbar) ** 2).sum()
        out = {}
        for lg in range(1, max_lag + 1):
            if n > lg and den > 0:
                out[lg] = float(
                    ((x[:-lg] - xbar) * (x[lg:] - xbar)).sum() / den
                )
            else:
                out[lg] = None
        return out

    def test_matches_numpy_definition(self, spark):
        import math

        from hyper_spark.operators.temporal import acf

        # key a: strong period-2 signal; key b: ramp; key c: constant
        rows = []
        for t in range(40):
            rows.append(("a", float(t), 5.0 + (1.0 if t % 2 == 0 else -1.0)))
            rows.append(("b", float(t), float(t)))
            rows.append(("c", float(t), 3.0))
        df = spark.createDataFrame(rows, "k string, ts double, v double")
        got = {
            (r["k"], r["lag"]): (r["n_pairs"], r["acf"])
            for r in acf(df, "k", "ts", "v", max_lag=3).collect()
        }
        series = {"a": [], "b": [], "c": []}
        for k, t, v in rows:
            series[k].append(v)
        for k, xs in series.items():
            want = self._acf(xs, 3)
            for lg in (1, 2, 3):
                n_pairs, a = got[(k, lg)]
                assert n_pairs == len(xs) - lg
                if want[lg] is None:
                    assert a is None, (k, lg)
                else:
                    assert a == pytest.approx(want[lg], abs=1e-9), (k, lg)
        # the period-2 series alternates sign: negative at odd lags
        assert got[("a", 1)][1] < -0.9 and got[("a", 2)][1] > 0.9
        # zero-variance series -> NULL acf at every lag
        assert all(got[("c", lg)][1] is None for lg in (1, 2, 3))

    def test_nulls_dropped_and_short_series(self, spark):
        from hyper_spark.operators.temporal import acf

        rows = [("k", 1.0, 1.0), ("k", 2.0, None), ("k", 3.0, 2.0)]
        df = spark.createDataFrame(rows, "k string, ts double, v double")
        got = {
            r["lag"]: (r["n_pairs"], r["acf"])
            for r in acf(df, "k", "ts", "v", max_lag=2).collect()
        }
        # NULL row dropped: series = [1, 2]; lag1 has 1 pair, lag2 none
        assert got[1][0] == 1 and got[2] == (0, None)

    def test_guards_and_plan(self, spark):
        import pytest as _pytest

        from hyper_spark.operators.temporal import acf

        df = spark.createDataFrame(
            [("k", 1.0, 1.0)], "k string, ts double, v double"
        )
        with _pytest.raises(ValueError, match="max_lag"):
            acf(df, "k", "ts", "v", max_lag=0)
        qe = acf(df, "k", "ts", "v", max_lag=4)._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # one exchange total: window and groupBy share the key hash
        assert plan.count("Exchange hashpartitioning") == 1
