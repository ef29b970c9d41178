"""Interval analytics: brute-force parity (randomized via hypothesis-
style seeds), half-open tie semantics, tolerance merging, invalid-row
contract, plan purity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.operators.intervals import (
    interval_coverage,
    max_concurrency,
    merge_intervals,
)


def _brute_spans(ivs, tol=0.0):
    """Sweep over sorted intervals -> list of (start, end, n)."""
    out = []
    for s, e in sorted(ivs):
        if out and s <= out[-1][1] + tol:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return [tuple(x) for x in out]


def _brute_peak(ivs):
    """Half-open [s,e) sweep -> (peak, earliest t at peak)."""
    events = sorted(
        [(s, 1) for s, e in ivs] + [(e, -1) for s, e in ivs]
    )  # (t, -1) sorts before (t, +1)
    best, cur, at = 0, 0, None
    for t, d in events:
        cur += d
        if cur > best:
            best, at = cur, t
    if best == 0:
        at = events[0][0] if events else None
    return best, at


def _cases(seed, n_keys=4, n_iv=12):
    rng = random.Random(seed)
    data = {}
    for k in range(n_keys):
        ivs = []
        for _ in range(rng.randint(1, n_iv)):
            s = rng.randint(0, 50)
            ln = rng.choice([0, 1, 2, 5, 10])
            ivs.append((float(s), float(s + ln)))
        data[f"k{k}"] = ivs
    return data


def _df(spark, data):
    rows = [
        Row(key=k, s=s, e=e) for k, ivs in data.items() for s, e in ivs
    ]
    return spark.createDataFrame(rows)


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_merge_matches_bruteforce(spark, seed):
    data = _cases(seed)
    got = {}
    for r in merge_intervals(_df(spark, data), ["key"], "s", "e").collect():
        got.setdefault(r["key"], []).append(
            (r["span_start"], r["span_end"], r["n_intervals"])
        )
    for k, ivs in data.items():
        assert sorted(got[k]) == _brute_spans(ivs), k


@pytest.mark.parametrize("tol", [0.5, 3.0])
def test_merge_tolerance(spark, tol):
    data = _cases(99)
    got = {}
    df = merge_intervals(_df(spark, data), ["key"], "s", "e", tolerance=tol)
    for r in df.collect():
        got.setdefault(r["key"], []).append(
            (r["span_start"], r["span_end"], r["n_intervals"])
        )
    for k, ivs in data.items():
        assert sorted(got[k]) == _brute_spans(ivs, tol=tol), k


@pytest.mark.parametrize("seed", [3, 11, 77])
def test_coverage_and_peak_match_bruteforce(spark, seed):
    data = _cases(seed)
    df = _df(spark, data)
    cov = {
        r["key"]: (r["covered"], r["n_spans"], r["n_intervals"], r["longest_span"])
        for r in interval_coverage(df, ["key"], "s", "e").collect()
    }
    pk = {
        r["key"]: (r["peak"], r["peak_at"])
        for r in max_concurrency(df, ["key"], "s", "e").collect()
    }
    for k, ivs in data.items():
        spans = _brute_spans(ivs)
        want_cov = (
            sum(e - s for s, e, _ in spans),
            len(spans),
            len(ivs),
            max(e - s for s, e, _ in spans),
        )
        assert cov[k] == pytest.approx(want_cov), k
        assert pk[k] == _brute_peak(ivs), k


def test_half_open_touching_do_not_overlap(spark):
    df = _df(spark, {"a": [(0.0, 5.0), (5.0, 9.0)]})
    out = max_concurrency(df, ["key"], "s", "e").collect()[0]
    assert out["peak"] == 1
    # but they DO merge into one span (touch) at tolerance 0
    spans = merge_intervals(df, ["key"], "s", "e").collect()
    assert len(spans) == 1 and spans[0]["n_intervals"] == 2


def test_invalid_rows_dropped_and_guards(spark):
    rows = [
        Row(key="a", s=1.0, e=4.0),
        Row(key="a", s=None, e=9.0),
        Row(key="a", s=5.0, e=2.0),  # end < start: dropped
    ]
    df = spark.createDataFrame(rows)
    spans = merge_intervals(df, ["key"], "s", "e").collect()
    assert len(spans) == 1 and spans[0]["n_intervals"] == 1
    with pytest.raises(ValueError):
        merge_intervals(df, [], "s", "e")
    with pytest.raises(ValueError):
        merge_intervals(df, ["key"], "s", "e", tolerance=-1)


def test_timestamp_inputs_and_plan_purity(spark):
    df = spark.createDataFrame(
        [
            Row(key="a", s="2026-01-01 00:00:00", e="2026-01-01 00:10:00"),
            Row(key="a", s="2026-01-01 00:05:00", e="2026-01-01 00:20:00"),
        ]
    ).select(
        "key",
        F.to_timestamp("s").alias("s"),
        F.to_timestamp("e").alias("e"),
    )
    cov = interval_coverage(df, ["key"], "s", "e").collect()[0]
    assert cov["covered"] == 1200.0 and cov["n_spans"] == 1
    plan = (
        max_concurrency(df, ["key"], "s", "e")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
