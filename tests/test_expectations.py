"""expect / violations (operators/expectations.py): declarative data
quality rules with exact violation counts, hand-verified on a crafted
dirty table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyper_spark.operators.expectations import expect, violations


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # id, status, score, code
        (1, "ok", 10.0, "A1"),
        (2, "ok", 20.0, "B2"),
        (2, "bad", -5.0, "C3"),      # dup id, bad status, below range
        (3, None, 150.0, "dd"),      # null status, above range, bad code
        (4, "ok", None, "E5"),       # null score passes in_range
        (5, "meh", 50.0, None),      # bad status, null code passes matches
    ]
    return spark.createDataFrame(rows, "id bigint, status string, score double, code string")


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], "rid bigint")


RULES = [
    {"rule": "not_null", "column": "status"},
    {"rule": "unique", "columns": ["id"]},
    {"rule": "accepted_values", "column": "status", "values": ["ok"]},
    {"rule": "in_range", "column": "score", "lo": 0.0, "hi": 100.0},
    {"rule": "matches", "column": "code", "pattern": "^[A-Z][0-9]$"},
]


def test_expect_exact_counts(spark, dirty, ref):
    rules = RULES + [
        {"rule": "foreign_key", "column": "id", "ref": ref, "ref_column": "rid"}
    ]
    rep = {r["rule"]: r for r in expect(dirty, rules).collect()}
    assert all(r["n_rows"] == 6 for r in rep.values())
    assert rep["not_null"]["n_violations"] == 1
    assert rep["unique"]["n_violations"] == 1          # 6 rows, 5 distinct ids
    assert rep["accepted_values"]["n_violations"] == 2  # bad, meh (NULL passes)
    assert rep["in_range"]["n_violations"] == 2         # -5, 150 (NULL passes)
    assert rep["matches"]["n_violations"] == 1          # dd (NULL passes)
    assert rep["foreign_key"]["n_violations"] == 2      # ids 4, 5
    assert all(not r["passed"] for r in rep.values())
    assert rep["unique"]["target"] == "id"


def test_thresholds_global_and_per_rule(spark, dirty):
    rep = expect(
        dirty,
        [
            {"rule": "not_null", "column": "status"},              # 1/6 ≈ 0.167
            {"rule": "in_range", "column": "score", "lo": 0.0,
             "hi": 100.0, "max_frac": 0.5},                        # 2/6 < 0.5
        ],
        max_frac=0.2,
    ).collect()
    assert [r["passed"] for r in rep] == [True, True]
    strict = expect(dirty, [{"rule": "not_null", "column": "status"}]).collect()
    assert strict[0]["passed"] is False


def test_passing_rules_pass(spark, dirty):
    rep = expect(
        dirty,
        [
            {"rule": "not_null", "column": "id"},
            {"rule": "in_range", "column": "score", "lo": -100.0, "hi": 1000.0},
            {"rule": "unique", "columns": ["id", "status"]},
        ],
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)


def test_violations_rows(spark, dirty, ref):
    bad_status = violations(
        dirty, {"rule": "accepted_values", "column": "status", "values": ["ok"]}
    )
    assert sorted(r["status"] for r in bad_status.collect()) == ["bad", "meh"]
    dup = violations(dirty, {"rule": "unique", "columns": ["id"]})
    assert sorted(r["id"] for r in dup.collect()) == [2, 2]
    orphans = violations(
        dirty, {"rule": "foreign_key", "column": "id", "ref": ref, "ref_column": "rid"}
    )
    assert sorted(r["id"] for r in orphans.collect()) == [4, 5]


def test_rule_validation(spark, dirty):
    with pytest.raises(ValueError, match="unknown rule"):
        expect(dirty, [{"rule": "nope", "column": "id"}])
    with pytest.raises(ValueError, match="needs a 'column'"):
        expect(dirty, [{"rule": "not_null"}])
    with pytest.raises(ValueError, match="non-empty 'columns'"):
        expect(dirty, [{"rule": "unique", "columns": []}])
    with pytest.raises(ValueError, match="at least one bound"):
        expect(dirty, [{"rule": "in_range", "column": "score"}])
    with pytest.raises(ValueError, match="'ref' and 'ref_column'"):
        expect(dirty, [{"rule": "foreign_key", "column": "id"}])


def test_row_level_rules_share_one_scan(spark, dirty):
    # 4 row-level rules -> the report plan contains exactly ONE
    # aggregate over the source (the single-pass contract); n_rules
    # rows come back without n_rules scans
    rep = expect(dirty, RULES[:1] + RULES[2:])  # drop 'unique'
    assert rep.count() == 4


def test_quantile_between_rule(spark):
    """Distribution-level expectation via DDSketch: p50/p99 bounds,
    one sketch build per (column, alpha) shared across rules,
    all-or-nothing violations, open bounds, validation, and the
    violations() refusal."""
    import numpy as np
    from pyspark.sql import Row

    rng = np.random.default_rng(5)
    vals = np.exp(rng.normal(3.0, 1.0, 3000))
    df = spark.createDataFrame([Row(v=float(x)) for x in vals])
    xs = np.sort(vals)
    p50 = float(xs[int(0.5 * (len(xs) - 1))])
    p99 = float(xs[int(np.floor(0.99 * (len(xs) - 1)))])
    rules = [
        {"rule": "quantile_between", "column": "v", "q": 0.5,
         "lo": p50 * 0.95, "hi": p50 * 1.05},
        {"rule": "quantile_between", "column": "v", "q": 0.99,
         "hi": p99 * 0.5},  # deliberately failing, open lo
        {"rule": "quantile_between", "column": "v", "q": 0.99,
         "lo": p99 * 0.9},  # open hi, passes
    ]
    rows = expect(df, rules).collect()
    assert rows[0]["passed"] and rows[0]["n_violations"] == 0
    assert not rows[1]["passed"] and rows[1]["n_violations"] == 3000
    assert rows[2]["passed"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        expect(df, [{"rule": "quantile_between", "column": "v", "q": 1.5, "lo": 0}])
    with _pytest.raises(ValueError):
        expect(df, [{"rule": "quantile_between", "column": "v", "q": 0.5}])
    with _pytest.raises(ValueError):
        violations(df, {"rule": "quantile_between", "column": "v", "q": 0.5, "lo": 0})
