"""Data-quality expectations: declarative rules evaluated in as few
distributed passes as the rule mix allows, returning a per-rule
violation report — the contract check every ingest runs before a
table is allowed into a 100-TB training pipeline.

Rule vocabulary (plain dicts, dbt/Great-Expectations-shaped):

- ``{"rule": "not_null", "column": c}``
- ``{"rule": "unique", "columns": [c, ...]}`` — duplicated rows
  beyond the first of each group count as violations
  (n_rows − n_distinct)
- ``{"rule": "accepted_values", "column": c, "values": [...]}``
- ``{"rule": "in_range", "column": c, "lo": x, "hi": y}`` — either
  bound may be None (open-ended)
- ``{"rule": "matches", "column": c, "pattern": regex}``
- ``{"rule": "foreign_key", "column": c, "ref": DataFrame,
  "ref_column": rc}`` — values absent from the reference column
- ``{"rule": "quantile_between", "column": c, "q": 0.99, "lo": x,
  "hi": y, "alpha": 0.01}`` — a DISTRIBUTION-level expectation ("p99
  latency must sit in [lo, hi]"), evaluated from a DDSketch
  (operators/ddsketch.py) so the check costs one integer aggregate,
  carries the sketch's ±alpha relative-error contract, and never
  sorts the column; either bound may be None. Violations are all-or-
  nothing (0 or n_rows): the expectation is about the distribution,
  not individual rows

NULL semantics follow the dbt convention: only ``not_null`` fails on
NULL; every other rule passes NULL rows (compose with ``not_null``
when NULLs are themselves violations), so each rule measures exactly
one thing.

Execution shape (the scale contract):
- ALL row-level rules (not_null / accepted_values / in_range /
  matches) fold into ONE aggregate over ONE scan — a table with 40
  row-level expectations costs one pass, not 40;
- each ``unique`` rule is one count-distinct aggregate (its own
  shuffle is irreducible);
- each ``foreign_key`` rule is one left join against the distinct
  reference keys (AQE broadcasts small dimensions on its own);
- the report itself is n_rules rows assembled driver-side from 1-row
  aggregates — bounded by construction.

Reference parity note: the reference (src/hyper.erl) has no
data-quality layer; this is engine surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect", "violations"]

_ROW_LEVEL = {"not_null", "accepted_values", "in_range", "matches"}


def _row_violation_cond(rule: dict) -> Column:
    kind = rule["rule"]
    c = F.col(rule["column"])
    if kind == "not_null":
        return c.isNull()
    if kind == "accepted_values":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if kind == "in_range":
        lo, hi = rule.get("lo"), rule.get("hi")
        if lo is None and hi is None:
            raise ValueError("in_range needs at least one bound")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
        return c.isNotNull() & cond
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown row-level rule {kind!r}")


def _target(rule: dict) -> str:
    if rule["rule"] == "unique":
        return ",".join(rule["columns"])
    return rule["column"]


def _validate(rules: Sequence[dict]) -> list[dict]:
    rules = [dict(r) for r in rules]
    for r in rules:
        kind = r.get("rule")
        if kind in _ROW_LEVEL or kind == "foreign_key":
            if "column" not in r:
                raise ValueError(f"rule {kind!r} needs a 'column'")
        elif kind == "quantile_between":
            if "column" not in r or "q" not in r:
                raise ValueError(
                    "rule 'quantile_between' needs 'column' and 'q'"
                )
            if not 0.0 <= float(r["q"]) <= 1.0:
                raise ValueError("'q' must be within [0, 1]")
            if r.get("lo") is None and r.get("hi") is None:
                raise ValueError(
                    "rule 'quantile_between' needs at least one bound"
                )
        elif kind == "unique":
            if not r.get("columns"):
                raise ValueError("rule 'unique' needs non-empty 'columns'")
        else:
            raise ValueError(f"unknown rule {kind!r}")
        if kind == "foreign_key" and (
            "ref" not in r or "ref_column" not in r
        ):
            raise ValueError("rule 'foreign_key' needs 'ref' and 'ref_column'")
    return rules


def expect(
    df: DataFrame, rules: Sequence[dict], max_frac: float = 0.0
) -> DataFrame:
    """Evaluate ``rules`` against ``df``: DataFrame[rule, target,
    n_rows, n_violations, violation_frac, passed] in the order given.

    ``passed`` is ``violation_frac <= max_frac`` (a rule-level
    ``max_frac`` key overrides the global one) — exact-zero by
    default, tolerance-based for expectations like "under 0.1% bad
    rows is acceptable".
    """
    rules = _validate(rules)
    spark = df.sparkSession

    row_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] in _ROW_LEVEL]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in row_rules:
        aggs.append(
            F.sum(_row_violation_cond(r).cast("long")).alias(f"__v{i}")
        )
    base = df.agg(*aggs).collect()[0]
    n_rows = int(base["__n"])

    counts: dict[int, int] = {i: int(base[f"__v{i}"] or 0) for i, _ in row_rules}
    for i, r in enumerate(rules):
        if r["rule"] == "unique":
            cols = [F.col(c) for c in r["columns"]]
            got = df.agg(
                F.count(F.lit(1)).alias("__n"),
                F.countDistinct(F.struct(*cols)).alias("__d"),
            ).collect()[0]
            counts[i] = int(got["__n"]) - int(got["__d"])
        elif r["rule"] == "foreign_key":
            c, ref, rc = r["column"], r["ref"], r["ref_column"]
            refk = ref.select(F.col(rc).alias("__ref")).distinct()
            got = (
                df.filter(F.col(c).isNotNull())
                .join(refk, on=F.col(c) == F.col("__ref"), how="left")
                .agg(F.sum(F.col("__ref").isNull().cast("long")).alias("__v"))
                .collect()[0]
            )
            counts[i] = int(got["__v"] or 0)

    # quantile rules: ONE DDSketch build per distinct (column, alpha),
    # every q over that column evaluated from the same bucket table
    q_rules = [
        (i, r) for i, r in enumerate(rules) if r["rule"] == "quantile_between"
    ]
    if q_rules:
        from hyper_spark.operators.ddsketch import dd_by, dd_quantiles

        by_build: dict[tuple, list] = {}
        for i, r in q_rules:
            by_build.setdefault(
                (r["column"], float(r.get("alpha", 0.01))), []
            ).append((i, r))
        for (col, alpha), group in by_build.items():
            qs = sorted({float(r["q"]) for _, r in group})
            ests = {
                row["q"]: row["est"]
                for row in dd_quantiles(
                    dd_by(df, [], col, alpha), qs, [], alpha
                ).collect()
            }
            for i, r in group:
                est = ests.get(float(r["q"]))
                lo, hi = r.get("lo"), r.get("hi")
                ok = est is not None
                if ok and lo is not None:
                    ok = est >= lo
                if ok and hi is not None:
                    ok = est <= hi
                counts[i] = 0 if ok else n_rows

    out = []
    for i, r in enumerate(rules):
        v = counts[i]
        frac = v / n_rows if n_rows else 0.0
        limit = float(r.get("max_frac", max_frac))
        out.append(
            (r["rule"], _target(r), n_rows, v, float(frac), bool(frac <= limit))
        )
    return spark.createDataFrame(
        out,
        "rule string, target string, n_rows bigint, n_violations bigint, "
        "violation_frac double, passed boolean",
    )


def violations(df: DataFrame, rule: dict) -> DataFrame:
    """The offending rows for ONE rule — the debugging companion to
    ``expect`` (which only counts). For ``unique``, every row of a
    duplicated group is returned (including the 'first': which row is
    original is not well-defined on an unordered table)."""
    (r,) = _validate([rule])
    kind = r["rule"]
    if kind in _ROW_LEVEL:
        return df.filter(_row_violation_cond(r))
    if kind == "unique":
        from pyspark.sql import Window

        w = Window.partitionBy(*[F.col(c) for c in r["columns"]])
        return (
            df.withColumn("__c", F.count(F.lit(1)).over(w))
            .filter(F.col("__c") > 1)
            .drop("__c")
        )
    if kind == "foreign_key":
        refk = r["ref"].select(F.col(r["ref_column"]).alias("__ref")).distinct()
        return (
            df.filter(F.col(r["column"]).isNotNull())
            .join(refk, on=F.col(r["column"]) == F.col("__ref"), how="anti")
        )
    if kind == "quantile_between":
        raise ValueError(
            "quantile_between is a distribution-level rule — no single "
            "row violates it; inspect the distribution with "
            "dd_quantiles_by or quantiles_by instead"
        )
    raise ValueError(f"unknown rule {kind!r}")
