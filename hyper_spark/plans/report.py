"""Physical-plan introspection as a public API: the questions that
decide 100-TB behavior, answered from the executed plan instead of a
cluster bill.

``plan_report`` parses the executed (post-AQE-planning) physical plan
into a small dict: what each scan reads (column pruning), what reached
the parquet reader (predicate/partition pushdown), how many exchanges
(shuffles/broadcasts) the plan pays, how wide the whole-stage-codegen
spans are, and where Python stages sit. ``assert_plan`` turns those
into CI-able guards — the repo's own plan-hygiene tests
(tests/test_plan_hygiene.py) are the in-house user of this contract.

Caveats (documented behavior, not bugs):
- AQE re-plans at RUNTIME: exchange reuse and skew splits appear only
  after an action. Report on the plan you are about to run for static
  hygiene (pruning/pushdown/codegen), or run the action first if you
  need post-AQE shapes (e.g. ReusedExchange).
- The parse reads Spark's plan rendering; it tracks the strings Spark
  4 emits (FileScan / ReadSchema / PushedFilters / PartitionFilters /
  Exchange / WholeStageCodegen / *EvalPython / *InPandas).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["executed_plan", "plan_report", "assert_plan"]

_PY_STAGES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "MapInArrow",
)


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan as text (what `.explain` prints for
    mode='simple', pre-execution)."""
    return df._jdf.queryExecution().executedPlan().toString()


def _columns_of(schema_fragment: str) -> list[str]:
    # ReadSchema: struct<a:bigint,b:struct<x:int>,c:string> — top-level
    # field names only (nested angle brackets skipped by depth count)
    m = re.search(r"struct<(.*)>?", schema_fragment)
    if not m:
        return []
    body = m.group(1)
    out, depth, token = [], 0, []
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(token))
            token = []
            continue
        token.append(ch)
    if token:
        out.append("".join(token))
    return [t.split(":", 1)[0].strip() for t in out if ":" in t]


def plan_report(df: DataFrame) -> dict:
    """Summarize the executed plan:

    - ``scans``: one entry per FileScan with ``columns`` (the pruned
      read schema), ``pushed_filters`` and ``partition_filters`` (raw
      bracket contents; empty string = nothing pushed);
    - ``n_exchanges`` (shuffles), ``n_broadcast_exchanges``;
    - ``n_wholestage_codegen`` spans;
    - ``python_stages``: the Python/Arrow stage node names in plan
      order (empty = the whole plan runs JVM-side);
    - ``joins``: physical join node names in plan order.
    """
    plan = executed_plan(df)
    scans = []
    for line in plan.splitlines():
        if "FileScan" not in line:
            continue
        entry: dict = {"columns": [], "pushed_filters": "", "partition_filters": ""}
        m = re.search(r"ReadSchema:\s*(struct<[^\n]*)", line)
        if m:
            entry["columns"] = _columns_of(m.group(1))
        m = re.search(r"PushedFilters:\s*\[([^\]]*)\]", line)
        if m:
            entry["pushed_filters"] = m.group(1).strip()
        m = re.search(r"PartitionFilters:\s*\[([^\]]*)\]", line)
        if m:
            entry["partition_filters"] = m.group(1).strip()
        scans.append(entry)
    python_stages = []
    for line in plan.splitlines():
        for name in _PY_STAGES:
            if name in line:
                python_stages.append(name)
                break
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    return {
        "scans": scans,
        "n_exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "n_broadcast_exchanges": plan.count("BroadcastExchange"),
        "n_wholestage_codegen": plan.count("*("),
        "python_stages": python_stages,
        "joins": joins,
    }


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    no_python: bool = False,
    scan_columns_at_most: int | None = None,
    require_pushed_filters: bool = False,
) -> dict:
    """Guard a plan's scale-critical properties; raises AssertionError
    with the offending report, returns the report when everything
    holds. Use in CI next to result-correctness tests."""
    rep = plan_report(df)
    if max_exchanges is not None and rep["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan pays {rep['n_exchanges']} shuffles "
            f"(allowed {max_exchanges}): {rep}"
        )
    if no_python and rep["python_stages"]:
        raise AssertionError(
            f"plan has Python stages {rep['python_stages']}: {rep}"
        )
    if scan_columns_at_most is not None:
        for s in rep["scans"]:
            if len(s["columns"]) > scan_columns_at_most:
                raise AssertionError(
                    f"scan reads {len(s['columns'])} columns "
                    f"{s['columns']} (allowed {scan_columns_at_most}): {rep}"
                )
    if require_pushed_filters and not any(
        s["pushed_filters"] for s in rep["scans"]
    ):
        raise AssertionError(f"no filter reached any scan: {rep}")
    return rep
