"""Spark-pipeline vs local-kernel differential tests (SURVEY.md §5 layer 2:
the model is the reference's cross-backend test ``backend_t``,
hyper_test.erl:85-149 — same values through independent implementations
must yield identical sketch bytes)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hyper_spark.functions.hashing import hll_prepare
from hyper_spark.kernel.hll import HllSketch, error_bound, hash_value
from hyper_spark.operators.hll_agg import (
    approx_distinct,
    cardinality_col,
    intersect_card,
    sketch_by,
    sketch_collect,
    union_sketches,
)

P = 14


def test_hash_exprs_match_kernel(spark):
    values = [f"value-{i}" for i in range(2000)] + ["", "☃ unicode", "a b c"]
    df = spark.createDataFrame([Row(v=v) for v in values])
    for p in (4, 11, 14, 16):
        idx, rho = hll_prepare(F.col("v"), p)
        got = df.select("v", idx.alias("idx"), rho.alias("rho")).collect()
        for r in got:
            k_idx, k_rho = hash_value(r["v"].encode("utf-8"), p)
            assert (r["idx"], r["rho"]) == (k_idx, k_rho), (p, r["v"])


def test_hash_exprs_stay_jvm_native(spark):
    """The per-row hot path must not cross into Python: no BatchEvalPython /
    ArrowEvalPython nodes before the aggregation boundary (SURVEY.md §7)."""
    df = spark.createDataFrame([Row(v="x")])
    idx, rho = hll_prepare(F.col("v"), P)
    plan = df.select(idx.alias("idx"), rho.alias("rho"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # whole-stage codegen shows as "WholeStageCodegen" or the "*(n)" prefix
    assert "WholeStageCodegen" in plan or "*(" in plan


@pytest.mark.parametrize("strategy", ["explode", "partial"])
def test_global_sketch_matches_kernel_bytes(spark, strategy):
    values = [f"user-{i}" for i in range(5000)]
    df = spark.createDataFrame([Row(v=v) for v in values]).repartition(8)
    sk_df = sketch_by(df, [], "v", P, strategy=strategy)
    spark_sketch = sketch_collect(sk_df)
    kernel_sketch = HllSketch(P).insert_many([v.encode() for v in values])
    assert spark_sketch == kernel_sketch  # byte-exact, both strategies


def test_strategies_agree(spark):
    df = spark.createDataFrame([Row(v=f"u{i % 777}") for i in range(3000)]).repartition(7)
    a = sketch_collect(sketch_by(df, [], "v", 12, strategy="explode"))
    b = sketch_collect(sketch_by(df, [], "v", 12, strategy="partial"))
    assert a == b


@pytest.mark.parametrize("strategy", ["explode", "partial"])
def test_grouped_sketch_matches_kernel(spark, strategy):
    rows = [Row(g=f"g{i % 5}", v=f"val-{i % 1200}-{i % 7}") for i in range(6000)]
    df = spark.createDataFrame(rows).repartition(8)
    sk = sketch_by(df, ["g"], "v", 12, strategy=strategy).collect()
    assert len(sk) == 5
    by_group = {}
    for r in rows:
        by_group.setdefault(r.g, set()).add(r.v)
    for row in sk:
        kern = HllSketch(12).insert_many(sorted(v.encode() for v in by_group[row["g"]]))
        assert bytes(row["registers"]) == kern.to_bytes(), row["g"]


def test_estimate_within_bound_events(spark, sf_correct):
    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    est = approx_distinct(events, [], "user_id", P).collect()[0]["estimate"]
    exact = events.select(F.countDistinct("user_id")).collect()[0][0]
    assert abs(est - exact) / exact <= error_bound(P), (est, exact)


def test_multi_sketch_by_matches_per_column(spark, sf_correct):
    """N metrics in one scan: byte-identical to N separate sketch_by
    calls, and the plan reads the source exactly once."""
    from hyper_spark.operators.hll_agg import multi_sketch_by

    events = spark.read.parquet(f"{sf_correct}/events.parquet")
    p = 12
    cols = {"users": "user_id", "types": "event_type", "ids": "event_id"}
    multi = multi_sketch_by(events, [], cols, p)
    got = {r["metric"]: bytes(r["registers"]) for r in multi.collect()}
    for tag, c in cols.items():
        want = bytes(
            sketch_by(events, [], c, p).collect()[0]["registers"]
        )
        assert got[tag] == want, tag
    # after execution AQE prints final + initial sections — count scans
    # in the final section only
    plan = multi._jdf.queryExecution().executedPlan().toString()
    final_section = plan.split("== Initial Plan ==")[0]
    assert final_section.count("FileScan") == 1, plan

    # grouped variant agrees with grouped sketch_by
    multi_g = multi_sketch_by(events, ["event_type"], {"users": "user_id"}, p)
    got_g = {
        r["event_type"]: bytes(r["registers"]) for r in multi_g.collect()
    }
    want_g = {
        r["event_type"]: bytes(r["registers"])
        for r in sketch_by(events, ["event_type"], "user_id", p).collect()
    }
    assert got_g == want_g


def test_fast_hash_path(spark):
    """hash_fn='xxhash64': estimates stay in bound (any well-mixed
    32-bit head), registers differ from sha1 (the param takes effect),
    rollup losslessness is hash-independent, and an unknown hash_fn is
    an explicit error."""
    import pytest as _pytest

    rows = [Row(day=i % 5, v=f"user-{i}") for i in range(30000)]
    df = spark.createDataFrame(rows).repartition(6)
    p = 12
    est = approx_distinct(df, [], "v", p, hash_fn="xxhash64").collect()[0]["estimate"]
    assert abs(est - 30000) / 30000 <= error_bound(p), est
    sha = sketch_collect(sketch_by(df, [], "v", p))
    xxh = sketch_collect(sketch_by(df, [], "v", p, hash_fn="xxhash64"))
    assert sha.registers.tobytes() != xxh.registers.tobytes()
    # union algebra is hash-independent: per-day rollup == direct, both hashes
    per_day = sketch_by(df, ["day"], "v", p, hash_fn="xxhash64")
    rolled = sketch_collect(union_sketches(per_day, []))
    assert rolled.registers.tobytes() == xxh.registers.tobytes()
    with _pytest.raises(ValueError):
        sketch_by(df, [], "v", p, hash_fn="md5")


def test_union_rollup_lossless(spark):
    """Sketch per sub-group, union up == sketch of the whole — the
    prop_union property (hyper_test.erl:486-496) at DataFrame level."""
    rows = [Row(day=i % 7, v=f"u{i % 900}") for i in range(4000)]
    df = spark.createDataFrame(rows).repartition(6)
    per_day = sketch_by(df, ["day"], "v", 12)
    rolled = sketch_collect(union_sketches(per_day, []))
    direct = sketch_collect(sketch_by(df, [], "v", 12))
    assert rolled == direct


def test_union_mixed_precision(spark):
    rows_a = [Row(v=f"a{i}") for i in range(500)]
    rows_b = [Row(v=f"b{i}") for i in range(500)]
    a = sketch_by(spark.createDataFrame(rows_a), [], "v", 12)
    b = sketch_by(spark.createDataFrame(rows_b), [], "v", 14)
    merged = sketch_collect(union_sketches(a.unionByName(b), []))
    assert merged.p == 12
    kern = (
        HllSketch(12).insert_many([r.v.encode() for r in rows_a]).merge(
            HllSketch(14).insert_many([r.v.encode() for r in rows_b]).reduce_precision(12)
        )
    )
    assert merged == kern


def test_cardinality_col_matches_kernel(spark):
    df = spark.createDataFrame([Row(v=f"x{i}") for i in range(2000)])
    sk_df = sketch_by(df, [], "v", 13)
    est = sk_df.select(cardinality_col("p", "registers").alias("e")).collect()[0]["e"]
    kern = HllSketch(13).insert_many([f"x{i}".encode() for i in range(2000)])
    assert est == pytest.approx(kern.cardinality())


def test_intersect_card_df(spark):
    left = spark.createDataFrame([Row(v=str(i)) for i in range(0, 10000)])
    right = spark.createDataFrame([Row(v=str(i)) for i in range(5000, 15000)])
    a = sketch_by(left, [], "v", 13)
    b = sketch_by(right, [], "v", 13)
    got = intersect_card(a, b).collect()[0]["intersect_card"]
    assert abs(got - 5000) / 5000 <= 0.05


def test_register_table_driver_assembly_matches(spark):
    from hyper_spark.operators.hll_agg import (
        collect_sketches_from_registers,
        register_table,
    )

    rows = [Row(g=f"g{i % 3}", v=f"val-{i % 500}") for i in range(4000)]
    df = spark.createDataFrame(rows).repartition(8)
    regs = register_table(df, ["g"], "v", 12)
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # 100% JVM
    got = collect_sketches_from_registers(regs, ["g"], 12)
    direct = {r["g"]: bytes(r["registers"]) for r in sketch_by(df, ["g"], "v", 12).collect()}
    assert {k[0]: v.to_bytes() for k, v in got.items()} == direct


def test_null_values_skipped(spark):
    """NULLs never crash the pipeline and never register (ADVICE r01:
    F.sha1(NULL) -> NULL idx/rho previously poisoned the densify)."""
    rows = [Row(g="a", v=f"x{i}") for i in range(300)] + [
        Row(g="a", v=None),
        Row(g="b", v=None),  # group with ONLY nulls: no output row
    ]
    df = spark.createDataFrame(rows).repartition(4)
    sk = sketch_by(df, ["g"], "v", 12).collect()
    assert {r["g"] for r in sk} == {"a"}
    kern = HllSketch(12).insert_many([f"x{i}".encode() for i in range(300)])
    assert bytes(sk[0]["registers"]) == kern.to_bytes()
    # partial strategy too
    glob = sketch_collect(sketch_by(df, [], "v", 12, strategy="partial"))
    assert glob == kern


def test_null_values_skipped_xxhash64(spark):
    """ADVICE r03 (medium): xxhash64(NULL) returns the seed, not NULL —
    the hash expressions must gate on the value so NULLs are skipped
    under every hash_fn. An all-NULL column estimates 0, and
    multi_sketch_by stays byte-identical to per-column sketch_by."""
    from hyper_spark.operators.hll_agg import (
        cardinality_col,
        multi_sketch_by,
    )

    rows = [Row(a=f"x{i}", b=None) for i in range(200)]
    df = spark.createDataFrame(rows, "a string, b string").repartition(4)
    multi = multi_sketch_by(
        df, [], {"a": "a", "b": "b"}, 12, hash_fn="xxhash64"
    )
    ests = {
        r["metric"]: r["est"]
        for r in multi.select(
            "metric", cardinality_col("p", "registers").alias("est")
        ).collect()
    }
    assert ests.get("b", 0.0) == 0.0  # not ~1.0 from the seed register
    direct = sketch_by(df, [], "a", 12, hash_fn="xxhash64").collect()[0]
    got_a = {r["metric"]: bytes(r["registers"]) for r in multi.collect()}["a"]
    assert got_a == bytes(direct["registers"])


@pytest.mark.parametrize("strategy", ["explode", "partial"])
def test_sparse_encoding_spark(spark, strategy):
    """sketch_by(encoding='sparse'/'auto') emits hyper_bisect pair blobs
    for low-fill groups; every consumer decodes them; promotion to dense
    register arrays is byte-identical to a dense-encoded build."""
    rows = [Row(g=f"g{i % 4}", v=f"val-{i % 40}") for i in range(2000)]
    df = spark.createDataFrame(rows).repartition(6)
    dense = {
        r["g"]: bytes(r["registers"])
        for r in sketch_by(df, ["g"], "v", 14, strategy=strategy).collect()
    }
    sparse = {
        r["g"]: bytes(r["registers"])
        for r in sketch_by(
            df, ["g"], "v", 14, strategy=strategy, encoding="auto"
        ).collect()
    }
    for g, blob in sparse.items():
        # ~10 distinct values/group at p=14: sparse pairs, tiny
        assert len(blob) % 3 == 0 and len(blob) < (1 << 14)
        assert HllSketch.from_blob(14, blob).to_bytes() == dense[g]
    # estimator + union consume sparse directly
    sk = sketch_by(df, ["g"], "v", 14, strategy=strategy, encoding="auto")
    ests = sk.select(cardinality_col("p", "registers").alias("e")).collect()
    assert all(5 <= r["e"] <= 15 for r in ests)
    rolled = sketch_collect(union_sketches(sk, []))
    direct = sketch_collect(sketch_by(df, [], "v", 14))
    assert rolled == direct


def test_sparse_union_output_encoding(spark):
    rows = [Row(day=i % 3, v=f"u{i % 30}") for i in range(900)]
    df = spark.createDataFrame(rows)
    per_day = sketch_by(df, ["day"], "v", 14, encoding="sparse")
    rolled_sparse = union_sketches(per_day, [], encoding="auto").collect()[0]
    assert len(bytes(rolled_sparse["registers"])) < (1 << 14)
    assert HllSketch.from_blob(14, bytes(rolled_sparse["registers"])) == (
        sketch_collect(sketch_by(df, [], "v", 14))
    )
