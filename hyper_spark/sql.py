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

__all__ = ["register_sql_functions"]


def register_sql_functions(spark: SparkSession, prefix: str = "") -> list[str]:
    """Register the sketch scalar functions for SQL use; returns the
    registered names. ``prefix`` namespaces them (e.g. ``hs_``). All are
    Arrow-batched pandas UDFs over sketch blobs — reduced data only,
    never raw rows. Functions:

    - ``hll_cardinality(p, registers) -> double``
    - ``hll_union2(registers_a, registers_b) -> binary`` (same-p dense
      merge; NULL inputs pass the other side through — fold-friendly)
    - ``hll_to_json(p, registers) -> string`` /
      ``hll_json_p(doc) -> int`` / ``hll_json_registers(doc) -> binary``
      (reference-compatible envelope)
    - ``hll_fold(p, registers, new_p) -> binary`` (reduce_precision)
    - ``hll_error_bound(p) -> double`` (1.04/sqrt(2^p))
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

    @F.pandas_udf(DoubleType())
    def _bound(p: pd.Series) -> pd.Series:
        from hyper_spark.kernel.hll import error_bound

        return pd.Series([error_bound(int(x)) for x in p])

    fns = {
        "hll_cardinality": cardinality_col,
        "hll_union2": _union2,
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
