"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, compare row count, column names, and
order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
(query names restrict the run; the entry smoke-check runs only on a
full, unfiltered pass)
"""

from __future__ import annotations

import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    """Tag int vs float so the compare is as strict as the driver's value
    hash (DuckDB HUGEINT -> float64 vs Spark bigint was masked by 2 == 2.0
    in round 2)."""
    if hasattr(v, "item"):  # numpy scalar from DuckDB .df()
        v = v.item()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        v = round(v, 6)
        return ("f", "NaN" if math.isnan(v) else v)
    return ("o", v)


def normalize(rows, cols):
    out = []
    for row in rows:
        out.append(tuple(_canon(row[c]) for c in cols))
    return sorted(out, key=repr)


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            got = normalize(srows, scols)
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows (no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        dcols = sorted(ddf.columns)
        drows = [dict(zip(ddf.columns, r)) for r in ddf.itertuples(index=False)]
        want = normalize(drows, dcols)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
        elif got != want:
            diff = [
                (g, w) for g, w in zip(got, want) if g != w
            ][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    # entry smoke (full pass only)
    if not only:
        try:
            edf = entrymod.entry(spark)
            n = len(edf.collect())
            print(f"OK   entry: {n} rows, schema {edf.schema.simpleString()}")
        except Exception as e:
            print(f"FAIL entry: {type(e).__name__}: {e}")
            failures += 1
    spark.stop()
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(qs) - failures}/{len(qs)} queries match")
    return failures


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
