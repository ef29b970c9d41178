"""Table access layer.

Local/test profile reads driver-generated parquet (``/root/testdata/sf*``,
see TESTDATA.md). Production profile is any DataFrameReader-compatible
catalog table — Iceberg via ``spark.read.format("iceberg")`` when a
runtime jar + catalog are configured (none in this sandbox), which brings
partition pruning and snapshot isolation for free; the operators only ever
see a DataFrame, so the source swap is a config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one table. ``name`` may also be a catalog table (contains a dot)
    or an explicit path, keeping the Iceberg profile a drop-in."""
    if "." in name and not name.endswith(".parquet"):
        return spark.read.table(name)
    path = name if name.endswith(".parquet") else f"{sf_dir}/{name}.parquet"
    # parquet-on-disk WINS over a same-named catalog table/temp view:
    # the catalog fallback exists for save_bucketed outputs (which have
    # no parquet path), never to shadow an explicitly requested sf_dir
    if os.path.exists(path):
        return spark.read.parquet(path)
    if "/" not in name and spark.catalog.tableExists(name):
        return spark.read.table(name)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    out = {}
    for name in TESTDATA_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``keys``
    into the session catalog — the co-located-join layout: two tables
    bucketed the same way on the join key join WITHOUT any Exchange
    (plan-asserted in tests), the "pre-shuffle once, join many times"
    strategy a 100 TB star schema runs on. Bucketing only exists for
    catalog tables (``saveAsTable``), not bare parquet paths; sorted
    buckets additionally let Spark skip the sort of a sort-merge join.

    Read back with ``load_table(spark, table)`` (plain table name, no
    dot needed for the default catalog's current database)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
