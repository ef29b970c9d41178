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
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    out = {}
    for name in TESTDATA_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out
