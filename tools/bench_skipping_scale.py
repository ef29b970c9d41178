"""Scale demonstration for the file-skipping index: 20M rows in 64
files, point-lookup via the persisted index vs the full-scan filter.

The quantity that matters for the 100-TB claim is the I/O ratio —
candidate files read / total files — because wall-clock at local scale
is dominated by fixed job overhead while at cluster scale it is
dominated by bytes scanned. Both are printed.

Run: python tools/bench_skipping_scale.py  (env: SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hyper_spark.operators.skipping import (  # noqa: E402
    build_file_index,
    file_candidates,
    point_lookup,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ROWS = int(os.environ.get("SKIP_BENCH_ROWS", str(20_000_000)))
N_FILES = 64


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-skipping-scale")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = os.path.join(tempfile.gettempdir(), "hyper_spark_skip_scale")
    data, idx_path = base + "/data", base + "/idx"
    t0 = time.perf_counter()
    (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("key"),
            F.xxhash64("id").alias("h"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        .repartition(N_FILES, "key")
        .write.mode("overwrite")
        .parquet(data)
    )
    t_write = time.perf_counter() - t0

    df = spark.read.parquet(data)
    t0 = time.perf_counter()
    build_file_index(df, "key", m_bits=1 << 22).write.mode("overwrite").parquet(
        idx_path
    )
    t_index = time.perf_counter() - t0
    idx = spark.read.parquet(idx_path)

    probes = [12345, 7_777_777, 19_999_999]

    def timed(fn):
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn()
            reps.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return min(reps), n

    t_full, n_full = timed(
        lambda: spark.read.parquet(data).filter(F.col("key").isin(probes)).count()
    )
    t_idx, n_idx = timed(
        lambda: point_lookup(spark, data, idx, "key", probes).count()
    )
    assert n_full == n_idx == len(probes), (n_full, n_idx)
    n_cand = file_candidates(idx, probes).count()

    size_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(data)
        for f in fs
    )
    idx_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(idx_path)
        for f in fs
    )
    print(
        json.dumps(
            {
                "rows": N_ROWS,
                "files": N_FILES,
                "data_mb": round(size_bytes / 1e6, 1),
                "index_mb": round(idx_bytes / 1e6, 1),
                "write_sec": round(t_write, 2),
                "index_build_sec": round(t_index, 2),
                "full_scan_lookup_sec": round(t_full, 3),
                "indexed_lookup_sec": round(t_idx, 3),
                "speedup": round(t_full / t_idx, 2),
                "candidate_files": n_cand,
                "io_fraction": round(n_cand / N_FILES, 4),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
