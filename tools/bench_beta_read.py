"""Grouped approx-distinct READ-PATH A/B: LogLog-Beta JVM aggregate vs
the blob pipeline, on the sf16 role×tool workload of
tools/bench_grouped_hll.py (74.5M turns, 23 groups, p=14, xxhash64).

  blob  — shipped default end-to-end: sketch_by (JVM register agg +
          applyInPandas densify to a 16 KiB blob per group) +
          cardinality_col (Arrow pandas estimate).
  beta  — register_table + beta_estimate_agg: the SAME register
          aggregate, then the estimate as one more whole-stage-codegen
          aggregate — no densify, no Arrow, no Python anywhere.

The two differ ONLY in the read side; both scan/hash/partial-agg
identically. Context (BENCH §6, same box/data): approx_count_distinct
0.71 s, native DataSketches 0.77 s, ours-explode sketch build 2.87 s.

Run: python tools/bench_beta_read.py [reps]
Env: BETA_SF_DIR (default .data/transcripts_sf16.0), BETA_CPUS (32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DATA = os.environ.get(
    "BETA_SF_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".data", "transcripts_sf16.0"),
)
CPUS = int(os.environ.get("BETA_CPUS", "32"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
P = 14


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def main() -> None:
    from hyper_spark.operators.hll_agg import (
        beta_estimate_agg,
        cardinality_col,
        register_table,
        sketch_by,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-beta-read")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def timed(name, make_plan):
        times, nrows = [], None
        for _ in range(REPS):
            _wait_quiet()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            nrows = make_plan().count()
            times.append(time.perf_counter() - t0)
        results[name] = {
            "sec": round(min(times), 2),
            "reps": [round(t, 2) for t in times],
            "rows_out": int(nrows),
        }
        print(f"{name}: {results[name]}", flush=True)

    try:
        df = spark.read.parquet(DATA)
        n = df.count()
        print(f"rows: {n}", flush=True)

        timed(
            "blob_sketchby_plus_cardinality_col",
            lambda: sketch_by(
                df, ["role", "tool"], "conv_id", P, hash_fn="xxhash64"
            ).select(
                "role", "tool",
                cardinality_col("p", "registers").alias("estimate"),
            ),
        )
        timed(
            "beta_register_agg",
            lambda: register_table(
                df, ["role", "tool"], "conv_id", P, hash_fn="xxhash64"
            )
            .groupBy("role", "tool")
            .agg(beta_estimate_agg(P).alias("estimate")),
        )

        # sanity: the two read paths answer within their estimators'
        # agreement on identical registers (same sketch, different
        # formula — assert both within 3% of each other)
        a = {
            (r["role"], r["tool"]): r["estimate"]
            for r in register_table(
                df, ["role", "tool"], "conv_id", P, hash_fn="xxhash64"
            )
            .groupBy("role", "tool")
            .agg(beta_estimate_agg(P).alias("estimate"))
            .collect()
        }
        b = {
            (r["role"], r["tool"]): r["estimate"]
            for r in sketch_by(
                df, ["role", "tool"], "conv_id", P, hash_fn="xxhash64"
            )
            .select(
                "role", "tool",
                cardinality_col("p", "registers").alias("estimate"),
            )
            .collect()
        }
        worst = max(
            abs(a[k] - b[k]) / max(b[k], 1.0) for k in b
        )
        print(f"estimator agreement worst rel diff: {worst:.4f}", flush=True)
        results["agreement_worst_rel_diff"] = {"value": round(worst, 4)}
    finally:
        spark.stop()
    print(json.dumps({"metric": "beta_read_ab", "rows": n, "cpus": CPUS,
                      "results": results}))


if __name__ == "__main__":
    main()
