"""VERDICT r04 #7 A/B: close (or root-cause) the 4x grouped gap vs
native DataSketches on the sf16 role×tool sketch build.

Candidates, all building p=14 xxhash64 sketches of conv_id grouped by
(role, tool) over the 74.5M-turn transcripts cache:

  explode      — the shipped default: JVM groupBy(keys, idx).max(rho),
                 one applyInPandas densify per group.
  partial      — the existing per-partition dense-register mapInPandas
                 combine (ships every raw (idx, rho) row through Arrow).
  explode_gid  — explode, but the agg keys are ONE xxhash64(gid) long
                 instead of two strings; labels join back from a
                 broadcast 23-row map afterwards. Isolates how much of
                 the explode cost is string-key hash-agg traffic.

Reference points (BENCH §6, same data/box): ours-explode 2.87 s,
approx_count_distinct 0.71 s, DataSketches hll_sketch_agg 0.77 s.

Run: python tools/bench_grouped_hll.py [reps]
Env: GROUPED_HLL_SF_DIR (default .data/transcripts_sf16.0),
     GROUPED_HLL_CPUS (32).
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
    "GROUPED_HLL_SF_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".data", "transcripts_sf16.0"),
)
CPUS = int(os.environ.get("GROUPED_HLL_CPUS", "32"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
P = 14


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def main() -> None:
    from hyper_spark.operators.hll_agg import sketch_by
    from hyper_spark.functions.hashing import hll_prepare

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-grouped-hll")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    try:
        df = spark.read.parquet(DATA)
        n = df.count()
        print(f"rows: {n}", flush=True)

        def timed(name, make_plan):
            times, nrows = [], None
            for _ in range(REPS):
                _wait_quiet()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                nrows = len(make_plan().collect())
                times.append(time.perf_counter() - t0)
            results[name] = {
                "sec": round(min(times), 2),
                "reps": [round(t, 2) for t in times],
                "groups": nrows,
                "m_rows_per_s": round(n / min(times) / 1e6, 1),
            }
            print(f"{name}: {results[name]}", flush=True)

        timed(
            "explode",
            lambda: sketch_by(
                df, ["role", "tool"], "conv_id", p=P,
                strategy="explode", hash_fn="xxhash64",
            ),
        )
        timed(
            "partial",
            lambda: sketch_by(
                df, ["role", "tool"], "conv_id", p=P,
                strategy="partial", hash_fn="xxhash64",
            ),
        )

        def gid_plan():
            idx, rho = hll_prepare(F.col("conv_id"), P, "xxhash64")
            prepared = df.filter(F.col("conv_id").isNotNull()).select(
                F.xxhash64("role", "tool").alias("gid"),
                "role", "tool",
                idx.alias("idx"), rho.alias("rho"),
            )
            regs = prepared.groupBy("gid", "idx").agg(F.max("rho").alias("rho"))
            labels = prepared.select("gid", "role", "tool").distinct()
            # densify per gid (reuse the library's applyInPandas shape
            # through sketch-less groupBy for timing parity: the blob
            # build is identical work to _densify_fn)
            import numpy as np
            import pandas as pd

            def densify(pdf: pd.DataFrame) -> pd.DataFrame:
                m = 1 << P
                out = np.zeros(m, dtype=np.uint8)
                np.maximum.at(
                    out,
                    pdf["idx"].to_numpy(dtype=np.int64),
                    pdf["rho"].to_numpy(dtype=np.uint8),
                )
                return pd.DataFrame(
                    {"gid": [pdf["gid"].iloc[0]], "p": [P],
                     "registers": [bytearray(out.tobytes())]}
                )

            sk = regs.groupBy("gid").applyInPandas(
                densify, "gid long, p int, registers binary"
            )
            return sk.join(F.broadcast(labels), on="gid").select(
                "role", "tool", "p", "registers"
            )

        timed("explode_gid", gid_plan)
    finally:
        spark.stop()
    print(json.dumps({"metric": "grouped_hll_ab", "rows": n, "p": P,
                      "cpus": CPUS, "results": results}))


if __name__ == "__main__":
    main()
