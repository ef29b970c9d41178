"""sf16 scale rows for the sliding CMS and sliding Theta families over
the 74.5M-turn transcripts cache.

Workloads are the north star's own questions, windowed after the fact:
* sliding_cms: per-role tool heavy hitters — build the daily cell +
  candidate state once, then top-10 over 7d/30d/365d trailing windows
  from the state alone;
* sliding_theta: per-role distinct conversations — daily k-min state,
  trailing-window estimates, and the cross-range question (conv
  overlap between two adjacent 30-day months).

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache,
THP off. Run: python tools/bench_sliding_scale.py [cms theta]
Env: R5_SF_DIR (default .data/transcripts_sf16.0), R5_CPUS (32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("R5_SF_DIR", os.path.join(_REPO, ".data", "transcripts_sf16.0"))
CPUS = int(os.environ.get("R5_CPUS", "32"))
REPS = 2
T_REF = "2028-10-01 00:00:00"
WINDOWS = {"7d": "7 days", "30d": "30 days", "365d": "365 days"}


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def main() -> None:
    ops = sys.argv[1:] or ["cms", "theta"]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-sliding-scale")
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

    def timed(name, make_plan, reps=REPS):
        times, nrows = [], None
        for _ in range(reps):
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

        from hyper_spark.operators.sliding_cms import (
            sliding_cms_table,
            sliding_cms_topk,
        )
        from hyper_spark.operators.sliding_theta import (
            sliding_theta_estimates,
            sliding_theta_overlap,
            sliding_theta_table,
        )

        if "cms" in ops:
            timed(
                "sliding_cms_build_tool_by_role",
                lambda: sliding_cms_table(
                    df, "ts", ["role"], "tool", grain="1 day",
                    width=8192, k=16,
                )[0],
            )

            def cms_full():
                cells, cands = sliding_cms_table(
                    df, "ts", ["role"], "tool", grain="1 day",
                    width=8192, k=16,
                )
                return sliding_cms_topk(
                    cells, cands, ["role"], "tool", T_REF, WINDOWS, k=10,
                    params=(5, 8192, "xxhash64"),
                )

            timed("sliding_cms_build_plus_3window_topk", cms_full)
        if "theta" in ops:
            timed(
                "sliding_theta_build_conv_by_role",
                lambda: sliding_theta_table(
                    df, "ts", ["role"], "conv_id", k=4096, grain="1 day"
                ),
            )

            def theta_est():
                state = sliding_theta_table(
                    df, "ts", ["role"], "conv_id", k=4096, grain="1 day"
                )
                return sliding_theta_estimates(
                    state, ["role"], T_REF, WINDOWS, k=4096
                )

            timed("sliding_theta_build_plus_3window_est", theta_est)

            def theta_ov():
                state = sliding_theta_table(
                    df, "ts", ["role"], "conv_id", k=4096, grain="1 day"
                )
                return sliding_theta_overlap(
                    state, ["role"],
                    ("2028-08-01 00:00:00", "2028-08-31 00:00:00"),
                    ("2028-08-31 00:00:00", "2028-09-30 00:00:00"),
                    k=4096,
                )

            timed("sliding_theta_build_plus_month_overlap", theta_ov)
        if "dd" in ops:
            from pyspark.sql import functions as F

            from hyper_spark.operators.sliding_dd import (
                sliding_dd_drift,
                sliding_dd_quantiles,
                sliding_dd_table,
            )

            val = df.withColumn("turn_len", F.length("text").cast("double"))
            timed(
                "sliding_dd_build_len_by_role",
                lambda: sliding_dd_table(
                    val, "ts", ["role"], "turn_len", alpha=0.01,
                    grain="1 day",
                ),
            )

            def dd_q():
                state = sliding_dd_table(
                    val, "ts", ["role"], "turn_len", alpha=0.01,
                    grain="1 day",
                )
                return sliding_dd_quantiles(
                    state, ["role"], T_REF, WINDOWS,
                    [0.5, 0.9, 0.99], alpha=0.01,
                )

            timed("sliding_dd_build_plus_3window_quantiles", dd_q)

            def dd_drift():
                state = sliding_dd_table(
                    val, "ts", ["role"], "turn_len", alpha=0.01,
                    grain="1 day",
                )
                return sliding_dd_drift(
                    state, ["role"],
                    ("2028-08-01 00:00:00", "2028-08-31 00:00:00"),
                    ("2028-08-31 00:00:00", "2028-09-30 00:00:00"),
                )

            timed("sliding_dd_build_plus_month_drift", dd_drift)
        if "tuple" in ops:
            from pyspark.sql import functions as F

            from hyper_spark.operators.sliding_tuple import (
                sliding_tuple_estimates,
                sliding_tuple_table,
            )
            from hyper_spark.operators.tuple_agg import (
                tuple_estimates,
                tuple_sketch_by,
            )

            val = df.withColumn("turn_len", F.length("text").cast("double"))
            timed(
                "tuple_build_plus_est_textlen_by_role",
                lambda: tuple_estimates(
                    tuple_sketch_by(
                        val, ["role"], "conv_id", "turn_len", k=4096
                    ),
                    ["role"],
                    k=4096,
                ),
            )
            timed(
                "sliding_tuple_build_textlen_by_role",
                lambda: sliding_tuple_table(
                    val, "ts", ["role"], "conv_id", "turn_len",
                    k=4096, grain="1 day",
                ),
            )

            def tuple_est():
                state = sliding_tuple_table(
                    val, "ts", ["role"], "conv_id", "turn_len",
                    k=4096, grain="1 day",
                )
                return sliding_tuple_estimates(
                    state, ["role"], T_REF, WINDOWS, k=4096
                )

            timed("sliding_tuple_build_plus_3window_est", tuple_est)
    finally:
        spark.stop()
    print(json.dumps({"metric": "sliding_scale_rows", "rows": n,
                      "cpus": CPUS, "results": results}))


if __name__ == "__main__":
    main()
