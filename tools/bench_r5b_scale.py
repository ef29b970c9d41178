"""sf16 scale rows for the round-5 second batch: forward-decay
trending, priority sampling, and sliding-window HLL, over the
74.5M-turn transcripts cache.

What each row evidences at 100-TB shape:
* decayed_topk: ONE JVM aggregate (pow + sum, map-side combined) over
  raw turns, shuffle = distinct (role, tool) rows only; top-k window
  over ~80 rows;
* priority_sample_by grouped: weight agg shuffle + partition-local
  rank prune (per-group sort bounded at n_partitions*(k+1) rows, never
  the 4M distinct convs of a group through one task);
* sliding_register_table: bucket-max shuffle bounded by
  2^p x days rows, front filter windows over register-sized groups —
  raw turns never reach the window.

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache
between reps, nothing else running. Run:
python tools/bench_r5b_scale.py [decay prio shll]
Env: R5_SF_DIR (default .data/transcripts_sf16.0), R5_CPUS (32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("R5_SF_DIR", os.path.join(_REPO, ".data", "transcripts_sf16.0"))
CPUS = int(os.environ.get("R5_CPUS", "32"))
REPS = 2
T_REF = "2028-10-01 00:00:00"


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def main() -> None:
    ops = sys.argv[1:] or ["decay", "prio", "shll"]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-r5b-scale")
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
            out = make_plan()
            nrows = out.count()
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
        print(f"transcript rows: {n}", flush=True)

        from hyper_spark.operators.decay import decayed_topk
        from hyper_spark.operators.priority_sample import priority_sample_by
        from hyper_spark.operators.sliding_hll import (
            sliding_estimates,
            sliding_register_table,
        )

        if "decay" in ops:
            # trending tools per role under a 7-day half-life — the
            # "what's hot" query over the full turn history
            timed(
                "decayed_topk_tool_by_role",
                lambda: decayed_topk(
                    df, "ts", "tool", "7 days", k=10, by=["role"],
                    t_ref=T_REF,
                ),
            )
        if "prio" in ops:
            # one 1024-conv sample per role answers post-hoc
            # subset-sum queries over 4M convs x 4 roles
            timed(
                "priority_sample_conv_by_role",
                lambda: priority_sample_by(
                    df, "conv_id", k=1024, by=["role"], seed=0
                ),
            )
            timed(
                "priority_sample_conv_global",
                lambda: priority_sample_by(df, "conv_id", k=4096, seed=0),
            )
        if "shll" in ops:
            # one state build answers every trailing-window distinct-
            # conv question; ~1000 daily buckets x 2^14 registers max
            timed(
                "sliding_hll_build_conv_daily",
                lambda: sliding_register_table(
                    df, "ts", [], "conv_id", p=14, grain="1 day"
                ),
            )

            def plan_query():
                state = sliding_register_table(
                    df, "ts", [], "conv_id", p=14, grain="1 day"
                )
                return sliding_estimates(
                    state, [], T_REF,
                    {"7d": "7 days", "30d": "30 days", "365d": "365 days"},
                    14,
                )

            timed("sliding_hll_build_plus_3window_query", plan_query)
    finally:
        spark.stop()
    print(
        json.dumps(
            {
                "metric": "r5b_scale_rows",
                "rows": n,
                "cpus": CPUS,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
