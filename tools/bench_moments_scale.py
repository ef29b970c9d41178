"""sf16 scale rows for the moments-sketch family (round-5 cont. 4).

Measured over the 74.5M-turn transcripts cache: per-role quantiles of
turn text length via the moments sketch (k+3 doubles of state — the
DD row in bench_sketch_scale.py asks the same question, so the two
rows are directly comparable), the global sketch, the per-(role, day)
sliding state build, and an any-window stats query over that state.

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache
between reps (CacheManager matches by logical plan).

Run: python tools/bench_moments_scale.py [op ...]
Ops: grouped global sliding window. Env: R5_SF_DIR
(default .data/transcripts_sf16.0), R5_CPUS (32).
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


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def main() -> None:
    ops = sys.argv[1:] or ["grouped", "global", "sliding", "window"]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-moments-scale")
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

        from hyper_spark.operators.moments import moments_by, moments_quantiles
        from hyper_spark.operators.sliding_moments import (
            sliding_moments_stats,
            sliding_moments_table,
        )

        textlen = F.length("text").cast("double")

        if "grouped" in ops:
            # per-role p50/p90/p99 of turn text length — same question
            # as dd_quantiles_textlen_by_role (bench_sketch_scale.py)
            timed(
                "moments_quantiles_textlen_by_role",
                lambda: moments_quantiles(
                    moments_by(df, ["role"], textlen, k=8),
                    ["role"],
                    [0.5, 0.9, 0.99],
                ),
            )
        if "global" in ops:
            timed(
                "moments_quantiles_textlen_global",
                lambda: moments_quantiles(
                    moments_by(df, [], textlen, k=8), [], [0.5, 0.9, 0.99]
                ),
            )
        if "sliding" in ops:
            timed(
                "sliding_moments_build_role_day",
                lambda: sliding_moments_table(
                    df, "ts", ["role"], textlen, k=8, grain="1 day"
                ),
            )
        if "window" in ops:
            # any-window stats from a persisted state: build once to
            # parquet (a real serving state), query it repeatedly
            state_path = "/tmp/moments_state_sf16"
            if not os.path.exists(os.path.join(state_path, "_SUCCESS")):
                sliding_moments_table(
                    df, "ts", ["role"], textlen, k=8, grain="1 day"
                ).write.mode("overwrite").parquet(state_path)
            state = spark.read.parquet(state_path)
            # transcripts ts spans 2026-01-01 .. ~2.7 years forward
            t_ref = "2028-01-01 00:00:00"
            timed(
                "sliding_moments_stats_from_state",
                lambda: sliding_moments_stats(
                    state, ["role"], t_ref,
                    {"30d": "30 days", "180d": "180 days", "365d": "365 days"},
                ),
            )
    finally:
        spark.stop()
    print(
        json.dumps(
            {
                "metric": "moments_scale_rows",
                "rows": n,
                "cpus": CPUS,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
