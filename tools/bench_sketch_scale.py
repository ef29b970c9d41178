"""sf16 scale rows for the round-5 sketch additions: DDSketch grouped
quantiles, count-sketch F2, and the AMS join-size inner product, all
over the 74.5M-turn transcripts cache.

What each row evidences at 100-TB shape:
* dd_quantiles: build = one integer groupBy (shuffle bounded by
  stores x buckets per partition, ~550 rows at alpha=0.01), eval = one
  window pass over bucket rows — raw values never shuffle;
* cs_f2 / ams_join_size: per-row hot path pure JVM (md5/xxh buckets +
  sign, posexplode, partial-aggregated groupBy capped at d*w rows per
  partition), densify touches d*w ints per group only.

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache
between reps. Run: python tools/bench_sketch_scale.py [op ...]
Ops: dd cs ams. Env: R5_SF_DIR (default .data/transcripts_sf16.0),
R5_CPUS (32).
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
    ops = sys.argv[1:] or ["dd", "cs", "ams"]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-sketch-scale")
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

        from hyper_spark.operators.countsketch import (
            cs_by,
            cs_f2,
            cs_inner_product,
        )
        from hyper_spark.operators.ddsketch import dd_quantiles_by

        if "dd" in ops:
            # per-role p50/p90/p99 of turn text length within 1%
            # relative error — the "turn-latency quantiles" shape
            timed(
                "dd_quantiles_textlen_by_role",
                lambda: dd_quantiles_by(
                    df, ["role"], F.length("text").cast("double"),
                    [0.5, 0.9, 0.99], alpha=0.01,
                ),
            )
        if "cs" in ops:
            # conv_id second frequency moment = self-join size = the
            # skew diagnostic the north star names for conv_id
            timed(
                "cs_f2_conv_id",
                lambda: cs_f2(cs_by(df, [], "conv_id", depth=5, width=8192)),
            )
        if "ams" in ops:
            # |user-turns JOIN assistant-turns ON conv_id| without
            # running the join: two sketches + one dot product
            def plan():
                u = df.filter(F.col("role") == "user")
                a = df.filter(F.col("role") == "assistant")
                return cs_inner_product(
                    cs_by(u, [], "conv_id", depth=5, width=8192),
                    cs_by(a, [], "conv_id", depth=5, width=8192),
                )

            timed("ams_join_size_conv_id", plan)
        if "change" in ops:
            # heavy change: which tools' usage changed most between the
            # two halves of the corpus timespan — deltoids from two
            # stored sketch states via cs_diff linearity; the probe set
            # (distinct tools) is collected untimed, as a standing
            # dimension dictionary would be
            from hyper_spark.operators.countsketch import (
                cs_diff,
                heavy_changers,
            )

            mid = df.select(
                F.percentile_approx("ts", 0.5).alias("m")
            ).collect()[0]["m"]
            cands = (
                df.filter(F.col("tool").isNotNull())
                .select("tool")
                .distinct()
            )
            cands.persist().count()

            def change_plan():
                a = df.filter(F.col("ts") < F.lit(mid))
                b = df.filter(F.col("ts") >= F.lit(mid))
                return heavy_changers(
                    cs_by(a, [], "tool", depth=5, width=8192),
                    cs_by(b, [], "tool", depth=5, width=8192),
                    cands,
                    "tool",
                    k=20,
                )

            timed("heavy_changers_tool", change_plan)

            def norm_plan():
                a = df.filter(F.col("ts") < F.lit(mid))
                b = df.filter(F.col("ts") >= F.lit(mid))
                return cs_f2(
                    cs_diff(
                        cs_by(a, [], "conv_id", depth=5, width=8192),
                        cs_by(b, [], "conv_id", depth=5, width=8192),
                    )
                )

            timed("change_norm_conv_id", norm_plan)
            cands.unpersist()
    finally:
        spark.stop()
    print(
        json.dumps(
            {
                "metric": "sketch_scale_rows",
                "rows": n,
                "cpus": CPUS,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
