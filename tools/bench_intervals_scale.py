"""Scale rows for the interval family (operators/intervals.py) over the
74.5M-turn transcripts cache.

Intervals are derived deterministically from the transcript turns (no
external data, per the round harness rule): start = ts, end = ts +
1..30 s keyed by xxhash64(conv_id, turn_idx) — i.e. every turn is a
tool invocation with a synthetic latency. Key = conv_id.

What the rows evidence at 100-TB shape:
* all three operators are ONE hash partition by conv_id + ONE
  within-key sort (window) + bounded aggregates — the irreducible
  cost of an order-dependent sweep; no cross-key shuffle, no Python;
* max_concurrency's event sweep doubles the row count (a +1 and a -1
  event per interval) before the window — visible as ~2x the
  merge/coverage wall, which is the expected constant, not a
  scale-shape difference;
* per-key state is bounded by a conversation's turn count (avg 24
  here), so skew is the per-conv row count — no salt needed.

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache
between reps. Run:  python tools/bench_intervals_scale.py
Env: R5_SF_DIR (default .data/transcripts_sf16.0), R5_CPUS (32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

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
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-intervals-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.intervals import (
        interval_coverage,
        max_concurrency,
        merge_intervals,
    )

    tx = spark.read.parquet(DATA)
    n_turns = tx.count()
    iv = tx.select(
        "conv_id",
        F.col("ts").alias("s"),
        (
            F.col("ts")
            + F.make_dt_interval(
                F.lit(0),
                F.lit(0),
                F.lit(0),
                (F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(30)) + 1).cast(
                    "double"
                ),
            )
        ).alias("e"),
    )
    print(f"turns={n_turns}", flush=True)

    cases = [
        ("merge", lambda: merge_intervals(iv, ["conv_id"], "s", "e")),
        ("coverage", lambda: interval_coverage(iv, ["conv_id"], "s", "e")),
        ("concurrency", lambda: max_concurrency(iv, ["conv_id"], "s", "e")),
    ]
    out = {"turns": n_turns}
    for tag, make in cases:
        best, rows = None, None
        for _ in range(REPS):
            _wait_quiet()
            spark.catalog.clearCache()
            t0 = time.time()
            rows = make().count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {tag}: {dt:.1f}s rows={rows}", flush=True)
        out[tag] = {
            "secs": round(best, 1),
            "rows": rows,
            "mturns_per_s": round(n_turns / best / 1e6, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
