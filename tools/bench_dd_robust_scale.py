"""Scale rows for the round-5 DDSketch additions over the 74.5M-turn
transcripts cache: weighted (token-mass) quantiles, trimmed mean, and
CDF probes — all read from ONE stored bucket table.

The claim to evidence: the weighted build costs the same one
integer-groupBy shuffle as the unweighted one (mass = SUM(w) instead
of COUNT), and every robust read (trimmed mean, ranks, weighted
quantiles) is a window pass over the ~stores×buckets bucket rows —
i.e. the expensive part is one scan, the reads are free at any input
size.

Protocol: local[32], best-of-2 fresh plans, quiet-gated.
Run:  python tools/bench_dd_robust_scale.py
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
        .appName("bench-dd-robust-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.ddsketch import (
        dd_by,
        dd_quantiles,
        dd_ranks,
        dd_trimmed_mean,
    )

    tx = spark.read.parquet(DATA).select(
        "role", F.length("text").cast("double").alias("chars")
    )
    n = tx.count()
    print(f"turns={n}", flush=True)
    out = {"turns": n}

    def timed(name, thunk):
        best = None
        for _ in range(REPS):
            _wait_quiet()
            spark.catalog.clearCache()
            t0 = time.time()
            rows = thunk().collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {name}: {dt:.2f}s ({len(rows)} rows)", flush=True)
        out[name] = {
            "secs": round(best, 2),
            "mturns_per_s": round(n / best / 1e6, 2),
        }

    # token-mass quantiles: "the median CHARACTER lives in a turn of X chars"
    timed(
        "weighted_quantiles",
        lambda: dd_quantiles(
            dd_by(tx, ["role"], "chars", weight="chars"),
            [0.5, 0.9, 0.99],
            ["role"],
            weighted=True,
        ),
    )
    # robust reads off one build: trimmed mean + three CDF probes
    def robust():
        sk = dd_by(tx, ["role"], "chars")
        return dd_trimmed_mean(sk, 0.05, 0.95, ["role"]).join(
            dd_ranks(sk, [100.0, 500.0, 2000.0], ["role"]), "role"
        )

    timed("trimmed_mean_plus_ranks", robust)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
