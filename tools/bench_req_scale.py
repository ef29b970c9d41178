"""Scale + tail-accuracy rows for the REQ sketch (kernel/req.py) over
the 74.5M-turn transcripts cache, head-to-head with KLL on the same
column.

The claim to evidence: at p99.9 / p99.99 of 74.5M values, REQ's
estimated rank stays within a small RELATIVE distance of the target
(error ∝ 1−q), while KLL at comparable state pays its uniform ±eps·n
band — several times the entire tail mass. Exact ranks of the
estimates are computed with one Spark filter-count per probe against
the raw column (no sampling), so the error figures are true ranks.

Protocol: local[32], best-of-2 fresh plans for walls, quiet-gated.
Run:  python tools/bench_req_scale.py
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
QS = [0.5, 0.99, 0.999, 0.9999]


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-req-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.quantiles import _q_name, quantiles_by

    # heavy-tailed per-turn "latency" proxy derived deterministically
    # from the row itself: text length stretched by a hash-exponential
    tx = spark.read.parquet(DATA).select(
        (
            F.length("text").cast("double")
            * F.exp(
                (F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(10000)) / 10000.0)
                * 3.0
            )
        ).alias("latency")
    )
    n = tx.count()
    print(f"turns={n}", flush=True)

    out = {"turns": n}
    ests = {}
    for method, param in (("req", 32), ("kll", 200)):
        best = None
        for _ in range(REPS):
            _wait_quiet()
            spark.catalog.clearCache()
            t0 = time.time()
            row = quantiles_by(tx, [], "latency", QS, method, param).collect()[0]
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {method}: {dt:.1f}s", flush=True)
        ests[method] = {q: row[_q_name(q)] for q in QS}
        out[method] = {"secs": round(best, 1), "mturns_per_s": round(n / best / 1e6, 2)}

    tx.persist().count()
    for method in ("req", "kll"):
        errs = {}
        for q in QS:
            est = ests[method][q]
            true_rank = tx.filter(F.col("latency") <= est).count() / n
            errs[str(q)] = {
                "abs_rank_err": round(abs(true_rank - q), 7),
                "rel_vs_tail": round(abs(true_rank - q) / (1 - q), 3) if q < 1 else 0,
            }
        out[method]["errors"] = errs
        print(f"  {method} errors: {errs}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
