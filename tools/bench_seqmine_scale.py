"""Scale rows for frequent_sequences (operators/seqmine.py) over the
74.5M-turn transcripts cache.

What the rows evidence at 100-TB shape:
* the per-level cost is the prefix-projection fan-out
  |proj| x (lookahead per row): unbounded gap makes lookahead the
  whole conversation suffix (avg 24 turns here), while max_gap=G
  caps it at G positions — the SPAM-style knob that turns the
  extension join from O(turns x patterns-per-conv) into
  O(G x patterns-per-conv);
* min_support prunes PATTERNS (Apriori), not projection rows — on a
  20-token power-law vocab nearly every pair clears any realistic
  floor, so gap bounding, not support, is the scale lever;
* every level is one co-located join (turns hash-partitioned by
  conv once, persisted) + one groupBy; zero Python in the plan.

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache
between reps. Run:  python tools/bench_seqmine_scale.py
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


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-seqmine-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.seqmine import frequent_sequences

    tx = spark.read.parquet(DATA)
    n_turns = tx.count()
    n_convs = tx.select("conv_id").distinct().count()
    sup = int(0.04 * n_convs)
    print(f"turns={n_turns} convs={n_convs} min_support={sup}", flush=True)

    cases = [
        ("len2_nogap", dict(max_len=2, max_gap=None)),
        ("len3_gap2", dict(max_len=3, max_gap=2)),
        ("len3_gap4", dict(max_len=3, max_gap=4)),
    ]
    out = {"turns": n_turns, "convs": n_convs, "min_support": sup}
    for tag, kw in cases:
        best, rows = None, None
        for _ in range(REPS):
            _wait_quiet()
            spark.catalog.clearCache()
            t0 = time.time()
            rows = frequent_sequences(
                tx, "turn_idx", "tool", ["conv_id"], min_support=sup, **kw
            ).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {tag}: {dt:.1f}s rows={rows}", flush=True)
        out[tag] = {"secs": round(best, 1), "rows": rows,
                    "mturns_per_s": round(n_turns / best / 1e6, 2)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
