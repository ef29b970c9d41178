"""Scale demonstration for the matrix-sketch operators (Frequent
Directions + exact Gram): one global build over an NxD embedding
parquet table at two parallelism levels.

Input is a REAL parquet scan (written once, untimed, deterministic
sin features — no external data), because that is the operator's
actual 100 TB input path; in-plan synthesis of 64 trig features made
the JVM producer as expensive as the Python consumer and measured the
generator, not the operator.

Why the ladder tops at 16 slots: a mapInArrow/mapInPandas stage runs
TWO busy threads per task slot — the JVM side (scan, decode, Arrow
serialization; NOT idle here) and the Python worker. On this
32-physical-core box, local[16] + 16 Python workers = 32 busy
threads, exactly full; local[32] + 32 workers = 64 busy threads on 32
cores, so wall clock CANNOT improve past 16 slots — core saturation,
not an algorithmic serial section. Measured (16M x 64, batch=10k):
4 cpu 11.1 s, 8 cpu 5.8 s (4->8 efficiency 0.95), 16 cpu 4.2 s
(4->16 efficiency 0.66 with the box full at the top rung). The
per-partition sketch + blob-merge shape itself has no cross-partition
dependency: reduce traffic is one (ell x dim) blob per partition,
independent of row count — the same property the HLL flagship
evidences at 0.88+ efficiency with separate worker JVMs.

Arrow batch size is the pipeline-overlap lever: at 100k rows per
batch (51 MB) the producer and consumer alternate instead of
overlapping — measured 8.4 s vs 4.7 s (20k) vs 4.3 s (5k) at 16
cores on the identical job. Default here: 10k (Spark's own default).
Tiny batches at 32 slots thrash (64 threads ping-ponging 5 MB
chunks: 18-36 s) — one more reason the ladder stops at 16.

A one-batch warmup stage runs untimed per session so Python-worker
spawn (N process forks + imports) doesn't bill to the first rep.
The FD certificate (delta <= |A|_F^2 / ell) is asserted on every rep.

Run: python tools/bench_fd_scale.py
Env: FD_BENCH_ROWS (default 16M), FD_BENCH_DIM (64), FD_BENCH_ELL (16),
     FD_BENCH_DATA (parquet cache dir), FD_BENCH_LADDERS ("4:8,4:16").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one BLAS thread per Python worker: the FD matmuls are 4096 x 64 —
# too small for intra-op threads to pay; workers x threads would
# oversubscribe the box (env must be set before workers fork)
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_ROWS = int(os.environ.get("FD_BENCH_ROWS", str(16_000_000)))
DIM = int(os.environ.get("FD_BENCH_DIM", "64"))
ELL = int(os.environ.get("FD_BENCH_ELL", "16"))
DATA = os.environ.get("FD_BENCH_DATA", f"/tmp/fd_scale_{N_ROWS}_{DIM}")
LADDERS = [
    tuple(int(x) for x in pair.split(":"))
    for pair in os.environ.get("FD_BENCH_LADDERS", "4:8,4:16").split(",")
]
ARROW_BATCH = int(os.environ.get("FD_BENCH_ARROW_BATCH", "10000"))


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    """Shared host: start each timed rep in a quiet window (same gate
    as tools/bench_scaling_executors.py — external loadavg waves of
    10+ poison wide reps; an ungated run measured a 58 s outlier
    against a 22 s quiet rep of the identical job)."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-fd-scale-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        # ~64 MB splits: enough tasks for local[32] even on few files
        .config("spark.sql.files.maxPartitionBytes", str(64 << 20))
        .config(
            "spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages"
        )
        .getOrCreate()
    )


def ensure_data() -> None:
    """Write the N x DIM float table once (row i, feature j =
    sin(i*(j+1)*1e-4 + j)); reps then SCAN it like any real input."""
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    shutil.rmtree(DATA, ignore_errors=True)
    spark = build_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        (
            spark.range(0, N_ROWS, 1, numPartitions=128)
            .select(
                F.array(
                    *[
                        F.sin(
                            F.col("id") * F.lit((j + 1) * 1e-4) + F.lit(float(j))
                        ).cast("float")
                        for j in range(DIM)
                    ]
                ).alias("embedding")
            )
            .write.mode("overwrite")
            .parquet(DATA)
        )
    finally:
        spark.stop()


def run(cpus: int) -> dict:
    from hyper_spark.operators.matrix_sketch import fd_sketch_by

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        emb = spark.read.parquet(DATA)
        # untimed warmup: spawn + import the Python workers on a tiny
        # slice so process forks don't bill to the timed rep
        fd_sketch_by(emb.limit(cpus * 8), [], "embedding", ell=ELL, dim=DIM).collect()

        t0 = time.perf_counter()
        row = fd_sketch_by(emb, [], "embedding", ell=ELL, dim=DIM).collect()[0]
        fd_secs = time.perf_counter() - t0

        assert row["n"] == N_ROWS, (row["n"], N_ROWS)
        assert row["delta"] <= row["fnorm2"] / ELL + 1e-6, "certificate violated"
        return {
            "cpus": cpus,
            "rows": N_ROWS,
            "dim": DIM,
            "ell": ELL,
            "fd_secs": round(fd_secs, 2),
            "fd_rows_per_sec": round(N_ROWS / fd_secs),
            "delta": round(float(row["delta"]), 2),
            "delta_bound": round(float(row["fnorm2"]) / ELL, 2),
            "sketch_bytes": len(row["state"]),
        }
    finally:
        spark.stop()


def main() -> None:
    ensure_data()
    levels: list[int] = sorted({c for lad in LADDERS for c in lad})
    reps: list[dict] = []
    for _ in range(3):  # interleaved, best-of-3 per level
        for cpus in levels:
            _wait_quiet()
            reps.append(run(cpus))
            print(json.dumps(reps[-1]), flush=True)
    best = {}
    for rep in reps:
        c = rep["cpus"]
        if c not in best or rep["fd_secs"] < best[c]["fd_secs"]:
            best[c] = rep
    out = {"reps": reps, "ladders": {}}
    for lo, hi in LADDERS:
        speedup = best[lo]["fd_secs"] / best[hi]["fd_secs"]
        out["ladders"][f"{lo}->{hi}"] = {
            "speedup": round(speedup, 2),
            "efficiency": round(speedup / (hi / lo), 3),
            "low": best[lo],
            "high": best[hi],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
