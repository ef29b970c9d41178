"""Scale demonstration for `embedding_pairs` (hyperplane-LSH cosine
near-dup): 1M x 64 vectors with a realistic skew profile — a large
quasi-random background plus a few dense near-dup clusters (the
embedding analogue of boilerplate text, which on the minhash path
measured Sigma|bucket|^2 ~ 1.7e9 candidates from one templated
bucket).

Input is a REAL parquet scan written once (deterministic per-id
numpy generation — no external data), same reasoning as
tools/bench_fd_scale.py: the operator's 100 TB input path is a scan,
and in-plan synthesis bills the generator to the operator.

Modes timed per rep (same session, fresh plan per rep — repeated
collect() of one DataFrame object reuses shuffle files and lies):
  capped    — max_bucket=MAX_BUCKET (star join on overflow buckets)
  uncapped  — max_bucket=None (exhaustive; the pre-r5 default shape)

The r5 rewrite this tool benchmarks: bare (id, table, bucket) entries
(vectors no longer ride both sides of the bucket self-join), ONE
all-table pandas-UDF bucket pass, distinct after the cosine screen.
The old (r4) code path can be timed for comparison by running this
file with PYTHONPATH pointing at a pre-r5 checkout (git archive) —
the recorded BASELINE.md row does exactly that.

Run: python tools/bench_embedding_scale.py
Env: EMB_BENCH_ROWS (default 1M), EMB_BENCH_DIM (64),
     EMB_BENCH_CLUSTERS (10), EMB_BENCH_CLUSTER_SIZE (1000),
     EMB_BENCH_PLANES (16), EMB_BENCH_TABLES (4),
     EMB_BENCH_MAX_BUCKET (100), EMB_BENCH_CPUS (16),
     EMB_BENCH_MODES ("capped,uncapped"), EMB_BENCH_DATA (cache dir),
     EMB_BENCH_REPS (2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import ArrayType, FloatType  # noqa: E402

N_ROWS = int(os.environ.get("EMB_BENCH_ROWS", str(1_000_000)))
DIM = int(os.environ.get("EMB_BENCH_DIM", "64"))
N_CLUSTERS = int(os.environ.get("EMB_BENCH_CLUSTERS", "10"))
CLUSTER_SIZE = int(os.environ.get("EMB_BENCH_CLUSTER_SIZE", "1000"))
N_PLANES = int(os.environ.get("EMB_BENCH_PLANES", "16"))
N_TABLES = int(os.environ.get("EMB_BENCH_TABLES", "4"))
MAX_BUCKET = int(os.environ.get("EMB_BENCH_MAX_BUCKET", "100"))
CPUS = int(os.environ.get("EMB_BENCH_CPUS", "16"))
MODES = os.environ.get("EMB_BENCH_MODES", "capped,uncapped").split(",")
DATA = os.environ.get(
    "EMB_BENCH_DATA", f"/tmp/emb_scale_{N_ROWS}_{DIM}_{N_CLUSTERS}x{CLUSTER_SIZE}"
)
REPS = int(os.environ.get("EMB_BENCH_REPS", "2"))
THRESHOLD = 0.9


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    """Shared host: start each timed rep in a quiet window (see
    tools/bench_scaling_executors.py)."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-embedding-scale-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )


def ensure_data() -> None:
    """Write the vector table once, deterministically per id:
    ids < N_CLUSTERS*CLUSTER_SIZE are dense clusters (center seeded by
    cluster index, member = center + 0.03*noise(id) — cosine ~0.998
    within a cluster, the near-dup signal AND the bucket skew); the
    rest are independent unit gaussians (the background whose bucket
    sizes follow the Poisson tail). All normalized."""
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    shutil.rmtree(DATA, ignore_errors=True)
    spark = build_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    n_clustered = N_CLUSTERS * CLUSTER_SIZE

    @F.pandas_udf(ArrayType(FloatType()))
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids.to_numpy():
            if i < n_clustered:
                c = int(i) // CLUSTER_SIZE
                center = np.random.default_rng(7_000_000 + c).standard_normal(DIM)
                v = center + 0.03 * np.random.default_rng(int(i)).standard_normal(DIM)
            else:
                v = np.random.default_rng(int(i)).standard_normal(DIM)
            out.append((v / np.linalg.norm(v)).astype(np.float32))
        return pd.Series(out)

    try:
        (
            spark.range(0, N_ROWS, 1, numPartitions=64)
            .select(F.col("id").alias("vec_id"), gen("id").alias("embedding"))
            .write.mode("overwrite")
            .parquet(DATA)
        )
    finally:
        spark.stop()


def main() -> None:
    from hyper_spark.operators.dedup import embedding_pairs

    ensure_data()
    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    try:
        emb = spark.read.parquet(DATA)
        # untimed warmup: fork + import the Python workers
        warm = embedding_pairs(
            emb.limit(CPUS * 64),
            threshold=THRESHOLD,
            method="lsh",
            n_planes=N_PLANES,
            n_tables=N_TABLES,
            dim=DIM,
        )
        warm.collect()
        if hasattr(warm, "unpersist"):
            warm.unpersist()

        for mode in MODES:
            cap = MAX_BUCKET if mode == "capped" else None
            times, n_pairs = [], None
            for _ in range(REPS):
                _wait_quiet()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                kwargs = dict(
                    threshold=THRESHOLD,
                    method="lsh",
                    n_planes=N_PLANES,
                    n_tables=N_TABLES,
                    dim=DIM,
                )
                # the old (pre-r5) signature has no max_bucket: only
                # pass it when set, so this tool also runs unchanged
                # against a pre-r5 checkout for the A/B row
                if cap is not None:
                    kwargs["max_bucket"] = cap
                pairs = embedding_pairs(emb, **kwargs)
                n_pairs = pairs.count()
                times.append(time.perf_counter() - t0)
                if hasattr(pairs, "unpersist"):
                    pairs.unpersist()
            results[mode] = {
                "sec": round(min(times), 2),
                "reps": [round(t, 2) for t in times],
                "pairs": n_pairs,
            }
            print(f"{mode}: {results[mode]}", flush=True)
    finally:
        spark.stop()

    print(
        json.dumps(
            {
                "metric": "embedding_pairs_scale",
                "rows": N_ROWS,
                "dim": DIM,
                "clusters": f"{N_CLUSTERS}x{CLUSTER_SIZE}",
                "n_planes": N_PLANES,
                "n_tables": N_TABLES,
                "max_bucket": MAX_BUCKET,
                "cpus": CPUS,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
