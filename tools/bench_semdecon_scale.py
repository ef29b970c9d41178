"""Scale demonstration for `semantic_decontaminate` /
`embedding_join_pairs` (cross-corpus embedding contamination): the
1M x 64 training-vector table from tools/bench_embedding_scale.py
(same cache dir, same deterministic generator) screened against a
2k-vector synthetic eval set.

Eval construction makes the contamination signal real: the first
EVAL_HIT eval vectors are re-noised copies of the train clusters'
centers (cosine ~0.998 to every member of their cluster — each one
contaminates an entire 1000-member train cluster), the rest are
independent unit gaussians (clean). So the expected contaminated-id
count is ~N_CLUSTERS*CLUSTER_SIZE and the expected survivor count is
~N_ROWS - N_CLUSTERS*CLUSTER_SIZE.

What the timing evidences (the operator's 100-TB plan shape): the
eval side's bare bucket entries BROADCAST, the 1M-train side is
touched by ONE bucket pass + one id-keyed join back of surviving
candidates, and per_left_cap bounds the verified volume per train
vector. Compare against brute (1M x 2k = 2e9 cosines) which is only
run when SEMDECON_MODES includes "brute".

Run: python tools/bench_semdecon_scale.py
Env: reuses EMB_BENCH_* for the train table; SEMDECON_EVAL (default
     2000), SEMDECON_EVAL_HIT (default N_CLUSTERS), SEMDECON_MODES
     ("lsh"), SEMDECON_REPS (2), SEMDECON_CPUS (16).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import ArrayType, FloatType  # noqa: E402

from tools.bench_embedding_scale import (  # noqa: E402
    CLUSTER_SIZE,
    DATA,
    DIM,
    N_CLUSTERS,
    N_ROWS,
    _wait_quiet,
    build_session,
    ensure_data,
)

N_EVAL = int(os.environ.get("SEMDECON_EVAL", "2000"))
EVAL_HIT = int(os.environ.get("SEMDECON_EVAL_HIT", str(N_CLUSTERS)))
MODES = os.environ.get("SEMDECON_MODES", "lsh").split(",")
REPS = int(os.environ.get("SEMDECON_REPS", "2"))
CPUS = int(os.environ.get("SEMDECON_CPUS", "16"))
THRESHOLD = 0.9


def eval_vectors(spark):
    """Deterministic eval set: ids < EVAL_HIT are re-noised copies of
    train cluster centers (seed family 7_000_000 + c, matching
    bench_embedding_scale.ensure_data); the rest are clean gaussians
    (seed family 9_000_000 + i, disjoint from every train seed)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids.to_numpy():
            if i < EVAL_HIT:
                center = np.random.default_rng(7_000_000 + int(i)).standard_normal(DIM)
                v = center + 0.03 * np.random.default_rng(
                    8_000_000 + int(i)
                ).standard_normal(DIM)
            else:
                v = np.random.default_rng(9_000_000 + int(i)).standard_normal(DIM)
            out.append((v / np.linalg.norm(v)).astype(np.float32))
        return pd.Series(out)

    return (
        spark.range(0, N_EVAL, 1, numPartitions=4)
        .select(F.col("id").alias("vec_id"), gen("id").alias("embedding"))
    )


def main() -> None:
    from hyper_spark.operators.dedup import semantic_decontaminate

    ensure_data()
    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    try:
        train = spark.read.parquet(DATA)
        ev = eval_vectors(spark).persist()
        ev.count()
        # untimed warmup: fork + import the Python workers
        semantic_decontaminate(
            train.limit(CPUS * 64), ev.limit(64),
            threshold=THRESHOLD, method="lsh",
            n_planes=16, n_tables=4, dim=DIM,
        ).count()

        for mode in MODES:
            times, survivors = [], None
            for _ in range(REPS):
                _wait_quiet()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                if mode == "lsh":
                    surv = semantic_decontaminate(
                        train, ev, threshold=THRESHOLD, method="lsh",
                        n_planes=16, n_tables=4, dim=DIM,
                        max_bucket=100, per_left_cap=4,
                    )
                else:
                    surv = semantic_decontaminate(
                        train, ev, threshold=THRESHOLD, method="brute"
                    )
                survivors = surv.count()
                times.append(time.perf_counter() - t0)
            results[mode] = {
                "sec": round(min(times), 2),
                "reps": [round(t, 2) for t in times],
                "survivors": survivors,
                "dropped": N_ROWS - survivors,
            }
            print(f"{mode}: {results[mode]}", flush=True)
        ev.unpersist()
    finally:
        spark.stop()

    print(
        json.dumps(
            {
                "metric": "semantic_decontaminate_scale",
                "train_rows": N_ROWS,
                "eval_rows": N_EVAL,
                "eval_hits": EVAL_HIT,
                "dim": DIM,
                "threshold": THRESHOLD,
                "cpus": CPUS,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
