"""Scale rows for triangle_count and label_propagation on a 20M-edge
skewed synthetic graph (log-uniform endpoints ≈ power-law degrees —
hub nodes are exactly what the WWW'11 degree ordering defends against;
a naive neighbor-join pays degree² on the hubs).

Deterministic in-plan generation (xxhash64 arithmetic), written to
parquet FIRST (the fd_scale lesson). Protocol: local[32], best-of-2
fresh plans, quiet-gated, THP off. Cache: /tmp/graph_scale_<M>_<N>.
Run: python tools/bench_graph_scale.py [M N]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

CPUS = int(os.environ.get("R5_CPUS", "32"))
REPS = 2


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def graph_path(spark: SparkSession, m_edges: int, n_nodes: int) -> str:
    path = f"/tmp/graph_scale_{m_edges}_{n_nodes}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path

    def endpoint(salt: int):
        u = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(2147483647))
            / 2147483647.0
        )
        return F.floor(F.exp(u * float(math.log(n_nodes)))).cast("long")

    (
        spark.range(m_edges)
        .select(endpoint(1).alias("id_a"), endpoint(2).alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
        .repartition(CPUS)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-graph-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.graph import label_propagation, triangle_count

    path = graph_path(spark, m, n)
    results: dict[str, dict] = {}

    def timed(name, make_plan):
        times, val = [], None
        for _ in range(REPS):
            _wait_quiet()
            spark.catalog.clearCache()
            fresh = spark.read.parquet(path)
            t0 = time.perf_counter()
            rows = make_plan(fresh).collect() if name == "triangles_global" \
                else [make_plan(fresh).count()]
            times.append(time.perf_counter() - t0)
            val = rows[0]
        results[name] = {
            "sec": round(min(times), 2),
            "reps": [round(t, 2) for t in times],
            "value": str(val),
        }
        print(f"{name}: {results[name]}", flush=True)

    timed("triangles_global", lambda df: triangle_count(df))
    timed("lpa_5_iters", lambda df: label_propagation(df, iters=5))
    print(json.dumps({"metric": "graph_scale_rows", "edges": m, "nodes": n,
                      "cpus": CPUS, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
