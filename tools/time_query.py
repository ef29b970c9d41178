"""Time named bench queries with the exact bench.py protocol (best-of-2
fresh plans, clearCache between reps) without running the whole bench.
Measurement-only tooling for round-6 A/Bs; bench.py stays frozen.

Usage: python tools/time_query.py ssjoin_prefix_docs cosine_join_docs
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    names = sys.argv[1:]
    if not names:
        print("usage: time_query.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    import bench

    spark = bench.build_session()
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.packaging import distribute

    distribute(spark)

    sf_dir = bench.SF_DIR
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.count()
    from hyper_spark.operators.hll_agg import sketch_by

    sketch_by(
        warm.repartition(bench.CPUS), [], "l_orderkey", 10, strategy="partial"
    ).count()

    queries = bench.bench_queries(spark, sf_dir)
    timings = {}
    for name in names:
        if name not in queries:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        reps = []
        while len(reps) < 2 or (len(reps) == 2 and max(reps) > 1.5 * min(reps)):
            t0 = time.perf_counter()
            df = queries[name]()
            n = df.count()
            reps.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(min(reps), 3)
        print(
            f"# {name}: {timings[name]:.3f}s best of {[round(r, 2) for r in reps]} ({n} rows)",
            file=sys.stderr,
        )
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
