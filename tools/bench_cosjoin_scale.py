"""Scale rows for the exact sparse TF-IDF cosine join
(operators/cosjoin.py) on the same deterministic Zipf-ish word corpus
the ssjoin scale tool uses (log-uniform word ranks, planted near-dups
at doc%20 sharing ~90% of positions), in the Heaps regime (vocab grows
with the corpus — the realistic setting that keeps prefix dfs
bounded).

Workload: cosine_similarity_join(tokens='words', threshold=0.8).
Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache.
Corpus cached at /tmp/cosjoin_scale_<N>_v<VOCAB>. Run:
python tools/bench_cosjoin_scale.py [N ...]   (VOCAB via R5_VOCAB)
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


def corpus_path(spark: SparkSession, n_docs: int, vocab: int) -> str:
    path = f"/tmp/cosjoin_scale_{n_docs}_v{vocab}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = spark.range(n_docs).toDF("doc_id")
    base = F.when(
        (F.col("doc_id") % 20 == 1), F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    n_words = F.lit(60) + (F.col("doc_id") % 41).cast("int")
    cut = F.floor(n_words * 0.9)
    docs = docs.withColumn("__base", base).withColumn("__n", n_words)
    words = F.transform(
        F.sequence(F.lit(1), F.col("__n")),
        lambda j: F.concat(
            F.lit("w"),
            F.floor(
                F.exp(
                    (
                        F.pmod(
                            F.xxhash64(
                                F.when(j <= cut, F.col("__base")).otherwise(
                                    F.col("doc_id")
                                ),
                                j,
                            ),
                            F.lit(2147483647),
                        )
                        / 2147483647.0
                    )
                    * float(math.log(vocab))
                )
            ).cast("long"),
        ),
    )
    docs.select(
        "doc_id", F.array_join(words, " ").alias("text")
    ).repartition(CPUS).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-cosjoin-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.cosjoin import cosine_similarity_join

    results: dict[str, dict] = {}
    for n in sizes:
        vocab = int(os.environ.get("R5_VOCAB", str(n)))  # Heaps: |V| ~ n
        path = corpus_path(spark, n, vocab)
        label = f"n{n}_v{vocab}"
        best, pairs = None, None
        for _ in range(REPS):
            _wait_quiet()
            spark.catalog.clearCache()
            fresh = spark.read.parquet(path)
            t0 = time.time()
            out = cosine_similarity_join(
                fresh, tokens="words", threshold=0.8
            )
            pairs = out.count()
            dt = time.time() - t0
            out.unpersist()
            best = dt if best is None else min(best, dt)
        results[label] = {"wall_s": round(best, 2), "pairs": pairs}
        print(json.dumps({label: results[label]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
