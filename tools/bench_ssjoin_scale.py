"""Scale rows for the prefix-filtered exact set-similarity join
(operators/ssjoin.py) on a realistic-vocabulary synthetic corpus.

The sf* documents tables are deliberately tiny-vocab (2041 distinct
5-gram shingles at sf0.1), which is the prefix filter's WORST case —
every token is frequent, so candidates approach Σ df². Real corpora
have Zipf vocabularies where frequent tokens sit outside the
rarest-first prefixes. This tool synthesizes that regime
deterministically, in-plan, then writes parquet FIRST (the
fd_scale lesson: in-plan synthesis times the generator, not the
operator):

* vocab: 50k words; per-position word rank drawn log-uniformly
  (df(rank) ~ 1/rank, Zipf-ish) from xxhash64(doc, pos) — no RNG.
* docs: 60 + (doc mod 41) words each; every doc with doc%20==0 gets a
  planted near-dup (doc+1 shares the first ~90% of positions — same
  hash seed — and differs in the tail), expected word-set Jaccard
  around 0.8.

Workload: similarity_join(tokens='words', threshold=0.7), with a
position_filter A/B. Sizes 50k and 200k docs show the slope.

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache,
THP off. Corpus cached at /tmp/ssjoin_scale_<N>. Run:
python tools/bench_ssjoin_scale.py [N ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

CPUS = int(os.environ.get("R5_CPUS", "32"))
VOCAB = int(os.environ.get("R5_VOCAB", "50000"))
REPS = 2


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def corpus_path(spark: SparkSession, n_docs: int) -> str:
    """Deterministic Zipf-ish corpus, written once and cached."""
    path = f"/tmp/ssjoin_scale_{n_docs}_v{VOCAB}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = spark.range(n_docs).toDF("doc_id")
    # near-dup seed: docs 20k+1 reuse doc 20k's hash stream for the
    # first 90% of positions
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
                    * float(__import__("math").log(VOCAB))
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
        .appName("bench-ssjoin-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.ssjoin import similarity_join

    results: dict[str, dict] = {}
    for n in sizes:
        path = corpus_path(spark, n)
        docs = spark.read.parquet(path)
        modes = (
            (True,) if os.environ.get("R5_POS_ONLY") else (True, False)
        )
        for pf in modes:
            label = f"n{n}_pos{int(pf)}"
            best, pairs = None, None
            for _ in range(REPS):
                _wait_quiet()
                spark.catalog.clearCache()
                fresh = spark.read.parquet(path)
                t0 = time.time()
                out = similarity_join(
                    fresh, threshold=0.7, tokens="words", position_filter=pf
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
