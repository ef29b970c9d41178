"""VERDICT r04 #5: sf16 scale rows for the round-4 heavies that only
had sf0.1 numbers — substring/strip dup spans, ngram LM scoring, rate
anomaly (all over the 74.5M-turn transcripts cache), BM25 score/topk
over an sf16 postings index (built once to parquet, like a real
serving index), and semantic_dedup end-to-end over the 1M-vector
cache from tools/bench_embedding_scale.py (capped LSH → CC closure →
survivor join).

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache
between reps (CacheManager matches by logical plan). Stage outputs are
counted, never collected wide.

Run: python tools/bench_r5_scale.py [op ...]   (default: all)
Ops: substring strip lm_score rate burn drops bm25 semantic
Env: R5_SF_DIR (default .data/transcripts_sf16.0),
     R5_EMB_DIR (default /tmp/emb_scale_1000000_64_10x1000),
     R5_BM25_INDEX (default .data/bm25_sf16), R5_CPUS (32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("R5_SF_DIR", os.path.join(_REPO, ".data", "transcripts_sf16.0"))
EMB = os.environ.get("R5_EMB_DIR", "/tmp/emb_scale_1000000_64_10x1000")
BM25_INDEX = os.environ.get("R5_BM25_INDEX", os.path.join(_REPO, ".data", "bm25_sf16"))
CPUS = int(os.environ.get("R5_CPUS", "32"))
REPS = 2


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def main() -> None:
    ops = sys.argv[1:] or ["substring", "strip", "lm_score", "rate", "bm25", "semantic"]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-r5-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def timed(name, make_plan, reps=REPS):
        times, nrows = [], None
        for _ in range(reps):
            _wait_quiet()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = make_plan()
            nrows = out.count() if hasattr(out, "count") else out
            times.append(time.perf_counter() - t0)
            if hasattr(out, "unpersist"):
                out.unpersist()
        results[name] = {
            "sec": round(min(times), 2),
            "reps": [round(t, 2) for t in times],
            "rows_out": int(nrows),
        }
        print(f"{name}: {results[name]}", flush=True)

    try:
        df = spark.read.parquet(DATA)
        # doc identity for text ops: one row per turn, bigint id
        docs = df.select(
            F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
        )
        n = df.count()
        print(f"transcript rows: {n}", flush=True)

        from hyper_spark.operators.dedup import strip_dup_spans, substring_dup_spans
        from hyper_spark.operators.lm import ngram_lm_score, ngram_lm_train
        from hyper_spark.operators.anomaly import rate_gaps, rate_spikes

        if "substring" in ops:
            timed("substring_dup_spans", lambda: substring_dup_spans(docs, window=12))
        if "strip" in ops:
            timed("strip_dup_spans", lambda: strip_dup_spans(docs, window=12))
        if "lm_score" in ops:
            model = ngram_lm_train(docs).persist()
            model.count()
            timed("ngram_lm_score", lambda: ngram_lm_score(docs, model))
            model.unpersist()
        if "rate" in ops:
            timed(
                "rate_spikes_hourly",
                lambda: rate_spikes(df, "ts", by=["role"], bucket="hour"),
            )
            timed(
                "rate_gaps_hourly",
                lambda: rate_gaps(df, "ts", by=["role"], bucket="hour"),
            )

        if "burn" in ops:
            from hyper_spark.operators.anomaly import burn_rate_alerts

            timed(
                "burn_rate_hourly",
                lambda: burn_rate_alerts(
                    df,
                    F.col("tool").isNotNull(),
                    time_col="ts",
                    by=["role"],
                    bucket="hour",
                    objective=0.75,
                    short_buckets=6,
                    long_buckets=24,
                ),
            )

        if "drops" in ops:
            from hyper_spark.operators.anomaly import rate_drops, seasonal_drops

            timed(
                "rate_drops_hourly",
                lambda: rate_drops(df, "ts", by=["role"], bucket="hour"),
            )
            timed(
                "seasonal_drops_hourly",
                lambda: seasonal_drops(
                    df, "ts", by=["role"], bucket="hour",
                    season="hour_of_day",
                ),
            )

        if "bm25" in ops:
            from hyper_spark.operators.bm25 import (
                bm25_build,
                bm25_consts,
                bm25_prune,
                bm25_score,
            )

            if not os.path.exists(os.path.join(BM25_INDEX, "_SUCCESS")):
                _wait_quiet()
                t0 = time.perf_counter()
                bm25_build(docs).write.mode("overwrite").parquet(BM25_INDEX)
                results["bm25_build_write"] = {
                    "sec": round(time.perf_counter() - t0, 2), "reps": ["once"],
                    "rows_out": -1,
                }
                print(f"bm25_build_write: {results['bm25_build_write']}", flush=True)
            postings = spark.read.parquet(BM25_INDEX)
            t0 = time.perf_counter()
            consts = bm25_consts(postings)
            results["bm25_consts"] = {
                "sec": round(time.perf_counter() - t0, 2), "reps": ["once"],
                "rows_out": consts[0],
            }
            print(f"bm25_consts: {results['bm25_consts']}", flush=True)
            # the synthetic vocab is ~26 words: every term is a stop
            # word. Score both raw (honest degenerate case) and pruned
            # (max_df_frac drops the boilerplate; VERDICT #6 sf16 row)
            q = "error timeout retry"
            timed(
                "bm25_score_raw",
                lambda: bm25_score(postings, q, consts=consts, top_k=10),
                reps=REPS,
            )
            pruned = bm25_prune(postings, max_df_frac=0.2)
            pruned.persist().count()
            timed(
                "bm25_score_pruned",
                lambda: bm25_score(pruned, q, consts=consts, top_k=10),
                reps=REPS,
            )
            pruned.unpersist()

        if "semantic" in ops:
            from hyper_spark.operators.graph import semantic_dedup

            if os.path.exists(os.path.join(EMB, "_SUCCESS")):
                emb = spark.read.parquet(EMB)
                timed(
                    "semantic_dedup_1m",
                    lambda: semantic_dedup(
                        emb, threshold=0.9, n_planes=16, n_tables=4,
                        max_bucket=100,
                    ),
                    reps=REPS,
                )
            else:
                print("semantic: embedding cache missing, skipped", flush=True)
    finally:
        spark.stop()
    print(json.dumps({"metric": "r5_scale_rows", "rows": n, "cpus": CPUS,
                      "results": results}))


if __name__ == "__main__":
    main()
