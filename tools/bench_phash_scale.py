"""Scale row for hamming_pairs (operators/phash.py): banded Hamming
self-join over millions of synthetic 64-bit hashes, local[32].

The cost model to verify: candidates per band = sum |bucket|^2 over
2^width keys, so wall should track n^2 / 2^width / (max_dist+1) —
NOT the brute-force n^2/2 xor comparisons. We plant near-dup groups
arithmetically (every 1000th hash gets two <=2-bit perturbed twins)
so the output is non-trivial and checkable, and report the planted
recall (must be 1.0 — the pigeonhole index is recall-lossless).

Usage: python tools/bench_phash_scale.py [n_hashes ...]
Appends one line per size to stdout; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from hyper_spark.operators.phash import hamming_pairs  # noqa: E402


def build_hashes(spark, n: int):
    """n pseudo-random 64-bit hashes; ids i with i%1000 in (1,2) are
    <=2-bit twins of the group base (i - i%1000): planted pairs at
    Hamming distance 1, 2, and <=3 inside each group of 3."""
    base = F.col("id") - (F.col("id") % 1000)
    h = F.xxhash64(base.cast("string"))
    twin = F.when(F.col("id") % 1000 == 1, F.lit(1)).when(
        F.col("id") % 1000 == 2, F.lit(3)
    ).otherwise(F.lit(0))
    rnd = F.when(F.col("id") % 1000 > 2, F.xxhash64(F.col("id").cast("string"))).otherwise(
        h.bitwiseXOR(twin.cast("long"))
    )
    return spark.range(0, n, 1, 32).select(
        F.col("id").alias("doc_id"), rnd.alias("phash")
    )


def main(*sizes: str) -> int:
    ns = [int(s) for s in sizes] or [1_000_000, 4_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bench-phash-scale")
        .config("spark.driver.memory", "96g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        df = build_hashes(spark, n).persist()
        df.count()
        groups = n // 1000  # planted pairs per group: (0,1)=1, (0,2)=2, (1,2)=3 bits
        t0 = time.time()
        pairs = hamming_pairs(df, max_dist=3)
        total = pairs.count()
        wall = time.time() - t0
        planted = pairs.filter(
            (F.col("id_a") % 1000 < 3)
            & (F.col("id_b") % 1000 < 3)
            & (F.col("id_a") - (F.col("id_a") % 1000)
               == F.col("id_b") - (F.col("id_b") % 1000))
        ).count()
        recall = planted / (3 * groups)
        print(
            f"# hamming_pairs n={n:,}: {wall:.1f}s, {total:,} pairs, "
            f"planted recall {recall:.4f} ({planted:,}/{3*groups:,}), "
            f"{n/wall:,.0f} hashes/s"
        )
        df.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
