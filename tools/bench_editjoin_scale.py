"""Scale rows for the q-gram prefix-filtered exact edit-distance join
(operators/editjoin.py) on a deterministic typo-planted corpus.

Corpus: n strings over a 27-char alphabet (26 letters + space), length
80 + (id mod 41); every id with id%10==1 reuses id-1's character
stream except at three fixed positions, where it draws its own hash —
a planted <=3-substitution near-dup per decade of ids. No RNG: chars
come from xxhash64(seed_doc, position).

The dimension that matters at scale is ``q``: the candidate join's
bucket sizes follow gram document frequency, and with q=2 the gram
vocabulary is only |alphabet|^2 = 729 — every gram is frequent, so
even rarest-first prefixes land in huge buckets (the same tiny-vocab
worst case the ssjoin scale tool documents for 5-gram shingles on the
sf tables). Raising q grows the vocabulary geometrically (27^4 = 531k)
at the price of a longer prefix (q*d+1 entries per string): the A/B
here measures that trade so the q knob has a written slope instead of
a guess.

Workload: edit_distance_join(max_dist=3, q in {2,4}) at 200k and 1M
strings. Protocol: local[32], best-of-2 fresh plans, quiet-gated,
clearCache, THP off. Corpus cached at /tmp/editjoin_scale_<N>. Run:
python tools/bench_editjoin_scale.py [N ...]
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
REPS = 2
ALPHABET = "abcdefghijklmnopqrstuvwxyz "
TYPO_POSITIONS = (5, 25, 45)


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def corpus_path(spark: SparkSession, n_docs: int) -> str:
    """Deterministic typo corpus, written once and cached."""
    path = f"/tmp/editjoin_scale_{n_docs}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = spark.range(n_docs).toDF("doc_id")
    base = F.when(
        F.col("doc_id") % 10 == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    # length follows the BASE id so a typo pair differs only by its
    # three substitutions (an extra tail char would push ed to 4 > d)
    docs = docs.withColumn("__base", base).withColumn(
        "__n", (F.lit(80) + (F.col("__base") % 41)).cast("int")
    )
    is_typo_pos = lambda j: j.isin(  # noqa: E731
        [F.lit(p) for p in TYPO_POSITIONS]
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.col("__n")),
        lambda j: F.substring(
            F.lit(ALPHABET),
            (
                F.pmod(
                    F.xxhash64(
                        F.when(is_typo_pos(j), F.col("doc_id")).otherwise(
                            F.col("__base")
                        ),
                        j,
                    ),
                    F.lit(len(ALPHABET)),
                )
                + 1
            ).cast("int"),
            1,
        ),
    )
    docs.select(
        "doc_id", F.array_join(chars, "").alias("text")
    ).repartition(CPUS).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-editjoin-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.editjoin import edit_distance_join

    qs = (
        [int(x) for x in os.environ["R5_QS"].split(",")]
        if os.environ.get("R5_QS")
        else [2, 4]
    )
    results: dict[str, dict] = {}
    for n in sizes:
        path = corpus_path(spark, n)
        for q in qs:
            label = f"n{n}_q{q}"
            best, pairs = None, None
            for _ in range(REPS):
                _wait_quiet()
                spark.catalog.clearCache()
                fresh = spark.read.parquet(path)
                t0 = time.time()
                out = edit_distance_join(fresh, max_dist=3, q=q)
                pairs = out.count()
                dt = time.time() - t0
                out.unpersist()
                best = dt if best is None else min(best, dt)
            results[label] = {"wall_s": round(best, 2), "pairs": pairs}
            print(json.dumps({label: results[label]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
