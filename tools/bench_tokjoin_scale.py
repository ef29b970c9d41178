"""Scale rows for the token-sequence edit-distance join
(operators/editjoin.py::token_edit_distance_join) on a deterministic
turn-path corpus — the templated-vocab regime the transcripts gate
measures, at 10-40x the gate's size.

Corpus: n conversations, 24-40 turn tokens each, drawn from a 64-token
vocabulary with LOG-UNIFORM ranks (Zipf-ish: a handful of rare tokens,
a frequent head — the real shape of role:tool vocabs, where rare tools
exist but boilerplate turns dominate). Every id with id%10==1 reuses
id-1's token stream except at one position (a planted 1-substitution
retry/fork). No RNG — tokens come from xxhash64(seed_id, position).

This is deliberately the operator's HARD regime: with |vocab| = 64,
q=1's prefix selectivity comes only from the frequency SPREAD
(rarest-first prefixes of d+1 occurrences) plus the length filter —
measured DNF (>50 min) at 100k sequences. q=2 joins on token BIGRAMS
(|V|^2 = 4096 effective vocabulary, prefix 2d+1) — the same escape
hatch the character join's q knob provides, and what a user sizing a
trajectory dedup should reach for on templated vocabs.

Protocol: local[32], best-of-2 fresh plans, quiet-gated, clearCache.
Corpus cached at /tmp/tokjoin_scale_<N>. Run:
python tools/bench_tokjoin_scale.py [N ...]
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
VOCAB = 64
REPS = 2
TYPO_POS = 7


def _wait_quiet(threshold: float = 6.0, max_wait: float = 300.0) -> None:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if os.getloadavg()[0] < threshold:
            return
        time.sleep(5.0)


def corpus_path(spark: SparkSession, n: int) -> str:
    path = f"/tmp/tokjoin_scale_{n}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    convs = spark.range(n).toDF("conv_id")
    base = F.when(
        F.col("conv_id") % 10 == 1, F.col("conv_id") - 1
    ).otherwise(F.col("conv_id"))
    convs = convs.withColumn("__base", base).withColumn(
        "__n", (F.lit(24) + (F.col("__base") % 17)).cast("int")
    )
    toks = F.transform(
        F.sequence(F.lit(1), F.col("__n")),
        lambda j: F.concat(
            F.lit("t"),
            F.lpad(
                F.floor(
                    F.exp(
                        (
                            F.pmod(
                                F.xxhash64(
                                    F.when(
                                        j == F.lit(TYPO_POS),
                                        F.col("conv_id"),
                                    ).otherwise(F.col("__base")),
                                    j,
                                ),
                                F.lit(2147483647),
                            )
                            / 2147483647.0
                        )
                        * float(math.log(VOCAB))
                    )
                ).cast("string"),
                2,
                "0",
            ),
        ),
    )
    convs.select("conv_id", toks.alias("toks")).repartition(
        CPUS
    ).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [25_000, 100_000]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-tokjoin-scale")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-XX:-UseTransparentHugePages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hyper_spark.operators.editjoin import token_edit_distance_join

    results: dict[str, dict] = {}
    qs = (
        [int(x) for x in os.environ["R5_QS"].split(",")]
        if os.environ.get("R5_QS")
        else [1, 2]
    )
    for n in sizes:
        path = corpus_path(spark, n)
        for q in qs:
            label = f"n{n}_d2_q{q}"
            best, pairs = None, None
            for _ in range(REPS):
                _wait_quiet()
                spark.catalog.clearCache()
                fresh = spark.read.parquet(path)
                t0 = time.time()
                out = token_edit_distance_join(
                    fresh, id_col="conv_id", tokens_col="toks",
                    max_dist=2, q=q,
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
