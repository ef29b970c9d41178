"""Minimal spark-submit job: the north rule's deployment shape
(``spark-submit --py-files dist/hyper_spark.zip tools/submit_job.py``).

Imports hyper_spark ONLY from the shipped zip (no repo on sys.path),
builds grouped sketches over a parquet table, prints one JSON line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hyper_spark.kernel.hll import error_bound
from hyper_spark.operators.hll_agg import sketch_by, sketch_collect, union_sketches


def main(sf_dir: str = "/root/testdata/sf0.01", p: int = 13) -> None:
    spark = SparkSession.builder.appName("hyper-spark-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_type = sketch_by(events, ["event_type"], "user_id", p)
    merged = sketch_collect(union_sketches(per_type, []))
    exact = events.select(F.countDistinct("user_id")).collect()[0][0]
    est = merged.cardinality()
    ok = abs(est - exact) / exact <= error_bound(p)
    print(json.dumps({"estimate": est, "exact": exact, "within_bound": bool(ok)}))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(*sys.argv[1:2])
