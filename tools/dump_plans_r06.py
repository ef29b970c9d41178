"""Dump the EXECUTED physical plans of named bench queries to text
files — the round-6 plan evidence (plans/r06/<query>_{before,after}.txt).

Runs each query once with event logging on, then extracts every
SQLExecutionStart physicalPlanDescription fired while the query was
active (operators materialize internal steps eagerly, so a query's
evidence is the SEQUENCE of executed plans, not one lazy explain — and
these are the AQE-final shapes the cluster actually ran).

Usage:
    python tools/dump_plans_r06.py <outdir> <tag> <query> [query...]
      tag: 'before' or 'after'
Run from a worktree of the round-start commit for the 'before' files.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVENT_DIR = "/tmp/spark-events-plans"


def log_lines(path):
    import glob
    import io
    import subprocess

    v2 = os.path.join(
        os.path.dirname(path), f"eventlog_v2_{os.path.basename(path)}"
    )
    paths = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(v2, "events_*"))
    )
    for p in paths:
        if p.endswith(".zstd"):
            proc = subprocess.Popen(["zstd", "-dc", p], stdout=subprocess.PIPE)
            yield from io.TextIOWrapper(proc.stdout, encoding="utf-8")
            proc.wait()
        else:
            with open(p) as f:
                yield from f


def main():
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    os.makedirs(EVENT_DIR, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-dump-r06")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVENT_DIR)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    from hyper_spark.packaging import distribute

    distribute(spark)

    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = bench.bench_queries(spark, sf_dir)
    spans = {}
    for name in names:
        if name not in queries:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        t0 = time.time() * 1000
        df = queries[name]()
        df.count()
        spans[name] = (t0, time.time() * 1000)
        spark.catalog.clearCache()
        print(f"# ran {name}", file=sys.stderr)
    spark.stop()

    # collect executed plans in each query's time window
    plans = []  # (start_ms, desc)
    for line in log_lines(os.path.join(EVENT_DIR, app_id)):
        if '"org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart"' not in line:
            continue
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        plans.append((ev.get("time", 0), ev.get("physicalPlanDescription", "")))

    for name, (a, b) in spans.items():
        mine = [d for (t, d) in plans if a - 500 <= t <= b + 500]
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — executed physical plans ({tag} round-6 "
                f"optimization), {len(mine)} SQL executions\n\n"
            )
            for i, d in enumerate(mine):
                f.write(f"{'=' * 72}\n== execution {i}\n{'=' * 72}\n{d}\n")
        print(f"wrote {path} ({len(mine)} plans)")


if __name__ == "__main__":
    main()
