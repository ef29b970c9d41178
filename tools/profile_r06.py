"""Round-6 profiling harness: run named bench queries with event
logging enabled and print a per-job / per-stage time + shuffle-byte
breakdown, so optimization targets the stage that actually costs.

Usage:
    python tools/profile_r06.py ssjoin_prefix_docs cosine_join_docs

This is measurement-only tooling (guide §1); bench.py itself stays
frozen. Numbers are cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = "/tmp/spark-events-r06"


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    os.makedirs(EVENT_DIR, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hyper_spark-profile-r06")
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


def _log_lines(path: str):
    """Yield event-log JSON lines from a v1 file or a v2 rolling dir."""
    import glob

    if os.path.isfile(path):
        paths = [path]
    else:
        v2 = path
        if not os.path.isdir(v2):
            base = os.path.dirname(path)
            v2 = os.path.join(base, f"eventlog_v2_{os.path.basename(path)}")
        paths = sorted(glob.glob(os.path.join(v2, "events_*")))
    for p in paths:
        if p.endswith(".zstd"):
            import io
            import subprocess

            proc = subprocess.Popen(
                ["zstd", "-dc", p], stdout=subprocess.PIPE
            )
            yield from io.TextIOWrapper(proc.stdout, encoding="utf-8")
            proc.wait()
        else:
            with open(p) as f:
                yield from f


def parse_event_log(path: str):
    """Return list of jobs: {desc, job_id, wall_s, stages: [...]}.
    Stage entries carry name, n_tasks, wall_s, executor_run_s,
    shuffle_read_mb, shuffle_write_mb, input_mb, output_rows."""
    jobs = {}
    stage_to_job = {}
    stages = {}
    stage_metrics = {}

    if True:
        for line in _log_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "job_id": jid,
                    "desc": props.get("spark.job.description", ""),
                    "start": ev.get("Submission Time", 0),
                    "end": None,
                    "stage_ids": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
                for s in ev.get("Stage Infos", []):
                    stage_to_job[s["Stage ID"]] = jid
            elif t == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev.get("Completion Time", 0)
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "stage_id": sid,
                    "name": si.get("Stage Name", "")[:90],
                    "n_tasks": si.get("Number of Tasks", 0),
                    "start": si.get("Submission Time", 0),
                    "end": si.get("Completion Time", 0),
                }
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = stage_metrics.setdefault(
                    sid,
                    {
                        "run_ms": 0,
                        "cpu_ns": 0,
                        "sr_bytes": 0,
                        "sw_bytes": 0,
                        "in_bytes": 0,
                        "spill_bytes": 0,
                        "fetch_wait_ms": 0,
                        "task_ms": [],
                    },
                )
                agg["task_ms"].append(m.get("Executor Run Time", 0))
                agg["run_ms"] += m.get("Executor Run Time", 0)
                agg["cpu_ns"] += m.get("Executor CPU Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                agg["sr_bytes"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                agg["fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
                swm = m.get("Shuffle Write Metrics") or {}
                agg["sw_bytes"] += swm.get("Shuffle Bytes Written", 0)
                im = m.get("Input Metrics") or {}
                agg["in_bytes"] += im.get("Bytes Read", 0)
                agg["spill_bytes"] += m.get("Disk Bytes Spilled", 0)

    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        entry = {
            "job_id": jid,
            "desc": j["desc"],
            "wall_s": round(((j["end"] or 0) - j["start"]) / 1000.0, 3),
            "stages": [],
        }
        for sid in sorted(j["stage_ids"]):
            if sid not in stages:
                continue  # skipped stage (reused exchange)
            s = stages[sid]
            m = stage_metrics.get(sid, {})
            tms = sorted(m.get("task_ms", [0]))
            entry["stages"].append(
                {
                    "task_max_s": round(tms[-1] / 1000.0, 2),
                    "task_med_s": round(tms[len(tms) // 2] / 1000.0, 2),
                    "sid": sid,
                    "name": s["name"],
                    "tasks": s["n_tasks"],
                    "wall_s": round((s["end"] - s["start"]) / 1000.0, 3),
                    "run_s": round(m.get("run_ms", 0) / 1000.0, 2),
                    "cpu_s": round(m.get("cpu_ns", 0) / 1e9, 2),
                    "sr_mb": round(m.get("sr_bytes", 0) / 1e6, 1),
                    "sw_mb": round(m.get("sw_bytes", 0) / 1e6, 1),
                    "in_mb": round(m.get("in_bytes", 0) / 1e6, 1),
                    "spill_mb": round(m.get("spill_bytes", 0) / 1e6, 1),
                    "fetch_wait_s": round(m.get("fetch_wait_ms", 0) / 1000.0, 2),
                }
            )
        out.append(entry)
    return out


def main():
    names = sys.argv[1:]
    if not names:
        print("usage: profile_r06.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    from hyper_spark.packaging import distribute

    distribute(spark)

    # warmup identical to bench.py
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.count()
    from hyper_spark.operators.hll_agg import sketch_by

    sketch_by(warm.repartition(cpus), [], "l_orderkey", 10, strategy="partial").count()

    import bench

    queries = bench.bench_queries(spark, sf_dir)
    walls = {}
    for name in names:
        if name not in queries:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        df = queries[name]()
        n = df.count()
        walls[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"# {name}: {walls[name]}s ({n} rows)", file=sys.stderr)
        spark.catalog.clearCache()

    spark.stop()

    log_path = os.path.join(EVENT_DIR, app_id)
    jobs = parse_event_log(log_path)
    for j in jobs:
        if not j["desc"].startswith("PROFILE:"):
            continue
        print(f"\n== job {j['job_id']} [{j['desc']}] wall={j['wall_s']}s")
        for s in j["stages"]:
            print(
                f"   stage {s['sid']:>4} tasks={s['tasks']:>3} wall={s['wall_s']:>7.3f}s "
                f"run={s['run_s']:>8.2f}s cpu={s['cpu_s']:>8.2f}s in={s['in_mb']:>8.1f}MB "
                f"sr={s['sr_mb']:>8.1f}MB sw={s['sw_mb']:>8.1f}MB spill={s['spill_mb']:>6.1f}MB "
                f"fw={s['fetch_wait_s']:>5.2f}s tmax/med={s['task_max_s']}/{s['task_med_s']}s  {s['name']}"
            )
    print(f"\nwalls: {json.dumps(walls)}")
    print(f"event log: {log_path}")


if __name__ == "__main__":
    main()
