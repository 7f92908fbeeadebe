"""Stage-level profiler for round-10 optimization: runs queries with the
event log enabled, then summarizes per-stage wall/task time so the slow
part of a query is identified empirically (guide §1.1/§7) instead of
guessed. UI is disabled in the standard session, so the event log is the
measurement channel.

Usage: python scripts/opt_profile.py QUERY [QUERY...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Prints, per query: total wall, then stages sorted by executor-time share
with name, task count, executor run time, shuffle read/write bytes,
Python-worker time (ArrowEvalPython/MapInPandas stages), GC time.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmesa_spark import queries as Q
from osmesa_spark.session import get_spark

EVDIR = "/tmp/spark-events-r10"


def run(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        "opt-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.registry()
    # warm-up identical in spirit to bench.py
    registry["pricing_summary"].spark(spark, sf_dir).count()
    from osmesa_spark.session import ship_package

    ship_package(spark)

    def _preload(it):
        import osmesa_spark.operators.buildings  # noqa: F401
        import osmesa_spark.operators.multimodal  # noqa: F401
        return it

    spark.range(64).repartition(32).mapInPandas(_preload, schema="id long").count()

    walls = {}
    marks = {}
    for name in names:
        spec = registry[name]
        # one untimed warm rep, then the profiled rep
        spec.spark(spark, sf_dir).count()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).count()
        walls[name] = time.perf_counter() - t0
        marks[name] = time.time() * 1000.0
        spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(EVDIR) if app_id in p]
        path = os.path.join(EVDIR, cands[0])
    if os.path.isdir(path):  # Spark 4 rolling event log: eventlog_v2_<app>/
        parts = sorted(
            p for p in os.listdir(path) if not p.startswith("appstatus")
        )
        merged = "/tmp/opt_profile_merged_events.jsonl"
        with open(merged, "w") as out:
            for p in parts:
                with open(os.path.join(path, p)) as f:
                    out.write(f.read())
        path = merged
    analyze(path, names, walls)


def analyze(path: str, names: list[str], walls: dict[str, float]) -> None:
    # jobId -> description; stageId -> job; stage metrics accumulated
    job_desc = {}
    stage_job = {}
    stage_info = {}
    stage_tasks = defaultdict(lambda: defaultdict(float))
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                job_desc[ev["Job ID"]] = desc
                for s in ev.get("Stage Infos", []):
                    stage_job[s["Stage ID"]] = ev["Job ID"]
                    stage_info[s["Stage ID"]] = s.get("Stage Name", "")
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                agg = stage_tasks[sid]
                agg["n_tasks"] += 1
                agg["run_ms"] += tm.get("Executor Run Time", 0)
                agg["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
                agg["gc_ms"] += tm.get("JVM GC Time", 0)
                agg["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                agg["result_ser_ms"] += tm.get("Result Serialization Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                agg["sh_read_b"] += sr.get("Local Bytes Read", 0) + sr.get(
                    "Remote Bytes Read", 0
                )
                agg["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                agg["sh_write_b"] += sw.get("Shuffle Bytes Written", 0)
                agg["sh_write_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
                inp = tm.get("Input Metrics") or {}
                agg["input_b"] += inp.get("Bytes Read", 0)
                for acc in ev.get("Task Info", {}).get("Accumulables", []):
                    nm = acc.get("Name", "")
                    if nm in (
                        "internal.metrics.pythonTotalTime",
                        "time to run Python workers",  # SQL metric name
                    ) or "Python workers" in nm:
                        try:
                            agg["python_ms"] += float(acc.get("Update", 0))
                        except (TypeError, ValueError):
                            pass
            elif et == "SparkListenerStageSubmitted":
                s = ev.get("Stage Info", {})
                stage_info[s["Stage ID"]] = s.get("Stage Name", "")

    for name in names:
        tag = f"PROFILE:{name}"
        jids = {j for j, d in job_desc.items() if d == tag}
        sids = sorted(s for s, j in stage_job.items() if j in jids)
        rows = []
        for sid in sids:
            a = stage_tasks.get(sid)
            if not a:
                continue
            rows.append((sid, a))
        rows.sort(key=lambda r: -r[1]["run_ms"])
        print(f"\n=== {name}  wall={walls[name]:.2f}s  "
              f"jobs={len(jids)} stages-with-tasks={len(rows)}")
        tot_run = sum(a["run_ms"] for _, a in rows) or 1.0
        for sid, a in rows[:12]:
            nm = stage_info.get(sid, "?").split("\n")[0][:60]
            print(
                f"  s{sid:<5} {a['run_ms']/1000:7.2f}s run "
                f"({100*a['run_ms']/tot_run:4.1f}%) cpu={a['cpu_ms']/1000:6.2f}s "
                f"py={a.get('python_ms',0)/1000:6.2f}s gc={a['gc_ms']/1000:5.2f}s "
                f"tasks={int(a['n_tasks']):4d} "
                f"shR={a['sh_read_b']/2**20:7.1f}M shW={a['sh_write_b']/2**20:7.1f}M "
                f"in={a['input_b']/2**20:7.1f}M fw={a['fetch_wait_ms']/1000:5.2f}s "
                f"| {nm}"
            )
        print(f"  total executor run {tot_run/1000:.2f}s across "
              f"{sum(int(a['n_tasks']) for _, a in rows)} tasks")


if __name__ == "__main__":
    run(sys.argv[1:])
