"""Round-11 trainer-latency profiler: per-query Spark JOB list with wall
per job, plus constructor-vs-action phase split.

For each named query: construct the DataFrame (recording jobs fired by
the constructor — eager trainer actions), then run the count action, and
print every job's (duration, stage count, task count, description) from
the status tracker. This is the load-independent evidence channel for
collapsing iterative-trainer driver latency (VERDICT r10 item 1).

Usage: python scripts/trainer_jobs.py QUERY [QUERY...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmesa_spark import queries as Q
from osmesa_spark.session import get_spark, ship_package


def main(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("trainer-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.registry()
    registry["pricing_summary"].spark(spark, sf_dir).count()
    ship_package(spark)

    def _preload(it):
        import osmesa_spark.operators.buildings  # noqa: F401
        import osmesa_spark.operators.multimodal  # noqa: F401
        return it

    spark.range(64).repartition(32).mapInPandas(
        _preload, schema="id long"
    ).count()

    jsc = spark.sparkContext._jsc.sc()
    tracker = jsc.statusTracker()

    def job_ids() -> set[int]:
        return set(tracker.getJobIdsForGroup(None))

    for name in names:
        spec = registry[name]
        # two passes: first warms codegen/footers, second is measured
        for label in ("warm", "measured"):
            before = job_ids()
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            t1 = time.perf_counter()
            ctor_jobs = job_ids() - before
            df.count()
            t2 = time.perf_counter()
            all_jobs = job_ids() - before
            if label == "warm":
                continue
            print(f"\n=== {name}: ctor {t1 - t0:.2f}s ({len(ctor_jobs)} jobs), "
                  f"action {t2 - t1:.2f}s ({len(all_jobs) - len(ctor_jobs)} jobs)")
            for jid in sorted(all_jobs):
                info = tracker.getJobInfo(jid)
                if info is None:
                    continue
                sids = list(info.get().stageIds())
                ntasks = 0
                sdur = 0.0
                for sid in sids:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.isDefined():
                        ntasks += si.get().numTasks()
                tag = "CTOR" if jid in ctor_jobs else "act "
                print(f"  [{tag}] job {jid}: {len(sids)} stages, {ntasks} tasks")


if __name__ == "__main__":
    main(sys.argv[1:])
