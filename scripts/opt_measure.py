"""Round-10 optimization measurement harness.

Subcommands:
  plans  [--out DIR] [--queries a,b,...]   capture explain("formatted") per query
  time   [--reps N] [--queries a,b,...]    per-query wall medians (count action,
                                           same methodology as bench.py) printed
                                           as JSON
  noop   [--reps N] [--queries a,b,...]    same but timed with the noop sink
                                           (computes every column; guide §1.4)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Used by the builder to isolate per-change deltas without paying a full
111-query bench run; the committed bench numbers still come from bench.py.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmesa_spark import queries as Q
from osmesa_spark.session import get_spark, ship_package


def _warm(spark, sf_dir):
    registry = Q.registry()
    registry["pricing_summary"].spark(spark, sf_dir).count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        df = Q._t(spark, sf_dir, t)
        df.select(df.columns[0]).limit(1).count()
    ship_package(spark)

    def _preload(it):
        import osmesa_spark.operators.buildings  # noqa: F401
        import osmesa_spark.operators.multimodal  # noqa: F401
        return it

    spark.range(64).repartition(32).mapInPandas(_preload, schema="id long").count()
    return registry


def cmd_plans(args) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    registry = _warm(spark, sf_dir)
    names = args.queries.split(",") if args.queries else list(registry)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        spec = registry[name]
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # constructor itself may need missing fixtures
            plan = f"ERROR building plan: {e}\n"
        with open(os.path.join(args.out, f"{name}{args.suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, flush=True)
        gc.collect()


def _time_queries(names, reps, action) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-time")
    spark.sparkContext.setLogLevel("ERROR")
    registry = _warm(spark, sf_dir)
    out: dict[str, dict] = {}
    for name in names:
        spec = registry[name]

        def run_once() -> float:
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            return time.perf_counter() - t0

        spark.sparkContext.setJobDescription(name)
        times = sorted(run_once() for _ in range(reps))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(times[len(times) // 2], 3),
            "min": round(times[0], 3),
            "max": round(times[-1], 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
        gc.collect()
    print("TOTAL " + json.dumps(
        {n: v["median"] for n, v in out.items()}, separators=(",", ":")
    ))


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("plans")
    pp.add_argument("--out", default="plans/r10")
    pp.add_argument("--suffix", default="_before")
    pp.add_argument("--queries", default=None)
    for c in ("time", "noop"):
        tp = sub.add_parser(c)
        tp.add_argument("--reps", type=int, default=3)
        tp.add_argument("--queries", required=True)
    args = p.parse_args()
    if args.cmd == "plans":
        cmd_plans(args)
    else:
        _time_queries(args.queries.split(","), args.reps, args.cmd)


if __name__ == "__main__":
    main()
