"""Interleaved same-session A/B for the r11 construction-metadata memos
(table-schema memo in queries._read_parquet + ensure_parallelism probe
memo): "old" reps clear both memo dicts before constructing (restoring
the per-construction inference/probe jobs), "new" reps run warm. Times
construct+count, bench methodology, alternating order per rep.

Usage: python scripts/ab_schema_memo.py [reps] [q1,q2,...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmesa_spark import queries as Q
from osmesa_spark import util as U
from osmesa_spark.session import get_spark, ship_package

DEFAULT = (
    "pricing_summary,top_revenue_orders,osm_changeset_stats,"
    "osm_geocode_grid,osm_geocode_realworld,doc_winnow_fingerprints,"
    "knn_lsh,building_match_volume,range_temporal_join,event_sessions"
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT).split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-schema-memo")
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    reg["pricing_summary"].spark(spark, sf_dir).count()
    ship_package(spark)
    res = {n: {"old": [], "new": []} for n in names}
    for rep in range(reps):
        for variant in ["old", "new"] if rep % 2 == 0 else ["new", "old"]:
            for n in names:
                if variant == "old":
                    Q._TABLE_SCHEMAS.clear()
                    U._PROBE_MEMO.clear()
                t0 = time.perf_counter()
                reg[n].spark(spark, sf_dir).count()
                res[n][variant].append(time.perf_counter() - t0)
            import gc

            gc.collect()
    tot = {"old": 0.0, "new": 0.0}
    for n in names:
        o = statistics.median(res[n]["old"])
        w = statistics.median(res[n]["new"])
        tot["old"] += o
        tot["new"] += w
        print(f"{n}: old {o:.3f} new {w:.3f} ({o / w:.2f}x)")
    print(
        f"TOTAL old {tot['old']:.2f} new {tot['new']:.2f} "
        f"({tot['old'] / tot['new']:.2f}x)  load {os.getloadavg()}"
    )


if __name__ == "__main__":
    main()
