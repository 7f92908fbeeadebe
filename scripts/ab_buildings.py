"""Interleaved same-session A/B for the r11 buildings changes:
old = no id-spread in _bm_rects + no kernel-width repartition in
score_pairs; new = current code. Alternating reps in one Spark session so
ambient box noise hits both variants equally.

Usage: python scripts/ab_buildings.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmesa_spark import queries as Q
from osmesa_spark.operators import buildings as bm
from osmesa_spark.session import get_spark, ship_package
from osmesa_spark.util import ensure_parallelism  # noqa: F401


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-buildings")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.registry()
    registry["pricing_summary"].spark(spark, sf_dir).count()
    ship_package(spark)

    def _preload(it):
        import osmesa_spark.operators.buildings  # noqa: F401
        return it

    spark.range(64).repartition(32).mapInPandas(
        _preload, schema="id long"
    ).count()

    new_rects = Q._bm_rects
    new_score = bm.score_pairs

    def old_rects(spark_, sf_dir_, side):
        # replicate the pre-change _bm_rects: synthesis below the spread
        df = new_rects(spark_, sf_dir_, side)
        return df  # placeholder; replaced below

    # Rebuild the OLD _bm_rects from the committed shape: no pre-spread.
    import pyspark.sql.functions as F

    def old_rects(spark_, sf_dir_, side):  # noqa: F811
        ev = Q._t(spark_, sf_dir_, "events").select("event_id")
        x0 = (F.col("event_id") % 90000) * 0.002
        y0 = ((F.col("event_id") * 13) % 45000) * 0.002
        if side in ("ia", "it"):
            x0 = (F.col("event_id") % 300) * 0.05
            y0 = F.floor(F.col("event_id") / 300) * 0.05
            if side == "it":
                x0 = x0 + (F.col("event_id") % 4) * 0.0002
        elif side == "t":
            x0 = x0 + (F.col("event_id") % 4) * 0.0002
        elif side == "b":
            match = F.col("event_id") % 2 == 0
            x0 = x0 + F.when(
                match, ((F.col("event_id") % 7) - 3) * 0.000411
            ).otherwise(50.0)
            y0 = y0 + F.when(
                match, ((F.col("event_id") % 5) - 2) * 0.000307
            ).otherwise(20.0)
        w = ((F.col("event_id") % 13) + 7) * 0.00037
        h = ((F.col("event_id") % 11) + 5) * 0.00041

        def pt(x, y):
            return F.struct(x.alias("x"), y.alias("y"))

        return ev.select(
            F.col("event_id").alias("id"),
            F.array(
                pt(x0, y0), pt(x0 + w, y0), pt(x0 + w, y0 + h),
                pt(x0, y0 + h)
            ).alias("vertices"),
        )

    def old_score(pairs, with_vertex=True):
        ship_package(pairs.sparkSession)
        import pandas as pd  # noqa: F401

        # call the CURRENT kernel body but without the width repartition:
        # temporarily neutralize repartition on this frame
        import types

        orig = pairs.repartition
        pairs2 = pairs
        pairs2.repartition = types.MethodType(
            lambda self, *a, **k: self, pairs2
        )
        try:
            out = new_score(pairs2, with_vertex=with_vertex)
        finally:
            pairs2.repartition = orig
        return out

    names = ["building_match_volume", "building_match_support",
             "building_match"]
    res: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in names
    }
    # AB_MODE: both (default) | rects (only the _bm_rects spread differs)
    # | score (only the kernel-width repartition differs)
    mode = os.environ.get("AB_MODE", "both")
    for rep in range(reps):
        order = ["old", "new"] if rep % 2 == 0 else ["new", "old"]
        for variant in order:
            if variant == "old":
                Q._bm_rects = old_rects if mode in ("both", "rects") else new_rects
                bm.score_pairs = old_score if mode in ("both", "score") else new_score
            else:
                Q._bm_rects = new_rects
                bm.score_pairs = new_score
            for n in names:
                t0 = time.perf_counter()
                registry[n].spark(spark, sf_dir).count()
                res[n][variant].append(time.perf_counter() - t0)
            import gc

            gc.collect()
    for n in names:
        o, w = res[n]["old"], res[n]["new"]
        print(
            f"{n}: old median {statistics.median(o):.3f} "
            f"(min {min(o):.3f}) new median {statistics.median(w):.3f} "
            f"(min {min(w):.3f}) speedup "
            f"{statistics.median(o) / statistics.median(w):.2f}x"
        )


if __name__ == "__main__":
    main()
