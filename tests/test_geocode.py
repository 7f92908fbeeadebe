"""True point-in-polygon geocode (J10): pure-Column even-odd ray-cast vs
bbox containment — the concave fixture country makes the two provably
differ (VERDICT r2 'what's missing' #2, Countries.scala parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmesa_spark.datagen import COUNTRY_POLYGONS
from osmesa_spark.operators.geocode import (
    lookup_codes,
    lookup_codes_polygon,
)

# L-shape DDD: south half + north-east quadrant of [-10,10]^2
CASES = [
    (5.0, -5.0, True),    # south half — inside
    (5.0, 5.0, True),     # NE quadrant — inside
    (-5.0, 5.0, False),   # NW quadrant — inside the ENVELOPE, outside the L
    (-11.0, 0.5, False),  # outside envelope entirely
    (-5.0, -9.9, True),   # near south edge — inside
]


def _codes(spark, pts):
    df = spark.createDataFrame(pts, "lon double, lat double")
    return [
        (r["lon"], r["lat"], set(r["codes"]))
        for r in df.select(
            "lon",
            "lat",
            lookup_codes_polygon(
                F.col("lon"), F.col("lat"), COUNTRY_POLYGONS
            ).alias("codes"),
        ).collect()
    ]


def test_raycast_concave_membership(spark):
    rows = _codes(spark, [(lon, lat) for lon, lat, _ in CASES])
    for (lon, lat, inside), (_, _, codes) in zip(CASES, rows):
        assert ("DDD" in codes) == inside, (lon, lat, codes)


def test_raycast_rectangles_match_bbox_interior(spark):
    """On strictly-interior points the polygon path and bbox path agree for
    the rectangular countries."""
    pts = [(0.0, 0.0), (30.0, 10.0), (-50.0, 40.0), (15.0, 15.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    from osmesa_spark.datagen import COUNTRIES

    got = df.select(
        lookup_codes(F.col("lon"), F.col("lat"), COUNTRIES).alias("bbox"),
        lookup_codes_polygon(
            F.col("lon"), F.col("lat"),
            {k: v for k, v in COUNTRY_POLYGONS.items() if k != "DDD"},
        ).alias("poly"),
    ).collect()
    for r in got:
        assert sorted(r["bbox"]) == sorted(r["poly"])


def test_bbox_and_polygon_differ_on_concave_fixture(spark):
    """The driver fixture has real nodes in DDD's envelope but outside the
    L — the exact concave-border wrongness the bbox-only geocoder had."""
    from osmesa_spark import queries as Q

    coded = Q.registry()["osm_geocode"].spark(spark, "")
    ddd = coded.where(F.col("code") == "DDD").count()
    aaa = coded.where(F.col("code") == "AAA").count()
    assert 0 < ddd < aaa, (ddd, aaa)  # envelope hits pruned by the ray-cast


def test_raycast_plan_is_pure_column(spark):
    from osmesa_spark import queries as Q
    from osmesa_spark.plans import assert_scaleable

    df = Q.registry()["osm_geocode"].spark(spark, "")
    assert_scaleable(df, allow_python=False)
