"""UTM transverse-Mercator Column math (stats/package.scala:17-32 parity):
exact fixed points of the projection, distance preservation against the
independently-implemented haversine, and planar-vs-spherical area agreement.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from osmesa_spark.functions import geo


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_utm_zone_central_meridians(spark):
    cases = {-177.5: -177.0, 0.5: 3.0, 7.85: 9.0, 179.9: 177.0, -180.0: -177.0}
    for lon, want in cases.items():
        got = _one(spark, geo.utm_lon0(F.lit(lon)))
        assert got == want, (lon, got, want)


def test_utm_fixed_points(spark):
    """Equator on the central meridian projects to exactly (500000, 0); the
    pole's northing is k0 × the WGS84 quarter meridian (10 001 965.729 m)."""
    e0 = _one(spark, geo.utm_easting(F.lit(3.0), F.lit(0.0), F.lit(3.0)))
    n0 = _one(spark, geo.utm_northing(F.lit(3.0), F.lit(0.0), F.lit(3.0)))
    assert abs(e0 - 500_000.0) < 1e-6
    assert abs(n0 - 0.0) < 1e-6
    npole = _one(spark, geo.utm_northing(F.lit(3.0), F.lit(90.0), F.lit(3.0)))
    assert abs(npole - 0.9996 * 10_001_965.7293) < 1.0


def test_utm_preserves_local_distances(spark):
    """Euclidean distance in UTM ≈ great-circle distance for nearby points
    close to the central meridian (within the sphere-vs-ellipsoid 0.5%)."""
    pairs = [
        ((3.0, 0.0), (3.01, 0.0)),     # E-W at equator
        ((3.0, 45.0), (3.0, 45.01)),   # N-S mid-latitude
        ((3.0, 60.0), (3.02, 60.015)),  # diagonal, high latitude
        ((1.0, -33.0), (1.01, -33.01)),  # southern hemisphere
    ]
    for (lon1, lat1), (lon2, lat2) in pairs:
        lon0 = geo.utm_lon0(F.lit((lon1 + lon2) / 2))
        dx = geo.utm_easting(F.lit(lon2), F.lit(lat2), lon0) - geo.utm_easting(
            F.lit(lon1), F.lit(lat1), lon0
        )
        dy = geo.utm_northing(F.lit(lon2), F.lit(lat2), lon0) - geo.utm_northing(
            F.lit(lon1), F.lit(lat1), lon0
        )
        planar = _one(spark, F.sqrt(dx * dx + dy * dy))
        sphere = _one(
            spark,
            geo.haversine_m(F.lit(lon1), F.lit(lat1), F.lit(lon2), F.lit(lat2)),
        )
        assert abs(planar - sphere) / sphere < 0.005, (
            (lon1, lat1, lon2, lat2), planar, sphere,
        )


def _ring(points):
    return F.array(
        *[
            F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat"))
            for x, y in points
        ]
    )


def test_utm_ring_area_against_analytic_and_spherical(spark):
    """A 0.01°×0.01° square at the equator is ~1113.195² m² planar; UTM
    shoelace must land within 0.2%, and track the spherical-excess area
    within 1% at mid-latitudes too."""
    eq = [(3.0, 0.0), (3.01, 0.0), (3.01, 0.01), (3.0, 0.01)]
    a_utm = _one(spark, geo.ring_area_m2_utm(_ring(eq)))
    # analytic: E-W arc a·cosφ·Δλ ≈ 1113.19 m; N-S arc uses the meridional
    # radius ≈ 6335439 m at φ=0 → ≈ 1105.74 m
    ew = math.radians(0.01) * geo.WGS84_A
    ns = math.radians(0.01) * geo.WGS84_A * (1 - geo.WGS84_E2)
    assert abs(a_utm - ew * ns) / (ew * ns) < 0.002, (a_utm, ew * ns)

    for lat in (0.0, 37.0, -52.0):
        sq = [
            (3.0, lat), (3.01, lat), (3.01, lat + 0.01), (3.0, lat + 0.01),
        ]
        utm = _one(spark, geo.ring_area_m2_utm(_ring(sq)))
        sph = _one(spark, geo.ring_area_m2(_ring(sq)))
        assert abs(utm - sph) / sph < 0.01, (lat, utm, sph)


def test_utm_area_concave_ring(spark):
    """Shoelace handles concave rings: L-shape = full square minus the
    missing quadrant (planar identity, checked to 0.2%)."""
    sq = [(3.0, 0.0), (3.02, 0.0), (3.02, 0.02), (3.0, 0.02)]
    quad = [(3.01, 0.01), (3.02, 0.01), (3.02, 0.02), (3.01, 0.02)]
    ell = [
        (3.0, 0.0), (3.02, 0.0), (3.02, 0.01), (3.01, 0.01),
        (3.01, 0.02), (3.0, 0.02),
    ]
    a_sq = _one(spark, geo.ring_area_m2_utm(_ring(sq)))
    a_q = _one(spark, geo.ring_area_m2_utm(_ring(quad)))
    a_l = _one(spark, geo.ring_area_m2_utm(_ring(ell)))
    assert abs(a_l - (a_sq - a_q)) / a_l < 0.002
