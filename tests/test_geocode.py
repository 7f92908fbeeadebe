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


def test_auto_dispatch_thresholds(spark):
    """Small sets stay on the inlined literal ray-cast (fastest at fixture
    scale); big sets go through the broadcast grid index (no plan blowup)."""
    from osmesa_spark.operators.geocode import geocode_polygons_auto
    from osmesa_spark.plans import audit_plan

    df = spark.createDataFrame([(0.5, 0.5)], "lon double, lat double").select(
        F.array(
            F.struct(F.col("lon").alias("lon"), F.col("lat").alias("lat"))
        ).alias("geom")
    )
    small = geocode_polygons_auto(df, COUNTRY_POLYGONS)
    assert audit_plan(small).broadcast_joins == 0
    big = geocode_polygons_auto(df, _wobbly_countries(50, 100))
    assert audit_plan(big).broadcast_joins >= 1


# ---------------------------------------------------------------------------
# coarse-grid index (STRtree-equivalent scale path)
# ---------------------------------------------------------------------------


def _wobbly_countries(n_countries: int, n_verts: int) -> dict:
    """High-complexity synthetic world: non-overlapping concave 'wobbly
    circle' countries (r(t) = R(1 + 0.35 sin(7t))) laid out on a grid —
    the vertex-count/polygon-count regime of real country borders."""
    import math

    out = {}
    cols = 25
    for i in range(n_countries):
        cx = -170.0 + (i % cols) * 14.0
        cy = -75.0 + (i // cols) * 12.0
        verts = []
        for k in range(n_verts):
            t = 2.0 * math.pi * k / n_verts
            r = 4.0 * (1.0 + 0.35 * math.sin(7.0 * t + i))
            verts.append((cx + r * math.cos(t), cy + r * math.sin(t)))
        out[f"C{i:03d}"] = verts
    return out


def test_grid_matches_literal_raycast_on_fixture(spark):
    """geocode_grid must return exactly what geocode_polygons returns on
    the driver fixture (incl. the concave L and points on sure/candidate
    cells)."""
    from osmesa_spark.operators.geocode import geocode_grid, geocode_polygons

    pts = [
        (float(x) / 3.0, float(y) / 3.0)
        for x in range(-40, 41, 5)
        for y in range(-35, 36, 5)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double").select(
        F.array(
            F.struct(F.col("lon").alias("lon"), F.col("lat").alias("lat"))
        ).alias("geom"),
        "lon",
        "lat",
    )
    lit = geocode_polygons(df, COUNTRY_POLYGONS).select(
        "lon", "lat", F.array_sort("countries").alias("countries")
    )
    grid = geocode_grid(df, COUNTRY_POLYGONS, nx=36, ny=18).select(
        "lon", "lat", "countries"
    )
    a = {(r["lon"], r["lat"]): list(r["countries"]) for r in lit.collect()}
    b = {(r["lon"], r["lat"]): list(r["countries"]) for r in grid.collect()}
    assert a == b


def test_grid_index_high_vertex_complexity(spark):
    """311-country/real-vertex-count regime: 300 concave countries x 400
    vertices. The literal path would put 240k vertex literals in the plan;
    the grid path ships them as broadcast DATA and each point ray-casts
    only its cell's candidates. Verified against driver-side numpy PNPOLY
    ground truth."""
    from osmesa_spark.operators.geocode import (
        _pnpoly_np,
        build_grid_index,
        geocode_grid,
    )

    countries = _wobbly_countries(300, 400)
    # 1.25-degree cells: fine enough that country interiors span whole cells
    index = build_grid_index(countries, nx=288, ny=144)
    # interior-cell short-circuit must actually engage on this world
    assert any(e["sure"] for e in index["cells"].values())

    import random

    rng = random.Random(7)
    pts = [
        (rng.uniform(-175.0, 175.0), rng.uniform(-85.0, 85.0))
        for _ in range(400)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double").select(
        F.array(
            F.struct(F.col("lon").alias("lon"), F.col("lat").alias("lat"))
        ).alias("geom"),
        "lon",
        "lat",
    )
    got = {
        (r["lon"], r["lat"]): set(r["countries"])
        for r in geocode_grid(df, countries, nx=288, ny=144).collect()
    }
    for lon, lat in pts:
        expect = {
            code
            for code, ring in countries.items()
            if _pnpoly_np(
                lon, lat, [x for x, _ in ring], [y for _, y in ring]
            )
        }
        assert got[(lon, lat)] == expect, (lon, lat)


def test_keyhole_multiring_holes_and_parts(spark):
    """A donut country (hole) + a two-part archipelago, loaded from a
    GeoJSON file and folded through keyhole_ring: the hole excludes, both
    parts include, and literal / grid / independent per-ring-XOR ground
    truth all agree."""
    import json
    import tempfile

    from osmesa_spark.operators.geocode import (
        _pnpoly_np,
        geocode_grid,
        geocode_polygons,
        load_countries_geojson,
    )

    donut_outer = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    donut_hole = [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]
    isle_a = [[20, 0], [24, 0], [24, 4], [20, 4], [20, 0]]
    isle_b = [[30, 0], [34, 0], [34, 4], [30, 4], [30, 0]]
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"ADM0_A3": "DNT"},
             "geometry": {"type": "Polygon",
                          "coordinates": [donut_outer, donut_hole]}},
            {"type": "Feature", "properties": {"ISO_A3": "ARC"},
             "geometry": {"type": "MultiPolygon",
                          "coordinates": [[isle_a], [isle_b]]}},
        ],
    }
    with tempfile.NamedTemporaryFile("w", suffix=".geojson", delete=False) as f:
        json.dump(fc, f)
        path = f.name
    countries = load_countries_geojson(path)
    assert set(countries) == {"DNT", "ARC"}

    pts = [
        (1, 1.0, 1.0, ["DNT"]),    # inside donut, outside hole
        (2, 5.0, 5.0, []),         # inside the hole -> excluded
        (3, 22.0, 2.0, ["ARC"]),   # island part 1
        (4, 32.0, 2.0, ["ARC"]),   # island part 2
        (5, 27.0, 2.0, []),        # sea between the parts
        (6, 15.0, 5.0, []),        # between donut and archipelago
    ]
    df = spark.createDataFrame(
        [(i, [{"lon": x, "lat": y}]) for i, x, y, _ in pts],
        "id int, geom array<struct<lon:double,lat:double>>",
    )
    for coder in (geocode_polygons, geocode_grid):
        got = {
            r.id: sorted(r.countries)
            for r in coder(df, countries).select("id", "countries").collect()
        }
        for i, x, y, want in pts:
            assert got[i] == want, (coder.__name__, i, got[i], want)
    # independent ground truth: XOR of per-ring PNPOLY parities must match
    # the keyhole parity for every probe
    for i, x, y, want in pts:
        for code, rings in (("DNT", [donut_outer[:-1], donut_hole[:-1]]),
                            ("ARC", [isle_a[:-1], isle_b[:-1]])):
            parity = False
            for ring in rings:
                parity ^= _pnpoly_np(
                    x, y, [p[0] for p in ring], [p[1] for p in ring]
                )
            assert parity == (code in want), (i, code)


def test_grid_index_keyhole_fuzz():
    """Hypothesis-style fuzz (seeded sweep, driver-side only): for random
    multi-ring countries (concave star mainland, optional hole, optional
    island) folded through `keyhole_ring`, the grid index's cell decision
    (sure-membership OR candidate envelope+PNPOLY on the folded ring) must
    equal the per-ring XOR ground truth at every probe point. This fuzzes
    the two classification layers with real risk — the conservative
    touched-cell marking and the keyhole parity equivalence — across
    geometry the fixed fixtures don't enumerate."""
    import math
    import random

    from osmesa_spark.operators.geocode import (
        _pnpoly_np,
        build_grid_index,
        keyhole_ring,
    )

    for seed in range(25):
        rng = random.Random(971 + seed)
        countries = {}
        raw_rings: dict[str, list] = {}
        for c in range(3):
            cx = rng.uniform(-140.0, 140.0)
            cy = rng.uniform(-55.0, 55.0)
            R = rng.uniform(2.0, 9.0)
            k = rng.randint(2, 7)
            phi = rng.uniform(0, 6.28)
            nv = rng.randint(6, 40)
            mainland = [
                (
                    cx + R * (0.6 + 0.35 * math.sin(k * t + phi)) * math.cos(t),
                    cy + R * (0.6 + 0.35 * math.sin(k * t + phi)) * math.sin(t),
                )
                for t in [2 * math.pi * v / nv for v in range(nv)]
            ]
            rings = [mainland]
            if rng.random() < 0.5:  # lake inside the min mainland radius
                hr = 0.12 * R
                rings.append(
                    [
                        (cx + hr * math.cos(t), cy + hr * math.sin(t))
                        for t in [2 * math.pi * v / 12 for v in range(12)]
                    ]
                )
            if rng.random() < 0.5:  # island beyond the max mainland radius
                ang = rng.uniform(0, 6.28)
                ix_, iy_ = cx + 1.2 * R * math.cos(ang), cy + 1.2 * R * math.sin(ang)
                ir = 0.1 * R
                rings.append(
                    [
                        (ix_ + ir * math.cos(t), iy_ + ir * math.sin(t))
                        for t in [2 * math.pi * v / 10 for v in range(10)]
                    ]
                )
            code = f"C{c}"
            raw_rings[code] = rings
            countries[code] = keyhole_ring(rings)
        nx, ny = 72, 36
        idx = build_grid_index(countries, nx, ny)
        dx, dy = 360.0 / nx, 180.0 / ny
        for _ in range(60):
            px = rng.uniform(-179.0, 179.0)
            py = rng.uniform(-70.0, 70.0)
            ix = min(max(int((px + 180.0) // dx), 0), nx - 1)
            iy = min(max(int((py + 90.0) // dy), 0), ny - 1)
            entry = idx["cells"].get(ix * ny + iy)
            got = set(entry["sure"]) if entry else set()
            for code in entry["cand"] if entry else []:
                ring = countries[code]
                xs = [x for x, _ in ring]
                ys = [y for _, y in ring]
                if (
                    min(xs) <= px <= max(xs)
                    and min(ys) <= py <= max(ys)
                    and _pnpoly_np(px, py, xs, ys)
                ):
                    got.add(code)
            want = set()
            for code, rings in raw_rings.items():
                inside = False
                for r in rings:
                    if _pnpoly_np(
                        px, py, [x for x, _ in r], [y for _, y in r]
                    ):
                        inside = not inside
                if inside:
                    want.add(code)
            assert got == want, (seed, px, py, got, want)
