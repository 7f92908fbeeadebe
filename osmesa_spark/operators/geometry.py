"""Geometry construction: points from tagged nodes, way reconstruction from
node references, previous-geometry windows, linear/area deltas.

Reference semantics (vectorpipe `constructPointGeometries` /
`reconstructWayGeometries`, call sites
`src/apps/.../ChangesetStatsCreator.scala:98-114`; the temporal-join shape is
`FacetedEditHistogramTileCreator.scala:68-110`):

  * point geometries: tagged nodes, coords as doubles
  * way reconstruction: explode `nds` with position, join each ref against the
    node version VALID AT the way version's timestamp (equi on ref +
    `node.timestamp <= way.timestamp < coalesce(node.validUntil, ∞)`),
    re-assemble the vertex array in `nds` order
  * geometry kind: Polygon if ring closed AND `isArea(tags)` else LineString
  * `prevGeom` = lag over (id) ordered by updated (stats/package.scala:62-68)
  * linearDelta / areaDelta (stats/package.scala:37-60) via spherical length /
    spherical-excess ring area — no UDFs, all Column HOFs

Scale notes: the explode⋈nodes join shuffles by node id — the heaviest stage
at planet scale (SURVEY §3.1). Both sides arrive partitioned by the same key;
AQE skew-split covers mega-nodes. The vertex re-assembly is
`array_sort(collect_list(struct(pos, ...)))` — partial agg applies since
collect_list here is keyed by (wayId, version), bounded by way size (~2k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmesa_spark.functions import geo
from osmesa_spark.functions.tags import is_area, is_linear, is_tagged


def construct_point_geometries(nodes: DataFrame, tagged_only: bool = True) -> DataFrame:
    """Tagged node versions as point features:
    (id, type='node', geomType, geom=[{lon,lat}], tags, changeset, updated,
     uid, user, version, minorVersion, visible)."""
    out = nodes.where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    if tagged_only:
        out = out.where(is_tagged("tags"))
    return out.select(
        "id",
        F.lit("node").alias("type"),
        F.lit("Point").alias("geomType"),
        F.array(F.struct(F.col("lon"), F.col("lat"))).alias("geom"),
        "tags",
        "changeset",
        F.col("timestamp").alias("updated"),
        "validUntil",
        "uid",
        "user",
        "version",
        "minorVersion",
        "visible",
    )


def reconstruct_way_geometries(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Way versions with assembled vertex arrays (same feature shape as
    construct_point_geometries, geomType LineString|Polygon).

    nodes must carry validUntil (preprocess_nodes). Way versions whose refs
    resolve to zero nodes are dropped; missing individual refs are skipped
    (matches the reference's lenient assembly)."""
    w = ways.select(
        F.col("id").alias("wayId"),
        "tags",
        "changeset",
        F.col("timestamp").alias("updated"),
        "validUntil",
        "uid",
        "user",
        "version",
        "minorVersion",
        "visible",
        F.posexplode_outer("nds").alias("pos", "ref"),
    )
    n = nodes.select(
        F.col("id").alias("ref"),
        F.col("lon").alias("n_lon"),
        F.col("lat").alias("n_lat"),
        F.col("timestamp").alias("n_ts"),
        F.col("validUntil").alias("n_validUntil"),
        F.col("visible").alias("n_visible"),
    )
    joined = w.join(
        n,
        (w.ref == n.ref)
        & (n.n_ts <= w.updated)
        & (w.updated < F.coalesce(n.n_validUntil, F.lit("9999-01-01").cast("timestamp"))),
        "left",
    ).drop(n.ref)
    assembled = (
        joined.groupBy(
            "wayId", "updated", "version", "minorVersion"
        )
        .agg(
            F.first("tags").alias("tags"),
            F.first("changeset").alias("changeset"),
            F.first("validUntil").alias("validUntil"),
            F.first("uid").alias("uid"),
            F.first("user").alias("user"),
            F.first("visible").alias("visible"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("n_lon").isNotNull()
                        & F.col("n_lat").isNotNull()
                        & F.col("n_visible"),
                        F.struct(
                            F.col("pos"),
                            F.col("n_lon").alias("lon"),
                            F.col("n_lat").alias("lat"),
                        ),
                    )
                )
            ).alias("verts"),
        )
        .where(F.size("verts") >= 2)
    )
    vertices = F.transform(
        F.col("verts"),
        lambda v: F.struct(v.getField("lon").alias("lon"), v.getField("lat").alias("lat")),
    )
    # F.get is OOB-null-safe (ANSI mode + Catalyst filter reordering can
    # evaluate this on rows the size-guard would exclude)
    closed = (F.size(vertices) >= 4) & (
        F.get(vertices, F.lit(0)) == F.get(vertices, F.size(vertices) - 1)
    )
    return assembled.select(
        F.col("wayId").alias("id"),
        F.lit("way").alias("type"),
        F.when(closed & is_area("tags"), "Polygon")
        .otherwise("LineString")
        .alias("geomType"),
        vertices.alias("geom"),
        "tags",
        "changeset",
        "updated",
        "validUntil",
        "uid",
        "user",
        "version",
        "minorVersion",
        "visible",
    )


def with_prev_geom(features: DataFrame) -> DataFrame:
    """prevGeom/prevGeomType lag per (type, id) ordered by updated —
    stats/package.scala:62-68."""
    w = Window.partitionBy("type", "id").orderBy("updated")
    return features.withColumn("prevGeom", F.lag("geom").over(w)).withColumn(
        "prevGeomType", F.lag("geomType").over(w)
    )


def with_deltas(features: DataFrame) -> DataFrame:
    """linearDelta (m) and areaDelta (m²) — stats/package.scala:37-60.
    Linear delta applies only to linear-tagged features; area delta to
    polygon (prev)geometries. Both |new − old| with 0 for missing sides."""
    def _len(geom_col: str, type_col: str):
        return F.coalesce(
            F.when(
                F.col(type_col) == "LineString", geo.line_length_m(F.col(geom_col))
            ),
            F.lit(0.0),
        )

    def _area(geom_col: str, type_col: str):
        return F.coalesce(
            F.when(
                F.col(type_col) == "Polygon", geo.ring_area_m2(F.col(geom_col))
            ),
            F.lit(0.0),
        )

    return features.withColumn(
        "linearDelta",
        F.when(
            is_linear("tags"),
            F.abs(_len("geom", "geomType") - _len("prevGeom", "prevGeomType")),
        ).otherwise(F.lit(0.0)),
    ).withColumn(
        "areaDelta",
        F.abs(_area("geom", "geomType") - _area("prevGeom", "prevGeomType")),
    )
