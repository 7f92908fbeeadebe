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
from osmesa_spark.util import column_memo


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


def _relation_member_refs(
    relations: DataFrame, resolve_relations: bool = False
) -> DataFrame:
    """Expand multipolygon relation versions to one row per (relation
    version, member way ref): direct way members, plus (with
    `resolve_relations`) way members reached through ONE level of
    relation-type members — the shared front half of both the
    way-timestamp (`relation_members_resolved`) and relation-timestamp
    (`relation_members_deep`) resolvers. Nested rows carry via_ref and
    sub_pos; kernel-free, all joins/explodes."""
    exploded = (
        relations.where(
            (F.col("type") == "relation")
            & F.col("visible")
            & (F.col("tags").getItem("type") == "multipolygon")
        )
        .select(
            F.col("id").alias("relId"),
            "tags",
            "changeset",
            F.col("timestamp").alias("updated"),
            "uid",
            "user",
            "version",
            F.posexplode("members").alias("pos", "m"),
        )
        .select(
            "relId",
            "tags",
            "changeset",
            "updated",
            "uid",
            "user",
            "version",
            "pos",
            F.col("m.type").alias("mtype"),
            F.col("m.ref").alias("ref"),
            F.col("m.role").alias("role"),
        )
    )
    rels = exploded.where(F.col("mtype") == "way").drop("mtype").select(
        "relId", "tags", "changeset", "updated", "uid", "user", "version",
        "pos",
        F.lit(None).cast("int").alias("sub_pos"),
        F.lit(None).cast("bigint").alias("via_ref"),
        "ref", "role",
    )
    if resolve_relations:
        far = F.lit("9999-01-01").cast("timestamp")
        # member-relation validity windows over ALL versions (visibility
        # filters AFTER window assembly, same layering as preprocess)
        rw = (
            relations.where(F.col("type") == "relation")
            .withColumn(
                "r_validUntil",
                F.lead("timestamp").over(
                    Window.partitionBy("id").orderBy("version")
                ),
            )
            .where(F.col("visible"))
            .select(
                F.col("id").alias("via_id"),
                F.col("timestamp").alias("r_updated"),
                "r_validUntil",
                F.col("members").alias("sub_members"),
            )
        )
        supers = exploded.where(F.col("mtype") == "relation").drop("mtype")
        nested = (
            supers.join(
                rw,
                (supers.ref == rw.via_id)
                & (rw.r_updated <= supers.updated)
                & (supers.updated < F.coalesce(rw.r_validUntil, far)),
                "inner",
            )
            .select(
                "relId", "tags", "changeset", "updated", "uid", "user",
                "version", "pos",
                F.col("via_id").alias("via_ref"),
                F.posexplode("sub_members").alias("sub_pos", "sm"),
            )
            .where(F.col("sm.type") == "way")
            .select(
                "relId", "tags", "changeset", "updated", "uid", "user",
                "version", "pos",
                F.col("sub_pos").cast("int").alias("sub_pos"),
                F.col("via_ref").cast("bigint").alias("via_ref"),
                F.col("sm.ref").alias("ref"),
                F.col("sm.role").alias("role"),
            )
        )
        rels = rels.unionByName(nested)
    return rels


def relation_members_resolved(
    relations: DataFrame, way_geoms: DataFrame, resolve_relations: bool = False
) -> DataFrame:
    """Multipolygon relation members temporally joined to reconstructed way
    versions — the J6 shape on the member ref: the way version whose
    [updated, validUntil) window contains the relation's timestamp.

    Simplification vs the reference (documented): member geometry is the
    way version's own reconstruction (nodes as of the WAY timestamp), not
    re-resolved at the relation timestamp — use `relation_members_deep`
    for the reference-exact relation-timestamp resolution; this variant
    stays because it reuses an already-materialized way_geoms table (one
    node join for the whole corpus instead of one per relation member).

    `resolve_relations=True` additionally resolves members with
    type='relation' ONE level deep (the reference members struct allows
    relation members; super-relation → member relation → its way members):
    the member-relation version live at the SUPER-relation's timestamp is
    picked via its own [timestamp, validUntil) validity window, its way
    members are exploded, and every resolved way joins way_geoms at the
    super-relation's timestamp — one temporal join serves both branches.
    Nested rows carry via_ref (the intermediate relation id) and sub_pos
    (position within it); direct rows have both NULL. The effective `role`
    for nested rows is the INNER way member's role (OSM multipolygon
    convention); the outer member's role is dropped.

    Output: one row per (relation version, resolved member): relId, updated,
    pos, [sub_pos, via_ref], role, way ref, member geom/closed flag, plus
    relation metadata."""
    rels = _relation_member_refs(relations, resolve_relations)
    wg = way_geoms.where(F.col("visible")).select(
        F.col("id").alias("ref"),
        F.col("geom").alias("way_geom"),
        F.col("updated").alias("w_updated"),
        F.col("validUntil").alias("w_validUntil"),
    )
    joined = rels.join(
        wg,
        (rels.ref == wg.ref)
        & (wg.w_updated <= rels.updated)
        & (
            rels.updated
            < F.coalesce(wg.w_validUntil, F.lit("9999-01-01").cast("timestamp"))
        ),
        "inner",
    ).drop(wg.ref)
    closed = (F.size("way_geom") >= 4) & (
        F.get(F.col("way_geom"), F.lit(0))
        == F.get(F.col("way_geom"), F.size("way_geom") - 1)
    )
    return joined.withColumn("member_closed", closed)


def _stitch_rings(segments: list[list[tuple]]) -> list[list[tuple]]:
    """Assemble closed rings from way segments (executor-side): already
    closed ways pass through; open ways chain greedily by shared endpoints
    (either orientation); unclosable leftovers drop — the reference's
    lenient multipolygon assembly."""
    rings: list[list[tuple]] = []
    open_segs: list[list[tuple]] = []
    for s in segments:
        if len(s) >= 4 and s[0] == s[-1]:
            rings.append(s)
        else:
            open_segs.append(list(s))
    while open_segs:
        cur = open_segs.pop(0)
        progressed = True
        while progressed and not (len(cur) >= 4 and cur[0] == cur[-1]):
            progressed = False
            for i, s in enumerate(open_segs):
                if cur[-1] == s[0]:
                    cur = cur + s[1:]
                elif cur[-1] == s[-1]:
                    cur = cur + s[-2::-1]
                elif cur[0] == s[-1]:
                    cur = s + cur[1:]
                elif cur[0] == s[0]:
                    cur = s[::-1] + cur[1:]
                else:
                    continue
                open_segs.pop(i)
                progressed = True
                break
        if len(cur) >= 4 and cur[0] == cur[-1]:
            rings.append(cur)
    return rings


def reconstruct_relation_geometries(
    relations: DataFrame,
    way_geoms: DataFrame,
    resolve_relations: bool = False,
    members: DataFrame | None = None,
) -> DataFrame:
    """Multipolygon assembly: member ways → stitched closed rings, grouped
    by role. The per-relation stitch is inherently sequential (endpoint
    chaining) so it runs in an Arrow-batched kernel over one row per
    relation version; everything upstream is joins/aggs.
    `resolve_relations=True` additionally stitches way members reached
    through one level of relation-type members (super-relations) — their
    rings join the super-relation's own assembly.

    Output: id, type='relation', geomType='MultiPolygon',
    rings: array<struct<role, ring: array<struct<lon,lat>>>>, metadata."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from osmesa_spark.session import ship_package

    # `members` overrides the default way-timestamp resolution — pass
    # relation_members_deep(...) output for the reference-exact
    # relation-timestamp member geometries; the stitch is identical
    if members is None:
        members = relation_members_resolved(
            relations, way_geoms, resolve_relations=resolve_relations
        )
    grouped = members.groupBy("relId", "updated").agg(
        F.first("tags").alias("tags"),
        F.first("changeset").alias("changeset"),
        F.first("uid").alias("uid"),
        F.first("user").alias("user"),
        F.first("version").alias("version"),
        F.collect_list(
            F.struct("pos", "sub_pos", "ref", "role", "way_geom")
        ).alias("ms"),
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("geomType", T.StringType()),
            T.StructField(
                "rings",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("role", T.StringType()),
                            T.StructField(
                                "ring",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField("lon", T.DoubleType()),
                                            T.StructField("lat", T.DoubleType()),
                                        ]
                                    )
                                ),
                            ),
                        ]
                    )
                ),
            ),
            T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
            T.StructField("changeset", T.LongType()),
            T.StructField("updated", T.TimestampType()),
            T.StructField("uid", T.LongType()),
            T.StructField("user", T.StringType()),
            T.StructField("version", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rel_id, updated, tags, cs, uid, user, version, ms in zip(
                pdf["relId"], pdf["updated"], pdf["tags"], pdf["changeset"],
                pdf["uid"], pdf["user"], pdf["version"], pdf["ms"],
            ):
                # A way reached both directly and through a nested
                # relation member (or listed twice) enters the stitch
                # ONCE per (ref, role): duplicates would emit duplicate
                # rings. First occurrence by (pos, sub_pos) wins — the
                # direct membership (sub_pos null) outranks the nested
                # one at the same position. Kernel-side, so dedup costs
                # no extra shuffle.
                def _ord(m):
                    sp = m["sub_pos"]
                    if sp is None or (isinstance(sp, float) and sp != sp):
                        sp = -1
                    return (m["pos"], sp)

                seen: set = set()
                mdedup = []
                for m in sorted(ms, key=_ord):
                    k = (m["ref"], m["role"])
                    if k in seen:
                        continue
                    seen.add(k)
                    mdedup.append(m)
                rings = []
                for role in ("outer", "inner"):
                    segs = [
                        [(p["lon"], p["lat"]) for p in m["way_geom"]]
                        for m in mdedup
                        if m["role"] == role
                    ]
                    for ring in _stitch_rings(segs):
                        rings.append(
                            {
                                "role": role,
                                "ring": [
                                    {"lon": x, "lat": y} for x, y in ring
                                ],
                            }
                        )
                out.append(
                    {
                        "id": int(rel_id),
                        "geomType": "MultiPolygon",
                        "rings": rings,
                        "tags": tags,
                        "changeset": int(cs),
                        "updated": updated,
                        "uid": int(uid),
                        "user": user,
                        "version": int(version),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in schema.fields]
            )

    ship_package(grouped.sparkSession)
    return grouped.mapInPandas(kernel, schema=schema)


def with_prev_geom(features: DataFrame) -> DataFrame:
    """prevGeom/prevGeomType lag per (type, id) ordered by updated —
    stats/package.scala:62-68."""
    w = Window.partitionBy("type", "id").orderBy("updated")
    return features.withColumn("prevGeom", F.lag("geom").over(w)).withColumn(
        "prevGeomType", F.lag("geomType").over(w)
    )


def with_deltas(features: DataFrame, area: str = "spherical") -> DataFrame:
    """linearDelta (m) and areaDelta (m²) — stats/package.scala:37-60.
    Linear delta applies only to linear-tagged features; area delta to
    polygon (prev)geometries. Both |new − old| with 0 for missing sides.

    `area` picks the ring-area model: "utm" is the reference's exact
    pipeline (transformLatLngToUtm + planar shoelace, here as Column trig —
    geo.ring_area_m2_utm); "spherical" (default) is the spherical-excess
    substitution the oracle-checked stats queries replay (the two agree to
    <1% on building/landuse-sized rings, property-tested in test_utm.py)."""
    lin, ar = _delta_columns(area)
    return features.withColumn("linearDelta", lin).withColumn(
        "areaDelta", ar
    )


@column_memo
def _delta_columns(area: str):
    """The two delta Columns of `with_deltas`, memoized: trig-heavy trees
    over fixed column names, rebuilt identically per query construction
    (~1.4 s of py4j driver chatter each time — see util.column_memo)."""
    area_fn = geo.ring_area_m2_utm if area == "utm" else geo.ring_area_m2

    def _len(geom_col: str, type_col: str):
        return F.coalesce(
            F.when(
                F.col(type_col) == "LineString", geo.line_length_m(geom_col)
            ),
            F.lit(0.0),
        )

    def _area(geom_col: str, type_col: str):
        return F.coalesce(
            F.when(
                F.col(type_col) == "Polygon", area_fn(geom_col)
            ),
            F.lit(0.0),
        )

    return (
        F.when(
            is_linear("tags"),
            F.abs(_len("geom", "geomType") - _len("prevGeom", "prevGeomType")),
        ).otherwise(F.lit(0.0)),
        F.abs(_area("geom", "geomType") - _area("prevGeom", "prevGeomType")),
    )


def relation_members_deep(
    relations: DataFrame,
    ways: DataFrame,
    nodes: DataFrame,
    resolve_relations: bool = True,
) -> DataFrame:
    """Multipolygon members with geometry re-resolved AT THE RELATION
    TIMESTAMP — the reference's exact semantics, removing
    `relation_members_resolved`'s documented simplification: the member
    way VERSION is the one live at the relation's timestamp AND its node
    coordinates are the node versions live at that same timestamp (a way
    whose nodes moved after the way's own last edit still renders where
    the nodes were when the RELATION was saved).

    Inputs: raw history `relations` and `ways` rows (validity windows are
    derived here over ALL versions, visibility filtered after — the
    preprocess layering), `nodes` preprocessed (validUntil present).

    Plan shape: member expansion (shared helper) → temporal equi-join to
    the live way version → nds explode → node-id-keyed temporal join
    anchored at the RELATION timestamp → per-member vertex assembly
    (array_sort(collect_list), bounded by way size). Two id-keyed
    shuffles, no kernel.

    Output: relation_members_resolved's shape — relId, updated, pos,
    sub_pos, via_ref, ref, role, metadata, way_geom, member_closed."""
    far = F.lit("9999-01-01").cast("timestamp")
    rels = _relation_member_refs(relations, resolve_relations)
    wval = (
        ways.where(F.col("type") == "way")
        .withColumn(
            "w_validUntil",
            F.lead("timestamp").over(
                Window.partitionBy("id").orderBy("version")
            ),
        )
        .where(F.col("visible"))
        .select(
            F.col("id").alias("w_id"),
            F.col("version").alias("w_version"),
            F.col("timestamp").alias("w_ts"),
            "w_validUntil",
            F.col("nds").alias("w_nds"),
        )
    )
    live = rels.join(
        wval,
        (rels.ref == wval.w_id)
        & (wval.w_ts <= rels.updated)
        & (rels.updated < F.coalesce(wval.w_validUntil, far)),
        "inner",
    ).select(
        "relId", "tags", "changeset", "updated", "uid", "user", "version",
        "pos", "sub_pos", "via_ref", "ref", "role", "w_version",
        F.posexplode("w_nds").alias("npos", "nref"),
    )
    n = nodes.select(
        F.col("id").alias("nref"),
        F.col("lon").alias("n_lon"),
        F.col("lat").alias("n_lat"),
        F.col("timestamp").alias("n_ts"),
        F.col("validUntil").alias("n_validUntil"),
        F.col("visible").alias("n_visible"),
    )
    joined = live.join(
        n,
        (live.nref == n.nref)
        & (n.n_ts <= live.updated)
        & (live.updated < F.coalesce(n.n_validUntil, far)),
        "inner",
    ).where(
        F.col("n_lon").isNotNull()
        & F.col("n_lat").isNotNull()
        & F.col("n_visible")
    )
    assembled = (
        joined.groupBy(
            "relId", "updated", "version", "pos", "sub_pos", "via_ref",
            "ref", "role",
        )
        .agg(
            F.first("tags").alias("tags"),
            F.first("changeset").alias("changeset"),
            F.first("uid").alias("uid"),
            F.first("user").alias("user"),
            F.first("w_version").alias("w_version"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("npos"),
                        F.col("n_lon").alias("lon"),
                        F.col("n_lat").alias("lat"),
                    )
                )
            ).alias("verts"),
        )
        .where(F.size("verts") >= 2)
    )
    way_geom = F.transform(
        F.col("verts"),
        lambda v: F.struct(
            v.getField("lon").alias("lon"), v.getField("lat").alias("lat")
        ),
    )
    closed = (F.size(way_geom) >= 4) & (
        F.get(way_geom, F.lit(0)) == F.get(way_geom, F.size(way_geom) - 1)
    )
    return assembled.select(
        "relId", "tags", "changeset", "updated", "uid", "user", "version",
        "pos", "sub_pos", "via_ref", "ref", "role", "w_version",
        way_geom.alias("way_geom"),
        closed.alias("member_closed"),
    )
