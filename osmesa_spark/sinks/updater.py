"""Per-element MVT tile updater — parity with the reference's updater
package (G11): group augmented-diff features by SpatialKey across zooms and
apply one of three **tile schemas** to the affected tiles
(`updater/package.scala:182-291`, `updater/Schema.scala:11-56`, registry
`updater/schemas/package.scala:4-9`):

  * `snapshot` — tile keeps only the LATEST VISIBLE version of each element;
    an update replaces the feature, a delete removes it
    (`updater/schemas/Snapshot.scala`, 59 LoC).
  * `history`  — tile keeps EVERY version; a new version closes the previous
    one by stamping `__validUntil`
    (`updater/schemas/History.scala:15-25`, 137 LoC).
  * `urchn`    — authorship lineage: per element, creation author,
    last-touched author, version count, last edit time
    (`updater/schemas/Urchn.scala`, 113 LoC).

Spark-first shape: schema application is per-(tile, element) and needs the
existing tile state, so it reuses the read-modify-write executor path of
`sinks.mvt` — the DataFrame side only computes tile keys (pure column
Web-Mercator math) and groups; all feature-merge logic is per-tile local.
Idempotence comes from the same committed-sequence layer as the pyramid
sink. Large-scale note: one diff feature touches exactly one tile per zoom
(points), so the shuffle is `groupBy(zoom, tx, ty)` over narrow rows —
partial aggregation applies to the collect_list, bounded by tile occupancy.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmesa_spark.functions import geo
from osmesa_spark.sinks import mvt

EXTENT = mvt.DEFAULT_EXTENT


# ---------------------------------------------------------------------------
# tile schema strategies (executor-side, per tile)
# ---------------------------------------------------------------------------

def _apply_snapshot(existing: list, updates: list) -> list:
    """Latest visible version per element id wins; deletes drop."""
    by_id = {int(f.tags["__id"]): f for f in existing}
    for u in updates:
        eid = int(u.tags["__id"])
        cur = by_id.get(eid)
        if cur is not None and int(cur.tags.get("__version", -1)) >= int(
            u.tags["__version"]
        ):
            continue
        if u.tags.get("__visible", True):
            by_id[eid] = u
        else:
            by_id.pop(eid, None)
    return [by_id[k] for k in sorted(by_id)]


def _apply_history(existing: list, updates: list) -> list:
    """Append every version; stamp __validUntil on the superseded one
    (History.scala:15-25 sorts by __version/__minorVersion)."""
    feats = list(existing)
    for u in sorted(
        updates,
        key=lambda f: (int(f.tags["__id"]), int(f.tags["__version"])),
    ):
        eid = int(u.tags["__id"])
        prev = [
            f
            for f in feats
            if int(f.tags["__id"]) == eid and "__validUntil" not in f.tags
        ]
        for p in prev:
            if int(p.tags["__version"]) < int(u.tags["__version"]):
                p.tags["__validUntil"] = u.tags["__updated"]
        if not any(
            int(f.tags["__id"]) == eid
            and int(f.tags["__version"]) == int(u.tags["__version"])
            for f in feats
        ):
            feats.append(u)
    feats.sort(key=lambda f: (int(f.tags["__id"]), int(f.tags["__version"])))
    return feats


def _apply_urchn(existing: list, updates: list) -> list:
    """Authorship lineage per element: keep creation author, update
    lastAuthor/lastEdit/versions."""
    by_id = {int(f.tags["__id"]): f for f in existing}
    for u in sorted(
        updates,
        key=lambda f: (int(f.tags["__id"]), int(f.tags["__version"])),
    ):
        eid = int(u.tags["__id"])
        cur = by_id.get(eid)
        if cur is None:
            u.tags["__creation_author"] = u.tags["__author"]
            u.tags["__versions"] = 1
            by_id[eid] = u
        elif int(u.tags["__version"]) > int(cur.tags["__version"]):
            u.tags["__creation_author"] = cur.tags["__creation_author"]
            u.tags["__versions"] = int(cur.tags["__versions"]) + 1
            by_id[eid] = u
    return [by_id[k] for k in sorted(by_id)]


SCHEMAS = {
    "snapshot": _apply_snapshot,
    "history": _apply_history,
    "urchn": _apply_urchn,
}


# ---------------------------------------------------------------------------
# DataFrame side: tile keys + grouped upsert
# ---------------------------------------------------------------------------

def _feature_tags(schema: str):
    base = {
        "__id": F.col("id"),
        "__version": F.col("version"),
        "__updated": F.floor(F.unix_timestamp("updated")).cast("bigint"),
        "__visible": F.coalesce("visible", F.lit(True)),
    }
    if schema == "urchn":
        base["__author"] = F.col("user")
    return F.struct(*[v.alias(k) for k, v in base.items()])


def point_diffs_with_tiles(diffs: DataFrame, zoom: int) -> DataFrame:
    """Point-geometry diff features keyed by (zoom, tx, ty) + extent-local
    pixel coords — pure column Web-Mercator math (updater/package.scala
    groups by SpatialKey the same way)."""
    pts = diffs.where(
        (F.col("geomType") == "Point") & (F.size("geom") >= 1)
    ).select(
        "*",
        F.get(F.col("geom"), F.lit(0))["lon"].alias("lon"),
        F.get(F.col("geom"), F.lit(0))["lat"].alias("lat"),
    )
    n = float(1 << zoom)
    ux, uy = geo.lon_to_unit(F.col("lon")), geo.lat_to_unit(F.col("lat"))
    px = (ux * n * EXTENT).cast("bigint")
    py = (uy * n * EXTENT).cast("bigint")
    return pts.select(
        F.lit(zoom).alias("zoom"),
        (px / EXTENT).cast("bigint").alias("tx"),
        (py / EXTENT).cast("bigint").alias("ty"),
        (px % EXTENT).cast("int").alias("fx"),
        (py % EXTENT).cast("int").alias("fy"),
        "sequence",
        "id",
        "version",
        "updated",
        "visible",
        "user",
    )


def update_tiles(
    diffs: DataFrame,
    root: str,
    schema: str = "snapshot",
    zoom: int = 12,
    layer_name: str = "elements",
) -> int:
    """Apply one micro-batch / bounded set of diffs to the tile store under
    `root` using the chosen tile schema. Returns tiles touched."""
    from osmesa_spark.session import ship_package

    if schema not in SCHEMAS:
        raise ValueError(f"unknown tile schema {schema!r} (have {sorted(SCHEMAS)})")
    ship_package(diffs.sparkSession)
    keyed = point_diffs_with_tiles(diffs, zoom)
    tagged = keyed.select(
        "zoom",
        "tx",
        "ty",
        F.struct(
            "fx", "fy", "sequence",
            _feature_tags(schema).alias("tags"),
        ).alias("f"),
    )
    tiles = tagged.groupBy("zoom", "tx", "ty").agg(
        F.collect_list("f").alias("fs")
    )
    apply_fn = SCHEMAS[schema]

    def write_partition(rows):
        for row in rows:
            z, tx, ty = row["zoom"], row["tx"], row["ty"]
            existing_layers = mvt.read_tile(root, z, tx, ty) or {}
            seqs = mvt.committed_sequences(existing_layers)
            updates = []
            batch_seqs = set()
            for f in sorted(
                row["fs"],
                key=lambda f: (int(f["tags"]["__id"]), int(f["tags"]["__version"])),
            ):
                if f["sequence"] in seqs:
                    continue  # idempotent re-delivery
                batch_seqs.add(int(f["sequence"]))
                updates.append(
                    mvt.MvtFeature(
                        fid=int(f["tags"]["__id"]),
                        geom_type=1,
                        points=[(int(f["fx"]), int(f["fy"]))],
                        tags=dict(f["tags"].asDict()),
                    )
                )
            if not updates:
                continue
            merged = apply_fn(existing_layers.get(layer_name, []), updates)
            layers = {
                layer_name: merged,
                mvt.SEQUENCES_LAYER: mvt._sequence_layer(
                    seqs + sorted(batch_seqs)
                ),
            }
            payload = gzip.compress(mvt.encode_tile(layers, EXTENT))
            from osmesa_spark.sources.objectstore import join_key, open_store

            store, prefix = open_store(root)
            store.put(
                join_key(prefix, mvt._tile_key(z, tx, ty)),
                payload,
                content_encoding="gzip",
            )

    tiles.foreachPartition(write_partition)
    return tiles.count()
