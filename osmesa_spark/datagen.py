"""Deterministic OSM-shaped fixture generator (FIXTURES.md schemas 1-3).

Generates `history`, `changesets`, and an `augmented_diffs` drop-dir with the
distribution constraints FIXTURES.md specifies (tag mix incl. `;`-delimited
railway values, multi-version ids, deletes, uid 0/1, hashtag comments, open
changesets, ...). Pure Python + pyarrow — no Spark needed to generate.

Seeded (default 42); identical output for identical args.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

T0 = datetime(2023, 1, 1, tzinfo=timezone.utc)

TAG_POOL = [
    ("building", ["yes", "house", "apartments", "no"]),
    ("highway", ["residential", "primary", "service", "footway"]),
    ("waterway", ["river", "stream", "canal", "ditch", "weir", "madeup_value"]),
    ("natural", ["coastline", "wood", "water"]),
    ("landuse", ["residential", "railway", "forest"]),
    ("railway", ["rail", "station", "station;yard", "yard;rail", "halt"]),
    ("amenity", ["school", "cafe"]),
    ("shop", ["bakery"]),
    ("office", ["company"]),
    ("leisure", ["park"]),
    ("aeroway", ["runway"]),
    ("name", ["alpha", "beta", "gamma"]),
]

EDITORS = ["iD 2.19", "JOSM/1.5", "Potlatch 2", "StreetComplete 40"]
HASHTAG_WORDS = ["hotosm", "missingmaps", "mapathon", "osmgeoweek", "visa1"]

# three synthetic "countries" (lon/lat rectangles) the geocoder must resolve
COUNTRIES = {
    "AAA": (-10.0, -10.0, 10.0, 10.0),
    "BBB": (20.0, 0.0, 40.0, 20.0),
    "CCC": (-60.0, 30.0, -40.0, 50.0),
}

# Polygon country set for the TRUE point-in-polygon path: the three
# rectangles as rings, PLUS a concave L-shaped country "DDD" whose ring
# covers only the south half + the north-east quadrant of AAA's extent.
# Its ENVELOPE is exactly AAA's rectangle, so every AAA point hits the
# envelope pre-check but only ~3/4 are inside the ring — bbox containment
# and the ray-cast provably disagree on this fixture (the concave-border
# wrongness VERDICT r2 flagged in the bbox-only geocoder).
COUNTRY_POLYGONS = {
    "AAA": [(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0)],
    "BBB": [(20.0, 0.0), (40.0, 0.0), (40.0, 20.0), (20.0, 20.0)],
    "CCC": [(-60.0, 30.0), (-40.0, 30.0), (-40.0, 50.0), (-60.0, 50.0)],
    "DDD": [
        (-10.0, -10.0),
        (10.0, -10.0),
        (10.0, 10.0),
        (0.0, 10.0),
        (0.0, 0.0),
        (-10.0, 0.0),
    ],
}


def _grid_fixture_countries(n: int = 40) -> dict[str, list[tuple[float, float]]]:
    """Deterministic n-country polygon set sized to trip the geocoder's
    grid dispatch (> GRID_THRESHOLD_COUNTRIES): octagon rings (even index)
    and concave 8-point stars (odd index) tiling the fixture node extent,
    with deliberate overlaps so points carry multiple codes. Vertices
    rounded to 6dp so SQL literals replay the exact doubles."""
    import math

    out: dict[str, list[tuple[float, float]]] = {}
    for i in range(n):
        cx = -11.0 + (i % 8) * 3.0
        cy = -11.0 + (i // 8) * 5.5
        r = 1.9 if i % 2 == 0 else 2.3
        ring = []
        for k in range(8):
            ang = 2.0 * math.pi * k / 8.0
            rr = r if (i % 2 == 0 or k % 2 == 0) else r * 0.45
            ring.append(
                (round(cx + rr * math.cos(ang), 6), round(cy + rr * math.sin(ang), 6))
            )
        out[f"G{i:02d}"] = ring
    return out


COUNTRY_POLYGONS_GRID = _grid_fixture_countries()


def _rw_code(i: int) -> str:
    """3-letter code from index: 0 → 'AAA', 1 → 'AAB', …"""
    return (
        chr(65 + i // 676) + chr(65 + (i // 26) % 26) + chr(65 + i % 26)
    )


def write_realworld_countries(out_dir: str, n: int = 311) -> str:
    """Generate a realistic-complexity `countries.geojson` — the shape the
    reference ships as a 311-country resource (Countries.scala:17-33,
    deployment/sql/01-countries.sql) — plus a `country_edges.parquet` the
    DuckDB oracle ray-casts from (data-driven: inlining ~140k edge literals
    into SQL is not viable at this fan-out).

    Deterministic (pure arithmetic in the feature index, no RNG):
    - n countries tiled on a 25×13 world grid (lon −180…180, lat −78…78),
      each a concave star-harmonic blob r(θ) = R(0.62 + 0.30 sin(kθ+φ))
      with 48…1208 vertices (every 50th country gets the thousand-vertex
      mainland real borders have);
    - every 3rd country carries an interior lake (hole ring), every 2nd an
      archipelago of 2 islands (MultiPolygon parts) — both fold through
      the loader's keyhole construction;
    - property-chain edge cases: every 7th feature has ISO_A3='-99' beside
      a valid ADM0_A3; every 11th omits ADM0_A3 and relies on the 'code'
      property past the '-99' sentinel; one feature has ONLY ISO_A3='-99'
      (dropped by the loader); one country's islands arrive as a SECOND
      feature under the same code (duplicate-code ring merge).

    The edges parquet is derived from `load_countries_geojson`'s OUTPUT, so
    oracle doubles are bit-identical to what the engine ray-casts.
    Returns the geojson path."""
    import math

    cols, rows_ = 25, 13
    cw, ch = 360.0 / cols, 156.0 / rows_

    def ring_points(cx, cy, rr_fn, nv):
        pts = []
        for v in range(nv):
            th = 2.0 * math.pi * v / nv
            rr = rr_fn(th)
            pts.append(
                [round(cx + rr * math.cos(th), 7), round(cy + rr * math.sin(th), 7)]
            )
        pts.append(pts[0])
        return pts

    features = []
    for i in range(n):
        code = _rw_code(i)
        ci, ri = i % cols, i // cols
        cx = -180.0 + (ci + 0.5) * cw + 0.0137
        cy = -78.0 + (ri + 0.5) * ch + 0.0071
        R = 4.3
        k = 3 + i % 6
        phi = 0.61 * i
        nv = 48 + ((i * 137) % 16) * 56
        if i % 50 == 0:
            nv = 1208
        mainland = ring_points(
            cx, cy, lambda th: R * (0.62 + 0.30 * math.sin(k * th + phi)), nv
        )
        rings = [mainland]
        if i % 3 == 0:  # lake: fully inside min mainland radius 0.32R
            rings.append(
                ring_points(cx + 0.1 * R, cy - 0.05 * R, lambda th: 0.1 * R, 24)
            )
        islands = []
        if i % 2 == 1:  # archipelago beyond max mainland radius 0.92R
            for s, ang in ((0, 0.9), (1, 3.7)):
                ic = cx + (1.08 + 0.04 * s) * R * math.cos(ang + i)
                jc = cy + (1.08 + 0.04 * s) * R * math.sin(ang + i)
                islands.append(ring_points(ic, jc, lambda th: 0.08 * R, 16))
        props = {"ADM0_A3": code, "ISO_A3": code}
        if i % 7 == 0:
            props["ISO_A3"] = "-99"
        if i % 11 == 0:
            props = {"ISO_A3": "-99", "code": code}
        if i == 5 and islands:
            # split: islands come as a second feature under the same code
            features.append(
                {
                    "type": "Feature",
                    "properties": dict(props),
                    "geometry": {
                        "type": "MultiPolygon",
                        "coordinates": [[isl] for isl in islands],
                    },
                }
            )
            islands = []
        if islands:
            geom = {
                "type": "MultiPolygon",
                "coordinates": [rings] + [[isl] for isl in islands],
            }
        else:
            geom = {"type": "Polygon", "coordinates": rings}
        features.append(
            {"type": "Feature", "properties": props, "geometry": geom}
        )
    # sentinel-only feature: no usable code — the loader must drop it
    features.append(
        {
            "type": "Feature",
            "properties": {"ISO_A3": "-99"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[170.1, -85.1], [170.9, -85.1], [170.9, -84.6], [170.1, -85.1]]
                ],
            },
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    gj_path = os.path.join(out_dir, "countries_realworld.geojson")
    with open(gj_path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": features}, f)

    from osmesa_spark.operators.geocode import load_countries_geojson

    countries = load_countries_geojson(gj_path)
    assert len(countries) == n, f"loader kept {len(countries)} of {n}"
    codes, xi, yi, xj, yj, bx0, bx1, by0, by1 = ([] for _ in range(9))
    for code in sorted(countries):
        ring = countries[code]
        xs = [float(x) for x, _ in ring]
        ys = [float(y) for _, y in ring]
        lo_x, hi_x, lo_y, hi_y = min(xs), max(xs), min(ys), max(ys)
        m = len(ring)
        for a in range(m):
            b = (a + 1) % m
            codes.append(code)
            xi.append(xs[a])
            yi.append(ys[a])
            xj.append(xs[b])
            yj.append(ys[b])
            bx0.append(lo_x)
            bx1.append(hi_x)
            by0.append(lo_y)
            by1.append(hi_y)
    pq.write_table(
        pa.table(
            {
                "code": pa.array(codes, pa.string()),
                "xi": pa.array(xi, pa.float64()),
                "yi": pa.array(yi, pa.float64()),
                "xj": pa.array(xj, pa.float64()),
                "yj": pa.array(yj, pa.float64()),
                "bx0": pa.array(bx0, pa.float64()),
                "bx1": pa.array(bx1, pa.float64()),
                "by0": pa.array(by0, pa.float64()),
                "by1": pa.array(by1, pa.float64()),
            }
        ),
        os.path.join(out_dir, "country_edges.parquet"),
    )
    return gj_path


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


def generate_history(n_elements: int = 1000, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows: list[dict] = []
    n_nodes = int(n_elements * 0.85)
    n_ways = int(n_elements * 0.14)
    n_changesets = max(10, n_elements // 12)

    blobs = list(COUNTRIES.values())
    node_ids = list(range(1, n_nodes + 1))
    for nid in node_ids:
        n_versions = rng.choices([1, 2, 3, 4, 5], weights=[40, 25, 20, 10, 5])[0]
        x0, y0, x1, y1 = rng.choice(blobs)
        lon = round(rng.uniform(x0, x1), 7)
        lat = round(rng.uniform(y0, y1), 7)
        tagged = rng.random() < 0.4
        tags = {}
        if tagged:
            for _ in range(rng.randint(1, 3)):
                k, vs = rng.choice(TAG_POOL)
                tags[k] = rng.choice(vs)
        uid = rng.choices(
            [0, 1] + list(range(2, 102)),
            weights=[1, 1] + [100 // (i + 1) + 1 for i in range(100)],
        )[0]
        base_minute = rng.uniform(0, 200_000)
        for v in range(1, n_versions + 1):
            visible = not (v == n_versions and rng.random() < 0.05)
            rows.append(
                {
                    "id": nid,
                    "type": "node",
                    "tags": tags if visible else tags,
                    "lat": None if rng.random() < 0.01 else lat + 0.0001 * v,
                    "lon": None if rng.random() < 0.01 else lon + 0.0001 * v,
                    "nds": None,
                    "members": None,
                    "changeset": rng.randint(1, n_changesets),
                    "timestamp": _ts(base_minute + v * 500),
                    "uid": uid,
                    "user": f"user_{uid}" if uid != 7 else f"user_7_v{v}",
                    "version": v,
                    "visible": visible,
                }
            )

    for wid in range(10_000_001, 10_000_001 + n_ways):
        n_versions = rng.choices([1, 2, 3], weights=[50, 30, 20])[0]
        n_nds = rng.randint(2, 12)
        nds = rng.sample(node_ids, min(n_nds, len(node_ids)))
        closed = rng.random() < 0.3
        if closed:
            nds = nds + [nds[0]]
        tags = {}
        k, vs = rng.choice(TAG_POOL)
        tags[k] = rng.choice(vs)
        if closed and rng.random() < 0.5:
            tags["building"] = "yes"
        uid = rng.randint(2, 101)
        base_minute = rng.uniform(0, 200_000)
        for v in range(1, n_versions + 1):
            visible = not (v == n_versions and rng.random() < 0.05)
            rows.append(
                {
                    "id": wid,
                    "type": "way",
                    "tags": tags,
                    "lat": None,
                    "lon": None,
                    "nds": nds,
                    "members": None,
                    "changeset": rng.randint(1, n_changesets),
                    "timestamp": _ts(base_minute + v * 700 + 100),
                    "uid": uid,
                    "user": f"user_{uid}",
                    "version": v,
                    "visible": visible,
                }
            )

    n_rels = n_elements - n_nodes - n_ways
    way_ids = list(range(10_000_001, 10_000_001 + n_ways))
    for rid in range(20_000_001, 20_000_001 + max(n_rels, 1)):
        k = rng.randint(2, min(5, len(way_ids)))
        mids = rng.sample(way_ids, k)
        members = [
            {
                "type": "way",
                "ref": m,
                "role": "outer" if j == 0 or rng.random() < 0.6 else "inner",
            }
            for j, m in enumerate(mids)
        ]
        n_rv = rng.randint(1, 2)
        # bias late so member way versions usually exist at the rel time
        base_minute = rng.uniform(50_000, 400_000)
        uid = rng.randint(2, 101)
        for v in range(1, n_rv + 1):
            rows.append(
                {
                    "id": rid,
                    "type": "relation",
                    "tags": {"type": "multipolygon", "landuse": "forest"},
                    "lat": None,
                    "lon": None,
                    "nds": None,
                    "members": members,
                    "changeset": rng.randint(1, n_changesets),
                    "timestamp": _ts(base_minute + v * 900),
                    "uid": uid,
                    "user": f"user_{uid}",
                    "version": v,
                    "visible": not (v == n_rv and rng.random() < 0.05),
                }
            )

    # super-relations: relation-of-relation members (the reference members
    # struct allows type='relation'; HBase notebook model). One nesting
    # level — members mix refs to the plain relations above with direct
    # ways, exercising the nested-resolution path in
    # geometry.relation_members_resolved(resolve_relations=True).
    rel_ids = list(range(20_000_001, 20_000_001 + max(n_rels, 1)))
    n_super = max(2, max(n_rels, 1) // 4)
    for sid in range(30_000_001, 30_000_001 + n_super):
        k = rng.randint(1, min(3, len(rel_ids)))
        members = [
            {"type": "relation", "ref": r, "role": "outer"}
            for r in rng.sample(rel_ids, k)
        ]
        if rng.random() < 0.7:
            members.append(
                {"type": "way", "ref": rng.choice(way_ids), "role": "outer"}
            )
        n_rv = rng.randint(1, 2)
        # late enough that member relations usually have a live version
        base_minute = rng.uniform(150_000, 420_000)
        uid = rng.randint(2, 101)
        for v in range(1, n_rv + 1):
            rows.append(
                {
                    "id": sid,
                    "type": "relation",
                    "tags": {"type": "multipolygon", "boundary": "administrative"},
                    "lat": None,
                    "lon": None,
                    "nds": None,
                    "members": members,
                    "changeset": rng.randint(1, n_changesets),
                    "timestamp": _ts(base_minute + v * 900),
                    "uid": uid,
                    "user": f"user_{uid}",
                    "version": v,
                    "visible": not (v == n_rv and rng.random() < 0.05),
                }
            )
    return rows


def generate_changesets(history_rows: list[dict], seed: int = 42) -> list[dict]:
    rng = random.Random(seed + 1)
    by_cs: dict[int, list[dict]] = {}
    for r in history_rows:
        by_cs.setdefault(r["changeset"], []).append(r)
    max_cs = max(by_cs)
    rows = []
    for cs_id in range(1, max_cs + 6):  # a few changesets with no elements
        members = by_cs.get(cs_id, [])
        uid = members[0]["uid"] if members else rng.randint(2, 101)
        created = (
            min(m["timestamp"] for m in members) if members else _ts(rng.uniform(0, 200_000))
        )
        open_ = rng.random() < 0.02
        closed = None if open_ else created + timedelta(minutes=rng.uniform(1, 1440))
        n_hash = rng.randint(0, 3)
        comment_tags = " ".join(f"#{rng.choice(HASHTAG_WORDS)}" for _ in range(n_hash))
        tags = {
            "created_by": rng.choice(EDITORS),
            "comment": f"edited stuff {comment_tags}".strip(),
        }
        if rng.random() < 0.3:
            tags["hashtags"] = ";".join(
                rng.sample(HASHTAG_WORDS, rng.randint(1, 2))
            )
        lats = [m["lat"] for m in members if m["lat"] is not None]
        lons = [m["lon"] for m in members if m["lon"] is not None]
        rows.append(
            {
                "id": cs_id,
                "tags": tags,
                "createdAt": created,
                "open": open_,
                "closedAt": closed,
                "commentsCount": rng.randint(0, 3),
                "minLat": min(lats) if lats else None,
                "maxLat": max(lats) if lats else None,
                "minLon": min(lons) if lons else None,
                "maxLon": max(lons) if lons else None,
                "numChanges": len(members),
                "uid": uid,
                "user": f"user_{uid}",
                "comments": None,
                "sequence": rng.randint(1, 100),
            }
        )
    return rows


_HISTORY_PA = pa.schema(
    [
        ("id", pa.int64()),
        ("type", pa.string()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("nds", pa.list_(pa.int64())),
        (
            "members",
            pa.list_(
                pa.struct(
                    [("type", pa.string()), ("ref", pa.int64()), ("role", pa.string())]
                )
            ),
        ),
        ("changeset", pa.int64()),
        ("timestamp", pa.timestamp("us", tz="UTC")),
        ("uid", pa.int64()),
        ("user", pa.string()),
        ("version", pa.int32()),
        ("visible", pa.bool_()),
    ]
)

_CHANGESETS_PA = pa.schema(
    [
        ("id", pa.int64()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("createdAt", pa.timestamp("us", tz="UTC")),
        ("open", pa.bool_()),
        ("closedAt", pa.timestamp("us", tz="UTC")),
        ("commentsCount", pa.int32()),
        ("minLat", pa.float64()),
        ("maxLat", pa.float64()),
        ("minLon", pa.float64()),
        ("maxLon", pa.float64()),
        ("numChanges", pa.int32()),
        ("uid", pa.int64()),
        ("user", pa.string()),
        (
            "comments",
            pa.list_(
                pa.struct(
                    [
                        ("date", pa.timestamp("us", tz="UTC")),
                        ("user", pa.string()),
                        ("uid", pa.int64()),
                        ("body", pa.string()),
                    ]
                )
            ),
        ),
        ("sequence", pa.int32()),
    ]
)


def _to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    cols = {}
    for f in schema:
        vals = [r.get(f.name) for r in rows]
        if pa.types.is_map(f.type):
            vals = [list(v.items()) if v is not None else None for v in vals]
        cols[f.name] = pa.array(vals, type=f.type)
    return pa.table(cols, schema=schema)


def write_fixtures(out_dir: str, n_elements: int = 1000, seed: int = 42) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    hist = generate_history(n_elements, seed)
    cs = generate_changesets(hist, seed)
    pq.write_table(_to_table(hist, _HISTORY_PA), os.path.join(out_dir, "history.parquet"))
    pq.write_table(
        _to_table(cs, _CHANGESETS_PA), os.path.join(out_dir, "changesets.parquet")
    )
    return {"history": len(hist), "changesets": len(cs)}


def write_augdiff_dropdir(
    out_dir: str,
    n_sequences: int = 5,
    per_seq: int = 40,
    seed: int = 42,
    corrupt_every: int | None = None,
) -> int:
    """Emulate the augmented-diff replication drop-dir: <dir>/<sequence>.jsonl,
    one JSON object per line with {old, new} feature pairs
    (updater/package.scala:69-128 wire model, flattened to our columns).
    `corrupt_every`: inject an unparseable line every N features (exercises
    the S6 dead-letter ErrorHandler path)."""
    rng = random.Random(seed + 2)
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    for seq in range(1000, 1000 + n_sequences):
        lines = []
        for feature in _augdiff_features(rng, seq, per_seq):
            lines.append(json.dumps(feature))
            total += 1
            if corrupt_every and total % corrupt_every == 0:
                lines.append('{"sequence": %d, "id": BROKEN' % seq)
        with open(os.path.join(out_dir, f"{seq}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return total


def _augdiff_features(rng, seq: int, per_seq: int):
    """One sequence's flattened augmented-diff feature dicts (shared by the
    flat and pair-format drop-dir writers; rng call order is the
    determinism contract)."""
    out = []
    for i in range(per_seq):
        if True:  # indentation shim: body unchanged from the inline loop
            eid = rng.randint(1, 500)
            version = rng.randint(1, 4)
            visible = rng.random() > 0.05
            lon, lat = rng.uniform(-10, 10), rng.uniform(-10, 10)
            is_way = rng.random() < 0.3
            is_poly = is_way and rng.random() < 0.4
            tags = dict([rng.choice([("building", "yes"), ("highway", "residential"),
                                     ("waterway", "river"), ("natural", "coastline")])])
            if is_poly:
                # closed ring → Polygon diffs exercise the areaDelta path
                # (landuse_km2/natural_km2 measurements)
                tags = dict([rng.choice([("landuse", "farmland"),
                                         ("natural", "wood"),
                                         ("building", "yes")])])
                w, h = rng.uniform(0.002, 0.01), rng.uniform(0.002, 0.01)
                ring = [(lon, lat), (lon + w, lat), (lon + w, lat + h),
                        (lon, lat + h), (lon, lat)]
                geom = [{"lon": x, "lat": y} for x, y in ring]
                prev_geom = (
                    [
                        {"lon": lon + (p["lon"] - lon) * 0.8,
                         "lat": lat + (p["lat"] - lat) * 0.8}
                        for p in geom
                    ]
                    if version > 1
                    else None
                )
                gtype = "Polygon"
            elif is_way:
                geom = [
                    {"lon": lon + 0.001 * k, "lat": lat + 0.0005 * k}
                    for k in range(rng.randint(2, 6))
                ]
                prev_geom = (
                    [{"lon": p["lon"] - 0.002, "lat": p["lat"]} for p in geom]
                    if version > 1
                    else None
                )
                gtype = "LineString"
            else:
                geom = [{"lon": lon, "lat": lat}]
                prev_geom = (
                    [{"lon": lon - 0.001, "lat": lat}] if version > 1 else None
                )
                gtype = "Point"
            feature = {
                "sequence": seq,
                "id": eid,
                "type": "way" if is_way else "node",
                "version": version,
                "minorVersion": 0,
                "updated": (T0 + timedelta(minutes=seq)).isoformat(),
                "visible": visible,
                "tags": tags,
                "prevTags": tags if version > 1 else None,
                "changeset": rng.randint(1, 80),
                "uid": rng.randint(2, 101),
                "user": f"user_{rng.randint(2, 101)}",
                "geomType": gtype,
                "geom": geom,
                "prevGeom": prev_geom,
            }
            out.append(feature)
    return out


def _geojson_geometry(gtype: str, geom: list[dict]) -> dict:
    coords = [[p["lon"], p["lat"]] for p in geom]
    if gtype == "Point":
        return {"type": "Point", "coordinates": coords[0]}
    if gtype == "Polygon":
        return {"type": "Polygon", "coordinates": [coords]}
    return {"type": "LineString", "coordinates": coords}


def write_augdiff_pairs_dropdir(
    out_dir: str,
    n_sequences: int = 5,
    per_seq: int = 40,
    seed: int = 42,
    corrupt_every: int | None = None,
) -> int:
    """The REAL augmented-diff wire format (updater/package.scala:69-128
    readFeatures): per line one GeoJSON FeatureCollection whose features
    are keyed "old"/"new"; \\u001e RFC 7464 record separators prefixed the
    way the overpass-diff publisher emits them. Same rng stream as
    `write_augdiff_dropdir`, so the flattened content is IDENTICAL — the
    translator parity test compares the two reads row for row."""
    rng = random.Random(seed + 2)
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    for seq in range(1000, 1000 + n_sequences):
        lines = []
        for f in _augdiff_features(rng, seq, per_seq):
            props = {
                "id": f["id"],
                "type": f["type"],
                "version": f["version"],
                "minorVersion": f["minorVersion"],
                "timestamp": f["updated"],
                "visible": f["visible"],
                "tags": f["tags"],
                "changeset": f["changeset"],
                "uid": f["uid"],
                "user": f["user"],
                "augmentedDiff": f["sequence"],
            }
            feats = []
            if f["prevGeom"] is not None:
                feats.append({
                    "type": "Feature",
                    "id": "old",
                    "geometry": _geojson_geometry(f["geomType"], f["prevGeom"]),
                    "properties": {**props, "tags": f["prevTags"] or {}},
                })
            feats.append({
                "type": "Feature",
                "id": "new",
                "geometry": _geojson_geometry(f["geomType"], f["geom"]),
                "properties": props,
            })
            lines.append(
                "\u001e" + json.dumps(
                    {"type": "FeatureCollection", "features": feats}
                )
            )
            total += 1
            if corrupt_every and total % corrupt_every == 0:
                lines.append(
                    '{"type": "FeatureCollection", "features": [BROKEN %d'
                    % total
                )
        with open(os.path.join(out_dir, f"{seq}.jsonl"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    return total


def write_changeset_db_csvs(
    out_dir: str, n_changesets: int = 300, seed: int = 42
) -> dict:
    """OSM-DB CSV dumps in the exact shapes ChangesetMetadataCreator
    expects (ChangesetMetadataCreator.scala:30-56 schema comments):
    changesets (bbox as int ×1e7), changeset_tags (changeset_id,k,v rows),
    changeset_comments (multiline quoted bodies — exercises the
    header/inferSchema/multiline/quote/escape CSV option set, scala:107-112),
    users (id, display_name; some authors deliberately missing so the
    left joins produce nulls)."""
    import csv

    rng = random.Random(seed + 5)
    os.makedirs(out_dir, exist_ok=True)
    user_ids = list(range(2, 90))
    known_users = user_ids[:70]  # the rest are missing from the users dump
    with open(os.path.join(out_dir, "users.csv"), "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
        w.writerow(["id", "display_name"])
        for u in known_users:
            w.writerow([u, f"user_{u}"])

    bodies = [
        "looks good",
        'please fix the "tagging", thanks',
        "multi\nline comment, with commas",
        "reverted — see changeset 12",
    ]
    n_tags = n_comments = 0
    with open(os.path.join(out_dir, "changesets.csv"), "w", newline="") as fc, \
         open(os.path.join(out_dir, "changeset_tags.csv"), "w", newline="") as ft, \
         open(os.path.join(out_dir, "changeset_comments.csv"), "w", newline="") as fm:
        wc = csv.writer(fc, quoting=csv.QUOTE_MINIMAL)
        wt = csv.writer(ft, quoting=csv.QUOTE_MINIMAL)
        wm = csv.writer(fm, quoting=csv.QUOTE_MINIMAL)
        wc.writerow(["id", "user_id", "created_at", "min_lat", "max_lat",
                     "min_lon", "max_lon", "closed_at", "num_changes"])
        wt.writerow(["changeset_id", "k", "v"])
        wm.writerow(["id", "changeset_id", "author_id", "body",
                     "created_at", "visible"])
        comment_id = 1
        for cs_id in range(1, n_changesets + 1):
            created = T0 + timedelta(minutes=rng.randint(0, 50_000))
            closed = created + timedelta(minutes=rng.randint(1, 24 * 60))
            lat0 = rng.randint(-800_000_000, 790_000_000)
            lon0 = rng.randint(-1_700_000_000, 1_690_000_000)
            wc.writerow([
                cs_id,
                rng.choice(user_ids),
                created.strftime("%Y-%m-%d %H:%M:%S"),
                lat0,
                lat0 + rng.randint(0, 10_000_000),
                lon0,
                lon0 + rng.randint(0, 10_000_000),
                "" if rng.random() < 0.03 else
                closed.strftime("%Y-%m-%d %H:%M:%S"),
                rng.randint(1, 500),
            ])
            if rng.random() < 0.85:  # some changesets have no tags at all
                wt.writerow([cs_id, "created_by", rng.choice(EDITORS)])
                wt.writerow([
                    cs_id, "comment",
                    f"work #{rng.choice(HASHTAG_WORDS)}",
                ])
                n_tags += 2
                if rng.random() < 0.3:
                    wt.writerow([
                        cs_id, "hashtags",
                        ";".join(rng.sample(HASHTAG_WORDS, 2)),
                    ])
                    n_tags += 1
            for _ in range(rng.choice([0, 0, 0, 1, 1, 2, 3])):
                wm.writerow([
                    comment_id,
                    cs_id,
                    rng.choice(user_ids),
                    rng.choice(bodies),
                    (created + timedelta(minutes=rng.randint(1, 600)))
                    .strftime("%Y-%m-%d %H:%M:%S"),
                    "t" if rng.random() < 0.95 else "f",
                ])
                comment_id += 1
                n_comments += 1
    return {
        "changesets": n_changesets,
        "tags": n_tags,
        "comments": n_comments,
        "users": len(known_users),
    }


def write_changes_osc_dropdir(
    out_dir: str, n_sequences: int = 3, per_seq: int = 20, seed: int = 42
) -> int:
    """Minutely osmChange XML drop-dir (<dir>/<sequence>.osc) — the
    Source.Changes wire format (SAX-parsed in the reference, SAXBench)."""
    rng = random.Random(seed + 3)
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    for seq in range(2000, 2000 + n_sequences):
        parts = ['<osmChange version="0.6">']
        for action, weight in (("create", 6), ("modify", 3), ("delete", 1)):
            parts.append(f"<{action}>")
            for _ in range(per_seq * weight // 10):
                eid = rng.randint(1, 900)
                lon, lat = rng.uniform(-10, 10), rng.uniform(-10, 10)
                ts = (T0 + timedelta(minutes=seq)).strftime("%Y-%m-%dT%H:%M:%SZ")
                parts.append(
                    f'<node id="{eid}" version="{rng.randint(1, 3)}" '
                    f'timestamp="{ts}" changeset="{rng.randint(1, 80)}" '
                    f'uid="{rng.randint(2, 101)}" '
                    f'user="user_x" lat="{lat:.7f}" lon="{lon:.7f}">'
                    '<tag k="building" v="yes"/></node>'
                )
                total += 1
            parts.append(f"</{action}>")
        parts.append("</osmChange>")
        with open(os.path.join(out_dir, f"{seq}.osc"), "w") as f:
            f.write("".join(parts))
    return total


def write_changeset_meta_dropdir(
    out_dir: str, n_sequences: int = 5, per_seq: int = 10, seed: int = 42
) -> int:
    """Changeset-metadata drop-dir (<dir>/<sequence>.jsonl) — Source.Changesets
    equivalent; rows in CHANGESETS shape with ISO timestamps."""
    rng = random.Random(seed + 4)
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    for seq in range(1000, 1000 + n_sequences):
        lines = []
        for _ in range(per_seq):
            cs_id = rng.randint(1, 80)
            created = T0 + timedelta(minutes=seq - rng.uniform(0, 60))
            tags = {
                "created_by": rng.choice(EDITORS),
                "comment": f"work #{rng.choice(HASHTAG_WORDS)}",
            }
            if rng.random() < 0.4:
                # hashtags recorded ONLY in the dedicated tag (never in the
                # comment) — exercises the scala:110-111 merge path
                tags["hashtags"] = ";".join(
                    rng.sample(["builditup", "mapdrive", "roadfix"], 2)
                )
            lines.append(
                json.dumps(
                    {
                        "id": cs_id,
                        "tags": tags,
                        "createdAt": created.isoformat(),
                        "open": False,
                        "closedAt": (created + timedelta(minutes=30)).isoformat(),
                        "commentsCount": 0,
                        "numChanges": rng.randint(1, 20),
                        "uid": rng.randint(2, 101),
                        "user": f"user_{rng.randint(2, 101)}",
                        "sequence": seq,
                    }
                )
            )
            total += 1
        with open(os.path.join(out_dir, f"{seq}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return total


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/osm_fixtures"
    print(write_fixtures(out))
    print(write_augdiff_dropdir(os.path.join(out, "augdiffs")))
