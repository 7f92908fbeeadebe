"""OSM tag-class predicates as pure Column expressions (no UDFs).

Semantics: reference `README.md:55-115` (tracked feature classes) and
`src/analytics/src/main/scala/osmesa/analytics/stats/package.scala:78-117`
(local predicates); vectorpipe predicates cited by call site there. Everything
stays in whole-stage codegen — these compile to `GetMapValue`/`CaseWhen`
expressions Catalyst can push around.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from osmesa_spark.util import column_memo

# waterway values tracked for *counts* (README.md:79-92); km measurements use
# any waterway=* per README, but the reference's isWaterway predicate is the
# 12-value list used for both (vectorpipe functions.osm).
WATERWAY_VALUES = [
    "river",
    "riverbank",
    "canal",
    "stream",
    "stream_end",
    "brook",
    "drain",
    "ditch",
    "dam",
    "weir",
    "waterfall",
    "pressurised",
]

POI_KEYS = ["amenity", "shop", "craft", "office", "leisure", "aeroway"]

# vectorpipe's uninteresting/meta keys (model: vectorpipe functions.osm
# isTagged = tags minus meta keys non-empty; we keep the simple form: any tag).
_META_KEYS = ["created_by", "source"]


def _tag(tags: Column | str, key: str) -> Column:
    tags = F.col(tags) if isinstance(tags, str) else tags
    return tags.getItem(key)


def split_delimited_values(col: Column) -> Column:
    """Split `;`-delimited tag values, trimmed (vectorpipe
    `splitDelimitedValues`, call site `stats/package.scala:97-106`).
    Null-safe: null → empty array."""
    return F.transform(
        F.split(F.coalesce(col, F.lit("")), ";"), lambda v: F.trim(v)
    )


@column_memo
def is_tagged(tags: Column | str) -> Column:
    """Element carries at least one non-meta tag (vectorpipe `isTagged`,
    call site `ChangesetStatsCreator.scala:102`)."""
    tags = F.col(tags) if isinstance(tags, str) else tags
    meta = F.array(*[F.lit(k) for k in _META_KEYS])
    return (
        F.size(F.map_filter(tags, lambda k, _v: ~F.array_contains(meta, k))) > 0
    )


@column_memo
def is_building(tags: Column | str) -> Column:
    """`building=*` excluding explicit `building=no` (README.md:60-66)."""
    b = _tag(tags, "building")
    return b.isNotNull() & (F.lower(b) != "no")


@column_memo
def is_road(tags: Column | str) -> Column:
    """`highway=*` (README.md:67-78)."""
    return _tag(tags, "highway").isNotNull()


@column_memo
def is_waterway(tags: Column | str) -> Column:
    """waterway ∈ the tracked 12-value list (README.md:79-84)."""
    return _tag(tags, "waterway").isin(WATERWAY_VALUES)


@column_memo
def is_coastline(tags: Column | str) -> Column:
    """`natural=coastline` (README.md:93-99)."""
    return _tag(tags, "natural") == "coastline"


@column_memo
def is_poi(tags: Column | str) -> Column:
    """any of amenity/shop/craft/office/leisure/aeroway (README.md:106-111)."""
    tags = F.col(tags) if isinstance(tags, str) else tags
    cond = F.lit(False)
    for k in POI_KEYS:
        cond = cond | tags.getItem(k).isNotNull()
    return cond


@column_memo
def is_landuse(tags: Column | str) -> Column:
    """`stats/package.scala:90-91`."""
    return _tag(tags, "landuse").isNotNull()


@column_memo
def is_natural(tags: Column | str) -> Column:
    """`stats/package.scala:93-94`."""
    return _tag(tags, "natural").isNotNull()


@column_memo
def is_rail_feature(tags: Column | str) -> Column:
    """rail site/area: railway∈{station,yard} or landuse=railway, over
    `;`-delimited values (`stats/package.scala:96-100`)."""
    rail = split_delimited_values(_tag(tags, "railway"))
    landuse = split_delimited_values(_tag(tags, "landuse"))
    return (
        F.array_contains(rail, "station")
        | F.array_contains(rail, "yard")
        | F.array_contains(landuse, "railway")
    )


@column_memo
def is_rail_line(tags: Column | str) -> Column:
    """rail track: railway=* that is not a rail feature (`stats/package.scala:102-103`)."""
    return (~is_rail_feature(tags)) & _tag(tags, "railway").isNotNull()


@column_memo
def is_railway(tags: Column | str) -> Column:
    """any rail entity (`stats/package.scala:105-107`)."""
    return _tag(tags, "railway").isNotNull() | F.array_contains(
        split_delimited_values(_tag(tags, "landuse")), "railway"
    )


@column_memo
def is_linear(tags: Column | str) -> Column:
    """linear feature → linearDelta applies (`stats/package.scala:109`)."""
    return is_road(tags) | is_waterway(tags) | is_coastline(tags) | is_rail_line(tags)


@column_memo
def is_other(tags: Column | str) -> Column:
    """tagged but in no tracked class (`stats/package.scala:111-118`)."""
    return (
        is_tagged(tags)
        & ~is_road(tags)
        & ~is_waterway(tags)
        & ~is_building(tags)
        & ~is_railway(tags)
        & ~is_natural(tags)
        & ~is_landuse(tags)
        & ~is_poi(tags)
    )


@column_memo
def is_interesting(tags: Column | str) -> Column:
    """node or way worth keeping (`stats/package.scala:78-86`)."""
    return (
        is_poi(tags)
        | is_building(tags)
        | is_road(tags)
        | is_waterway(tags)
        | is_coastline(tags)
    )


@column_memo
def is_new(version: Column | str, minor_version: Column | str) -> Column:
    """added = first version and no way-induced minor revision (README.md:60-61;
    vectorpipe `isNew`, call site `stats/package.scala:121-178`)."""
    version = F.col(version) if isinstance(version, str) else version
    minor_version = (
        F.col(minor_version) if isinstance(minor_version, str) else minor_version
    )
    return (version == 1) & (F.coalesce(minor_version, F.lit(0)) == 0)


@column_memo
def is_area(tags: Column | str) -> Column:
    """way forms a polygon: `area=yes`, or building/landuse/natural present and
    not explicitly `area=no` (vectorpipe `isArea` model; used by way geometry
    reconstruction, call site `ChangesetStatsCreator.scala:106-114`)."""
    tags_c = F.col(tags) if isinstance(tags, str) else tags
    area = F.lower(F.coalesce(tags_c.getItem("area"), F.lit("")))
    area_ish = (
        is_building(tags)
        | is_landuse(tags)
        | tags_c.getItem("natural").isNotNull()
        | tags_c.getItem("leisure").isNotNull()
    )
    return (area == "yes") | (area_ish & (area != "no"))
