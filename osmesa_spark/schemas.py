"""Declared schemas for the OSM data model (SURVEY.md §1.2).

Sources of truth in the reference:
  * history: osm-pds planet ORC columns observed at
    `src/apps/.../FootprintCreator.scala:159-162`,
    `ChangesetStatsCreator.scala:86-124`, `FacetedEditHistogramTileCreator.scala:60-131`
  * changesets: `src/apps/.../MergeChangesets.scala:101-114`
  * changes (osmChange XML rows): `ChangeStreamProcessor.scala:98-100`
  * augmented diffs: `StreamingChangesetStatsUpdater.scala:113-135`,
    `stats/package.scala:40-67`
  * stats output tables: `deployment/sql/06-changesets.sql` et al.
"""

from __future__ import annotations

from pyspark.sql import types as T

TAGS = T.MapType(T.StringType(), T.StringType())

MEMBER = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("ref", T.LongType()),
        T.StructField("role", T.StringType()),
    ]
)

HISTORY = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("type", T.StringType(), False),  # 'node'|'way'|'relation'
        T.StructField("tags", TAGS),
        T.StructField("lat", T.DecimalType(9, 7)),
        T.StructField("lon", T.DecimalType(10, 7)),
        T.StructField("nds", T.ArrayType(T.LongType())),
        T.StructField("members", T.ArrayType(MEMBER)),
        T.StructField("changeset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("uid", T.LongType()),
        T.StructField("user", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("visible", T.BooleanType()),
    ]
)

CHANGESET_COMMENT = T.StructType(
    [
        T.StructField("date", T.TimestampType()),
        T.StructField("user", T.StringType()),
        T.StructField("uid", T.LongType()),
        T.StructField("body", T.StringType()),
    ]
)

CHANGESETS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", TAGS),
        T.StructField("createdAt", T.TimestampType()),
        T.StructField("open", T.BooleanType()),
        T.StructField("closedAt", T.TimestampType()),
        T.StructField("commentsCount", T.IntegerType()),
        T.StructField("minLat", T.DoubleType()),
        T.StructField("maxLat", T.DoubleType()),
        T.StructField("minLon", T.DoubleType()),
        T.StructField("maxLon", T.DoubleType()),
        T.StructField("numChanges", T.IntegerType()),
        T.StructField("uid", T.LongType()),
        T.StructField("user", T.StringType()),
        T.StructField("comments", T.ArrayType(CHANGESET_COMMENT)),
        T.StructField("sequence", T.IntegerType()),
    ]
)

# one row per element in a minutely osmChange batch
CHANGES = T.StructType(
    [
        T.StructField("sequence", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("version", T.IntegerType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("nds", T.ArrayType(T.LongType())),
        T.StructField("tags", TAGS),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.LongType()),
        T.StructField("user", T.StringType()),
        T.StructField("visible", T.BooleanType()),
    ]
)

POINT = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)
VERTICES = T.ArrayType(POINT)

# augmented diff: one row per element version with (prev-)geometry
AUGMENTED_DIFFS = T.StructType(
    [
        T.StructField("sequence", T.IntegerType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("version", T.IntegerType()),
        T.StructField("minorVersion", T.IntegerType()),
        T.StructField("updated", T.TimestampType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("tags", TAGS),
        T.StructField("prevTags", TAGS),
        T.StructField("nds", T.ArrayType(T.LongType())),
        T.StructField("geomType", T.StringType()),  # Point|LineString|Polygon
        T.StructField("geom", VERTICES),
        T.StructField("prevGeom", VERTICES),
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.LongType()),
        T.StructField("user", T.StringType()),
    ]
)

# stats output (PG `changesets` table shape, 06-changesets.sql:1-13)
CHANGESET_STATS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("measurements", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("counts", T.MapType(T.StringType(), T.LongType())),
        T.StructField("total_edits", T.LongType()),
        T.StructField("editor", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("closed_at", T.TimestampType()),
        T.StructField("augmented_diffs", T.ArrayType(T.IntegerType())),
    ]
)
