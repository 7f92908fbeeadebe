"""OSM element preprocessing: version validity intervals and derived columns.

Reference semantics (vectorpipe `ProcessOSM.preprocessNodes/preprocessWays`,
call sites `src/apps/.../ChangesetStatsCreator.scala:95-96`):
  * `validUntil` — timestamp when the NEXT version of the same element
    supersedes this one (null while current)
  * `minorVersion` — way revisions induced by member-node edits between way
    versions (`FacetedEditHistogramTileCreator.scala:60-131` is the model);
    direct versions have minorVersion 0
  * `geometryChanged` — whether this (minor) version moved any coordinate

Scale notes: the validity window is one `lead` over (id) — a single shuffle
by id that later temporal joins reuse. At planet scale (4.5B elements,
BASELINE.md) id is near-uniform, so no salt needed; AQE handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_valid_until(df: DataFrame) -> DataFrame:
    """Add `validUntil` per (type, id): next version's timestamp, null if
    current. Equivalent of ProcessOSM preprocess (window lead)."""
    w = Window.partitionBy("type", "id").orderBy("version", "timestamp")
    return df.withColumn("validUntil", F.lead("timestamp").over(w))


def preprocess_nodes(history: DataFrame) -> DataFrame:
    """Node versions with validity + double coords + geometryChanged.
    Keeps deleted versions (visible=false) — stats need them."""
    nodes = history.where(F.col("type") == "node")
    nodes = with_valid_until(nodes)
    w = Window.partitionBy("id").orderBy("version", "timestamp")
    return (
        nodes.withColumn("lat", F.col("lat").cast("double"))
        .withColumn("lon", F.col("lon").cast("double"))
        .withColumn(
            "geometryChanged",
            (F.col("lat") != F.lag("lat").over(w))
            | (F.col("lon") != F.lag("lon").over(w))
            | F.lag("lat").over(w).isNull(),
        )
        .withColumn("minorVersion", F.lit(0))
    )


def preprocess_ways(history: DataFrame) -> DataFrame:
    """Way versions with validity; minorVersion 0 for direct versions
    (node-induced minor versions are assigned during reconstruction —
    see geometry.way_minor_versions)."""
    ways = history.where(F.col("type") == "way")
    return with_valid_until(ways).withColumn("minorVersion", F.lit(0))
