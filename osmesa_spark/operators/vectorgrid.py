"""Vector-grid tile pipeline: tile → rasterize → pyramid → vectorize.

Parity target: the typed-Dataset chain in
`src/analytics/src/main/scala/osmesa/analytics/vectorgrid/Implicits.scala`
(G1 tile :57-140, G2 rasterize :351-408, G3 downsample :188-220,
G4 merge :154-179, G5 pyramid :145-152, G6 vectorize :222-244) and its
drivers `EditHistogram.scala` / `Footprints.scala`.

Spark-first redesign — the reference keeps a `Map[Long,Int]` sparse tile per
row and merges tiles in `mapGroups` lambdas (opting out of Catalyst,
SURVEY §3.3). We instead keep the raster in **long format**: one row per
non-zero cell `(zoom, tx, ty, cell_col, cell_row, value)`. Consequences:

  * rasterize/merge/downsample collapse to `groupBy(...).sum(...)` — fully
    codegen'd, partially aggregated map-side, no opaque lambdas;
  * downsample is pure integer math on absolute cell coordinates
    (`abs >> dz`), so a pyramid level is ONE hash-agg off the previous —
    data volume shrinks ~4× per level, and the shuffle key
    (zoom, tile, cell) is uniformly distributed by construction;
  * the sparse map-per-tile shape only materializes at the MVT encode
    boundary (`to_sparse_tiles`), mirroring `RasterTileWithKey`
    (`vectorgrid/package.scala:70-84`) for the sink.

Default geometry matches the reference: 128×128 cells, base zoom 10
(`VectorGrid.scala:21-27`); footprints profile 512 cells / zoom 14
(`Footprints.scala:24-25`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmesa_spark.functions import geo

BASE_CELLS = 128
BASE_ZOOM = 10


def tile_points(
    df: DataFrame,
    zoom: int = BASE_ZOOM,
    cells: int = BASE_CELLS,
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: str | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """G1+G2 fast path for points: assign (zoom, tx, ty, ccol, crow) and sum
    weights per cell — `x/y` are Web-Mercator unit coordinates so the cell is
    `floor(unit * 2^zoom * cells) mod cells`.

    `key_cols` facets the histogram per entity (user id, hashtag, …) — the
    FacetedEditHistogram/Footprint shape: one extra grouping key, same
    single partial-agg shuffle."""
    keys = list(key_cols or [])
    n_abs = float((1 << zoom) * cells)
    ux = geo.lon_to_unit(F.col(lon_col))
    uy = geo.lat_to_unit(F.col(lat_col))
    abs_col = F.least(
        F.greatest(F.floor(ux * n_abs), F.lit(0)), F.lit(n_abs - 1)
    ).cast("bigint")
    abs_row = F.least(
        F.greatest(F.floor(uy * n_abs), F.lit(0)), F.lit(n_abs - 1)
    ).cast("bigint")
    w = F.col(weight_col) if weight_col else F.lit(1)
    keyed = df.select(
        *keys,
        F.lit(zoom).alias("zoom"),
        abs_col.alias("abs_col"),
        abs_row.alias("abs_row"),
        w.cast("bigint").alias("value"),
    )
    return (
        keyed.groupBy(*keys, "zoom", "abs_col", "abs_row")
        .agg(F.sum("value").alias("value"))
    )


def downsample(
    raster: DataFrame, dz: int = 1, key_cols: list[str] | None = None
) -> DataFrame:
    """G3: parent level(s) — absolute cell coords shift right by dz, values
    sum (reference resamples with Sum, Implicits.scala:188-220)."""
    keys = list(key_cols or [])
    return (
        raster.select(
            *keys,
            (F.col("zoom") - dz).alias("zoom"),
            F.shiftrightunsigned("abs_col", dz).alias("abs_col"),
            F.shiftrightunsigned("abs_row", dz).alias("abs_row"),
            "value",
        )
        .groupBy(*keys, "zoom", "abs_col", "abs_row")
        .agg(F.sum("value").alias("value"))
    )


def pyramid(
    base: DataFrame,
    base_zoom: int = BASE_ZOOM,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """G5: all zoom levels base_zoom..0 as one DataFrame.

    INPUT CONTRACT (r10 ADVICE): `base` must hold rows whose `zoom`
    column equals `base_zoom` and must already be aggregated one row per
    (keys, zoom, abs_col, abs_row) — the level count derives from each
    row's `zoom` value (base_zoom is the documented expectation, not a
    clamp), and the single groupBy below SUMS the base level together
    with its ancestors, so un-aggregated duplicate base rows would be
    summed rather than passed through. Every in-repo caller builds `base`
    with a per-cell aggregation at base_zoom.

    Single-pass shape: each base cell fans out to its base_zoom+1
    ancestors (`explode` over the zoom delta — a no-shuffle generator),
    then ONE groupBy sums every level together. The chained-halving
    union this replaces built base_zoom+1 plan branches with one
    hash-agg exchange per level (66 exchanges at zoom 10 with the
    branch prefixes); per-stage scheduling plus first-run codegen of
    that plan dominated the data cost at every measured size. Shuffle
    volume stays bounded: the fan-out is collapsed map-side by the
    partial aggregation (ancestor keys repeat within a task), so the
    exchange carries about Σ_z |level z| ≈ 1.33× the base cells —
    the same bytes the chained version moved across its 11 stages."""
    keys = list(key_cols or [])
    fan = base.select(
        *keys,
        "zoom",
        "abs_col",
        "abs_row",
        "value",
        F.explode(F.sequence(F.lit(0), F.col("zoom").cast("int"))).alias(
            "dz"
        ),
    )
    return (
        fan.select(
            *keys,
            (F.col("zoom") - F.col("dz")).alias("zoom"),
            F.expr("shiftrightunsigned(abs_col, dz)").alias("abs_col"),
            F.expr("shiftrightunsigned(abs_row, dz)").alias("abs_row"),
            "value",
        )
        .groupBy(*keys, "zoom", "abs_col", "abs_row")
        .agg(F.sum("value").alias("value"))
    )


def with_tile_coords(
    raster: DataFrame,
    cells: int = BASE_CELLS,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Split absolute cell coords into (tx, ty, ccol, crow). cells must be a
    power of two; tiles coarser than one cell collapse to tile (0,0).
    `key_cols` carries facet/entity columns through unchanged."""
    bits = int(math.log2(cells))
    return raster.select(
        *(key_cols or []),
        "zoom",
        F.shiftrightunsigned("abs_col", bits).alias("tx"),
        F.shiftrightunsigned("abs_row", bits).alias("ty"),
        (F.col("abs_col") % cells).alias("ccol"),
        (F.col("abs_row") % cells).alias("crow"),
        "value",
    )


def vectorize(
    raster: DataFrame,
    cells: int = BASE_CELLS,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """G6: non-zero cells → features with Z-order `__id` per tile
    (Implicits.scala:222-244; z-index :228-238). `key_cols` carries
    facet/entity columns through unchanged (faceted pyramid shape)."""
    bits = int(math.log2(cells))
    tiled = with_tile_coords(raster, cells, key_cols=key_cols)
    return tiled.select(
        *(key_cols or []),
        "zoom",
        "tx",
        "ty",
        geo.zorder(F.col("ccol"), F.col("crow"), bits=bits).alias("__id"),
        "ccol",
        "crow",
        "value",
    )


def to_sparse_tiles(raster: DataFrame, cells: int = BASE_CELLS) -> DataFrame:
    """Assemble the reference's RasterTileWithKey shape for the MVT sink:
    one row per (zoom, tx, ty) with cells as map<bigint,bigint> keyed by
    row-major index (vectorgrid/package.scala:70-84)."""
    tiled = with_tile_coords(raster, cells)
    return (
        tiled.select(
            "zoom",
            "tx",
            "ty",
            (F.col("crow") * cells + F.col("ccol")).alias("idx"),
            "value",
        )
        .groupBy("zoom", "tx", "ty")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("idx", "value")))
            ).alias("cells"),
            F.sum("value").alias("total"),
        )
    )
