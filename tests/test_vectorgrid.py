"""Vector-grid pipeline property tests: pyramid sum preservation, cell
bounds, z-order bijectivity, sparse-tile assembly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmesa_spark.operators import vectorgrid as VG


@pytest.fixture(scope="module")
def points(spark):
    import random

    rng = random.Random(7)
    rows = [
        (rng.uniform(-170, 170), rng.uniform(-80, 80), rng.randint(1, 3))
        for _ in range(2000)
    ]
    return spark.createDataFrame(rows, ["lon", "lat", "w"])


def test_rasterize_total_preserved(spark, points):
    base = VG.tile_points(points, zoom=10, weight_col="w")
    total_in = points.agg(F.sum("w")).first()[0]
    assert base.agg(F.sum("value")).first()[0] == total_in


def test_pyramid_sum_preserved_per_level(spark, points):
    base = VG.tile_points(points, zoom=6)
    pyr = VG.pyramid(base, base_zoom=6)
    sums = {
        r["zoom"]: r["s"]
        for r in pyr.groupBy("zoom").agg(F.sum("value").alias("s")).collect()
    }
    assert set(sums) == set(range(0, 7))
    assert len(set(sums.values())) == 1  # every level preserves the total


def test_downsample_parent_relation(spark, points):
    base = VG.tile_points(points, zoom=4)
    parent = VG.downsample(base, 1)
    # recompute parents directly from raw points at zoom 3
    direct = VG.tile_points(points, zoom=3)
    a = sorted(map(tuple, parent.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_vectorize_zorder_unique_per_tile(spark, points):
    base = VG.tile_points(points, zoom=8)
    feats = VG.vectorize(base)
    dup = (
        feats.groupBy("zoom", "tx", "ty", "__id")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    bad = feats.where((F.col("ccol") >= 128) | (F.col("crow") >= 128)).count()
    assert bad == 0


def test_sparse_tiles_shape(spark, points):
    base = VG.tile_points(points, zoom=8)
    tiles = VG.to_sparse_tiles(base)
    row = tiles.first()
    assert row["total"] == sum(row["cells"].values())
    assert all(0 <= k < 128 * 128 for k in row["cells"])
