"""Count-min sketch: fixed-memory frequency estimation (Cormode &
Muthukrishnan 2005) — the heavy-hitter / frequency path when the KEY SPACE
itself is too large to aggregate exactly (URLs, n-grams, user ids at
planetary scale). Complements `colocate.hot_keys` (exact, two passes, cost
scales with key cardinality): the sketch build's output is bounded by the
CHOSEN depth×width regardless of how many distinct keys the corpus holds —
the same boundedness contract as `dedup.bloom_bitmap`.

Hashing is the md5-derived portable hash shared with the dedup operators,
so a DuckDB oracle replays counters and estimates bit-for-bit (integer
sums, no float anywhere). Swap for `F.xxhash64` when oracle parity is not
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmesa_spark.operators.dedup import _portable_hash

# one independent hash row per depth level: portable_hash seeded per row
_CMS_SEED_BASE = 101


def _cms_pos(key: Column, row: int, width: int) -> Column:
    return _portable_hash(key.cast("string"), _CMS_SEED_BASE + row) % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the depth×width counter table (callers should filter null
    keys first — a null hashes to null positions and lands in a junk
    cell): one row-local explode of the
    key's `depth` (row, position) cells, then ONE partial-agg shuffle whose
    output is ≤ depth·width rows no matter the input size. Returns
    (row, pos, cnt)."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    _cms_pos(F.col(key_col), i, width).alias("pos"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        df.select(cells.alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate every key in `keys`: est = min over rows of the
    counter at (row, h_row(key)) — the CMS upper-bound estimate
    (est ≥ true count always; ≤ true + εN with high probability).

    The sketch (≤ depth·width rows) BROADCASTS into the probe join, so
    estimating any number of keys is a narrow map-side pass. The join is
    a LEFT join with absent cells counting 0 (same semantics as the
    streaming `SketchTable.estimates`): a key never seen by the build —
    or whose cells are only partially present because the build corpus
    never hashed anything there — estimates its true 0/partial floor
    instead of being silently dropped or over-estimated on fewer than
    `depth` cells."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_pos(F.col(key_col), i, width).alias("pos"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row", "c.pos")
    return (
        probes.join(F.broadcast(sketch), ["row", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Keys whose CMS estimate reaches `min_count` — a superset of the true
    heavy hitters (one-sided error: the sketch never undercounts, so no
    true heavy hitter is missed; collisions may admit a few light keys,
    bounded by εN = N/width per row).

    Output: (key, est_count), est_count ≥ min_count. At 100 TB the build
    is one bounded-output shuffle over the corpus and the probe runs over
    the distinct-key frame with the sketch broadcast."""
    sketch = cms_build(df, key_col, depth=depth, width=width)
    distinct_keys = df.select(key_col).distinct()
    return cms_estimate(
        distinct_keys, sketch, key_col, depth=depth, width=width
    ).where(F.col("est_count") >= min_count)
