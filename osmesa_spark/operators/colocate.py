"""Join co-location strategies for cluster scale.

Two complements to AQE's runtime skew handling, both pure user-space (no
custom Catalyst rules — SURVEY §4):

* **Bucketed tables** — pay the shuffle ONCE at write time
  (`bucketBy(n, key)` + `sortBy`), then every join / aggregation keyed on
  the bucket column is exchange-free: Spark matches the two sides' bucket
  specs and plans a SortMergeJoin with no Exchange on either side. This is
  the right shape for the reference's repeatedly-joined big tables (history
  ⋈ changesets on `changeset`, node⋈way membership on `ref`) where the same
  key recurs across many queries — at 100 TB re-shuffling per query is the
  dominant cost, bucketing amortizes it to zero.
* **Salted joins** — when one side has pathological hot keys (a bot user's
  million-edit changeset, an empty-text fingerprint) AND the other side is
  too big to broadcast, split each hot key across `salts` tasks by salting
  the skewed side and replicating the matching rows of the other side
  `salts`×. Result-identical to the plain join; worst-task size drops by
  the salt factor at the cost of (salts×|dim|) replicated rows — only worth
  it when |dim| ≪ |skewed|, the same asymmetry a broadcast join needs, but
  without the single-executor memory bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize `df` as a parquet table bucketed (and sorted) by `key`.
    Returns the re-read table, whose bucket spec Catalyst uses to elide
    exchanges in downstream key-aligned joins and aggregations."""
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
    return df.sparkSession.table(table)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed ⋈ other` on `key`, spreading each of `skewed`'s
    keys across `salts` partitions. The salt is derived per-row (round-robin
    within partitions), `other` is exploded `salts`×; joining on
    (key, salt) makes every hot key land in `salts` separate tasks.
    Output columns = plain `skewed.join(other, key, how)`.

    `how` is restricted to inner/left/semi/anti: in right and full-outer
    joins the replicated `other` side null-extends each UNMATCHED row once
    per salt replica — `salts` duplicate output rows vs the plain join."""
    _SAFE_HOW = {
        "inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi",
        "anti", "left_anti", "leftanti", "cross",
    }
    if how.lower().replace(" ", "") not in _SAFE_HOW:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — right/full outer joins "
            "would emit one null-extended duplicate per salt replica of "
            "each unmatched row; use a plain join (or AQE skew hints)"
        )
    s = skewed.withColumn(
        "__salt",
        F.pmod(
            F.monotonically_increasing_id() + F.spark_partition_id(),
            F.lit(salts),
        ).cast("int"),
    )
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return s.join(o, [key, "__salt"], how).drop("__salt")


def hot_keys(
    df: DataFrame, key: str, threshold_fraction: float = 0.01, max_keys: int = 100
) -> list:
    """Find keys holding more than `threshold_fraction` of all rows — the
    candidates worth salting (or isolating into a broadcast side). One
    aggregation pass; intended for occasional planning, not per-query."""
    total = df.count()
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= int(total * threshold_fraction))
        .orderBy(F.desc("c"))
        .limit(max_keys)
        .collect()
    )
    return [r[key] for r in rows]


def zorder_cluster_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_files: int = 16,
    x_range: tuple[float, float] = (-180.0, 180.0),
    y_range: tuple[float, float] = (-90.0, 90.0),
) -> None:
    """Third layout complement: MULTI-dimensional data skipping by Z-order
    clustering (the Delta/Iceberg OPTIMIZE ZORDER shape, in plain parquet).

    Rows are range-partitioned then sorted by the Morton interleave of the
    quantized (x, y), so each output file — and each row group inside it —
    covers a compact Z-run, i.e. a small spatial rectangle. Parquet already
    keeps per-row-group min/max statistics on x and y; once the layout is
    Z-clustered those statistics become TIGHT, and any engine's stock
    stats-based pruning skips the row groups whose rectangle misses a bbox
    predicate. No index structure, no custom reader — the speedup is pure
    physical layout, which is exactly what survives a 1000-executor scan of
    100 TB (a single-column sort would only make ONE of the two predicates
    selective; the interleave shares the selectivity between both).

    One range-exchange + in-partition sort at write time; the sort key is
    dropped from the stored schema."""
    from osmesa_spark.functions.geo import zorder

    n = 1 << bits
    span_x = x_range[1] - x_range[0]
    span_y = y_range[1] - y_range[0]
    qx = F.least(
        F.greatest(
            F.floor((F.col(x_col) - x_range[0]) / span_x * n), F.lit(0)
        ),
        F.lit(n - 1),
    )
    qy = F.least(
        F.greatest(
            F.floor((F.col(y_col) - y_range[0]) / span_y * n), F.lit(0)
        ),
        F.lit(n - 1),
    )
    (
        df.withColumn("_zkey", zorder(qx, qy, bits=bits))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
