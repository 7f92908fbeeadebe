"""Map-valued aggregation primitives.

Reference semantics: the changeset-stats rollup sums `map<string,int>` counts
and `map<string,double>` measurements element-wise across rows, and counts
country-code frequencies — Scala UDFs `sum_counts` / `sum_measurements` /
`count_values` / `merge_counts` / `simplify_counts`
(`src/analytics/src/main/scala/osmesa/analytics/stats/functions/package.scala:12-36`,
call site `.../apps/batch/ChangesetStatsCreator.scala:125-142`).

Spark-first design, two strategies:

1. **HOF fold** (`sum_map_values`): `aggregate(collect_list(m), map(), merge)`
   — literal translation, but `collect_list` has NO partial aggregation: every
   map row crosses the shuffle. Fine for small groups; wrong at 100 TB.

2. **explode → partial-agg → reassemble** (`map_sum_agg`): explode the map into
   (key, value) rows *before* the groupBy, sum per (group, key) — this gets
   map-side combine so the shuffle carries one row per (group, key) — then
   reassemble with `map_from_entries(collect_list(struct(k, v)))` over the
   already-reduced rows. Two narrow shuffles, both partially aggregated.
   This is the scale path; all engine pipelines use it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sum_map_values(maps_col: Column, value_type: str = "int") -> Column:
    """Element-wise sum of an array-of-maps column (HOF fold, small groups only).

    Equivalent of reference `sum_counts`/`sum_measurements`
    (`stats/functions/package.scala:12-21`).
    """
    zero = F.expr(f"cast(map() as map<string,{value_type}>)")
    return F.aggregate(
        maps_col,
        zero,
        lambda acc, m: F.map_zip_with(
            acc,
            m,
            lambda _k, a, b: F.coalesce(a, F.lit(0).cast(value_type))
            + F.coalesce(b, F.lit(0).cast(value_type)),
        ),
    )


def merge_counts(a: Column, b: Column, value_type: str = "int") -> Column:
    """Element-wise sum of two map columns (reference `merge_counts`,
    used for the way⋈point full-outer merge `ChangesetStatsCreator.scala:144-154`)."""
    zero = F.expr(f"cast(map() as map<string,{value_type}>)")
    return F.map_zip_with(
        F.coalesce(a, zero),
        F.coalesce(b, zero),
        lambda _k, x, y: F.coalesce(x, F.lit(0).cast(value_type))
        + F.coalesce(y, F.lit(0).cast(value_type)),
    )


def simplify_counts(m: Column) -> Column:
    """Drop zero/null entries (reference `simplify_counts`/`simplify_measurements`
    `stats/functions/package.scala:22-28`)."""
    return F.map_filter(m, lambda _k, v: v.isNotNull() & (v != 0))


def count_values(values: Column) -> Column:
    """Frequency map of an array<string> (reference `count_values`, used for
    per-changeset country edit counts `ChangesetStatsCreator.scala:129`).

    HOF form; for the scale path explode + groupBy instead (map_sum_agg).
    """
    return F.aggregate(
        values,
        F.expr("cast(map() as map<string,int>)"),
        lambda acc, v: F.map_zip_with(
            acc,
            F.create_map(v, F.lit(1)),
            lambda _k, a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
        ),
    )


def map_sum_agg(
    df: DataFrame,
    group_cols: list[str],
    map_col: str,
    out_col: str | None = None,
    value_type: str = "bigint",
) -> DataFrame:
    """Scale-path map aggregation: element-wise sum of ``map_col`` per group.

    explode → groupBy(group, key).sum (partial agg kicks in) →
    groupBy(group).map_from_entries. Returns one row per group with a
    map column ``out_col``. Keys are sorted for deterministic output.
    """
    out_col = out_col or map_col
    exploded = df.select(*group_cols, F.explode_outer(map_col).alias("__k", "__v"))
    per_key = (
        exploded.where(F.col("__k").isNotNull())
        .groupBy(*group_cols, "__k")
        .agg(F.sum("__v").cast(value_type).alias("__v"))
    )
    return per_key.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("__k"), F.col("__v"))))
        ).alias(out_col)
    )
