"""As-of (backward) join — an operator Spark lacks natively.

For every left row, attach the value columns of the latest right row with
`right.time <= left.time` within the same key. The OSM-domain instance of
this shape is "element state as of T" (snapshot semantics, cf. the
reference's updater snapshot schema `src/analytics/.../updater/schemas/
Snapshot.scala`); the training-data instance is event attribution
(purchase → most recent prior click).

Implementation: the union-merge trick, NOT a range join —

    union(left tagged probe=1, right tagged probe=0)
      → window over (key) ordered by (time, probe, tiebreak)
      → last(right_value, ignorenulls) carried forward
      → keep probe rows

One shuffle on the key, O(n log n) in-partition sort, O(1) state while
scanning. The naive alternative — join on key + `r.time <= l.time` then
argmax — materializes every (left, right) pair within a key before pruning
(quadratic in rows-per-key, the classic skew bomb at 100 TB); Spark's range
-join support gives no as-of pruning either. The same merge shape is how
kdb/QuestDB/DuckDB execute ASOF natively, which also makes the semantics
directly oracle-checkable against DuckDB's `ASOF LEFT JOIN`.

Determinism: right rows sharing (key, time) are tie-broken by the ordered
`tiebreak` columns (last one wins — i.e. the max), so results are stable
across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str],
    out_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left columns + `{out_prefix}{c}` for each value
    column of the latest right row at-or-before the left row's time (null
    when no such row exists)."""
    lcols = left.columns
    rtypes = dict(right.dtypes)
    l = left.select(
        *lcols,
        F.lit(1).alias("__probe"),
        *[
            F.lit(None).cast(rtypes[c]).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    ltypes = dict(left.dtypes)
    r = right.select(
        *[
            F.col(c) if c in (key, time_col) else F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__probe"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    order = [
        F.col(time_col).asc(),
        F.col("__probe").asc(),  # right rows sort before probes at equal time
        *[F.col(f"__r_{c}").asc_nulls_first() for c in value_cols],
    ]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{out_prefix}{c}")
        for c in value_cols
    ]
    return (
        u.select(*lcols, "__probe", *carried)
        .where(F.col("__probe") == 1)
        .drop("__probe")
    )
