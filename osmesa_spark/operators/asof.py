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

Determinism: right rows sharing (key, time) are tie-broken by the packed
value struct (last one wins — i.e. the max struct, field-lexicographic), so
results are stable across partitionings and engines.

Row atomicity: ALL value columns are packed into ONE struct and carried by a
single `last(struct, ignorenulls=True)` — probe rows contribute a NULL
struct, right rows a non-null struct whose FIELDS may be null. So (a) a
genuinely-NULL right-side value stays NULL in the output instead of
resolving to an older non-null value, and (b) every output row's value
columns come from the SAME right row, never a mix of tied rows.
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
    struct_ddl = ",".join(f"`{c}`:{rtypes[c]}" for c in value_cols)
    l = left.select(
        *lcols,
        F.lit(1).alias("__probe"),
        F.lit(None).cast(f"struct<{struct_ddl}>").alias("__rv"),
    )
    ltypes = dict(left.dtypes)
    r = right.select(
        *[
            F.col(c) if c in (key, time_col) else F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__probe"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    u = l.unionByName(r)
    order = [
        F.col(time_col).asc(),
        F.col("__probe").asc(),  # right rows sort before probes at equal time
        F.col("__rv").asc_nulls_first(),  # deterministic tie-break: max struct wins
    ]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__rv", ignorenulls=True).over(w)
    return (
        u.select(*lcols, "__probe", carried.alias("__c"))
        .where(F.col("__probe") == 1)
        .select(
            *lcols,
            *[
                F.col("__c").getField(c).alias(f"{out_prefix}{c}")
                for c in value_cols
            ],
        )
    )
