"""Local mirror of the driver's Spark-vs-DuckDB compare: row count, schema
(column names), and an order-insensitive value comparison with columns sorted
by name. Catches mismatches before the driver does."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and represent with enough digits to be exact-ish
        if v == 0:
            return "0"
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_spark_duckdb(spark_df, duck_con, sql: str) -> dict:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    result = {
        "rows_match": len(s_rows) == len(d_rows),
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "values_match": False,
    }
    if result["rows_match"] and result["schema_match"]:
        sn = normalize_rows(s_cols, s_rows)
        dn = normalize_rows(d_cols, d_rows)
        result["values_match"] = sn == dn
        if not result["values_match"]:
            diffs = [
                (a, b) for a, b in zip(sn, dn) if a != b
            ][:5]
            result["first_diffs"] = diffs
    return result
