"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship changeset-stats pipeline at sf0.001 (smoke).
queries()      — one callable per implemented operator family from
                 SURVEY.md §2 + the LLM-data-pipeline extensions; each
                 takes (spark, sf_dir) and returns a DataFrame.
oracle_sql()   — matching DuckDB SQL per query (identical column names,
                 identical rounding); queries without an entry here get the
                 driver's weaker rows-only check.

Implementation lives in osmesa_spark/queries.py (registry) and the
osmesa_spark package (engine operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmesa_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.registry()["changeset_stats"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in _q.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _q.registry().items()
        if spec.oracle is not None
    }
