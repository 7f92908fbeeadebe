"""Every registry query must hash-match its DuckDB oracle at sf0.01 —
the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from osmesa_spark import queries as Q
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare_spark_duckdb

NAMES = sorted(Q.registry().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    spec = Q.registry()[name]
    df = spec.spark(spark, SF_CORRECT)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke
        return
    res = compare_spark_duckdb(df, duck, spec.oracle)
    assert res["schema_match"], f"{name}: schema {res['spark_cols']} vs {res['duck_cols']}"
    assert res["rows_match"], f"{name}: rows {res['spark_rows']} vs {res['duck_rows']}"
    assert res["values_match"], f"{name}: value mismatch, first diffs: {res.get('first_diffs')}"
