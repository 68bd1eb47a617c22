"""Differential correctness: every declared query with an oracle runs on
both engines and must match (the driver's CORRECTNESS gate, run locally).
Rows-only queries are smoke-checked for executability + stable schema.
"""

from __future__ import annotations

import pytest

from pg_lake_spark.queries import QUERIES
from tests.conftest import SF_DIR, assert_matches

WITH_ORACLE = sorted(name for name, s in QUERIES.items() if s.oracle)
ROWS_ONLY = sorted(name for name, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert_matches(df, duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert df.columns, "query must produce a schema"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
