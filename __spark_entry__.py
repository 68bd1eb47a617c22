"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``pg_lake_spark.queries`` — every declared operator
lives in the package registry (one definition feeding this module,
tests/, and bench.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from pg_lake_spark.queries import QUERIES

    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pg_lake_spark.queries import QUERIES

    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    from pg_lake_spark.queries import QUERIES

    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
