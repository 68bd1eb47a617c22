"""Bucketed tables: co-located joins without shuffle.

Reference analogue: pg_lake's hidden ``bucket(N, col)`` partitioning
prunes scans but cannot co-locate joins — every DuckDB join rebuilds a
hash table. Spark bucketing goes further: two tables bucketed on the
same key into the same bucket count join with NO exchange (and with
``sort_by``, no sort) — the 100 TB answer for repeated fact-fact joins
on a stable key, paying one clustered write instead of a shuffle per
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    *,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``num_buckets`` should match across every table that will join on
    ``bucket_cols`` — equal bucketing on both sides is what lets the
    planner drop the exchange.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two equally-bucketed catalog tables on their bucket key.

    With matching bucket specs the physical plan is a sort-merge join
    whose both sides read pre-bucketed files — zero Exchange operators
    (verify with ``pg_lake_spark.plans.plan_summary``).
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
