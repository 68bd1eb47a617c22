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


def _bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]]:
    """(num_buckets, bucket_columns) from DESCRIBE EXTENDED, or (0, [])
    for an unbucketed table."""
    n, cols = 0, []
    for row in spark.sql(f"DESCRIBE EXTENDED {table}").collect():
        key = (row["col_name"] or "").strip()
        val = (row["data_type"] or "").strip()
        if key == "Num Buckets":
            n = int(val)
        elif key == "Bucket Columns":
            cols = [c.strip().strip("`") for c in val.strip("[]").split(",") if c.strip()]
    return n, cols


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

    The specs are VALIDATED up front: mismatched bucket counts,
    different bucket columns, or joining off the bucket key all
    silently degrade to a full shuffle join — the exact cost the
    clustered write was supposed to buy out — so they raise instead
    (r15 review).
    """
    ln, lcols = _bucket_spec(spark, left_table)
    rn, rcols = _bucket_spec(spark, right_table)
    if ln == 0 or rn == 0:
        raise ValueError(
            f"co_located_join requires bucketed tables: "
            f"{left_table} buckets={ln}, {right_table} buckets={rn}"
        )
    if ln != rn:
        raise ValueError(
            f"bucket counts differ ({left_table}={ln}, {right_table}={rn}); "
            "the planner will re-shuffle one side"
        )
    # Key ORDER is free — Spark reorders join keys against the bucket
    # spec (verified: bucketBy(8,a,b) joined on [b,a] runs with zero
    # exchanges on 4.1), so compare case-insensitive SETS. Subset/
    # superset keys are NOT free under the default
    # requireAllClusterKeysForCoPartition=true (verified: both shuffle),
    # so set equality stays required (r15 self-review).
    if {c.lower() for c in lcols} != {c.lower() for c in rcols} or {
        c.lower() for c in on
    } != {c.lower() for c in lcols}:
        raise ValueError(
            f"join keys {on} must equal both bucket specs "
            f"({left_table}={lcols}, {right_table}={rcols})"
        )
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
