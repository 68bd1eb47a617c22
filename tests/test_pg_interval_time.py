"""INTERVAL-struct and TIME encodings (SURVEY §1.2 hard parts)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pg_lake_spark.functions.pg import (
    add_interval,
    interval_struct,
    micros_to_time_string,
    time_to_micros,
)


def test_interval_struct_roundtrip_parquet(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 31, 12, 0, 0))], "id bigint, ts timestamp_ntz"
    ).withColumn("ivl", interval_struct(1, 2, 3_500_000))
    out = str(tmp_path / "ivl.parquet")
    df.write.parquet(out)
    back = spark.read.parquet(out)
    row = back.select("ivl.months", "ivl.days", "ivl.microseconds").collect()[0]
    assert tuple(row) == (1, 2, 3_500_000)
    # DuckDB reads the same struct (cross-engine readability)
    import duckdb

    d = duckdb.sql(f"SELECT ivl.months, ivl.days, ivl.microseconds FROM read_parquet('{out}/*.parquet')").fetchall()
    assert d[0] == (1, 2, 3_500_000)


def test_add_interval_pg_month_clamp(spark):
    # Jan 31 + 1 month clamps to Feb 29 (2024 leap), like PG
    df = spark.createDataFrame([(datetime(2024, 1, 31, 10, 30),)], "ts timestamp_ntz")
    got = df.select(
        add_interval("ts", interval_struct(1, 1, 90_000_000)).alias("r")
    ).collect()[0].r
    # Feb 29 10:30 + 1 day + 90 s
    assert got == datetime(2024, 3, 1, 10, 31, 30)


def test_time_encoding_roundtrip(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 5, 1, 13, 45, 30, 123456),)], "ts timestamp_ntz"
    )
    enc = df.select(time_to_micros("ts").cast("bigint").alias("t"))
    micros = enc.collect()[0].t
    assert micros == ((13 * 3600 + 45 * 60 + 30) * 1_000_000 + 123456)
    s = enc.select(micros_to_time_string("t").alias("s")).collect()[0].s
    assert s == "13:45:30.123456"
