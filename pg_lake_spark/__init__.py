"""pg_lake_spark — a PySpark-native lakehouse analytics engine.

A from-scratch reimplementation of the *capabilities* of
Snowflake-Labs/pg_lake (reference: /root/reference, v3.5) on top of
Apache Spark. pg_lake is a query-delegation engine (Postgres planner →
DuckDB executor); here a single engine (Spark SQL / Catalyst / Tungsten)
plays both roles, and this package supplies the lakehouse layer on top:

- ``LakeSession``      — session facade; lake-table registration with
                         schema inference (SURVEY §1.1, §3.1).
- ``sources``          — Parquet/CSV/JSON/log readers with dialect
                         sniffing, globbing, filename column (SURVEY §2.1).
- ``functions``        — PG-compatible scalar function layer: the
                         semantic fixes pg_lake applies in
                         rewrite_query.c / to_char.c / duckdb_pglake
                         (SURVEY §2.7).
- ``operators``        — dedup / similarity / text-analysis / as-of —
                         operators beyond Spark built-ins.
- ``lakehouse``        — Iceberg-style transactional tables over Parquet:
                         snapshots, hidden partitioning transforms,
                         file-level stats pruning, DML (SURVEY §2.8-2.9).
- ``streaming``        — Structured Streaming ingestion path (additive).
"""

from pg_lake_spark.session import LakeSession, get_spark, load_tables

__all__ = ["LakeSession", "get_spark", "load_tables"]
__version__ = "0.1.0"
