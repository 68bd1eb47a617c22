"""Structured Streaming surface (SURVEY §2.11 — greenfield).

The reference has no streaming operators; its nearest patterns are the
staging-table + pg_cron flush (docs/iceberg-tables.md:169-186) and
autovacuum. This package is the Spark-native north-star version:
file/stream sources → watermarked windowed aggregations → exactly-once
ingestion into LakeTable snapshots.
"""

from pg_lake_spark.streaming.feed import AppendFeed
from pg_lake_spark.streaming.ingest import read_events_stream, stream_ingest_to_lake
from pg_lake_spark.streaming.stateful import running_user_totals
from pg_lake_spark.streaming.windows import (
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "AppendFeed",
    "read_events_stream",
    "stream_ingest_to_lake",
    "running_user_totals",
    "run_available_now",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
