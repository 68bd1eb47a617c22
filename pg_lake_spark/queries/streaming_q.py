"""Streaming queries (SURVEY §2.11 north-star; no reference analogue).

Each runs a real Structured Streaming pipeline (file source → watermark
→ windowed/stateful aggregation → memory sink, availableNow trigger)
over the bounded events table, so the result is deterministic and a
batch SQL oracle can verify it value-level:

- tumbling 1h windows  ↔ date_trunc('hour', ts)
- session windows      ↔ lag-gap-islands over (user_id, ts)
- stateful totals      ↔ plain groupBy
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_lake_spark.queries.registry import query
from pg_lake_spark.streaming import (
    read_events_stream,
    run_available_now,
    running_user_totals,
    session_window_agg,
    tumbling_window_agg,
)


@query(
    "st_tumbling_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           sum(value) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    doc="Streaming tumbling-window counts (watermark + window agg, availableNow).",
)
def st_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = tumbling_window_agg(read_events_stream(spark, sf_dir), window="1 hour")
    return run_available_now(sdf, spark).orderBy("window_start", "event_type")


@query(
    "st_session_windows",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT min(ts) AS session_start, user_id, count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    doc="Streaming session windows (30 min gap) vs batch lag-gap-islands oracle.",
)
def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = session_window_agg(read_events_stream(spark, sf_dir), gap="30 minutes")
    return run_available_now(sdf, spark).orderBy("user_id", "session_start")


@query(
    "st_stateful_user_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, sum(value) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Custom stateful operator (applyInPandasWithState running totals); "
    "bounded single-batch source makes it equal the batch groupBy.",
)
def st_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = running_user_totals(read_events_stream(spark, sf_dir))
    return run_available_now(sdf, spark, output_mode="update").orderBy("user_id")


@query(
    "st_sliding_counts",
    oracle="""
    SELECT pane AS window_start, event_type, count(*) AS n_events
    FROM (
        SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                       date_trunc('hour', ts)]) AS pane,
               event_type
        FROM events
    ) panes
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    doc="Streaming sliding windows (2h window, 1h slide): every event "
    "lands in two panes; the oracle unnests both pane starts.",
)
def st_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.streaming import sliding_window_agg

    sdf = sliding_window_agg(
        read_events_stream(spark, sf_dir), window="2 hours", slide="1 hour"
    )
    return run_available_now(sdf, spark).orderBy("window_start", "event_type")


@query(
    "st_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
    doc="Streaming exact dedup: Structured Streaming dropDuplicates "
    "keeps per-key state across micro-batches and emits each key once "
    "(append mode) — the streaming arm of the exact-dedup operator "
    "family; equals batch DISTINCT on the key columns for a bounded "
    "source.",
)
def st_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = (
        read_events_stream(spark, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    return run_available_now(sdf, spark, output_mode="append").orderBy(
        "user_id", "event_type"
    )
