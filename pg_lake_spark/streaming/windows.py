"""Watermarked window aggregations over event streams.

All builders return *streaming* DataFrames; `run_available_now` drains
one through a memory sink and hands back the batch result (used by the
declared queries and tests, where the stream is bounded).

Scale notes: windowed aggregations are hash-partitioned by (window,
keys) and combine partially map-side like any groupBy; the watermark
bounds state size — late rows beyond it are dropped instead of growing
state forever. Session windows use Spark's native gap-merge operator.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            # back to NTZ so results line up with the batch/oracle corpus
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window event counts (each row lands in window/slide panes)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session windows: events within ``gap`` of each other merge.

    Output: (user_id, session_start, n_events) — session_start is the
    first event's timestamp, the stable key a batch oracle can recompute
    with the lag-gap-islands technique.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def run_available_now(
    streaming_df: DataFrame,
    spark: SparkSession,
    *,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain a bounded streaming DataFrame through a memory sink.

    availableNow processes everything currently in the source and stops;
    complete mode re-emits the final aggregate state, which for bounded
    input equals the batch answer (append mode would hold back windows
    the watermark has not passed — with a bounded source the watermark
    never passes the last window).
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
