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
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a bounded streaming DataFrame through a memory sink.

    availableNow processes everything currently in the source and stops;
    complete mode re-emits the final aggregate state, which for bounded
    input equals the batch answer (append mode would hold back windows
    the watermark has not passed — with a bounded source the watermark
    never passes the last window).

    ``state_partitions`` overrides ``spark.sql.shuffle.partitions`` for
    THIS stream only (the value is pinned into the checkpoint at first
    start, so restoring the conf afterwards cannot affect the running
    query). Use it for aggregations whose KEY space is bounded and
    independent of fact volume — tumbling/sliding counts key on
    (window x type), which grows with the time span, not the corpus —
    where per-partition state-store fixed costs dominate: each of the
    default 32 state partitions pays provider/snapshot overhead every
    micro-batch for a handful of keys (sf0.1 A/B: 1.43s -> 0.66s at
    8 partitions, identical results). Leave it None for keys that
    scale with the data (per-user state), where state VOLUME needs the
    full shuffle width. Scan parallelism is unaffected either way —
    file-source partitioning is independent of the shuffle setting,
    and map-side partial aggregation bounds each task's shuffle output
    by the key count.

    NOT thread-safe while ``state_partitions`` is set: the override
    briefly mutates the session-global ``spark.sql.shuffle.partitions``
    (a per-query conf does not exist for streaming state partitioning —
    the width is pinned into the checkpoint at first start), so any
    query PLANNED concurrently in the same session during the drain
    silently picks up the reduced width. A cloned session can't scope
    it either: ``streaming_df`` stays bound to the session that built
    it. Drive such streams from a single thread, or pass ``None``.
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Detach the result from the memory sink's temp view: checkpoint
        # the (small — it's a drained aggregate) result and DROP the
        # view. Leaving mem_<uuid> registered leaked every drained
        # query's full result in the driver for the session lifetime,
        # with a random name no caller could drop. Checkpoint blocks
        # free with the DataFrame.
        out = spark.table(name).localCheckpoint(eager=True)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        # the drop must also run when the drain RAISES (an errored
        # batch previously left the partial-result view registered
        # forever — the exact leak the detach exists to prevent)
        spark.catalog.dropTempView(name)
    return out


def stream_interval_join(
    events: DataFrame,
    *,
    left_type: str = "click",
    right_type: str = "purchase",
    lookback: str = "1 hour",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream interval join: each ``right_type`` event matched
    to the same user's ``left_type`` events in the preceding
    ``lookback`` (the attribution join — click before purchase).

    Both sides carry watermarks so Spark bounds the join STATE: a
    buffered left row is dropped once the right watermark passes
    l_ts + lookback — state is O(events in the lookback horizon), not
    O(stream). Inner stream-stream joins emit eagerly in append mode,
    so with a bounded (availableNow) source the result equals the
    batch interval join exactly. Reference parity: none — pg_lake has
    no streaming; this is the beyond-reference surface
    (SURVEY.md Phase 5)."""
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col(ts_col).alias("l_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col(ts_col).alias("r_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("l_ts") <= F.col("r_ts"))
        & (F.col("l_ts") >= F.col("r_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return left.join(right, cond, "inner").select(
        F.col("l_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.col("l_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("r_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )
