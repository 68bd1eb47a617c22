"""Streaming sources and exactly-once LakeTable ingestion.

Reference analogue: the staging-table + scheduled-flush ingestion
pattern (docs/iceberg-tables.md:169-186), upgraded to Structured
Streaming micro-batches with snapshot-commit idempotency — the same
exactly-once contract Iceberg's Spark sink gets from commit metadata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pg_lake_spark.lakehouse.table import LakeTable

# (the "streaming-batch-id" summary key is owned by
# LakeTable.append_streaming_batch — no second copy of it here)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    Schema comes from a batch read of the same path (file streams need
    an explicit schema); TIMESTAMP(NANOS) columns arrive as long nanos
    (session.py nanosAsLong) and are normalized to timestamp_ntz here,
    exactly as the batch path does, so stream and batch agree.
    """
    path = os.path.join(sf_dir, "events.parquet")
    batch_schema = spark.read.parquet(path).schema
    # The file-stream source requires a directory or glob (a bare file
    # path fails the basePath-directory check), so glob the exact name.
    glob = os.path.join(sf_dir, "events.[p]arquet")
    sdf = spark.readStream.schema(batch_schema).parquet(glob)
    if dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Watermarks require TIMESTAMP (with zone); the session runs UTC so
    # the cast from the file's NTZ semantics is value-preserving. Window
    # bounds are cast back to NTZ by the window builders' callers.
    if dict(sdf.dtypes).get("ts") == "timestamp_ntz":
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def stream_ingest_to_lake(
    source: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Ingest a streaming DataFrame into a LakeTable, exactly once.

    foreachBatch gives at-least-once replay on failure; idempotency
    comes from a per-stream high-water batch id in table properties
    (keyed by the checkpoint location), checked and advanced inside the
    commit lock by ``LakeTable.append_streaming_batch``. Tracking it in
    properties rather than the latest snapshot's summary means commits
    interleaved by other writers (manual appends, deletes, compaction,
    a second stream on the same table) can never reset the mark and let
    a replayed micro-batch append twice. This is the pure-metadata
    equivalent of Iceberg's commit-dedup for the Spark streaming sink.
    """
    import hashlib

    stream_key = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode("utf-8")
    ).hexdigest()[:12]

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.refresh()
        table.append_streaming_batch(batch_df, stream_key, batch_id)

    writer = source.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ingest_to_delta(
    source: DataFrame,
    location: str,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Exactly-once streaming ingest into a DELTA table via the
    protocol's ``txn`` action (PROTOCOL.md 'Transaction Identifiers' —
    the same dedup delta-spark's streaming sink uses): each micro-batch
    commits with {appId: <checkpoint key>, version: batch_id}; a
    replayed batch at or below the recorded high-water is skipped, and
    the put-if-absent commit file makes the version race safe. Foreign
    Delta readers (including our own scan_delta) therefore see each
    batch exactly once."""
    import hashlib

    from pg_lake_spark.lakehouse.delta_meta import (
        ConcurrentDeltaCommitError,
        append_delta_txn,
    )

    app_id = "pg_lake_stream_" + hashlib.md5(
        os.path.abspath(checkpoint_dir).encode("utf-8")
    ).hexdigest()[:12]

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        while True:
            try:
                append_delta_txn(
                    batch_df.sparkSession, location, batch_df, app_id, batch_id
                )
                return
            except ConcurrentDeltaCommitError:
                continue  # re-replay picks up the winner, then retry/skip

    writer = source.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
