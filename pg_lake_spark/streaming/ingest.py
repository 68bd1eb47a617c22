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

#: Snapshot-summary key recording the last applied micro-batch id.
BATCH_ID_KEY = "streaming-batch-id"


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
    comes from stamping each snapshot with its micro-batch id and
    skipping batches at-or-below the last committed id — the replayed
    batch is recognized and dropped instead of double-appended. This is
    the pure-metadata equivalent of Iceberg's commit-dedup for the
    Spark streaming sink.
    """

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.refresh()
        snap = table.metadata.current_snapshot()
        last = -1
        if snap is not None:
            last = int(snap.summary.get(BATCH_ID_KEY, -1))
        if batch_id <= last:
            return  # replayed batch — already committed
        table.append(batch_df, extra_summary={BATCH_ID_KEY: batch_id})

    writer = source.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
