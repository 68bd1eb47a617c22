"""Incremental file-list pipeline (pg_incremental parity).

Reference: docs/use-case-log-management.md —
``incremental.create_file_list_pipeline('process-logs', file_pattern
:= 's3://…/*.csv.gz', batched := true, command := $$ insert into
logs_iceberg select * from logs_csv where _filename = any($1) $$)``:
a job that discovers files matching a pattern, processes NEW files in
batches of up to ``max_batch_size``, and never processes a file twice.

Engine translation: each batch is one ``read_lake`` over exactly the
batch's files (so only those files are scanned — the reference's
``_filename = any($1)`` filter becomes the file list itself), an
optional transform, and one LakeTable append. Exactly-once comes from
the TABLE's own commit log: every append stamps the batch's file list
into its snapshot summary, and the processed-set is rebuilt from those
summaries on startup — a crash between append and any external
bookmark cannot double-process (same design as the streaming ingest's
micro-batch replay protection).
"""

from __future__ import annotations

import glob as _glob
import json

from pyspark.sql import DataFrame, functions as F

_SUMMARY_KEY = "pipeline-files"
_SUMMARY_NAME = "pipeline-name"


class FileListPipeline:
    def __init__(
        self,
        name: str,
        pattern: str,
        table,
        *,
        fmt: str = "csv",
        max_batch_size: int = 100,
        transform=None,
        reader_options: dict | None = None,
    ) -> None:
        self.name = name
        self.pattern = pattern
        self.table = table
        self.fmt = fmt
        self.max_batch_size = max_batch_size
        self.transform = transform
        self.reader_options = reader_options or {}

    # -- exactly-once bookkeeping (from the table's snapshot summaries) ----

    def processed_files(self) -> set[str]:
        out: set[str] = set()
        for snap in self.table.metadata.snapshots:
            summary = snap.summary or {}
            if summary.get(_SUMMARY_NAME) != self.name:
                continue
            out.update(json.loads(summary.get(_SUMMARY_KEY, "[]")))
        return out

    def discover(self) -> list[str]:
        """New files matching the pattern, oldest-name-first (stable
        processing order)."""
        done = self.processed_files()
        return [p for p in sorted(_glob.glob(self.pattern)) if p not in done]

    # -- processing --------------------------------------------------------

    def _read_batch(self, spark, files: list[str]) -> DataFrame:
        from pg_lake_spark.sources.readers import read_lake

        parts = []
        for p in files:
            part = read_lake(spark, p, fmt=self.fmt, **dict(self.reader_options))
            parts.append(part.withColumn("_filename", F.lit(p)))
        df = parts[0]
        for part in parts[1:]:
            df = df.unionByName(part, allowMissingColumns=True)
        return df

    def run_pending(self, spark) -> dict:
        """Process every new file in batches; returns
        {files, batches, rows}."""
        pending = self.discover()
        stats = {"files": 0, "batches": 0, "rows": 0}
        for i in range(0, len(pending), self.max_batch_size):
            batch = pending[i : i + self.max_batch_size]
            df = self._read_batch(spark, batch)
            if self.transform is not None:
                df = self.transform(df)
            if "_filename" in df.columns and "_filename" not in {
                n for n, _ in _table_fields(self.table)
            }:
                df = df.drop("_filename")
            snap = self.table.append(
                df,
                extra_summary={
                    _SUMMARY_NAME: self.name,
                    _SUMMARY_KEY: json.dumps(batch),
                },
            )
            stats["files"] += len(batch)
            stats["batches"] += 1
            stats["rows"] += int(snap.summary.get("added_rows", 0))
        return stats


def _table_fields(table):
    from pg_lake_spark.lakehouse.table import ddl_fields

    return ddl_fields(table.metadata.schema_ddl)
