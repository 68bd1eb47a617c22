"""Incremental file-list pipeline (pg_incremental parity).

Reference: docs/use-case-log-management.md —
``incremental.create_file_list_pipeline('process-logs', file_pattern
:= 's3://…/*.csv.gz', batched := true, command := $$ insert into
logs_iceberg select * from logs_csv where _filename = any($1) $$)``:
a job that discovers files matching a pattern, processes NEW files in
batches of up to ``max_batch_size``, and never processes a file twice.

Engine translation: each batch is ONE multi-path Spark read over
exactly the batch's files (the reference's ``_filename = any($1)``
filter becomes the file list itself), an optional transform, and one
LakeTable append. Exactly-once comes from commit-time bookkeeping in
the TABLE's metadata: the pipeline's processed-file set lives in a
table PROPERTY (``pipeline-files:<name>``) that is checked and
advanced INSIDE the commit lock — the same design as the streaming
ingest's high-water mark, and for the same reasons:

- properties survive snapshot EXPIRY (the first version kept the set
  only in snapshot summaries, which ``max_snapshot_age`` expiry
  deletes — an expired pipeline silently re-ingested every file);
- the commit precondition makes two CONCURRENT ``run_pending`` calls
  safe: the loser's append aborts inside the lock instead of
  double-ingesting the batch.

Snapshot summaries still carry the batch's file list for provenance,
and legacy summaries are honored when reading the processed set
(pre-property tables migrate forward on their next append).
"""

from __future__ import annotations

import glob as _glob
import json

from pyspark.sql import DataFrame, functions as F

_SUMMARY_KEY = "pipeline-files"
_SUMMARY_NAME = "pipeline-name"
_PROP_PREFIX = "pipeline-files:"


def _glob_escape(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in a LITERAL path so
    DataFrameReader.load() (which re-parses every path as a glob) reads
    exactly the discovered file."""
    out = []
    for ch in path:
        if ch in "\\*?[]{}":
            out.append("\\")
        out.append(ch)
    return "".join(out)


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
        if max_batch_size < 1:
            raise ValueError(
                f"max_batch_size must be >= 1 (got {max_batch_size})"
            )
        self.name = name
        self.pattern = pattern
        self.table = table
        self.fmt = fmt
        self.max_batch_size = max_batch_size
        self.transform = transform
        self.reader_options = reader_options or {}

    # -- exactly-once bookkeeping (table property + legacy summaries) ------

    def _done_in(self, md) -> set[str]:
        prop = md.properties.get(_PROP_PREFIX + self.name)
        if prop is not None:
            # the property supersedes summaries by construction: every
            # mutate writes done-so-far (INCLUDING the legacy-summary
            # fold below) ∪ batch, so once it exists the summary walk
            # is pure overhead — O(snapshots × files) json.loads per
            # call, twice inside the commit lock (r15 review)
            return set(json.loads(prop))
        # legacy (pre-property) bookkeeping lived in snapshot summaries
        done: set[str] = set()
        for snap in md.snapshots:
            summary = snap.summary or {}
            if summary.get(_SUMMARY_NAME) == self.name:
                done.update(json.loads(summary.get(_SUMMARY_KEY, "[]")))
        return done

    def processed_files(self) -> set[str]:
        return self._done_in(self.table.metadata)

    def discover(self, spark=None) -> list[str]:
        """New files matching the pattern, oldest-name-first (stable
        processing order). Scheme'd patterns (s3a://…/*.csv.gz — the
        reference's headline example) go through Hadoop globStatus;
        local-only glob.glob silently discovered ZERO files for them
        forever (r15 review)."""
        done = self.processed_files()
        if "://" in self.pattern:
            if spark is None:
                raise ValueError(
                    f"pattern {self.pattern!r} needs a SparkSession to "
                    "glob its filesystem; call discover(spark)"
                )
            from pg_lake_spark.sources.readers import list_files

            found = [
                r["path"]
                for r in list_files(spark, self.pattern).collect()
                if not r["is_dir"]
            ]
        else:
            found = _glob.glob(self.pattern)
        return [p for p in sorted(found) if p not in done]

    # -- processing --------------------------------------------------------

    def _read_batch(self, spark, files: list[str]) -> DataFrame:
        """ONE read over the batch's files: N per-file reads paid N
        inference scans and a deep unionByName chain, and per-file CSV
        inference could even disagree across files (an all-null column
        inferred differently). ``_filename`` is the scan's own file
        path, percent-decoded to match the discovered names."""
        fl = self.fmt.lower()
        if fl in ("csv", "json", "parquet"):
            df = (
                spark.read.format(fl)
                .options(**{k: str(v) for k, v in self.reader_options.items()})
                # load() re-parses each path as a GLOB: a discovered
                # file literally named app[2024-01-15].csv would throw
                # 'Illegal file pattern' on every run and wedge the
                # pipeline forever (never committed as done, always
                # re-discovered — r15 review). Escape the metachars.
                .load([_glob_escape(p) for p in files])
            )
            if "_filename" in df.columns:
                raise ValueError(
                    "source data already has a _filename column; the "
                    "pipeline reserves that name for file provenance"
                )
            from pg_lake_spark.lakehouse.iceberg_meta import _norm_path

            return df.withColumn("_filename", _norm_path(F.col("_metadata.file_path")))
        # formats needing driver-side parsing (geo, xlsx, …) read per file
        from pg_lake_spark.sources.readers import read_lake

        parts = []
        for p in files:
            part = read_lake(spark, p, fmt=self.fmt, **dict(self.reader_options))
            if "_filename" in part.columns:
                # same reserved-name rule as the spark-format branch:
                # silently overwriting the user's column destroys data
                raise ValueError(
                    "source data already has a _filename column; the "
                    "pipeline reserves that name for file provenance"
                )
            parts.append(part.withColumn("_filename", F.lit(p)))
        df = parts[0]
        for part in parts[1:]:
            df = df.unionByName(part, allowMissingColumns=True)
        return df

    def run_pending(self, spark) -> dict:
        """Process every new file in batches; returns
        {files, batches, rows}."""
        stats = {"files": 0, "batches": 0, "rows": 0}
        # another process may have advanced the pipeline since this
        # handle loaded its metadata — a stale image would re-ingest
        self.table.refresh()
        prop = _PROP_PREFIX + self.name
        while True:
            pending = self.discover(spark)
            if not pending:
                return stats
            batch = pending[: self.max_batch_size]
            bset = set(batch)
            df = self._read_batch(spark, batch)
            if self.transform is not None:
                df = self.transform(df)
            if "_filename" in df.columns and "_filename" not in {
                n for n, _ in _table_fields(self.table)
            }:
                df = df.drop("_filename")

            def _precondition(md) -> bool:
                # checked inside the commit lock: a concurrent run that
                # ingested any of this batch first wins; we abort
                return not (self._done_in(md) & bset)

            def _mutate(md, sid) -> None:
                md.properties[prop] = json.dumps(
                    sorted(self._done_in(md) | bset)
                )

            snap = self.table.append(
                df,
                extra_summary={
                    _SUMMARY_NAME: self.name,
                    _SUMMARY_KEY: json.dumps(batch),
                },
                precondition=_precondition,
                mutate=_mutate,
            )
            if snap is None:
                # lost to a concurrent run: drop our staged files and
                # re-discover against the winner's bookkeeping
                self.table._discard_staging()
                self.table.refresh()
                continue
            stats["files"] += len(batch)
            stats["batches"] += 1
            stats["rows"] += int(snap.summary.get("added_rows", 0))


def _table_fields(table):
    from pg_lake_spark.lakehouse.table import ddl_fields

    return ddl_fields(table.metadata.schema_ddl)
