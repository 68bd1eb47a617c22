"""`lake_feed`: a real Structured Streaming source over LakeTable appends.

The reference's CDC story is one-directional ingest (staging table →
lake flush, docs/iceberg-tables.md:169-186) plus the read-side
:class:`~pg_lake_spark.streaming.feed.AppendFeed` poller. This module
upgrades the read side to a first-class Spark source using the Spark 4
Python Data Source API: ``spark.readStream.format("lake_feed")
.option("path", location).load()`` — offsets are snapshot ids, each
micro-batch is exactly the files stamped with in-range snapshots, and
Spark's own checkpointing replaces the hand-rolled bookmark file, giving
exactly-once end-to-end when paired with an idempotent/transactional
sink (the same contract as Iceberg's Spark streaming source).

Scale/design notes:
- ``latestOffset`` reads one small metadata JSON; ``partitions`` walks
  manifests driver-side (O(#new files)) and emits ONE partition PER
  DATA FILE, so batch parallelism tracks the append volume.
- Executors read their file with pyarrow and emit Arrow record batches
  — no Python row loops; era transforms (renames, constant backfills
  from the schema log) are resolved driver-side into per-partition
  rename/backfill instructions.
- A DELETE/MERGE/compaction snapshot inside a batch range raises (an
  append delta cannot represent a rewrite) — the stream fails loudly
  and the consumer resyncs from a full scan, exactly like
  ``incremental_scan``.

Options:
- ``path`` (required): LakeTable root.
- ``startFrom``: ``"now"`` (default — tail from the current snapshot) or
  a snapshot id (``"0"`` replays the full table, valid while the whole
  history is retained).
"""

from __future__ import annotations

import ast
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


def _load_meta(location: str):
    from pg_lake_spark.lakehouse import catalog as cat

    return cat.read_current_metadata(location)


def _parse_default(sql_literal: str | None):
    """SQL literal → python value for backfill columns. Supports the
    constant defaults the engine writes (numbers, 'strings', NULL,
    booleans); anything fancier fails loudly here, driver-side."""
    if sql_literal is None:
        return None
    s = sql_literal.strip()
    if s.upper() == "NULL":
        return None
    if s.upper() in ("TRUE", "FALSE"):
        return s.upper() == "TRUE"
    if s.startswith("'") and s.endswith("'"):
        return s[1:-1].replace("''", "'")
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        raise ValueError(
            f"lake_feed cannot evaluate backfill default {sql_literal!r} "
            "(constant literals only)"
        ) from None


def _ddl_fields(ddl: str) -> list[tuple[str, str]]:
    """Top-level (name, type) pairs from a comma-joined DDL string,
    pure Python (depth-aware over decimal(p,s)/struct<...>/map<...>
    commas) — StructType.fromDDL is a py4j call, unavailable in the
    context-free Python worker where the stream planner runs. Types
    are normalized to lowercase with whitespace collapsed so they
    compare against ``DataType.simpleString()``."""
    fields: list[tuple[str, str]] = []

    def emit(part: str) -> None:
        part = part.strip()
        if not part:
            return
        name, _, typ = part.partition(" ")
        # nullability is not part of the frozen arrow type — a
        # 'NOT NULL' suffix must not read as a type change
        typ = re.sub(r"\s+not\s+null\s*$", "", typ.strip(), flags=re.I)
        fields.append((name.strip("`"), re.sub(r"\s+", "", typ.lower())))

    depth, start = 0, 0
    for idx, ch in enumerate(ddl):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            emit(ddl[start:idx])
            start = idx + 1
    emit(ddl[start:])
    return fields


def _ddl_field_names(ddl: str) -> list[str]:
    return [n for n, _ in _ddl_fields(ddl)]


class _FilePartition(InputPartition):
    def __init__(self, path: str, phys: dict, backfills: dict):
        self.path = path
        self.phys = phys  # logical -> physical column name in this file
        self.backfills = backfills  # logical -> constant python value


class LakeFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.location = options.get("path")
        if not self.location:
            raise ValueError("lake_feed requires .option('path', <table root>)")
        self.schema = schema
        start = str(options.get("startFrom", options.get("startfrom", "now")))
        self._start = start

    # -- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:
        if self._start.lower() == "now":
            md = _load_meta(self.location)
            return {"snapshot_id": md.current_snapshot_id or 0}
        return {"snapshot_id": int(self._start)}

    def latestOffset(self) -> dict:
        md = _load_meta(self.location)
        return {"snapshot_id": md.current_snapshot_id or 0}

    # -- planning ----------------------------------------------------------

    def _era_info(self, schema_log: list[dict], era_key: tuple[int, ...]):
        """Mirror of LakeTable._era_info, but driven by the reader's own
        StructType — this planner runs in a context-free Python worker
        where StructType.fromDDL (a py4j call) is unavailable."""
        phys = {f.name: f.name for f in self.schema.fields}
        backfills: dict[str, str | None] = {}
        for i in reversed(era_key):
            e = schema_log[i]
            if e["op"] == "rename":
                for lg, p in phys.items():
                    if p == e["to"]:
                        phys[lg] = e["from"]
                        break
            elif e["op"] == "backfill":
                lg = next((lg for lg, p in phys.items() if p == e["column"]), None)
                if lg is not None:
                    backfills[lg] = e.get("default")
            # "drop" events need no read-time action (re-adds backfill)
        return phys, backfills

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from pg_lake_spark.lakehouse import catalog as cat

        s, e = int(start["snapshot_id"]), int(end["snapshot_id"])
        if e <= s:
            return []
        md = _load_meta(self.location)
        known = {sn.snapshot_id for sn in md.snapshots}
        if e not in known:
            raise ValueError(f"snapshot {e} not found (expired?)")
        in_range = [sn for sn in md.snapshots if s < sn.snapshot_id <= e]
        # Snapshot ids are strictly sequential (table.py commit), so a
        # shorter-than-(e-s) range means EXPIRY removed snapshots inside
        # the batch window — and with them the evidence of any
        # non-append operation they carried. The non_append check below
        # only sees surviving snapshots, so without this completeness
        # check an expired UPDATE/DELETE slipped through and its
        # rewritten files re-emitted as appends (silent duplicates +
        # missed deletes, r15 review). Fail loudly instead.
        if len(in_range) != e - s:
            missing = sorted(set(range(s + 1, e + 1)) - {sn.snapshot_id for sn in in_range})
            raise ValueError(
                f"lake_feed: snapshots {missing} in batch range ({s}, {e}] "
                "were expired before the stream read them — their "
                "operations are unknowable; resync from a full scan"
            )
        # "alter" commits are pure metadata (schema evolution, no file
        # changes) — the era mapping absorbs them; row rewrites cannot
        # be represented as an append delta and must fail loudly.
        non_append = [
            sn.snapshot_id for sn in in_range if sn.operation not in ("append", "alter")
        ]
        if non_append:
            raise ValueError(
                f"lake_feed range contains non-append snapshots {non_append}; "
                "resync from a full scan"
            )
        # The reader schema is FROZEN at stream start. Alters already in
        # history resolve BACKWARD per file era (that is how startFrom=0
        # replays across renames/backfills), but a rename/drop committed
        # AFTER the stream froze its schema leaves files whose physical
        # columns the frozen mapping cannot locate. Detect it as "the
        # table's current column list no longer matches the frozen one"
        # and fail loudly at planning (driver-side) instead of an opaque
        # pyarrow field-not-found on an executor; restarting adopts the
        # new schema. A trailing ADD is tolerated: its extra column is
        # simply not projected.
        # Compare names AND types: a name-only check let
        # alter_column_type (op 'retype') pass undetected, and
        # post-retype files then narrow-cast to the frozen arrow type
        # with an opaque executor-side ArrowInvalid — exactly the
        # failure this guard exists to turn into a loud driver error
        # (r15 review).
        current = _ddl_fields(md.schema_ddl)
        frozen = [
            (f.name, re.sub(r"\s+", "", f.dataType.simpleString().lower()))
            for f in self.schema.fields
        ]
        if current[: len(frozen)] != frozen:
            raise ValueError(
                f"lake_feed: table schema changed after stream start "
                f"(stream: {frozen}, table: {current}): restart the "
                "stream to adopt the new schema"
            )
        to_snap = md.snapshot_by_id(e)
        parts: list[InputPartition] = []
        for f in cat.read_snapshot_files(self.location, md, to_snap):
            if not (s < (f.added_snapshot_id or 0) <= e):
                continue
            # era keys on schema_snapshot_id first, mirroring
            # LakeTable._era_key exactly: rewrites pin added_snapshot_id
            # to an older sequence for MoR-delete scoping while their
            # bytes carry the rewrite-time schema. (Unreachable today —
            # rewrite snapshots fail the non_append gate above — but the
            # two derivations must not drift; r16 review.)
            fsid = f.schema_snapshot_id or f.added_snapshot_id or 0
            era_key = tuple(
                i
                for i, ev in enumerate(md.schema_log)
                if fsid < ev["snapshot_id"]
            )
            phys, backfills = self._era_info(md.schema_log, era_key)
            parts.append(
                _FilePartition(
                    f.path,
                    dict(phys),
                    {k: _parse_default(v) for k, v in backfills.items()},
                )
            )
        return parts

    # -- execution (runs on executors) ------------------------------------

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        logical_names = [f.name for f in self.schema.fields]
        want_physical = [
            partition.phys[n]
            for n in logical_names
            if n not in partition.backfills and n in partition.phys
        ]
        tbl = pq.read_table(partition.path, columns=want_physical)
        n = tbl.num_rows
        cols = []
        for name, field in zip(logical_names, target):
            if name in partition.backfills:
                v = partition.backfills[name]
                # pa.repeat is O(1) in Python objects; a [v] * n list
                # literal allocated n boxed values per file read
                cols.append(
                    pa.nulls(n, field.type)
                    if v is None
                    else pa.repeat(pa.scalar(v, type=field.type), n)
                )
            else:
                cols.append(tbl.column(partition.phys[name]).cast(field.type))
        out = pa.table(cols, schema=target)
        yield from out.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint holds the offset; nothing to persist


class LakeFeedDataSource(DataSource):
    """``spark.dataSource.register(LakeFeedDataSource)`` then
    ``spark.readStream.format("lake_feed")``."""

    @classmethod
    def name(cls) -> str:
        return "lake_feed"

    def schema(self) -> str:
        location = self.options.get("path")
        if not location or not os.path.isdir(location):
            raise ValueError(f"lake_feed: no table at {location!r}")
        return _load_meta(location).schema_ddl

    def streamReader(self, schema: StructType) -> LakeFeedStreamReader:
        return LakeFeedStreamReader(schema, dict(self.options))


def register_lake_feed(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(LakeFeedDataSource)
