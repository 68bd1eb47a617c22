"""Change-data feed: consume a LakeTable's appends incrementally.

The reference's ingestion loop is one-directional (staging table →
flush into the lake, docs/iceberg-tables.md:169-186); this is the
read-side complement — downstream consumers (feature builders, index
updaters, training-data exporters) tail a table's appended rows without
rescanning it, the way Iceberg's incremental append scan feeds Spark
streaming.

Semantics are explicit at-least-once: :meth:`AppendFeed.poll` returns
everything appended after the durable bookmark up to the table's
current snapshot, and the bookmark only advances on :meth:`commit` —
a consumer that crashes mid-batch re-reads the same delta on restart.
Exactly-once composes the same way it does for
``stream_ingest_to_lake``: make the downstream write idempotent (or
transactional with the bookmark) and commit after it lands.

A non-append snapshot (DELETE/MERGE/compaction) in the pending range
makes :meth:`poll` raise — row-level changes cannot be represented as
an append delta; the consumer must resync from a full scan and
:meth:`reset` past the rewrite. Scale: each poll reads only the delta's
files (O(new data)); the bookmark is one tiny JSON file.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from pg_lake_spark.lakehouse.table import LakeTable


class AppendFeed:
    """Tail a LakeTable's appends with a durable snapshot bookmark."""

    def __init__(
        self,
        table: LakeTable,
        checkpoint_path: str,
        *,
        start_from: int | None = None,
    ) -> None:
        """``start_from`` picks the initial bookmark when no checkpoint
        exists yet: a snapshot id, or None for "now" (the table's
        current snapshot — the standard tail-from-here CDC default;
        pass 0 to replay the full table)."""
        self.table = table
        self.checkpoint_path = checkpoint_path
        self._pending_to: int | None = None
        if os.path.exists(checkpoint_path):
            with open(checkpoint_path) as fh:
                self._bookmark = int(json.load(fh)["snapshot_id"])
        else:
            if start_from is None:
                start_from = table.refresh().metadata.current_snapshot_id or 0
            self._bookmark = start_from
            self._persist(start_from)

    @property
    def bookmark(self) -> int:
        return self._bookmark

    def _persist(self, snapshot_id: int) -> None:
        # shared uuid-tmp + fsync helper: a fixed ".tmp" name let two
        # feeds on one checkpoint path interleave writes, and an
        # unfsynced rename could regress the bookmark after a crash
        # (benign for at-least-once, but needless re-reads; r16 review —
        # same fix ObjectStoreCatalog.push got in r15)
        from pg_lake_spark.lakehouse.catalog import _atomic_write

        _atomic_write(self.checkpoint_path, json.dumps({"snapshot_id": snapshot_id}))

    def poll(self) -> DataFrame | None:
        """Rows appended since the bookmark (None when caught up). The
        same delta is returned again until :meth:`commit`."""
        self.table.refresh()
        current = self.table.metadata.current_snapshot_id
        if current is None or current <= self._bookmark:
            return None
        df = self.table.incremental_scan(self._bookmark, current)
        self._pending_to = current
        return df

    def commit(self) -> None:
        """Durably advance the bookmark past the last polled delta."""
        if self._pending_to is None:
            raise RuntimeError("commit() without a pending poll()")
        self._persist(self._pending_to)
        self._bookmark = self._pending_to
        self._pending_to = None

    def reset(self, snapshot_id: int) -> None:
        """Force the bookmark (resync point after a non-append rewrite)."""
        self._persist(snapshot_id)
        self._bookmark = snapshot_id
        self._pending_to = None
