"""Table metadata: versions, snapshots, manifests, commit protocol.

Models the reference's system catalogs (SURVEY §1.3) as JSON under the
table location — the pure-PySpark stand-in for Iceberg metadata:

- ``lake_table.files``                  → manifest entries (path, rows, size)
- ``lake_table.data_file_column_stats`` → per-entry ``stats`` (min/max/nulls)
- ``partition_specs`` / ``data_file_partition_values`` → ``partition_spec``
  in metadata + per-entry ``partition`` dict
- Iceberg metadata.json / snapshots     → ``v{N}.metadata.json`` + immutable
  ``snap-*.json`` manifests; ``version-hint.text`` points at the current
  version (HadoopCatalog-style)
- ``lake_engine.deletion_queue``        → ``deletion_queue`` list in metadata
  (path + enqueue timestamp, purged by vacuum after retention)

Scale note: metadata.json stays O(#snapshots); file lists live in
per-snapshot manifest files so a 100 TB table with millions of files
never loads into one JSON blob unless a scan touches it — and scans
stream manifests per snapshot. Commit is single-writer via an O_EXCL
lock file + atomic rename, mirroring the reference's per-table writer
lock ("An update/delete command locks the table",
docs/iceberg-tables.md).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field


METADATA_DIR = "_lake_metadata"
VERSION_HINT = "version-hint.text"
LOCK_FILE = "commit.lock"


@dataclass
class DataFile:
    path: str
    row_count: int
    size_bytes: int
    partition: dict[str, object] = field(default_factory=dict)
    # col → {"min": v, "max": v, "null_count": n} (JSON-encodable values)
    stats: dict[str, dict] = field(default_factory=dict)
    # Snapshot that added this file — the data-sequence-number analogue
    # of the Iceberg spec. MoR delete predicates apply only to files
    # added strictly before the delete's snapshot, so later appends are
    # never hidden by an earlier delete. None = not yet committed
    # (stamped by the commit); legacy manifests deserialize as 0
    # (oldest, so every predicate applies — the pre-field behavior).
    added_snapshot_id: int | None = None
    # Snapshot whose SCHEMA the file was physically written under —
    # distinct from added_snapshot_id because rewrites (compaction,
    # materialize_deletes) pin added_snapshot_id to their inputs'
    # oldest sequence for MoR-delete scoping while writing bytes in the
    # CURRENT schema: era resolution (renames/backfills) must follow
    # the physical layout, not the delete sequence, or a post-rename
    # rewrite of pre-rename files reads back as silent NULLs. None =
    # stamped at commit; legacy manifests fall back to
    # added_snapshot_id (the two were equal before rewrites pinned).
    schema_snapshot_id: int | None = None
    # Partition spec this file was written under (spec evolution: new
    # specs apply to new files only; pruning consults the file's spec).
    spec_id: int = 0

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "row_count": self.row_count,
            "size_bytes": self.size_bytes,
            "partition": self.partition,
            "stats": self.stats,
            "added_snapshot_id": self.added_snapshot_id or 0,
            "schema_snapshot_id": self.schema_snapshot_id
            or self.added_snapshot_id
            or 0,
            "spec_id": self.spec_id,
        }

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(
            path=d["path"],
            row_count=d["row_count"],
            size_bytes=d["size_bytes"],
            partition=d.get("partition", {}),
            stats=d.get("stats", {}),
            added_snapshot_id=d.get("added_snapshot_id", 0),
            schema_snapshot_id=d.get("schema_snapshot_id"),
            spec_id=d.get("spec_id", 0),
        )


@dataclass
class Snapshot:
    snapshot_id: int
    timestamp_ms: int
    operation: str  # append | delete | overwrite | compact
    manifests: list[str]  # relative paths under _lake_metadata
    summary: dict = field(default_factory=dict)


class TableMetadata:
    """In-memory image of one metadata version."""

    def __init__(
        self,
        location: str,
        schema_ddl: str,
        partition_spec: list[dict] | None = None,
        properties: dict | None = None,
    ):
        self.location = location
        self.table_uuid = str(uuid.uuid4())
        self.schema_ddl = schema_ddl
        # Partition-spec evolution: spec_id → [{transform,param,column}].
        # New files are written under default_spec_id; each file records
        # its own spec for pruning (alter_table.c spec-evolution rows).
        self.partition_specs: dict[int, list[dict]] = {0: partition_spec or []}
        self.default_spec_id: int = 0
        self.properties = properties or {}
        self.snapshots: list[Snapshot] = []
        self.current_snapshot_id: int | None = None
        self.deletion_queue: list[dict] = []  # {"path":…, "enqueued_ms":…}
        # Merge-on-read delete predicates (position-delete analogue,
        # writes.md:15-31): {"predicate": sql, "added_snapshot_id": id,
        # "materialized_snapshot_id": id | None}. Readers of snapshot S
        # apply a predicate iff added ≤ S < materialized.
        self.delete_predicates: list[dict] = []
        # Read-era schema events (rename / add-with-backfill / drop),
        # each scoped by the snapshot that committed it — files written
        # before an event read through its inverse (old physical name,
        # constant backfill). Analogue of Iceberg field-id resolution.
        self.schema_log: list[dict] = []
        # Current write-time defaults: column → SQL literal (PG "SET
        # DEFAULT" semantics — applies to future inserts only).
        self.column_defaults: dict[str, str] = {}
        self.version = 0

    @property
    def partition_spec(self) -> list[dict]:
        """The default (current-write) partition spec."""
        return self.partition_specs[self.default_spec_id]

    # -- serialization ---------------------------------------------------
    def to_json(self) -> dict:
        return {
            "format_version": 1,
            "table_uuid": self.table_uuid,
            "location": self.location,
            "schema_ddl": self.schema_ddl,
            "partition_spec": self.partition_spec,
            "partition_specs": {str(k): v for k, v in self.partition_specs.items()},
            "default_spec_id": self.default_spec_id,
            "schema_log": self.schema_log,
            "column_defaults": self.column_defaults,
            "properties": self.properties,
            "current_snapshot_id": self.current_snapshot_id,
            "snapshots": [
                {
                    "snapshot_id": s.snapshot_id,
                    "timestamp_ms": s.timestamp_ms,
                    "operation": s.operation,
                    "manifests": s.manifests,
                    "summary": s.summary,
                }
                for s in self.snapshots
            ],
            "deletion_queue": self.deletion_queue,
            "delete_predicates": self.delete_predicates,
            "version": self.version,
        }

    @staticmethod
    def from_json(d: dict) -> "TableMetadata":
        md = TableMetadata(d["location"], d["schema_ddl"], d.get("partition_spec"), d.get("properties"))
        if "partition_specs" in d:
            md.partition_specs = {int(k): v for k, v in d["partition_specs"].items()}
            md.default_spec_id = d.get("default_spec_id", 0)
        md.schema_log = d.get("schema_log", [])
        md.column_defaults = d.get("column_defaults", {})
        md.table_uuid = d["table_uuid"]
        md.current_snapshot_id = d.get("current_snapshot_id")
        md.snapshots = [
            Snapshot(
                snapshot_id=s["snapshot_id"],
                timestamp_ms=s["timestamp_ms"],
                operation=s["operation"],
                manifests=s["manifests"],
                summary=s.get("summary", {}),
            )
            for s in d.get("snapshots", [])
        ]
        md.deletion_queue = d.get("deletion_queue", [])
        md.delete_predicates = d.get("delete_predicates", [])
        md.version = d.get("version", 0)
        return md

    # -- snapshot helpers -------------------------------------------------
    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        raise KeyError(f"snapshot {snapshot_id} not found")

    def snapshot_as_of(self, ts_ms: int) -> Snapshot:
        eligible = [s for s in self.snapshots if s.timestamp_ms <= ts_ms]
        if not eligible:
            raise KeyError(f"no snapshot at or before {ts_ms}")
        # snapshot_id tie-break: rapid commits can share a millisecond,
        # and "as of T" must resolve to the LATEST of them
        return max(eligible, key=lambda s: (s.timestamp_ms, s.snapshot_id))

    def current_snapshot(self) -> Snapshot | None:
        if self.current_snapshot_id is None:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)


# ---------------------------------------------------------------------------
# Filesystem catalog operations (local / any fsspec-mountable path)
# ---------------------------------------------------------------------------

def _meta_dir(location: str) -> str:
    return os.path.join(location, METADATA_DIR)


def _atomic_write(path: str, data: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def table_exists(location: str) -> bool:
    return os.path.exists(os.path.join(_meta_dir(location), VERSION_HINT))


def read_current_metadata(location: str) -> TableMetadata:
    mdir = _meta_dir(location)
    with open(os.path.join(mdir, VERSION_HINT)) as f:
        version = int(f.read().strip())
    with open(os.path.join(mdir, f"v{version}.metadata.json")) as f:
        md = TableMetadata.from_json(json.load(f))
    md.version = version
    return md


def write_manifest(location: str, files: list[DataFile]) -> str:
    """Write an immutable manifest; returns its metadata-relative name."""
    name = f"snap-{uuid.uuid4().hex}.json"
    _atomic_write(
        os.path.join(_meta_dir(location), name),
        json.dumps([f.to_json() for f in files]),
    )
    return name


def read_manifest(location: str, name: str) -> list[DataFile]:
    with open(os.path.join(_meta_dir(location), name)) as f:
        return [DataFile.from_json(d) for d in json.load(f)]


def read_snapshot_files(location: str, md: TableMetadata, snapshot: Snapshot) -> list[DataFile]:
    out: list[DataFile] = []
    for m in snapshot.manifests:
        out.extend(read_manifest(location, m))
    return out


class CommitLock:
    """Single-writer-per-table lock (O_EXCL create), with staleness
    takeover — the reference serializes writers the same way via table
    locks; readers never take it (snapshot isolation is free).

    Takeover protocol (r14 review): the naive ``unlink``-on-stale had a
    double-unlink race — two waiters could both deem the lock stale,
    waiter A unlink + re-create, and waiter B's queued unlink then
    removed A's FRESH lock, admitting a third writer alongside A.
    Takeover now goes through an atomic ``rename`` to a unique name, so
    exactly ONE taker wins a given stale lock; and the lock carries an
    owner token so ``__exit__`` only removes a lock this instance still
    owns (a displaced owner must not delete the usurper's lock).
    """

    def __init__(self, location: str, timeout_s: float = 30.0, stale_s: float = 300.0):
        self.path = os.path.join(_meta_dir(location), LOCK_FILE)
        self.timeout_s = timeout_s
        self.stale_s = stale_s
        self.token = f"{os.getpid()}:{uuid.uuid4().hex}"

    def __enter__(self):
        deadline = time.time() + self.timeout_s
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, self.token.encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    st = os.stat(self.path)  # inode + mtime in one shot
                    if time.time() - st.st_mtime > self.stale_s:
                        stale = f"{self.path}.stale.{uuid.uuid4().hex[:8]}"
                        try:
                            os.rename(self.path, stale)  # one taker wins
                        except FileNotFoundError:
                            continue
                        # Victim confirmation: rename acts on the PATH,
                        # so if the stale holder released and a fresh
                        # writer re-created between our stat and the
                        # rename, we just displaced a live lock. link()
                        # restores the same inode if the slot is still
                        # free; if a third writer slipped in, the
                        # displaced owner's token-guarded release keeps
                        # it from deleting that writer's lock (residual
                        # window needs a triple interleave within the
                        # stat-to-rename microseconds AND a stale-
                        # looking lock — beyond that, use a real lock
                        # service).
                        if os.stat(stale).st_ino != st.st_ino:
                            try:
                                os.link(stale, self.path)
                            except FileExistsError:
                                pass
                        os.unlink(stale)
                        continue
                except FileNotFoundError:
                    continue
                if time.time() > deadline:
                    raise TimeoutError(f"could not acquire table lock {self.path}")
                time.sleep(0.05)

    def __exit__(self, *exc):
        try:
            with open(self.path) as f:
                if f.read() != self.token:
                    return  # lost to staleness takeover: not ours anymore
            os.unlink(self.path)
        except FileNotFoundError:
            pass  # real release failures (EACCES/EIO) must surface


def commit_metadata(location: str, md: TableMetadata) -> TableMetadata:
    """Write v{N+1}.metadata.json and flip the version hint atomically.

    Caller must hold :class:`CommitLock`. Optimistic-concurrency check:
    the on-disk version must still equal the version ``md`` was loaded
    from (reference: snapshot-based conflict detection at commit,
    track_iceberg_metadata_changes.c).
    """
    mdir = _meta_dir(location)
    hint = os.path.join(mdir, VERSION_HINT)
    if os.path.exists(hint):
        with open(hint) as f:
            disk_version = int(f.read().strip())
        if disk_version != md.version:
            raise RuntimeError(
                f"concurrent commit detected: metadata v{disk_version} on disk, "
                f"expected v{md.version}"
            )
    new_version = md.version + 1
    md.version = new_version
    _atomic_write(os.path.join(mdir, f"v{new_version}.metadata.json"), json.dumps(md.to_json()))
    _atomic_write(hint, str(new_version))
    return md


def create_table_metadata(
    location: str,
    schema_ddl: str,
    partition_spec: list[dict] | None = None,
    properties: dict | None = None,
) -> TableMetadata:
    os.makedirs(_meta_dir(location), exist_ok=True)
    if table_exists(location):
        raise FileExistsError(f"table already exists at {location}")
    md = TableMetadata(location, schema_ddl, partition_spec, properties)
    with CommitLock(location):
        return commit_metadata(location, md)
