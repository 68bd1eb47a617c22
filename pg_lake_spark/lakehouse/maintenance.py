"""VACUUM: compaction, snapshot expiry, deletion-queue purge.

Reference: pg_lake_table/src/ddl/vacuum.c —
``VacuumCompactDataFiles`` (:670, merge small files up to target size),
``VacuumCompactMetadata`` (:808, expire snapshots older than
``max_snapshot_age``), ``VacuumRemoveDeletionQueueRecords`` (:891,
physically delete queued files after the retention window; default
10-day retention per docs). Defaults below mirror the reference GUCs.
"""

from __future__ import annotations

import os
import threading
import time

from pg_lake_spark.lakehouse import catalog as cat
from pg_lake_spark.lakehouse.catalog import DataFile
from pg_lake_spark.lakehouse.table import LakeTable

DEFAULT_TARGET_FILE_SIZE_MB = 128
DEFAULT_MAX_SNAPSHOT_AGE_S = 1800  # pg_lake_iceberg.max_snapshot_age default
DEFAULT_DELETION_RETENTION_S = 10 * 24 * 3600  # 10-day deletion queue
DEFAULT_COMPACT_MIN_INPUT_FILES = 4  # vacuum_compact_min_input_files


def _rewrite_commit(
    table: LakeTable,
    *,
    operation: str,
    added: list[DataFile],
    input_files: list[DataFile],
    summary: dict,
    properties_update: dict | None = None,
) -> bool:
    """Commit a rewrite that replaces ``input_files`` with ``added``,
    with the two rails that make rewrites safe against concurrent user
    DML (the Autovacuum contract — vacuum.c's rewrites run under the
    table lock for their whole span; ours stage outside it):

    - every output inherits its inputs' OLDEST ``added_snapshot_id``
      (the materialize_deletes pattern, table.py), so a MoR delete
      predicate committed DURING the rewrite window — whose sequence is
      above every input's — still applies to the rewritten rows instead
      of resurrecting them;
    - a precondition re-checks, inside the commit lock against the
      freshest metadata, that every input is still live: a CoW
      update/delete that replaced an input mid-window aborts the commit
      (staged outputs unlinked) rather than re-adding the input's stale
      contents next to the newer file. The next vacuum cadence retries
      on fresh state.

    Returns True if committed, False if aborted.
    """
    removed = {f.path for f in input_files}
    oldest = min((f.added_snapshot_id or 0) for f in input_files)
    for nf in added:
        if nf.added_snapshot_id is None:
            nf.added_snapshot_id = oldest

    schema_log_before = len(table.metadata.schema_log)

    def _inputs_still_live(md) -> bool:
        # Schema-log stability too: a concurrent RENAME/era event during
        # the rewrite window would leave outputs written under the OLD
        # physical layout but stamped with a post-event
        # schema_snapshot_id — era resolution then reads the renamed
        # column as NULL in every rewritten row (r15 review).
        if len(md.schema_log) != schema_log_before:
            return False
        cur = md.current_snapshot()
        if cur is None:
            return False
        live = {f.path for f in cat.read_snapshot_files(table.location, md, cur)}
        return removed <= live

    try:
        snap = table._commit(
            operation=operation,
            added=added,
            removed_paths=removed,
            summary=summary,
            precondition=_inputs_still_live,
            properties_update=properties_update,
        )
    except BaseException:
        # an exception between staging and commit (e.g. lock timeout)
        # otherwise leaks the staged outputs forever: the next
        # successful commit's _clear_in_progress drops their entries
        # without removing the data (r15 review)
        table._discard_staging()
        raise
    if snap is None:
        # aborted commit: LakeTable owns the staged-prefix cleanup
        # (whole prefixes incl. _SUCCESS markers, then the in-progress
        # entries) — one implementation, not an inline copy that drifts
        table._discard_staging()
        return False
    return True


def compact_data_files(
    table: LakeTable,
    target_file_size_mb: int = DEFAULT_TARGET_FILE_SIZE_MB,
    min_input_files: int = DEFAULT_COMPACT_MIN_INPUT_FILES,
    *,
    materialize: bool = True,
) -> dict:
    """Merge small files (per partition tuple) into ~target-size files.

    Only groups with ≥ ``min_input_files`` small files are rewritten;
    large files are left alone (rewrite_data_files semantics).
    ``materialize=False`` skips the MoR materialization step when the
    caller (``vacuum``) has just performed it itself.
    """
    table.refresh()
    # Compaction re-stamps rows with a new file sequence; pending MoR
    # delete predicates scoped to older sequences would stop applying to
    # them (resurrecting deleted rows) — make deletes physical first.
    # (Outputs ALSO pin their inputs' oldest sequence via
    # _rewrite_commit, covering predicates that land mid-compaction.)
    if materialize:
        table.materialize_deletes()
    snap = table.metadata.current_snapshot()
    if snap is None:
        return {"compacted_groups": 0, "removed_files": 0, "added_files": 0}
    files = cat.read_snapshot_files(table.location, table.metadata, snap)
    threshold = target_file_size_mb * 1024 * 1024

    groups: dict[tuple, list[DataFile]] = {}
    for f in files:
        if f.size_bytes < threshold:
            groups.setdefault(tuple(sorted(f.partition.items())), []).append(f)

    to_rewrite = [g for g in groups.values() if len(g) >= min_input_files]
    if not to_rewrite:
        return {"compacted_groups": 0, "removed_files": 0, "added_files": 0}

    inputs: list[DataFile] = []
    added: list[DataFile] = []
    for group in to_rewrite:
        total = sum(f.size_bytes for f in group)
        n_out = max(1, total // threshold)
        df = table._read_files(group)  # era-aware: renames/backfills resolve
        oldest = min((f.added_snapshot_id or 0) for f in group)
        for nf in table._write_data_files(df.coalesce(int(n_out)), cluster=False):
            nf.added_snapshot_id = oldest  # per-group sequence pinning
            added.append(nf)
        inputs.extend(group)

    ok = _rewrite_commit(
        table,
        operation="compact",
        added=added,
        input_files=inputs,
        summary={"compacted_groups": len(to_rewrite), "removed_files": len(inputs)},
    )
    if not ok:
        return {
            "compacted_groups": 0,
            "removed_files": 0,
            "added_files": 0,
            "aborted": True,
        }
    return {
        "compacted_groups": len(to_rewrite),
        "removed_files": len(inputs),
        "added_files": len(added),
    }


def expire_in_metadata(location: str, md, max_age_s: int) -> dict:
    """Lock-free expiry core: mutate ``md`` in place, dropping snapshots
    older than the retention window (always keeping the current one);
    files referenced ONLY by expired snapshots go to the deletion queue.
    The caller holds the commit lock and commits ``md``. Shared by
    VACUUM-time expiry and the ``max_snapshot_age = 0`` expire-on-write
    path (iceberg-tables.md:749 — rides the write's own commit)."""
    now_ms = int(time.time() * 1000)
    cutoff = now_ms - max_age_s * 1000
    keep, expire = [], []
    for s in md.snapshots:
        if s.snapshot_id == md.current_snapshot_id or s.timestamp_ms >= cutoff:
            keep.append(s)
        else:
            expire.append(s)
    if not expire:
        return {"expired": 0, "queued_files": 0}
    live_paths: set[str] = {e["path"] for e in md.deletion_queue}  # no dup queue entries
    for s in keep:
        for f in cat.read_snapshot_files(location, md, s):
            live_paths.add(f.path)
    queued = 0
    for s in expire:
        for f in cat.read_snapshot_files(location, md, s):
            if f.path not in live_paths:
                md.deletion_queue.append({"path": f.path, "enqueued_ms": now_ms})
                live_paths.add(f.path)  # avoid duplicate queue entries
                queued += 1
    # Each commit writes a COMPLETE snap-*.json manifest (O(#files)); an
    # expired snapshot's manifest is unreferenced and must follow its
    # data files through the retention-governed queue, or the metadata
    # dir grows one full file list per commit forever.
    keep_manifests = {m for s in keep for m in s.manifests}
    mdir = cat._meta_dir(location)
    for s in expire:
        for m in s.manifests:
            mpath = os.path.join(mdir, m)
            if m not in keep_manifests and mpath not in live_paths:
                md.deletion_queue.append({"path": mpath, "enqueued_ms": now_ms})
                live_paths.add(mpath)
                queued += 1
    md.snapshots = keep
    return {"expired": len(expire), "queued_files": queued}


def expire_snapshots(table: LakeTable, max_age_s: int = DEFAULT_MAX_SNAPSHOT_AGE_S) -> dict:
    """Drop snapshots older than the retention window (always keeping
    the current one); files referenced ONLY by expired snapshots go to
    the deletion queue."""
    with cat.CommitLock(table.location):
        md = cat.read_current_metadata(table.location)
        res = expire_in_metadata(table.location, md, max_age_s)
        if not res["expired"]:
            return res
        cat.commit_metadata(table.location, md)
        table.metadata = md
        return res


def purge_deletion_queue(
    table: LakeTable, retention_s: int = DEFAULT_DELETION_RETENTION_S
) -> dict:
    """Physically delete queued files older than the retention window.

    Files are enqueued at the commit that removed them, while older
    retained snapshots may still reference them — unlinking on age alone
    would break time travel. A file is purged only when no retained
    snapshot's manifests reference it; still-referenced entries stay
    queued (expire_snapshots eventually releases them).
    """
    with cat.CommitLock(table.location):
        md = cat.read_current_metadata(table.location)
        cutoff_ms = int(time.time() * 1000) - retention_s * 1000
        # the common cadence case is an empty/all-young queue — skip the
        # O(snapshots × files) reachability walk (and release the lock)
        # when no entry has even passed the age cutoff (r15 review;
        # expire_in_metadata early-returns the same way)
        if not any(e["enqueued_ms"] <= cutoff_ms for e in md.deletion_queue):
            return {"purged": 0, "still_queued": len(md.deletion_queue)}
        referenced: set[str] = set()
        mdir = cat._meta_dir(table.location)
        for s in md.snapshots:
            for f in cat.read_snapshot_files(table.location, md, s):
                referenced.add(f.path)
            # a retained snapshot's manifests are live too (restore can
            # re-queue manifest entries whose snapshots came back)
            referenced.update(os.path.join(mdir, m) for m in s.manifests)
        keep, purge = [], []
        for entry in md.deletion_queue:
            if entry["enqueued_ms"] <= cutoff_ms and entry["path"] not in referenced:
                purge.append(entry)
            else:
                keep.append(entry)
        deleted = 0
        for entry in purge:
            try:
                os.unlink(entry["path"])
                deleted += 1
            except FileNotFoundError:
                pass
        md.deletion_queue = keep
        cat.commit_metadata(table.location, md)
        table.metadata = md
        return {"purged": deleted, "still_queued": len(keep)}


def vacuum(
    table: LakeTable,
    target_file_size_mb: int = DEFAULT_TARGET_FILE_SIZE_MB,
    max_snapshot_age_s: int = DEFAULT_MAX_SNAPSHOT_AGE_S,
    deletion_retention_s: int = DEFAULT_DELETION_RETENTION_S,
) -> dict:
    """Full VACUUM: materialize MoR deletes → compact → expire
    snapshots → purge deletion queue (the reference's vacuum phases,
    vacuum.c:670-891, plus the position-delete merge step)."""
    out = {}
    table.refresh()
    out["materialize_deletes"] = table.materialize_deletes()
    # compaction skips its own materialization pass — this function just
    # ran it (keeping one call site authoritative instead of two)
    out["compact"] = compact_data_files(table, target_file_size_mb, materialize=False)
    out["expire"] = expire_snapshots(table, max_snapshot_age_s)
    out["purge"] = purge_deletion_queue(table, deletion_retention_s)
    # crashed-write reclamation rides the vacuum cadence, like the
    # reference (VACUUM removes uncommitted in-progress files)
    out["in_progress"] = flush_in_progress_queue(table)
    return out


DEFAULT_AUTOVACUUM_INTERVAL_S = 600  # reference: vacuum every 10 min per table


class Autovacuum:
    """Cadenced VACUUM over a set of tables.

    The reference runs vacuum on a ~10-minute cadence per table via a
    background worker (pg_lake_table/tests/pytests/test_autovacuum.py);
    this is the driver-side equivalent: each registered table is
    vacuumed when at least ``interval_s`` has elapsed since its last
    run. Use :meth:`run_pending` from your own scheduler loop, or
    :meth:`start` for a daemon thread that polls. The clock is
    injectable so cadence logic is testable without sleeping.

    Vacuum already takes the table's commit lock internally, so a
    cadence firing concurrently with user DML is safe — same contract
    as the reference's background worker.
    """

    def __init__(
        self,
        tables: list[LakeTable],
        interval_s: float = DEFAULT_AUTOVACUUM_INTERVAL_S,
        *,
        clock=time.monotonic,
        **vacuum_kwargs,
    ) -> None:
        self._tables = list(tables)
        self.interval_s = interval_s
        self._clock = clock
        self._kw = vacuum_kwargs
        self._last_run: dict[str, float] = {}
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self.last_error: Exception | None = None

    def register(self, table: LakeTable) -> None:
        self._tables.append(table)

    def due(self) -> list[LakeTable]:
        now = self._clock()
        return [
            t
            for t in self._tables
            if t.location not in self._last_run
            or now - self._last_run[t.location] >= self.interval_s
        ]

    def run_pending(self) -> dict[str, dict]:
        """Vacuum every due table (a just-registered table is due
        immediately); returns per-location vacuum stats.

        Failures are isolated PER TABLE: one table whose vacuum raises
        (dropped location, corrupt metadata, lock timeout) must not
        starve the tables after it in the list — its error is recorded
        and its cadence slot still advances, so it retries next
        interval instead of failing first on every poll forever."""
        out: dict[str, dict] = {}
        for t in self.due():
            try:
                t.refresh()
                out[t.location] = vacuum(t, **self._kw)
            except Exception as exc:  # noqa: BLE001 — isolate per table
                self.last_error = exc
                out[t.location] = {"error": f"{type(exc).__name__}: {exc}"}
            self._last_run[t.location] = self._clock()
        return out

    def start(self, poll_s: float = 1.0) -> None:
        """Run the cadence on a daemon thread until :meth:`stop`."""
        if self._thread is not None:
            raise RuntimeError("autovacuum already started")
        self._stop.clear()

        def loop() -> None:
            # One failing vacuum (transient commit-lock/IO error) must not
            # kill the cadence: record it and keep polling.
            while not self._stop.wait(poll_s):
                try:
                    self.run_pending()
                except Exception as exc:  # noqa: BLE001
                    self.last_error = exc

        self._thread = threading.Thread(target=loop, daemon=True, name="autovacuum")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None


# ---------------------------------------------------------------------------
# DROP TABLE → deletion queue, restore, purge
# ---------------------------------------------------------------------------

DROPPED_HINT = "dropped-hint.text"


def read_dropped_metadata(location: str) -> tuple[int, cat.TableMetadata] | None:
    """(dropped_version, metadata-at-drop) for a soft-dropped table, or
    None when no dropped hint exists.

    The hint-read + versioned-metadata-load protocol lives ONLY here —
    deletion_queue / list_dropped_tables / restore_table /
    purge_dropped_table all consume this helper, so a hint-format
    change has a single home (r15 review: four hand-rolled copies)."""
    import json as _json

    mdir = cat._meta_dir(location)
    dh = os.path.join(mdir, DROPPED_HINT)
    if not os.path.exists(dh):
        return None
    with open(dh) as f:
        version = int(f.read().strip())
    with open(os.path.join(mdir, f"v{version}.metadata.json")) as f:
        md = cat.TableMetadata.from_json(_json.load(f))
    return version, md


def drop_table(location: str) -> dict:
    """DROP TABLE with the reference's soft-delete lifecycle
    (pg_lake_table/src/ddl/drop_table.c; docs/iceberg-tables.md:845):
    every data file referenced by any retained snapshot is enqueued on
    the deletion queue (retention-governed, default 10 days), the final
    metadata version records the drop, and the version hint is retired
    so the table no longer "exists" — but all metadata.json versions
    remain on disk for point-in-time restore until purge."""
    with cat.CommitLock(location):
        md = cat.read_current_metadata(location)
        now_ms = int(time.time() * 1000)
        queued = {e["path"] for e in md.deletion_queue}
        n = 0
        for s in md.snapshots:
            for f in cat.read_snapshot_files(location, md, s):
                if f.path not in queued:
                    md.deletion_queue.append({"path": f.path, "enqueued_ms": now_ms})
                    queued.add(f.path)
                    n += 1
        md.properties["dropped_ms"] = now_ms
        cat.commit_metadata(location, md)
        mdir = cat._meta_dir(location)
        # Retire the hint atomically: table_exists() → False, while the
        # dropped-hint remembers the final version for restore/purge.
        os.rename(
            os.path.join(mdir, cat.VERSION_HINT), os.path.join(mdir, DROPPED_HINT)
        )
    return {"queued_files": n, "dropped_version": md.version}


def restore_table(spark, location: str, metadata_version: int | None = None) -> LakeTable:
    """Restore a dropped table from a retained metadata.json — the
    docs' "create an external Iceberg table from an old (dereferenced)
    metadata.json" recovery (iceberg-tables.md:850), made first-class.

    ``metadata_version`` defaults to the version just before the drop
    (full un-drop); any older retained version gives point-in-time
    recovery. The chosen content is re-committed as a NEW version so
    the metadata version line stays monotonic."""
    import json as _json

    mdir = cat._meta_dir(location)
    if cat.table_exists(location):
        raise FileExistsError(f"table at {location} is not dropped")
    dropped = read_dropped_metadata(location)
    if dropped is None:
        raise FileNotFoundError(f"no dropped table at {location}")
    dropped_version, dropped_md = dropped
    dh = os.path.join(mdir, DROPPED_HINT)
    target = metadata_version if metadata_version is not None else dropped_version - 1
    if target >= dropped_version or target < 1:
        raise ValueError(
            f"restore target v{target} must be an existing pre-drop version "
            f"(1..{dropped_version - 1})"
        )
    with open(os.path.join(mdir, f"v{target}.metadata.json")) as f:
        md = cat.TableMetadata.from_json(_json.load(f))
    md.properties.pop("dropped_ms", None)
    # Reconcile the deletion queue against the restored state: files the
    # restored snapshots reference are live again (drop their queue
    # entries so purge can never take them); files only newer versions
    # referenced stay queued from the drop, or a PIT restore would leak
    # them forever.
    restored_refs: set[str] = set()
    for s in md.snapshots:
        for f in cat.read_snapshot_files(location, md, s):
            restored_refs.add(f.path)
        # the restored snapshots' manifests are live again too: expiry
        # after the restore target may have queued them in dropped_md
        restored_refs.update(os.path.join(mdir, m) for m in s.manifests)
    queued = {e["path"] for e in md.deletion_queue}
    md.deletion_queue = [e for e in md.deletion_queue if e["path"] not in restored_refs]
    for e in dropped_md.deletion_queue:
        if e["path"] not in queued and e["path"] not in restored_refs:
            md.deletion_queue.append(e)
    md.version = dropped_version  # next commit becomes dropped_version + 1
    with cat.CommitLock(location):
        md = cat.commit_metadata(location, md)
        os.unlink(dh)
    return LakeTable(spark, location, md)


def purge_dropped_table(
    location: str, retention_s: int = DEFAULT_DELETION_RETENTION_S
) -> dict:
    """Physically remove a dropped table once its deletion-queue entries
    pass the retention window (VacuumRemoveDeletionQueueRecords applied
    to a dropped table): delete the queued data files, then the whole
    table directory including all metadata versions. Before retention
    expires this is a no-op — restore_table still works."""
    import shutil

    mdir = cat._meta_dir(location)
    dh = os.path.join(mdir, DROPPED_HINT)
    if not os.path.exists(dh):
        raise FileNotFoundError(f"no dropped table at {location}")
    # The rmtree races restore_table without the lock: restore commits
    # and unlinks the hint, then a mid-flight purge deletes the live
    # table. Re-check the hint INSIDE the lock (restore/drop both hold
    # it); a restore that won means this purge is a no-op.
    with cat.CommitLock(location):
        dropped = read_dropped_metadata(location)
        if dropped is None:
            return {"purged": 0, "still_retained": 0, "restored": True}
        _, md = dropped
        cutoff_ms = int(time.time() * 1000) - retention_s * 1000
        # Retention gates on the DROP time as well as queue-entry ages:
        # a table dropped with an empty (or all-old) queue must still
        # honor the documented restore window, not rmtree instantly.
        dropped_ms = int(md.properties.get("dropped_ms", 0) or 0)
        if dropped_ms > cutoff_ms or any(
            e["enqueued_ms"] > cutoff_ms for e in md.deletion_queue
        ):
            return {"purged": 0, "still_retained": len(md.deletion_queue)}
        deleted = 0
        for e in md.deletion_queue:
            try:
                os.unlink(e["path"])
                deleted += 1
            except FileNotFoundError:
                pass
        shutil.rmtree(location, ignore_errors=True)
    return {"purged": deleted, "still_retained": 0}


def rewrite_sorted(
    table: LakeTable,
    columns: list[str],
    *,
    target_file_size_mb: int = DEFAULT_TARGET_FILE_SIZE_MB,
    n_files: int | None = None,
) -> dict:
    """Cluster the table's data by ``columns`` (Iceberg sort-order /
    rewrite_data_files(sort) analogue): range-repartition so each output
    file owns a disjoint key range, then sort within files. Afterward
    the per-file min/max stats on those columns are TIGHT, so predicate
    pruning skips most files — the clustering step that makes stats
    pruning effective at 100 TB (without it, every file's min/max spans
    the whole domain and nothing prunes). The rewrite is one range
    shuffle; the sort key is recorded in table properties.
    """
    from pyspark.sql import functions as F

    table.refresh()
    table.materialize_deletes()
    snap = table.metadata.current_snapshot()
    if snap is None:
        return {"rewritten_files": 0, "added_files": 0}
    files = cat.read_snapshot_files(table.location, table.metadata, snap)
    if not files:
        return {"rewritten_files": 0, "added_files": 0}
    total = sum(f.size_bytes for f in files)
    n_out = n_files if n_files else max(
        1, int(total // max(1, target_file_size_mb * 1024 * 1024))
    )
    df = table._read_files(files)
    clustered = df.repartitionByRange(n_out, *[F.col(c) for c in columns]).sortWithinPartitions(
        *columns
    )
    added = table._write_data_files(clustered, cluster=False)
    # the property rides the SAME commit — a separate lock round-trip
    # could crash between the two, leaving rewritten data with the
    # sort-order property unset (r15 review)
    if not _rewrite_commit(
        table,
        operation="replace",
        added=added,
        input_files=files,
        summary={"rewrite_sorted": ",".join(columns)},
        properties_update={"sort-order": ",".join(columns)},
    ):
        return {"rewritten_files": 0, "added_files": 0, "aborted": True}
    return {"rewritten_files": len(files), "added_files": len(added)}


def zorder_value(df, columns: list[str], bits: int = 8):
    """Morton (Z-order) key as a Column: each column is quantile-
    bucketized to ``2^bits`` codes (boundaries from a driver-side
    approxQuantile — tiny, distributed computation), then the code bits
    interleave. Rows close in EVERY dimension get close keys, so a
    range-partition on the key gives files that are simultaneously
    narrow in all clustered columns."""
    from pyspark.sql import functions as F

    k = len(columns)
    if k < 1:
        raise ValueError("zorder needs at least one column")
    if k > 63:
        raise ValueError("zorder supports at most 63 columns")
    # Spark's shiftleft masks the count mod 64 (Java << semantics): with
    # bits*k > 63 high interleave bits silently wrap onto low positions
    # (colliding keys), and bit 63 flips the long's sign (reversing the
    # top bucket's sort). Cap per-column bits so every position fits in
    # the non-negative range — fewer bits is coarser clustering, never
    # wrong.
    # absolute ceiling 12 on top of the shift cap: the quantile prob
    # list is 2^bits entries on the DRIVER — bits=40 with k=1 passed the
    # shift cap and tried to build a trillion-element list (r15 review);
    # 4096 buckets per dimension is already far past useful clustering
    bits = max(1, min(bits, 63 // k, 12))
    n_codes = 1 << bits
    probs = [i / n_codes for i in range(1, n_codes)]
    # Column → orderable double. A blind cast('double') turned string/
    # date columns into all-NULLs, giving an EMPTY quantile list and
    # code 0 for every row — z-ordering silently provided no clustering
    # on those columns (r15 review). Dates/timestamps map to their
    # epoch; strings/binary refuse loudly (hash codes would scatter the
    # value ranges min/max pruning needs).
    dtypes = dict(df.dtypes)

    def _orderable(c: str):
        dt = dtypes.get(c, "")
        base = dt.split("(")[0]
        if base in ("string", "binary", "varchar", "char"):
            raise ValueError(
                f"zorder column {c!r} has type {dt}: only numeric/"
                "date/timestamp/boolean columns give the value-range "
                "locality z-ordering exists for"
            )
        if base in ("date", "timestamp", "timestamp_ntz"):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    # one multi-column approxQuantile pass: the list form computes every
    # column's boundaries in a single scan of the table instead of k
    # sequential full re-reads
    casts = df.select(
        *[_orderable(c).alias(f"__v{i}") for i, c in enumerate(columns)]
    )
    all_cuts = casts.approxQuantile([f"__v{i}" for i in range(k)], probs, 0.001)
    codes = []
    for c, cuts in zip(columns, all_cuts):
        # strictly increasing boundary list (duplicated quantiles on
        # skewed data collapse into fewer, still-correct buckets)
        uniq = sorted(set(cuts))
        arr = F.array(*[F.lit(float(b)) for b in uniq])
        val = _orderable(c)  # same mapping as the quantile pass
        codes.append(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc + F.when(val >= b, 1).otherwise(0),
            )
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, code in enumerate(codes):
            bit = F.shiftright(code, i).bitwiseAND(F.lit(1)).cast("long")
            z = z + F.shiftleft(bit, i * k + j)
    return z


def rewrite_zorder(
    table: LakeTable,
    columns: list[str],
    *,
    n_files: int | None = None,
    target_file_size_mb: int = DEFAULT_TARGET_FILE_SIZE_MB,
    bits: int = 8,
) -> dict:
    """Z-order clustering rewrite (Delta OPTIMIZE ZORDER analogue,
    additive over the reference): range-partition + sort on the Morton
    key so per-file min/max stats are tight in EVERY clustered column —
    single-column sort clustering only prunes its leading column; at
    100 TB the multi-dimensional version is what keeps both
    ``WHERE user_id = ?`` and ``WHERE ts > ?`` scans cheap."""
    from pyspark.sql import functions as F

    table.refresh()
    table.materialize_deletes()
    snap = table.metadata.current_snapshot()
    if snap is None:
        return {"rewritten_files": 0, "added_files": 0}
    files = cat.read_snapshot_files(table.location, table.metadata, snap)
    if not files:
        return {"rewritten_files": 0, "added_files": 0}
    total = sum(f.size_bytes for f in files)
    n_out = n_files if n_files else max(
        1, int(total // max(1, target_file_size_mb * 1024 * 1024))
    )
    df = table._read_files(files)
    z = zorder_value(df, columns, bits=bits)
    clustered = (
        df.withColumn("__z", z)
        .repartitionByRange(n_out, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    added = table._write_data_files(clustered, cluster=False)
    if not _rewrite_commit(
        table,
        operation="replace",
        added=added,
        input_files=files,
        summary={"rewrite_zorder": ",".join(columns)},
        properties_update={"zorder-by": ",".join(columns)},
    ):
        return {"rewritten_files": 0, "added_files": 0, "aborted": True}
    return {"rewritten_files": len(files), "added_files": len(added)}


def find_all_referenced_files(table: LakeTable) -> set[str]:
    """Every data file referenced by any retained snapshot — parity
    with the reference's ``lake.find_all_referenced_files`` (vacuum.c's
    reachability walk). Driver-side metadata scan."""
    from pg_lake_spark.lakehouse import catalog as cat

    referenced: set[str] = set()
    for snap in table.metadata.snapshots:
        for f in cat.read_snapshot_files(table.location, table.metadata, snap):
            referenced.add(f.path)
    return referenced


def find_unreferenced_files(table: LakeTable) -> list[str]:
    """Files physically under the table's data directory that no
    retained snapshot references (candidates for deletion-queue
    enqueue) — ``lake.find_unreferenced_files`` parity."""
    import glob as _glob

    import json as _json

    referenced = {os.path.abspath(p) for p in find_all_referenced_files(table)}
    # a LIVE in-flight write's staging prefix is not unreferenced — it
    # is registered in the in_progress queue and simply not committed
    # yet; reporting it as a deletion candidate invites an operator to
    # delete a write in progress (r15 review)
    in_progress: list[str] = []
    d = os.path.join(table.location, "_lake_metadata", "in_progress")
    if os.path.isdir(d):
        for entry in _glob.glob(os.path.join(d, "*.json")):
            try:
                with open(entry) as fh:
                    pfx = _json.load(fh).get("prefix")
                if pfx:
                    in_progress.append(os.path.abspath(pfx))
            except (OSError, ValueError):
                continue
    on_disk = [
        os.path.abspath(p)
        for p in _glob.glob(
            os.path.join(table.location, "data", "**", "*.parquet"), recursive=True
        )
    ]
    return sorted(
        p
        for p in on_disk
        if p not in referenced and not any(p.startswith(pf) for pf in in_progress)
    )


def table_size(table: LakeTable) -> dict:
    """Current-snapshot logical size — ``pg_lake_table_size`` parity:
    total bytes / file count / row count from file metadata (no scan)."""
    from pg_lake_spark.lakehouse import catalog as cat

    snap = table.metadata.current_snapshot()
    files = (
        cat.read_snapshot_files(table.location, table.metadata, snap) if snap else []
    )
    return {
        "bytes": sum(f.size_bytes for f in files),
        "files": len(files),
        "rows": sum(f.row_count for f in files),
    }


def _writer_alive(rec: dict) -> bool:
    """True iff the registering writer can be PROVEN still alive: entry
    carries a pid on THIS host and that process exists. Entries from
    other hosts (or legacy entries without pid) fall back to the age
    heuristic — callers should size ``older_than_s`` above the longest
    plausible write in multi-host deployments."""
    import socket

    pid = rec.get("pid")
    if not pid or rec.get("host") != socket.gethostname():
        return False
    try:
        os.kill(int(pid), 0)
        return True
    except PermissionError:
        # EPERM: the process EXISTS but runs as another uid — that is a
        # LIVE writer; treating it as dead would reclaim an in-flight
        # staging dir and the eventual commit would reference deleted
        # files. Only ESRCH (ProcessLookupError) proves death.
        return True
    except (OSError, ValueError):
        return False


def flush_in_progress_queue(table: LakeTable, older_than_s: float = 3600.0) -> dict:
    """Reclaim staging files from crashed (uncommitted) writes —
    ``pg_lake_flush_in_progress_queue`` parity (in_progress_files.c:
    writers register a prefix before writing and remove the entry on
    commit, so a surviving entry older than the grace window whose
    files no snapshot references is a dead write). Returns counts."""
    import glob as _glob
    import json as _json
    import shutil as _shutil

    d = os.path.join(table.location, "_lake_metadata", "in_progress")
    if not os.path.isdir(d):
        return {"flushed": 0, "kept": 0, "bytes": 0}
    referenced = {os.path.abspath(p) for p in find_all_referenced_files(table)}
    cutoff_ms = (time.time() - older_than_s) * 1000
    flushed = kept = freed = 0
    for entry in sorted(_glob.glob(os.path.join(d, "*.json"))):
        try:
            with open(entry) as fh:
                rec = _json.load(fh)
        except (OSError, ValueError):
            continue
        if rec.get("ts_ms", 0) > cutoff_ms:
            kept += 1
            continue
        if _writer_alive(rec):
            # Entry is old but its writer process still runs (a long
            # write, not a crash) — liveness beats wall-clock age.
            kept += 1
            continue
        prefix = rec.get("prefix")
        if not prefix:
            # malformed entry: skip it, never abort the whole flush —
            # one bad record previously KeyError'd and blocked
            # reclamation of every entry after it (r15 review)
            continue
        try:
            live = any(f.startswith(os.path.abspath(prefix)) for f in referenced)
            if live:
                # committed by a writer that died before clearing its entry
                os.remove(entry)
                continue
            if os.path.isdir(prefix):
                freed += sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _dirs, files in os.walk(prefix)
                    for f in files
                )
                _shutil.rmtree(prefix, ignore_errors=True)
            os.remove(entry)
            flushed += 1
        except FileNotFoundError:
            # a second concurrent vacuum (multi-host deployment) won the
            # race on this entry — its work is done either way
            continue
    return {"flushed": flushed, "kept": kept, "bytes": freed}
