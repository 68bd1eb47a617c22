"""Delta Lake read support: pure-metadata ``_delta_log`` scan.

The reference reads Delta tables behind a compile flag
(docs/file-formats-reference.md:34-37, PG_LAKE_DELTA_SUPPORT) by
resolving the transaction log to a file list and scanning the parquet
directly — no Delta runtime. This module is the same idea Spark-first,
mirroring ``iceberg_meta.scan_iceberg``:

- :func:`scan_delta`: replay the JSON commits (optionally seeded from a
  ``.checkpoint.parquet``) of the public Delta protocol
  (https://github.com/delta-io/delta/blob/master/PROTOCOL.md) into the
  active add-file set, then run ONE Spark parquet scan over those files.
  Partition columns — Delta stores them in the log, not the data files —
  come back via a broadcast join of the (file → partition values) map
  against ``_metadata.file_path``, so the scan stays a single
  distributed read at any file count. Time travel via ``version=``.
- :func:`write_delta_table` / :func:`append_delta` /
  :func:`remove_delta_files` / :func:`write_delta_checkpoint`: a
  minimal log writer (create / append / delete / checkpoint) used by
  tests and queries to produce genuine protocol-shaped logs; the engine
  feature is the reader.

Classic and multi-part checkpoints both replay; unsupported protocol
features fail loudly: deletion vectors, column mapping, reader
versions above what plain parquet-by-name resolution can honor.

Scale: log replay is a driver-side O(log) planning step — exactly the
reference's model and the same altitude as Iceberg manifest planning.
The data path is one ``spark.read.parquet`` over N files plus one
broadcast of the (path, partition-values) map: pushdown, pruning and
whole-stage codegen all apply. ``partition_filter`` prunes the file
list itself before the scan (the Delta equivalent of partition
pruning, applied where Delta keeps partition values: in the log).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from typing import Callable
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

#: Diagnostics for the most recent scan_delta call in this process:
#: {"files_total", "files_scanned", "files_skipped"} — the same
#: observability LakeTable.last_scan_report gives its own scans.
last_scan_report: dict | None = None

_COMMIT_RE = re.compile(r"(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"(\d{20})\.checkpoint\.parquet$")
_CHECKPOINT_PART_RE = re.compile(r"(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$")

#: Reader features we can honor with plain parquet-by-name resolution
#: (columnMapping via physical-name resolution, see _physical_names).
_SUPPORTED_READER_FEATURES = {"timestampNtz", "columnMapping"}


def _log_dir(location: str) -> str:
    return os.path.join(location, "_delta_log")


class ConcurrentDeltaCommitError(RuntimeError):
    """Another writer committed this version first (put-if-absent lost)."""


class _DeltaState:
    """Replayed log state: active adds plus the governing metadata."""

    def __init__(self) -> None:
        self.version: int = -1
        self.metadata: dict | None = None
        self.protocol: dict | None = None
        self.adds: dict[str, dict] = {}  # decoded path -> add action
        self.txns: dict[str, int] = {}  # appId -> high-water version

    def apply(self, action: dict) -> None:
        if "metaData" in action:
            self.metadata = action["metaData"]
        elif "protocol" in action:
            self.protocol = action["protocol"]
        elif "add" in action:
            ad = action["add"]
            if ad.get("deletionVector"):
                raise NotImplementedError(
                    "Delta deletion vectors are not supported"
                )
            self.adds[unquote(ad["path"])] = ad
        elif "remove" in action:
            self.adds.pop(unquote(action["remove"]["path"]), None)
        elif "txn" in action:
            t = action["txn"]
            self.txns[t["appId"]] = max(
                self.txns.get(t["appId"], -1), int(t["version"])
            )
        # commitInfo / cdc / domainMetadata are no-ops for a scan


def _read_checkpoint_actions(path: str) -> list[dict]:
    """Checkpoint parquet rows → action dicts (one non-null per row)."""
    import pyarrow.parquet as pq

    out: list[dict] = []
    for row in pq.read_table(path).to_pylist():
        for key in ("protocol", "metaData", "add", "remove", "txn"):
            v = row.get(key)
            if v is None:
                continue
            # pyarrow returns map<string,string> as (k, v) pairs
            if key in ("add", "remove") and isinstance(
                v.get("partitionValues"), list
            ):
                v = {**v, "partitionValues": dict(v["partitionValues"])}
            if key == "metaData" and isinstance(v.get("configuration"), list):
                v = {**v, "configuration": dict(v["configuration"])}
            out.append({key: v})
    return out


def _replay(location: str, version: int | None = None) -> _DeltaState:
    log_dir = _log_dir(location)
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"no _delta_log under {location}")
    names = os.listdir(log_dir)
    commits = {
        int(m.group(1)): os.path.join(log_dir, n)
        for n in names
        if (m := _COMMIT_RE.fullmatch(n))
    }
    # classic single-file checkpoints, plus multi-part ones (the parts
    # of version V are V.checkpoint.<i>.<n>.parquet; a version is usable
    # only when all n parts are present)
    checkpoints: dict[int, list[str]] = {
        int(m.group(1)): [os.path.join(log_dir, n)]
        for n in names
        if (m := _CHECKPOINT_RE.fullmatch(n))
    }
    multiparts: dict[int, dict[int, str]] = {}
    declared_parts: dict[int, int] = {}
    for n in names:
        m = _CHECKPOINT_PART_RE.fullmatch(n)
        if m:
            v, i, total = int(m.group(1)), int(m.group(2)), int(m.group(3))
            multiparts.setdefault(v, {})[i] = os.path.join(log_dir, n)
            declared_parts[v] = total
    for v, parts in multiparts.items():
        if len(parts) == declared_parts[v] and v not in checkpoints:
            checkpoints[v] = [p for _i, p in sorted(parts.items())]
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log under {location}")

    latest = max([*commits, *checkpoints])
    target = latest if version is None else version
    if target > latest:
        raise ValueError(f"requested version {target}, log ends at {latest}")

    state = _DeltaState()
    start = 0
    usable_cp = [v for v in checkpoints if v <= target]
    if usable_cp:
        cpv = max(usable_cp)
        # Only seed from the checkpoint if the JSON tail from it is
        # complete; otherwise fall back to full JSON replay (time travel
        # to a version older than the earliest retained checkpoint needs
        # the early commits anyway).
        if all(v in commits for v in range(cpv + 1, target + 1)):
            for part in checkpoints[cpv]:
                for a in _read_checkpoint_actions(part):
                    state.apply(a)
            state.version = cpv
            start = cpv + 1
    missing = [v for v in range(start, target + 1) if v not in commits]
    if missing:
        raise FileNotFoundError(
            f"missing Delta commits {missing} under {log_dir} "
            "(vacuumed log without a usable checkpoint?)"
        )
    for v in range(start, target + 1):
        with open(commits[v]) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    state.apply(json.loads(line))
        state.version = v
    return state


def _check_protocol(state: _DeltaState) -> None:
    proto = state.protocol or {"minReaderVersion": 1}
    mrv = proto.get("minReaderVersion", 1)
    conf = (state.metadata or {}).get("configuration") or {}
    cmap = conf.get("delta.columnMapping.mode", "none")
    if cmap not in (None, "", "none", "name", "id"):
        raise NotImplementedError(
            f"Delta column mapping mode {cmap!r} is not supported"
        )
    if mrv >= 3:
        feats = set(proto.get("readerFeatures") or [])
        unsupported = feats - _SUPPORTED_READER_FEATURES
        if unsupported:
            raise NotImplementedError(
                f"Delta reader features not supported: {sorted(unsupported)}"
            )
    elif mrv > 2:
        raise NotImplementedError(f"Delta minReaderVersion {mrv} not supported")


def _abs_path(location: str, decoded_rel: str) -> str:
    if decoded_rel.startswith("/") or "://" in decoded_rel:
        return re.sub(r"^file:(//)?", "", decoded_rel)
    return os.path.join(location, decoded_rel)


def _prune_adds_by_predicate(
    spark: SparkSession,
    adds: dict[str, dict],
    pcols: list[str],
    schema: StructType,
    where: str,
) -> dict[str, dict]:
    """Partition pruning from the scan predicate — applied where Delta
    keeps partition values: in the log, driver-side, before any data is
    touched (at scale this shrinks the scan's file list the way hive
    partition pruning would).

    ``where`` is split into top-level AND conjuncts with Spark's own
    SQL parser; each conjunct that analyzes against the partition
    columns alone filters the (file → typed partition values) frame.
    Conjuncts referencing data columns are skipped — sound, because
    every kept conjunct is a necessary condition constant across a
    file, and the full ``where`` still applies row-wise afterwards.
    Any parse/analysis surprise degrades to no pruning, never to a
    wrong answer.
    """
    from pg_lake_spark.lakehouse.pruning import conjunct_filter_paths

    rows = [
        (p, *[(a.get("partitionValues") or {}).get(c) for c in pcols])
        for p, a in adds.items()
    ]
    pdf = spark.createDataFrame(
        rows, "__path string, " + ", ".join(f"`{c}` string" for c in pcols)
    )
    frame = pdf.select(
        "__path", *[F.col(c).cast(schema[c].dataType).alias(c) for c in pcols]
    )
    surviving = conjunct_filter_paths(spark, frame, where)
    if surviving is None:
        return adds
    return {p: a for p, a in adds.items() if p in surviving}


def _uri_key(spark: SparkSession, path: str) -> str:
    """The exact string ``_metadata.file_path`` yields for ``path``:
    Hadoop's own Path→URI encoding (spaces → %20 etc.), so the
    partition-map join key can never drift from Spark's encoder."""
    if "://" not in path:
        path = "file:" + os.path.abspath(path)
    return spark._jvm.org.apache.hadoop.fs.Path(path).toUri().toString()


def version_at_timestamp(location: str, timestamp_ms: int) -> int:
    """Latest commit version at or before ``timestamp_ms`` — Delta's
    timestamp time travel. Each commit's time comes from its
    commitInfo.timestamp action when present, else the log file's
    modification time (the same fallback Delta readers use)."""
    log_dir = _log_dir(location)
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"no _delta_log under {location}")
    best = None
    for n in os.listdir(log_dir):
        m = _COMMIT_RE.fullmatch(n)
        if not m:
            continue
        v = int(m.group(1))
        path = os.path.join(log_dir, n)
        ts = None
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "commitInfo" in a and a["commitInfo"].get("timestamp"):
                    ts = int(a["commitInfo"]["timestamp"])
                    break
        if ts is None:
            ts = int(os.path.getmtime(path) * 1000)
        if ts <= timestamp_ms and (best is None or v > best):
            best = v
    if best is None:
        raise ValueError(
            f"no Delta commit at or before timestamp {timestamp_ms} under {location}"
        )
    return best


def _physical_names(metadata: dict, schema: StructType) -> dict[str, str]:
    """logical → physical column names under delta.columnMapping.

    Modes ``name`` and ``id`` both store data under each field's
    ``delta.columnMapping.physicalName`` (``col-<uuid>``) — Delta
    writers emit those physical names into the parquet files in either
    mode (``id`` additionally tags parquet field ids for converted
    tables); physical-name resolution therefore covers Delta-written
    tables in both modes, the same widening the Iceberg reader got from
    name mapping (iceberg_meta._read_with_name_mapping)."""
    conf = metadata.get("configuration") or {}
    mode = conf.get("delta.columnMapping.mode", "none")
    if mode in (None, "", "none"):
        return {f.name: f.name for f in schema.fields}
    return {
        f.name: (f.metadata or {}).get("delta.columnMapping.physicalName", f.name)
        for f in schema.fields
    }


def scan_delta(
    spark: SparkSession,
    location: str,
    version: int | None = None,
    where: str | None = None,
    partition_filter: Callable[[dict[str, str | None]], bool] | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Scan a Delta table root into a DataFrame.

    ``version`` pins a historical snapshot (time travel);
    ``timestamp_ms`` resolves the version current at that epoch-millis
    time instead (mutually exclusive). ``where`` is a post-scan SQL
    predicate (Catalyst pushes it into the parquet scan, and its
    partition-column conjuncts prune the file list driver-side);
    ``partition_filter`` receives each file's partitionValues dict and
    prunes the FILE LIST driver-side before any data is read.

    Reference: docs/file-formats-reference.md:34-37 (Delta read support).
    """
    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version or timestamp_ms, not both")
        version = version_at_timestamp(location, timestamp_ms)
    state = _replay(location, version)
    if state.metadata is None:
        raise ValueError(f"Delta log under {location} has no metaData action")
    _check_protocol(state)

    schema = StructType.fromJson(json.loads(state.metadata["schemaString"]))
    pcols: list[str] = state.metadata.get("partitionColumns") or []
    phys = _physical_names(state.metadata, schema)

    adds = state.adds
    if any(phys[n] != n for n in phys) and pcols:
        # Column mapping: add.partitionValues keys are PHYSICAL names
        # (Delta protocol §column-mapping); normalize to logical so the
        # pruning + partition-map code below stays name-agnostic.
        adds = {
            p: {
                **a,
                "partitionValues": {
                    c: (a.get("partitionValues") or {}).get(
                        phys[c], (a.get("partitionValues") or {}).get(c)
                    )
                    for c in pcols
                },
            }
            for p, a in adds.items()
        }
    if partition_filter is not None:
        adds = {
            p: a
            for p, a in adds.items()
            if partition_filter(a.get("partitionValues") or {})
        }
    if where and pcols and adds:
        adds = _prune_adds_by_predicate(spark, adds, pcols, schema, where)

    global last_scan_report
    last_scan_report = {
        "files_total": len(state.adds),
        "files_scanned": len(adds),
        "files_skipped": len(state.adds) - len(adds),
    }

    data_fields = [f for f in schema.fields if f.name not in pcols]
    if not adds:
        return spark.createDataFrame([], schema)

    paths = [_abs_path(location, p) for p in adds]
    read_schema = StructType(
        [StructField(phys[f.name], f.dataType, True) for f in data_fields]
    )
    df = spark.read.schema(read_schema).parquet(*paths)
    if any(phys[f.name] != f.name for f in data_fields):
        df = df.select(
            *[F.col(phys[f.name]).alias(f.name) for f in data_fields],
            "_metadata",
        )

    if pcols:
        # Partition values live in the log, not the files: broadcast the
        # (file → values) map and join on the scan's _metadata.file_path.
        rows = [
            (
                _uri_key(spark, _abs_path(location, p)),
                *[(a.get("partitionValues") or {}).get(c) for c in pcols],
            )
            for p, a in adds.items()
        ]
        pmap = spark.createDataFrame(
            rows, "__fp string, " + ", ".join(f"`{c}` string" for c in pcols)
        )
        df = df.withColumn("__fp", F.col("_metadata.file_path")).join(
            F.broadcast(pmap), "__fp"
        )

    out = df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in pcols
            else F.col(f.name)
            for f in schema.fields
        ]
    )
    if where:
        out = out.filter(where)
    return out


# ---------------------------------------------------------------------------
# Minimal log writer (create / append / remove / checkpoint)
# ---------------------------------------------------------------------------


def _next_version(location: str) -> int:
    log_dir = _log_dir(location)
    if not os.path.isdir(log_dir):
        return 0
    vs = [
        int(m.group(1))
        for n in os.listdir(log_dir)
        if (
            m := (
                _COMMIT_RE.fullmatch(n)
                or _CHECKPOINT_RE.fullmatch(n)
                or _CHECKPOINT_PART_RE.fullmatch(n)
            )
        )
    ]
    return max(vs) + 1 if vs else 0


def _write_commit(location: str, version: int, actions: list[dict]) -> str:
    if not any("commitInfo" in a for a in actions):
        actions = [
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "WRITE",
                    "engineInfo": "pg_lake_spark",
                }
            }
        ] + actions
    log_dir = _log_dir(location)
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    # Delta's protocol requires put-if-absent on the commit file: two
    # writers racing to the same version must see exactly one win.
    # os.link fails with EEXIST on POSIX where os.rename would silently
    # overwrite the loser over the winner.
    try:
        os.link(tmp, path)
    except FileExistsError:
        os.unlink(tmp)
        raise ConcurrentDeltaCommitError(
            f"commit version {version} already exists at {path}; "
            "reload the log and retry at the next version"
        ) from None
    os.unlink(tmp)
    return path


def _write_data_files(
    spark: SparkSession, location: str, df: DataFrame, partition_by: list[str]
) -> list[dict]:
    """Write df's data under the table root, hive-layout for partitions;
    return the corresponding ``add`` actions (paths URL-encoded per the
    protocol, partition values decoded from the hive dirs)."""
    staging = os.path.join(location, f"_staging-{uuid.uuid4().hex}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    adds: list[dict] = []
    try:
        for root, _dirs, files in os.walk(staging):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(root, fn)
                rel = os.path.relpath(src, staging)
                dst = os.path.join(location, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(src, dst)
                pvals: dict[str, str | None] = {}
                head = os.path.dirname(rel)
                for comp in head.split(os.sep) if head else []:
                    if "=" in comp:
                        k, v = comp.split("=", 1)
                        pvals[k] = (
                            None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
                        )
                adds.append(
                    {
                        "add": {
                            "path": quote(rel.replace(os.sep, "/")),
                            "partitionValues": pvals,
                            "size": os.path.getsize(dst),
                            "modificationTime": int(os.path.getmtime(dst) * 1000),
                            "dataChange": True,
                        }
                    }
                )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return adds


def write_delta_table(
    spark: SparkSession,
    location: str,
    df: DataFrame,
    partition_by: list[str] | None = None,
) -> None:
    """Create a Delta table at ``location`` (commit 0: protocol +
    metaData + adds)."""
    partition_by = partition_by or []
    os.makedirs(location, exist_ok=True)
    actions: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": partition_by,
                "configuration": {},
                "createdTime": int(time.time() * 1000),
            }
        },
    ]
    actions += _write_data_files(spark, location, df, partition_by)
    _write_commit(location, 0, actions)


def append_delta(spark: SparkSession, location: str, df: DataFrame) -> None:
    """Append ``df`` as the next commit, under the table's partitioning."""
    state = _replay(location)
    assert state.metadata is not None
    pcols = state.metadata.get("partitionColumns") or []
    actions = _write_data_files(spark, location, df, pcols)
    _write_commit(location, state.version + 1, actions)


def append_delta_txn(
    spark: SparkSession, location: str, df: DataFrame, app_id: str, version: int
) -> bool:
    """Idempotent append via the Delta protocol's ``txn`` action: the
    commit carries {appId, version}, and a replay whose version is at or
    below the app's recorded high-water is SKIPPED (returns False) —
    exactly the dedup contract delta-spark's streaming sink relies on,
    so foreign Delta readers see exactly-once ingest. A losing
    put-if-absent race raises ConcurrentDeltaCommitError; the caller
    re-invokes (the replayed state then reflects the winner)."""
    state = _replay(location)
    assert state.metadata is not None
    if version <= state.txns.get(app_id, -1):
        return False
    pcols = state.metadata.get("partitionColumns") or []
    actions = [
        {"txn": {"appId": app_id, "version": int(version),
                 "lastUpdated": int(time.time() * 1000)}}
    ] + _write_data_files(spark, location, df, pcols)
    _write_commit(location, state.version + 1, actions)
    return True


def remove_delta_files(
    location: str, pred: Callable[[dict[str, str | None]], bool]
) -> int:
    """Commit ``remove`` actions for active files whose partitionValues
    satisfy ``pred``; returns the number of files removed."""
    state = _replay(location)
    now = int(time.time() * 1000)
    removes = [
        {
            "remove": {
                "path": a["path"],
                "deletionTimestamp": now,
                "dataChange": True,
                "partitionValues": a.get("partitionValues") or {},
            }
        }
        for a in state.adds.values()
        if pred(a.get("partitionValues") or {})
    ]
    _write_commit(location, state.version + 1, removes)
    return len(removes)


def write_delta_checkpoint(spark: SparkSession, location: str) -> str:
    """Write a classic single-file checkpoint at the latest version and
    point ``_last_checkpoint`` at it."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    state = _replay(location)
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    txn_t = pa.struct([("appId", pa.string()), ("version", pa.int64())])
    md = state.metadata or {}
    rows = [
        {
            "protocol": state.protocol
            or {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": None,
            "add": None,
            "txn": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": md.get("id"),
                "schemaString": md.get("schemaString"),
                "partitionColumns": md.get("partitionColumns") or [],
                "configuration": list((md.get("configuration") or {}).items()),
                "createdTime": md.get("createdTime"),
            },
            "add": None,
            "txn": None,
        },
    ] + [
        {
            "protocol": None,
            "metaData": None,
            "add": None,
            "txn": {"appId": app, "version": v},
        }
        for app, v in sorted(state.txns.items())
    ] + [
        {
            "protocol": None,
            "metaData": None,
            "txn": None,
            "add": {
                "path": a["path"],
                "partitionValues": list((a.get("partitionValues") or {}).items()),
                "size": a.get("size"),
                "modificationTime": a.get("modificationTime"),
                "dataChange": False,
            },
        }
        for a in state.adds.values()
    ]
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("protocol", proto_t), ("metaData", meta_t), ("add", add_t), ("txn", txn_t)]
        ),
    )
    path = os.path.join(_log_dir(location), f"{state.version:020d}.checkpoint.parquet")
    papq.write_table(table, path)
    with open(os.path.join(_log_dir(location), "_last_checkpoint"), "w") as fh:
        json.dump({"version": state.version, "size": len(rows)}, fh)
    return path
