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

Classic and multi-part checkpoints both replay. Column mapping (name
and id modes) and deletion vectors (z85 + RoaringBitmapArray decode,
applied as a distributed (file, row_index) anti-join) are supported;
reader versions/features beyond that fail loudly.

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
_SUPPORTED_READER_FEATURES = {"timestampNtz", "columnMapping", "deletionVectors"}


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
            if key == "add" and isinstance(v.get("tags"), list):
                v = {**v, "tags": dict(v["tags"])}
            if key == "metaData" and isinstance(v.get("configuration"), list):
                v = {**v, "configuration": dict(v["configuration"])}
            # a checkpoint declares every optional field (writer would
            # silently drop undeclared keys); strip the None fillers so
            # replayed actions look like their JSON-commit form
            v = {k2: v2 for k2, v2 in v.items() if v2 is not None}
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


# ---------------------------------------------------------------------------
# Deletion vectors (Delta protocol "Deletion Vectors" + RoaringFormatSpec)
#
# A file's deletionVector descriptor points at (or inlines) a serialized
# 64-bit RoaringBitmapArray of deleted row indexes. Storage types:
# "u" = UUID-named .bin under the table root (pathOrInlineDv =
# <random-prefix><z85(uuid)>), "p" = absolute path, "i" = inline
# (pathOrInlineDv = z85(data)). On-disk blob layout at ``offset``:
# [dataSize: 4B big-endian][data][crc32: 4B]; the data itself is
# [magic 1681511377: 4B little-endian][nBitmaps: 8B LE][each 32-bit
# roaring bitmap in the standard portable format].
# ---------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}
_DV_MAGIC = 1681511377


def _z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85 length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def _z85_encode(b: bytes) -> str:
    if len(b) % 4:
        # Delta's Base85Codec zero-pads to a 4-byte boundary (inline-DV
        # payloads are odd-length whenever container cardinality is
        # odd); the DV decoder reads lengths from the roaring structure
        # itself, so trailing pad bytes are inert.
        b = b + b"\x00" * (4 - len(b) % 4)
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.append("".join(reversed(chunk)))
    return "".join(out)


def _roaring32_positions(data: bytes, off: int) -> tuple[list[int], int]:
    """Deserialize one standard 32-bit roaring bitmap (portable format);
    returns (values, next_offset)."""
    import struct as _struct

    (cookie,) = _struct.unpack_from("<I", data, off)
    off += 4
    run_flags = b""
    if cookie & 0xFFFF == 12347:  # SERIAL_COOKIE (has run containers)
        n = (cookie >> 16) + 1
        nrun_bytes = (n + 7) // 8
        run_flags = data[off : off + nrun_bytes]
        off += nrun_bytes
    elif cookie == 12346:  # SERIAL_COOKIE_NO_RUNCONTAINER
        (n,) = _struct.unpack_from("<I", data, off)
        off += 4
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = [
        _struct.unpack_from("<HH", data, off + 4 * i) for i in range(n)
    ]
    off += 4 * n
    if cookie == 12346 or n >= 4:  # offset header present (unused: we
        off += 4 * n  # read containers sequentially)
    vals: list[int] = []
    for i, (key, card_m1) in enumerate(keys_cards):
        card = card_m1 + 1
        base = key << 16
        is_run = bool(run_flags) and bool(run_flags[i // 8] >> (i % 8) & 1)
        if is_run:
            (nruns,) = _struct.unpack_from("<H", data, off)
            off += 2
            for _ in range(nruns):
                start, length = _struct.unpack_from("<HH", data, off)
                off += 4
                vals.extend(base + v for v in range(start, start + length + 1))
        elif card <= 4096:  # array container
            arr = _struct.unpack_from(f"<{card}H", data, off)
            off += 2 * card
            vals.extend(base + v for v in arr)
        else:  # bitmap container: 1024 uint64 words
            words = _struct.unpack_from("<1024Q", data, off)
            off += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    vals.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return vals, off


def _decode_dv_data(data: bytes) -> list[int]:
    """[magic][nBitmaps: 8B LE][bitmaps...] → sorted 64-bit row indexes
    (bitmap i covers [i*2^32, (i+1)*2^32))."""
    import struct as _struct

    (magic,) = _struct.unpack_from("<I", data, 0)
    if magic != _DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    (nbm,) = _struct.unpack_from("<q", data, 4)
    off = 12
    out: list[int] = []
    for i in range(nbm):
        vals, off = _roaring32_positions(data, off)
        out.extend((i << 32) | v for v in vals)
    return out


def _encode_dv_data(positions: list[int]) -> bytes:
    """Inverse of _decode_dv_data (array containers only) — used by
    tests to hand-craft DV-bearing Delta logs."""
    import struct as _struct
    from collections import defaultdict

    by_bitmap: dict[int, dict[int, list[int]]] = defaultdict(lambda: defaultdict(list))
    for p in sorted(set(positions)):
        by_bitmap[p >> 32][(p & 0xFFFFFFFF) >> 16].append(p & 0xFFFF)
    nbm = (max(by_bitmap) + 1) if by_bitmap else 0
    out = _struct.pack("<I", _DV_MAGIC) + _struct.pack("<q", nbm)
    for i in range(nbm):
        containers = by_bitmap.get(i, {})
        n = len(containers)
        out += _struct.pack("<II", 12346, n)
        for key in sorted(containers):
            out += _struct.pack("<HH", key, len(containers[key]) - 1)
        # offset header (required when cookie == 12346)
        pos = 0
        offs = []
        header = 4 + 4 + 4 * n + 4 * n
        for key in sorted(containers):
            offs.append(header + pos)
            pos += 2 * len(containers[key])
        out += b"".join(_struct.pack("<I", o) for o in offs)
        for key in sorted(containers):
            vals = containers[key]
            out += _struct.pack(f"<{len(vals)}H", *vals)
    return out


def _dv_file_path(location: str, path_or_inline: str) -> str:
    """storageType "u": <random prefix><z85(16-byte uuid)> →
    <location>/[prefix/]deletion_vector_<uuid>.bin"""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = uuid.UUID(bytes=_z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(location, prefix, name) if prefix else os.path.join(location, name)


def _load_dv_positions(location: str, dv: dict) -> list[int]:
    st = dv.get("storageType", "u")
    if st == "i":
        return _decode_dv_data(_z85_decode(dv["pathOrInlineDv"]))
    if st == "u":
        fpath = _dv_file_path(location, dv["pathOrInlineDv"])
    elif st == "p":
        fpath = dv["pathOrInlineDv"]
    else:
        raise NotImplementedError(f"deletion vector storageType {st!r}")
    with open(fpath, "rb") as f:
        raw = f.read()
    # The descriptor's offset is OPTIONAL; an on-disk DV file always
    # starts with a 1-byte format version, so data can never begin at
    # 0 — defaulting there would read the version byte as the high
    # byte of the big-endian size and reject a valid DV.
    off = dv.get("offset")
    off = int(off) if off is not None else 1
    import struct as _struct

    (size,) = _struct.unpack_from(">I", raw, off)
    data = raw[off + 4 : off + 4 + size]
    declared = dv.get("sizeInBytes")
    if declared is not None and int(declared) != size:
        raise ValueError(
            f"deletion vector size mismatch: header {size} != descriptor {declared}"
        )
    return _decode_dv_data(data)


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


# characters java.net.URI leaves unescaped in a path component
# (unreserved + path punctuation) — parity pinned by
# test_uri_key_matches_hadoop_encoding against the JVM encoder
_URI_PATH_SAFE = "/_-!.~'()*,;:$&+=@"


def _uri_key(spark: SparkSession, path: str) -> str:
    """The exact string ``_metadata.file_path`` yields for ``path``:
    Hadoop's Path→URI encoding (spaces → %20 etc.), so the
    partition-map join key can never drift from Spark's encoder.

    Local paths take a pure-Python quoter that replicates
    java.net.URI's path encoder — the previous per-file py4j round
    trip made scan PLANNING O(N) blocking driver RPCs (minutes at
    100k files). Scheme'd paths (one Path object semantics per
    filesystem) keep the JVM call."""
    if "://" not in path:
        # java.net.URI.toString() leaves non-ASCII characters RAW (only
        # toASCIIString percent-encodes them) — so encode only the
        # unsafe ASCII characters, byte-wise
        out = []
        for ch in os.path.abspath(path):
            if ord(ch) >= 0x80 or ch.isalnum() or ch in _URI_PATH_SAFE:
                out.append(ch)
            else:
                out.append(f"%{ord(ch):02X}")
        return "file:" + "".join(out)
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

    dv_adds = {p: a for p, a in adds.items() if a.get("deletionVector")}
    if dv_adds or pcols:
        # materialize the hidden metadata BEFORE any join (joins drop it)
        df = df.withColumn("__fp", F.col("_metadata.file_path"))
    if dv_adds:
        df = df.withColumn("__pos", F.col("_metadata.row_index"))

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
        df = df.join(F.broadcast(pmap), "__fp")

    if dv_adds:
        # Deletion vectors: decode each file's roaring bitmap
        # EXECUTOR-side (mapInPandas over the tiny descriptor set, one
        # row per DV-bearing file) and anti-join deleted (file, pos)
        # pairs against the scan — the same distributed shape as the
        # Iceberg position-delete path (iceberg_meta.py) so no bitmap
        # ever sits on the driver.
        desc = [
            (
                _uri_key(spark, _abs_path(location, p)),
                json.dumps(a["deletionVector"]),
            )
            for p, a in dv_adds.items()
        ]
        desc_df = spark.createDataFrame(desc, "__fp string, __dv string")
        loc = location

        def _expand_dvs(batches):
            import pandas as pd

            for pdf in batches:
                for fp, dvj in zip(pdf["__fp"], pdf["__dv"]):
                    pos = _load_dv_positions(loc, json.loads(dvj))
                    yield pd.DataFrame({"__fp": fp, "__pos": pos})

        dels = desc_df.mapInPandas(_expand_dvs, "__fp string, __pos long")
        df = df.join(dels, ["__fp", "__pos"], "left_anti")

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


def _check_writable(state: _DeltaState) -> None:
    """The write paths emit LOGICAL column names in data files and
    partitionValues keys; a column-mapping table declares PHYSICAL
    (col-<uuid>) names, so an append would scan back all-NULL and
    mis-key partition recovery. Refuse loudly rather than corrupt."""
    conf = (state.metadata or {}).get("configuration") or {}
    cmap = conf.get("delta.columnMapping.mode", "none")
    if cmap not in (None, "", "none"):
        raise NotImplementedError(
            f"writing to a Delta table with columnMapping.mode={cmap!r} "
            "is not supported (files would carry logical names a "
            "physical-name reader cannot resolve)"
        )


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
        raise ConcurrentDeltaCommitError(
            f"commit version {version} already exists at {path}; "
            "reload the log and retry at the next version"
        ) from None
    except OSError as exc:
        raise NotImplementedError(
            f"filesystem at {log_dir} does not support hard links "
            "(os.link), which the put-if-absent Delta commit requires"
        ) from exc
    finally:
        # the tmp must not leak on ANY exit — loser of the race, or a
        # link-unsupported filesystem
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass
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


def _unlink_adds(location: str, actions: list[dict]) -> None:
    """Remove the data files of losing ``add`` actions: a commit that
    loses the put-if-absent race has already moved its parquet into the
    table root, and a retry rewrites the batch — without cleanup every
    conflict leaves an orphaned unreferenced copy on disk."""
    for a in actions:
        add = a.get("add")
        if add:
            try:
                os.unlink(_abs_path(location, unquote(add["path"])))
            except FileNotFoundError:
                pass


def append_delta(spark: SparkSession, location: str, df: DataFrame) -> None:
    """Append ``df`` as the next commit, under the table's partitioning."""
    state = _replay(location)
    assert state.metadata is not None
    _check_writable(state)
    pcols = state.metadata.get("partitionColumns") or []
    actions = _write_data_files(spark, location, df, pcols)
    try:
        _write_commit(location, state.version + 1, actions)
    except ConcurrentDeltaCommitError:
        _unlink_adds(location, actions)
        raise


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
    _check_writable(state)
    if version <= state.txns.get(app_id, -1):
        return False
    pcols = state.metadata.get("partitionColumns") or []
    actions = [
        {"txn": {"appId": app_id, "version": int(version),
                 "lastUpdated": int(time.time() * 1000)}}
    ] + _write_data_files(spark, location, df, pcols)
    try:
        _write_commit(location, state.version + 1, actions)
    except ConcurrentDeltaCommitError:
        _unlink_adds(location, actions)
        raise
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
    if not removes:
        # a no-op remove must not burn a version (and steal a racing
        # real writer's put-if-absent) for a commitInfo-only commit
        return 0
    _write_commit(location, state.version + 1, removes)
    return len(removes)


def write_delta_checkpoint(spark: SparkSession, location: str) -> str:
    """Write a classic single-file checkpoint at the latest version and
    point ``_last_checkpoint`` at it."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    state = _replay(location)
    # pa.Table.from_pylist SILENTLY DROPS dict keys absent from the
    # declared schema — every field an add/protocol can carry must be
    # declared here, or a checkpoint-seeded replay loses it: a dropped
    # readerFeatures defeats the fail-loud protocol guard, a dropped
    # deletionVector resurrects deleted rows. (Remove tombstones are
    # not retained by _DeltaState and so not emitted; our own replay
    # never needs them — documented deviation for foreign VACUUM.)
    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
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
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("tags", pa.map_(pa.string(), pa.string())),
            ("deletionVector", dv_t),
        ]
    )
    txn_t = pa.struct([("appId", pa.string()), ("version", pa.int64())])
    md = state.metadata or {}
    proto = dict(state.protocol or {"minReaderVersion": 1, "minWriterVersion": 2})

    def _dv(a: dict):
        dv = a.get("deletionVector")
        if not dv:
            return None
        return {
            "storageType": dv.get("storageType"),
            "pathOrInlineDv": dv.get("pathOrInlineDv"),
            "offset": dv.get("offset"),
            "sizeInBytes": dv.get("sizeInBytes"),
            "cardinality": dv.get("cardinality"),
        }

    rows = [
        {
            "protocol": {
                "minReaderVersion": proto.get("minReaderVersion", 1),
                "minWriterVersion": proto.get("minWriterVersion", 2),
                "readerFeatures": proto.get("readerFeatures"),
                "writerFeatures": proto.get("writerFeatures"),
            },
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
                "stats": a.get("stats")
                if isinstance(a.get("stats"), str)
                else (json.dumps(a["stats"]) if a.get("stats") else None),
                "tags": list((a.get("tags") or {}).items()) or None,
                "deletionVector": _dv(a),
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
