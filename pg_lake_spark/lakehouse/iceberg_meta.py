"""Real Apache Iceberg metadata interop: export + foreign-snapshot scan.

The reference's defining feature is that its tables ARE Iceberg —
external engines read its ``metadata.json``/Avro manifests, and it can
scan foreign Iceberg snapshots (pg_lake_iceberg/src/iceberg/
metadata_operations.c:159 WriteMetadataFile; pg_lake_table/src/describe/
describe.c:167 DescribeColumnsFromIcebergMetadataURI). This module gives
LakeTable the same two directions, format-faithful to the public Iceberg
spec (https://iceberg.apache.org/spec/):

- :func:`export_iceberg`: write genuine Iceberg **format-version 2**
  metadata for a LakeTable — ``metadata/vN.metadata.json`` +
  ``version-hint.text`` (HadoopCatalog layout), one Avro manifest list
  per snapshot, and Avro manifests with spec field-ids — over the
  table's existing Parquet data files (no data rewrite; O(metadata)).
- :func:`scan_iceberg`: read an external Iceberg table (v1 or v2) from
  its ``metadata.json`` into a DataFrame, with snapshot time travel.

Avro files are produced/consumed with the Apache Avro **Java** library
bundled in Spark's JVM (no Python avro package in this environment),
driven through py4j. Records cross the bridge as Avro-JSON so numeric
types land as proper Avro longs (py4j would otherwise box small Python
ints as Integer and break GenericDatumWriter's Long casts).

Manifest OCF headers carry the key/value metadata pyiceberg expects
("schema", "partition-spec", "partition-spec-id", "format-version",
"content"); the manifest-list carries "format-version".
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.lakehouse import catalog as cat
from pg_lake_spark.lakehouse.catalog import DataFile
from pg_lake_spark.lakehouse.pruning import _pfield_name


# ---------------------------------------------------------------------------
# Spark DDL schema → Iceberg schema JSON (field-ids assigned depth-first)
# ---------------------------------------------------------------------------

_PRIMITIVES = {
    "boolean": "boolean",
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
}

_ICEBERG_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
    "uuid": "string",
    "time": "bigint",
}


class _IdAllocator:
    def __init__(self):
        self.last = 0

    def next(self) -> int:
        self.last += 1
        return self.last


def _spark_type_to_iceberg(dt, ids: _IdAllocator):
    """Convert a pyspark DataType to an Iceberg type (JSON value)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        eid = ids.next()
        return {
            "type": "list",
            "element-id": eid,
            "element": _spark_type_to_iceberg(dt.elementType, ids),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = ids.next(), ids.next()
        return {
            "type": "map",
            "key-id": kid,
            "key": _spark_type_to_iceberg(dt.keyType, ids),
            "value-id": vid,
            "value": _spark_type_to_iceberg(dt.valueType, ids),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = ids.next()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _spark_type_to_iceberg(f.dataType, ids),
                }
            )
        return {"type": "struct", "fields": fields}
    simple = dt.simpleString()
    if simple in _PRIMITIVES:
        return _PRIMITIVES[simple]
    raise ValueError(f"no Iceberg mapping for Spark type {simple}")


def iceberg_schema_from_ddl(schema_ddl: str) -> tuple[dict, int]:
    """Iceberg schema JSON (+ last-column-id) for a comma-joined DDL.

    Top-level columns get ids 1..N first (matching how Iceberg assigns
    on table creation), then nested ids follow.
    """
    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema_ddl)
    ids = _IdAllocator()
    top_ids = [ids.next() for _ in st.fields]
    fields = []
    for fid, f in zip(top_ids, st.fields):
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": _spark_type_to_iceberg(f.dataType, ids),
            }
        )
    return (
        {"type": "struct", "schema-id": 0, "fields": fields},
        ids.last,
    )


def _iceberg_type_to_spark_ddl(t) -> str:
    if isinstance(t, str):
        if t.startswith("decimal"):
            return t.replace(" ", "")
        if t.startswith("fixed"):
            return "binary"
        if t in _ICEBERG_TO_SPARK:
            return _ICEBERG_TO_SPARK[t]
        raise ValueError(f"unsupported Iceberg type {t!r}")
    kind = t["type"]
    if kind == "struct":
        # backtick-quote: Iceberg allows names with spaces/commas/colons
        # that would mis-split or fail the DDL parse unquoted
        inner = ",".join(
            f"`{f['name']}`:{_iceberg_type_to_spark_ddl(f['type'])}"
            for f in t["fields"]
        )
        return f"struct<{inner}>"
    if kind == "list":
        return f"array<{_iceberg_type_to_spark_ddl(t['element'])}>"
    if kind == "map":
        return (
            f"map<{_iceberg_type_to_spark_ddl(t['key'])},"
            f"{_iceberg_type_to_spark_ddl(t['value'])}>"
        )
    raise ValueError(f"unsupported Iceberg type {t!r}")


def spark_schema_from_iceberg(schema: dict) -> str:
    """Spark DDL string for an Iceberg schema JSON object. Names are
    backtick-quoted: Iceberg permits identifiers (spaces, commas) that
    break unquoted DDL parsing."""
    return ", ".join(
        f"`{f['name']}` {_iceberg_type_to_spark_ddl(f['type'])}"
        for f in schema["fields"]
    )


def _nested_mapping(t) -> list[dict] | None:
    """name-mapping entries for one field's NESTED content (spec:
    'Name Mapping Serialization' — lists map 'element', maps map
    'key'/'value'). Top-level renames never touch nested names, so
    each nested entry carries exactly its current name."""
    if not isinstance(t, dict):
        return None
    kind = t.get("type")
    if kind == "struct":
        out = []
        for f in t["fields"]:
            m = {"field-id": f["id"], "names": [f["name"]]}
            nf = _nested_mapping(f["type"])
            if nf:
                m["fields"] = nf
            out.append(m)
        return out
    if kind == "list":
        m = {"field-id": t["element-id"], "names": ["element"]}
        nf = _nested_mapping(t["element"])
        if nf:
            m["fields"] = nf
        return [m]
    if kind == "map":
        km = {"field-id": t["key-id"], "names": ["key"]}
        vm = {"field-id": t["value-id"], "names": ["value"]}
        nv = _nested_mapping(t["value"])
        if nv:
            vm["fields"] = nv
        return [km, vm]
    return None


def build_name_mapping(schema_log: list[dict], schema: dict) -> list[dict]:
    """Iceberg ``schema.name-mapping.default`` for this table's files.

    Our parquet files carry no Iceberg field ids (they are written by a
    plain Spark writer), so the spec's name-mapping is how external
    readers resolve columns — and it is also what makes RENAME eras
    exportable: each field id lists its current name first, then every
    historical physical name from the schema log, newest first
    (spec: 'Column mapping' — one field-id, many names).
    """
    renames = [e for e in schema_log if e.get("op") == "rename"]
    mapping = []
    for f in schema["fields"]:
        names = [f["name"]]
        cur = f["name"]
        for e in reversed(renames):
            if e["to"] == cur:
                cur = e["from"]
                names.append(cur)
        entry = {"field-id": f["id"], "names": names}
        # nested content needs its own mapping entries (struct members,
        # list 'element', map 'key'/'value') — without them external
        # readers can assign no ids below the top level of id-less
        # files and project nested values as NULL
        nested = _nested_mapping(f["type"])
        if nested:
            entry["fields"] = nested
        mapping.append(entry)
    # Safety (spec: a mapped name resolves to exactly ONE field id): a
    # physical name reused across eras — a rename freeing a name later
    # taken by a new column, or drop-then-re-add under the same name —
    # would make external readers resolve the OLD physical column in
    # pre-reuse files and silently resurrect dropped/renamed data. Such
    # tables cannot be exported faithfully without a rewrite; refuse.
    owner: dict[str, int] = {}
    for m in mapping:
        for n in m["names"]:
            if n in owner and owner[n] != m["field-id"]:
                raise ValueError(
                    f"name-mapping conflict: physical column {n!r} maps to "
                    f"field ids {owner[n]} and {m['field-id']} (a rename era "
                    "reused the name) — compact/rewrite the table before "
                    "export, or external readers would resolve stale data"
                )
            owner[n] = m["field-id"]
    dropped = {e["column"] for e in schema_log if e.get("op") == "drop"}
    reused = dropped & set(owner)
    if reused:
        raise ValueError(
            f"name-mapping conflict: column name(s) {sorted(reused)} were "
            "dropped and later reused — pre-drop files still carry the old "
            "physical column, and a name-mapping would resurrect its data "
            "into the new field; compact/rewrite the table before export"
        )
    return mapping


# ---------------------------------------------------------------------------
# Avro plumbing (Java Avro via py4j; records cross as Avro-JSON)
# ---------------------------------------------------------------------------

def _jvm(spark: SparkSession):
    return spark._jvm


def write_avro_file(
    spark: SparkSession,
    path: str,
    schema_json: str,
    records_json: list[str],
    meta: dict[str, str],
) -> None:
    jvm = _jvm(spark)
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    for k, v in meta.items():
        writer.setMeta(k, v)
    writer.create(sch, jvm.java.io.File(path))
    datum_reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    factory = jvm.org.apache.avro.io.DecoderFactory.get()
    try:
        for rj in records_json:
            rec = datum_reader.read(None, factory.jsonDecoder(sch, rj))
            writer.append(rec)
    finally:
        writer.close()


def read_avro_records(spark: SparkSession, path: str) -> tuple[list[dict], dict[str, str]]:
    """Read an Avro OCF into (records-as-dicts, header-metadata).

    GenericRecord.toString() is JSON; good enough for metadata records
    (paths, ints, strings — no NaN/binary in the fields we consume).
    """
    jvm = _jvm(spark)
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    records, meta = [], {}
    try:
        for key in reader.getMetaKeys():
            if not key.startswith("avro."):
                try:
                    meta[key] = reader.getMetaString(key)
                except Exception:
                    pass
        while reader.hasNext():
            records.append(json.loads(reader.next().toString()))
    finally:
        reader.close()
    return records, meta


# ---------------------------------------------------------------------------
# Iceberg spec Avro schemas (field-ids per spec Appendix)
# ---------------------------------------------------------------------------

def _manifest_list_schema() -> dict:
    f = [
        ("manifest_path", "string", 500),
        ("manifest_length", "long", 501),
        ("partition_spec_id", "int", 502),
        ("content", "int", 517),
        ("sequence_number", "long", 515),
        ("min_sequence_number", "long", 516),
        ("added_snapshot_id", "long", 503),
        ("added_files_count", "int", 504),
        ("existing_files_count", "int", 505),
        ("deleted_files_count", "int", 506),
        ("added_rows_count", "long", 512),
        ("existing_rows_count", "long", 513),
        ("deleted_rows_count", "long", 514),
    ]
    return {
        "type": "record",
        "name": "manifest_file",
        "fields": [{"name": n, "type": t, "field-id": i} for n, t, i in f],
    }


def _partition_avro_type(pf: dict, col_types: dict[str, str]):
    """Avro type for one partition field's VALUES. The union branch
    label in the JSON encoding (_partition_branch) MUST pick the same
    type, or Avro's JsonDecoder rejects the record outright — deriving
    the branch from the Python value's type while declaring from the
    column's type crashed every export with an int/boolean/float/date
    identity partition."""
    t = pf["transform"]
    if t in ("identity", "truncate"):
        src = col_types.get(pf["column"], "string").split("(")[0].lower()
        return {
            "bigint": "long", "long": "long",
            "int": "int", "integer": "int", "smallint": "int",
            "tinyint": "int", "double": "double", "float": "float",
            "boolean": "boolean", "string": "string",
            "date": {"type": "int", "logicalType": "date"},
            "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
            "timestamp_ntz": {"type": "long", "logicalType": "timestamp-micros"},
        }.get(src, "string")
    if t == "day":
        return {"type": "int", "logicalType": "date"}
    return "int"  # year / month / hour / bucket ordinals


def _partition_branch(avro_t, v) -> dict:
    """JSON union branch {label: value} matching the DECLARED type."""
    import datetime as _dt

    base = avro_t["type"] if isinstance(avro_t, dict) else avro_t
    logical = avro_t.get("logicalType") if isinstance(avro_t, dict) else None
    if logical == "date":
        if isinstance(v, str):
            v = _dt.date.fromisoformat(v)
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            v = (v - _dt.date(1970, 1, 1)).days
        return {"int": int(v)}
    if logical == "timestamp-micros":
        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        if isinstance(v, _dt.datetime):
            # naive values are UTC by convention (replace); an aware
            # value must CONVERT — replace() would discard its offset
            # and shift the exported micros by that amount
            v = (
                v.astimezone(_dt.timezone.utc)
                if v.tzinfo is not None
                else v.replace(tzinfo=_dt.timezone.utc)
            )
            v = int(v.timestamp() * 1_000_000)
        return {"long": int(v)}
    if base == "boolean":
        return {"boolean": bool(v)}
    if base == "string":
        return {"string": v if isinstance(v, str) else str(v)}
    if base == "double":
        return {"double": float(v)}
    if base == "float":
        return {"float": float(v)}
    if base == "int":
        return {"int": int(v)}
    return {"long": int(v)}


def _spec_col_types(schema_ddl: str) -> dict[str, str]:
    from pyspark.sql.types import StructType

    return {
        f.name: f.dataType.simpleString()
        for f in StructType.fromDDL(schema_ddl).fields
    }


def _partition_avro_fields(spec: list[dict], schema_ddl: str) -> list[dict]:
    """Avro fields for the data_file.partition struct (ids 1000+)."""
    col_types = _spec_col_types(schema_ddl)
    return [
        {
            "name": _pfield_name(pf),
            "type": ["null", _partition_avro_type(pf, col_types)],
            "default": None,
            "field-id": 1000 + i,
        }
        for i, pf in enumerate(spec)
    ]


def _manifest_entry_schema(spec: list[dict], schema_ddl: str) -> dict:
    partition_record = {
        "type": "record",
        "name": "r102",
        "fields": _partition_avro_fields(spec, schema_ddl),
    }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": partition_record, "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            # spec field 135: equality field ids (null for data files)
            {
                "name": "equality_ids",
                "type": ["null", {"type": "array", "items": "int"}],
                "default": None,
                "field-id": 135,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


def _partition_spec_json(spec: list[dict], schema: dict) -> list[dict]:
    """Iceberg partition-spec field list for our transform spec."""
    name_to_id = {f["name"]: f["id"] for f in schema["fields"]}
    out = []
    for i, pf in enumerate(spec):
        t = pf["transform"]
        if t == "bucket":
            transform = f"bucket[{pf['param']}]"
        elif t == "truncate":
            transform = f"truncate[{pf['param']}]"
        else:
            transform = t
        out.append(
            {
                "name": _pfield_name(pf),
                "transform": transform,
                "source-id": name_to_id[pf["column"]],
                "field-id": 1000 + i,
            }
        )
    return out


_OP_MAP = {
    "append": "append",
    "delete": "delete",
    "overwrite": "overwrite",
    "merge": "overwrite",
    "compact": "replace",
    "alter": "append",
}


# ---------------------------------------------------------------------------
# Export: LakeTable → genuine Iceberg v2 metadata
# ---------------------------------------------------------------------------

def export_iceberg(table) -> str:
    """Write Iceberg v2 metadata for ``table`` over its existing data
    files; returns the path of the new ``metadata.json``.

    Every LakeTable snapshot maps to an Iceberg snapshot (full time
    travel). Snapshot ids double as sequence numbers (both are small
    monotonic ints here); each data file's entry carries its true
    ``sequence_number`` (= the snapshot that added it) with status
    ADDED in that snapshot and EXISTING in later ones, mirroring how
    Iceberg tracks file lineage. The current schema applies to all
    snapshots (schema evolution history is not retained in export).

    Pending MoR delete predicates export as genuine **v2 position
    delete files** (spec layout: ``file_path``/``pos`` with the
    reserved field ids, sorted; entries carry ``content``=1 at the
    delete's sequence number in a ``content``="deletes" manifest) — the
    same artifact the reference's position_delete_dest.c writes. No
    data rewrite: the deleted positions are enumerated with one
    distributed job per predicate (``_metadata.row_index`` over the
    files the predicate scopes), so snapshots before the delete time-
    travel to the undeleted rows and later snapshots anti-join exactly
    the right positions.

    Reference: metadata_operations.c:159 (WriteMetadataFile),
    docs/iceberg-tables.md (metadata layout).
    """
    spark = table.spark
    md = table.metadata
    cur = md.current_snapshot()
    cur_files = cat.read_snapshot_files(table.location, md, cur) if cur else []

    def exportable(f: DataFile) -> bool:
        """Can this file be represented faithfully in the v2 export?

        Rename eras ARE exportable: the emitted name-mapping (below)
        resolves old physical column names to field ids. Plain ADD
        COLUMN (null backfill) is exportable: a name absent from the
        file reads NULL through the mapping. NOT exportable: constant
        DEFAULT backfills (v2 has no initial-default), files written
        under an older partition spec, and files whose partition keys
        no longer match the current spec's names (a renamed partition
        column) — entries would carry null partition values and
        external engines could mis-prune.
        """
        if f.spec_id != md.default_spec_id:
            return False
        _, backfills = table._era_info(table._era_key(f))
        if any(d is not None for d in backfills.values()):
            return False
        expected = {_pfield_name(pf) for pf in md.partition_spec}
        if expected and set(f.partition) != expected:
            return False
        return True

    if not all(exportable(f) for f in cur_files):
        raise NotImplementedError(
            "export is not supported while current files carry a constant "
            "ADD COLUMN DEFAULT backfill, an older partition spec, or "
            "pre-rename partition keys — compact/rewrite the table first "
            "(Iceberg v2 cannot represent constant backfills or mixed "
            "partition layouts in this export)"
        )
    # The same guard must cover HISTORY, not just the head (round-2
    # ADVICE): manifests below are written with the current schema and
    # spec for every snapshot, so after a non-representable evolution
    # followed by compaction the head exports fine while pre-evolution
    # snapshots would get wrong columns or null partition values —
    # external engines time-traveling them could mis-prune. When such
    # files exist anywhere in history, export only the current
    # snapshot's lineage.
    snap_files = {
        s.snapshot_id: cat.read_snapshot_files(table.location, md, s)
        for s in md.snapshots
    }
    export_snaps = list(md.snapshots)
    if any(not exportable(f) for files in snap_files.values() for f in files):
        export_snaps = [cur] if cur is not None else []
    meta_dir = os.path.join(table.location, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    # Pending MoR deletes → position delete files (path, size, rows, seq).
    pos_delete_files = _write_position_deletes(table, cur, cur_files)

    schema, last_column_id = iceberg_schema_from_ddl(md.schema_ddl)
    spec_fields = _partition_spec_json(md.partition_spec, schema)
    entry_schema = json.dumps(_manifest_entry_schema(md.partition_spec, md.schema_ddl))
    list_schema = json.dumps(_manifest_list_schema())

    manifest_header = {
        "schema": json.dumps(schema),
        "schema-id": "0",
        "partition-spec": json.dumps(spec_fields),
        "partition-spec-id": "0",
        "format-version": "2",
        "content": "data",
    }

    col_types = _spec_col_types(md.schema_ddl)
    # spec-global position deletes ride their own UNPARTITIONED spec
    del_entry_schema = json.dumps(_manifest_entry_schema([], md.schema_ddl))
    del_manifest_header = {
        **manifest_header,
        "partition-spec": "[]",
        "partition-spec-id": "1",
        "content": "deletes",
    }
    snapshots_json = []
    snapshot_log = []
    for snap in export_snaps:
        files = snap_files[snap.snapshot_id]
        entries = [
            _entry_json(f, snap.snapshot_id, md.partition_spec, col_types)
            for f in files
        ]
        manifest_path = os.path.join(
            meta_dir, f"manifest-{snap.snapshot_id}-{uuid.uuid4().hex}.avro"
        )
        write_avro_file(spark, manifest_path, entry_schema, entries, manifest_header)

        added = [f for f in files if (f.added_snapshot_id or 0) == snap.snapshot_id]
        existing_n = len(files) - len(added)
        list_records = [
            json.dumps(
                {
                    "manifest_path": manifest_path,
                    "manifest_length": os.path.getsize(manifest_path),
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": snap.snapshot_id,
                    "min_sequence_number": min(
                        ((f.added_snapshot_id or 0) for f in files), default=snap.snapshot_id
                    ),
                    "added_snapshot_id": snap.snapshot_id,
                    "added_files_count": len(added),
                    "existing_files_count": existing_n,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(f.row_count for f in added),
                    "existing_rows_count": sum(f.row_count for f in files) - sum(f.row_count for f in added),
                    "deleted_rows_count": 0,
                }
            )
        ]
        applicable = [d for d in pos_delete_files if d[3] <= snap.snapshot_id]
        if applicable:
            del_entries = [
                _delete_entry_json(path, size, rows, seq, snap.snapshot_id)
                for path, size, rows, seq in applicable
            ]
            del_manifest = os.path.join(
                meta_dir, f"manifest-del-{snap.snapshot_id}-{uuid.uuid4().hex}.avro"
            )
            write_avro_file(
                spark,
                del_manifest,
                del_entry_schema,
                del_entries,
                del_manifest_header,
            )
            n_added = sum(1 for d in applicable if d[3] == snap.snapshot_id)
            list_records.append(
                json.dumps(
                    {
                        "manifest_path": del_manifest,
                        "manifest_length": os.path.getsize(del_manifest),
                        "partition_spec_id": 1,
                        "content": 1,
                        "sequence_number": snap.snapshot_id,
                        "min_sequence_number": min(d[3] for d in applicable),
                        "added_snapshot_id": snap.snapshot_id,
                        "added_files_count": n_added,
                        "existing_files_count": len(applicable) - n_added,
                        "deleted_files_count": 0,
                        "added_rows_count": sum(d[2] for d in applicable if d[3] == snap.snapshot_id),
                        "existing_rows_count": sum(d[2] for d in applicable if d[3] != snap.snapshot_id),
                        "deleted_rows_count": 0,
                    }
                )
            )
        list_path = os.path.join(
            meta_dir, f"snap-{snap.snapshot_id}-1-{uuid.uuid4().hex}.avro"
        )
        write_avro_file(
            spark, list_path, list_schema, list_records, {"format-version": "2"}
        )
        snapshots_json.append(
            {
                "snapshot-id": snap.snapshot_id,
                "sequence-number": snap.snapshot_id,
                "timestamp-ms": snap.timestamp_ms,
                "summary": {
                    "operation": _OP_MAP.get(snap.operation, "overwrite"),
                    **{k: str(v) for k, v in snap.summary.items()},
                },
                "manifest-list": list_path,
                "schema-id": 0,
            }
        )
        snapshot_log.append(
            {"timestamp-ms": snap.timestamp_ms, "snapshot-id": snap.snapshot_id}
        )

    metadata = {
        "format-version": 2,
        "table-uuid": md.table_uuid,
        "location": table.location,
        "last-sequence-number": max((s.snapshot_id for s in md.snapshots), default=0),
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": last_column_id,
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        # spec 1 (unpartitioned) carries the exported position-delete
        # manifests — see _delete_entry_json
        "partition-specs": [
            {"spec-id": 0, "fields": spec_fields},
            {"spec-id": 1, "fields": []},
        ],
        "last-partition-id": 999 + len(spec_fields),
        "default-sort-order-id": _sort_order_id(md, schema),
        "sort-orders": _sort_orders(md, schema),
        "properties": {
            **{str(k): str(v) for k, v in md.properties.items()},
            # always emitted: our parquet has no field ids, so readers
            # need the mapping; it also resolves pre-rename physical names
            "schema.name-mapping.default": json.dumps(
                build_name_mapping(md.schema_log, schema)
            ),
        },
        "current-snapshot-id": md.current_snapshot_id
        if md.current_snapshot_id is not None
        else -1,
        "refs": (
            {"main": {"snapshot-id": md.current_snapshot_id, "type": "branch"}}
            if md.current_snapshot_id is not None
            else {}
        ),
        "snapshots": snapshots_json,
        "snapshot-log": snapshot_log,
        "metadata-log": [],
    }

    version = 1
    while os.path.exists(os.path.join(meta_dir, f"v{version}.metadata.json")):
        version += 1
    out_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=2)
    os.rename(tmp, out_path)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
    return out_path


def _write_position_deletes(table, cur, cur_files) -> list[tuple[str, int, int, int]]:
    """Enumerate each pending MoR predicate's deleted (file, pos) rows
    and write one spec position-delete parquet per predicate. Returns
    [(path, size_bytes, row_count, sequence_number)].

    The enumeration is one distributed job per predicate over the files
    the predicate scopes (added before it — the read path's scoping),
    selecting ``_metadata.row_index``; the parquet carries the spec's
    reserved field ids (2147483546 file_path / 2147483545 pos, written
    via Spark's field-id metadata) with rows sorted by (path, pos).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    if cur is None:
        return []
    entries = table._active_delete_entries(cur)
    if not entries:
        return []
    spark = table.spark
    out: list[tuple[str, int, int, int]] = []
    delete_schema = StructType(
        [
            StructField("file_path", StringType(), True, {"parquet.field.id": 2147483546}),
            StructField("pos", LongType(), True, {"parquet.field.id": 2147483545}),
        ]
    )
    for e in entries:
        seq = e["added_snapshot_id"]
        scoped = [f for f in cur_files if (f.added_snapshot_id or 0) < seq]
        if not scoped:
            continue
        groups: dict[tuple, list] = {}
        for f in scoped:
            groups.setdefault(table._era_key(f), []).append(f)
        rows = None
        for era_key, gfiles in groups.items():
            g = table._read_era([f.path for f in gfiles], era_key, with_meta=True)
            g = g.filter(F.coalesce(F.expr(e["predicate"]), F.lit(False)))
            g = g.select("_meta_file_path", "_meta_pos")
            rows = g if rows is None else rows.unionByName(g)
        # Map the scan's file URI back to the exact path string the data
        # manifest entries carry (broadcast — the map is O(files)).
        pmap = spark.createDataFrame(
            [(_fp_key(spark, f.path), f.path) for f in scoped], "np string, file_path string"
        )
        dels = (
            rows.select(
                F.regexp_replace("_meta_file_path", "^file:(//)?", "").alias("np"),
                F.col("_meta_pos").alias("pos"),
            )
            .join(F.broadcast(pmap), "np")
            .select("file_path", "pos")
            .orderBy("file_path", "pos")
            .to(delete_schema)
        )
        staging = os.path.join(table.location, f"_del_staging-{uuid.uuid4().hex}")
        # coalesce(1): one delete file per predicate (this export's
        # delete sets are bounded; at larger scale drop the coalesce and
        # emit one manifest entry per part file).
        dels.coalesce(1).write.parquet(staging)
        part = next(
            os.path.join(staging, n)
            for n in os.listdir(staging)
            if n.endswith(".parquet")
        )
        import pyarrow.parquet as _pq

        # footer-only row count: a full spark.read...count() job per
        # delete file paid a distributed scan for a number the footer
        # already has
        n_rows = _pq.ParquetFile(part).metadata.num_rows
        if n_rows == 0:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            continue
        dest = os.path.join(table.location, f"delete-{seq}-{uuid.uuid4().hex}.parquet")
        os.rename(part, dest)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        out.append((dest, os.path.getsize(dest), n_rows, seq))
    return out


def _delete_entry_json(
    path: str, size: int, rows: int, seq: int, snapshot_id: int
) -> str:
    status = 1 if seq == snapshot_id else 0  # ADDED at its own snapshot
    return json.dumps(
        {
            "status": status,
            "snapshot_id": {"long": seq},
            "sequence_number": {"long": seq},
            "file_sequence_number": {"long": seq},
            "data_file": {
                "content": 1,
                "file_path": path,
                "file_format": "PARQUET",
                # Path-scoped (spec-global) deletes live under the
                # UNPARTITIONED spec (spec-id 1 in the export): Java
                # readers index position deletes by (spec, partition),
                # so all-null values under the PARTITIONED spec would
                # match no data file's tuple and the deletes would be
                # silently skipped by Spark/Trino/Flink.
                "partition": {},
                "record_count": rows,
                "file_size_in_bytes": size,
                "equality_ids": None,
            },
        }
    )


def _entry_json(
    f: DataFile, snapshot_id: int, spec: list[dict], col_types: dict[str, str]
) -> str:
    seq = f.added_snapshot_id or 0
    status = 1 if seq == snapshot_id else 0  # ADDED in its own snapshot else EXISTING
    partition = {}
    for pf in spec:
        name = _pfield_name(pf)
        v = f.partition.get(name)
        if v is None:
            partition[name] = None
        else:
            # branch label derives from the DECLARED Avro type (the
            # same one _partition_avro_fields wrote into the manifest
            # schema), never from the Python value's type
            partition[name] = _partition_branch(
                _partition_avro_type(pf, col_types), v
            )
    return json.dumps(
        {
            "status": status,
            "snapshot_id": {"long": seq},
            "sequence_number": {"long": seq},
            "file_sequence_number": {"long": seq},
            "data_file": {
                "content": 0,
                "file_path": f.path,
                "file_format": "PARQUET",
                "partition": partition,
                "record_count": f.row_count,
                "file_size_in_bytes": f.size_bytes,
                "equality_ids": None,
            },
        }
    )


# ---------------------------------------------------------------------------
# Foreign-snapshot scan: metadata.json → DataFrame
# ---------------------------------------------------------------------------

def _resolve_metadata_path(location: str) -> str:
    """Accept a metadata.json path, a metadata/ dir, or a table root."""
    if location.endswith(".json"):
        return location
    for base in (location, os.path.join(location, "metadata")):
        hint = os.path.join(base, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                v = fh.read().strip()
            cand = os.path.join(base, f"v{v}.metadata.json")
            if os.path.exists(cand):
                return cand
        if os.path.isdir(base):
            versions = sorted(
                (f for f in os.listdir(base) if f.endswith(".metadata.json")),
                key=lambda n: _metadata_version_key(n),
            )
            if versions:
                return os.path.join(base, versions[-1])
    raise FileNotFoundError(f"no Iceberg metadata.json under {location}")


def _metadata_version_key(name: str):
    m = re.match(r"v?(\d+)", name)
    return (int(m.group(1)) if m else 0, name)


def _localize(path: str) -> str:
    """Strip a file: scheme; other schemes pass through to Spark."""
    if path.startswith("file:"):
        return re.sub(r"^file:(//)?", "", path)
    return path


def scan_iceberg(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
    where: str | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Scan an Iceberg table (v1 or v2) from its metadata location.

    ``location`` may be the ``metadata.json`` itself, the table root, or
    its ``metadata/`` dir (version-hint resolution, HadoopCatalog
    layout). Reads the current snapshot unless ``snapshot_id`` pins one.

    v2 **position delete files** are applied: deleted (file, row)
    positions anti-join the data scan on ``_metadata.file_path`` /
    ``_metadata.row_index`` — the Spark expression of the reference's
    position-delete anti-join (pg_lake_iceberg snapshot.c:556,612).
    Position deletes name their target file explicitly, so path+pos is
    exact scoping; no sequence-number check is needed (Iceberg never
    reuses a data-file path).

    v2 **equality delete files** (the common Flink CDC output; the
    reference parses their ``equality_ids`` in read_manifest.c:305-306)
    are applied per the spec's sequence-number scoping: a delete with
    sequence number S removes rows whose equality columns match
    null-safely (``<=>``) from data files with sequence number < S.
    Data-file sequence numbers ride a broadcast (path → seq) map joined
    on ``_metadata.file_path``; each distinct equality_ids group is one
    distributed anti-join — no driver-side row work at any scale.

    A ``schema.name-mapping.default`` table property is honored for
    files without parquet field ids: per field id, the first mapped
    name present in a file resolves the column (files written before a
    rename keep working); absent names read NULL (plain ADD COLUMN).

    Reference: describe.c:167 DescribeColumnsFromIcebergMetadataURI.
    """
    meta_path = _resolve_metadata_path(_localize(location))
    with open(meta_path) as fh:
        meta = json.load(fh)
    return scan_iceberg_metadata(
        spark, meta, snapshot_id=snapshot_id, where=where, as_of_ms=as_of_ms
    )


#: Diagnostics for the most recent scan_iceberg call in this process:
#: {"files_total", "files_scanned", "files_skipped"}.
last_scan_report: dict | None = None


def scan_iceberg_metadata(
    spark: SparkSession,
    meta: dict,
    snapshot_id: int | None = None,
    where: str | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Scan from an already-parsed metadata document — the entry point
    for catalogs that serve metadata over an API (REST catalog
    ``LoadTableResult.metadata``) rather than a file path.

    ``as_of_ms`` resolves the latest snapshot at or before the given
    epoch-millis timestamp (spec snapshot-log semantics); mutually
    exclusive with ``snapshot_id``.
    """
    from pyspark.sql import functions as F

    schema = _current_schema(meta)
    ddl = spark_schema_from_iceberg(schema)

    snaps = meta.get("snapshots", [])
    if as_of_ms is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or as_of_ms, not both")
        eligible = [s for s in snaps if s.get("timestamp-ms", 0) <= as_of_ms]
        if not eligible:
            return spark.createDataFrame([], ddl)
        snapshot_id = max(eligible, key=lambda s: s.get("timestamp-ms", 0)).get(
            "snapshot-id"
        )
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    snap = next((s for s in snaps if s.get("snapshot-id") == snapshot_id), None)
    if snap is None:
        return spark.createDataFrame([], ddl)

    data_entries, delete_paths, eq_deletes = _snapshot_files(
        spark, snap, int(meta.get("format-version", 1))
    )
    n_total = len(data_entries)
    if where and data_entries:
        data_entries = _prune_data_entries(spark, data_entries, meta, schema, where)
    global last_scan_report
    last_scan_report = {
        "files_total": n_total,
        "files_scanned": len(data_entries),
        "files_skipped": n_total - len(data_entries),
    }
    paths = [p for p, _seq, _part in data_entries]
    if not paths:
        return spark.createDataFrame([], ddl)

    nm_raw = (meta.get("properties") or {}).get("schema.name-mapping.default")
    if nm_raw:
        mapping = json.loads(nm_raw)
    else:
        # No mapping property: real Iceberg writers still resolve by
        # PARQUET field id (a pre-rename file physically stores the old
        # name and would read all-NULL by-name). The schema-derived
        # identity mapping makes _read_with_name_mapping do id-first
        # resolution with by-name fallback — by-name-identical for
        # id-less files, id-correct for foreign ones. The per-file
        # footer peek is the same O(files) driver planning cost the
        # manifest walk already paid.
        mapping = [
            {"field-id": f["id"], "names": [f["name"]]}
            for f in schema["fields"]
        ]
    with_pos = bool(delete_paths) or bool(eq_deletes)
    df = _read_with_name_mapping(spark, paths, ddl, schema, mapping, with_pos)

    if delete_paths:
        # Position-delete parquet layout (spec): file_path string, pos long.
        dels = spark.read.parquet(*delete_paths).select(
            _norm_path(F.col("file_path")).alias("__fp"),
            F.col("pos").alias("__pos"),
        )
        # AQE broadcasts the (typically tiny) delete set; at scale the
        # anti-join shuffles on (path, pos) — both sides pre-hashed.
        df = df.join(dels, ["__fp", "__pos"], "left_anti")

    if eq_deletes:
        df = _apply_equality_deletes(spark, df, schema, data_entries, eq_deletes)

    if with_pos:
        df = df.drop("__fp", "__pos")
    if where:
        df = df.filter(where)
    return df


def _prune_data_entries(
    spark: SparkSession,
    data_entries: list[tuple[str, int, dict]],
    meta: dict,
    schema: dict,
    where: str,
) -> list[tuple[str, int, dict]]:
    """Partition pruning for foreign snapshots: manifests carry each
    data file's partition values, so identity-transform fields prune the
    file list against the predicate's AND conjuncts — the same planning
    step the reference runs in PruneDataFiles (data_file_pruning.c:186),
    here shared with the Delta scanner (pruning.conjunct_filter_paths).

    Sound by restriction: only identity fields whose source type casts
    faithfully from the manifest's JSON value (ints/strings/doubles/
    booleans — not date/timestamp, which Iceberg encodes as epoch
    ordinals) participate, and only when every file carries the same
    partition keys (single-spec tables); anything else keeps all files.
    """
    from pyspark.sql import functions as F

    from pg_lake_spark.lakehouse.pruning import conjunct_filter_paths

    if "partition-specs" in meta:
        sid = meta.get("default-spec-id", 0)
        fields = next(
            (s["fields"] for s in meta["partition-specs"] if s.get("spec-id") == sid),
            [],
        )
    else:  # v1
        fields = meta.get("partition-spec", [])
    by_id = {f["id"]: f for f in schema["fields"]}
    safe = {"int", "long", "string", "double", "float", "boolean"}
    cols: list[tuple[str, str, str]] = []  # (pfield name, column name, spark type)
    for pf in fields:
        if pf.get("transform") != "identity":
            continue
        src = by_id.get(pf.get("source-id"))
        if not src or not isinstance(src["type"], str) or src["type"] not in safe:
            continue
        cols.append((pf["name"], src["name"], _iceberg_type_to_spark_ddl(src["type"])))
    if not cols:
        return data_entries
    keysets = {frozenset((part or {}).keys()) for _p, _s, part in data_entries}
    if len(keysets) != 1 or not {c[0] for c in cols} <= next(iter(keysets)):
        return data_entries

    rows = []
    for path, _seq, part in data_entries:
        vals = []
        for pname, _cname, _t in cols:
            v = _unwrap(part.get(pname))
            vals.append(None if v is None else str(v))
        rows.append((path, *vals))
    pdf = spark.createDataFrame(
        rows, "__path string, " + ", ".join(f"`{c}` string" for _p, c, _t in cols)
    )
    frame = pdf.select(
        "__path", *[F.col(c).cast(t).alias(c) for _p, c, t in cols]
    )
    surviving = conjunct_filter_paths(spark, frame, where)
    if surviving is None:
        return data_entries
    return [e for e in data_entries if e[0] in surviving]


def _apply_equality_deletes(
    spark: SparkSession,
    df: DataFrame,
    schema: dict,
    data_entries: list[tuple[str, int, dict]],
    eq_deletes: list[tuple[str, int, tuple[int, ...]]],
) -> DataFrame:
    """Sequence-scoped equality-delete anti-joins (spec: 'Equality
    deletes ... applied to data files with a sequence number strictly
    less than the delete file's'). Null-safe column equality per spec
    (a null delete value matches null data values)."""
    from pyspark.sql import functions as F

    field_by_id = {f["id"]: f["name"] for f in schema["fields"]}
    type_by_name = {}
    for f in schema["fields"]:
        type_by_name[f["name"]] = _iceberg_type_to_spark_ddl(f["type"])

    # Attach each data row's file sequence number via a broadcast map on
    # the already-computed __fp (normalized _metadata.file_path). Keys use
    # _fp_key (Hadoop URI encoding) so paths with special characters match.
    seq_rows = [(_fp_key(spark, p), int(s)) for p, s, _part in data_entries]
    seq_map = spark.createDataFrame(seq_rows, "__fp string, __dataseq long")
    df = df.join(F.broadcast(seq_map), "__fp")

    groups: dict[tuple[int, ...], list[tuple[str, int]]] = {}
    for p, s, ids in eq_deletes:
        groups.setdefault(ids, []).append((p, s))

    for ids, files in groups.items():
        try:
            cols = [field_by_id[i] for i in ids]
        except KeyError as e:
            raise ValueError(f"equality_ids reference unknown field id: {e}") from e
        read_ddl = ", ".join(f"`{c}` {type_by_name[c]}" for c in cols)
        dmap = spark.createDataFrame(
            [(_fp_key(spark, p), int(s)) for p, s in files],
            "__dfp string, __delseq long",
        )
        dels = (
            spark.read.schema(read_ddl)
            .parquet(*[p for p, _s in files])
            .select(
                *[F.col(c).alias(f"__del_{c}") for c in cols],
                _norm_path(F.col("_metadata.file_path")).alias("__dfp"),
            )
            .join(F.broadcast(dmap), "__dfp")
            .drop("__dfp")
        )
        cond = F.col("__dataseq") < F.col("__delseq")
        for c in cols:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__del_{c}"))
        df = df.join(dels, cond, "left_anti")

    return df.drop("__dataseq")


def _norm_path(col):
    """Normalize a file path for join-key equality: percent-DECODE and
    strip the file: scheme. ``_metadata.file_path`` is Hadoop-URI
    encoded (space → %20) while delete-parquet ``file_path`` is usually
    the writer's raw spelling — comparing them un-normalized silently
    unapplies deletes for any location with a URI-unsafe character.
    URLDecoder would also turn a literal '+' into a space, so '+' is
    pre-escaped; try_url_decode degrades to the raw value for strings
    with stray '%' that are not percent sequences.

    Known caveat: a path containing a LITERAL percent-escape substring
    (a directory actually named 'a%20b') is indistinguishable from an
    encoded one after a single decode, so a foreign delete file that
    spells such a path raw will not match the scan's doubly-encoded
    spelling. Both-forms union joins would cover it at the cost of
    doubling the join key set on every MoR scan; accepted as out of
    scope (same call as Iceberg's own reference implementations, which
    compare single-decoded forms)."""
    from pyspark.sql import functions as F

    decoded = F.coalesce(
        F.try_url_decode(F.replace(col, F.lit("+"), F.lit("%2B"))), col
    )
    return F.regexp_replace(decoded, "^file:(//)?", "")


def _fp_key(spark: SparkSession, path: str) -> str:
    """The string ``_norm_path(_metadata.file_path)`` yields for a local
    ``path``. Since _norm_path percent-DECODES (so raw writer-spelled
    delete paths and Hadoop-encoded scan paths meet on one form), the
    driver-side key is simply the decoded absolute path minus any
    ``file:`` scheme. Driver-built maps joined against the scan's
    file-path column MUST use this key."""
    p = re.sub(r"^file:(//)?", "", path)
    if "://" not in p:
        p = os.path.abspath(p)
    return unquote(p)


def _read_with_name_mapping(
    spark: SparkSession,
    paths: list[str],
    ddl: str,
    schema: dict,
    mapping: list[dict],
    with_pos: bool,
) -> DataFrame:
    """Read data files honoring an Iceberg name-mapping.

    Per the spec, ``schema.name-mapping.default`` applies ONLY to files
    WITHOUT parquet field ids; a file whose footer carries
    ``PARQUET:field_id`` metadata resolves by id, and the mapping —
    which may be stale for id-evolved foreign tables — is ignored for
    it. Files group by their resolved (physical-name per field) tuple —
    computed from parquet footers, a driver-side O(files) planning step
    exactly like the reference's manifest planning — and each group is
    one typed scan presented in the current names; groups union.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    st = spark.createDataFrame([], ddl).schema
    types = {f.name: f.dataType.simpleString() for f in st.fields}
    by_id = {m["field-id"]: m.get("names", []) for m in mapping}
    field_names = [(f["name"], by_id.get(f["id"], [f["name"]])) for f in schema["fields"]]
    field_ids = [f["id"] for f in schema["fields"]]

    groups: dict[tuple, list[str]] = {}
    for p in paths:
        fsch = pq.read_schema(p)
        ids_in_file: dict[int, str] = {}
        for i, name in enumerate(fsch.names):
            fmeta = fsch.field(i).metadata or {}
            fid = fmeta.get(b"PARQUET:field_id")
            if fid is not None:
                ids_in_file[int(fid)] = name
        if ids_in_file:
            # Field-id resolution wins; absent ids read NULL.
            resolution = tuple(ids_in_file.get(fid) for fid in field_ids)
        else:
            cols = set(fsch.names)
            resolution = tuple(
                next((n for n in names or [logical] if n in cols), None)
                for logical, names in field_names
            )
        groups.setdefault(resolution, []).append(p)

    out = None
    for resolution, ps in groups.items():
        read_ddl = ", ".join(
            f"`{phys}` {types[logical]}"
            for (logical, _), phys in zip(field_names, resolution)
            if phys is not None
        )
        if read_ddl:
            g = spark.read.schema(read_ddl).parquet(*ps)
        else:
            # zero fields resolved (stale mapping, all columns since
            # re-added under new ids): the file's ROWS still exist —
            # read a zero-column projection (footer row counts drive
            # it) and surface all-NULL fields instead of crashing on
            # an empty DDL parse
            from pyspark.sql.types import StructType as _ST

            g = spark.read.schema(_ST([])).parquet(*ps)
        cols = []
        for (logical, _), phys in zip(field_names, resolution):
            if phys is None:
                cols.append(F.lit(None).cast(types[logical]).alias(logical))
            else:
                cols.append(F.col(f"`{phys}`").alias(logical))
        if with_pos:
            cols.append(_norm_path(F.col("_metadata.file_path")).alias("__fp"))
            cols.append(F.col("_metadata.row_index").alias("__pos"))
        g = g.select(*cols)
        out = g if out is None else out.unionByName(g)
    return out


def _sort_orders(md, schema: dict) -> list[dict]:
    """Spec sort-orders: order 0 is always the unsorted order; a table
    clustered by maintenance.rewrite_sorted declares its key as order 1
    (asc, nulls-first — the ordering repartitionByRange produced)."""
    orders = [{"order-id": 0, "fields": []}]
    cols = [c for c in (md.properties.get("sort-order") or "").split(",") if c]
    ids = {f["name"]: f["id"] for f in schema["fields"]}
    if cols and all(c in ids for c in cols):
        orders.append(
            {
                "order-id": 1,
                "fields": [
                    {
                        "transform": "identity",
                        "source-id": ids[c],
                        "direction": "asc",
                        "null-order": "nulls-first",
                    }
                    for c in cols
                ],
            }
        )
    return orders


def _sort_order_id(md, schema: dict) -> int:
    return 1 if len(_sort_orders(md, schema)) > 1 else 0


def _current_schema(meta: dict) -> dict:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id", 0) == sid:
                return s
        return meta["schemas"][0]
    return meta["schema"]  # format v1


def _unwrap(v):
    """Avro-JSON union values may arrive as {"long": 5}; unwrap them."""
    if isinstance(v, dict) and len(v) == 1:
        return next(iter(v.values()))
    return v


def _snapshot_files(
    spark: SparkSession, snap: dict, format_version: int = 2
) -> tuple[
    list[tuple[str, int, dict]], list[str], list[tuple[str, int, tuple[int, ...]]]
]:
    """File inventory for one snapshot: ``(data, pos_deletes,
    eq_deletes)`` where data = [(path, data_sequence_number,
    partition_values)], pos_deletes = [path], eq_deletes = [(path,
    sequence_number, equality_ids)].

    Delete manifests (manifest-list ``content``=1 / manifest header
    ``content``="deletes") are walked like data manifests; entries with
    ``data_file.content``=1 are position deletes, ``content``=2 are
    equality deletes — both applied by the caller's anti-joins.

    Sequence-number inheritance (v2 spec): real writers (Spark, Flink
    CDC) write ``sequence_number = null`` on ADDED entries — the value
    is inherited from the manifest-list entry's ``sequence_number``.
    An EXISTING/DELETED entry with a null seq in a v2 manifest list is
    a spec violation and raises. v1 metadata (manifest list carries no
    sequence numbers) defaults to 0 — equality deletes cannot exist
    there, so scoping is vacuous.
    """
    manifests: list[dict] = []
    if "manifest-list" in snap:
        records, _ = read_avro_records(spark, _localize(snap["manifest-list"]))
        manifests = records
    else:  # v1 inline manifest list
        manifests = [{"manifest_path": p, "content": 0} for p in snap.get("manifests", [])]

    data: list[tuple[str, int, dict]] = []
    pos_deletes: list[str] = []
    eq_deletes: list[tuple[str, int, tuple[int, ...]]] = []
    for m in manifests:
        entries, header = read_avro_records(spark, _localize(m["manifest_path"]))
        for e in entries:
            if e.get("status") == 2:  # DELETED
                continue
            df = e["data_file"]
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(f"data file format {fmt} not supported")
            raw_seq = _unwrap(e.get("sequence_number"))
            if raw_seq is not None:
                seq = int(raw_seq)
            elif format_version < 2:
                seq = 0  # v1: no sequence numbers anywhere; scoping vacuous
            else:
                m_seq = _unwrap(m.get("sequence_number"))
                if m_seq is None:
                    seq = 0  # inline v1-style manifest list in v2 metadata
                elif e.get("status") == 1:  # ADDED inherits (v2 spec)
                    seq = int(m_seq)
                else:
                    raise ValueError(
                        f"manifest {m['manifest_path']}: EXISTING entry for "
                        f"{e['data_file'].get('file_path')} has no explicit "
                        "sequence_number (required by the Iceberg v2 spec)"
                    )
            content = df.get("content", 0) or (
                1 if m.get("content", 0) == 1 or header.get("content") == "deletes" else 0
            )
            if content == 0:
                data.append((_localize(df["file_path"]), seq, df.get("partition") or {}))
            elif content == 1:
                pos_deletes.append(_localize(df["file_path"]))
            else:
                ids = tuple(int(i) for i in (_unwrap(df.get("equality_ids")) or []))
                if not ids:
                    raise ValueError(
                        f"equality delete file {df['file_path']} has no equality_ids"
                    )
                eq_deletes.append((_localize(df["file_path"]), seq, ids))

    # An entry may appear as ADDED in one manifest and EXISTING in
    # another within the same snapshot; de-dup preserving order.
    def dedup(items: list) -> list:
        seen: set = set()
        out = []
        for it in items:
            key = it[0] if isinstance(it, tuple) else it
            if key not in seen:
                seen.add(key)
                out.append(it)
        return out

    return dedup(data), dedup(pos_deletes), dedup(eq_deletes)


# ---------------------------------------------------------------------------
# Inspection table functions (lake_iceberg.metadata / lake_iceberg.files)
# ---------------------------------------------------------------------------

def iceberg_metadata(location: str) -> dict:
    """The raw Iceberg metadata document for a table root / metadata
    path — parity with ``lake_iceberg.metadata(url)`` returning the
    spec JSONB (docs/iceberg-tables.md:601-636)."""
    meta_path = _resolve_metadata_path(_localize(location))
    with open(meta_path) as fh:
        return json.load(fh)


def iceberg_files(
    spark: SparkSession, location: str, snapshot_id: int | None = None
) -> DataFrame:
    """One row per manifest entry of the (current or pinned) snapshot —
    parity with ``lake_iceberg.files(metadata_url)``
    (docs/iceberg-tables.md:639-656): manifest_path, content (0=data,
    1=position deletes, 2=equality deletes), file_path, file_format,
    spec_id, record_count, file_size_in_bytes, sequence_number,
    partition (JSON).

    Metadata-only: walks the manifest list + manifests; no data files
    are opened, so this is O(#files) driver work like the reference's
    table function."""
    meta = iceberg_metadata(location)
    snaps = meta.get("snapshots", [])
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    snap = next((s for s in snaps if s.get("snapshot-id") == sid), None)
    rows: list[tuple] = []
    if snap is not None:
        fv = int(meta.get("format-version", 1))
        if "manifest-list" in snap:
            manifests, _ = read_avro_records(spark, _localize(snap["manifest-list"]))
        else:
            manifests = [
                {"manifest_path": p, "content": 0} for p in snap.get("manifests", [])
            ]
        for m in manifests:
            entries, header = read_avro_records(spark, _localize(m["manifest_path"]))
            for e in entries:
                if e.get("status") == 2:  # DELETED entries are not live
                    continue
                df_ = e["data_file"]
                raw_seq = _unwrap(e.get("sequence_number"))
                m_seq = _unwrap(m.get("sequence_number"))
                if raw_seq is not None:
                    seq = int(raw_seq)
                elif fv >= 2 and m_seq is not None and e.get("status") == 1:
                    seq = int(m_seq)  # ADDED inherits (v2 spec)
                elif fv >= 2 and m_seq is not None:
                    # EXISTING without an explicit sequence violates the
                    # v2 spec (the scan path raises); the inspection
                    # view reports NULL rather than inventing a number
                    seq = None
                else:
                    seq = 0
                content = df_.get("content", 0) or (
                    1
                    if m.get("content", 0) == 1 or header.get("content") == "deletes"
                    else 0
                )
                spec_id = _unwrap(m.get("partition_spec_id"))
                rows.append(
                    (
                        m["manifest_path"],
                        int(content),
                        df_["file_path"],
                        str(df_.get("file_format", "PARQUET")).upper(),
                        int(spec_id) if spec_id is not None else 0,
                        int(_unwrap(df_.get("record_count")) or 0),
                        int(_unwrap(df_.get("file_size_in_bytes")) or 0),
                        seq,
                        json.dumps(df_.get("partition") or {}, default=str),
                    )
                )
    return spark.createDataFrame(
        rows,
        "manifest_path string, content int, file_path string, "
        "file_format string, spec_id int, record_count bigint, "
        "file_size_in_bytes bigint, sequence_number bigint, partition string",
    )


def iceberg_snapshots(spark: SparkSession, location: str) -> DataFrame:
    """Snapshot history as a DataFrame (snapshot-id, timestamp-ms,
    summary JSON) — the metadata-table complement of iceberg_files."""
    meta = iceberg_metadata(location)
    rows = [
        (
            int(s.get("snapshot-id")),
            int(s.get("timestamp-ms", 0)),
            json.dumps(s.get("summary") or {}, default=str),
        )
        for s in meta.get("snapshots", [])
    ]
    return spark.createDataFrame(
        rows, "snapshot_id bigint, timestamp_ms bigint, summary string"
    )


def iceberg_field_ids(location: str) -> dict[str, int]:
    """Leaf name → field-id mapping of the table's current schema —
    parity with the reference's ``iceberg_table_fieldids`` /
    ``pg_lake_get_leaf_field_ids`` introspection (field ids drive
    column resolution for foreign readers and name-mapping export).
    Nested fields flatten with dotted paths."""
    md = iceberg_metadata(location)
    # same resolution rules (schema-id default 0, schemas[0] fallback)
    # as every other reader of this metadata — no second copy to drift
    try:
        schema = _current_schema(md)
    except KeyError:
        schema = None
    if schema is None:
        raise ValueError(f"no schema in metadata under {location}")

    out: dict[str, int] = {}

    def walk(fields: list, prefix: str) -> None:
        for f in fields:
            name = prefix + f["name"]
            out[name] = int(f["id"])
            t = f.get("type")
            if isinstance(t, dict) and t.get("type") == "struct":
                walk(t["fields"], name + ".")

    walk(schema["fields"], "")
    return out
