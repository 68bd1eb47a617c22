"""Iceberg metadata interop tests.

In the spirit of the reference's
pg_lake_iceberg/tests/pytests/test_iceberg_metadata_via_pyiceberg.py /
test_iceberg_metadata_via_spark.py: a LakeTable's exported metadata must
be readable as a real Iceberg table (here via our independent
spec-reader, since neither pyiceberg nor an Iceberg runtime jar is
available in this environment), and foreign Iceberg metadata must scan.
The Avro manifests are written AND re-read through the Apache Avro Java
library, so the container format is genuinely spec-Avro, and headers
carry the key/value metadata pyiceberg requires.
"""

from __future__ import annotations

import json
import os

import pytest

from pg_lake_spark.lakehouse import iceberg_meta
from pg_lake_spark.lakehouse.table import LakeTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def small_table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "ice1"), "id bigint, name string, val double")
    t.append(
        spark.createDataFrame(
            [(i, f"n{i}", float(i) / 2) for i in range(20)],
            "id bigint, name string, val double",
        )
    )
    t.append(
        spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(20, 30)],
            "id bigint, name string, val double",
        )
    )
    return t


def test_export_then_scan_roundtrip(spark, small_table):
    meta_path = small_table.export_iceberg()
    assert os.path.basename(meta_path) == "v1.metadata.json"
    got = iceberg_meta.scan_iceberg(spark, meta_path)
    assert _rows(got) == _rows(small_table.to_df())
    assert got.columns == ["id", "name", "val"]


def test_scan_accepts_root_and_metadata_dir(spark, small_table):
    small_table.export_iceberg()
    for loc in (small_table.location, os.path.join(small_table.location, "metadata")):
        got = iceberg_meta.scan_iceberg(spark, loc)
        assert got.count() == 30


def test_export_time_travel(spark, small_table):
    small_table.export_iceberg()
    got1 = iceberg_meta.scan_iceberg(spark, small_table.location, snapshot_id=1)
    assert _rows(got1) == _rows(small_table.to_df(snapshot_id=1))
    got2 = iceberg_meta.scan_iceberg(spark, small_table.location, snapshot_id=2)
    assert got2.count() == 30


def test_export_after_delete_matches(spark, small_table):
    small_table.delete("id >= 25")
    small_table.export_iceberg()
    got = iceberg_meta.scan_iceberg(spark, small_table.location)
    assert _rows(got) == _rows(small_table.to_df())
    assert got.count() == 25


def test_export_emits_position_deletes_for_pending_mor(spark, small_table):
    """A pending MoR predicate exports as a v2 position delete file —
    no data rewrite, no forced materialization — and the spec reader
    anti-joins exactly the deleted rows; pre-delete snapshots time-
    travel to the undeleted state."""
    small_table.delete("id < 5", mode="mor")
    path = small_table.export_iceberg()
    # still pending: export must not have materialized
    assert small_table.active_delete_predicates() == ["id < 5"]
    got = iceberg_meta.scan_iceberg(spark, small_table.location)
    assert _rows(got) == _rows(small_table.to_df())
    assert got.count() == 25
    # a delete manifest with a content=1 entry exists for the head
    meta = json.load(open(path))
    lists, _ = iceberg_meta.read_avro_records(
        spark, meta["snapshots"][-1]["manifest-list"]
    )
    del_manifests = [m for m in lists if m["content"] == 1]
    assert len(del_manifests) == 1
    entries, hdr = iceberg_meta.read_avro_records(
        spark, del_manifests[0]["manifest_path"]
    )
    assert hdr["content"] == "deletes"
    assert [e["data_file"]["content"] for e in entries] == [1]
    assert entries[0]["data_file"]["record_count"] == 5
    # snapshots before the delete see all rows
    assert iceberg_meta.scan_iceberg(
        spark, small_table.location, snapshot_id=2
    ).count() == 30


def test_partitioned_export(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "ice_part"),
        "id bigint, cat string, val double",
        partition_by=["cat", "bucket(4, id)"],
    )
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(40)],
            "id bigint, cat string, val double",
        )
    )
    meta_path = t.export_iceberg()
    got = iceberg_meta.scan_iceberg(spark, meta_path)
    assert _rows(got) == _rows(t.to_df())
    meta = json.load(open(meta_path))
    fields = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in fields] == ["identity", "bucket[4]"]
    assert [f["field-id"] for f in fields] == [1000, 1001]
    assert fields[0]["source-id"] == 2  # cat is the 2nd column


def test_metadata_json_spec_shape(spark, small_table):
    meta_path = small_table.export_iceberg()
    meta = json.load(open(meta_path))
    # Required v2 fields per the public spec.
    for key in (
        "format-version",
        "table-uuid",
        "location",
        "last-sequence-number",
        "last-updated-ms",
        "last-column-id",
        "schemas",
        "current-schema-id",
        "partition-specs",
        "default-spec-id",
        "last-partition-id",
        "sort-orders",
        "default-sort-order-id",
    ):
        assert key in meta, key
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == 2
    snap = meta["snapshots"][-1]
    assert snap["sequence-number"] == 2
    assert os.path.exists(snap["manifest-list"])
    schema = meta["schemas"][0]
    assert [f["id"] for f in schema["fields"]] == [1, 2, 3]
    assert [f["type"] for f in schema["fields"]] == ["long", "string", "double"]


def test_manifest_avro_headers_and_entries(spark, small_table):
    """Manifests carry the OCF header metadata pyiceberg requires, and
    entries carry spec statuses/sequence numbers."""
    meta_path = small_table.export_iceberg()
    meta = json.load(open(meta_path))
    snap2 = meta["snapshots"][-1]
    lists, list_hdr = iceberg_meta.read_avro_records(spark, snap2["manifest-list"])
    assert list_hdr["format-version"] == "2"
    assert len(lists) == 1
    m = lists[0]
    assert m["content"] == 0 and m["sequence_number"] == 2
    assert m["added_files_count"] >= 1 and m["existing_files_count"] >= 1
    entries, hdr = iceberg_meta.read_avro_records(spark, m["manifest_path"])
    for key in ("schema", "partition-spec", "partition-spec-id", "format-version", "content"):
        assert key in hdr, key
    assert hdr["content"] == "data"
    json.loads(hdr["schema"])  # valid JSON schema
    statuses = {e["status"] for e in entries}
    assert statuses == {0, 1}  # EXISTING (snapshot-1 files) + ADDED
    for e in entries:
        seq = e["sequence_number"]
        assert seq in (1, 2)
        assert (e["status"] == 1) == (seq == 2)
        assert e["data_file"]["file_format"] == "PARQUET"
        assert e["data_file"]["record_count"] > 0


def test_scan_foreign_iceberg_v1_layout(spark, tmp_path):
    """Reader handles metadata not produced by our writer: a v1-style
    metadata.json (single 'schema' key, no sequence numbers) with a
    manifest containing only EXISTING entries."""
    # Build data with plain Spark, no LakeTable.
    data_dir = tmp_path / "foreign" / "data"
    df = spark.createDataFrame([(i, f"x{i}") for i in range(7)], "k bigint, s string")
    df.coalesce(1).write.parquet(str(data_dir))
    pq = [str(data_dir / f) for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert len(pq) == 1

    meta_dir = tmp_path / "foreign" / "metadata"
    os.makedirs(meta_dir)
    entry_schema = json.dumps(
        iceberg_meta._manifest_entry_schema([], "k bigint, s string")
    )
    entry = json.dumps(
        {
            "status": 0,
            "snapshot_id": {"long": 99},
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": "file://" + pq[0],
                "file_format": "parquet",
                "partition": {},
                "record_count": 7,
                "file_size_in_bytes": os.path.getsize(pq[0]),
                "equality_ids": None,
            },
        }
    )
    manifest = str(meta_dir / "m1.avro")
    iceberg_meta.write_avro_file(spark, manifest, entry_schema, [entry], {})
    list_schema = json.dumps(iceberg_meta._manifest_list_schema())
    lst = json.dumps(
        {
            "manifest_path": manifest,
            "manifest_length": os.path.getsize(manifest),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": 99,
            "added_files_count": 0,
            "existing_files_count": 1,
            "deleted_files_count": 0,
            "added_rows_count": 0,
            "existing_rows_count": 7,
            "deleted_rows_count": 0,
        }
    )
    mlist = str(meta_dir / "snap-99.avro")
    iceberg_meta.write_avro_file(spark, mlist, list_schema, [lst], {})
    metadata = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": str(tmp_path / "foreign"),
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "s", "required": False, "type": "string"},
            ],
        },
        "partition-spec": [],
        "current-snapshot-id": 99,
        "snapshots": [
            {"snapshot-id": 99, "timestamp-ms": 0, "manifest-list": mlist}
        ],
    }
    with open(meta_dir / "v1.metadata.json", "w") as fh:
        json.dump(metadata, fh)

    got = iceberg_meta.scan_iceberg(spark, str(tmp_path / "foreign"))
    assert _rows(got) == _rows(df)
    assert got.columns == ["k", "s"]


def test_register_iceberg_table_facade(spark, small_table):
    from pg_lake_spark.session import LakeSession

    small_table.export_iceberg()
    sess = LakeSession(spark)
    sess.register_iceberg_table("ext_ice", small_table.location)
    n = sess.sql("SELECT count(*) AS n FROM ext_ice").collect()[0].n
    assert n == 30


def test_repeated_export_bumps_version(spark, small_table):
    p1 = small_table.export_iceberg()
    small_table.append(
        spark.createDataFrame([(100, "z", 0.0)], "id bigint, name string, val double")
    )
    p2 = small_table.export_iceberg()
    assert p1.endswith("v1.metadata.json") and p2.endswith("v2.metadata.json")
    hint = os.path.join(small_table.location, "metadata", "version-hint.text")
    assert open(hint).read().strip() == "2"
    assert iceberg_meta.scan_iceberg(spark, small_table.location).count() == 31


def test_schema_type_mapping_roundtrip():
    schema, last_id = iceberg_meta.iceberg_schema_from_ddl(
        "a bigint, b string, c decimal(12,2), d array<double>, e timestamp_ntz, f date"
    )
    types = [f["type"] for f in schema["fields"]]
    assert types[0] == "long" and types[1] == "string"
    assert types[2] == "decimal(12, 2)"
    assert types[3]["type"] == "list" and types[3]["element"] == "double"
    assert types[4] == "timestamp" and types[5] == "date"
    assert last_id == 7  # 6 columns + 1 list element id
    ddl = iceberg_meta.spark_schema_from_iceberg(schema)
    assert "decimal(12,2)" in ddl and "array<double>" in ddl


def test_export_drops_history_when_older_eras_exist(spark, tmp_path):
    """A constant ADD COLUMN DEFAULT backfill cannot be represented in a
    v2 export. With such files at the head the export raises; after
    compaction the head exports, but pre-evolution snapshots would
    mis-read for external time travelers — the export must restrict
    itself to the current snapshot's lineage (r2 ADVICE)."""
    from pg_lake_spark.lakehouse.maintenance import compact_data_files

    t = LakeTable.create(spark, str(tmp_path / "era_exp"), "id bigint, s string")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string"))
    t.add_column("zone", "string", default="'z0'")
    # head still carries a constant-backfill-era file → guard raises
    with pytest.raises(NotImplementedError):
        t.export_iceberg()
    compact_data_files(t, min_input_files=1)
    path = t.export_iceberg()
    meta = json.load(open(path))
    assert len(meta["snapshots"]) == 1
    assert meta["snapshots"][0]["snapshot-id"] == meta["current-snapshot-id"]
    # and the exported head scans correctly through the spec reader
    got = _rows(iceberg_meta.scan_iceberg(spark, path))
    assert got == [(1, "a", "z0"), (2, "b", "z0")]


def test_export_rename_era_via_name_mapping(spark, tmp_path):
    """RENAME COLUMN no longer blocks export: the emitted
    schema.name-mapping.default resolves the old physical name, full
    history is retained, and the spec reader scans pre-rename files
    under the current name."""
    t = LakeTable.create(spark, str(tmp_path / "nm_exp"), "id bigint, s string")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string"))
    t.rename_column("s", "label")
    t.append(spark.createDataFrame([(3, "c")], "id bigint, label string"))
    path = t.export_iceberg()
    meta = json.load(open(path))
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert {"field-id": 2, "names": ["label", "s"]} in nm
    # every snapshot exported (no history restriction for renames)
    assert len(meta["snapshots"]) == len(t.metadata.snapshots)
    got = iceberg_meta.scan_iceberg(spark, path)
    assert got.columns == ["id", "label"]
    assert _rows(got) == [(1, "a"), (2, "b"), (3, "c")]


def test_scan_foreign_v2_with_position_deletes(spark, tmp_path):
    """A foreign v2 table carrying position delete files scans with the
    deleted (file, pos) rows anti-joined away (reference reads position
    deletes natively, snapshot.c:556,612)."""
    root = tmp_path / "posdel"
    data_dir = root / "data"
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], "k bigint, s string"
    )
    df.coalesce(1).write.parquet(str(data_dir))
    pq_files = [str(data_dir / f) for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert len(pq_files) == 1
    data_path = pq_files[0]
    # row order inside the single parquet file defines positions
    file_order = [
        r.k
        for r in spark.read.parquet(data_path).select("k").collect()
    ]
    drop_pos = [2, 5]
    dropped_keys = {file_order[p] for p in drop_pos}

    del_dir = root / "deletes"
    spark.createDataFrame(
        [("file://" + data_path, p) for p in drop_pos], "file_path string, pos bigint"
    ).coalesce(1).write.parquet(str(del_dir))
    del_path = [
        str(del_dir / f) for f in os.listdir(del_dir) if f.endswith(".parquet")
    ][0]

    meta_dir = root / "metadata"
    os.makedirs(meta_dir)
    entry_schema = json.dumps(
        iceberg_meta._manifest_entry_schema([], "k bigint, s string")
    )

    def entry(path, content, n):
        return json.dumps(
            {
                "status": 1,
                "snapshot_id": {"long": 7},
                "sequence_number": {"long": 1},
                "file_sequence_number": {"long": 1},
                "data_file": {
                    "content": content,
                    "file_path": "file://" + path,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": None,
                },
            }
        )

    data_manifest = str(meta_dir / "m-data.avro")
    iceberg_meta.write_avro_file(
        spark, data_manifest, entry_schema, [entry(data_path, 0, 10)], {"content": "data"}
    )
    del_manifest = str(meta_dir / "m-del.avro")
    iceberg_meta.write_avro_file(
        spark, del_manifest, entry_schema, [entry(del_path, 1, 2)], {"content": "deletes"}
    )
    list_schema = json.dumps(iceberg_meta._manifest_list_schema())

    def list_rec(mpath, content):
        return json.dumps(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 7,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 10,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )

    mlist = str(meta_dir / "snap-7.avro")
    iceberg_meta.write_avro_file(
        spark,
        mlist,
        list_schema,
        [list_rec(data_manifest, 0), list_rec(del_manifest, 1)],
        {"format-version": "2"},
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000000d",
        "location": str(root),
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {"id": 2, "name": "s", "required": False, "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "current-snapshot-id": 7,
        "snapshots": [{"snapshot-id": 7, "timestamp-ms": 0, "manifest-list": mlist}],
    }
    with open(meta_dir / "v1.metadata.json", "w") as fh:
        json.dump(metadata, fh)

    got = iceberg_meta.scan_iceberg(spark, str(root))
    assert got.columns == ["k", "s"]
    keys = {r.k for r in got.collect()}
    assert keys == set(range(10)) - dropped_keys
    assert got.count() == 8


def test_export_refuses_reused_column_name(spark, tmp_path):
    """A physical column name reused across schema eras (rename frees a
    name later taken by a new column, or drop-then-re-add) cannot be
    represented in a name-mapping: spec-compliant readers would resolve
    the OLD physical column in pre-reuse files and resurrect stale data.
    Export must refuse loudly instead of diverging silently."""
    # rename-freed name reused by a new column
    t = LakeTable.create(spark, str(tmp_path / "reuse1"), "id bigint, s string")
    t.append(spark.createDataFrame([(1, "a")], "id bigint, s string"))
    t.rename_column("s", "label")
    t.add_column("s", "string")
    with pytest.raises(ValueError, match="name-mapping conflict"):
        t.export_iceberg()

    # drop-then-re-add under the same name
    t2 = LakeTable.create(spark, str(tmp_path / "reuse2"), "id bigint, s string")
    t2.append(spark.createDataFrame([(1, "a")], "id bigint, s string"))
    t2.drop_column("s")
    t2.add_column("s", "string")
    with pytest.raises(ValueError, match="dropped and later reused"):
        t2.export_iceberg()


def test_scan_field_id_file_beats_stale_name_mapping(spark, tmp_path):
    """Per the Iceberg spec, schema.name-mapping.default applies only to
    files WITHOUT parquet field ids. A file whose footer carries
    PARQUET:field_id metadata must resolve by id even when a stale
    mapping would resolve different (here: swapped) columns by name; a
    sibling file without ids still resolves through the mapping."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    root = tmp_path / "fid"
    data_dir = root / "data"
    os.makedirs(data_dir)

    # file1: physical names SWAPPED relative to logical, ids authoritative
    f1 = str(data_dir / "withids.parquet")
    sch1 = pa.schema(
        [
            pa.field("y", pa.string(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field("x", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    papq.write_table(
        pa.table({"y": ["id1-val"], "x": ["id2-val"]}, schema=sch1), f1
    )
    # file2: no ids; physical names match the mapping's names
    f2 = str(data_dir / "noids.parquet")
    papq.write_table(pa.table({"x": ["f2-id1"], "y": ["f2-id2"]}), f2)

    meta_dir = root / "metadata"
    os.makedirs(meta_dir)
    entry_schema = json.dumps(
        iceberg_meta._manifest_entry_schema([], "x string, y string")
    )
    entries = [
        json.dumps(
            {
                "status": 0,
                "snapshot_id": {"long": 7},
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(p),
                    "equality_ids": None,
                },
            }
        )
        for p in (f1, f2)
    ]
    manifest = str(meta_dir / "m1.avro")
    iceberg_meta.write_avro_file(spark, manifest, entry_schema, entries, {})
    metadata = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000002",
        "location": str(root),
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "x", "required": False, "type": "string"},
                {"id": 2, "name": "y", "required": False, "type": "string"},
            ],
        },
        "partition-spec": [],
        "properties": {
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["x"]},
                    {"field-id": 2, "names": ["y"]},
                ]
            )
        },
        "current-snapshot-id": 7,
        "snapshots": [{"snapshot-id": 7, "timestamp-ms": 0, "manifests": [manifest]}],
    }
    with open(meta_dir / "v1.metadata.json", "w") as fh:
        json.dump(metadata, fh)

    got = iceberg_meta.scan_iceberg(spark, str(root))
    assert got.columns == ["x", "y"]
    assert _rows(got) == [("f2-id1", "f2-id2"), ("id1-val", "id2-val")]


def test_scan_foreign_v2_with_equality_deletes(spark, tmp_path):
    """A foreign v2 table carrying equality delete files (the Flink CDC
    shape; reference parses equality_ids in read_manifest.c:305-306)
    scans with spec semantics: a delete at sequence number S removes
    null-safe-matching rows ONLY from data files with sequence < S."""
    root = tmp_path / "eqdel"
    os.makedirs(root / "data")

    def write_one(df, sub):
        d = root / "data" / sub
        df.coalesce(1).write.parquet(str(d))
        return next(
            str(d / f) for f in os.listdir(d) if f.endswith(".parquet")
        )

    # data file A at seq 1: keys 0-4 (key 3 has NULL s); data file B at
    # seq 3: keys 10-12 including s='x' rows the delete must NOT touch
    dfa = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "x"), (3, None), (4, "z")], "k bigint, s string"
    )
    dfb = spark.createDataFrame(
        [(10, "x"), (11, "y"), (12, None)], "k bigint, s string"
    )
    pa_ = write_one(dfa, "a")
    pb = write_one(dfb, "b")
    # equality delete at seq 2 on field id 2 (s): deletes s='x' and s NULL
    dd = spark.createDataFrame([("x",), (None,)], "s string")
    pd_ = write_one(dd, "d")

    meta_dir = root / "metadata"
    os.makedirs(meta_dir)
    entry_schema = json.dumps(
        iceberg_meta._manifest_entry_schema([], "k bigint, s string")
    )

    def entry(path, content, seq, eq_ids=None):
        return json.dumps(
            {
                "status": 1,
                "snapshot_id": {"long": 9},
                "sequence_number": {"long": seq},
                "file_sequence_number": {"long": seq},
                "data_file": {
                    "content": content,
                    "file_path": "file://" + path,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": {"array": eq_ids} if eq_ids else None,
                },
            }
        )

    data_manifest = str(meta_dir / "m-data.avro")
    iceberg_meta.write_avro_file(
        spark,
        data_manifest,
        entry_schema,
        [entry(pa_, 0, 1), entry(pb, 0, 3)],
        {"content": "data"},
    )
    del_manifest = str(meta_dir / "m-del.avro")
    iceberg_meta.write_avro_file(
        spark,
        del_manifest,
        entry_schema,
        [entry(pd_, 2, 2, eq_ids=[2])],
        {"content": "deletes"},
    )
    list_schema = json.dumps(iceberg_meta._manifest_list_schema())

    def list_rec(mpath, content):
        return json.dumps(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": 2,
                "min_sequence_number": 1,
                "added_snapshot_id": 9,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 1,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )

    mlist = str(meta_dir / "snap-9.avro")
    iceberg_meta.write_avro_file(
        spark,
        mlist,
        list_schema,
        [list_rec(data_manifest, 0), list_rec(del_manifest, 1)],
        {"format-version": "2"},
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000000e",
        "location": str(root),
        "last-sequence-number": 3,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {"id": 2, "name": "s", "required": False, "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "current-snapshot-id": 9,
        "snapshots": [{"snapshot-id": 9, "timestamp-ms": 0, "manifest-list": mlist}],
    }
    with open(meta_dir / "v1.metadata.json", "w") as fh:
        json.dump(metadata, fh)

    got = iceberg_meta.scan_iceberg(spark, str(root))
    assert got.columns == ["k", "s"]
    # seq-1 rows with s='x' (keys 0, 2) and s NULL (key 3) deleted;
    # seq-3 file untouched (delete seq 2 < 3): keys 10-12 all survive
    assert _rows(got) == [
        (1, "y"),
        (4, "z"),
        (10, "x"),
        (11, "y"),
        (12, None),
    ]


def test_scan_prunes_on_identity_partition(spark, tmp_path):
    """scan_iceberg prunes the file list on identity-partition conjuncts
    of the where predicate (manifest partition values, driver-side) —
    the foreign-snapshot analogue of PruneDataFiles."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "prune_exp"),
        "id bigint, cat string, val double",
        partition_by=["cat"],
    )
    t.append(
        spark.createDataFrame(
            [(i, "abc"[i % 3], float(i)) for i in range(30)],
            "id bigint, cat string, val double",
        )
    )
    t.export_iceberg()
    got = iceberg_meta.scan_iceberg(
        spark, t.location, where="cat = 'b' AND val >= 0"
    )
    files = [f for f in got.inputFiles() if f.endswith(".parquet")]
    assert files and all("cat=b" in f for f in files)
    assert _rows(got.select("id", "cat")) == [
        (i, "b") for i in range(30) if i % 3 == 1
    ]
    # non-partition predicate: unpruned but correct
    got2 = iceberg_meta.scan_iceberg(spark, t.location, where="id < 3")
    assert got2.count() == 3


def test_scan_as_of_timestamp(spark, small_table):
    """as_of_ms resolves the latest snapshot at or before the timestamp
    (snapshot-log semantics), matching LakeTable.scan's surface."""
    small_table.export_iceberg()
    snaps = small_table.metadata.snapshots
    t1, t2 = snaps[0].timestamp_ms, snaps[1].timestamp_ms
    if t2 > t1:  # same-millisecond appends make snapshot 1 unaddressable
        got1 = iceberg_meta.scan_iceberg(spark, small_table.location, as_of_ms=t1)
        assert got1.count() == 20
    got2 = iceberg_meta.scan_iceberg(spark, small_table.location, as_of_ms=t2 + 10)
    assert got2.count() == 30
    # before any snapshot → empty frame with the right schema
    got0 = iceberg_meta.scan_iceberg(spark, small_table.location, as_of_ms=t1 - 10)
    assert got0.count() == 0 and got0.columns == ["id", "name", "val"]
    with pytest.raises(ValueError, match="not both"):
        iceberg_meta.scan_iceberg(
            spark, small_table.location, snapshot_id=1, as_of_ms=t1
        )


def test_export_scan_roundtrip_random_histories(spark, tmp_path):
    """Model-based: random append/MoR-delete/rename/add-column histories
    must export and scan back exactly as the table reads itself (or
    refuse loudly for the documented non-representable cases)."""
    from hypothesis import given, settings, strategies as st

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(
        ops=st.lists(
            st.one_of(
                st.tuples(st.just("append"), st.integers(1, 3)),
                st.tuples(st.just("delete"), st.integers(0, 9)),
                st.tuples(st.just("rename"), st.just(0)),
                st.tuples(st.just("addcol"), st.just(0)),
            ),
            min_size=1,
            max_size=5,
        )
    )
    def run(ops):
        counter[0] += 1
        loc = str(tmp_path / f"rt{counter[0]}")
        t = LakeTable.create(spark, loc, "id bigint, v bigint")
        next_id = [0]
        renamed = [False]
        added = [False]

        for op, arg in ops:
            vcol = "w" if renamed[0] else "v"
            if op == "append":
                rows = [(next_id[0] + i, (next_id[0] + i) % 10) for i in range(arg)]
                next_id[0] += arg
                cols = f"id bigint, {vcol} bigint" + (", z string" if added[0] else "")
                if added[0]:
                    rows = [(*r, f"z{r[0]}") for r in rows]
                t.append(spark.createDataFrame(rows, cols))
            elif op == "delete":
                t.delete(f"{vcol} = {arg}", mode="mor")
            elif op == "rename" and not renamed[0]:
                t.rename_column("v", "w")
                renamed[0] = True
            elif op == "addcol" and not added[0]:
                t.add_column("z", "string")
                added[0] = True

        want = _rows(t.to_df())
        path = t.export_iceberg()
        got = _rows(iceberg_meta.scan_iceberg(spark, path))
        assert got == want

    run()


def test_foreign_scan_report_records_pruning(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "rep"), "id bigint, cat string", partition_by=["cat"]
    )
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2]) for i in range(20)], "id bigint, cat string"
        )
    )
    t.export_iceberg()
    iceberg_meta.scan_iceberg(spark, t.location, where="cat = 'a'").count()
    rep = iceberg_meta.last_scan_report
    assert rep["files_skipped"] >= 1
    assert rep["files_total"] == rep["files_scanned"] + rep["files_skipped"]


def _build_foreign_v2_eqdel(spark, root, *, entry_seqs, list_seqs, space_dir=False,
                            statuses=(1, 1, 1)):
    """Hand-build a foreign v2 table: data file A (keys 0-2, incl. s='x'),
    data file B (keys 10-11), equality delete on field id 2 (s='x').
    ``entry_seqs`` = (seqA, seqB, seqDel) written on the manifest ENTRIES
    (None → null, the real-writer inheritance shape); ``list_seqs`` =
    (data-manifest seq... , delete-manifest seq) on the manifest-LIST rows.
    Returns the table root path."""
    dname = "da ta" if space_dir else "data"
    os.makedirs(root / dname)

    def write_one(df, sub):
        d = root / dname / sub
        df.coalesce(1).write.parquet(str(d))
        return next(str(d / f) for f in os.listdir(d) if f.endswith(".parquet"))

    pa_ = write_one(
        spark.createDataFrame([(0, "x"), (1, "y"), (2, "x")], "k bigint, s string"), "a"
    )
    pb = write_one(
        spark.createDataFrame([(10, "x"), (11, "y")], "k bigint, s string"), "b"
    )
    pd_ = write_one(spark.createDataFrame([("x",)], "s string"), "d")

    meta_dir = root / "metadata"
    os.makedirs(meta_dir)
    entry_schema = json.dumps(
        iceberg_meta._manifest_entry_schema([], "k bigint, s string")
    )

    def entry(path, content, seq, status, eq_ids=None):
        return json.dumps(
            {
                "status": status,
                "snapshot_id": {"long": 9},
                "sequence_number": None if seq is None else {"long": seq},
                "file_sequence_number": None if seq is None else {"long": seq},
                "data_file": {
                    "content": content,
                    "file_path": "file://" + path,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": {"array": eq_ids} if eq_ids else None,
                },
            }
        )

    ma = str(meta_dir / "m-a.avro")
    iceberg_meta.write_avro_file(
        spark, ma, entry_schema, [entry(pa_, 0, entry_seqs[0], statuses[0])],
        {"content": "data"},
    )
    mb = str(meta_dir / "m-b.avro")
    iceberg_meta.write_avro_file(
        spark, mb, entry_schema, [entry(pb, 0, entry_seqs[1], statuses[1])],
        {"content": "data"},
    )
    md = str(meta_dir / "m-d.avro")
    iceberg_meta.write_avro_file(
        spark, md, entry_schema,
        [entry(pd_, 2, entry_seqs[2], statuses[2], eq_ids=[2])],
        {"content": "deletes"},
    )
    list_schema = json.dumps(iceberg_meta._manifest_list_schema())

    def list_rec(mpath, content, seq):
        return json.dumps(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": 9,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 1,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )

    mlist = str(meta_dir / "snap-9.avro")
    iceberg_meta.write_avro_file(
        spark, mlist, list_schema,
        [list_rec(ma, 0, list_seqs[0]), list_rec(mb, 0, list_seqs[1]),
         list_rec(md, 1, list_seqs[2])],
        {"format-version": "2"},
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000001e",
        "location": str(root),
        "last-sequence-number": max(list_seqs),
        "last-updated-ms": 0,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {"id": 2, "name": "s", "required": False, "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "current-snapshot-id": 9,
        "snapshots": [{"snapshot-id": 9, "timestamp-ms": 0, "manifest-list": mlist}],
    }
    with open(meta_dir / "v1.metadata.json", "w") as fh:
        json.dump(metadata, fh)
    return str(root)


def test_scan_inherits_null_entry_sequence_numbers(spark, tmp_path):
    """Real v2 writers (Spark, Flink CDC) leave sequence_number null on
    ADDED entries; the value inherits from the manifest-list row (spec
    'Sequence Number Inheritance'). Data A at list-seq 1 must be scoped
    by the delete at list-seq 2; data B at list-seq 3 must not."""
    loc = _build_foreign_v2_eqdel(
        spark, tmp_path / "inh",
        entry_seqs=(None, None, None), list_seqs=(1, 3, 2),
    )
    got = iceberg_meta.scan_iceberg(spark, loc)
    # A's s='x' rows (keys 0, 2) deleted; B untouched (3 >= 2)
    assert _rows(got) == [(1, "y"), (10, "x"), (11, "y")]


def test_scan_rejects_existing_entry_without_sequence(spark, tmp_path):
    """An EXISTING entry must carry its original explicit seq (it cannot
    inherit the new manifest-list seq) — a null there is a spec
    violation and must fail loudly, not default to 0."""
    loc = _build_foreign_v2_eqdel(
        spark, tmp_path / "exst",
        entry_seqs=(None, None, None), list_seqs=(1, 3, 2),
        statuses=(0, 1, 1),  # A is EXISTING with null seq
    )
    with pytest.raises(ValueError, match="EXISTING entry"):
        iceberg_meta.scan_iceberg(spark, loc)


def test_equality_deletes_on_path_with_space(spark, tmp_path):
    """_metadata.file_path is Hadoop-URI-encoded (space → %20); the
    data-seq broadcast map must use the same encoding or the inner join
    silently drops every row of files under such paths."""
    loc = _build_foreign_v2_eqdel(
        spark, tmp_path / "sp",
        entry_seqs=(1, 3, 2), list_seqs=(1, 3, 2), space_dir=True,
    )
    got = iceberg_meta.scan_iceberg(spark, loc)
    assert _rows(got) == [(1, "y"), (10, "x"), (11, "y")]


def test_inspection_functions(spark, small_table):
    """lake_iceberg.metadata/files parity (iceberg-tables.md:601-656):
    raw metadata document + one row per live manifest entry, metadata-
    only (no data file opened)."""
    meta_path = small_table.export_iceberg()
    meta = iceberg_meta.iceberg_metadata(meta_path)
    assert meta["format-version"] == 2
    cur = meta["current-snapshot-id"]
    assert any(s["snapshot-id"] == cur for s in meta["snapshots"])

    files = iceberg_meta.iceberg_files(spark, meta_path)
    assert files.columns == [
        "manifest_path", "content", "file_path", "file_format", "spec_id",
        "record_count", "file_size_in_bytes", "sequence_number", "partition",
    ]
    rows = files.collect()
    assert rows and all(r.content == 0 for r in rows)
    assert sum(r.record_count for r in rows) == 30
    assert all(r.file_format == "PARQUET" and r.file_size_in_bytes > 0 for r in rows)

    snaps = iceberg_meta.iceberg_snapshots(spark, meta_path)
    assert snaps.count() == len(meta["snapshots"])


def test_export_declares_sort_order(spark, tmp_path):
    """A sort-clustered table exports a real Iceberg sort order (spec
    'Sort Orders'): order 1 with identity/asc fields on the cluster key,
    default-sort-order-id pointing at it; an unclustered table keeps the
    spec-required unsorted order 0."""
    from pg_lake_spark.lakehouse import maintenance

    loc = str(tmp_path / "sorted_exp")
    t = LakeTable.create_from_dataframe(
        spark,
        loc,
        spark.createDataFrame([(i, float(i)) for i in range(100)], "k bigint, v double"),
    )
    meta0 = json.load(open(t.export_iceberg()))
    assert meta0["default-sort-order-id"] == 0
    assert meta0["sort-orders"] == [{"order-id": 0, "fields": []}]

    maintenance.rewrite_sorted(t, ["k"], n_files=2)
    meta1 = json.load(open(t.export_iceberg()))
    assert meta1["default-sort-order-id"] == 1
    assert meta1["sort-orders"][1]["fields"] == [
        {"transform": "identity", "source-id": 1, "direction": "asc",
         "null-order": "nulls-first"}
    ]
    # the exported table still scans correctly through the spec reader
    got = iceberg_meta.scan_iceberg(spark, loc)
    assert got.count() == 100


# ---------------------------------------------------------------------------
# r13 iceberg_meta review fixes
# ---------------------------------------------------------------------------

def test_export_identity_int_partition(spark, tmp_path):
    """Avro union-branch alignment: an identity partition on an INT
    column declares Avro 'int' — the manifest entry must emit the same
    branch label, not {'long': …} (JsonDecoder hard-rejects the
    mismatch and the whole export used to crash)."""
    t = LakeTable.create(
        spark, str(tmp_path / "ip"), "id bigint, grp int, v double",
        partition_by=["grp"],
    )
    t.append(
        spark.createDataFrame(
            [(1, 1, 1.0), (2, 2, 2.0), (3, 1, 3.0)], "id bigint, grp int, v double"
        )
    )
    path = t.export_iceberg()
    got = iceberg_meta.scan_iceberg(spark, path)
    assert sorted((r.id, r.grp) for r in got.collect()) == [(1, 1), (2, 2), (3, 1)]


def test_export_identity_date_and_bool_partition(spark, tmp_path):
    """date identity partitions carry the Avro date logical type (int
    days); boolean identity partitions carry Avro boolean."""
    t = LakeTable.create(
        spark, str(tmp_path / "dp"), "id bigint, d date, flag boolean",
        partition_by=["d", "flag"],
    )
    t.append(
        spark.sql(
            "SELECT id, DATE'2024-01-01' + CAST(id % 2 AS INT) AS d, "
            "id % 2 = 0 AS flag FROM range(4)"
        )
    )
    path = t.export_iceberg()
    got = iceberg_meta.scan_iceberg(spark, path)
    assert got.count() == 4
    # the manifest really carries typed values (inspection view)
    files = iceberg_meta.iceberg_files(spark, str(t.location)).collect()
    parts = [json.loads(r.partition) for r in files if r.content == 0]
    assert all(isinstance(p.get("d"), int) for p in parts)  # days since epoch


def test_export_partitioned_mor_delete_under_unpartitioned_spec(spark, tmp_path):
    """Spec-global position deletes export under their own UNPARTITIONED
    spec (spec-id 1): Java readers index deletes by (spec, partition),
    so all-null values under the partitioned spec would match nothing
    and silently skip the deletes."""
    t = LakeTable.create(
        spark, str(tmp_path / "pd"), "id bigint, grp int", partition_by=["grp"]
    )
    t.append(
        spark.createDataFrame([(i, i % 2) for i in range(10)], "id bigint, grp int")
    )
    t.delete("id >= 8", mode="mor")
    path = t.export_iceberg()
    meta = json.load(open(path))
    specs = {s["spec-id"]: s["fields"] for s in meta["partition-specs"]}
    assert specs[1] == [] and specs[0] != []
    got = iceberg_meta.scan_iceberg(spark, path)
    assert sorted(r.id for r in got.collect()) == list(range(8))
    files = iceberg_meta.iceberg_files(spark, str(t.location)).collect()
    del_rows = [r for r in files if r.content == 1]
    assert del_rows and all(r.spec_id == 1 for r in del_rows)
    assert all(json.loads(r.partition) == {} for r in del_rows)


def test_scan_without_mapping_resolves_by_field_id(spark, tmp_path):
    """A foreign table with NO name-mapping property still resolves
    files by PARQUET field id (real Iceberg writers never write the
    property): a pre-rename file physically storing the old name must
    return its values, not silent NULLs."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    root = tmp_path / "nomap"
    data_dir = root / "data"
    os.makedirs(data_dir)
    # file written before a rename a→b: physical 'a', field id 1
    f1 = str(data_dir / "prerename.parquet")
    sch = pa.schema([pa.field("a", pa.string(), metadata={b"PARQUET:field_id": b"1"})])
    papq.write_table(pa.table({"a": ["kept"]}, schema=sch), f1)

    meta_dir = root / "metadata"
    os.makedirs(meta_dir)
    entry_schema = json.dumps(iceberg_meta._manifest_entry_schema([], "b string"))
    entries = [json.dumps({
        "status": 0, "snapshot_id": {"long": 7}, "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {
            "content": 0, "file_path": f1, "file_format": "PARQUET",
            "partition": {}, "record_count": 1,
            "file_size_in_bytes": os.path.getsize(f1), "equality_ids": None,
        },
    })]
    manifest = str(meta_dir / "m1.avro")
    iceberg_meta.write_avro_file(spark, manifest, entry_schema, entries, {})
    metadata = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000009",
        "location": str(root), "last-updated-ms": 0, "last-column-id": 1,
        "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "b", "required": False, "type": "string"},
        ]},
        "partition-spec": [], "properties": {},
        "current-snapshot-id": 7,
        "snapshots": [{"snapshot-id": 7, "timestamp-ms": 0, "manifests": [manifest]}],
    }
    with open(meta_dir / "v1.metadata.json", "w") as fh:
        json.dump(metadata, fh)
    got = iceberg_meta.scan_iceberg(spark, str(root))
    assert _rows(got) == [("kept",)], "field-id resolution ignored without mapping"


def test_name_mapping_covers_nested_fields(spark, tmp_path):
    """Exported parquet carries no field ids, so the name-mapping must
    map nested struct members / list elements / map keys+values too —
    otherwise external readers project nested content as NULL."""
    t = LakeTable.create(
        spark, str(tmp_path / "nested"),
        "id bigint, s struct<a:int, b:string>, xs array<int>, m map<string,int>",
    )
    path = t.export_iceberg()
    meta = json.load(open(path))
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    by_name = {m["names"][0]: m for m in nm}
    s_fields = {f["names"][0] for f in by_name["s"]["fields"]}
    assert s_fields == {"a", "b"}
    assert [f["names"] for f in by_name["xs"]["fields"]] == [["element"]]
    assert {f["names"][0] for f in by_name["m"]["fields"]} == {"key", "value"}
    assert all("field-id" in f for f in by_name["s"]["fields"])


def test_foreign_schema_with_space_in_column_name(spark, tmp_path):
    """Iceberg permits identifiers that break unquoted Spark DDL
    ('first name'): the schema builders must backtick-quote."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    root = tmp_path / "spacename"
    data_dir = root / "data"
    os.makedirs(data_dir)
    f1 = str(data_dir / "d.parquet")
    papq.write_table(pa.table({"first name": ["ada"]}), f1)
    meta_dir = root / "metadata"
    os.makedirs(meta_dir)
    entry_schema = json.dumps(
        iceberg_meta._manifest_entry_schema([], "`first name` string")
    )
    entries = [json.dumps({
        "status": 0, "snapshot_id": {"long": 1}, "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {
            "content": 0, "file_path": f1, "file_format": "PARQUET",
            "partition": {}, "record_count": 1,
            "file_size_in_bytes": os.path.getsize(f1), "equality_ids": None,
        },
    })]
    manifest = str(meta_dir / "m1.avro")
    iceberg_meta.write_avro_file(spark, manifest, entry_schema, entries, {})
    metadata = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-00000000000a",
        "location": str(root), "last-updated-ms": 0, "last-column-id": 1,
        "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "first name", "required": False, "type": "string"},
        ]},
        "partition-spec": [], "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0, "manifests": [manifest]}],
    }
    with open(meta_dir / "v1.metadata.json", "w") as fh:
        json.dump(metadata, fh)
    got = iceberg_meta.scan_iceberg(spark, str(root))
    assert got.columns == ["first name"]
    assert _rows(got) == [("ada",)]


def test_scan_file_with_foreign_field_ids_reads_null(spark, tmp_path):
    """A live file whose field ids intersect NO current-schema id (and
    whose names miss the mapping) still contributes its ROWS — as all
    NULLs — instead of crashing the scan on an empty read schema."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    root = tmp_path / "ghostids"
    data_dir = root / "data"
    os.makedirs(data_dir)
    f1 = str(data_dir / "ghost.parquet")
    sch = pa.schema([pa.field("zz", pa.string(), metadata={b"PARQUET:field_id": b"99"})])
    papq.write_table(pa.table({"zz": ["g1"], }, schema=sch), f1)
    meta_dir = root / "metadata"
    os.makedirs(meta_dir)
    entry_schema = json.dumps(iceberg_meta._manifest_entry_schema([], "b string"))
    entries = [json.dumps({
        "status": 0, "snapshot_id": {"long": 1}, "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {
            "content": 0, "file_path": f1, "file_format": "PARQUET",
            "partition": {}, "record_count": 1,
            "file_size_in_bytes": os.path.getsize(f1), "equality_ids": None,
        },
    })]
    manifest = str(meta_dir / "m1.avro")
    iceberg_meta.write_avro_file(spark, manifest, entry_schema, entries, {})
    metadata = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-00000000000b",
        "location": str(root), "last-updated-ms": 0, "last-column-id": 1,
        "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "b", "required": False, "type": "string"},
        ]},
        "partition-spec": [], "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0, "manifests": [manifest]}],
    }
    with open(meta_dir / "v1.metadata.json", "w") as fh:
        json.dump(metadata, fh)
    got = iceberg_meta.scan_iceberg(spark, str(root))
    assert _rows(got) == [(None,)]
