"""Delta Lake scan tests: log replay, partition recovery, time travel,
checkpoints, hand-written foreign logs, and loud unsupported-feature
failures.

Reference parity target: docs/file-formats-reference.md:34-37 — Delta
read-only support resolving the transaction log to a parquet file list.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pg_lake_spark.lakehouse.delta_meta import (
    append_delta,
    remove_delta_files,
    scan_delta,
    write_delta_checkpoint,
    write_delta_table,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def delta_table(spark, tmp_path):
    """Partitioned table with three commits: create, append, remove."""
    loc = str(tmp_path / "dl")
    df1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "k bigint, p string, v double"
    )
    write_delta_table(spark, loc, df1, partition_by=["p"])
    df2 = spark.createDataFrame(
        [(4, "b", 40.0), (5, "c", 50.0)], "k bigint, p string, v double"
    )
    append_delta(spark, loc, df2)
    n = remove_delta_files(loc, lambda pv: pv.get("p") == "a")
    assert n >= 1
    return loc


def test_scan_replays_adds_and_removes(spark, delta_table):
    got = scan_delta(spark, delta_table)
    assert got.columns == ["k", "p", "v"]  # schema order incl. partition col
    assert dict(got.dtypes)["p"] == "string"
    assert _rows(got.select("k", "p", "v")) == [
        (3, "b", 30.0),
        (4, "b", 40.0),
        (5, "c", 50.0),
    ]


def test_time_travel(spark, delta_table):
    v0 = scan_delta(spark, delta_table, version=0)
    assert _rows(v0.select("k")) == [(1,), (2,), (3,)]
    v1 = scan_delta(spark, delta_table, version=1)
    assert _rows(v1.select("k")) == [(1,), (2,), (3,), (4,), (5,)]
    with pytest.raises(ValueError, match="log ends at"):
        scan_delta(spark, delta_table, version=9)


def test_partition_filter_prunes_file_list(spark, delta_table):
    got = scan_delta(spark, delta_table, partition_filter=lambda pv: pv["p"] == "c")
    assert _rows(got.select("k", "p")) == [(5, "c")]
    # pruning happens before the scan: only 'c' files are inputs
    files = [f for f in got.inputFiles() if f.endswith(".parquet")]
    assert files and all("p=c" in f for f in files)


def test_where_pushdown(spark, delta_table):
    got = scan_delta(spark, delta_table, where="k >= 4")
    assert _rows(got.select("k")) == [(4,), (5,)]


def test_checkpoint_seeds_replay(spark, delta_table):
    write_delta_checkpoint(spark, delta_table)
    log_dir = os.path.join(delta_table, "_delta_log")
    assert os.path.exists(os.path.join(log_dir, "_last_checkpoint"))
    before = _rows(scan_delta(spark, delta_table).select("k", "p", "v"))
    # drop all JSON commits: replay must seed purely from the checkpoint
    for n in os.listdir(log_dir):
        if n.endswith(".json") and not n.startswith("_"):
            os.remove(os.path.join(log_dir, n))
    append_delta(
        spark,
        delta_table,
        spark.createDataFrame([(6, "d", 60.0)], "k bigint, p string, v double"),
    )
    got = _rows(scan_delta(spark, delta_table).select("k", "p", "v"))
    assert got == before + [(6, "d", 60.0)]
    # but time travel past the vacuumed tail fails loudly
    with pytest.raises(FileNotFoundError, match="missing Delta commits"):
        scan_delta(spark, delta_table, version=1)


def test_unpartitioned_roundtrip(spark, tmp_path):
    loc = str(tmp_path / "flat")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    write_delta_table(spark, loc, df)
    got = scan_delta(spark, loc)
    assert got.count() == 100
    assert _rows(got.filter("k < 3")) == [(0, 0.0), (1, 2.0), (2, 4.0)]


def test_url_encoded_partition_value(spark, tmp_path):
    loc = str(tmp_path / "enc")
    df = spark.createDataFrame(
        [(1, "has space"), (2, "plain")], "k bigint, p string"
    )
    write_delta_table(spark, loc, df, partition_by=["p"])
    got = scan_delta(spark, loc)
    assert _rows(got) == [(1, "has space"), (2, "plain")]


def test_typed_partition_column(spark, tmp_path):
    """Partition values are strings in the log; the scan casts them back
    to the schema type."""
    loc = str(tmp_path / "typed")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k bigint, bucket int")
    write_delta_table(spark, loc, df, partition_by=["bucket"])
    got = scan_delta(spark, loc)
    assert dict(got.dtypes)["bucket"] == "int"
    assert _rows(got) == [(1, 10), (2, 20)]


def test_scan_foreign_handwritten_log(spark, tmp_path):
    """A log written by hand (absolute file paths, single commit, extra
    commitInfo noise) — the shape another writer would produce."""
    root = tmp_path / "foreign"
    data_dir = root / "data"
    df = spark.createDataFrame([(i, f"s{i}") for i in range(6)], "k bigint, s string")
    df.coalesce(1).write.parquet(str(data_dir))
    pq = [str(data_dir / f) for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert len(pq) == 1
    log_dir = root / "_delta_log"
    os.makedirs(log_dir)
    actions = [
        {"commitInfo": {"operation": "WRITE", "engineInfo": "handwritten"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "0000-foreign",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": [],
                "configuration": {},
            }
        },
        {
            "add": {
                "path": "file://" + pq[0],
                "partitionValues": {},
                "size": os.path.getsize(pq[0]),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(log_dir / f"{0:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    got = scan_delta(spark, str(root))
    assert _rows(got) == _rows(df)


def test_unsupported_features_fail_loudly(spark, tmp_path):
    loc = str(tmp_path / "unsup")
    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    write_delta_table(spark, loc, df)
    log_dir = os.path.join(loc, "_delta_log")

    # unknown column-mapping mode still refuses loudly ("name"/"id" are
    # supported — see test_column_mapping_name_mode_scan)
    with open(os.path.join(log_dir, f"{0:020d}.json")) as fh:
        lines = [json.loads(ln) for ln in fh if ln.strip()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"] = {"delta.columnMapping.mode": "weird"}
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        for a in lines:
            if "metaData" in a:
                fh.write(json.dumps(a) + "\n")
    with pytest.raises(NotImplementedError, match="column mapping"):
        scan_delta(spark, loc)
    os.remove(os.path.join(log_dir, f"{1:020d}.json"))

    # reader features beyond our surface
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="reader features"):
        scan_delta(spark, loc)


def test_register_delta_table_facade(spark, tmp_path):
    from pg_lake_spark.session import LakeSession

    loc = str(tmp_path / "facade")
    write_delta_table(
        spark,
        loc,
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string"),
    )
    sess = LakeSession(spark)
    sess.register_delta_table("ext_delta", loc)
    rows = sess.sql("SELECT count(*) AS n, max(s) AS m FROM ext_delta").collect()
    assert rows[0].n == 2 and rows[0].m == "b"


def test_where_prunes_partition_files(spark, delta_table):
    """A mixed predicate prunes the file list on its partition-column
    conjunct (driver-side, before the scan) and still applies fully
    row-wise; data-column conjuncts degrade gracefully to no pruning."""
    got = scan_delta(spark, delta_table, where="v > 0 AND p = 'b'")
    files = [f for f in got.inputFiles() if f.endswith(".parquet")]
    assert files and all("p=b" in f for f in files)
    assert _rows(got.select("k", "p")) == [(3, "b"), (4, "b")]

    # IN-list conjunct prunes too
    got2 = scan_delta(spark, delta_table, where="p IN ('c')")
    files2 = [f for f in got2.inputFiles() if f.endswith(".parquet")]
    assert files2 and all("p=c" in f for f in files2)
    assert _rows(got2.select("k")) == [(5,)]

    # data-column-only predicate: no pruning, correct result
    got3 = scan_delta(spark, delta_table, where="k >= 4")
    assert _rows(got3.select("k")) == [(4,), (5,)]


def test_multipart_checkpoint(spark, delta_table):
    """Multi-part checkpoints (V.checkpoint.<i>.<n>.parquet) replay like
    classic ones; an incomplete part set is ignored."""
    import pyarrow.parquet as papq

    write_delta_checkpoint(spark, delta_table)
    log_dir = os.path.join(delta_table, "_delta_log")
    classic = next(
        os.path.join(log_dir, n)
        for n in os.listdir(log_dir)
        if n.endswith(".checkpoint.parquet")
    )
    version = int(os.path.basename(classic)[:20])
    t = papq.read_table(classic)
    mid = max(1, t.num_rows // 2)
    papq.write_table(
        t.slice(0, mid),
        os.path.join(log_dir, f"{version:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
    )
    papq.write_table(
        t.slice(mid),
        os.path.join(log_dir, f"{version:020d}.checkpoint.{2:010d}.{2:010d}.parquet"),
    )
    before = _rows(scan_delta(spark, delta_table).select("k", "p", "v"))
    os.remove(classic)
    for n in os.listdir(log_dir):
        if n.endswith(".json") and not n.startswith("_"):
            os.remove(os.path.join(log_dir, n))
    assert _rows(scan_delta(spark, delta_table).select("k", "p", "v")) == before

    # drop one part: the checkpoint is unusable and replay fails loudly
    os.remove(
        os.path.join(log_dir, f"{version:020d}.checkpoint.{2:010d}.{2:010d}.parquet")
    )
    with pytest.raises(FileNotFoundError):
        scan_delta(spark, delta_table)


def test_timestamp_time_travel(spark, tmp_path):
    """timestamp_ms resolves the version current at that time, from
    commitInfo timestamps (file-mtime fallback per Delta convention)."""
    from pg_lake_spark.lakehouse.delta_meta import version_at_timestamp

    loc = str(tmp_path / "ts")
    write_delta_table(
        spark, loc, spark.createDataFrame([(1,)], "k bigint")
    )
    append_delta(spark, loc, spark.createDataFrame([(2,)], "k bigint"))
    append_delta(spark, loc, spark.createDataFrame([(3,)], "k bigint"))
    # rewrite commitInfo timestamps to known values 1000/2000/3000
    log_dir = os.path.join(loc, "_delta_log")
    for v, ts in [(0, 1000), (1, 2000), (2, 3000)]:
        p = os.path.join(log_dir, f"{v:020d}.json")
        lines = [json.loads(ln) for ln in open(p) if ln.strip()]
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        with open(p, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")

    assert version_at_timestamp(loc, 1000) == 0
    assert version_at_timestamp(loc, 2500) == 1
    assert version_at_timestamp(loc, 99999) == 2
    with pytest.raises(ValueError, match="no Delta commit"):
        version_at_timestamp(loc, 500)
    got = scan_delta(spark, loc, timestamp_ms=2500)
    assert _rows(got) == [(1,), (2,)]
    with pytest.raises(ValueError, match="not both"):
        scan_delta(spark, loc, version=1, timestamp_ms=2500)


def test_replay_model_random_histories(spark, tmp_path):
    """Model-based check: for random create/append/remove/checkpoint
    histories, the replayed scan equals a dict model of the active rows
    at every version (hypothesis drives the histories; one Spark table
    per example keeps it fast)."""
    from hypothesis import given, settings, strategies as st

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(
        ops=st.lists(
            st.one_of(
                st.tuples(st.just("append"), st.sampled_from(["a", "b", "c"]),
                          st.integers(min_value=1, max_value=3)),
                st.tuples(st.just("remove"), st.sampled_from(["a", "b", "c"]),
                          st.just(0)),
                st.tuples(st.just("checkpoint"), st.just(""), st.just(0)),
            ),
            min_size=1,
            max_size=6,
        )
    )
    def run(ops):
        counter[0] += 1
        loc = str(tmp_path / f"model{counter[0]}")
        next_k = [0]
        model: dict[str, list[int]] = {}  # partition -> list of k values

        def mk(p, n):
            ks = list(range(next_k[0], next_k[0] + n))
            next_k[0] += n
            return ks, spark.createDataFrame(
                [(k, p) for k in ks], "k bigint, p string"
            )

        created = False
        for op, p, n in ops:
            if not created:
                ks, df = mk(p if op == "append" else "a", max(n, 1))
                write_delta_table(spark, loc, df, partition_by=["p"])
                model.setdefault(p if op == "append" else "a", []).extend(ks)
                created = True
                continue
            if op == "append":
                ks, df = mk(p, n)
                append_delta(spark, loc, df)
                model.setdefault(p, []).extend(ks)
            elif op == "remove":
                remove_delta_files(loc, lambda pv, p=p: pv.get("p") == p)
                model.pop(p, None)
            else:
                write_delta_checkpoint(spark, loc)
        want = sorted((k, p) for p, ks in model.items() for k in ks)
        got = _rows(scan_delta(spark, loc).select("k", "p"))
        assert got == want

    run()


def test_scan_report_records_pruning(spark, delta_table):
    from pg_lake_spark.lakehouse import delta_meta

    scan_delta(spark, delta_table, where="p = 'c'").count()
    rep = delta_meta.last_scan_report
    assert rep["files_total"] >= 2
    assert rep["files_scanned"] >= 1
    assert rep["files_skipped"] >= 1
    assert rep["files_total"] == rep["files_scanned"] + rep["files_skipped"]


def test_commit_put_if_absent(spark, tmp_path):
    """Delta's protocol requires atomic create-if-absent on commit files:
    two writers racing to the same version must see exactly one win, not
    a silent overwrite (delta_meta._write_commit uses os.link, which
    fails with EEXIST where os.rename would clobber)."""
    from pg_lake_spark.lakehouse import delta_meta

    loc = str(tmp_path / "race")
    df = spark.range(5).withColumnRenamed("id", "k")
    write_delta_table(spark, loc, df)
    v_path = os.path.join(loc, "_delta_log", f"{1:020d}.json")
    delta_meta._write_commit(loc, 1, [{"commitInfo": {"timestamp": 1}}])
    before = open(v_path).read()
    with pytest.raises(delta_meta.ConcurrentDeltaCommitError, match="version 1"):
        delta_meta._write_commit(loc, 1, [{"commitInfo": {"timestamp": 2}}])
    assert open(v_path).read() == before  # winner untouched
    # loser's tmp file cleaned up
    assert not [n for n in os.listdir(os.path.join(loc, "_delta_log")) if ".tmp-" in n]


def _write_column_mapped_log(spark, loc, *, mode="name", partitioned=True):
    """Hand-written column-mapped Delta table: logical columns (k, s,
    part) stored under physical names col-aaa/col-bbb/col-ccc, add
    actions keyed by physical partition names — the exact shape
    delta-spark writes with delta.columnMapping.mode=name."""
    os.makedirs(os.path.join(loc, "_delta_log"))
    pdf = spark.createDataFrame(
        [(1, "x"), (2, "y")], "`col-aaa` bigint, `col-bbb` string"
    )
    d = os.path.join(loc, "d1")
    pdf.coalesce(1).write.parquet(d)
    f1 = next(n for n in os.listdir(d) if n.endswith(".parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "k",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaa",
                },
            },
            {
                "name": "s",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-bbb",
                },
            },
        ]
        + (
            [
                {
                    "name": "part",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 3,
                        "delta.columnMapping.physicalName": "col-ccc",
                    },
                }
            ]
            if partitioned
            else []
        ),
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "cm-test",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["part"] if partitioned else [],
                "configuration": {
                    "delta.columnMapping.mode": mode,
                    "delta.columnMapping.maxColumnId": "3",
                },
            }
        },
        {
            "add": {
                "path": f"d1/{f1}",
                "partitionValues": {"col-ccc": "p0"} if partitioned else {},
                "size": os.path.getsize(os.path.join(d, f1)),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(loc, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


@pytest.mark.parametrize("mode", ["name", "id"])
def test_column_mapping_scan(spark, tmp_path, mode):
    """delta.columnMapping (name and id modes): data lives under
    physical col-<uuid> names, partitionValues are keyed by physical
    names — the scan must surface logical names and typed values."""
    loc = str(tmp_path / f"cmap_{mode}")
    _write_column_mapped_log(spark, loc, mode=mode)
    got = scan_delta(spark, loc)
    assert got.columns == ["k", "s", "part"]
    rows = sorted(tuple(r) for r in got.collect())
    assert rows == [(1, "x", "p0"), (2, "y", "p0")]
    # partition pruning still works on the logical name
    assert scan_delta(spark, loc, where="part = 'nope'").count() == 0
    assert scan_delta(spark, loc, where="part = 'p0' AND k = 2").count() == 1


def test_column_mapping_unpartitioned(spark, tmp_path):
    loc = str(tmp_path / "cmap_unpart")
    _write_column_mapped_log(spark, loc, partitioned=False)
    got = scan_delta(spark, loc)
    assert got.columns == ["k", "s"]
    assert sorted(tuple(r) for r in got.collect()) == [(1, "x"), (2, "y")]


def test_append_delta_txn_idempotent(spark, tmp_path):
    """Protocol txn actions give exactly-once appends: a replayed
    (appId, version) is skipped, distinct apps don't interfere, and the
    high-water survives checkpoint-seeded replay."""
    from pg_lake_spark.lakehouse.delta_meta import append_delta_txn

    loc = str(tmp_path / "txn_t")
    write_delta_table(spark, loc, spark.createDataFrame([(0,)], "k bigint"))

    df1 = spark.createDataFrame([(1,), (2,)], "k bigint")
    assert append_delta_txn(spark, loc, df1, "appA", 0) is True
    assert append_delta_txn(spark, loc, df1, "appA", 0) is False  # replay skipped
    assert scan_delta(spark, loc).count() == 3
    assert append_delta_txn(spark, loc, df1, "appB", 0) is True  # other app
    assert append_delta_txn(spark, loc, df1, "appA", 1) is True
    assert scan_delta(spark, loc).count() == 7

    # txn state persists through a checkpoint (commits then deleted)
    write_delta_checkpoint(spark, loc)
    log_dir = os.path.join(loc, "_delta_log")
    for n in os.listdir(log_dir):
        if n.endswith(".json") and not n.startswith("_"):
            os.remove(os.path.join(log_dir, n))
    assert append_delta_txn(spark, loc, df1, "appA", 1) is False  # still known
    assert append_delta_txn(spark, loc, df1, "appA", 2) is True
    assert scan_delta(spark, loc).count() == 9


def test_stream_ingest_to_delta_exactly_once(spark, tmp_path):
    """End-to-end: rate-limited file stream → Delta, restart from the
    same checkpoint appends nothing new."""
    import json as _json

    from pg_lake_spark.streaming.ingest import stream_ingest_to_delta

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i in range(3):
        (src_dir / f"{i}.json").write_text(
            "\n".join(_json.dumps({"k": i * 10 + j}) for j in range(5)) + "\n"
        )
    loc = str(tmp_path / "delta_sink")
    write_delta_table(
        spark, loc, spark.createDataFrame([], "k bigint")
    )
    stream = spark.readStream.schema("k bigint").json(str(src_dir))
    ckpt = str(tmp_path / "ck")
    q = stream_ingest_to_delta(stream, loc, ckpt)
    q.awaitTermination(120)
    assert scan_delta(spark, loc).count() == 15
    # restart: no new source data, no duplicate rows
    q2 = stream_ingest_to_delta(
        spark.readStream.schema("k bigint").json(str(src_dir)), loc, ckpt
    )
    q2.awaitTermination(120)
    assert scan_delta(spark, loc).count() == 15


# --- deletion vectors -------------------------------------------------------


def _write_parquet_file(spark, path, rows, schema):
    import pyarrow as pa
    import pyarrow.parquet as papq

    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    table = pa.table({name: list(c) for (name, _), c in zip(schema, cols)})
    papq.write_table(table, path)


def _dv_log(root, schema_json, adds, partition_cols=()):
    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "dv-test",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": list(partition_cols),
                "configuration": {},
            }
        },
        *adds,
    ]
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _make_dv_file(root, positions):
    """Write a protocol-shaped DV .bin (version byte, [size][data][crc])
    and return the descriptor fields."""
    import struct
    import uuid as _uuid
    import zlib

    from pg_lake_spark.lakehouse import delta_meta as dm

    data = dm._encode_dv_data(positions)
    u = _uuid.uuid4()
    blob = b"\x01" + struct.pack(">I", len(data)) + data + struct.pack(
        ">I", zlib.crc32(data)
    )
    with open(os.path.join(root, f"deletion_vector_{u}.bin"), "wb") as f:
        f.write(blob)
    return {
        "storageType": "u",
        "pathOrInlineDv": dm._z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


def test_deletion_vector_file_scan(spark, tmp_path):
    """storageType 'u': rows at the DV's positions disappear from the
    scan (Delta protocol 'Deletion Vectors'; z85 uuid + roaring decode)."""
    root = str(tmp_path / "dvu")
    os.makedirs(root)
    pq_path = os.path.join(root, "part-0.parquet")
    schema = [("k", "long"), ("s", "string")]
    _write_parquet_file(spark, pq_path, [(i, f"s{i}") for i in range(10)], schema)
    dv = _make_dv_file(root, [1, 3, 5])
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "s", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _dv_log(
        root,
        schema_json,
        [
            {
                "add": {
                    "path": "part-0.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(pq_path),
                    "modificationTime": 0,
                    "dataChange": True,
                    "deletionVector": dv,
                }
            }
        ],
    )
    got = scan_delta(spark, root)
    assert _rows(got.select("k")) == [(0,), (2,), (4,), (6,), (7,), (8,), (9,)]


def test_deletion_vector_inline_scan(spark, tmp_path):
    """storageType 'i': the bitmap rides z85-encoded in the log itself."""
    from pg_lake_spark.lakehouse import delta_meta as dm

    root = str(tmp_path / "dvi")
    os.makedirs(root)
    pq_path = os.path.join(root, "part-0.parquet")
    _write_parquet_file(spark, pq_path, [(i, f"s{i}") for i in range(6)], [("k", "long"), ("s", "string")])
    data = dm._encode_dv_data([0, 5])
    data += b"\x00" * (-len(data) % 4)  # z85 needs 4-byte alignment
    dv = {
        "storageType": "i",
        "pathOrInlineDv": dm._z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": 2,
    }
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "s", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _dv_log(root, schema_json, [{
        "add": {
            "path": "part-0.parquet", "partitionValues": {},
            "size": os.path.getsize(pq_path), "modificationTime": 0,
            "dataChange": True, "deletionVector": dv,
        }
    }])
    got = scan_delta(spark, root)
    assert _rows(got.select("k")) == [(1,), (2,), (3,), (4,)]


def test_deletion_vector_partitioned_mixed(spark, tmp_path):
    """Two partition files, one with a DV, one without: partition-value
    recovery (broadcast map) and the DV anti-join compose."""
    root = str(tmp_path / "dvp")
    os.makedirs(root)
    f_a = os.path.join(root, "a.parquet")
    f_b = os.path.join(root, "b.parquet")
    _write_parquet_file(spark, f_a, [(i,) for i in range(5)], [("k", "long")])
    _write_parquet_file(spark, f_b, [(i,) for i in range(5, 10)], [("k", "long")])
    dv = _make_dv_file(root, [0, 4])  # kills k=0 and k=4 in partition a
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _dv_log(
        root,
        schema_json,
        [
            {"add": {"path": "a.parquet", "partitionValues": {"p": "a"},
                     "size": os.path.getsize(f_a), "modificationTime": 0,
                     "dataChange": True, "deletionVector": dv}},
            {"add": {"path": "b.parquet", "partitionValues": {"p": "b"},
                     "size": os.path.getsize(f_b), "modificationTime": 0,
                     "dataChange": True}},
        ],
        partition_cols=["p"],
    )
    got = scan_delta(spark, root)
    assert _rows(got.select("k", "p")) == [
        (1, "a"), (2, "a"), (3, "a"),
        (5, "b"), (6, "b"), (7, "b"), (8, "b"), (9, "b"),
    ]
    # and partition pruning still applies with the DV in play
    only_a = scan_delta(spark, root, partition_filter=lambda pv: pv["p"] == "a")
    assert _rows(only_a.select("k")) == [(1,), (2,), (3,)]


def test_roaring_container_kinds():
    """Decoder handles array, bitmap, and run containers plus the
    64-bit multi-bitmap index (RoaringFormatSpec)."""
    import struct

    from pg_lake_spark.lakehouse import delta_meta as dm

    # run container: cookie 12347, 1 container, run flag set
    run = struct.pack("<I", 12347 | (0 << 16)) + b"\x01"
    run += struct.pack("<HH", 0, 5)  # key 0, cardinality 6
    run += struct.pack("<H", 1) + struct.pack("<HH", 10, 5)  # 10..15
    vals, _ = dm._roaring32_positions(run, 0)
    assert vals == [10, 11, 12, 13, 14, 15]

    # bitmap container: card 5000 (> 4096) in key 1
    members = set(range(0, 10000, 2))
    words = [0] * 1024
    for v in members:
        words[v >> 6] |= 1 << (v & 63)
    bm = struct.pack("<II", 12346, 1)
    bm += struct.pack("<HH", 1, len(members) - 1)
    bm += struct.pack("<I", 16)  # offset header (unused)
    bm += struct.pack("<1024Q", *words)
    vals, _ = dm._roaring32_positions(bm, 0)
    assert vals == sorted((1 << 16) + v for v in members)

    # 64-bit: bitmap index 1 shifts by 2^32
    data = dm._encode_dv_data([3, (1 << 32) + 7])
    assert dm._decode_dv_data(data) == [3, (1 << 32) + 7]


def test_dv_codec_roundtrip_fuzz():
    import random

    from pg_lake_spark.lakehouse import delta_meta as dm

    rng = random.Random(42)
    for _ in range(20):
        n = rng.randrange(0, 500)
        pos = sorted(rng.sample(range(200_000), n)) if n else []
        assert dm._decode_dv_data(dm._encode_dv_data(pos)) == pos
    # z85 roundtrip
    for _ in range(20):
        b = bytes(rng.randrange(256) for _ in range(4 * rng.randrange(1, 9)))
        assert dm._z85_decode(dm._z85_encode(b)) == b


# ---------------------------------------------------------------------------
# r13 delta_meta review fixes
# ---------------------------------------------------------------------------

def test_checkpoint_preserves_dv_and_protocol_features(spark, tmp_path):
    """pa.Table.from_pylist silently drops dict keys absent from the
    declared schema: a checkpoint that loses deletionVector resurrects
    deleted rows on checkpoint-seeded replays, and one that loses
    readerFeatures defeats the fail-loud protocol guard."""
    from pg_lake_spark.lakehouse import delta_meta as dm

    root = str(tmp_path / "cpdv")
    os.makedirs(root)
    pq_path = os.path.join(root, "part-0.parquet")
    _write_parquet_file(
        spark, pq_path, [(i, f"s{i}") for i in range(10)],
        [("k", "long"), ("s", "string")],
    )
    dv = _make_dv_file(root, [1, 3, 5])
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "s", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _dv_log(root, schema_json, [{
        "add": {
            "path": "part-0.parquet",
            "partitionValues": {},
            "size": os.path.getsize(pq_path),
            "modificationTime": 0,
            "dataChange": True,
            "deletionVector": dv,
        }
    }])
    write_delta_checkpoint(spark, root)
    # replay now seeds from the checkpoint (version 0 IS the checkpoint)
    state = dm._replay(root)
    (a,) = state.adds.values()
    assert a.get("deletionVector", {}).get("cardinality") == 3
    assert set(state.protocol.get("readerFeatures") or []) == {"deletionVectors"}
    got = _rows(scan_delta(spark, root).select("k"))
    assert got == [(0,), (2,), (4,), (6,), (7,), (8,), (9,)], (
        "checkpoint-seeded replay resurrected DV-deleted rows"
    )


def test_conjunct_pruning_skips_column_free_conjuncts(spark):
    """A conjunct referencing no column (constant, rand()) analyzes
    against ANY frame but is not a per-file constant — applying it
    file-wise silently drops whole files."""
    from pg_lake_spark.lakehouse.pruning import conjunct_filter_paths

    frame = spark.createDataFrame(
        [("f1", "a"), ("f2", "b"), ("f3", "a")], "__path string, p string"
    )
    got = conjunct_filter_paths(spark, frame, "rand() < 0.5 AND p = 'a'")
    assert got == {"f1", "f3"}  # rand() skipped, p='a' applied
    # where the ONLY conjunct is column-free: no pruning at all
    assert conjunct_filter_paths(spark, frame, "rand() < 0.5") is None
    assert conjunct_filter_paths(spark, frame, "1 = 1") is None


def test_uri_key_matches_hadoop_encoding(spark, tmp_path):
    """The pure-Python fast path must emit byte-identical URIs to
    Hadoop's Path encoder for every character class a real path hits
    (the join key against _metadata.file_path tolerates zero drift)."""
    from pg_lake_spark.lakehouse.delta_meta import _uri_key

    for name in [
        "plain.parquet", "has space.parquet", "pct%25.parquet",
        "häßlich-ünïcode.parquet", "hash#q.parquet", "q?mark.parquet",
        "plus+and=eq,comma;semi.parquet", "tilde~bang!quote'.parquet",
        "at@dollar$amp&paren().parquet",
    ]:
        p = str(tmp_path / name)
        jvm = spark._jvm.org.apache.hadoop.fs.Path(
            "file:" + os.path.abspath(p)
        ).toUri().toString()
        assert _uri_key(spark, p) == jvm, f"drift for {name!r}"


def test_dv_file_offset_absent_defaults_past_version_byte(spark, tmp_path):
    """The descriptor's offset is optional; data starts after the
    1-byte format version — defaulting to 0 reads the version byte as
    the size's high byte and rejects a valid DV."""
    root = str(tmp_path / "dvnooff")
    os.makedirs(root)
    from pg_lake_spark.lakehouse import delta_meta as dm

    dv = _make_dv_file(root, [2, 4])
    dv.pop("offset")
    assert dm._load_dv_positions(root, dv) == [2, 4]


def test_z85_encode_pads_odd_payloads():
    """Inline-DV payloads are odd-length whenever total container
    cardinality is odd; the encoder zero-pads like Delta's Base85Codec
    instead of rejecting (the roaring decoder ignores trailing pad)."""
    from pg_lake_spark.lakehouse import delta_meta as dm

    data = dm._encode_dv_data([0])  # 34 bytes — not a multiple of 4
    assert len(data) % 4 != 0
    enc = dm._z85_encode(data)
    assert dm._decode_dv_data(dm._z85_decode(enc)) == [0]


def test_remove_delta_files_noop_commits_nothing(spark, tmp_path):
    from pg_lake_spark.lakehouse import delta_meta as dm

    loc = str(tmp_path / "rmnoop")
    write_delta_table(
        spark, loc,
        spark.createDataFrame([(1, "a")], "id long, p string"),
        partition_by=["p"],
    )
    v_before = dm._replay(loc).version
    assert dm.remove_delta_files(loc, lambda pv: pv.get("p") == "zzz") == 0
    assert dm._replay(loc).version == v_before, "no-op remove burned a version"


def test_append_refuses_column_mapped_tables(spark, tmp_path):
    """Write paths emit logical names; a columnMapping table declares
    physical names — appending would scan back all-NULL. Refuse."""
    import pytest as _pytest

    from pg_lake_spark.lakehouse import delta_meta as dm

    loc = str(tmp_path / "cmapw")
    write_delta_table(spark, loc, spark.createDataFrame([(1,)], "id long"))
    # flip the table to name mapping via a metaData commit
    st = dm._replay(loc)
    md = dict(st.metadata)
    md["configuration"] = {"delta.columnMapping.mode": "name"}
    dm._write_commit(loc, st.version + 1, [{"metaData": md}])
    with _pytest.raises(NotImplementedError, match="columnMapping"):
        dm.append_delta(spark, loc, spark.createDataFrame([(2,)], "id long"))


def test_losing_commit_race_leaves_no_tmp(spark, tmp_path):
    import glob as _glob

    import pytest as _pytest

    from pg_lake_spark.lakehouse import delta_meta as dm

    loc = str(tmp_path / "racetmp")
    write_delta_table(spark, loc, spark.createDataFrame([(1,)], "id long"))
    with _pytest.raises(dm.ConcurrentDeltaCommitError):
        dm._write_commit(loc, 0, [])  # version 0 already exists
    leftovers = _glob.glob(os.path.join(loc, "_delta_log", "*.tmp-*"))
    assert leftovers == []


def test_losing_delta_append_leaves_no_orphan_files(spark, tmp_path, monkeypatch):
    """A commit that loses the put-if-absent race has already moved its
    parquet into the table root — the loser must unlink them or every
    conflict leaves an orphaned copy of the batch on disk."""
    import pytest as _pytest

    from pg_lake_spark.lakehouse import delta_meta as dm

    loc = str(tmp_path / "orphan")
    write_delta_table(spark, loc, spark.createDataFrame([(1,)], "id long"))

    orig = dm._write_data_files
    def hijack(spark_, location, df, pcols):
        out = orig(spark_, location, df, pcols)
        dm._write_commit(location, 1, [])  # competing writer steals v1
        return out

    monkeypatch.setattr(dm, "_write_data_files", hijack)
    with _pytest.raises(dm.ConcurrentDeltaCommitError):
        dm.append_delta(spark, loc, spark.createDataFrame([(2,)], "id long"))
    monkeypatch.setattr(dm, "_write_data_files", orig)

    state = dm._replay(loc)
    from urllib.parse import unquote as _uq
    referenced = {
        os.path.abspath(dm._abs_path(loc, _uq(a["path"])))
        for a in state.adds.values()
    }
    on_disk = {
        os.path.abspath(os.path.join(r, f))
        for r, _d, fs in os.walk(loc)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    }
    assert on_disk == referenced, f"orphans: {on_disk - referenced}"
