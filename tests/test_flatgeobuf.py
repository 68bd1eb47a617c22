"""FlatGeobuf reader/writer (dependency-free flatbuffers subset).

Structure is verified by independent manual byte decoding (not just
writer->reader roundtrip): magic, size-prefixed frames, vtable slots,
column tables, and the packed-R-tree skip formula."""

from __future__ import annotations

import struct

import pytest

from pg_lake_spark.functions.spatial import _from_wkt, _to_wkt
from pg_lake_spark.sources import flatgeobuf as fgb


ROWS = [
    {"id": 1, "name": "a", "score": 1.5, "flag": True,
     "geometry": _from_wkt("POINT(1 2)")},
    {"id": 2, "name": "b", "score": 2.5, "flag": False,
     "geometry": _from_wkt("LINESTRING(0 0,5 5,10 0)")},
    {"id": 3, "name": "c", "score": 3.5, "flag": True,
     "geometry": _from_wkt(
         "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))")},
    {"id": 4, "name": "d", "score": 4.5, "flag": False,
     "geometry": _from_wkt("MULTIPOINT(1 1,2 2)")},
]


def test_roundtrip_via_read_lake(spark, tmp_path):
    from pg_lake_spark.sources.readers import read_lake

    p = str(tmp_path / "t.fgb")
    fgb.write_flatgeobuf(p, ROWS, name="layer1")
    df = read_lake(spark, p, fmt="fgb")
    got = df.orderBy("id").collect()
    assert [r.id for r in got] == [1, 2, 3, 4]
    assert [r.name for r in got] == ["a", "b", "c", "d"]
    assert got[0].score == 1.5 and got[0].flag is True
    wkts = [_to_wkt(bytes(r.geometry)) for r in got]
    assert wkts == [
        "POINT(1 2)",
        "LINESTRING(0 0,5 5,10 0)",
        "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
        "MULTIPOINT(1 1,2 2)",
    ]


def test_wire_structure_manual_decode(tmp_path):
    """Decode the header frame by hand (no reader classes) to pin the
    wire layout: magic, frame size, root uoffset, negative soffset to a
    trailing vtable, string field."""
    p = str(tmp_path / "t.fgb")
    fgb.write_flatgeobuf(p, ROWS, name="layer1")
    buf = open(p, "rb").read()
    assert buf[:8] == fgb.MAGIC
    (hsize,) = struct.unpack_from("<I", buf, 8)
    (root,) = struct.unpack_from("<I", buf, 12)
    tpos = 12 + root
    (soff,) = struct.unpack_from("<i", buf, tpos)
    assert soff < 0  # vtable after table (builder invariant)
    vt = tpos - soff
    vt_len, tbl_len = struct.unpack_from("<HH", buf, vt)
    assert vt_len >= 4 + 2 and tbl_len >= 4
    # slot 0 = name: follow the uoffset to a length-prefixed string
    (voff,) = struct.unpack_from("<H", buf, vt + 4)
    fpos = tpos + voff
    (u,) = struct.unpack_from("<I", buf, fpos)
    (slen,) = struct.unpack_from("<I", buf, fpos + u)
    assert buf[fpos + u + 4 : fpos + u + 4 + slen] == b"layer1"
    # features start right after the header frame (no index)
    (f0,) = struct.unpack_from("<I", buf, 12 + hsize)
    assert 0 < f0 < len(buf)


def test_rtree_index_skip(spark, tmp_path):
    """A file carrying a packed Hilbert R-tree is read by skipping
    exactly the level-sum node bytes."""
    p = str(tmp_path / "plain.fgb")
    fgb.write_flatgeobuf(p, ROWS)
    buf = open(p, "rb").read()
    (hsize,) = struct.unpack_from("<I", buf, 8)
    header_frame = bytearray(buf[8 : 12 + hsize])
    # patch index_node_size (slot 9) from 0 to 2 in the header table
    (root,) = struct.unpack_from("<I", header_frame, 4)
    tpos = 4 + root
    (soff,) = struct.unpack_from("<i", header_frame, tpos)
    vt = tpos - soff
    (voff,) = struct.unpack_from("<H", header_frame, vt + 4 + 2 * 9)
    assert voff
    struct.pack_into("<H", header_frame, tpos + voff, 2)
    index = b"\xab" * fgb._rtree_size(len(ROWS), 2)
    patched = buf[:8] + bytes(header_frame) + index + buf[12 + hsize :]
    p2 = str(tmp_path / "indexed.fgb")
    open(p2, "wb").write(patched)
    df = fgb.read_flatgeobuf(spark, p2)
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 4]


def test_rtree_size_formula():
    # upstream packedrtree level-sum: 4 items @ node 2 -> 4+2+1 nodes
    assert fgb._rtree_size(4, 2) == (4 + 2 + 1) * 40
    assert fgb._rtree_size(0, 16) == 0
    assert fgb._rtree_size(10, 0) == 0  # index-free
    assert fgb._rtree_size(1, 16) == 1 * 40 == 40


def test_null_properties_and_bad_magic(spark, tmp_path):
    p = str(tmp_path / "n.fgb")
    rows = [
        {"id": 1, "name": None, "geometry": _from_wkt("POINT(0 0)")},
        {"id": 2, "name": "x", "geometry": _from_wkt("POINT(1 1)")},
    ]
    fgb.write_flatgeobuf(p, rows)
    got = {r.id: r.name for r in fgb.read_flatgeobuf(spark, p).collect()}
    assert got == {1: None, 2: "x"}
    bad = str(tmp_path / "bad.fgb")
    open(bad, "wb").write(b"not a flatgeobuf")
    with pytest.raises(ValueError, match="not a FlatGeobuf"):
        fgb.read_flatgeobuf(spark, bad)


def test_copy_to_fgb(spark, tmp_path):
    """COPY ... TO 'x.fgb' (FORMAT fgb) writes a readable FlatGeobuf."""
    from pg_lake_spark.sources.writers import copy_to

    df = spark.createDataFrame(
        [(i, _from_wkt(f"POINT({i} {i * 2})")) for i in range(5)],
        "id bigint, geometry binary",
    )
    out = str(tmp_path / "pts.fgb")
    copy_to(df, out, fmt="fgb")
    back = fgb.read_flatgeobuf(spark, out)
    got = sorted((r.id, _to_wkt(bytes(r.geometry))) for r in back.collect())
    assert got[0] == (0, "POINT(0 0)") and len(got) == 5


def test_holed_multipolygon_refused(tmp_path):
    rows = [{"id": 1, "geometry": _from_wkt(
        "MULTIPOLYGON(((0 0,9 0,9 9,0 9,0 0),(3 3,6 3,6 6,3 6,3 3)))")}]
    with pytest.raises(ValueError, match="interior rings"):
        fgb.write_flatgeobuf(str(tmp_path / "x.fgb"), rows)


def test_schema_union_across_rows(spark, tmp_path):
    """Schema = union of keys; type from first non-None value (a None
    in row 0 or a key absent from row 0 must not drop/mistype cols)."""
    p = str(tmp_path / "u.fgb")
    rows = [
        {"id": 1, "score": None, "geometry": _from_wkt("POINT(0 0)")},
        {"id": 2, "score": 1.5, "tag": "a", "geometry": _from_wkt("POINT(1 1)")},
    ]
    fgb.write_flatgeobuf(p, rows)
    back = {r.id: (r.score, r.tag) for r in fgb.read_flatgeobuf(spark, p).collect()}
    assert back == {1: (None, None), 2: (1.5, "a")}


def test_schema_mixed_types_raise(tmp_path):
    rows = [
        {"v": 1, "geometry": _from_wkt("POINT(0 0)")},
        {"v": "x", "geometry": _from_wkt("POINT(1 1)")},
    ]
    with pytest.raises(ValueError, match="mixed types"):
        fgb.write_flatgeobuf(str(tmp_path / "m.fgb"), rows)


def test_distributed_export_multi_partition(spark, tmp_path):
    """write_flatgeobuf_df encodes executor-side across >1 partition
    (no driver collect of raw rows) and roundtrips."""
    df = spark.createDataFrame(
        [(i, f"n{i}", _from_wkt(f"POINT({i} {i})")) for i in range(200)],
        "id bigint, name string, geometry binary",
    ).repartition(8)
    out = str(tmp_path / "big.fgb")
    n = fgb.write_flatgeobuf_df(df, out)
    assert n == 200
    back = fgb.read_flatgeobuf(spark, out)
    assert back.count() == 200
    got = {r.id: r.name for r in back.collect()}
    assert got[7] == "n7" and got[199] == "n199"


def test_distributed_export_mixed_gtype_header_unknown(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, _from_wkt("POINT(0 0)")), (2, _from_wkt("LINESTRING(0 0,1 1)"))],
        "id bigint, geometry binary",
    )
    out = str(tmp_path / "mix.fgb")
    fgb.write_flatgeobuf_df(df, out)
    rows = {r.id for r in fgb.read_flatgeobuf(spark, out).collect()}
    assert rows == {1, 2}


def test_null_geometry_roundtrip(spark, tmp_path):
    """NULL geometries are legal FGB features (no geometry field) —
    the writer previously crashed in the WKB parser (r14 review); they
    must round-trip as NULL and not vote on the header type."""
    path = str(tmp_path / "nullgeom.fgb")
    pt = _from_wkt("POINT (1 2)")
    fgb.write_flatgeobuf(
        path,
        [
            {"geometry": pt, "name": "a"},
            {"geometry": None, "name": "b"},
            {"geometry": pt, "name": "c"},
        ],
    )
    got = fgb.read_flatgeobuf(spark, path).orderBy("name").collect()
    assert [r.name for r in got] == ["a", "b", "c"]
    assert got[1].geometry is None
    assert _to_wkt(bytes(got[0].geometry)) == "POINT(1 2)"
    # header gtype stays POINT (nulls don't force Unknown)
    with open(path, "rb") as fh:
        buf = fh.read()
    (hsize,) = struct.unpack_from("<I", buf, 8)
    (root,) = struct.unpack_from("<I", buf, 12)
    hdr = fgb._Tbl(buf, 12 + root)
    assert hdr.scalar(fgb._H_GTYPE, "B", 0) == fgb.WKB_POINT


def test_null_geometry_distributed_export(spark, tmp_path):
    path = str(tmp_path / "nullgeom_df.fgb")
    pt = _from_wkt("POINT (3 4)")
    df = spark.createDataFrame(
        [(1, pt), (2, None), (3, pt)], "id bigint, geometry binary"
    )
    n = fgb.write_flatgeobuf_df(df, path)
    assert n == 3
    got = {r.id: r.geometry for r in fgb.read_flatgeobuf(spark, path).collect()}
    assert got[2] is None and got[1] is not None
