"""Shapefile reader tests: spec-exact hand-written .shp/.dbf binaries
(point, polyline multi-part, polygon with hole, null shape), dbf typing,
zip_path integration — parity with the reference's GDAL .shp path."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from pg_lake_spark.functions import spatial as S
from pg_lake_spark.sources.shapefile import read_shapefile


def _shp_record(recno: int, content: bytes) -> bytes:
    return struct.pack(">ii", recno, len(content) // 2) + content


def _write_shp(path, records: list[bytes]):
    body = b"".join(_shp_record(i + 1, c) for i, c in enumerate(records))
    total_words = (100 + len(body)) // 2
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<ii", 1000, 1)  # version, shape type (advisory)
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)  # bbox + zm ranges
    with open(path, "wb") as fh:
        fh.write(header + body)


def _point(x, y):
    return struct.pack("<idd", 1, x, y)


def _poly_content(stype, parts):
    npoints = sum(len(p) for p in parts)
    out = struct.pack("<i", stype) + struct.pack("<4d", 0, 0, 0, 0)
    out += struct.pack("<ii", len(parts), npoints)
    idx = 0
    for p in parts:
        out += struct.pack("<i", idx)
        idx += len(p)
    for p in parts:
        for x, y in p:
            out += struct.pack("<dd", x, y)
    return out


def _write_dbf(path, fields, rows):
    desc = b""
    rsize = 1
    for name, ftype, flen, fdec in fields:
        desc += name.encode().ljust(11, b"\x00") + ftype.encode()
        desc += b"\x00" * 4 + bytes([flen, fdec]) + b"\x00" * 14
        rsize += flen
    hsize = 32 + len(desc) + 1
    header = struct.pack("<BBBBIHH", 3, 24, 1, 1, len(rows), hsize, rsize)
    header += b"\x00" * 20 + desc + b"\x0d"
    body = b""
    for r in rows:
        body += b" "
        for (name, ftype, flen, fdec), v in zip(fields, r):
            s = "" if v is None else str(v)
            body += (s.rjust(flen) if ftype in "NF" else s.ljust(flen))[:flen].encode()
    with open(path, "wb") as fh:
        fh.write(header + body + b"\x1a")


def test_shapefile_geometries_and_attributes(spark, tmp_path):
    shp = str(tmp_path / "world.shp")
    # CW outer ring (spec: outer rings clockwise) + CCW hole inside
    outer = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    records = [
        _point(3.5, -1.25),
        _poly_content(3, [[(0.0, 0.0), (1.0, 1.0)], [(5.0, 5.0), (6.0, 5.0), (6.0, 6.0)]]),
        _poly_content(5, [outer, hole]),
        struct.pack("<i", 0),  # null shape
    ]
    _write_shp(shp, records)
    _write_dbf(
        str(tmp_path / "world.dbf"),
        [("NAME", "C", 10, 0), ("POP", "N", 8, 0), ("AREA", "N", 10, 2), ("OK", "L", 1, 0)],
        [
            ["alpha", 123, 1.5, "T"],
            ["beta", 45, 2.25, "F"],
            ["gamma", None, None, "?"],
            ["empty", 0, 0.0, "T"],
        ],
    )
    df = read_shapefile(spark, shp)
    assert df.columns == ["NAME", "POP", "AREA", "OK", "geometry"]
    assert dict(df.dtypes)["POP"] == "bigint" and dict(df.dtypes)["AREA"] == "double"
    rows = df.select(
        "NAME", "POP", "AREA", "OK", S.st_astext("geometry").alias("wkt")
    ).collect()
    by_name = {r.NAME: r for r in rows}
    assert by_name["alpha"].wkt == "POINT(3.5 -1.25)"
    assert by_name["alpha"].POP == 123 and by_name["alpha"].OK is True
    assert by_name["beta"].wkt == "MULTILINESTRING((0 0,1 1),(5 5,6 5,6 6))"
    assert by_name["gamma"].wkt == (
        "POLYGON((0 0,0 4,4 4,4 0,0 0),(1 1,2 1,2 2,1 2,1 1))"
    )
    assert by_name["gamma"].POP is None and by_name["gamma"].OK is None
    assert by_name["empty"].wkt is None  # null shape
    # area of the holed polygon through the spatial slice
    area = df.filter(F.col("NAME") == "gamma").select(S.st_area("geometry")).collect()[0][0]
    assert area == 16.0 - 1.0


def test_shapefile_via_zip_path(spark, tmp_path):
    import zipfile

    from pg_lake_spark.sources.readers import read_lake

    shp = str(tmp_path / "pts.shp")
    _write_shp(shp, [_point(1.0, 2.0), _point(3.0, 4.0)])
    _write_dbf(str(tmp_path / "pts.dbf"), [("ID", "N", 4, 0)], [[1], [2]])
    z = str(tmp_path / "pts.zip")
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(shp, "pts.shp")
        zf.write(str(tmp_path / "pts.dbf"), "pts.dbf")
    df = read_lake(spark, z, fmt="shp", zip_path="pts.*")
    rows = df.select("ID", S.st_x("geometry").alias("x")).orderBy("ID").collect()
    assert [(r.ID, r.x) for r in rows] == [(1, 1.0), (2, 3.0)]


def test_shapefile_rejects_garbage(spark, tmp_path):
    bad = tmp_path / "not.shp"
    bad.write_bytes(b"\x00" * 128)
    with pytest.raises(ValueError, match="bad magic"):
        read_shapefile(spark, str(bad))
