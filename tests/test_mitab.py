"""MapInfo .tab attribute datasets (Type DBF) — the dependency-free
slice of the reference's GDAL MapInfo support
(docs/file-formats-reference.md: `.mif .mit .tab`). The fixture .dat
is built spec-exact from the open dBASE III layout (same discipline as
the synthetic NTv2 grids and BIFF8 fixtures)."""

from __future__ import annotations

import struct

import pytest


def _dbf_bytes(fields, rows) -> bytes:
    """Spec-exact dBASE III writer: 32-byte header, 32-byte field
    descriptors, 0x0D terminator, fixed-width ASCII records."""
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    head = struct.pack(
        "<B3BIHH20x", 0x03, 24, 1, 15, len(rows), hsize, rsize
    )
    desc = b""
    for name, ftype, flen, fdec in fields:
        desc += struct.pack(
            "<11sc4xBB14x", name.encode("ascii"), ftype.encode(), flen, fdec
        )
    body = b""
    for r in rows:
        rec = b" "
        for (name, ftype, flen, fdec), v in zip(fields, r):
            if v is None:
                cell = b" " * flen
            elif ftype == "N":
                s = f"{v:.{fdec}f}" if fdec else str(int(v))
                cell = s.rjust(flen).encode("ascii")
            elif ftype == "L":
                cell = b"T" if v else b"F"
            else:
                cell = str(v).ljust(flen).encode("latin-1")[:flen]
            rec += cell
        body += rec
    return head + desc + b"\x0d" + body + b"\x1a"


_FIELDS = [("id", "N", 6, 0), ("name", "C", 10, 0), ("score", "N", 8, 2),
           ("active", "L", 1, 0)]
_ROWS = [
    (1, "alpha", 3.25, True),
    (2, "beta", -1.5, False),
    (3, "it's", None, None),
]

_TAB_TEXT = """!table
!version 300
!charset WindowsLatin1

Definition Table
  Type DBF Charset "WindowsLatin1"
  Fields 4
    id Integer ;
    name Char (10) ;
    score Float ;
    active Logical ;
"""


def _write_fixture(tmp_path, name="attrs"):
    (tmp_path / f"{name}.tab").write_text(_TAB_TEXT)
    (tmp_path / f"{name}.dat").write_bytes(_dbf_bytes(_FIELDS, _ROWS))
    return str(tmp_path / f"{name}.tab")


def test_tab_dbf_attribute_table(spark, tmp_path):
    from pg_lake_spark.sources.mitab import read_tab

    df = read_tab(spark, _write_fixture(tmp_path))
    assert dict(df.dtypes) == {
        "id": "bigint", "name": "string", "score": "double",
        "active": "boolean",
    }
    got = {r.id: r for r in df.collect()}
    assert got[1].name == "alpha" and got[1].score == 3.25 and got[1].active
    assert got[2].score == -1.5 and got[2].active is False
    assert got[3].name == "it's" and got[3].score is None and got[3].active is None


def test_tab_through_gdal_umbrella(spark, tmp_path):
    """format 'gdal' sniffs .tab like the reference's GDAL funnel."""
    from pg_lake_spark.sources.readers import read_lake

    df = read_lake(spark, _write_fixture(tmp_path), fmt="gdal")
    assert df.count() == 3


def test_tab_native_and_geometry_refuse_loudly(spark, tmp_path):
    from pg_lake_spark.sources.mitab import read_tab

    p = _write_fixture(tmp_path, "nat")
    (tmp_path / "nat.tab").write_text(_TAB_TEXT.replace("Type DBF", "Type NATIVE"))
    with pytest.raises(NotImplementedError, match="Type NATIVE"):
        read_tab(spark, p)

    p2 = _write_fixture(tmp_path, "geo")
    (tmp_path / "geo.map").write_bytes(b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="geometry"):
        read_tab(spark, p2)

    p3 = str(tmp_path / "lonely.tab")
    (tmp_path / "lonely.tab").write_text(_TAB_TEXT)
    with pytest.raises(FileNotFoundError, match=".dat"):
        read_tab(spark, p3)


def test_tab_field_count_mismatch(spark, tmp_path):
    from pg_lake_spark.sources.mitab import read_tab

    p = _write_fixture(tmp_path, "mm")
    (tmp_path / "mm.tab").write_text(_TAB_TEXT.replace("Fields 4", "Fields 2"))
    with pytest.raises(ValueError, match="declares 2 fields"):
        read_tab(spark, p)


def test_mid_quoted_delimiter(spark, tmp_path):
    """A quoted MID string containing the delimiter must parse as one
    field — the naive split broke the row and zip() silently truncated,
    misaligning every later column (r14 review)."""
    mif = tmp_path / "q.mif"
    mid = tmp_path / "q.mid"
    mif.write_text(
        'Version 300\nDelimiter ","\nColumns 2\n  name Char(40)\n'
        "  score Integer\nData\n\nPOINT 1 2\nPOINT 3 4\n"
    )
    mid.write_text('"Smith, John",7\n"plain",9\n')
    from pg_lake_spark.sources.mif import read_mif

    rows = read_mif(spark, str(mif)).orderBy("score").collect()
    assert [(r.name, r.score) for r in rows] == [("Smith, John", 7), ("plain", 9)]


def test_mid_arity_mismatch_raises(spark, tmp_path):
    import pytest

    mif = tmp_path / "a.mif"
    mid = tmp_path / "a.mid"
    mif.write_text(
        'Version 300\nDelimiter ","\nColumns 2\n  name Char(40)\n'
        "  score Integer\nData\n\nPOINT 1 2\n"
    )
    mid.write_text("only_one_field\n")
    from pg_lake_spark.sources.mif import read_mif

    with pytest.raises(ValueError, match="fields"):
        read_mif(spark, str(mid.with_suffix(".mif")))
