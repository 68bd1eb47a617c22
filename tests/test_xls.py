"""BIFF8 .xls reader tests against spec-exact hand-written binaries
(the same golden-bytes discipline as test_shapefile.py): a CFB
container + BIFF8 workbook stream built record by record from the
MS-CFB / MS-XLS open specifications — no Excel, no xlrd."""

from __future__ import annotations

import struct

import pytest

FREE = 0xFFFFFFFF
EOC = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _sst(strings: list[str], split_at: int | None = None) -> bytes:
    """SST record; if split_at is given, string[split_at] is split
    across a CONTINUE at its midpoint (the fragment restarts with a
    fresh compression flag — the BIFF8 rule under test)."""
    head = struct.pack("<II", len(strings), len(strings))
    body = b""
    cont = None
    for i, s in enumerate(strings):
        enc = s.encode("latin-1")
        if split_at == i:
            half = len(enc) // 2
            body += struct.pack("<HB", len(s), 0x00) + enc[:half]
            cont = b"\x00" + enc[half:]
            continue
        if cont is not None:
            cont += struct.pack("<HB", len(s), 0x00) + enc
            continue
        body += struct.pack("<HB", len(s), 0x00) + enc
    out = _rec(0x00FC, head + body)
    if cont is not None:
        out += _rec(0x003C, cont)
    return out


def _boundsheet(pos: int, name: str) -> bytes:
    nm = name.encode("latin-1")
    return _rec(0x0085, struct.pack("<IHBB", pos, 0, len(nm), 0x00) + nm)


def _labelsst(r, c, isst):
    return _rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))


def _number(r, c, v):
    return _rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", v))


def _rk_int(r, c, v: int):
    return _rec(0x027E, struct.pack("<HHHI", r, c, 0, ((v << 2) | 0x02) & 0xFFFFFFFF))


def _rk_x100(r, c, cents: int):
    return _rec(0x027E, struct.pack("<HHHI", r, c, 0, ((cents << 2) | 0x03) & 0xFFFFFFFF))


def _boolerr(r, c, v: bool):
    return _rec(0x0205, struct.pack("<HHHBB", r, c, 0, 1 if v else 0, 0))


def _label(r, c, s: str):
    enc = s.encode("latin-1")
    return _rec(0x0204, struct.pack("<HHHH", r, c, 0, len(s)) + b"\x00" + enc)


def _eof():
    return _rec(0x000A, b"")


def _cfb(workbook: bytes, stream_name: str = "Workbook", sec_shift: int = 9) -> bytes:
    """Wrap a workbook stream into a minimal valid CFB: sector 0 = FAT,
    sector 1 = directory, sectors 2.. = the stream (padded past the
    4096-byte mini-stream cutoff so it lives in the regular FAT)."""
    ssz = 1 << sec_shift
    wb = workbook + b"\x00" * max(0, 4096 - len(workbook))
    wb += b"\x00" * (-len(wb) % ssz)
    n_wb = len(wb) // ssz
    fat = [FATSECT, EOC] + [2 + i + 1 for i in range(n_wb - 1)] + [EOC]
    fat += [FREE] * (ssz // 4 - len(fat))
    fat_raw = struct.pack(f"<{ssz // 4}I", *fat)

    def direntry(name, otype, start, size):
        nm = name.encode("utf-16-le")
        e = nm + b"\x00" * (64 - len(nm))
        e += struct.pack("<H", len(nm) + 2)
        e += bytes([otype, 0])
        e += struct.pack("<iii", -1, -1, -1)  # siblings/child: none
        e += b"\x00" * 16 + b"\x00" * 4  # clsid + state
        e += b"\x00" * 16  # timestamps
        e += struct.pack("<IQ", start, size)
        assert len(e) == 128
        return e

    # declared size must be >= the mini-stream cutoff for a stream
    # stored in the regular FAT (readers route on size); the zero
    # padding past the final EOF parses as opcode 0 = stop
    directory = direntry("Root Entry", 5, EOC, 0)
    directory += direntry(stream_name, 2, 2, len(wb))
    directory += b"\x00" * (ssz - len(directory))

    hdr = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    hdr += struct.pack("<HH", 0x003E, 0xFFFE)  # minor/major version
    hdr += struct.pack("<H", 0xFFFE)           # little-endian marker
    hdr += struct.pack("<HH", sec_shift, 6)    # sector/mini shifts
    hdr += b"\x00" * 6
    hdr += struct.pack("<I", 0)                # n dir sectors (v3: 0)
    hdr += struct.pack("<I", 1)                # n FAT sectors
    hdr += struct.pack("<I", 1)                # first directory sector
    hdr += struct.pack("<I", 0)                # transaction
    hdr += struct.pack("<I", 4096)             # mini cutoff
    hdr += struct.pack("<I", EOC)              # first miniFAT
    hdr += struct.pack("<I", 0)                # n miniFAT
    hdr += struct.pack("<I", EOC)              # first DIFAT
    hdr += struct.pack("<I", 0)                # n DIFAT
    hdr += struct.pack("<I", 0)                # DIFAT[0] -> FAT sector 0
    hdr += struct.pack("<108I", *([FREE] * 108))
    assert len(hdr) == 512
    # MS-CFB: sector 0 begins at (0+1)*ssz — for 4096-byte sectors the
    # header is padded out to one full sector.
    hdr += b"\x00" * (ssz - 512)
    return hdr + fat_raw + directory + wb


def _build_xls(tmp_path, split_sst=False) -> str:
    strings = ["name", "qty", "price", "ok", "alpha",
               "a-rather-long-shared-string-value", "gamma"]
    globals_recs = _bof(0x0005)
    bs_stub = _boundsheet(0, "Data") + _boundsheet(0, "Other")
    sst = _sst(strings, split_at=5 if split_sst else None)
    # assemble with a placeholder, then patch lbPlyPos
    sheet1 = (
        _bof(0x0010)
        + _labelsst(0, 0, 0) + _labelsst(0, 1, 1) + _labelsst(0, 2, 2)
        + _labelsst(0, 3, 3)
        + _labelsst(1, 0, 4) + _rk_int(1, 1, 42)
        + _number(1, 2, 3.5) + _boolerr(1, 3, True)
        + _labelsst(2, 0, 5) + _rk_x100(2, 1, 123)
        + _number(2, 2, -1.25) + _boolerr(2, 3, False)
        + _label(3, 0, "inline-gamma") + _rk_int(3, 1, -7)
        + _number(3, 2, 0.0) + _boolerr(3, 3, True)
        + _eof()
    )
    sheet2 = _bof(0x0010) + _label(0, 0, "k") + _number(1, 0, 9.0) + _eof()
    head_len = len(globals_recs) + len(bs_stub) + len(sst) + len(_eof())
    bs = _boundsheet(head_len, "Data") + _boundsheet(head_len + len(sheet1), "Other")
    workbook = globals_recs + bs + sst + _eof() + sheet1 + sheet2
    path = str(tmp_path / ("t_split.xls" if split_sst else "t.xls"))
    with open(path, "wb") as fh:
        fh.write(_cfb(workbook))
    return path


def test_read_xls_values_and_types(spark, tmp_path):
    from pg_lake_spark.sources.xls import read_xls

    path = _build_xls(tmp_path)
    df = read_xls(spark, path)
    assert df.columns == ["name", "qty", "price", "ok"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "double", "double", "boolean"
    ]
    rows = {r["name"]: r for r in df.collect()}
    assert rows["alpha"]["qty"] == 42.0 and rows["alpha"]["price"] == 3.5
    assert rows["alpha"]["ok"] is True
    long_name = "a-rather-long-shared-string-value"
    assert rows[long_name]["qty"] == 1.23  # RK x100 decode
    assert rows[long_name]["price"] == -1.25 and rows[long_name]["ok"] is False
    assert rows["inline-gamma"]["qty"] == -7.0  # negative RK int + LABEL


def test_read_xls_sst_continue_split(spark, tmp_path):
    """A shared string split across SST/CONTINUE (fresh flag byte on
    the fragment) must reassemble byte-identically."""
    from pg_lake_spark.sources.xls import read_xls

    a = read_xls(spark, _build_xls(tmp_path, split_sst=False)).collect()
    b = read_xls(spark, _build_xls(tmp_path, split_sst=True)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_read_xls_sheet_selection(spark, tmp_path):
    from pg_lake_spark.sources.xls import read_xls

    path = _build_xls(tmp_path)
    df = read_xls(spark, path, sheet="Other")
    assert df.columns == ["k"] and df.collect()[0][0] == 9.0
    df2 = read_xls(spark, path, sheet=2)
    assert df2.columns == ["k"]
    with pytest.raises(ValueError, match="no sheet named"):
        read_xls(spark, path, sheet="Missing")


def test_read_xls_rejects_non_cfb(spark, tmp_path):
    from pg_lake_spark.sources.xls import read_xls

    p = tmp_path / "fake.xls"
    p.write_bytes(b"PK\x03\x04 definitely a zip")
    with pytest.raises(ValueError, match="bad magic"):
        read_xls(spark, str(p))


def test_read_lake_xls_dispatch(spark, tmp_path):
    """format 'gdal' sniffs the CFB magic and routes .xls through
    read_lake; the GDAL `layer` option selects the sheet."""
    from pg_lake_spark.sources.readers import read_lake

    path = _build_xls(tmp_path)
    df = read_lake(spark, path, fmt="gdal")
    assert df.columns == ["name", "qty", "price", "ok"]
    df2 = read_lake(spark, path, fmt="gdal", layer="Other")
    assert df2.columns == ["k"]


def test_read_xls_v4_4096_byte_sectors(spark, tmp_path):
    """A v4 CFB container (sector shift 12 → 4096-byte sectors) parses
    identically to the usual v3 layout: MS-CFB puts sector 0 at
    (0+1)*sector_size, so the old 512+n*ssz arithmetic read garbage
    (r16 leaf-parser review)."""
    from pg_lake_spark.sources.xls import read_xls

    strings = ["name", "qty"]
    sheet = (
        _bof(0x0010)
        + _labelsst(0, 0, 0) + _labelsst(0, 1, 1)
        + _labelsst(1, 0, 0) + _rk_int(1, 1, 42)
        + _eof()
    )
    head_len = len(_bof(0x0005)) + len(_boundsheet(0, "Data")) + len(_sst(strings)) + len(_eof())
    wbk = _bof(0x0005) + _boundsheet(head_len, "Data") + _sst(strings) + _eof() + sheet
    p3 = tmp_path / "v3.xls"
    p4 = tmp_path / "v4.xls"
    p3.write_bytes(_cfb(wbk))
    p4.write_bytes(_cfb(wbk, sec_shift=12))
    rows3 = [tuple(r) for r in read_xls(spark, str(p3)).collect()]
    rows4 = [tuple(r) for r in read_xls(spark, str(p4)).collect()]
    assert rows3 == rows4 == [("name", 42)]
