"""Dependency-free legacy .xls (BIFF8) reader — stdlib struct only.

Reference: GDAL's XLS driver (docs/file-formats-reference.md:
`.xls .xlsx | Excel files`); the reference funnels .xls through GDAL's
freexl. This sandbox has neither, but both container and record
formats are OPEN specifications (MS-CFB compound file binary and
MS-XLS BIFF8), so the tabular slice parses directly:

- CFB: 512-byte header, DIFAT -> FAT sector chains, 128-byte
  directory entries, mini-stream (FAT of 64-byte sectors inside the
  root entry's chain) for streams under the 4096-byte cutoff.
- BIFF8 Workbook stream: globals substream (SST shared strings with
  CONTINUE splits that restart the compression flag per fragment,
  BOUNDSHEET sheet directory) + one substream per sheet (LABELSST /
  NUMBER / RK / MULRK / LABEL / BOOLERR cells).

Scope: cell VALUES (the tabular slice GDAL exposes) — cached formula
results, charts, rich-text runs and 1904-date-mode handling are out;
formulas are skipped loudly in the docstring sense (their cells read
as null). Typing/header conventions match ``read_xlsx``.

Single-node parse like the reference's GDAL funnel; convert to
parquet at scale.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


def _cfb_open(raw: bytes) -> dict:
    if raw[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise ValueError("not a CFB (.xls) file: bad magic")
    sec_shift = struct.unpack("<H", raw[30:32])[0]
    mini_shift = struct.unpack("<H", raw[32:34])[0]
    ssz, msz = 1 << sec_shift, 1 << mini_shift
    n_fat = struct.unpack("<I", raw[44:48])[0]
    first_dir = struct.unpack("<I", raw[48:52])[0]
    cutoff = struct.unpack("<I", raw[56:60])[0]
    first_minifat = struct.unpack("<I", raw[60:64])[0]
    n_minifat = struct.unpack("<I", raw[64:68])[0]
    first_difat = struct.unpack("<I", raw[68:72])[0]

    def sector(n: int) -> bytes:
        # MS-CFB §2.2: sector 0 begins one full sector after offset 0 —
        # (n+1)*ssz, not 512+n*ssz. Identical for the usual v3 512-byte
        # sectors, but a v4 file (4096-byte sectors, legal CFB) read
        # garbage offsets under the old arithmetic.
        off = (n + 1) * ssz
        return raw[off:off + ssz]

    difat = list(struct.unpack("<109I", raw[76:512]))
    nxt = first_difat
    while nxt not in (_FREE, _ENDOFCHAIN):
        s = sector(nxt)
        vals = struct.unpack(f"<{ssz // 4}I", s)
        difat.extend(vals[:-1])
        nxt = vals[-1]
    fat: list[int] = []
    for fs in difat[:n_fat]:
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    def chain(start: int) -> bytes:
        out, n = [], start
        seen = 0
        while n not in (_FREE, _ENDOFCHAIN):
            out.append(sector(n))
            n = fat[n]
            seen += 1
            if seen > len(fat) + 1:
                raise ValueError("CFB FAT chain cycle")
        return b"".join(out)

    dir_raw = chain(first_dir)
    entries = []
    for off in range(0, len(dir_raw), 128):
        e = dir_raw[off:off + 128]
        if len(e) < 128:
            break
        nlen = struct.unpack("<H", e[64:66])[0]
        if nlen < 2:
            continue
        name = e[:nlen - 2].decode("utf-16-le", "replace")
        otype = e[66]
        start = struct.unpack("<I", e[116:120])[0]
        size = struct.unpack("<Q", e[120:128])[0]
        entries.append((name, otype, start, size))
    if not entries:
        raise ValueError("CFB: empty directory")
    root = entries[0]
    mini_raw = chain(root[2])[:root[3]] if root[3] else b""
    minifat: list[int] = []
    n = first_minifat
    cnt = 0
    while n not in (_FREE, _ENDOFCHAIN) and cnt < n_minifat:
        minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(n)))
        n = fat[n]
        cnt += 1

    def mini_chain(start: int) -> bytes:
        out, m = [], start
        seen = 0
        while m not in (_FREE, _ENDOFCHAIN):
            out.append(mini_raw[m * msz:(m + 1) * msz])
            m = minifat[m]
            seen += 1
            if seen > max(len(minifat), 1) + 1:
                raise ValueError("CFB miniFAT chain cycle")
        return b"".join(out)

    def stream(name_options: tuple[str, ...]) -> bytes:
        for nm, otype, start, size in entries:
            if otype == 2 and nm in name_options:
                data = (
                    chain(start) if size >= cutoff else mini_chain(start)
                )
                return data[:size]
        raise ValueError(
            f"CFB: no stream named {name_options} "
            f"(have {[e[0] for e in entries]})"
        )

    return {"stream": stream}


def _records(stream: bytes):
    """Yield (opcode, data) BIFF records; opcode 0 terminates (zero
    padding after the final EOF)."""
    off = 0
    while off + 4 <= len(stream):
        op, ln = struct.unpack("<HH", stream[off:off + 4])
        if op == 0:
            return
        yield op, stream[off + 4:off + 4 + ln], off
        off += 4 + ln


class _Frags:
    """Cursor over SST + CONTINUE data fragments. Strings split at a
    fragment boundary restart with a fresh compression flag byte (the
    BIFF8 CONTINUE rule)."""

    def __init__(self, frags: list[bytes]):
        self.frags = frags
        self.fi = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.frags[self.fi]) - self.off

    def _advance(self):
        self.fi += 1
        self.off = 0

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0:
            if self._avail() == 0:
                self._advance()
                continue
            take = min(n, self._avail())
            f = self.frags[self.fi]
            out += f[self.off:self.off + take]
            self.off += take
            n -= take
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        grbit = self.read(1)[0]
        rich = bool(grbit & 0x08)
        ext = bool(grbit & 0x04)
        wide = bool(grbit & 0x01)
        c_run = struct.unpack("<H", self.read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", self.read(4))[0] if ext else 0
        chars = []
        remaining = cch
        while remaining > 0:
            if self._avail() == 0:
                self._advance()
                # continued string fragment re-declares its width
                wide = bool(self.read(1)[0] & 0x01)
            width = 2 if wide else 1
            take = min(remaining, self._avail() // width)
            if take == 0:
                # fragment too short for one char (malformed); skip on
                raise ValueError("SST: truncated string fragment")
            b = self.read(take * width)
            chars.append(
                b.decode("utf-16-le") if wide else b.decode("latin-1")
            )
            remaining -= take
        self.read(4 * c_run + cb_ext)
        return "".join(chars)


def _rk_value(rk: int) -> float:
    f_x100 = rk & 0x01
    f_int = rk & 0x02
    if f_int:
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFF))[0] >> 2)
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if f_x100 else v


def _parse_workbook(stream: bytes):
    """-> (sst list, [(sheet_name, abs_offset)])."""
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []
    it = _records(stream)
    for op, data, off in it:
        if op == 0x0085:  # BOUNDSHEET
            pos = struct.unpack("<I", data[:4])[0]
            nlen = data[6]
            wide = data[7] & 0x01
            raw = data[8:8 + nlen * (2 if wide else 1)]
            name = raw.decode("utf-16-le") if wide else raw.decode("latin-1")
            sheets.append((name, pos))
        elif op == 0x00FC:  # SST
            frags = [data]
            # collect following CONTINUEs (they belong to the SST)
            it2 = _records(stream[off + 4 + len(data):])
            for op2, d2, _ in it2:
                if op2 == 0x003C:
                    frags.append(d2)
                else:
                    break
            cur = _Frags(frags)
            cur.read(4)  # cstTotal
            n_unique = struct.unpack("<I", cur.read(4))[0]
            for _ in range(n_unique):
                sst.append(cur.read_string())
        elif op == 0x000A:  # EOF of globals
            break
    return sst, sheets


def _parse_sheet(stream: bytes, offset: int, sst: list[str]) -> list[list]:
    cells: dict[tuple[int, int], object] = {}
    max_r = max_c = -1

    def put(r, c, v):
        nonlocal max_r, max_c
        cells[(r, c)] = v
        max_r, max_c = max(max_r, r), max(max_c, c)

    for op, data, _ in _records(stream[offset:]):
        if op == 0x000A:  # EOF of this substream
            break
        if op == 0x00FD:  # LABELSST
            r, c, _ixfe, isst = struct.unpack("<HHHI", data[:10])
            put(r, c, sst[isst])
        elif op == 0x0203:  # NUMBER
            r, c, _ixfe = struct.unpack("<HHH", data[:6])
            put(r, c, struct.unpack("<d", data[6:14])[0])
        elif op == 0x027E:  # RK
            r, c, _ixfe, rk = struct.unpack("<HHHI", data[:10])
            put(r, c, _rk_value(rk))
        elif op == 0x00BD:  # MULRK
            r, c0 = struct.unpack("<HH", data[:4])
            last = struct.unpack("<H", data[-2:])[0]
            for i in range(last - c0 + 1):
                rk = struct.unpack("<I", data[4 + i * 6 + 2:4 + i * 6 + 6])[0]
                put(r, c0 + i, _rk_value(rk))
        elif op == 0x0205:  # BOOLERR
            r, c, _ixfe, val, is_err = struct.unpack("<HHHBB", data[:8])
            if not is_err:
                put(r, c, bool(val))
        elif op == 0x0204:  # LABEL (inline BIFF8 unicode string)
            r, c, _ixfe, cch = struct.unpack("<HHHH", data[:8])
            wide = data[8] & 0x01
            raw = data[9:9 + cch * (2 if wide else 1)]
            put(r, c, raw.decode("utf-16-le") if wide else raw.decode("latin-1"))
        # BLANK/FORMULA/ROW/DIMENSION/XF etc.: no cell value
    rows = []
    for r in range(max_r + 1):
        rows.append([cells.get((r, c)) for c in range(max_c + 1)])
    return rows


def read_xls(
    spark: SparkSession, path: str, *, sheet: int | str = 1, header: bool = True
) -> DataFrame:
    """Read one worksheet of a legacy .xls into a DataFrame. ``sheet``
    is a 1-based index or a sheet NAME; typing and header conventions
    match ``read_xlsx``."""
    raw = open(path, "rb").read()
    stream = _cfb_open(raw)["stream"](("Workbook", "Book"))
    sst, sheets = _parse_workbook(stream)
    if not sheets:
        raise ValueError(f"{path}: no BOUNDSHEET records")
    if isinstance(sheet, int):
        if not 1 <= sheet <= len(sheets):
            raise ValueError(f"sheet {sheet} of {len(sheets)}")
        name, off = sheets[sheet - 1]
    else:
        match = [s for s in sheets if s[0] == sheet]
        if not match:
            raise ValueError(f"no sheet named {sheet!r} in {[s[0] for s in sheets]}")
        name, off = match[0]
    rows = _parse_sheet(stream, off, sst)
    if not rows:
        raise ValueError(f"empty worksheet {name!r} in {path}")
    from pg_lake_spark.sources.xlsx import _rows_to_df

    return _rows_to_df(spark, rows, header)
