"""Dependency-free .xlsx reader — stdlib zipfile + xml.etree.

Reference: GDAL's XLSX driver (docs/file-formats-reference.md:
`.xls .xlsx | Excel files`). An .xlsx is a zip of OOXML parts; the
cells live in ``xl/worksheets/sheetN.xml`` with shared strings in
``xl/sharedStrings.xml`` — enough spec surface to read tabular sheets
without openpyxl (which this sandbox lacks; .xls binary BIFF is not
supported).

Typing: numeric cells stay double (Excel numbers are IEEE doubles —
dates too, by design), booleans map to boolean, everything else is
string; a column whose every non-null value is numeric/boolean gets
that type, else string (the CSV-sniffer convention). First row becomes
the header by default.

Single-node parse like the reference's GDAL funnel; convert to parquet
at scale.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import DataFrame, SparkSession

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _sheet_rows(zf: zipfile.ZipFile, member: str, shared: list[str]) -> list[list]:
    root = ET.fromstring(zf.read(member))
    rows: list[list] = []
    for row_el in root.iter():
        if _local(row_el.tag) != "row":
            continue
        cells: dict[int, object] = {}
        for c in row_el:
            if _local(c.tag) != "c":
                continue
            ref = c.get("r", "")
            m = _CELL_REF.match(ref)
            idx = _col_index(m.group(1)) if m else len(cells)
            ctype = c.get("t", "n")
            v_el = next((x for x in c if _local(x.tag) == "v"), None)
            is_el = next((x for x in c if _local(x.tag) == "is"), None)
            if ctype == "inlineStr" and is_el is not None:
                cells[idx] = "".join(
                    t.text or "" for t in is_el.iter() if _local(t.tag) == "t"
                )
                continue
            if v_el is None or v_el.text is None:
                cells[idx] = None
                continue
            raw = v_el.text
            if ctype == "s":
                cells[idx] = shared[int(raw)]
            elif ctype == "b":
                cells[idx] = raw == "1"
            elif ctype in ("str", "e"):
                cells[idx] = raw
            else:  # numeric
                cells[idx] = float(raw)
        if cells:
            width = max(cells) + 1
            rows.append([cells.get(i) for i in range(width)])
    return rows


def read_xlsx(
    spark: SparkSession, path: str, *, sheet: int | str = 1, header: bool = True
) -> DataFrame:
    """Read one worksheet into a DataFrame. ``sheet`` is a 1-based index
    or a worksheet part name; ``header=True`` takes row 1 as column
    names (else columns are ``c0..cN``)."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root:
                shared.append(
                    "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")
                )
        member = (
            f"xl/worksheets/sheet{sheet}.xml"
            if isinstance(sheet, int)
            else f"xl/worksheets/{sheet}.xml"
        )
        if member not in names:
            raise FileNotFoundError(f"{member} not in {path}")
        rows = _sheet_rows(zf, member, shared)
    if not rows:
        raise ValueError(f"empty worksheet in {path}")
    return _rows_to_df(spark, rows, header)


def _rows_to_df(spark: SparkSession, rows: list[list], header: bool) -> DataFrame:
    """Shared typing/header tail for the Excel readers (.xlsx and the
    BIFF8 .xls reader in ``sources/xls.py``)."""
    if header:
        cols = [str(v) if v is not None else f"c{i}" for i, v in enumerate(rows[0])]
        data = rows[1:]
    else:
        cols = [f"c{i}" for i in range(max(len(r) for r in rows))]
        data = rows
    width = len(cols)
    # pad short rows; truncate cells beyond the header width (a stray
    # value right of the table would otherwise break row arity)
    data = [(r + [None] * (width - len(r)))[:width] for r in data]

    def col_type(i: int) -> str:
        vals = [r[i] for r in data if r[i] is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            return "boolean"
        if vals and all(isinstance(v, float) for v in vals):
            return "double"
        return "string"

    types = [col_type(i) for i in range(width)]
    norm = [
        tuple(
            v if t != "string" or v is None else str(v)
            for v, t in zip(r, types)
        )
        for r in data
    ]
    ddl = ", ".join(f"`{c}` {t}" for c, t in zip(cols, types))
    return spark.createDataFrame(norm, ddl)
