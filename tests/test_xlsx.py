"""xlsx reader tests: a spec-shaped OOXML workbook hand-built with
zipfile (shared strings, inline strings, bools, blank cells)."""

from __future__ import annotations

import zipfile

import pytest

from pg_lake_spark.sources.xlsx import read_xlsx

_SHEET = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1">
   <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
   <c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
  </row>
  <row r="2">
   <c r="A2" t="s"><v>4</v></c><c r="B2"><v>12.5</v></c>
   <c r="C2" t="b"><v>1</v></c><c r="D2" t="inlineStr"><is><t>inline!</t></is></c>
  </row>
  <row r="3">
   <c r="A3" t="s"><v>5</v></c><c r="B3"><v>-3</v></c>
   <c r="C3" t="b"><v>0</v></c>
  </row>
 </sheetData>
</worksheet>
"""

_SST = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
 <si><t>name</t></si><si><t>score</t></si><si><t>ok</t></si><si><t>note</t></si>
 <si><t>alice</t></si><si><t>bob</t></si>
</sst>
"""


def _write_xlsx(path: str):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/sharedStrings.xml", _SST)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET)
        zf.writestr("[Content_Types].xml", "<Types/>")


def test_xlsx_reader(spark, tmp_path):
    p = str(tmp_path / "book.xlsx")
    _write_xlsx(p)
    df = read_xlsx(spark, p)
    assert df.columns == ["name", "score", "ok", "note"]
    assert dict(df.dtypes) == {
        "name": "string", "score": "double", "ok": "boolean", "note": "string",
    }
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [
        ("alice", 12.5, True, "inline!"),
        ("bob", -3.0, False, None),  # short row padded with NULL
    ]
    # headerless mode + read_lake integration
    from pg_lake_spark.sources.readers import read_lake

    df2 = read_lake(spark, p, fmt="xlsx", header="false")
    assert df2.columns == ["c0", "c1", "c2", "c3"] and df2.count() == 3
    with pytest.raises(FileNotFoundError, match="sheet9"):
        read_xlsx(spark, p, sheet=9)
