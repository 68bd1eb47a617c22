"""Dependency-free MapInfo MIF/MID reader — pure text parse.

Reference: GDAL's MapInfo driver (docs/file-formats-reference.md:
`.mif .mit .tab | MapInfo datasets`). ``.tab`` is MapInfo's binary
native form (out of reach), but ``.mif`` is the documented TEXT
interchange format: a header (Version/Delimiter/Columns) followed by
one geometry record per feature — ``POINT x y``, ``LINE x1 y1 x2 y2``,
``PLINE [MULTIPLE n] count pts…``, ``REGION nrings (count pts…)*`` —
with attributes in the sibling ``.mid`` file, delimiter-separated, one
row per feature in the same order.

Output: attribute columns (typed from the Columns block: integer/
smallint → bigint, float/decimal → double, logical → boolean, else
string) + ``geometry`` WKB. REGION rings follow MapInfo's convention
(each ring listed once; holes are rings contained in an earlier ring's
bbox — same assembly rule as the shapefile reader).
Single-node parse like every GDAL-funnel format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.functions.spatial import (
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    _pack,
    _pack_linestring,
    _pack_point,
)
from pg_lake_spark.sources.shapefile import _assemble_polygon


def _parse_mif(path: str):
    with open(path, errors="replace") as fh:
        lines = [ln.strip() for ln in fh]
    delim = "\t"
    columns: list[tuple[str, str]] = []
    i = 0
    n = len(lines)
    # ---- header ----
    while i < n:
        up = lines[i].upper()
        if up.startswith("DELIMITER"):
            q = lines[i].split(None, 1)[1].strip().strip('"')
            delim = q or delim
        elif up.startswith("COLUMNS"):
            ncols = int(lines[i].split()[1])
            for j in range(1, ncols + 1):
                name, ctype = lines[i + j].split(None, 1)
                columns.append((name, ctype.strip().lower()))
            i += ncols
        elif up == "DATA":
            i += 1
            break
        i += 1

    def floats(tokens):
        return [float(t) for t in tokens]

    geoms: list[bytes | None] = []
    while i < n:
        ln = lines[i]
        if not ln:
            i += 1
            continue
        up = ln.upper()
        tok = ln.split()
        if up.startswith("POINT"):
            x, y = floats(tok[1:3])
            geoms.append(_pack_point(x, y))
            i += 1
        elif up.startswith("LINE "):
            x1, y1, x2, y2 = floats(tok[1:5])
            geoms.append(_pack_linestring([(x1, y1), (x2, y2)]))
            i += 1
        elif up.startswith("PLINE"):
            i += 1
            nsect = 1
            if len(tok) >= 3 and tok[1].upper() == "MULTIPLE":
                nsect = int(tok[2])
            elif len(tok) >= 2 and tok[1].isdigit():
                # count on the PLINE line itself (single section shortcut)
                cnt = int(tok[1])
                pts = []
                for _ in range(cnt):
                    xs = lines[i].split()
                    pts.append((float(xs[0]), float(xs[1])))
                    i += 1
                geoms.append(_pack_linestring(pts))
                continue
            sections = []
            for _ in range(nsect):
                cnt = int(lines[i].split()[0])
                i += 1
                pts = []
                for _ in range(cnt):
                    xs = lines[i].split()
                    pts.append((float(xs[0]), float(xs[1])))
                    i += 1
                sections.append(pts)
            if len(sections) == 1:
                geoms.append(_pack_linestring(sections[0]))
            else:
                geoms.append(
                    _pack(WKB_MULTILINESTRING, [(WKB_LINESTRING, s) for s in sections])
                )
        elif up.startswith("REGION"):
            nrings = int(tok[1])
            i += 1
            rings = []
            for _ in range(nrings):
                cnt = int(lines[i].split()[0])
                i += 1
                pts = []
                for _ in range(cnt):
                    xs = lines[i].split()
                    pts.append((float(xs[0]), float(xs[1])))
                    i += 1
                if pts and pts[0] != pts[-1]:
                    pts.append(pts[0])
                rings.append(pts)
            geoms.append(_assemble_polygon(rings))
        elif up.startswith("NONE"):
            geoms.append(None)
            i += 1
        elif up.startswith(("PEN", "BRUSH", "SYMBOL", "SMOOTH", "CENTER")):
            i += 1  # styling clauses — ignored
        else:
            i += 1
    return delim, columns, geoms


def _mid_rows(path: str, delim: str, columns: list[tuple[str, str]]):
    def conv(v: str, ctype: str):
        v = v.strip().strip('"')
        if v == "":
            return None
        if ctype.startswith(("integer", "smallint")):
            return int(v)
        if ctype.startswith(("float", "decimal")):
            return float(v)
        if ctype.startswith("logical"):
            return v.upper() in ("T", "TRUE", "1")
        return v

    import csv

    rows = []
    # csv-quoted parse, not a naive split: MID strings are quoted and
    # may CONTAIN the delimiter — split() broke the row there, and the
    # zip() silently truncated, misaligning every later column.
    with open(path, errors="replace", newline="") as fh:
        for lineno, parts in enumerate(
            csv.reader(fh, delimiter=delim, quotechar='"'), start=1
        ):
            if not parts:
                continue
            if len(parts) != len(columns):
                raise ValueError(
                    f"{path}:{lineno}: {len(parts)} fields, "
                    f"expected {len(columns)}"
                )
            rows.append([conv(v, t) for v, (_n, t) in zip(parts, columns)])
    return rows


def read_mif(spark: SparkSession, path: str) -> DataFrame:
    """Read ``x.mif`` (+ sibling ``x.mid`` attributes when present)."""
    delim, columns, geoms = _parse_mif(path)
    mid = os.path.splitext(path)[0] + ".mid"
    if columns and os.path.exists(mid):
        rows = _mid_rows(mid, delim, columns)
        if len(rows) != len(geoms):
            raise ValueError(f"{path}: {len(geoms)} geometries but {len(rows)} mid rows")
    else:
        columns, rows = [], [[] for _ in geoms]

    def spark_type(ctype: str) -> str:
        if ctype.startswith(("integer", "smallint")):
            return "bigint"
        if ctype.startswith(("float", "decimal")):
            return "double"
        if ctype.startswith("logical"):
            return "boolean"
        return "string"

    ddl = ", ".join(
        [f"`{n}` {spark_type(t)}" for n, t in columns] + ["geometry binary"]
    )
    return spark.createDataFrame([(*r, g) for r, g in zip(rows, geoms)], ddl)
