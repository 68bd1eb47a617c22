"""Dependency-free ESRI Shapefile reader (.shp + .dbf → WKB + attributes).

The reference reads shapefiles through GDAL (docs/file-formats-
reference.md: `.shp | Shapefile`; docs/spatial.md's zip_path example is
a shapefile). GDAL isn't available here, and the two on-disk formats are
simple enough to parse directly from their public specs:

- ``.shp`` (ESRI Shapefile spec): 100-byte header, then records of
  (big-endian record number + content length, little-endian shape).
  Supported shapes: Point (1), PolyLine (3), Polygon (5), MultiPoint
  (8) and their Z/M variants (the trailing Z/M arrays are skipped —
  geometry is 2D, matching the engine's WKB slice).
- ``.dbf`` (dBase III): fixed-width records described by 32-byte field
  descriptors. Types C (string), N/F (numeric), L (logical), D (date
  string) map to Spark string/long/double/boolean/string.

Polygon assembly follows the spec's ring-orientation rule: clockwise
rings are outer, counter-clockwise rings are holes, holes attach to the
outer ring whose bbox contains them; multiple outers → MULTIPOLYGON.

Scale: a shapefile is a single unsplittable binary (same single-node
funnel the reference's GDAL path has); parsing is driver-side into an
Arrow-backed DataFrame. At real scale, convert once to (Geo)Parquet and
scan that.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.functions.spatial import (
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    WKB_MULTIPOINT,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    _pack,
    _pack_point,
    _pack_polygon,
    _ring_area,
)

_SHAPE_NULL = 0
_POINTS = {1, 11, 21}
_POLYLINES = {3, 13, 23}
_POLYGONS = {5, 15, 25}
_MULTIPOINTS = {8, 18, 28}


def _read_parts_points(buf: bytes, off: int) -> tuple[list[list[tuple[float, float]]], int]:
    nparts, npoints = struct.unpack_from("<ii", buf, off + 32)
    off += 40
    parts = list(struct.unpack_from(f"<{nparts}i", buf, off))
    off += 4 * nparts
    vals = struct.unpack_from(f"<{2 * npoints}d", buf, off)
    off += 16 * npoints
    pts = [(vals[2 * i], vals[2 * i + 1]) for i in range(npoints)]
    bounds = parts + [npoints]
    return [pts[bounds[i] : bounds[i + 1]] for i in range(nparts)], off


def _assemble_polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    """Spec rule: CW ring = outer, CCW = hole inside some outer."""
    outers: list[list[list[tuple[float, float]]]] = []
    holes: list[list[tuple[float, float]]] = []
    for r in rings:
        (outers if _ring_area(r) <= 0 else holes).append([r] if _ring_area(r) <= 0 else r)
    if not outers:  # malformed orientation: treat every ring as an outer
        outers = [[r] for r in rings]
        holes = []

    def bbox(r):
        xs = [p[0] for p in r]
        ys = [p[1] for p in r]
        return min(xs), min(ys), max(xs), max(ys)

    for h in holes:
        hx0, hy0, hx1, hy1 = bbox(h)
        target = None
        for poly in outers:
            x0, y0, x1, y1 = bbox(poly[0])
            if x0 <= hx0 and y0 <= hy0 and x1 >= hx1 and y1 >= hy1:
                target = poly
                break
        (target if target is not None else outers[0]).append(h)
    if len(outers) == 1:
        return _pack_polygon(outers[0])
    return _pack(WKB_MULTIPOLYGON, [(5, poly) for poly in outers])


def _shape_to_wkb(buf: bytes) -> bytes | None:
    (stype,) = struct.unpack_from("<i", buf, 0)
    if stype == _SHAPE_NULL:
        return None
    if stype in _POINTS:
        x, y = struct.unpack_from("<dd", buf, 4)
        return _pack_point(x, y)
    if stype in _MULTIPOINTS:
        (n,) = struct.unpack_from("<i", buf, 36)
        vals = struct.unpack_from(f"<{2 * n}d", buf, 40)
        kids = [(WKB_POINT, [(vals[2 * i], vals[2 * i + 1])]) for i in range(n)]
        return _pack(WKB_MULTIPOINT, kids)
    if stype in _POLYLINES:
        parts, _ = _read_parts_points(buf, 4)
        if len(parts) == 1:
            return _pack(WKB_LINESTRING, parts[0])
        return _pack(WKB_MULTILINESTRING, [(WKB_LINESTRING, p) for p in parts])
    if stype in _POLYGONS:
        rings, _ = _read_parts_points(buf, 4)
        return _assemble_polygon(rings)
    raise ValueError(f"unsupported shapefile shape type {stype}")


def _parse_shp(path: str) -> list[bytes | None]:
    with open(path, "rb") as fh:
        data = fh.read()
    (magic,) = struct.unpack_from(">i", data, 0)
    if magic != 9994:
        raise ValueError(f"{path} is not a shapefile (bad magic {magic})")
    out: list[bytes | None] = []
    off = 100
    while off + 8 <= len(data):
        _recno, clen = struct.unpack_from(">ii", data, off)
        off += 8
        out.append(_shape_to_wkb(data[off : off + 2 * clen]))
        off += 2 * clen
    return out


def _parse_dbf(path: str) -> tuple[list[tuple[str, str]], list[list]]:
    """→ ([(name, spark_type)], rows). Deleted records are skipped."""
    with open(path, "rb") as fh:
        data = fh.read()
    nrec, hsize, rsize = struct.unpack_from("<IHH", data, 4)
    fields = []
    off = 32
    while off < hsize - 1 and data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fdec = data[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    rows: list[list] = []
    off = hsize
    for _ in range(nrec):
        if off + rsize > len(data):
            break
        rec = data[off : off + rsize]
        off += rsize
        if rec[0:1] == b"*":  # deleted
            continue
        vals: list = []
        p = 1
        for _name, ftype, flen, fdec in fields:
            raw = rec[p : p + flen].decode("latin-1").strip()
            p += flen
            if ftype in ("N", "F"):
                if not raw or raw.startswith("*"):
                    # dBase fills a numeric field with '*' on overflow —
                    # that is a missing value, not a parse crash
                    vals.append(None)
                elif fdec or ftype == "F" or "." in raw:
                    vals.append(float(raw))
                else:
                    vals.append(int(raw))
            elif ftype == "L":
                # '' is a substring of every string — a blank ('?' /
                # uninitialized) logical must stay NULL, not True
                vals.append(
                    True if raw and raw in "TtYy"
                    else False if raw and raw in "FfNn"
                    else None
                )
            else:  # C, D and anything else → string
                vals.append(raw or None)
        rows.append(vals)

    def spark_type(ftype: str, fdec: int) -> str:
        if ftype in ("N", "F"):
            return "double" if (fdec or ftype == "F") else "bigint"
        if ftype == "L":
            return "boolean"
        return "string"

    return [(n, spark_type(t, d)) for n, t, _l, d in fields], rows


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """Read ``x.shp`` (+ sibling ``x.dbf`` attributes when present) into
    a DataFrame: attribute columns followed by ``geometry`` (WKB) —
    feed any st_* function or the grid-bucketed bbox join."""
    shapes = _parse_shp(path)
    dbf = os.path.splitext(path)[0] + ".dbf"
    if os.path.exists(dbf):
        fields, rows = _parse_dbf(dbf)
        if len(rows) != len(shapes):
            raise ValueError(
                f"{path}: {len(shapes)} shapes but {len(rows)} dbf records"
            )
    else:
        fields, rows = [], [[] for _ in shapes]
    ddl = ", ".join([f"`{n}` {t}" for n, t in fields] + ["geometry binary"])
    return spark.createDataFrame(
        [(*r, s) for r, s in zip(rows, shapes)], ddl
    )
