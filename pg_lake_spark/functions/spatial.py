"""Dependency-free spatial slice over WKB geometries.

The reference ships ~90 shippable ``st_*`` functions by delegating to
DuckDB's spatial extension (pg_lake_engine/src/pgduck/
shippable_spatial_functions.c:56-455, shippable_spatial_operators.c) and
detects GeoParquet geometry columns (pg_lake_engine/src/parquet/
geoparquet.c). No geometry library exists in this environment, so this
module re-implements the geometry-library-free subset directly over the
WKB wire format (the same representation the reference's type uses):

- constructors: st_point, st_makeline, st_makepolygon, st_collect
  (aggregate), st_geomfromtext, st_geomfromwkb, st_geomfromgeojson,
  st_makeenvelope, st_buffer (point → regular polygon)
- accessors: st_x, st_y, st_astext, st_asbinary, st_asgeojson,
  st_geometrytype, st_npoints (any type) / st_numpoints
  (LINESTRING-only, PostGIS), st_numgeometries,
  st_geometryn, st_startpoint, st_endpoint, st_pointn, st_srid,
  st_dimension, st_isempty, st_isclosed, st_isvalid (structural),
  st_orderingequals
- measures: st_length, st_perimeter, st_area (shoelace, holes
  subtracted), st_distance (point-point), st_dwithin, st_centroid
- envelope/bbox: st_envelope per-row, st_extent/st_extent_agg the
  PostGIS aggregate (struct xmin/ymin/xmax/ymax —
  the same bbox the reference reads from GeoParquet covering metadata,
  pg_lake_table/src/describe/describe.c:225), st_expand, bbox_area,
  plus pure-expression predicates bbox_contains / bbox_intersects /
  bbox_within / bbox_disjoint and bbox_contains_point.
- transforms: st_reverse, st_flipcoordinates, st_translate, st_force2d
- SQL surface: :func:`register_spatial_sql` registers the kernel-backed
  subset for ``spark.sql``.

Execution model: WKB pack/parse cannot be expressed with built-in
Column functions (no IEEE-754 byte access), so the kernels are
Arrow-batched pandas UDFs with numpy-vectorized fast paths for the
dominant all-points case; every predicate/measure that CAN be a plain
Column expression (bbox logic, distance given coordinates) is one, so
joins and filters stay JVM-side and Catalyst-visible. Geometry values
are opaque ``binary`` columns — partitioning, stats, and shuffles treat
them like any other binary payload, which is exactly how the reference
stores geometry in parquet.

Supported geometry types: POINT (1), LINESTRING (2), POLYGON (3),
MULTIPOINT (4), MULTILINESTRING (5), MULTIPOLYGON (6); 2D, both WKB
byte orders on read, little-endian on write, SRID-less (st_srid
returns 0 as PostGIS does for unset SRID).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# pandas_udf return types as DataType objects: DDL-string parsing needs an
# active SparkContext, which doesn't exist at module import time.
_XY_T = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])
_ENV_T = StructType(
    [
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
    ]
)
_INFO_T = StructType(
    [
        StructField("gtype", StringType()),
        StructField("npoints", IntegerType()),
        StructField("length", DoubleType()),
        StructField("closed", BooleanType()),
        StructField("dim", IntegerType()),
        StructField("empty", BooleanType()),
    ]
)

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7
# collection-shaped types: coords = [(child_type, child_coords), ...] —
# GEOMETRYCOLLECTION (heterogeneous children) rides the same recursion
_MULTI_TYPES = (
    WKB_MULTIPOINT,
    WKB_MULTILINESTRING,
    WKB_MULTIPOLYGON,
    WKB_GEOMETRYCOLLECTION,
)

_TYPE_NAMES = {
    WKB_POINT: "ST_Point",
    WKB_LINESTRING: "ST_LineString",
    WKB_POLYGON: "ST_Polygon",
    WKB_MULTIPOINT: "ST_MultiPoint",
    WKB_MULTILINESTRING: "ST_MultiLineString",
    WKB_MULTIPOLYGON: "ST_MultiPolygon",
    WKB_GEOMETRYCOLLECTION: "ST_GeometryCollection",
}
# PostGIS GeometryType()/ST_GeometryType naming
_WKT_NAMES = {
    WKB_POINT: "POINT",
    WKB_LINESTRING: "LINESTRING",
    WKB_POLYGON: "POLYGON",
    WKB_MULTIPOINT: "MULTIPOINT",
    WKB_MULTILINESTRING: "MULTILINESTRING",
    WKB_MULTIPOLYGON: "MULTIPOLYGON",
    WKB_GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}


# ---------------------------------------------------------------------------
# python-side WKB codec (runs inside Arrow batches)
# ---------------------------------------------------------------------------

def _pack_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def _pack_linestring(coords: list[tuple[float, float]]) -> bytes:
    out = struct.pack("<BII", 1, WKB_LINESTRING, len(coords))
    for x, y in coords:
        out += struct.pack("<dd", x, y)
    return out


def _pack_polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    out = struct.pack("<BII", 1, WKB_POLYGON, len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<dd", x, y)
    return out


def _wkb_dims(raw_type: int) -> tuple[int, bool, bool]:
    """Decode an ISO (type + 1000Z/2000M/3000ZM) or EWKB (0x80000000 Z,
    0x40000000 M flag bits) type word → (base_type, has_z, has_m)."""
    has_z = bool(raw_type & 0x80000000)
    has_m = bool(raw_type & 0x40000000)
    t = raw_type & 0x0FFFFFFF  # drop EWKB flag + srid-present bits
    if t >= 3000:
        return t - 3000, True, True
    if t >= 2000:
        return t - 2000, has_z, True
    if t >= 1000:
        return t - 1000, True, has_m
    return t, has_z, has_m


def _parse_at(b: bytes, off: int) -> tuple[int, list, int]:
    """Parse one WKB geometry at ``off`` → (geom_type, coords, next_off).
    coords: [(x,y)] for point/linestring, [[(x,y)]] for polygon, and a
    list of (child_type, child_coords) for MULTI* collections."""
    if len(b) < off + 5:
        raise ValueError("WKB too short")
    bo = "<" if b[off] == 1 else ">"
    (raw,) = struct.unpack_from(bo + "I", b, off + 1)
    gtype, has_z, has_m = _wkb_dims(raw)
    off += 5
    if raw & 0x20000000:  # EWKB embedded SRID: skip the 4-byte srid
        off += 4
    nd = 2 + has_z + has_m  # extra dims are read and dropped (XY slice)
    if gtype == WKB_POINT:
        vals = struct.unpack_from(bo + f"{nd}d", b, off)
        return gtype, [(vals[0], vals[1])], off + 8 * nd
    if gtype == WKB_LINESTRING:
        (n,) = struct.unpack_from(bo + "I", b, off)
        vals = struct.unpack_from(bo + f"{nd * n}d", b, off + 4)
        return (
            gtype,
            [(vals[nd * i], vals[nd * i + 1]) for i in range(n)],
            off + 4 + 8 * nd * n,
        )
    if gtype == WKB_POLYGON:
        (nr,) = struct.unpack_from(bo + "I", b, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", b, off)
            off += 4
            vals = struct.unpack_from(bo + f"{nd * n}d", b, off)
            off += 8 * nd * n
            rings.append([(vals[nd * i], vals[nd * i + 1]) for i in range(n)])
        return gtype, rings, off
    if gtype in _MULTI_TYPES:
        (n,) = struct.unpack_from(bo + "I", b, off)
        off += 4
        kids = []
        for _ in range(n):
            ktype, kcoords, off = _parse_at(b, off)
            kids.append((ktype, kcoords))
        return gtype, kids, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _parse(b: bytes) -> tuple[int, list]:
    gtype, coords, _ = _parse_at(b, 0)
    return gtype, coords


def _pack(gtype: int, coords: list) -> bytes:
    if gtype == WKB_POINT:
        return _pack_point(*coords[0])
    if gtype == WKB_LINESTRING:
        return _pack_linestring(coords)
    if gtype == WKB_POLYGON:
        return _pack_polygon(coords)
    out = struct.pack("<BII", 1, gtype, len(coords))
    for ktype, kcoords in coords:
        out += _pack(ktype, kcoords)
    return out


def _flat_coords(gtype: int, coords: list) -> list[tuple[float, float]]:
    if gtype == WKB_POLYGON:
        return [p for ring in coords for p in ring]
    if gtype in _MULTI_TYPES:
        return [p for kt, kc in coords for p in _flat_coords(kt, kc)]
    return coords


def _fmt_num(v: float) -> str:
    # non-finite coords are representable-but-invalid (st_isvalid says
    # so explicitly) — int(inf) raised and killed the whole Arrow batch
    # on one bad coordinate (r15 review)
    if not math.isfinite(v):
        return repr(v)  # 'inf' / '-inf' / 'nan'
    # PostGIS prints integral coordinates without the trailing .0
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _coords_wkt(gtype: int, coords: list) -> str:
    """The parenthesized coordinate body (no type tag)."""
    pts = lambda seq: ",".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in seq)  # noqa: E731
    if gtype == WKB_POINT:
        return f"({pts(coords)})"
    if gtype == WKB_LINESTRING:
        return f"({pts(coords)})"
    if gtype == WKB_POLYGON:
        return "(" + ",".join(f"({pts(r)})" for r in coords) + ")"
    # MULTI*: children's bodies joined (MULTIPOINT prints bare pairs)
    if gtype == WKB_MULTIPOINT:
        return "(" + pts([kc[0] for _kt, kc in coords]) + ")"
    if gtype == WKB_GEOMETRYCOLLECTION:
        return (
            "("
            + ",".join(_WKT_NAMES[kt] + _coords_wkt(kt, kc) for kt, kc in coords)
            + ")"
        )
    return "(" + ",".join(_coords_wkt(kt, kc) for kt, kc in coords) + ")"


def _to_wkt(b: bytes) -> str:
    gtype, coords = _parse(b)
    return _WKT_NAMES[gtype] + _coords_wkt(gtype, coords)


def _from_wkt(s: str) -> bytes:
    s = s.strip()
    up = s.upper()
    if "EMPTY" in up and "(" not in s.split("EMPTY")[0]:
        # 'POINT EMPTY' etc. previously crashed with a bare
        # "substring not found" from index('(') — refuse with a name
        raise ValueError(
            f"EMPTY geometries are not supported in this WKB slice: {s[:40]!r}"
        )

    def coords_of(body: str) -> list[tuple[float, float]]:
        return [
            (float(p.split()[0]), float(p.split()[1]))
            for p in body.split(",")
            if p.strip()
        ]

    if up.startswith("POINT"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        x, y = body.split()[:2]
        return _pack_point(float(x), float(y))
    if up.startswith("LINESTRING"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return _pack_linestring(coords_of(body))
    def rings_of(body: str) -> list[list[tuple[float, float]]]:
        rings = []
        depth = 0
        start = None
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
                start = i + 1
            elif ch == ")":
                depth -= 1
                rings.append(coords_of(body[start:i]))
        return rings

    def split_top(body: str) -> list[str]:
        """Split on commas at paren depth 0."""
        parts, depth, start = [], 0, 0
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(body[start:i])
                start = i + 1
        parts.append(body[start:])
        return [p.strip() for p in parts if p.strip()]

    if up.startswith("POLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return _pack_polygon(rings_of(body))
    if up.startswith("MULTIPOINT"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        kids = [
            (WKB_POINT, coords_of(p.strip("() ")))
            for p in split_top(body)
        ]
        return _pack(WKB_MULTIPOINT, kids)
    if up.startswith("MULTILINESTRING"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return _pack(
            WKB_MULTILINESTRING,
            [(WKB_LINESTRING, r) for r in rings_of(body)],
        )
    if up.startswith("MULTIPOLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        kids = []
        for poly in split_top(body):
            kids.append((WKB_POLYGON, rings_of(poly.strip()[1:-1])))
        return _pack(WKB_MULTIPOLYGON, kids)
    if up.startswith("GEOMETRYCOLLECTION"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        kids = [_parse(_from_wkt(child)) for child in split_top(body)]
        return _pack(WKB_GEOMETRYCOLLECTION, kids)
    raise ValueError(f"unsupported WKT: {s[:40]}")


_DIMS = {
    WKB_POINT: 0,
    WKB_LINESTRING: 1,
    WKB_POLYGON: 2,
    WKB_MULTIPOINT: 0,
    WKB_MULTILINESTRING: 1,
    WKB_MULTIPOLYGON: 2,
    # GEOMETRYCOLLECTION: computed as max over children (see _k_info)
}


def _length_of(gtype: int, coords: list) -> float:
    if gtype == WKB_POINT or gtype == WKB_MULTIPOINT:
        return 0.0
    if gtype == WKB_LINESTRING:
        return sum(
            math.hypot(x1 - x0, y1 - y0)
            for (x0, y0), (x1, y1) in zip(coords, coords[1:])
        )
    if gtype == WKB_POLYGON:
        return sum(_length_of(WKB_LINESTRING, r) for r in coords)
    return sum(_length_of(kt, kc) for kt, kc in coords)


def _closed_of(gtype: int, coords: list):
    if gtype == WKB_LINESTRING:
        return bool(coords) and coords[0] == coords[-1]
    if gtype == WKB_MULTILINESTRING:
        return all(_closed_of(kt, kc) for kt, kc in coords)
    if gtype in (WKB_POLYGON, WKB_MULTIPOLYGON):
        return True
    return None  # points: PostGIS returns true, but undefined here → null


# ---------------------------------------------------------------------------
# Arrow-batched kernels
# ---------------------------------------------------------------------------

@pandas_udf(BinaryType())
def _k_point(x: pd.Series, y: pd.Series) -> pd.Series:
    n = len(x)
    if n == 0:
        return pd.Series([], dtype=object)
    # errors="raise" (r16 ADVICE): the coordinate inputs are declared
    # numeric — a non-numeric value must fail loudly, not silently
    # become NaN (and thus NULL/False output). NULL/None still maps to
    # NaN, which the null-mask below handles.
    xv = pd.to_numeric(x, errors="raise").to_numpy(dtype="f8", na_value=np.nan)
    yv = pd.to_numeric(y, errors="raise").to_numpy(dtype="f8", na_value=np.nan)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.array([WKB_POINT, 0, 0, 0], dtype=np.uint8)
    buf[:, 5:13] = xv.astype("<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = yv.astype("<f8").view(np.uint8).reshape(n, 8)
    null = np.isnan(xv) | np.isnan(yv)
    rows = buf.tobytes()
    out = [None if null[i] else rows[21 * i : 21 * i + 21] for i in range(n)]
    return pd.Series(out, dtype=object)


def _all_le_points(vals: list) -> bool:
    return all(len(b) == 21 and b[0] == 1 and b[1] == WKB_POINT for b in vals if b is not None) and any(
        b is not None for b in vals
    )


@pandas_udf(_XY_T)
def _k_xy(g: pd.Series) -> pd.DataFrame:
    vals = list(g)
    n = len(vals)
    xs = np.full(n, np.nan)
    ys = np.full(n, np.nan)
    if n and _all_le_points(vals):
        # vectorized fast path: every non-null value is a LE WKB point
        idx = [i for i, b in enumerate(vals) if b is not None]
        mat = np.frombuffer(b"".join(vals[i] for i in idx), dtype=np.uint8).reshape(len(idx), 21)
        xs[idx] = mat[:, 5:13].copy().view("<f8").ravel()
        ys[idx] = mat[:, 13:21].copy().view("<f8").ravel()
    else:
        for i, b in enumerate(vals):
            if b is None:
                continue
            gtype, coords = _parse(bytes(b))
            if gtype != WKB_POINT:
                raise ValueError("st_x/st_y expect a POINT")
            xs[i], ys[i] = coords[0]
    return pd.DataFrame({"x": xs, "y": ys})


@pandas_udf(StringType())
def _k_astext(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _to_wkt(bytes(b)) for b in g], dtype=object
    )


@pandas_udf(BinaryType())
def _k_fromtext(s: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None else _from_wkt(str(v)) for v in s], dtype=object
    )


@pandas_udf(_ENV_T)
def _k_envelope(g: pd.Series) -> pd.DataFrame:
    n = len(g)
    out = np.full((n, 4), np.nan)
    for i, b in enumerate(g):
        if b is None:
            continue
        gtype, coords = _parse(bytes(b))
        pts = _flat_coords(gtype, coords)
        if pts:
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            out[i] = (min(xs), min(ys), max(xs), max(ys))
    return pd.DataFrame(
        {"xmin": out[:, 0], "ymin": out[:, 1], "xmax": out[:, 2], "ymax": out[:, 3]}
    )


@pandas_udf(_INFO_T)
def _k_info(g: pd.Series) -> pd.DataFrame:
    rows = []
    for b in g:
        if b is None:
            rows.append((None, None, None, None, None, None))
            continue
        gtype, coords = _parse(bytes(b))
        pts = _flat_coords(gtype, coords)
        rows.append(
            (
                _TYPE_NAMES[gtype],
                len(pts),
                _length_of(gtype, coords),
                _closed_of(gtype, coords) if pts else None,
                _DIMS.get(gtype, _dim_of(gtype, coords)),
                len(pts) == 0,
            )
        )
    return pd.DataFrame(
        rows, columns=["gtype", "npoints", "length", "closed", "dim", "empty"]
    )


@pandas_udf(BinaryType())
def _k_makeline(arr: pd.Series) -> pd.Series:
    out = []
    for pts in arr:
        if pts is None:
            out.append(None)
            continue
        coords = []
        for b in pts:
            if b is None:
                continue
            gtype, c = _parse(bytes(b))
            if gtype != WKB_POINT:
                raise ValueError("st_makeline expects POINT inputs")
            coords.append(c[0])
        out.append(_pack_linestring(coords) if coords else None)
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_pointn(g: pd.Series, n: pd.Series) -> pd.Series:
    out = []
    for b, k in zip(g, n):
        if b is None or k is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        if gtype != WKB_LINESTRING:
            out.append(None)  # PostGIS: NULL for non-linestring
            continue
        k = int(k)
        idx = k - 1 if k > 0 else len(coords) + k  # 1-based; negative from end
        if 0 <= idx < len(coords):
            out.append(_pack_point(*coords[idx]))
        else:
            out.append(None)
    return pd.Series(out, dtype=object)


def _centroid_parts(gtype: int, coords: list) -> tuple[int, float, float, float]:
    """(dim, weight, wx, wy): weight is count/length/|area| at the
    geometry's dimension; wx/wy = weight × centroid. Collections use
    the highest dimension present (PostGIS semantics). Degenerate
    shapes (zero-length line, zero-area polygon) fall to the vertex
    mean at dimension 0. The polygon branch is hole-aware — holes
    subtract mass (r15 review: the old kernel used the exterior ring
    only, and CRASHED on every MULTI*/GEOMETRYCOLLECTION input)."""
    if gtype == WKB_POINT:
        x, y = coords[0]
        return 0, 1.0, x, y
    if gtype == WKB_LINESTRING:
        tw = cx = cy = 0.0
        for (x0, y0), (x1, y1) in zip(coords, coords[1:]):
            w = math.hypot(x1 - x0, y1 - y0)
            tw += w
            cx += w * (x0 + x1) / 2
            cy += w * (y0 + y1) / 2
        if tw == 0:
            n = float(len(coords))
            return 0, n, float(sum(p[0] for p in coords)), float(sum(p[1] for p in coords))
        return 1, tw, cx, cy
    if gtype == WKB_POLYGON:
        ax = ay = aa = 0.0
        for ri, ring in enumerate(coords):
            a2 = cx = cy = 0.0
            for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
                w = x0 * y1 - x1 * y0
                a2 += w
                cx += (x0 + x1) * w
                cy += (y0 + y1) * w
            sign = 1.0 if ri == 0 else -1.0
            aa += sign * abs(a2)
            if a2 != 0:
                ax += sign * abs(a2) * (cx / (3 * a2))
                ay += sign * abs(a2) * (cy / (3 * a2))
        if aa == 0:
            pts = [p for r in coords for p in r]
            n = float(len(pts))
            return 0, n, float(sum(p[0] for p in pts)), float(sum(p[1] for p in pts))
        return 2, aa, ax, ay
    # MULTI* / GEOMETRYCOLLECTION: combine children at the top dimension
    parts = [_centroid_parts(kt, kc) for kt, kc in coords]
    if not parts:
        raise ValueError("centroid of an empty collection")
    top = max(d for d, _, _, _ in parts)
    tw = sum(w for d, w, _, _ in parts if d == top)
    wx = sum(x for d, _, x, _ in parts if d == top)
    wy = sum(y for d, _, _, y in parts if d == top)
    return top, tw, wx, wy


def _centroid_of(gtype: int, coords: list) -> tuple[float, float]:
    _, w, wx, wy = _centroid_parts(gtype, coords)
    return wx / w, wy / w


@pandas_udf(BinaryType())
def _k_centroid(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        out.append(_pack_point(*_centroid_of(*_parse(bytes(b)))))
    return pd.Series(out, dtype=object)


def _reverse_coords(gtype: int, coords: list) -> list:
    """Vertex-order reversal per geometry kind; MULTI*/collection
    recurses over children (the old else-branch treated collection
    coords as polygon rings and crashed on every MULTI* input — r15
    review)."""
    if gtype == WKB_POINT:
        return coords
    if gtype == WKB_LINESTRING:
        return coords[::-1]
    if gtype == WKB_POLYGON:
        return [r[::-1] for r in coords]
    return [(kt, _reverse_coords(kt, kc)) for kt, kc in coords]


def _flip_coords(gtype: int, coords: list) -> list:
    if gtype == WKB_POINT or gtype == WKB_LINESTRING:
        return [(y, x) for x, y in coords]
    if gtype == WKB_POLYGON:
        return [[(y, x) for x, y in r] for r in coords]
    return [(kt, _flip_coords(kt, kc)) for kt, kc in coords]


@pandas_udf(BinaryType())
def _k_reverse(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(_pack(gtype, _reverse_coords(gtype, coords)))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_flip(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(_pack(gtype, _flip_coords(gtype, coords)))
    return pd.Series(out, dtype=object)


_GEOJSON_BY_WKB = {
    WKB_POINT: "Point",
    WKB_LINESTRING: "LineString",
    WKB_POLYGON: "Polygon",
    WKB_MULTIPOINT: "MultiPoint",
    WKB_MULTILINESTRING: "MultiLineString",
    WKB_MULTIPOLYGON: "MultiPolygon",
    WKB_GEOMETRYCOLLECTION: "GeometryCollection",
}
_WKB_BY_GEOJSON = {v: k for k, v in _GEOJSON_BY_WKB.items()}


def _geojson_to_wkb(obj: dict) -> bytes:
    t = obj.get("type")
    if t == "GeometryCollection":
        kids = [_parse(_geojson_to_wkb(k)) for k in obj.get("geometries", [])]
        return _pack(WKB_GEOMETRYCOLLECTION, kids)
    c = obj.get("coordinates")
    if t == "Point":
        return _pack_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return _pack_linestring([(float(x), float(y)) for x, y, *_ in c])
    if t == "Polygon":
        return _pack_polygon(
            [[(float(x), float(y)) for x, y, *_ in ring] for ring in c]
        )
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        kid_t = {"MultiPoint": "Point", "MultiLineString": "LineString",
                 "MultiPolygon": "Polygon"}[t]
        kids = [
            _parse(_geojson_to_wkb({"type": kid_t, "coordinates": kc}))
            for kc in c
        ]
        return _pack(_WKB_BY_GEOJSON[t], kids)
    raise ValueError(f"unsupported GeoJSON geometry type: {t}")


def _geojson_coords(gtype: int, coords: list):
    if gtype == WKB_POINT:
        return list(coords[0])
    if gtype == WKB_LINESTRING:
        return [list(p) for p in coords]
    if gtype == WKB_POLYGON:
        return [[list(p) for p in r] for r in coords]
    # MULTI*: children's coordinate arrays (r15 review — everything
    # non-point/line fell into the Polygon branch and crashed on any
    # collection input, and would have mislabeled the type regardless)
    return [_geojson_coords(kt, kc) for kt, kc in coords]


def _wkb_to_geojson(b: bytes) -> str:
    import json as _json

    gtype, coords = _parse(b)
    if gtype == WKB_GEOMETRYCOLLECTION:
        return _json.dumps(
            {
                "type": "GeometryCollection",
                "geometries": [
                    _json.loads(_wkb_to_geojson(_pack(kt, kc)))
                    for kt, kc in coords
                ],
            }
        )
    return _json.dumps(
        {
            "type": _GEOJSON_BY_WKB[gtype],
            "coordinates": _geojson_coords(gtype, coords),
        }
    )


@pandas_udf(BinaryType())
def _k_fromgeojson(s: pd.Series) -> pd.Series:
    import json as _json

    return pd.Series(
        [None if v is None else _geojson_to_wkb(_json.loads(v)) for v in s],
        dtype=object,
    )


@pandas_udf(StringType())
def _k_asgeojson(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _wkb_to_geojson(bytes(b)) for b in g], dtype=object
    )


@pandas_udf(IntegerType())
def _k_numgeom(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(len(coords) if gtype in _MULTI_TYPES else 1)
    return pd.Series(out, dtype="Int32")


@pandas_udf(BinaryType())
def _k_geometryn(g: pd.Series, n: pd.Series) -> pd.Series:
    out = []
    for b, k in zip(g, n):
        if b is None or k is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        k = int(k)
        if gtype not in _MULTI_TYPES:
            out.append(bytes(b) if k == 1 else None)  # PostGIS semantics
            continue
        if 1 <= k <= len(coords):
            out.append(_pack(*coords[k - 1]))
        else:
            out.append(None)
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_collect(arr: pd.Series) -> pd.Series:
    """ST_Collect over a pre-grouped array<binary>: homogeneous point/
    linestring/polygon inputs become the matching MULTI geometry."""
    out = []
    for geoms in arr:
        if geoms is None:
            out.append(None)
            continue
        kids = [_parse(bytes(b))[:2] for b in geoms if b is not None]
        if not kids:
            out.append(None)
            continue
        kinds = {kt for kt, _ in kids}
        if kinds <= {WKB_POINT}:
            out.append(_pack(WKB_MULTIPOINT, kids))
        elif kinds <= {WKB_LINESTRING}:
            out.append(_pack(WKB_MULTILINESTRING, kids))
        elif kinds <= {WKB_POLYGON}:
            out.append(_pack(WKB_MULTIPOLYGON, kids))
        else:
            # heterogeneous inputs collect into a GEOMETRYCOLLECTION
            # (PostGIS ST_Collect semantics)
            out.append(_pack(WKB_GEOMETRYCOLLECTION, kids))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_makepolygon(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        if gtype != WKB_LINESTRING:
            raise ValueError("st_makepolygon expects a LINESTRING shell")
        if len(coords) < 4 or coords[0] != coords[-1]:
            raise ValueError("st_makepolygon shell must be closed (>= 4 points)")
        out.append(_pack_polygon([coords]))
    return pd.Series(out, dtype=object)


def _ring_area(ring: list[tuple[float, float]]) -> float:
    """Signed shoelace area of one ring."""
    a = 0.0
    for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
        a += x0 * y1 - x1 * y0
    return a / 2.0


def _area_of(gtype: int, coords: list) -> float:
    if gtype == WKB_POLYGON:
        if not coords:
            return 0.0
        # exterior ring minus holes (absolute values, PostGIS semantics)
        return abs(_ring_area(coords[0])) - sum(
            abs(_ring_area(r)) for r in coords[1:]
        )
    if gtype in _MULTI_TYPES:
        return sum(_area_of(kt, kc) for kt, kc in coords)
    return 0.0


def _perimeter_of(gtype: int, coords: list) -> float:
    if gtype == WKB_POLYGON:
        return sum(_length_of(WKB_LINESTRING, r) for r in coords)
    if gtype in _MULTI_TYPES:
        return sum(_perimeter_of(kt, kc) for kt, kc in coords)
    return 0.0


@pandas_udf(DoubleType())
def _k_area(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _area_of(*_parse(bytes(b))) for b in g],
        dtype="float64",
    )


@pandas_udf(DoubleType())
def _k_perimeter(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _perimeter_of(*_parse(bytes(b))) for b in g],
        dtype="float64",
    )


@pandas_udf(BinaryType())
def _k_buffer(g: pd.Series, r: pd.Series, qs: pd.Series) -> pd.Series:
    out = []
    for b, radius, quad in zip(g, r, qs):
        if b is None or radius is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        if gtype != WKB_POINT:
            raise ValueError("st_buffer supports POINT inputs only (no geometry lib)")
        cx, cy = coords[0]
        n = max(4, 4 * int(quad))
        ring = [
            (
                cx + float(radius) * math.cos(2 * math.pi * i / n),
                cy + float(radius) * math.sin(2 * math.pi * i / n),
            )
            for i in range(n)
        ]
        ring.append(ring[0])
        out.append(_pack_polygon([ring]))
    return pd.Series(out, dtype=object)


def _map_coords(gtype: int, coords: list, fn):
    if gtype == WKB_POINT or gtype == WKB_LINESTRING:
        return [fn(p) for p in coords]
    if gtype == WKB_POLYGON:
        return [[fn(p) for p in ring] for ring in coords]
    return [(kt, _map_coords(kt, kc, fn)) for kt, kc in coords]


@pandas_udf(BinaryType())
def _k_translate(g: pd.Series, dx: pd.Series, dy: pd.Series) -> pd.Series:
    out = []
    for b, ddx, ddy in zip(g, dx, dy):
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        moved = _map_coords(
            gtype, coords, lambda p: (p[0] + float(ddx), p[1] + float(ddy))
        )
        out.append(_pack(gtype, moved))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_normalize(g: pd.Series) -> pd.Series:
    """Repack as little-endian WKB (canonical byte form for equality)."""
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        out.append(_pack(*_parse(bytes(b))))
    return pd.Series(out, dtype=object)


@pandas_udf(BooleanType())
def _k_isvalid(g: pd.Series) -> pd.Series:
    def valid(b: bytes) -> bool:
        try:
            gtype, coords = _parse(b)
        except ValueError:
            return False
        pts = _flat_coords(gtype, coords)
        if any(not (math.isfinite(x) and math.isfinite(y)) for x, y in pts):
            return False

        def check(gt: int, cs: list) -> bool:
            if gt == WKB_LINESTRING:
                return len(cs) >= 2
            if gt == WKB_POLYGON:
                return all(len(r) >= 4 and r[0] == r[-1] for r in cs) and bool(cs)
            if gt in _MULTI_TYPES:
                return all(check(kt, kc) for kt, kc in cs)
            return True

        return check(gtype, coords)

    return pd.Series(
        [None if b is None else valid(bytes(b)) for b in g], dtype=object
    )


@pandas_udf(BinaryType())
def _k_validate_wkb(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        _parse(bytes(b))  # raises on malformed
        out.append(bytes(b))
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------------------
# public column API (PostGIS names)
# ---------------------------------------------------------------------------

def st_point(x, y) -> Column:
    return _k_point(F.col(x) if isinstance(x, str) else x, F.col(y) if isinstance(y, str) else y)


def st_x(g) -> Column:
    return _k_xy(g)["x"]


def st_y(g) -> Column:
    return _k_xy(g)["y"]


def st_astext(g) -> Column:
    return _k_astext(g)


def st_asbinary(g) -> Column:
    # geometry already IS little-endian WKB; identity projection
    return F.col(g) if isinstance(g, str) else g


def st_geomfromwkb(b) -> Column:
    return _k_validate_wkb(b)


def st_geomfromtext(s) -> Column:
    return _k_fromtext(F.col(s) if isinstance(s, str) else s)


def st_geometryfromtext(s) -> Column:
    """PostGIS alias of st_geomfromtext (shippable_spatial_functions.c
    registers both names)."""
    return st_geomfromtext(s)


def st_geomfromgeojson(s) -> Column:
    """GeoJSON geometry document (string column) → WKB."""
    return _k_fromgeojson(F.col(s) if isinstance(s, str) else s)


def st_asgeojson(g) -> Column:
    return _k_asgeojson(g)


def st_envelope(g) -> Column:
    """bbox struct (xmin,ymin,xmax,ymax) — feed bbox_* predicates."""
    return _k_envelope(g)


def st_geometrytype(g) -> Column:
    return _k_info(g)["gtype"]


def st_npoints(g) -> Column:
    return _k_info(g)["npoints"]


def st_length(g) -> Column:
    return _k_info(g)["length"]


def st_isclosed(g) -> Column:
    return _k_info(g)["closed"]


def st_dimension(g) -> Column:
    return _k_info(g)["dim"]


def st_isempty(g) -> Column:
    return _k_info(g)["empty"]


def st_srid(g) -> Column:
    # SRID-less storage (like PostGIS unset SRID)
    col = F.col(g) if isinstance(g, str) else g
    return F.when(col.isNotNull(), F.lit(0)).cast("int")


def st_makeline(points_array) -> Column:
    return _k_makeline(points_array)


def st_numgeometries(g) -> Column:
    return _k_numgeom(F.col(g) if isinstance(g, str) else g)


def st_geometryn(g, n) -> Column:
    n = F.lit(n) if isinstance(n, int) else n
    return _k_geometryn(F.col(g) if isinstance(g, str) else g, n)


def st_collect(geoms_array) -> Column:
    """Aggregate form: ``st_collect(F.collect_list(geom))`` — homogeneous
    inputs become the matching MULTI geometry (reference ships
    st_collect as an aggregate, shippable_spatial_functions.c)."""
    return _k_collect(geoms_array)


def st_makepolygon(shell_line) -> Column:
    return _k_makepolygon(
        F.col(shell_line) if isinstance(shell_line, str) else shell_line
    )


def st_pointn(g, n) -> Column:
    n = F.lit(n) if isinstance(n, int) else n
    return _k_pointn(g, n)


def st_startpoint(g) -> Column:
    return st_pointn(g, 1)


def st_endpoint(g) -> Column:
    return st_pointn(g, -1)


def st_centroid(g) -> Column:
    return _k_centroid(g)


def st_reverse(g) -> Column:
    return _k_reverse(g)


def st_flipcoordinates(g) -> Column:
    return _k_flip(g)


def st_distance(a, b) -> Column:
    """Euclidean point-point distance. Parses each side once (one kernel
    call per side); the arithmetic stays a JVM expression."""
    pa_, pb = _k_xy(a), _k_xy(b)
    return F.sqrt(
        F.pow(pa_["x"] - pb["x"], F.lit(2)) + F.pow(pa_["y"] - pb["y"], F.lit(2))
    )


def st_dwithin(a, b, d) -> Column:
    return st_distance(a, b) <= F.lit(d)


def st_makeenvelope(xmin, ymin, xmax, ymax) -> Column:
    """bbox struct from plain expressions — no kernel needed."""
    c = lambda v: F.lit(v) if not isinstance(v, Column) else v  # noqa: E731
    return F.struct(
        c(xmin).cast("double").alias("xmin"),
        c(ymin).cast("double").alias("ymin"),
        c(xmax).cast("double").alias("xmax"),
        c(ymax).cast("double").alias("ymax"),
    )


def bbox_area(box) -> Column:
    """Area of a bbox struct (envelope algebra, a pure expression)."""
    return (box["xmax"] - box["xmin"]) * (box["ymax"] - box["ymin"])


def st_area(g) -> Column:
    """Planar area of a geometry (shoelace over polygon rings, holes
    subtracted; 0 for points/lines — PostGIS semantics). For the
    envelope-algebra fast path over a bbox struct use :func:`bbox_area`."""
    return _k_area(F.col(g) if isinstance(g, str) else g)


def st_perimeter(g) -> Column:
    """Ring length of polygon/multipolygon (0 for other types)."""
    return _k_perimeter(F.col(g) if isinstance(g, str) else g)


def st_buffer(g, radius: float, quad_segs: int = 8) -> Column:
    """Point buffer → regular polygon approximation (4*quad_segs
    vertices, PostGIS's quad_segs knob). Non-point inputs raise — a
    general buffer needs a geometry library."""
    return _k_buffer(
        F.col(g) if isinstance(g, str) else g,
        F.lit(float(radius)),
        F.lit(int(quad_segs)),
    )


def st_translate(g, dx: float, dy: float) -> Column:
    return _k_translate(
        F.col(g) if isinstance(g, str) else g, F.lit(float(dx)), F.lit(float(dy))
    )


def st_expand(box, d) -> Column:
    """Grow a bbox struct by ``d`` on every side (pure expression)."""
    d = F.lit(float(d)) if not isinstance(d, Column) else d
    return F.struct(
        (box["xmin"] - d).alias("xmin"),
        (box["ymin"] - d).alias("ymin"),
        (box["xmax"] + d).alias("xmax"),
        (box["ymax"] + d).alias("ymax"),
    )


def st_orderingequals(a, b) -> Column:
    """Exact geometry equality: same type, same coordinates in the same
    order (PostGIS ST_OrderingEquals). Byte compare after little-endian
    normalization — both sides of this engine already store LE WKB, and
    foreign BE inputs normalize through the kernel."""
    an = _k_normalize(F.col(a) if isinstance(a, str) else a)
    bn = _k_normalize(F.col(b) if isinstance(b, str) else b)
    return an == bn


def st_isvalid(g) -> Column:
    """Structural validity: parseable WKB, linestrings >= 2 points,
    polygon rings closed with >= 4 points, finite coordinates. (Full
    OGC validity — self-intersection tests — needs a geometry library.)"""
    return _k_isvalid(F.col(g) if isinstance(g, str) else g)


def st_force2d(g) -> Column:
    """Strip Z/M coordinates (identity for 2D input)."""
    return _k_force2d_full(F.col(g) if isinstance(g, str) else g)


# --- pure-expression bbox predicates (JVM-side; Catalyst can push them) ----

def bbox_contains_point(box, x, y) -> Column:
    return (
        (x >= box["xmin"]) & (x <= box["xmax"]) & (y >= box["ymin"]) & (y <= box["ymax"])
    )


def bbox_contains(a, b) -> Column:
    """box a contains box b (st_contains on envelopes)."""
    return (
        (b["xmin"] >= a["xmin"])
        & (b["xmax"] <= a["xmax"])
        & (b["ymin"] >= a["ymin"])
        & (b["ymax"] <= a["ymax"])
    )


def bbox_within(a, b) -> Column:
    return bbox_contains(b, a)


def bbox_intersects(a, b) -> Column:
    return ~(
        (a["xmax"] < b["xmin"])
        | (b["xmax"] < a["xmin"])
        | (a["ymax"] < b["ymin"])
        | (b["ymax"] < a["ymin"])
    )


def bbox_disjoint(a, b) -> Column:
    return ~bbox_intersects(a, b)


# ---------------------------------------------------------------------------
# SQL surface registration
# ---------------------------------------------------------------------------

@pandas_udf(DoubleType())
def _k_x(g: pd.Series) -> pd.Series:
    return _k_xy.func(g)["x"]


@pandas_udf(DoubleType())
def _k_y(g: pd.Series) -> pd.Series:
    return _k_xy.func(g)["y"]


def register_spatial_sql(spark) -> list[str]:
    """Expose the st_* surface to SQL (``spark.sql("SELECT st_astext(
    st_point(x, y)) ..."``) — parity with the reference shipping st_*
    as SQL functions (shippable_spatial_functions.c). Kernel-backed
    functions register directly; measures/predicates that are plain
    Column expressions stay Python-API-only (SQL can compose them from
    st_x/st_y). Returns the registered names."""
    regs = {
        "st_point": _k_point,
        "st_x": _k_x,
        "st_y": _k_y,
        "st_astext": _k_astext,
        "st_geomfromtext": _k_fromtext,
        "st_geometryfromtext": _k_fromtext,
        "st_geomfromwkb": _k_validate_wkb,
        "st_geomfromgeojson": _k_fromgeojson,
        "st_asgeojson": _k_asgeojson,
        "st_envelope": _k_envelope,
        "st_makeline": _k_makeline,
        "st_pointn": _k_pointn,
        "st_centroid": _k_centroid,
        "st_reverse": _k_reverse,
        "st_flipcoordinates": _k_flip,
        "st_numgeometries": _k_numgeom,
        "st_geometryn": _k_geometryn,
        "st_collect": _k_collect,
        "st_makepolygon": _k_makepolygon,
        "st_area": _k_area,
        "st_perimeter": _k_perimeter,
        "st_buffer": _k_buffer,
        "st_translate": _k_translate,
        "st_isvalid": _k_isvalid,
        "st_force2d": _k_force2d_full,
        "st_distance": _k_distance,
        "st_intersects": _k_intersects,
        "st_contains_point": _k_contains_xy,
        "st_simplify": _k_simplify,
        "st_closestpoint": _k_closestpoint,
        "st_shortestline": _k_shortestline,
        "st_boundary": _k_boundary,
        "st_isring": _k_isring,
        "st_removerepeatedpoints": _k_removerepeated,
        # DE-9IM-lite relations
        "st_contains": _k_contains,
        "st_within": _k_within,
        "st_covers": _k_covers,
        "st_coveredby": _k_coveredby,
        "st_containsproperly": _k_containsproperly,
        "st_equals": _k_equals,
        "st_touches": _k_touches,
        "st_crosses": _k_crosses,
        "st_overlaps": _k_overlaps,
        "st_issimple": _k_issimple,
        # processing
        "st_convexhull": _k_convexhull,
        "st_pointonsurface": _k_pointonsurface,
        "st_exteriorring": _k_exteriorring,
        "st_numinteriorrings": _k_numinteriorrings,
        "st_interiorringn": _k_interiorringn,
        "st_numpoints": _k_numpoints,
        "st_collectionextract": _k_collectionextract,
        "st_linemerge": _k_linemerge,
        "st_normalize": _k_normalize,
        "st_makevalid": _k_makevalid,
        "st_reduceprecision": _k_reduceprecision,
        "st_simplifypreservetopology": _k_simplify_preserve,
        # geography slice (kernel-backed; st_distance_sphere is a plain
        # Column expression, composable in SQL via st_x/st_y)
        "st_length_sphere": _k_sphere_length,
        "st_area_sphere": _k_sphere_area,
        "st_distance_spheroid_xy": _k_distance_spheroid,
        "st_length_spheroid": _k_spheroid_length,
        "st_perimeter_spheroid": _k_spheroid_perimeter,
        "st_area_spheroid": _k_spheroid_area,
        # Z/M dims + reprojection
        "st_z": _k_z,
        "st_m": _k_m,
        "st_zmflag": _k_zmflag,
        "st_force3dz": _k_force3dz,
        "st_force3dm": _k_force3dm,
        "st_force4d": _k_force4d,
        "st_transform": _k_transform,
        "st_transform_def": _k_transform_def,
        # overlay
        "st_intersection": _k_intersection,
        "st_union": _k_union,
        "st_difference": _k_difference,
    }
    for name, fn in regs.items():
        spark.udf.register(name, fn)
    return sorted(regs)


# ---------------------------------------------------------------------------
# exact point-in-polygon (ray casting)
# ---------------------------------------------------------------------------

def _point_in_ring(x: float, y: float, ring: list[tuple[float, float]]) -> bool:
    """Even-odd ray casting; boundary points count as inside (PostGIS
    ST_Covers-style edge inclusivity, deterministic for joins)."""
    inside = False
    n = len(ring)
    for i in range(n - 1):
        x0, y0 = ring[i]
        x1, y1 = ring[i + 1]
        # boundary: point exactly on the segment
        if (min(x0, x1) <= x <= max(x0, x1)) and (min(y0, y1) <= y <= max(y0, y1)):
            cross = (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0)
            if cross == 0:
                return True
        if (y0 > y) != (y1 > y):
            xin = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
            if x < xin:
                inside = not inside
            elif x == xin:
                return True
    return inside


def _contains_xy(b: bytes, x: float, y: float) -> bool:
    return _contains_xy_t(*_parse(b), x, y)


def _contains_xy_t(gtype: int, coords: list, x: float, y: float) -> bool:
    """Parsed-level core — multi recursion passes (type, coords)
    directly instead of re-packing each child to WKB bytes for the
    callee to immediately re-parse (r15 review: the hot exact-verify
    kernels paid an O(bytes) serialize+deserialize per child per
    comparison)."""
    if gtype == WKB_POLYGON:
        if not coords or not _point_in_ring(x, y, coords[0]):
            return False
        for hole in coords[1:]:
            if _point_in_ring(x, y, hole):
                # on a hole's boundary still counts as covered
                cross_on_edge = False
                n = len(hole)
                for i in range(n - 1):
                    x0, y0 = hole[i]
                    x1, y1 = hole[i + 1]
                    if (
                        min(x0, x1) <= x <= max(x0, x1)
                        and min(y0, y1) <= y <= max(y0, y1)
                        and (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0) == 0
                    ):
                        cross_on_edge = True
                        break
                if not cross_on_edge:
                    return False
        return True
    if gtype == WKB_MULTIPOLYGON:
        return any(_contains_xy_t(kt, kc, x, y) for kt, kc in coords)
    raise ValueError("st_contains_point expects a (MULTI)POLYGON geometry")


def _ring_arrays(ring: list) -> tuple:
    """Ring segments as column vectors (x0, y0, x1, y1), shape (n-1, 1)."""
    p = np.asarray(ring, dtype="f8")
    return (
        p[:-1, 0:1],
        p[:-1, 1:2],
        p[1:, 0:1],
        p[1:, 1:2],
    )


def _ring_cover_vec(ring: list, X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Vectorized _point_in_ring over a point array — operation-for-
    operation the same float arithmetic as the scalar loop (boundary
    bbox + cross==0, the (y0>y)!=(y1>y) crossing rule with the exact
    same xin expression), so results are bit-identical. The scalar
    version's early `return True` branches commute with the parity
    count: any of them forces the final answer True regardless of the
    remaining toggles, so OR-ing them at the end is equivalent."""
    if len(ring) < 2:
        return np.zeros(len(X), dtype=bool)
    x0, y0, x1, y1 = _ring_arrays(ring)
    Xr, Yr = X[None, :], Y[None, :]
    # chunk points so the (segments × points) work matrices stay small
    n_seg = x0.shape[0]
    step = max(1, int(4_000_000 // max(n_seg, 1)))
    out = np.empty(len(X), dtype=bool)
    for lo in range(0, len(X), step):
        Xc, Yc = Xr[:, lo : lo + step], Yr[:, lo : lo + step]
        bbox = (
            (np.minimum(x0, x1) <= Xc)
            & (Xc <= np.maximum(x0, x1))
            & (np.minimum(y0, y1) <= Yc)
            & (Yc <= np.maximum(y0, y1))
        )
        cross = (x1 - x0) * (Yc - y0) - (Xc - x0) * (y1 - y0)
        on_boundary = (bbox & (cross == 0)).any(axis=0)
        straddle = (y0 > Yc) != (y1 > Yc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = x0 + (Yc - y0) * (x1 - x0) / (y1 - y0)
        toggles = (straddle & (Xc < xin)).sum(axis=0)
        on_xin = (straddle & (Xc == xin)).any(axis=0)
        out[lo : lo + step] = on_boundary | on_xin | (toggles % 2 == 1)
    return out


def _ring_edge_vec(ring: list, X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Vectorized 'point lies on a ring segment' (the hole-boundary
    check of _contains_xy_t), same bbox + cross==0 arithmetic."""
    if len(ring) < 2:
        return np.zeros(len(X), dtype=bool)
    x0, y0, x1, y1 = _ring_arrays(ring)
    n_seg = x0.shape[0]
    step = max(1, int(4_000_000 // max(n_seg, 1)))
    out = np.empty(len(X), dtype=bool)
    for lo in range(0, len(X), step):
        Xc, Yc = X[None, lo : lo + step], Y[None, lo : lo + step]
        bbox = (
            (np.minimum(x0, x1) <= Xc)
            & (Xc <= np.maximum(x0, x1))
            & (np.minimum(y0, y1) <= Yc)
            & (Yc <= np.maximum(y0, y1))
        )
        cross = (x1 - x0) * (Yc - y0) - (Xc - x0) * (y1 - y0)
        out[lo : lo + step] = (bbox & (cross == 0)).any(axis=0)
    return out


def _contains_xy_vec(gtype: int, coords: list, X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Vectorized _contains_xy_t: one geometry against a point array."""
    if gtype == WKB_POLYGON:
        if not coords:
            return np.zeros(len(X), dtype=bool)
        res = _ring_cover_vec(coords[0], X, Y)
        for hole in coords[1:]:
            in_hole = _ring_cover_vec(hole, X, Y)
            on_edge = _ring_edge_vec(hole, X, Y)
            res &= ~in_hole | on_edge
        return res
    if gtype == WKB_MULTIPOLYGON:
        res = np.zeros(len(X), dtype=bool)
        for kt, kc in coords:
            res |= _contains_xy_vec(kt, kc, X, Y)
        return res
    raise ValueError("st_contains_point expects a (MULTI)POLYGON geometry")


@pandas_udf(BooleanType())
def _k_contains_xy(g: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    # r16 (guide §4.2): the exact-verify kernel of the grid-bucketed
    # polygon⋈point join sees each polygon once PER CANDIDATE ROW — a
    # per-row Python loop re-parsed the same WKB and re-walked its
    # rings point by point. Group the batch by geometry bytes, parse
    # each distinct geometry once, and run the even-odd test as NumPy
    # array arithmetic over all of its points (bit-identical float ops;
    # pinned by tests/test_spatial_relations.py::test_contains_xy_
    # vectorized_matches_scalar and the unchanged join oracles).
    out = [None] * len(g)
    if not len(g):
        return pd.Series(out, dtype=object)
    groups: dict[bytes, list[int]] = {}
    for i, (b, px, py) in enumerate(zip(g, x, y)):
        if b is not None and px is not None and py is not None:
            groups.setdefault(bytes(b), []).append(i)
    # errors="raise" (r16 ADVICE): the coordinate inputs are declared
    # numeric — a non-numeric value must fail loudly, not silently
    # become NaN (and thus NULL/False output). NULL/None still maps to
    # NaN, which the null-mask below handles.
    xv = pd.to_numeric(x, errors="raise").to_numpy(dtype="f8", na_value=np.nan)
    yv = pd.to_numeric(y, errors="raise").to_numpy(dtype="f8", na_value=np.nan)
    for b, idxs in groups.items():
        gtype, coords = _parse(b)
        ix = np.asarray(idxs, dtype=np.int64)
        res = _contains_xy_vec(gtype, coords, xv[ix], yv[ix])
        for j, i in enumerate(idxs):
            out[i] = bool(res[j])
    return pd.Series(out, dtype=object)


def st_contains_point(polygon, x, y) -> Column:
    """Exact (MULTI)POLYGON-covers-point via even-odd ray casting with
    inclusive boundaries — the real st_contains/st_covers slice for the
    polygon⋈point case (bbox_* are the cheap pre-filter; this is the
    exact verify)."""
    c = lambda v: F.col(v) if isinstance(v, str) else v  # noqa: E731
    return _k_contains_xy(c(polygon), c(x), c(y))


# ---------------------------------------------------------------------------
# exact st_intersects (orientation / segment tests)
# ---------------------------------------------------------------------------

def _orient(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_segment(ax, ay, bx, by, px, py) -> bool:
    return (
        min(ax, bx) <= px <= max(ax, bx)
        and min(ay, by) <= py <= max(ay, by)
        and _orient(ax, ay, bx, by, px, py) == 0
    )


def _segments_intersect(p1, p2, p3, p4) -> bool:
    d1 = _orient(*p3, *p4, *p1)
    d2 = _orient(*p3, *p4, *p2)
    d3 = _orient(*p1, *p2, *p3)
    d4 = _orient(*p1, *p2, *p4)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0:
        return True
    return (
        _on_segment(*p3, *p4, *p1)
        or _on_segment(*p3, *p4, *p2)
        or _on_segment(*p1, *p2, *p3)
        or _on_segment(*p1, *p2, *p4)
    )


def _segments_of(gtype: int, coords: list):
    if gtype == WKB_LINESTRING:
        yield from zip(coords, coords[1:])
    elif gtype == WKB_POLYGON:
        for ring in coords:
            yield from zip(ring, ring[1:])
    elif gtype in _MULTI_TYPES:
        for kt, kc in coords:
            yield from _segments_of(kt, kc)


def _geoms_intersect(a: bytes, b: bytes) -> bool:
    return _geoms_intersect_t(*_parse(a), *_parse(b))


def _geoms_intersect_t(ta: int, ca: list, tb: int, cb: list) -> bool:
    # normalize: make multis recurse so the core logic sees simple
    # types — on parsed tuples, no WKB roundtrip (r15 review)
    if ta in _MULTI_TYPES:
        return any(_geoms_intersect_t(kt, kc, tb, cb) for kt, kc in ca)
    if tb in _MULTI_TYPES:
        return any(_geoms_intersect_t(ta, ca, kt, kc) for kt, kc in cb)

    if ta == WKB_POINT and tb == WKB_POINT:
        return ca[0] == cb[0]
    if ta == WKB_POINT or tb == WKB_POINT:
        (px, py) = ca[0] if ta == WKB_POINT else cb[0]
        other_t, other_c = (tb, cb) if ta == WKB_POINT else (ta, ca)
        if other_t == WKB_POLYGON:
            return _contains_xy_t(other_t, other_c, px, py)
        return any(
            _on_segment(*s, *e, px, py) for s, e in _segments_of(other_t, other_c)
        )
    # line/line, line/polygon, polygon/polygon: any boundary crossing...
    for s1, e1 in _segments_of(ta, ca):
        for s2, e2 in _segments_of(tb, cb):
            if _segments_intersect(s1, e1, s2, e2):
                return True
    # ...or full containment of one inside the other (no edge touches)
    if ta == WKB_POLYGON:
        pts = _flat_coords(tb, cb)
        if pts and _contains_xy_t(ta, ca, *pts[0]):
            return True
    if tb == WKB_POLYGON:
        pts = _flat_coords(ta, ca)
        if pts and _contains_xy_t(tb, cb, *pts[0]):
            return True
    return False


def _seg_geom_info(b: bytes):
    """Parsed + flattened form of one geometry for the vectorized
    pair-intersects kernel: ``(gtype, coords, scalar_only, segs,
    poly_parts, first_pts)``.

    ``segs`` is an (n, 4) float64 array of ``[x0, y0, x1, y1]`` rows —
    every segment of every linestring/ring across all (nested) parts;
    ``poly_parts`` the ring-lists of each POLYGON part; ``first_pts``
    the first flat coordinate of each simple part (the containment-
    fallback probes of the scalar recursion). ``scalar_only`` marks
    geometries the vector kernel does not cover (point-bearing or
    segment-free) — pairs touching one take the scalar path
    unchanged."""
    gtype, coords = _parse(b)
    segs: list = []
    poly_parts: list = []
    first_pts: list = []
    has_point = False

    def walk(t, c):
        nonlocal has_point
        if t in _MULTI_TYPES:
            for kt, kc in c:
                walk(kt, kc)
            return
        fp = _flat_coords(t, c)
        if fp:
            first_pts.append(fp[0])
        if t == WKB_POINT:
            has_point = True
        elif t == WKB_LINESTRING:
            if len(c) >= 2:
                p = np.asarray(c, dtype="f8")
                segs.append(np.hstack([p[:-1], p[1:]]))
        elif t == WKB_POLYGON:
            poly_parts.append(c)
            for ring in c:
                if len(ring) >= 2:
                    p = np.asarray(ring, dtype="f8")
                    segs.append(np.hstack([p[:-1], p[1:]]))

    walk(gtype, coords)
    seg = np.concatenate(segs, axis=0) if segs else np.zeros((0, 4), dtype="f8")
    scalar_only = has_point or seg.shape[0] == 0
    return gtype, coords, scalar_only, seg, poly_parts, first_pts


def _seg_hits_vec(a_seg: np.ndarray, b_all: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """One left geometry's segments (``a_seg``, (nA,4)) against the
    concatenated right-side segments of a row group (``b_all``, (M,4),
    split at ``starts``): a bool per row — does ANY (A-segment,
    B-segment) pair intersect. Element-for-element the same float
    arithmetic as the scalar ``_segments_intersect`` (d1..d4 are the
    four ``_orient`` values; the collinear-touch terms reuse them
    exactly like ``_on_segment`` recomputes them), and the scalar
    early ``return True`` commutes with ``any()``, so the row verdicts
    are identical."""
    ax0, ay0, ax1, ay1 = (a_seg[:, k : k + 1] for k in range(4))
    n_a = a_seg.shape[0]
    col_hit = np.empty(b_all.shape[0], dtype=bool)
    step = max(1, int(4_000_000 // max(n_a, 1)))
    for lo in range(0, b_all.shape[0], step):
        bx0, by0, bx1, by1 = (b_all[None, lo : lo + step, k] for k in range(4))
        d1 = (bx1 - bx0) * (ay0 - by0) - (by1 - by0) * (ax0 - bx0)
        d2 = (bx1 - bx0) * (ay1 - by0) - (by1 - by0) * (ax1 - bx0)
        d3 = (ax1 - ax0) * (by0 - ay0) - (ay1 - ay0) * (bx0 - ax0)
        d4 = (ax1 - ax0) * (by1 - ay0) - (ay1 - ay0) * (bx1 - ax0)
        hit = (
            ((d1 > 0) != (d2 > 0))
            & ((d3 > 0) != (d4 > 0))
            & (d1 != 0)
            & (d2 != 0)
            & (d3 != 0)
            & (d4 != 0)
        )
        hit |= (
            (np.minimum(bx0, bx1) <= ax0)
            & (ax0 <= np.maximum(bx0, bx1))
            & (np.minimum(by0, by1) <= ay0)
            & (ay0 <= np.maximum(by0, by1))
            & (d1 == 0)
        )
        hit |= (
            (np.minimum(bx0, bx1) <= ax1)
            & (ax1 <= np.maximum(bx0, bx1))
            & (np.minimum(by0, by1) <= ay1)
            & (ay1 <= np.maximum(by0, by1))
            & (d2 == 0)
        )
        hit |= (
            (np.minimum(ax0, ax1) <= bx0)
            & (bx0 <= np.maximum(ax0, ax1))
            & (np.minimum(ay0, ay1) <= by0)
            & (by0 <= np.maximum(ay0, ay1))
            & (d3 == 0)
        )
        hit |= (
            (np.minimum(ax0, ax1) <= bx1)
            & (bx1 <= np.maximum(ax0, ax1))
            & (np.minimum(ay0, ay1) <= by1)
            & (by1 <= np.maximum(ay0, ay1))
            & (d4 == 0)
        )
        col_hit[lo : lo + step] = hit.any(axis=0)
    return np.logical_or.reduceat(col_hit, starts)


def _containment_fallback(info_a, info_b) -> bool:
    """The no-edge-crossing containment probes of the scalar recursion,
    flattened: any POLYGON part of one side covers the other side's
    per-part first point. OR over side-effect-free booleans — same
    verdict as the scalar per-(partA, partB) interleaving."""
    for pc in info_a[4]:
        for fx, fy in info_b[5]:
            if _contains_xy_t(WKB_POLYGON, pc, fx, fy):
                return True
    for pc in info_b[4]:
        for fx, fy in info_a[5]:
            if _contains_xy_t(WKB_POLYGON, pc, fx, fy):
                return True
    return False


def _poly_covers_rows(polys_by_key, probe_rows):
    """Vectorized half of the containment fallback: for fallback rows
    grouped by the POLYGON-bearing side, test all the other side's
    first points in one even-odd pass per (key, polygon part).

    ``probe_rows`` is ``[(row_idx, key, first_pts), ...]``; returns the
    set of row indices covered. Uses ``_contains_xy_vec`` — proven
    op-for-op identical to the scalar ``_contains_xy_t`` by
    test_contains_xy_vectorized_matches_scalar — and OR over boolean
    probes commutes with the scalar loop order, so verdicts match
    ``_containment_fallback`` exactly."""
    hit: set[int] = set()
    by_key: dict[bytes, list] = {}
    for row in probe_rows:
        by_key.setdefault(row[1], []).append(row)
    for key, rows in by_key.items():
        parts = polys_by_key[key]
        if not parts:
            continue
        idx_of_pt: list[int] = []
        xs: list[float] = []
        ys: list[float] = []
        for i, _k, pts in rows:
            for fx, fy in pts:
                idx_of_pt.append(i)
                xs.append(fx)
                ys.append(fy)
        if not xs:
            continue
        X = np.asarray(xs, dtype="f8")
        Y = np.asarray(ys, dtype="f8")
        covered = np.zeros(len(X), dtype=bool)
        for pc in parts:
            covered |= _contains_xy_vec(WKB_POLYGON, pc, X, Y)
        for j, i in enumerate(idx_of_pt):
            if covered[j]:
                hit.add(i)
    return hit


@pandas_udf(BooleanType())
def _k_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
    # r16 (guide §4.2): the exact-verify stage of the grid-bucketed
    # polygon⋈polygon join sees each LEFT geometry across many
    # candidate rows — a per-row Python loop re-parsed both WKBs and
    # ran the O(nA×nB) segment tests pair by pair. Parse each distinct
    # geometry once, group the batch by left geometry, and run all of
    # a group's segment cross-tests as one NumPy broadcast (identical
    # float ops; pinned by tests/test_spatial_relations.py::
    # test_intersects_vectorized_matches_scalar and the unchanged join
    # oracle). Point-bearing or segment-free geometries keep the
    # scalar path.
    out = [None] * len(a)
    if not len(a):
        return pd.Series(out, dtype=object)
    info: dict[bytes, tuple] = {}
    groups: dict[bytes, list[int]] = {}
    bvals: list = list(b)
    for i, ba in enumerate(a):
        bb = bvals[i]
        if ba is None or bb is None:
            continue
        ka, kb = bytes(ba), bytes(bb)
        if ka not in info:
            info[ka] = _seg_geom_info(ka)
        if kb not in info:
            info[kb] = _seg_geom_info(kb)
        groups.setdefault(ka, []).append(i)
    fb: list[tuple[int, bytes, bytes]] = []
    for ka, idxs in groups.items():
        ia = info[ka]
        if ia[2]:  # left side needs the scalar path for every pair
            for i in idxs:
                ib = info[bytes(bvals[i])]
                out[i] = _geoms_intersect_t(ia[0], ia[1], ib[0], ib[1])
            continue
        vec_idx: list[int] = []
        vec_infos: list[tuple] = []
        for i in idxs:
            ib = info[bytes(bvals[i])]
            if ib[2]:
                out[i] = _geoms_intersect_t(ia[0], ia[1], ib[0], ib[1])
            else:
                vec_idx.append(i)
                vec_infos.append(ib)
        if not vec_idx:
            continue
        counts = np.array([ib[3].shape[0] for ib in vec_infos], dtype=np.int64)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        b_all = (
            np.concatenate([ib[3] for ib in vec_infos], axis=0)
            if len(vec_infos) > 1
            else vec_infos[0][3]
        )
        hits = _seg_hits_vec(ia[3], b_all, starts)
        for j, i in enumerate(vec_idx):
            if hits[j]:
                out[i] = True
            else:
                fb.append((i, ka, bytes(bvals[i])))
    # r16: the containment fallback for no-edge-crossing rows, batch-
    # wide and vectorized — the probes depend only on each pair's
    # parsed parts, so resolve every such row with one even-odd pass
    # per (distinct geometry, polygon part) instead of a per-row ring
    # walk (was the dominant cost of mostly-disjoint candidate
    # batches). Same verdicts as _containment_fallback: OR over the
    # identical boolean probes.
    if fb:
        cov = _poly_covers_rows(
            {ka: info[ka][4] for _i, ka, _kb in fb},
            [(i, ka, info[kb][5]) for i, ka, kb in fb],
        )
        cov |= _poly_covers_rows(
            {kb: info[kb][4] for _i, _ka, kb in fb},
            [(i, kb, info[ka][5]) for i, ka, kb in fb],
        )
        for i, _ka, _kb in fb:
            out[i] = i in cov
    return pd.Series(out, dtype=object)


def st_intersects(a, b) -> Column:
    """Exact geometry intersection across all supported type combos:
    orientation-based segment tests plus containment fallbacks. O(n*m)
    segments per pair — the exact-verify stage after a bbox prefilter
    (bbox_intersects is the cheap, pushable pre-filter)."""
    c = lambda v: F.col(v) if isinstance(v, str) else v  # noqa: E731
    return _k_intersects(c(a), c(b))


def st_disjoint(a, b) -> Column:
    return ~st_intersects(a, b)


# ---------------------------------------------------------------------------
# generalized distance + simplification
# ---------------------------------------------------------------------------

def _pt_seg_dist(px, py, ax, ay, bx, by) -> float:
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / L2))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def _seg_seg_dist(p1, p2, p3, p4) -> float:
    if _segments_intersect(p1, p2, p3, p4):
        return 0.0
    return min(
        _pt_seg_dist(*p1, *p3, *p4),
        _pt_seg_dist(*p2, *p3, *p4),
        _pt_seg_dist(*p3, *p1, *p2),
        _pt_seg_dist(*p4, *p1, *p2),
    )


def _geoms_distance(a: bytes, b: bytes) -> float:
    """Min Euclidean distance between any two supported geometries
    (0 when they intersect — PostGIS ST_Distance semantics, including
    a point INSIDE a polygon)."""
    return _geoms_distance_t(*_parse(a), *_parse(b))


def _geoms_distance_t(ta: int, ca: list, tb: int, cb: list) -> float:
    if ta in _MULTI_TYPES:
        return min(_geoms_distance_t(kt, kc, tb, cb) for kt, kc in ca)
    if tb in _MULTI_TYPES:
        return min(_geoms_distance_t(ta, ca, kt, kc) for kt, kc in cb)
    if ta == WKB_POINT and tb == WKB_POINT:
        (x1, y1), (x2, y2) = ca[0], cb[0]
        return math.hypot(x1 - x2, y1 - y2)
    if ta == WKB_POINT or tb == WKB_POINT:
        (px, py) = ca[0] if ta == WKB_POINT else cb[0]
        ot, oc = (tb, cb) if ta == WKB_POINT else (ta, ca)
        if ot == WKB_POLYGON and _contains_xy_t(ot, oc, px, py):
            return 0.0
        return min(
            _pt_seg_dist(px, py, *s, *e) for s, e in _segments_of(ot, oc)
        )
    if _geoms_intersect_t(ta, ca, tb, cb):
        return 0.0
    return min(
        _seg_seg_dist(s1, e1, s2, e2)
        for s1, e1 in _segments_of(ta, ca)
        for s2, e2 in _segments_of(tb, cb)
    )


@pandas_udf(DoubleType())
def _k_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for ba, bb in zip(a, b):
        if ba is None or bb is None:
            out.append(None)
        else:
            out.append(_geoms_distance(bytes(ba), bytes(bb)))
    return pd.Series(out, dtype="float64")


def st_distance_geom(a, b) -> Column:
    """General min-distance between geometries of ANY supported types
    (0 on intersection). :func:`st_distance` stays the point-point fast
    path; this is the full-surface kernel."""
    c = lambda v: F.col(v) if isinstance(v, str) else v  # noqa: E731
    return _k_distance(c(a), c(b))


def st_dwithin_geom(a, b, d) -> Column:
    return st_distance_geom(a, b) <= F.lit(float(d))


def _dp_simplify(coords: list[tuple[float, float]], tol: float) -> list[tuple[float, float]]:
    """Douglas–Peucker, iterative (no recursion-depth hazard)."""
    n = len(coords)
    if n <= 2:
        return list(coords)
    keep = [False] * n
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        ax, ay = coords[i]
        bx, by = coords[j]
        best, bi = -1.0, -1
        for k in range(i + 1, j):
            d = _pt_seg_dist(*coords[k], ax, ay, bx, by)
            if d > best:
                best, bi = d, k
        if best > tol:
            keep[bi] = True
            stack.append((i, bi))
            stack.append((bi, j))
    return [c for c, k in zip(coords, keep) if k]


@pandas_udf(BinaryType())
def _k_simplify(g: pd.Series, tol: pd.Series) -> pd.Series:
    out = []
    for b, t in zip(g, tol):
        if b is None or t is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        t = float(t)
        if gtype == WKB_POINT:
            out.append(bytes(b))
        elif gtype == WKB_LINESTRING:
            out.append(_pack_linestring(_dp_simplify(coords, t)))
        elif gtype == WKB_POLYGON:
            rings = []
            for r in coords:
                s = _dp_simplify(r, t)
                if len(s) >= 4:  # a ring must stay a ring
                    rings.append(s)
            out.append(_pack_polygon(rings) if rings else None)
        else:  # multi: simplify children, drop degenerate ones
            kids = []
            for kt, kc in coords:
                sb = None
                if kt == WKB_POINT:
                    kids.append((kt, kc))
                elif kt == WKB_LINESTRING:
                    kids.append((kt, _dp_simplify(kc, t)))
                elif kt == WKB_POLYGON:
                    rs = [r2 for r in kc if len(r2 := _dp_simplify(r, t)) >= 4]
                    if rs:
                        kids.append((kt, rs))
            out.append(_pack(gtype, kids) if kids else None)
    return pd.Series(out, dtype=object)


def st_simplify(g, tolerance: float) -> Column:
    """Douglas–Peucker simplification (PostGIS ST_Simplify): vertices
    closer than ``tolerance`` to the simplified shape are dropped;
    endpoints and ring validity are preserved (rings that collapse
    below 4 points vanish, holes included)."""
    return _k_simplify(
        F.col(g) if isinstance(g, str) else g, F.lit(float(tolerance))
    )


# ---------------------------------------------------------------------------
# clip-by-rectangle (ST_ClipByBox2D — the tiling primitive)
# ---------------------------------------------------------------------------

def _clip_ring_halfplane(ring, inside, intersect):
    """Sutherland–Hodgman step against one half-plane."""
    out = []
    n = len(ring)
    for i in range(n):
        cur = ring[i]
        prev = ring[i - 1]
        cin, pin = inside(cur), inside(prev)
        if cin:
            if not pin:
                out.append(intersect(prev, cur))
            out.append(cur)
        elif pin:
            out.append(intersect(prev, cur))
    return out


def _clip_ring_box(ring, x0, y0, x1, y1):
    """Clip a ring (closed or open list of vertices, no repeat point) to
    the rectangle; returns a closed ring or []."""
    r = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else list(ring)
    planes = [
        (lambda p: p[0] >= x0, lambda a, b: (x0, a[1] + (b[1] - a[1]) * (x0 - a[0]) / (b[0] - a[0]))),
        (lambda p: p[0] <= x1, lambda a, b: (x1, a[1] + (b[1] - a[1]) * (x1 - a[0]) / (b[0] - a[0]))),
        (lambda p: p[1] >= y0, lambda a, b: (a[0] + (b[0] - a[0]) * (y0 - a[1]) / (b[1] - a[1]), y0)),
        (lambda p: p[1] <= y1, lambda a, b: (a[0] + (b[0] - a[0]) * (y1 - a[1]) / (b[1] - a[1]), y1)),
    ]
    for inside, inter in planes:
        if not r:
            return []
        r = _clip_ring_halfplane(r, inside, inter)
    if len(r) < 3:
        return []
    return r + [r[0]]


def _clip_line_box(coords, x0, y0, x1, y1):
    """Clip a polyline to the rectangle → list of line pieces."""
    def inside(p):
        return x0 <= p[0] <= x1 and y0 <= p[1] <= y1

    def clip_seg(a, b):
        # Liang–Barsky
        t0, t1 = 0.0, 1.0
        dx, dy = b[0] - a[0], b[1] - a[1]
        for p, q in ((-dx, a[0] - x0), (dx, x1 - a[0]), (-dy, a[1] - y0), (dy, y1 - a[1])):
            if p == 0:
                if q < 0:
                    return None
            else:
                t = q / p
                if p < 0:
                    if t > t1:
                        return None
                    t0 = max(t0, t)
                else:
                    if t < t0:
                        return None
                    t1 = min(t1, t)
        return (
            (a[0] + t0 * dx, a[1] + t0 * dy),
            (a[0] + t1 * dx, a[1] + t1 * dy),
        )

    pieces = []
    cur: list = []
    for a, b in zip(coords, coords[1:]):
        seg = clip_seg(a, b)
        if seg is None:
            if len(cur) >= 2:
                pieces.append(cur)
            cur = []
            continue
        s, e = seg
        if cur and cur[-1] == s:
            cur.append(e)
        else:
            if len(cur) >= 2:
                pieces.append(cur)
            cur = [s, e]
    if len(cur) >= 2:
        pieces.append(cur)
    return pieces


def _clip_geom_box(b: bytes, x0, y0, x1, y1) -> bytes | None:
    gtype, coords = _parse(b)
    return _clip_geom_box_t(gtype, coords, x0, y0, x1, y1)


def _clip_geom_box_t(gtype: int, coords: list, x0, y0, x1, y1) -> bytes | None:
    if gtype == WKB_POINT:
        (px, py) = coords[0]
        return _pack_point(px, py) if (x0 <= px <= x1 and y0 <= py <= y1) else None
    if gtype == WKB_LINESTRING:
        pieces = _clip_line_box(coords, x0, y0, x1, y1)
        if not pieces:
            return None
        if len(pieces) == 1:
            return _pack_linestring(pieces[0])
        return _pack(WKB_MULTILINESTRING, [(WKB_LINESTRING, p) for p in pieces])
    if gtype == WKB_POLYGON:
        rings = [r for ring in coords if (r := _clip_ring_box(ring, x0, y0, x1, y1))]
        return _pack_polygon(rings) if rings else None
    if gtype in _MULTI_TYPES:
        kids = []
        for kt, kc in coords:
            cb = _clip_geom_box_t(kt, kc, x0, y0, x1, y1)
            if cb is not None:
                kids.append(_parse(cb))
        return _pack(gtype, kids) if kids else None
    return None


@pandas_udf(BinaryType())
def _k_clipbybox(g: pd.Series, x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series) -> pd.Series:
    out = []
    for b, a0, b0, a1, b1 in zip(g, x0, y0, x1, y1):
        if b is None or a0 is None:
            out.append(None)
        else:
            out.append(_clip_geom_box(bytes(b), float(a0), float(b0), float(a1), float(b1)))
    return pd.Series(out, dtype=object)


def st_clipbybox2d(g, box) -> Column:
    """Clip any geometry to a bbox struct (PostGIS ST_ClipByBox2D):
    Sutherland–Hodgman for rings, Liang–Barsky for lines — the exact
    construction every tiling/sharding pipeline needs, and the one
    whose clip region (a rectangle) keeps the math dependency-free."""
    c = F.col(g) if isinstance(g, str) else g
    return _k_clipbybox(c, box["xmin"], box["ymin"], box["xmax"], box["ymax"])


def st_extent_agg(g) -> Column:
    """AGGREGATE bbox of a geometry column (PostGIS ST_Extent is an
    aggregate; the per-row envelope is :func:`st_envelope`). Use inside
    ``groupBy().agg(...)`` — composes from min/max over the envelope
    struct, so it stays a plain hash aggregate with map-side combine."""
    env = _k_envelope(F.col(g) if isinstance(g, str) else g)
    return F.struct(
        F.min(env["xmin"]).alias("xmin"),
        F.min(env["ymin"]).alias("ymin"),
        F.max(env["xmax"]).alias("xmax"),
        F.max(env["ymax"]).alias("ymax"),
    )


def _closest_point_on(b: bytes, px: float, py: float) -> tuple[float, float]:
    """Nearest point ON geometry ``b`` to (px, py)."""
    return _closest_point_on_t(*_parse(b), px, py)


def _closest_point_on_t(gtype: int, coords: list, px: float, py: float) -> tuple[float, float]:
    if gtype == WKB_POINT:
        return coords[0]
    if gtype in _MULTI_TYPES:
        best, bd = None, float("inf")
        for kt, kc in coords:
            c = _closest_point_on_t(kt, kc, px, py)
            d = math.hypot(c[0] - px, c[1] - py)
            if d < bd:
                best, bd = c, d
        return best
    if gtype == WKB_POLYGON and _contains_xy_t(gtype, coords, px, py):
        return (px, py)
    best, bd = None, float("inf")
    for (ax, ay), (bx, by) in _segments_of(gtype, coords):
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        t = 0.0 if L2 == 0 else max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / L2))
        cx, cy = ax + t * dx, ay + t * dy
        d = math.hypot(cx - px, cy - py)
        if d < bd:
            best, bd = (cx, cy), d
    return best


@pandas_udf(BinaryType())
def _k_closestpoint(g: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    out = []
    for b, px, py in zip(g, x, y):
        if b is None or px is None:
            out.append(None)
        else:
            out.append(_pack_point(*_closest_point_on(bytes(b), float(px), float(py))))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_shortestline(g: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    out = []
    for b, px, py in zip(g, x, y):
        if b is None or px is None:
            out.append(None)
        else:
            cx, cy = _closest_point_on(bytes(b), float(px), float(py))
            out.append(_pack_linestring([(float(px), float(py)), (cx, cy)]))
    return pd.Series(out, dtype=object)


def st_closestpoint(g, x, y) -> Column:
    """Nearest point ON a geometry to the given coordinates (PostGIS
    ST_ClosestPoint with a point second argument)."""
    c = lambda v: F.col(v) if isinstance(v, str) else v  # noqa: E731
    return _k_closestpoint(c(g), c(x), c(y))


def st_shortestline(g, x, y) -> Column:
    """2-point LINESTRING from (x, y) to its nearest point on the
    geometry (PostGIS ST_ShortestLine, point second argument); its
    st_length equals st_distance_geom."""
    c = lambda v: F.col(v) if isinstance(v, str) else v  # noqa: E731
    return _k_shortestline(c(g), c(x), c(y))


@pandas_udf(BinaryType())
def _k_removerepeated(g: pd.Series) -> pd.Series:
    def dedupe(seq):
        out = [seq[0]]
        for p in seq[1:]:
            if p != out[-1]:
                out.append(p)
        return out

    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        if gtype == WKB_POINT:
            out.append(bytes(b))
        elif gtype == WKB_LINESTRING:
            out.append(_pack_linestring(dedupe(coords)))
        elif gtype == WKB_POLYGON:
            out.append(_pack_polygon([dedupe(r) for r in coords]))
        else:
            kids = []
            for kt, kc in coords:
                if kt == WKB_POINT:
                    kids.append((kt, kc))
                elif kt == WKB_LINESTRING:
                    kids.append((kt, dedupe(kc)))
                else:
                    kids.append((kt, [dedupe(r) for r in kc]))
            out.append(_pack(gtype, kids))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_boundary(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        if gtype == WKB_POINT or gtype == WKB_MULTIPOINT:
            out.append(None)  # point boundary is empty (no collections here)
        elif gtype == WKB_LINESTRING:
            if coords and coords[0] == coords[-1]:
                out.append(None)  # closed line: empty boundary
            else:
                out.append(
                    _pack(
                        WKB_MULTIPOINT,
                        [(WKB_POINT, [coords[0]]), (WKB_POINT, [coords[-1]])],
                    )
                )
        elif gtype == WKB_POLYGON:
            if len(coords) == 1:
                out.append(_pack_linestring(coords[0]))
            else:
                out.append(
                    _pack(WKB_MULTILINESTRING, [(WKB_LINESTRING, r) for r in coords])
                )
        else:
            rings = []
            ends: dict[tuple, int] = {}
            for kt, kc in coords:
                if kt == WKB_POLYGON:
                    rings += [(WKB_LINESTRING, r) for r in kc]
                elif kt == WKB_LINESTRING and kc and kc[0] != kc[-1]:
                    # mod-2 rule: an endpoint shared by an even number
                    # of open lines cancels out of the boundary (the
                    # old branch collected polygon rings ONLY, so a
                    # MULTILINESTRING's boundary read empty; r15 review)
                    for p in (kc[0], kc[-1]):
                        ends[p] = ends.get(p, 0) + 1
            if rings:
                out.append(_pack(WKB_MULTILINESTRING, rings))
                continue
            pts = [p for p, n in ends.items() if n % 2 == 1]
            out.append(
                _pack(WKB_MULTIPOINT, [(WKB_POINT, [p]) for p in pts])
                if pts
                else None
            )
    return pd.Series(out, dtype=object)


@pandas_udf(BooleanType())
def _k_isring(g: pd.Series) -> pd.Series:
    def simple_closed(coords) -> bool:
        if len(coords) < 4 or coords[0] != coords[-1]:
            return False
        segs = list(zip(coords, coords[1:]))
        n = len(segs)
        for i in range(n):
            for j in range(i + 1, n):
                if j == i + 1 or (i == 0 and j == n - 1):
                    continue  # adjacent segments share an endpoint by design
                if _segments_intersect(*segs[i], *segs[j]):
                    return False
        return True

    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(simple_closed(coords) if gtype == WKB_LINESTRING else False)
    return pd.Series(out, dtype=object)


def st_removerepeatedpoints(g) -> Column:
    """Drop consecutive duplicate vertices (PostGIS name)."""
    return _k_removerepeated(F.col(g) if isinstance(g, str) else g)


def st_boundary(g) -> Column:
    """Topological boundary: open linestring → MULTIPOINT(endpoints),
    closed linestring / points → NULL (empty), polygon → its ring(s) as
    (MULTI)LINESTRING."""
    return _k_boundary(F.col(g) if isinstance(g, str) else g)


def st_isring(g) -> Column:
    """True for a closed AND simple (non-self-intersecting) linestring
    — the PostGIS ring test, exact segment checks."""
    return _k_isring(F.col(g) if isinstance(g, str) else g)


# ---------------------------------------------------------------------------
# DE-9IM-lite relations (st_contains/within/covers/coveredby/equals/
# touches/crosses/overlaps/containsproperly/issimple)
#
# The reference ships these by delegating to DuckDB spatial / GEOS
# (shippable_spatial_functions.c:56-455, shippable_spatial_operators.c).
# Here they are exact orientation-arithmetic tests over the WKB codec:
# pointwise position tests (3-state ray casting) on vertex + segment-
# midpoint samples combined with proper-crossing tests between segment
# sets. This is exact for all non-degenerate inputs; the one documented
# approximation: a segment that exits a concave region THROUGH a
# boundary vertex and re-enters between two samples (no proper crossing,
# both endpoints + midpoint covered) is reported covered. Valid OGC
# inputs used in joins (point/line-in-polygon, polygon containment)
# never hit that window.
# ---------------------------------------------------------------------------

def _ring_pos(x: float, y: float, ring: list) -> int:
    """0 = outside, 1 = on boundary, 2 = strictly inside (even-odd)."""
    inside = False
    for i in range(len(ring) - 1):
        x0, y0 = ring[i]
        x1, y1 = ring[i + 1]
        if (min(x0, x1) <= x <= max(x0, x1)) and (min(y0, y1) <= y <= max(y0, y1)):
            if (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0) == 0:
                return 1
        if (y0 > y) != (y1 > y):
            xin = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
            if x < xin:
                inside = not inside
    return 2 if inside else 0


def _poly_pos(rings: list, x: float, y: float) -> int:
    pos = _ring_pos(x, y, rings[0]) if rings else 0
    if pos != 2:
        return pos
    for hole in rings[1:]:
        hp = _ring_pos(x, y, hole)
        if hp == 1:
            return 1
        if hp == 2:
            return 0
    return 2


def _geom_pos(gtype: int, coords: list, x: float, y: float) -> int:
    """Position of (x,y) relative to one geometry: 0 outside / 1 on the
    geometry's topological boundary / 2 in its interior. A linestring's
    boundary is its two endpoints (DE-9IM); a point's interior is
    itself."""
    if gtype == WKB_POINT:
        return 2 if coords[0] == (x, y) else 0
    if gtype == WKB_LINESTRING:
        closed = coords[0] == coords[-1]
        if not closed and ((x, y) == coords[0] or (x, y) == coords[-1]):
            return 1
        for s, e in zip(coords, coords[1:]):
            if _on_segment(*s, *e, x, y):
                return 2
        return 0
    if gtype == WKB_POLYGON:
        return _poly_pos(coords, x, y)
    if gtype in _MULTI_TYPES:
        return max(
            (_geom_pos(kt, kc, x, y) for kt, kc in coords), default=0
        )
    raise ValueError(f"unsupported geometry type {gtype}")


def _dim_of(gtype: int, coords: list) -> int:
    if gtype in (WKB_POINT, WKB_MULTIPOINT):
        return 0
    if gtype in (WKB_LINESTRING, WKB_MULTILINESTRING):
        return 1
    if gtype == WKB_POLYGON:
        return 2
    return max((_dim_of(kt, kc) for kt, kc in coords), default=0)


def _sample_points(gtype: int, coords: list) -> list:
    """Vertices plus segment midpoints — the pointwise witnesses the
    relation tests evaluate."""
    pts = list(_flat_coords(gtype, coords))
    for s, e in _segments_of(gtype, coords):
        pts.append(((s[0] + e[0]) / 2.0, (s[1] + e[1]) / 2.0))
    return pts


def _proper_cross(p1, p2, p3, p4) -> bool:
    d1 = _orient(*p3, *p4, *p1)
    d2 = _orient(*p3, *p4, *p2)
    d3 = _orient(*p1, *p2, *p3)
    d4 = _orient(*p1, *p2, *p4)
    return d1 * d2 < 0 and d3 * d4 < 0


def _any_proper_cross(ta, ca, tb, cb) -> bool:
    for s1, e1 in _segments_of(ta, ca):
        for s2, e2 in _segments_of(tb, cb):
            if _proper_cross(s1, e1, s2, e2):
                return True
    return False


def _rel_covers(ta, ca, tb, cb) -> bool:
    """Every point of b lies in a's closure."""
    if _dim_of(ta, ca) < _dim_of(tb, cb):
        return False
    for p in _sample_points(tb, cb):
        if _geom_pos(ta, ca, *p) == 0:
            return False
    # a 2D cover is violated by any proper boundary crossing
    if _dim_of(ta, ca) == 2 and _any_proper_cross(ta, ca, tb, cb):
        return False
    return True


def _rel_interiors_intersect(ta, ca, tb, cb) -> bool:
    """Witness rules, each exact: (1) a proper segment crossing; (2) a
    sample point interior to BOTH geometries; (3) a sample of one
    geometry interior to the other when that other is 2-dimensional —
    its interior is open in R² and the sampled geometry's interior is
    dense in its closure, so the open neighborhood must meet it (the
    converse shortcut is NOT valid for 1-dim interiors, e.g. a line
    lying along a polygon's boundary ring)."""
    if _any_proper_cross(ta, ca, tb, cb):
        return True
    da, db = _dim_of(ta, ca), _dim_of(tb, cb)
    for p in _sample_points(tb, cb):
        pa = _geom_pos(ta, ca, *p)
        if pa == 2 and (da == 2 or _geom_pos(tb, cb, *p) == 2):
            return True
    for p in _sample_points(ta, ca):
        pb = _geom_pos(tb, cb, *p)
        if pb == 2 and (db == 2 or _geom_pos(ta, ca, *p) == 2):
            return True
    return False


def _collinear_overlap(ta, ca, tb, cb) -> bool:
    """True if some segment pair shares a positive-length collinear
    stretch (a 1-dimensional intersection)."""
    for s1, e1 in _segments_of(ta, ca):
        for s2, e2 in _segments_of(tb, cb):
            if (
                _orient(*s1, *e1, *s2) == 0
                and _orient(*s1, *e1, *e2) == 0
            ):
                # project onto the dominant axis and test interval overlap
                if abs(e1[0] - s1[0]) >= abs(e1[1] - s1[1]):
                    lo1, hi1 = sorted((s1[0], e1[0]))
                    lo2, hi2 = sorted((s2[0], e2[0]))
                else:
                    lo1, hi1 = sorted((s1[1], e1[1]))
                    lo2, hi2 = sorted((s2[1], e2[1]))
                if min(hi1, hi2) - max(lo1, lo2) > 0:
                    return True
    return False


def _rel_contains(ta, ca, tb, cb) -> bool:
    return _rel_covers(ta, ca, tb, cb) and _rel_interiors_intersect(ta, ca, tb, cb)


def _rel_containsproperly(ta, ca, tb, cb) -> bool:
    """b ⊆ interior(a): every sample strictly interior and b's segments
    never touch a's boundary."""
    for p in _sample_points(tb, cb):
        if _geom_pos(ta, ca, *p) != 2:
            return False
    if _dim_of(ta, ca) == 2:
        for s1, e1 in _segments_of(ta, ca):
            for s2, e2 in _segments_of(tb, cb):
                if _segments_intersect(s1, e1, s2, e2):
                    return False
    return True


def _rel_equals(ta, ca, tb, cb) -> bool:
    return _rel_covers(ta, ca, tb, cb) and _rel_covers(tb, cb, ta, ca)


def _rel_touches(ta, ca, tb, cb) -> bool:
    a = _pack(ta, ca)
    b = _pack(tb, cb)
    return _geoms_intersect(a, b) and not _rel_interiors_intersect(ta, ca, tb, cb)


def _rel_overlaps(ta, ca, tb, cb) -> bool:
    da, db = _dim_of(ta, ca), _dim_of(tb, cb)
    if da != db:
        return False
    if da == 1:
        # 1D overlap requires a 1-dimensional intersection, not an X
        if not _collinear_overlap(ta, ca, tb, cb):
            return False
    elif not _rel_interiors_intersect(ta, ca, tb, cb):
        return False
    return not _rel_covers(ta, ca, tb, cb) and not _rel_covers(tb, cb, ta, ca)


def _rel_crosses(ta, ca, tb, cb) -> bool:
    da, db = _dim_of(ta, ca), _dim_of(tb, cb)
    if da == db == 1:
        # line/line: interiors meet, and only at points (not collinearly)
        return (
            _rel_interiors_intersect(ta, ca, tb, cb)
            and not _collinear_overlap(ta, ca, tb, cb)
        )
    if da == db:
        return False
    # mixed dims: lower-dim geometry has points both inside and outside
    lo_t, lo_c, hi_t, hi_c = (ta, ca, tb, cb) if da < db else (tb, cb, ta, ca)
    if not _rel_interiors_intersect(ta, ca, tb, cb):
        return False
    return any(_geom_pos(hi_t, hi_c, *p) == 0 for p in _sample_points(lo_t, lo_c))


def _make_rel_kernel(rel):
    @pandas_udf(BooleanType())
    def k(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(a, b):
            if ba is None or bb is None:
                out.append(None)
            else:
                ta, ca = _parse(bytes(ba))
                tb, cb = _parse(bytes(bb))
                out.append(rel(ta, ca, tb, cb))
        return pd.Series(out, dtype=object)

    return k


_k_contains = _make_rel_kernel(_rel_contains)
_k_covers = _make_rel_kernel(_rel_covers)
_k_containsproperly = _make_rel_kernel(_rel_containsproperly)
_k_equals = _make_rel_kernel(_rel_equals)
_k_touches = _make_rel_kernel(_rel_touches)
_k_overlaps = _make_rel_kernel(_rel_overlaps)
_k_crosses = _make_rel_kernel(_rel_crosses)
_k_within = _make_rel_kernel(lambda ta, ca, tb, cb: _rel_contains(tb, cb, ta, ca))
_k_coveredby = _make_rel_kernel(lambda ta, ca, tb, cb: _rel_covers(tb, cb, ta, ca))


def _colify(v):
    return F.col(v) if isinstance(v, str) else v


def st_contains(a, b) -> Column:
    """a contains b: b in a's closure and their interiors meet. Exact
    orientation tests; use bbox_contains as the pushable prefilter and
    this as the verify stage (reference: st_contains via GEOS,
    shippable_spatial_functions.c)."""
    return _k_contains(_colify(a), _colify(b))


def st_within(a, b) -> Column:
    return _k_within(_colify(a), _colify(b))


def st_covers(a, b) -> Column:
    return _k_covers(_colify(a), _colify(b))


def st_coveredby(a, b) -> Column:
    return _k_coveredby(_colify(a), _colify(b))


def st_containsproperly(a, b) -> Column:
    return _k_containsproperly(_colify(a), _colify(b))


def st_equals(a, b) -> Column:
    """Topological equality (mutual cover) — TRUE for the same point set
    regardless of vertex order/count, unlike st_orderingequals."""
    return _k_equals(_colify(a), _colify(b))


def st_touches(a, b) -> Column:
    return _k_touches(_colify(a), _colify(b))


def st_crosses(a, b) -> Column:
    return _k_crosses(_colify(a), _colify(b))


def st_overlaps(a, b) -> Column:
    return _k_overlaps(_colify(a), _colify(b))


@pandas_udf(BooleanType())
def _k_issimple(g: pd.Series) -> pd.Series:
    def line_simple(coords) -> bool:
        segs = list(zip(coords, coords[1:]))
        n = len(segs)
        closed = len(coords) >= 3 and coords[0] == coords[-1]
        for i in range(n):
            for j in range(i + 1, n):
                if j == i + 1 or (closed and i == 0 and j == n - 1):
                    continue
                if _segments_intersect(*segs[i], *segs[j]):
                    return False
        return True

    def mls_simple(comps) -> bool:
        """OGC: a MULTILINESTRING is simple iff every element is simple
        AND elements meet only at points on the BOUNDARY of both (open
        endpoints; a closed element has no boundary). The old check ran
        line_simple per element only, so crossing components passed
        (r15 review)."""
        if not all(line_simple(c) for c in comps):
            return False

        def bnd(c):
            return set() if (len(c) >= 3 and c[0] == c[-1]) else {c[0], c[-1]}

        for i in range(len(comps)):
            for j in range(i + 1, len(comps)):
                allowed = bnd(comps[i]) & bnd(comps[j])
                for sa in zip(comps[i], comps[i][1:]):
                    for sb in zip(comps[j], comps[j][1:]):
                        if not _segments_intersect(*sa, *sb):
                            continue
                        d1 = _orient(*sb[0], *sb[1], *sa[0])
                        d2 = _orient(*sb[0], *sb[1], *sa[1])
                        d3 = _orient(*sa[0], *sa[1], *sb[0])
                        d4 = _orient(*sa[0], *sa[1], *sb[1])
                        if (
                            (d1 > 0) != (d2 > 0)
                            and (d3 > 0) != (d4 > 0)
                            and 0.0 not in (d1, d2, d3, d4)
                        ):
                            return False  # proper interior crossing
                        # touching: every endpoint-on-segment contact
                        # must be a shared boundary point of BOTH lines
                        touches = [
                            p for p in sa if _on_segment(*sb[0], *sb[1], *p)
                        ] + [p for p in sb if _on_segment(*sa[0], *sa[1], *p)]
                        if any(p not in allowed for p in touches):
                            return False
        return True

    def simple(gtype, coords) -> bool:
        if gtype == WKB_POINT:
            return True
        if gtype == WKB_MULTIPOINT:
            pts = [kc[0] for _, kc in coords]
            return len(pts) == len(set(pts))
        if gtype == WKB_LINESTRING:
            return line_simple(coords)
        if gtype == WKB_MULTILINESTRING:
            return mls_simple([kc for _, kc in coords])
        # polygons: valid structure implies simple for this slice
        return True

    return pd.Series(
        [None if b is None else simple(*_parse(bytes(b))) for b in g],
        dtype=object,
    )


def st_issimple(g) -> Column:
    """No anomalous self-intersection: exact pairwise segment tests for
    (multi)linestrings, duplicate-point test for multipoints."""
    return _k_issimple(_colify(g))


# ---------------------------------------------------------------------------
# geometry processing: convex hull, point-on-surface, ring accessors,
# collection extract, line merge, precision/validity repair
# (reference: shippable_spatial_functions.c — st_convexhull,
# st_pointonsurface, st_exteriorring, st_numinteriorrings, st_numpoints,
# st_collectionextract, st_linemerge, st_normalize, st_makevalid,
# st_reduceprecision, st_simplifypreservetopology)
# ---------------------------------------------------------------------------

def _convex_hull(pts: list) -> tuple[int, list]:
    """Andrew's monotone chain. Returns (geom_type, coords) — degrades
    to POINT/LINESTRING for <3 distinct/collinear inputs like PostGIS."""
    pts = sorted(set(pts))
    if len(pts) == 1:
        return WKB_POINT, [pts[0]]
    if len(pts) == 2:
        return WKB_LINESTRING, pts

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and _orient(*out[-2], *out[-1], *p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(reversed(pts))
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:  # all collinear
        return WKB_LINESTRING, [pts[0], pts[-1]]
    # counter-clockwise shell, closed
    return WKB_POLYGON, [hull + [hull[0]]]


@pandas_udf(BinaryType())
def _k_convexhull(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(_pack(*_convex_hull(_flat_coords(gtype, coords))))
    return pd.Series(out, dtype=object)


def _point_on_surface(gtype: int, coords: list) -> tuple[float, float]:
    if gtype == WKB_POINT:
        return coords[0]
    if gtype == WKB_LINESTRING:
        return coords[len(coords) // 2]
    if gtype in _MULTI_TYPES:
        # largest component (by area then length then first)
        best, best_key = None, None
        for kt, kc in coords:
            key = (_area_of(kt, kc), _length_of(kt, kc))
            if best is None or key > best_key:
                best, best_key = (kt, kc), key
        return _point_on_surface(*best)
    # polygon: centroid when strictly interior, else a horizontal
    # scanline through the interior — midpoint of the first inside span
    rings = coords
    _, c = _parse(_k_centroid_py(_pack(gtype, coords)))
    cx, cy = c[0]
    if _poly_pos(rings, cx, cy) == 2:
        return (cx, cy)
    ys = sorted({y for ring in rings for _, y in ring})
    # scan between distinct vertex y's: guaranteed to avoid vertices
    mid_i = (len(ys) - 1) // 2
    y = (ys[mid_i] + ys[mid_i + 1]) / 2.0 if len(ys) > 1 else ys[0]
    xs = []
    for ring in rings:
        for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
            if (y0 > y) != (y1 > y):
                xs.append(x0 + (y - y0) * (x1 - x0) / (y1 - y0))
    xs.sort()
    best_x, best_w = None, -1.0
    for lo, hi in zip(xs[0::2], xs[1::2]):
        if hi - lo > best_w:
            best_x, best_w = (lo + hi) / 2.0, hi - lo
    return (best_x, y) if best_x is not None else (cx, cy)


def _k_centroid_py(b: bytes) -> bytes:
    """Driver-side reuse of the centroid kernel's math — literally the
    same helper _k_centroid runs executor-side (the hole-aware math
    used to live only here while the kernel was exterior-ring-only;
    r15 review unified them)."""
    return _pack_point(*_centroid_of(*_parse(b)))


@pandas_udf(BinaryType())
def _k_pointonsurface(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(_pack_point(*_point_on_surface(gtype, coords)))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_exteriorring(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(
            _pack_linestring(coords[0]) if gtype == WKB_POLYGON else None
        )
    return pd.Series(out, dtype=object)


@pandas_udf(IntegerType())
def _k_numinteriorrings(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(len(coords) - 1 if gtype == WKB_POLYGON else None)
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_interiorringn(g: pd.Series, n: pd.Series) -> pd.Series:
    out = []
    for b, i in zip(g, n):
        if b is None or i is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        i = int(i)  # 1-based, PostGIS
        if gtype == WKB_POLYGON and 1 <= i <= len(coords) - 1:
            out.append(_pack_linestring(coords[i]))
        else:
            out.append(None)
    return pd.Series(out, dtype=object)


@pandas_udf(IntegerType())
def _k_numpoints(g: pd.Series) -> pd.Series:
    # PostGIS ST_NumPoints: LINESTRING only, else NULL (st_npoints is
    # the every-type count)
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        out.append(len(coords) if gtype == WKB_LINESTRING else None)
    return pd.Series(out, dtype=object)


_EXTRACT_TO_MULTI = {1: WKB_MULTIPOINT, 2: WKB_MULTILINESTRING, 3: WKB_MULTIPOLYGON}


@pandas_udf(BinaryType())
def _k_collectionextract(g: pd.Series, want: pd.Series) -> pd.Series:
    out = []
    for b, t in zip(g, want):
        if b is None or t is None:
            out.append(None)
            continue
        t = int(t)  # 1=point, 2=line, 3=polygon (PostGIS)
        mtype = _EXTRACT_TO_MULTI[t]
        gtype, coords = _parse(bytes(b))
        if gtype in _MULTI_TYPES:
            kids = [(kt, kc) for kt, kc in coords if kt == t]
        else:
            kids = [(gtype, coords)] if gtype == t else []
        out.append(_pack(mtype, kids) if kids else None)
    return pd.Series(out, dtype=object)


def _line_merge(parts: list) -> list:
    """Stitch linestrings that share endpoints into maximal lines
    (greedy; direction-insensitive like GEOS LineMerger)."""
    parts = [list(p) for p in parts]
    merged = True
    while merged:
        merged = False
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                a, b = parts[i], parts[j]
                if a[-1] == b[0]:
                    parts[i] = a + b[1:]
                elif a[-1] == b[-1]:
                    parts[i] = a + b[::-1][1:]
                elif a[0] == b[-1]:
                    parts[i] = b + a[1:]
                elif a[0] == b[0]:
                    parts[i] = b[::-1] + a[1:]
                else:
                    continue
                parts.pop(j)
                merged = True
                break
            if merged:
                break
    return parts


@pandas_udf(BinaryType())
def _k_linemerge(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))
        if gtype == WKB_LINESTRING:
            out.append(bytes(b))
            continue
        if gtype != WKB_MULTILINESTRING:
            out.append(None)
            continue
        parts = _line_merge([kc for _, kc in coords])
        if len(parts) == 1:
            out.append(_pack_linestring(parts[0]))
        else:
            out.append(
                _pack(WKB_MULTILINESTRING, [(WKB_LINESTRING, p) for p in parts])
            )
    return pd.Series(out, dtype=object)


def _dedupe_consecutive(coords: list) -> list:
    out = [coords[0]]
    for p in coords[1:]:
        if p != out[-1]:
            out.append(p)
    return out


@pandas_udf(BinaryType())
def _k_reduceprecision(g: pd.Series, grid: pd.Series) -> pd.Series:
    out = []
    for b, gs in zip(g, grid):
        if b is None or gs is None:
            out.append(None)
            continue
        gs = float(gs)

        def snap(x, y):
            return (round(x / gs) * gs, round(y / gs) * gs)

        gtype, coords = _parse(bytes(b))

        def fix(gt, cs):
            if gt == WKB_POINT:
                return gt, [snap(*cs[0])]
            if gt == WKB_LINESTRING:
                c = _dedupe_consecutive([snap(*p) for p in cs])
                return (gt, c) if len(c) >= 2 else (None, None)
            if gt == WKB_POLYGON:
                rings = []
                for r in cs:
                    c = _dedupe_consecutive([snap(*p) for p in r])
                    if c[0] != c[-1]:
                        c.append(c[0])
                    if len(c) >= 4:
                        rings.append(c)
                return (gt, rings) if rings else (None, None)
            kids = []
            for kt, kc in cs:
                ft, fc = fix(kt, kc)
                if ft is not None:
                    kids.append((ft, fc))
            return (gt, kids) if kids else (None, None)

        ft, fc = fix(gtype, coords)
        out.append(None if ft is None else _pack(ft, fc))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_makevalid(g: pd.Series) -> pd.Series:
    """Structural repair: close open rings, drop consecutive duplicate
    vertices, drop rings/lines that collapse below the minimum point
    count. (GEOS MakeValid's node-and-rebuild is out of scope; this is
    the repair the structural st_isvalid checks for.)"""
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gtype, coords = _parse(bytes(b))

        def fix(gt, cs):
            if gt == WKB_POINT:
                return gt, cs
            if gt == WKB_LINESTRING:
                c = _dedupe_consecutive(cs)
                return (gt, c) if len(c) >= 2 else (None, None)
            if gt == WKB_POLYGON:
                rings = []
                for r in cs:
                    c = _dedupe_consecutive(r)
                    if c[0] != c[-1]:
                        c.append(c[0])
                    if len(c) >= 4:
                        rings.append(c)
                return (gt, rings) if rings else (None, None)
            kids = []
            for kt, kc in cs:
                ft, fc = fix(kt, kc)
                if ft is not None:
                    kids.append((ft, fc))
            return (gt, kids) if kids else (None, None)

        ft, fc = fix(gtype, coords)
        out.append(None if ft is None else _pack(ft, fc))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def _k_simplify_preserve(g: pd.Series, tol: pd.Series) -> pd.Series:
    """Douglas-Peucker that never collapses a geometry: rings keep >= 4
    points, lines keep their endpoints — the st_simplifypreservetopology
    contract (vs st_simplify, which may drop small rings)."""
    out = []
    for b, t in zip(g, tol):
        if b is None or t is None:
            out.append(None)
            continue
        t = float(t)
        gtype, coords = _parse(bytes(b))

        def simp_ring(r):
            s = _dp_simplify(r, t)
            # never collapse: a ring that would degenerate keeps its
            # original vertices (the "preserve topology" contract)
            return s if len(s) >= 4 else r

        def simp(gt, cs):
            if gt == WKB_POINT:
                return gt, cs
            if gt == WKB_LINESTRING:
                return gt, _dp_simplify(cs, t)
            if gt == WKB_POLYGON:
                return gt, [simp_ring(r) for r in cs]
            return gt, [simp(kt, kc) for kt, kc in cs]

        out.append(_pack(*simp(gtype, coords)))
    return pd.Series(out, dtype=object)


def st_convexhull(g) -> Column:
    """Exact convex hull (Andrew's monotone chain over all vertices);
    degrades to POINT/LINESTRING for degenerate input like PostGIS."""
    return _k_convexhull(_colify(g))


def st_pointonsurface(g) -> Column:
    """A point guaranteed on the geometry: centroid when interior, else
    the midpoint of the widest interior span of a vertex-free scanline."""
    return _k_pointonsurface(_colify(g))


def st_exteriorring(g) -> Column:
    return _k_exteriorring(_colify(g))


def st_numinteriorrings(g) -> Column:
    return _k_numinteriorrings(_colify(g))


def st_interiorringn(g, n) -> Column:
    n = F.lit(n) if isinstance(n, int) else _colify(n)
    return _k_interiorringn(_colify(g), n)


def st_numpoints(g) -> Column:
    """PostGIS ST_NumPoints: vertex count for LINESTRING, NULL otherwise
    (use st_npoints for the any-type count)."""
    return _k_numpoints(_colify(g))


def st_collectionextract(g, gtype: int) -> Column:
    """Extract components of the given dimension type (1=point, 2=line,
    3=polygon) as the corresponding MULTI geometry; NULL when none."""
    t = F.lit(gtype) if isinstance(gtype, int) else _colify(gtype)
    return _k_collectionextract(_colify(g), t)


def st_linemerge(g) -> Column:
    """Stitch a MULTILINESTRING's touching components into maximal
    linestrings (greedy endpoint matching, direction-insensitive)."""
    return _k_linemerge(_colify(g))


def st_normalize(g) -> Column:
    """Canonical little-endian WKB byte form (stable for equality and
    grouping on the binary column)."""
    return _k_normalize(_colify(g))


def st_makevalid(g) -> Column:
    return _k_makevalid(_colify(g))


def st_reduceprecision(g, gridsize) -> Column:
    gs = F.lit(gridsize) if isinstance(gridsize, (int, float)) else _colify(gridsize)
    return _k_reduceprecision(_colify(g), gs)


def st_simplifypreservetopology(g, tolerance) -> Column:
    t = F.lit(tolerance) if isinstance(tolerance, (int, float)) else _colify(tolerance)
    return _k_simplify_preserve(_colify(g), t)


def st_extent(g) -> Column:
    """PostGIS ST_Extent is the aggregate bbox — alias of st_extent_agg."""
    return st_extent_agg(g)


# ---------------------------------------------------------------------------
# Z/M coordinate dimensions (st_z/st_m/st_zmflag/st_force3dz/st_force3dm/
# st_force4d + a dimension-preserving st_force2d) and st_transform.
# The 2D codec above reads Z/M WKB by slicing XY; these kernels keep the
# full tuples. Output is ISO WKB (type + 1000Z + 2000M).
# ---------------------------------------------------------------------------

def _parse_full_at(b: bytes, off: int):
    bo = "<" if b[off] == 1 else ">"
    (raw,) = struct.unpack_from(bo + "I", b, off + 1)
    gtype, has_z, has_m = _wkb_dims(raw)
    off += 5
    if raw & 0x20000000:
        off += 4
    nd = 2 + has_z + has_m

    def pts(n, o):
        vals = struct.unpack_from(bo + f"{nd * n}d", b, o)
        return (
            [tuple(vals[nd * i : nd * i + nd]) for i in range(n)],
            o + 8 * nd * n,
        )

    if gtype == WKB_POINT:
        coords, off = pts(1, off)
        return gtype, has_z, has_m, coords, off
    if gtype == WKB_LINESTRING:
        (n,) = struct.unpack_from(bo + "I", b, off)
        coords, off = pts(n, off + 4)
        return gtype, has_z, has_m, coords, off
    if gtype == WKB_POLYGON:
        (nr,) = struct.unpack_from(bo + "I", b, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", b, off)
            ring, off = pts(n, off + 4)
            rings.append(ring)
        return gtype, has_z, has_m, rings, off
    if gtype in _MULTI_TYPES:
        (n,) = struct.unpack_from(bo + "I", b, off)
        off += 4
        kids = []
        hz = hm = False
        for _ in range(n):
            kt, kz, km, kc, off = _parse_full_at(b, off)
            hz, hm = hz or kz, hm or km
            kids.append((kt, kz, km, kc))
        return gtype, hz, hm, kids, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _parse_full(b: bytes):
    gtype, has_z, has_m, coords, _ = _parse_full_at(b, 0)
    return gtype, has_z, has_m, coords


def _iso_type(gtype: int, has_z: bool, has_m: bool) -> int:
    return gtype + (1000 if has_z else 0) + (2000 if has_m else 0)


def _pack_full(gtype: int, has_z: bool, has_m: bool, coords: list) -> bytes:
    t = _iso_type(gtype, has_z, has_m)
    if gtype == WKB_POINT:
        return struct.pack("<BI", 1, t) + struct.pack(
            f"<{len(coords[0])}d", *coords[0]
        )
    if gtype == WKB_LINESTRING:
        out = struct.pack("<BII", 1, t, len(coords))
        for p in coords:
            out += struct.pack(f"<{len(p)}d", *p)
        return out
    if gtype == WKB_POLYGON:
        out = struct.pack("<BII", 1, t, len(coords))
        for ring in coords:
            out += struct.pack("<I", len(ring))
            for p in ring:
                out += struct.pack(f"<{len(p)}d", *p)
        return out
    out = struct.pack("<BII", 1, t, len(coords))
    for kt, kz, km, kc in coords:
        out += _pack_full(kt, kz, km, kc)
    return out


def _retuple(p: tuple, has_z: bool, has_m: bool, to_z: bool, to_m: bool,
             z0: float, m0: float) -> tuple:
    x, y = p[0], p[1]
    z = p[2] if has_z else z0
    m = (p[3] if has_z else p[2]) if has_m else m0
    out = [x, y]
    if to_z:
        out.append(z)
    if to_m:
        out.append(m)
    return tuple(out)


def _force_dims(b: bytes, to_z: bool, to_m: bool, z0: float = 0.0,
                m0: float = 0.0) -> bytes:
    def conv(gt, hz, hm, cs):
        if gt == WKB_POINT:
            return gt, to_z, to_m, [_retuple(cs[0], hz, hm, to_z, to_m, z0, m0)]
        if gt == WKB_LINESTRING:
            return gt, to_z, to_m, [
                _retuple(p, hz, hm, to_z, to_m, z0, m0) for p in cs
            ]
        if gt == WKB_POLYGON:
            return gt, to_z, to_m, [
                [_retuple(p, hz, hm, to_z, to_m, z0, m0) for p in r] for r in cs
            ]
        return gt, to_z, to_m, [conv(kt, kz, km, kc) for kt, kz, km, kc in cs]

    return _pack_full(*conv(*_parse_full(b)))


def _make_force_kernel(to_z: bool, to_m: bool):
    @pandas_udf(BinaryType())
    def k(g: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None else _force_dims(bytes(b), to_z, to_m) for b in g],
            dtype=object,
        )

    return k


_k_force3dz = _make_force_kernel(True, False)
_k_force3dm = _make_force_kernel(False, True)
_k_force4d = _make_force_kernel(True, True)
_k_force2d_full = _make_force_kernel(False, False)


@pandas_udf(DoubleType())
def _k_z(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gt, hz, hm, cs = _parse_full(bytes(b))
        out.append(cs[0][2] if gt == WKB_POINT and hz else None)
    return pd.Series(out, dtype=object)


@pandas_udf(DoubleType())
def _k_m(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        gt, hz, hm, cs = _parse_full(bytes(b))
        if gt == WKB_POINT and hm:
            out.append(cs[0][3] if hz else cs[0][2])
        else:
            out.append(None)
    return pd.Series(out, dtype=object)


@pandas_udf(IntegerType())
def _k_zmflag(g: pd.Series) -> pd.Series:
    out = []
    for b in g:
        if b is None:
            out.append(None)
            continue
        _, hz, hm, _ = _parse_full(bytes(b))
        out.append((2 if hz else 0) + (1 if hm else 0))
    return pd.Series(out, dtype=object)


def st_z(g) -> Column:
    """Z of a 3D point; NULL for 2D input or non-points."""
    return _k_z(_colify(g))


def st_m(g) -> Column:
    return _k_m(_colify(g))


def st_zmflag(g) -> Column:
    """PostGIS ST_Zmflag: 0=2D, 1=XYM, 2=XYZ, 3=XYZM."""
    return _k_zmflag(_colify(g))


def st_force3dz(g) -> Column:
    """XYZ output (missing Z filled with 0, M dropped); ISO WKB type."""
    return _k_force3dz(_colify(g))


def st_force3dm(g) -> Column:
    return _k_force3dm(_colify(g))


def st_force4d(g) -> Column:
    return _k_force4d(_colify(g))


# ---------------------------------------------------------------------------
# st_transform: WGS84 lon/lat (EPSG:4326) <-> spherical Web Mercator
# (EPSG:3857), the closed-form pair. The reference delegates arbitrary
# SRID pairs to PROJ; anything else raises loudly here.
# ---------------------------------------------------------------------------

_WEB_MERCATOR_R = 6378137.0


def _tx_4326_3857(x: float, y: float) -> tuple[float, float]:
    mx = math.radians(x) * _WEB_MERCATOR_R
    my = math.log(math.tan(math.pi / 4 + math.radians(y) / 2)) * _WEB_MERCATOR_R
    return mx, my


def _tx_3857_4326(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / _WEB_MERCATOR_R)
    lat = math.degrees(2 * math.atan(math.exp(y / _WEB_MERCATOR_R)) - math.pi / 2)
    return lon, lat


_TRANSFORMS = {(4326, 3857): _tx_4326_3857, (3857, 4326): _tx_3857_4326}

# -- UTM (EPSG:326zz north / 327zz south) via the Krüger flattening
# series on WGS84, the same order-n^6 expansion proj's tmerc uses —
# sub-millimeter within a zone, dependency-free. Forward/inverse per
# Krüger 1912 (coefficients as tabulated in the standard flattening-
# series references).
_WGS84_A = 6378137.0
_WGS84_F = 1 / 298.257223563
_TM_N = _WGS84_F / (2 - _WGS84_F)
_TM_ABAR = _WGS84_A / (1 + _TM_N) * (
    1 + _TM_N**2 / 4 + _TM_N**4 / 64 + _TM_N**6 / 256
)
_n = _TM_N
_TM_ALPHA = (
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440
    + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
)
_TM_BETA = (
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
)
_TM_DELTA = (
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45
    + 26 * _n**5 / 45 - 2854 * _n**6 / 675,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45 + 2704 * _n**5 / 315
    + 2323 * _n**6 / 945,
    56 * _n**3 / 15 - 136 * _n**4 / 35 - 1262 * _n**5 / 105
    + 73814 * _n**6 / 2835,
    4279 * _n**4 / 630 - 332 * _n**5 / 35 - 399572 * _n**6 / 14175,
    4174 * _n**5 / 315 - 144838 * _n**6 / 6237,
    601676 * _n**6 / 22275,
)
del _n
_UTM_K0 = 0.9996
_UTM_FE = 500000.0
_UTM_FN_SOUTH = 10000000.0


def _utm_forward(zone: int, south: bool):
    lam0 = math.radians(zone * 6 - 183)

    def fn(x: float, y: float) -> tuple[float, float]:
        lam, phi = math.radians(x), math.radians(y)
        two_rtn = 2 * math.sqrt(_TM_N) / (1 + _TM_N)
        t = math.sinh(
            math.atanh(math.sin(phi))
            - two_rtn * math.atanh(two_rtn * math.sin(phi))
        )
        dl = lam - lam0
        xi = math.atan2(t, math.cos(dl))
        eta = math.asinh(math.sin(dl) / math.hypot(t, math.cos(dl)))
        xs, es = xi, eta
        for j, a in enumerate(_TM_ALPHA, 1):
            xs += a * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
            es += a * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        E = _UTM_FE + _UTM_K0 * _TM_ABAR * es
        N = (_UTM_FN_SOUTH if south else 0.0) + _UTM_K0 * _TM_ABAR * xs
        return E, N

    return fn


def _utm_inverse(zone: int, south: bool):
    lam0 = math.radians(zone * 6 - 183)

    def fn(x: float, y: float) -> tuple[float, float]:
        xi = (y - (_UTM_FN_SOUTH if south else 0.0)) / (_UTM_K0 * _TM_ABAR)
        eta = (x - _UTM_FE) / (_UTM_K0 * _TM_ABAR)
        xp, ep = xi, eta
        for j, b in enumerate(_TM_BETA, 1):
            xp -= b * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
            ep -= b * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        chi = math.asin(math.sin(xp) / math.cosh(ep))
        phi = chi
        for j, d in enumerate(_TM_DELTA, 1):
            phi += d * math.sin(2 * j * chi)
        lam = lam0 + math.atan2(math.sinh(ep), math.cos(xp))
        return math.degrees(lam), math.degrees(phi)

    return fn


def _utm_zone(srid: int) -> tuple[int, bool] | None:
    """(zone, south) for EPSG:326zz/327zz, else None."""
    if 32601 <= srid <= 32660:
        return srid - 32600, False
    if 32701 <= srid <= 32760:
        return srid - 32700, True
    return None


# -- Lambert Conformal Conic 2SP (EPSG method 9802) with an embedded
# EPSG parameter subset — the most common projected-CRS family after
# UTM/WebMercator (national grids, US State Plane). Formulas follow
# EPSG Guidance Note 7-2 exactly (ellipsoidal t/m/n/F/r). Datum note:
# RGF93/ETRS89/NAD83 are treated as coincident with WGS84 — the same
# null-transform convention PROJ applies without a datum-shift grid
# (≤ ~1-2 m, far below projection accuracy claims for analytics).
_GRS80_A = 6378137.0
_GRS80_F = 1 / 298.257222101
#: 1 US survey foot in meters (1200/3937, exact)
_US_FT = 1200.0 / 3937.0

#: srid -> (a, f, lat0, lon0, sp1, sp2, false_easting_m, false_northing_m, unit_m)
_LCC_PARAMS = {
    # RGF93 / Lambert-93 (France national grid)
    2154: (_GRS80_A, _GRS80_F, 46.5, 3.0, 49.0, 44.0, 700000.0, 6600000.0, 1.0),
    # ETRS89-extended / LCC Europe
    3034: (_GRS80_A, _GRS80_F, 52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0, 1.0),
    # NAD83 / New York Long Island (meters)
    32118: (
        _GRS80_A, _GRS80_F,
        40.0 + 10.0 / 60.0, -74.0,
        41.0 + 2.0 / 60.0, 40.0 + 40.0 / 60.0,
        300000.0, 0.0, 1.0,
    ),
    # NAD83 / New York Long Island (US survey feet): same projection,
    # coordinates expressed in ftUS (300000 m = 984250 ftUS exactly)
    2263: (
        _GRS80_A, _GRS80_F,
        40.0 + 10.0 / 60.0, -74.0,
        41.0 + 2.0 / 60.0, 40.0 + 40.0 / 60.0,
        300000.0, 0.0, _US_FT,
    ),
}


def _lcc_consts(p):
    a, f, lat0, lon0, sp1, sp2, fe, fn_, unit = p
    e = math.sqrt(f * (2 - f))

    def m(phi):
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1 - e * e * s * s)

    def t(phi):
        s = math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / (
            (1 - e * s) / (1 + e * s)
        ) ** (e / 2)

    p1, p2, p0 = math.radians(sp1), math.radians(sp2), math.radians(lat0)
    n = (math.log(m(p1)) - math.log(m(p2))) / (math.log(t(p1)) - math.log(t(p2)))
    F_ = m(p1) / (n * t(p1) ** n)
    r0 = a * F_ * t(p0) ** n
    return a, e, math.radians(lon0), n, F_, r0, fe, fn_, unit, t


def _lcc_forward(p):
    a, e, lam0, n, F_, r0, fe, fn_, unit, t = _lcc_consts(p)

    def fn(x: float, y: float) -> tuple[float, float]:
        phi, lam = math.radians(y), math.radians(x)
        r = a * F_ * t(phi) ** n if abs(y) < 90.0 else 0.0
        th = n * (lam - lam0)
        E = fe + r * math.sin(th)
        N = fn_ + r0 - r * math.cos(th)
        return E / unit, N / unit

    return fn


def _lcc_inverse(p):
    a, e, lam0, n, F_, r0, fe, fn_, unit, _t = _lcc_consts(p)

    def fn(x: float, y: float) -> tuple[float, float]:
        dx = x * unit - fe
        dy = r0 - (y * unit - fn_)
        r = math.copysign(math.hypot(dx, dy), n)
        tp = (r / (a * F_)) ** (1.0 / n)
        # EPSG 9802: negate both atan2 operands when n is negative
        th = math.atan2(-dx, -dy) if n < 0 else math.atan2(dx, dy)
        lam = th / n + lam0
        phi = math.pi / 2 - 2 * math.atan(tp)
        for _ in range(15):
            s = math.sin(phi)
            new = math.pi / 2 - 2 * math.atan(
                tp * ((1 - e * s) / (1 + e * s)) ** (e / 2)
            )
            if abs(new - phi) < 1e-13:
                phi = new
                break
            phi = new
        return math.degrees(lam), math.degrees(phi)

    return fn


# -- Generalized Transverse Mercator (any ellipsoid) + 7-parameter
# Helmert datum shift: the two pieces that extend the Krüger series
# beyond WGS84 — here powering OSGB British National Grid (EPSG:27700,
# Airy 1830 ellipsoid + OSGB36 datum). Helmert without a distortion
# grid is the standard PROJ/PostGIS fallback, published accuracy ~3.5 m
# for OSGB36 (OSTN15-grid territory beyond that) — documented, and far
# inside analytics tolerance.

def _tm_consts(a: float, f: float):
    """Krüger order-n^6 series coefficients for ellipsoid (a, f) —
    same formulas as the WGS84 module constants above, parameterized."""
    n = f / (2 - f)
    abar = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440
        + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    )
    delta = (
        2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45
        + 26 * n**5 / 45 - 2854 * n**6 / 675,
        7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45 + 2704 * n**5 / 315
        + 2323 * n**6 / 945,
        56 * n**3 / 15 - 136 * n**4 / 35 - 1262 * n**5 / 105
        + 73814 * n**6 / 2835,
        4279 * n**4 / 630 - 332 * n**5 / 35 - 399572 * n**6 / 14175,
        4174 * n**5 / 315 - 144838 * n**6 / 6237,
        601676 * n**6 / 22275,
    )
    return n, abar, alpha, beta, delta


def _tm_xi_eta(n: float, phi: float, dl: float):
    two_rtn = 2 * math.sqrt(n) / (1 + n)
    t = math.sinh(math.atanh(math.sin(phi)) - two_rtn * math.atanh(two_rtn * math.sin(phi)))
    xi = math.atan2(t, math.cos(dl))
    eta = math.asinh(math.sin(dl) / math.hypot(t, math.cos(dl)))
    return xi, eta


def _tm_forward_gen(a, f, lat0, lon0, k0, fe, fn_):
    n, abar, alpha, _beta, _delta = _tm_consts(a, f)
    lam0 = math.radians(lon0)
    # meridian-arc offset of the latitude of origin (eta=0 path)
    xi0, _ = _tm_xi_eta(n, math.radians(lat0), 0.0)
    xs0 = xi0 + sum(al * math.sin(2 * j * xi0) for j, al in enumerate(alpha, 1))
    m0 = abar * xs0

    def fwd(x: float, y: float) -> tuple[float, float]:
        phi, lam = math.radians(y), math.radians(x)
        xi, eta = _tm_xi_eta(n, phi, lam - lam0)
        xs, es = xi, eta
        for j, al in enumerate(alpha, 1):
            xs += al * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
            es += al * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        return fe + k0 * abar * es, fn_ + k0 * (abar * xs - m0)

    return fwd


def _tm_inverse_gen(a, f, lat0, lon0, k0, fe, fn_):
    n, abar, alpha, beta, delta = _tm_consts(a, f)
    lam0 = math.radians(lon0)
    xi0, _ = _tm_xi_eta(n, math.radians(lat0), 0.0)
    xs0 = xi0 + sum(al * math.sin(2 * j * xi0) for j, al in enumerate(alpha, 1))
    m0 = abar * xs0

    def inv(x: float, y: float) -> tuple[float, float]:
        xi = (y - fn_ + k0 * m0) / (k0 * abar)
        eta = (x - fe) / (k0 * abar)
        xp, ep = xi, eta
        for j, b in enumerate(beta, 1):
            xp -= b * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
            ep -= b * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        chi = math.asin(max(-1.0, min(1.0, math.sin(xp) / math.cosh(ep))))
        phi = chi
        for j, d in enumerate(delta, 1):
            phi += d * math.sin(2 * j * chi)
        lam = lam0 + math.atan2(math.sinh(ep), math.cos(xp))
        return math.degrees(lam), math.degrees(phi)

    return inv


#: Airy 1830 (OSGB36)
_AIRY_A = 6377563.396
_AIRY_F = 1 / 299.3249646

#: WGS84 -> OSGB36 Helmert (reverse of the published OSGB36->WGS84
#: EPSG:1314 set): translations m, rotations arcsec, scale ppm
_HELMERT_WGS84_TO_OSGB36 = (-446.448, 125.157, -542.060,
                            -0.1502, -0.2470, -0.8421, 20.4894)


def _geodetic_to_cart(a, f, lon, lat, h=0.0):
    e2 = f * (2 - f)
    phi, lam = math.radians(lat), math.radians(lon)
    s, c = math.sin(phi), math.cos(phi)
    nu = a / math.sqrt(1 - e2 * s * s)
    return ((nu + h) * c * math.cos(lam), (nu + h) * c * math.sin(lam),
            (nu * (1 - e2) + h) * s)


def _cart_to_geodetic(a, f, X, Y, Z):
    e2 = f * (2 - f)
    lam = math.atan2(Y, X)
    p = math.hypot(X, Y)
    phi = math.atan2(Z, p * (1 - e2))
    for _ in range(10):
        s = math.sin(phi)
        nu = a / math.sqrt(1 - e2 * s * s)
        phi_new = math.atan2(Z + e2 * nu * s, p)
        if abs(phi_new - phi) < 1e-13:
            phi = phi_new
            break
        phi = phi_new
    return math.degrees(lam), math.degrees(phi)


def _helmert(params, X, Y, Z, inverse=False):
    tx, ty, tz, rx, ry, rz, s_ppm = params
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rx, ry, rz))
    s = 1 + s_ppm * 1e-6
    if not inverse:
        return (tx + s * (X - rz * Y + ry * Z),
                ty + s * (rz * X + Y - rx * Z),
                tz + s * (-ry * X + rx * Y + Z))
    X, Y, Z = X - tx, Y - ty, Z - tz
    return ((X + rz * Y - ry * Z) / s,
            (-rz * X + Y + rx * Z) / s,
            (ry * X - rx * Y + Z) / s)


# -- Oblique Stereographic (EPSG method 9809) — the Netherlands
# national grid (Amersfoort / RD New, EPSG:28992). EPSG Guidance Note
# 7-2 formulas: project the ellipsoid to the conformal sphere at the
# origin, then spherical oblique stereographic. Datum: Bessel 1841 +
# the published Amersfoort->WGS84 position-vector Helmert (the
# grid-free PROJ/PostGIS fallback, ~0.5 m vs NTv2 — documented, same
# convention as OSGB above).
_BESSEL_A = 6377397.155
_BESSEL_F = 1 / 299.1528128

#: Amersfoort -> WGS84 (EPSG:15934 position vector: m, arcsec, ppm)
_HELMERT_AMERSFOORT_TO_WGS84 = (565.4171, 50.3319, 465.5524,
                                -0.398957, 0.343988, -1.87740, 4.0725)

#: RD New projection constants (EPSG:28992 on Bessel 1841)
_RD_LAT0 = 52.0 + 9.0 / 60.0 + 22.178 / 3600.0
_RD_LON0 = 5.0 + 23.0 / 60.0 + 15.500 / 3600.0
_RD_K0 = 0.9999079
_RD_FE, _RD_FN = 155000.0, 463000.0


def _ostereo_consts(a, f, lat0, lon0):
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi0 = math.radians(lat0)
    s0, c0 = math.sin(phi0), math.cos(phi0)
    rho0 = a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
    nu0 = a / math.sqrt(1 - e2 * s0 * s0)
    R = math.sqrt(rho0 * nu0)
    n = math.sqrt(1 + e2 * c0**4 / (1 - e2))
    S1 = (1 + s0) / (1 - s0)
    S2 = (1 - e * s0) / (1 + e * s0)
    w1 = (S1 * S2**e) ** n
    sin_chi00 = (w1 - 1) / (w1 + 1)
    c = (n + s0) * (1 - sin_chi00) / ((n - s0) * (1 + sin_chi00))
    w2 = c * w1
    chi0 = math.asin((w2 - 1) / (w2 + 1))
    lam0 = math.radians(lon0)
    return a, e, R, n, c, chi0, lam0


def _ostereo_forward_gen(a, f, lat0, lon0, k0, fe, fn_):
    """Oblique stereographic forward (EPSG 9809, GN7-2 conformal-
    sphere formulas) on the projection datum's geographic coords."""
    a, e, R, n, c, chi0, lam0 = _ostereo_consts(a, f, lat0, lon0)
    k2R = 2 * R * k0

    def fn(lon: float, lat: float) -> tuple[float, float]:
        phi, lam = math.radians(lat), math.radians(lon)
        s = math.sin(phi)
        Sa = (1 + s) / (1 - s)
        Sb = (1 - e * s) / (1 + e * s)
        w = c * (Sa * Sb**e) ** n
        chi = math.asin((w - 1) / (w + 1))
        dL = n * (lam - lam0)
        B = (
            1 + math.sin(chi) * math.sin(chi0)
            + math.cos(chi) * math.cos(chi0) * math.cos(dL)
        )
        E = fe + k2R * math.cos(chi) * math.sin(dL) / B
        N = fn_ + k2R * (
            math.sin(chi) * math.cos(chi0)
            - math.cos(chi) * math.sin(chi0) * math.cos(dL)
        ) / B
        return E, N

    return fn


def _ostereo_inverse_gen(a, f, lat0, lon0, k0, fe, fn_):
    """Oblique stereographic inverse (spherical inverse on the
    conformal sphere, then conformal->geodetic latitude fixed point)."""
    a, e, R, n, c, chi0, lam0 = _ostereo_consts(a, f, lat0, lon0)
    k2R = 2 * R * k0

    def fn(E: float, N: float) -> tuple[float, float]:
        dx, dy = E - fe, N - fn_
        rho = math.hypot(dx, dy)
        if rho == 0.0:
            chi, dL = chi0, 0.0
        else:
            ce = 2 * math.atan2(rho, k2R)
            sc, cc = math.sin(ce), math.cos(ce)
            chi = math.asin(cc * math.sin(chi0) + dy * sc * math.cos(chi0) / rho)
            dL = math.atan2(
                dx * sc, rho * math.cos(chi0) * cc - dy * math.sin(chi0) * sc
            )
        lam = lam0 + dL / n
        # invert w = c*(Sa*Sb^e)^n for phi: iterate s -> (U-1)/(U+1),
        # U = T*((1+e s)/(1-e s))^e, T = (((1+sin chi)/(1-sin chi))/c)^(1/n)
        T = (((1 + math.sin(chi)) / (1 - math.sin(chi))) / c) ** (1.0 / n)
        s = math.sin(chi)
        for _ in range(20):
            U = T * ((1 + e * s) / (1 - e * s)) ** e
            new = (U - 1) / (U + 1)
            if abs(new - s) < 1e-15:
                s = new
                break
            s = new
        return math.degrees(lam), math.degrees(math.asin(s))

    return fn


def _ostereo_fwd_bessel(lon: float, lat: float) -> tuple[float, float]:
    """RD New forward from BESSEL geographic coords (GN7-2 9809)."""
    return _ostereo_forward_gen(
        _BESSEL_A, _BESSEL_F, _RD_LAT0, _RD_LON0, _RD_K0, _RD_FE, _RD_FN
    )(lon, lat)


def _ostereo_inv_bessel(E: float, N: float) -> tuple[float, float]:
    """RD New inverse to BESSEL geographic coords."""
    return _ostereo_inverse_gen(
        _BESSEL_A, _BESSEL_F, _RD_LAT0, _RD_LON0, _RD_K0, _RD_FE, _RD_FN
    )(E, N)


def _rd_forward():
    def fn(x: float, y: float) -> tuple[float, float]:
        cart = _geodetic_to_cart(_WGS84_A, _WGS84_F, x, y)
        cart = _helmert(_HELMERT_AMERSFOORT_TO_WGS84, *cart, inverse=True)
        lon, lat = _cart_to_geodetic(_BESSEL_A, _BESSEL_F, *cart)
        return _ostereo_fwd_bessel(lon, lat)

    return fn


def _rd_inverse():
    def fn(x: float, y: float) -> tuple[float, float]:
        lon, lat = _ostereo_inv_bessel(x, y)
        cart = _geodetic_to_cart(_BESSEL_A, _BESSEL_F, lon, lat)
        cart = _helmert(_HELMERT_AMERSFOORT_TO_WGS84, *cart)
        return _cart_to_geodetic(_WGS84_A, _WGS84_F, *cart)

    return fn


# -- Krovak oblique conformal conic (EPSG method 9819; CRS 5513/5514
# S-JTSK, Czech + Slovak national grid). EPSG Guidance Note 7-2
# formulas: Gauss conformal sphere at the projection centre, sphere
# rotation to the cone-axis pole (co-latitude alpha_C along the origin
# meridian), then a conformal conic on the pseudo standard parallel.
# Verified against the GN7-2 worked example to the centimetre
# (50d12'32.442"N 16d50'59.179"E -> X 1050538.63 S, Y 568991.00 W).
# Datum: Bessel 1841 + the published S-JTSK->WGS84 geocentric
# translation (EPSG 1622: 589, 76, 480 — the grid-free fallback,
# ~1 m, same convention as RD New above).

#: S-JTSK -> WGS84 (EPSG:1622 geocentric translation; m)
_HELMERT_SJTSK_TO_WGS84 = (589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0)

#: Krovak projection constants (EPSG 5513/5514 on Bessel 1841).
#: lon_0 is GREENWICH-referenced (the defining 42d30' East of Ferro).
_KROVAK_LAT_C = 49.5
_KROVAK_LON_0 = 24.0 + 50.0 / 60.0
_KROVAK_ALPHA = 30.0 + 17.0 / 60.0 + 17.3031 / 3600.0
_KROVAK_LAT_P = 78.5
_KROVAK_K_P = 0.9999


def _krovak_consts(a, f, lat_c, lon0, alpha_c, lat_p, k_p):
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi_c = math.radians(lat_c)
    a_c = math.radians(alpha_c)
    phi_p = math.radians(lat_p)
    s_c = math.sin(phi_c)
    A = a * math.sqrt(1 - e2) / (1 - e2 * s_c * s_c)
    B = math.sqrt(1 + e2 * math.cos(phi_c) ** 4 / (1 - e2))
    g0 = math.asin(s_c / B)
    t0 = (
        math.tan(math.pi / 4 + g0 / 2)
        * ((1 + e * s_c) / (1 - e * s_c)) ** (e * B / 2)
        / math.tan(math.pi / 4 + phi_c / 2) ** B
    )
    n = math.sin(phi_p)
    r0 = k_p * A / math.tan(phi_p)
    return e, B, t0, n, r0, a_c, phi_p, math.radians(lon0)


def _krovak_forward_gen(a, f, lat_c, lon0, alpha_c, lat_p, k_p,
                        x0=0.0, y0=0.0, east_north=True):
    """Krovak forward (EPSG 9819). east_north=True emits the EPSG
    5514 convention (easting = -westing, northing = -southing, both
    negative over the region); False emits raw 5513 southing/westing."""
    e, B, t0, n, r0, a_c, phi_p, lam0 = _krovak_consts(
        a, f, lat_c, lon0, alpha_c, lat_p, k_p
    )
    tan_p = math.tan(math.pi / 4 + phi_p / 2) ** n

    def fn(lon: float, lat: float) -> tuple[float, float]:
        phi, lam = math.radians(lat), math.radians(lon)
        s = math.sin(phi)
        U = 2 * (
            math.atan(
                t0
                * math.tan(phi / 2 + math.pi / 4) ** B
                / ((1 + e * s) / (1 - e * s)) ** (e * B / 2)
            )
            - math.pi / 4
        )
        V = B * (lam0 - lam)
        T = math.asin(
            math.cos(a_c) * math.sin(U)
            + math.sin(a_c) * math.cos(U) * math.cos(V)
        )
        D = math.asin(math.cos(U) * math.sin(V) / math.cos(T))
        theta = n * D
        r = r0 * tan_p / math.tan(T / 2 + math.pi / 4) ** n
        southing = r * math.cos(theta) + x0
        westing = r * math.sin(theta) + y0
        if east_north:
            return -westing, -southing
        return southing, westing

    return fn


def _krovak_inverse_gen(a, f, lat_c, lon0, alpha_c, lat_p, k_p,
                        x0=0.0, y0=0.0, east_north=True):
    """Krovak inverse (EPSG 9819): conic -> rotated sphere -> Gauss
    sphere -> geodetic latitude fixed point (converges in ~4)."""
    e, B, t0, n, r0, a_c, phi_p, lam0 = _krovak_consts(
        a, f, lat_c, lon0, alpha_c, lat_p, k_p
    )
    tan_p = math.tan(math.pi / 4 + phi_p / 2)

    def fn(x: float, y: float) -> tuple[float, float]:
        if east_north:
            southing, westing = -y - x0, -x - y0
        else:
            southing, westing = x - x0, y - y0
        r = math.hypot(southing, westing)
        theta = math.atan2(westing, southing)
        D = theta / n
        T = 2 * (
            math.atan((r0 / r) ** (1.0 / n) * tan_p) - math.pi / 4
        )
        U = math.asin(
            math.cos(a_c) * math.sin(T)
            - math.sin(a_c) * math.cos(T) * math.cos(D)
        )
        V = math.asin(math.cos(T) * math.sin(D) / math.cos(U))
        lam = lam0 - V / B
        base = t0 ** (-1.0 / B) * math.tan(U / 2 + math.pi / 4) ** (1.0 / B)
        phi = U
        for _ in range(20):
            s = math.sin(phi)
            new = 2 * (
                math.atan(base * ((1 + e * s) / (1 - e * s)) ** (e / 2))
                - math.pi / 4
            )
            if abs(new - phi) < 1e-14:
                phi = new
                break
            phi = new
        return math.degrees(lam), math.degrees(phi)

    return fn


def _krovak_fwd_bessel(lon: float, lat: float) -> tuple[float, float]:
    """EPSG 5514 forward from BESSEL geographic coords (GN7-2 9819)."""
    return _krovak_forward_gen(
        _BESSEL_A, _BESSEL_F, _KROVAK_LAT_C, _KROVAK_LON_0,
        _KROVAK_ALPHA, _KROVAK_LAT_P, _KROVAK_K_P,
    )(lon, lat)


def _krovak_inv_bessel(x: float, y: float) -> tuple[float, float]:
    """EPSG 5514 inverse to BESSEL geographic coords."""
    return _krovak_inverse_gen(
        _BESSEL_A, _BESSEL_F, _KROVAK_LAT_C, _KROVAK_LON_0,
        _KROVAK_ALPHA, _KROVAK_LAT_P, _KROVAK_K_P,
    )(x, y)


def _krovak_5514_forward():
    def fn(x: float, y: float) -> tuple[float, float]:
        cart = _geodetic_to_cart(_WGS84_A, _WGS84_F, x, y)
        cart = _helmert(_HELMERT_SJTSK_TO_WGS84, *cart, inverse=True)
        lon, lat = _cart_to_geodetic(_BESSEL_A, _BESSEL_F, *cart)
        return _krovak_fwd_bessel(lon, lat)

    return fn


def _krovak_5514_inverse():
    def fn(x: float, y: float) -> tuple[float, float]:
        lon, lat = _krovak_inv_bessel(x, y)
        cart = _geodetic_to_cart(_BESSEL_A, _BESSEL_F, lon, lat)
        cart = _helmert(_HELMERT_SJTSK_TO_WGS84, *cart)
        return _cart_to_geodetic(_WGS84_A, _WGS84_F, *cart)

    return fn


# -- Swiss Oblique Mercator (somerc; EPSG 21781 CH1903/LV03, 2056
# CH1903+/LV95) and the general Hotine Oblique Mercator (omerc, EPSG
# methods 9812 variant A / 9815 variant B). somerc follows the
# published swisstopo formulas (Gauss conformal sphere at Bern, sphere
# rotation to the pseudo-equator, Mercator); omerc follows EPSG GN7-2.
# Mutual validation: with the Swiss parameters (alpha_c = gamma_c =
# 90 deg) the two INDEPENDENT formula sets agree to sub-millimetre
# across the Swiss extent, and omerc variant B reproduces GN7-2's
# Timbalai 1948 / RSO Borneo worked example to the centimetre
# (5d23'14.1129"N 115d48'19.8196"E -> E 679245.73, N 596562.78).

#: CH1903 -> WGS84 (EPSG:1766-family geocentric translation; m)
_HELMERT_CH1903_TO_WGS84 = (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)

#: Swiss projection constants (Bern origin on Bessel 1841)
_CH_LAT0 = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0
_CH_LON0 = 7.0 + 26.0 / 60.0 + 22.50 / 3600.0


def _somerc_consts(a, f, lat0, lon0):
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phi0 = math.radians(lat0)
    s0 = math.sin(phi0)
    alpha = math.sqrt(1 + e2 * math.cos(phi0) ** 4 / (1 - e2))
    R = a * math.sqrt(1 - e2) / (1 - e2 * s0 * s0)
    b0 = math.asin(s0 / alpha)
    K = (
        math.log(math.tan(math.pi / 4 + b0 / 2))
        - alpha * math.log(math.tan(math.pi / 4 + phi0 / 2))
        + alpha * e / 2 * math.log((1 + e * s0) / (1 - e * s0))
    )
    return e, alpha, R, b0, K, math.radians(lon0)


def _somerc_forward_gen(a, f, lat0, lon0, x0, y0):
    """Swiss oblique Mercator forward (swisstopo rigorous formulas)."""
    e, alpha, R, b0, K, lam0 = _somerc_consts(a, f, lat0, lon0)

    def fn(lon: float, lat: float) -> tuple[float, float]:
        phi, lam = math.radians(lat), math.radians(lon)
        s = math.sin(phi)
        S = (
            alpha * math.log(math.tan(math.pi / 4 + phi / 2))
            - alpha * e / 2 * math.log((1 + e * s) / (1 - e * s))
            + K
        )
        b = 2 * (math.atan(math.exp(S)) - math.pi / 4)
        l = alpha * (lam - lam0)
        bbar = math.asin(
            math.cos(b0) * math.sin(b)
            - math.sin(b0) * math.cos(b) * math.cos(l)
        )
        lbar = math.atan2(
            math.cos(b) * math.sin(l),
            math.sin(b0) * math.sin(b)
            + math.cos(b0) * math.cos(b) * math.cos(l),
        )
        return (
            x0 + R * lbar,
            y0 + R * math.log(math.tan(math.pi / 4 + bbar / 2)),
        )

    return fn


def _somerc_inverse_gen(a, f, lat0, lon0, x0, y0):
    """Swiss oblique Mercator inverse (sphere unrotation + Gauss
    conformal -> geodetic fixed point, converges in ~4)."""
    e, alpha, R, b0, K, lam0 = _somerc_consts(a, f, lat0, lon0)

    def fn(x: float, y: float) -> tuple[float, float]:
        lbar = (x - x0) / R
        bbar = 2 * (math.atan(math.exp((y - y0) / R)) - math.pi / 4)
        b = math.asin(
            math.cos(b0) * math.sin(bbar)
            + math.sin(b0) * math.cos(bbar) * math.cos(lbar)
        )
        l = math.atan2(
            math.sin(lbar) * math.cos(bbar),
            math.cos(b0) * math.cos(bbar) * math.cos(lbar)
            - math.sin(b0) * math.sin(bbar),
        )
        lam = lam0 + l / alpha
        phi = b
        for _ in range(20):
            s = math.sin(phi)
            S = (
                math.log(math.tan(math.pi / 4 + b / 2))
                - K
                + alpha * e / 2 * math.log((1 + e * s) / (1 - e * s))
            ) / alpha
            new = 2 * (math.atan(math.exp(S)) - math.pi / 4)
            if abs(new - phi) < 1e-15:
                phi = new
                break
            phi = new
        return math.degrees(lam), math.degrees(phi)

    return fn


def _ch_forward(x0=600000.0, y0=200000.0):
    fwd = _somerc_forward_gen(_BESSEL_A, _BESSEL_F, _CH_LAT0, _CH_LON0, x0, y0)

    def fn(x: float, y: float) -> tuple[float, float]:
        cart = _geodetic_to_cart(_WGS84_A, _WGS84_F, x, y)
        cart = _helmert(_HELMERT_CH1903_TO_WGS84, *cart, inverse=True)
        lon, lat = _cart_to_geodetic(_BESSEL_A, _BESSEL_F, *cart)
        return fwd(lon, lat)

    return fn


def _ch_inverse(x0=600000.0, y0=200000.0):
    inv = _somerc_inverse_gen(_BESSEL_A, _BESSEL_F, _CH_LAT0, _CH_LON0, x0, y0)

    def fn(x: float, y: float) -> tuple[float, float]:
        lon, lat = inv(x, y)
        cart = _geodetic_to_cart(_BESSEL_A, _BESSEL_F, lon, lat)
        cart = _helmert(_HELMERT_CH1903_TO_WGS84, *cart)
        return _cart_to_geodetic(_WGS84_A, _WGS84_F, *cart)

    return fn


def _omerc_consts(a, f, lat_c, lon_c, alpha_c, gamma_c, k0):
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phic = math.radians(lat_c)
    lamc = math.radians(lon_c)
    ac = math.radians(alpha_c)
    gc = math.radians(gamma_c)
    sc = math.sin(phic)
    B = math.sqrt(1 + e2 * math.cos(phic) ** 4 / (1 - e2))
    A = a * B * k0 * math.sqrt(1 - e2) / (1 - e2 * sc * sc)
    t0 = (
        math.tan(math.pi / 4 - phic / 2)
        / ((1 - e * sc) / (1 + e * sc)) ** (e / 2)
    )
    D = B * math.sqrt(1 - e2) / (math.cos(phic) * math.sqrt(1 - e2 * sc * sc))
    D2 = max(D * D, 1.0)
    sign = 1.0 if phic >= 0 else -1.0
    F = D + math.sqrt(D2 - 1) * sign
    H = F * t0**B
    G = (F - 1 / F) / 2
    gamma0 = math.asin(math.sin(ac) / D)
    lam0 = lamc - math.asin(G * math.tan(gamma0)) / B
    if abs(ac - math.pi / 2) < 1e-12:
        uc = A * (lamc - lam0)
    else:
        uc = (A / B) * math.atan2(math.sqrt(D2 - 1), math.cos(ac)) * sign
    return e, B, A, H, gamma0, lam0, gc, uc, sign


def _omerc_forward_gen(a, f, lat_c, lon_c, alpha_c, gamma_c, k0,
                       x0=0.0, y0=0.0, variant_b=True):
    """Hotine oblique Mercator forward (EPSG 9812 variant A when
    variant_b=False, 9815 variant B otherwise; GN7-2 formulas)."""
    e, B, A, H, gamma0, lam0, gc, uc, sign = _omerc_consts(
        a, f, lat_c, lon_c, alpha_c, gamma_c, k0
    )
    u_off = abs(uc) * sign if variant_b else 0.0

    def fn(lon: float, lat: float) -> tuple[float, float]:
        phi, lam = math.radians(lat), math.radians(lon)
        s = math.sin(phi)
        t = (
            math.tan(math.pi / 4 - phi / 2)
            / ((1 - e * s) / (1 + e * s)) ** (e / 2)
        )
        Q = H / t**B
        S = (Q - 1 / Q) / 2
        T = (Q + 1 / Q) / 2
        dL = B * (lam - lam0)
        V = math.sin(dL)
        U = (-V * math.cos(gamma0) + S * math.sin(gamma0)) / T
        v = A * math.log((1 - U) / (1 + U)) / (2 * B)
        u = (
            A
            * math.atan2(
                S * math.cos(gamma0) + V * math.sin(gamma0), math.cos(dL)
            )
            / B
            - u_off
        )
        return (
            x0 + v * math.cos(gc) + u * math.sin(gc),
            y0 + u * math.cos(gc) - v * math.sin(gc),
        )

    return fn


def _omerc_inverse_gen(a, f, lat_c, lon_c, alpha_c, gamma_c, k0,
                       x0=0.0, y0=0.0, variant_b=True):
    """Hotine oblique Mercator inverse (GN7-2; conformal-latitude
    fixed point for phi)."""
    e, B, A, H, gamma0, lam0, gc, uc, sign = _omerc_consts(
        a, f, lat_c, lon_c, alpha_c, gamma_c, k0
    )
    u_off = abs(uc) * sign if variant_b else 0.0

    def fn(x: float, y: float) -> tuple[float, float]:
        dx, dy = x - x0, y - y0
        v = dx * math.cos(gc) - dy * math.sin(gc)
        u = dy * math.cos(gc) + dx * math.sin(gc) + u_off
        Qp = math.exp(-B * v / A)
        Sp = (Qp - 1 / Qp) / 2
        Tp = (Qp + 1 / Qp) / 2
        Vp = math.sin(B * u / A)
        Up = (Vp * math.cos(gamma0) + Sp * math.sin(gamma0)) / Tp
        t = (H / math.sqrt((1 + Up) / (1 - Up))) ** (1.0 / B)
        phi = math.pi / 2 - 2 * math.atan(t)
        for _ in range(20):
            s = math.sin(phi)
            new = math.pi / 2 - 2 * math.atan(
                t * ((1 - e * s) / (1 + e * s)) ** (e / 2)
            )
            if abs(new - phi) < 1e-15:
                phi = new
                break
            phi = new
        lam = lam0 - math.atan2(
            Sp * math.cos(gamma0) - Vp * math.sin(gamma0),
            math.cos(B * u / A),
        ) / B
        return math.degrees(lam), math.degrees(phi)

    return fn


# -- proj-string front-end: any CRS whose projection METHOD is one of
# the kernels above (tmerc/utm, lcc, aea, polar stere, sterea oblique
# stereographic, webmerc, longlat) works by passing its parameters as
# a proj4-style string — the long tail of EPSG codes without embedding
# each one. +towgs84 (3 or 7 params, position vector) supplies the
# datum shift; +ellps/+a/+rf the ellipsoid; +units/+to_meter the grid
# unit. This is the honest scope of "arbitrary CRS" without PROJ:
# datum GRIDS (OSTN15, NTv2) remain out and documented.

_ELLPS = {
    "WGS84": (6378137.0, 1 / 298.257223563),
    "GRS80": (6378137.0, 1 / 298.257222101),
    "bessel": (6377397.155, 1 / 299.1528128),
    "airy": (6377563.396, 1 / 299.3249646),
    "intl": (6378388.0, 1 / 297.0),
    "clrk66": (6378206.4, 1 / 294.978698214),
    "clrk80ign": (6378249.2, 1 / 293.466021294),
    "krass": (6378245.0, 1 / 298.3),
    "sphere": (6370997.0, 0.0),
}

_UNITS = {"m": 1.0, "us-ft": 1200.0 / 3937.0, "ft": 0.3048}


def _parse_projdef(def_str: str) -> dict:
    d: dict = {}
    for tok in def_str.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        k, _, v = tok.partition("=")
        d[k] = v if v != "" else True
    return d


def _projdef_ellipsoid(d: dict) -> tuple[float, float]:
    if "ellps" in d:
        try:
            return _ELLPS[d["ellps"]]
        except KeyError:
            raise NotImplementedError(
                f"+ellps={d['ellps']} not in the embedded set "
                f"{sorted(_ELLPS)}; pass +a=/+rf= explicitly"
            )
    if "a" in d:
        a = float(d["a"])
        if "rf" in d:
            return a, 1.0 / float(d["rf"])
        if "b" in d:
            return a, (a - float(d["b"])) / a
        return a, 0.0
    return _ELLPS["WGS84"]


#: named prime meridians (PROJ's table), degrees east of Greenwich
_PRIME_MERIDIANS = {
    "greenwich": 0.0,
    "ferro": -(17.0 + 40.0 / 60.0),
    "paris": 2.0 + 20.0 / 60.0 + 14.025 / 3600.0,
    "lisbon": -(9.0 + 7.0 / 60.0 + 54.862 / 3600.0),
    "rome": 12.0 + 27.0 / 60.0 + 8.4 / 3600.0,
    "oslo": 10.0 + 43.0 / 60.0 + 22.5 / 3600.0,
}


def _projdef_fns(d: dict):
    """(forward, inverse) between the def's own geographic coords and
    its projected grid, from a parsed proj dict. ``+pm`` (named or
    numeric, degrees east of Greenwich) shifts the longitude origin:
    historical defs like S-JTSK's '+pm=ferro +lon_0=42.5' carry
    lon_0 relative to that meridian, while the input/output
    geographic coordinates stay Greenwich-referenced (the PROJ
    convention)."""
    proj = d.get("proj")
    a, f = _projdef_ellipsoid(d)
    lat0 = float(d.get("lat_0", 0.0))
    pm = d.get("pm", "greenwich")
    try:
        pm_off = _PRIME_MERIDIANS[pm] if isinstance(pm, str) and not \
            pm.lstrip("+-").replace(".", "", 1).isdigit() else float(pm)
    except KeyError:
        raise NotImplementedError(
            f"+pm={pm}: named meridians are {sorted(_PRIME_MERIDIANS)}"
        )
    lon0 = float(d.get("lon_0", 0.0)) + pm_off
    k0 = float(d.get("k", d.get("k_0", 1.0)))
    x0, y0 = float(d.get("x_0", 0.0)), float(d.get("y_0", 0.0))
    if proj in ("longlat", "latlong"):
        if pm_off:
            # A geographic def with a non-Greenwich prime meridian
            # stores longitudes relative to that meridian; the
            # Greenwich-referenced side subtracts/adds the offset
            # (PROJ shifts geographic output by the pm offset).
            return (
                lambda x, y: (x - pm_off, y),
                lambda x, y: (x + pm_off, y),
            )
        ident = lambda x, y: (x, y)  # noqa: E731
        return ident, ident
    if proj == "utm":
        zone = int(d["zone"])
        lon0 = zone * 6 - 183
        y0 = 10000000.0 if "south" in d else 0.0
        return (
            _tm_forward_gen(a, f, 0.0, lon0, 0.9996, 500000.0, y0),
            _tm_inverse_gen(a, f, 0.0, lon0, 0.9996, 500000.0, y0),
        )
    if proj == "tmerc":
        return (
            _tm_forward_gen(a, f, lat0, lon0, k0, x0, y0),
            _tm_inverse_gen(a, f, lat0, lon0, k0, x0, y0),
        )
    if proj == "lcc":
        sp1 = float(d.get("lat_1", lat0))
        sp2 = float(d.get("lat_2", sp1))
        unit = _UNITS[d["units"]] if "units" in d else float(d.get("to_meter", 1.0))
        p = (a, f, lat0, lon0, sp1, sp2, x0, y0, unit)
        return _lcc_forward(p), _lcc_inverse(p)
    if proj == "aea":
        sp1 = float(d.get("lat_1", lat0))
        sp2 = float(d.get("lat_2", sp1))
        unit = _UNITS[d["units"]] if "units" in d else float(d.get("to_meter", 1.0))
        p = (a, f, lat0, lon0, sp1, sp2, x0, y0, unit)
        return _aea_forward(p), _aea_inverse(p)
    if proj == "laea":
        return _laea_fns(a, f, lat0, lon0, x0, y0)
    if proj == "stere":
        if abs(lat0) != 90.0:
            raise NotImplementedError(
                "stere: only the polar aspect (lat_0=±90) is embedded "
                "(EPSG 9810); oblique needs +proj=sterea (EPSG 9809)"
            )
        north = lat0 > 0
        lat_ts = float(d["lat_ts"]) if "lat_ts" in d else None
        p = (a, f, north, None if lat_ts is not None else k0, lat_ts, lon0, x0, y0)
        return _ps_forward(p), _ps_inverse(p)
    if proj == "sterea":
        return (
            _ostereo_forward_gen(a, f, lat0, lon0, k0, x0, y0),
            _ostereo_inverse_gen(a, f, lat0, lon0, k0, x0, y0),
        )
    if proj == "somerc":
        # Swiss oblique Mercator (PROJ somerc). PROJ's documented
        # default origin is 0/0; the Bern-origin fallback here is a
        # DELIBERATE divergence kept for legacy Swiss defs that omit
        # the origin entirely — so it is keyed on BOTH params being
        # absent together. A mixed def (only one of lat_0/lon_0
        # present) takes the explicit value plus PROJ's 0 default for
        # the other — never a hybrid explicit/Bern origin. x_0/y_0
        # carry LV03 vs LV95.
        if "lat_0" in d or "lon_0" in d:
            s_lat0 = float(d.get("lat_0", 0.0))
            s_lon0 = float(d.get("lon_0", 0.0)) + pm_off
        else:
            s_lat0, s_lon0 = _CH_LAT0, _CH_LON0
        return (
            _somerc_forward_gen(a, f, s_lat0, s_lon0, x0, y0),
            _somerc_inverse_gen(a, f, s_lat0, s_lon0, x0, y0),
        )
    if proj == "omerc":
        # Hotine oblique Mercator (PROJ omerc): +lonc (centre
        # longitude), +alpha (azimuth of initial line), +gamma
        # (rectified grid angle, defaults to alpha), +no_uoff selects
        # variant A (EPSG 9812) — default is variant B (9815), same
        # as PROJ.
        lonc = float(d.get("lonc", d.get("lon_0", 0.0))) + pm_off
        alpha_c = float(d["alpha"])
        gamma_c = float(d.get("gamma", d["alpha"]))
        variant_b = "no_uoff" not in d and "no_off" not in d
        return (
            _omerc_forward_gen(a, f, lat0, lonc, alpha_c, gamma_c, k0,
                               x0, y0, variant_b),
            _omerc_inverse_gen(a, f, lat0, lonc, alpha_c, gamma_c, k0,
                               x0, y0, variant_b),
        )
    if proj == "krovak":
        # PROJ parameter conventions: lat_0 (projection centre,
        # default 49.5), lon_0 (GREENWICH-referenced longitude of
        # origin, default 24d50' = the defining 42d30' East of
        # Ferro), alpha (cone-axis co-latitude), k (pseudo-parallel
        # scale). Default output is the EPSG 5514 east-north
        # convention (negative values); +czech emits raw 5513
        # southing/westing like PROJ's flag of the same name.
        lat_c = float(d.get("lat_0", _KROVAK_LAT_C))
        lon_o = (
            float(d["lon_0"]) + pm_off if "lon_0" in d else _KROVAK_LON_0
        )
        alpha = float(d.get("alpha", _KROVAK_ALPHA))
        k_p = float(d.get("k", d.get("k_0", _KROVAK_K_P)))
        en = "czech" not in d
        return (
            _krovak_forward_gen(a, f, lat_c, lon_o, alpha,
                                _KROVAK_LAT_P, k_p, x0, y0, en),
            _krovak_inverse_gen(a, f, lat_c, lon_o, alpha,
                                _KROVAK_LAT_P, k_p, x0, y0, en),
        )
    if proj == "webmerc":
        # Popular Visualisation Pseudo-Mercator (EPSG 1024): spherical
        # formulas on the ellipsoid's semi-major axis BY SPEC — the
        # only Mercator that is legitimately spherical on an ellipsoid.
        R = a
        lam0 = math.radians(lon0)

        def m_fwd(x: float, y: float) -> tuple[float, float]:
            return (
                x0 + R * (math.radians(x) - lam0),
                y0 + R * math.log(math.tan(math.pi / 4 + math.radians(y) / 2)),
            )

        def m_inv(x: float, y: float) -> tuple[float, float]:
            return (
                math.degrees((x - x0) / R + lam0),
                math.degrees(2 * math.atan(math.exp((y - y0) / R)) - math.pi / 2),
            )

        return m_fwd, m_inv
    if proj == "merc":
        # Mercator variant A (EPSG 9804, +k) / variant B (EPSG 9805,
        # +lat_ts), ELLIPSOIDAL — PROJ treats +proj=merc on a nonzero-
        # flattening ellipsoid (e.g. EPSG 3395) with the isometric-
        # latitude formulas; the spherical shortcut is wrong by up to
        # ~0.2° latitude-equivalent (~20 km) at mid latitudes.
        e = math.sqrt(f * (2.0 - f))
        if "lat_ts" in d:
            phi1 = math.radians(float(d["lat_ts"]))
            k = math.cos(phi1) / math.sqrt(
                1.0 - (e * math.sin(phi1)) ** 2
            )
        else:
            k = k0
        ak = a * k
        lam0 = math.radians(lon0)

        def m_fwd(x: float, y: float) -> tuple[float, float]:
            phi = math.radians(y)
            esin = e * math.sin(phi)
            iso = math.tan(math.pi / 4 + phi / 2) * (
                (1.0 - esin) / (1.0 + esin)
            ) ** (e / 2)
            return (
                x0 + ak * (math.radians(x) - lam0),
                y0 + ak * math.log(iso),
            )

        def m_inv(x: float, y: float) -> tuple[float, float]:
            t = math.exp((y0 - y) / ak)
            phi = math.pi / 2 - 2 * math.atan(t)
            for _ in range(8):  # GN7-2 fixed point; converges in ~4
                esin = e * math.sin(phi)
                phi = math.pi / 2 - 2 * math.atan(
                    t * ((1.0 - esin) / (1.0 + esin)) ** (e / 2)
                )
            return (
                math.degrees((x - x0) / ak + lam0),
                math.degrees(phi),
            )

        return m_fwd, m_inv
    raise NotImplementedError(
        f"+proj={proj}: embedded methods are longlat, utm, tmerc, lcc, "
        "aea, laea, stere (polar), sterea, krovak, somerc, omerc, "
        "merc/webmerc (the reference delegates the rest to PROJ)"
    )


# -- NTv2 datum grid shifts (+nadgrids). The FORMAT is public (the
# Canadian NTv2 specification, used by OSTN15's NTv2 distribution,
# AGD66/AGD84, NAD27, DHDN etc.); the grid FILES themselves are
# distributed by the national agencies and are not bundled — point
# +nadgrids= at a local .gsb and the datum leg uses it. Shifts are in
# arcseconds with NTv2's positive-WEST longitude convention; the
# forward direction is source-datum -> target (the file's own
# direction, conventionally toward the WGS84-compatible frame); the
# inverse iterates the forward interpolation (PROJ's convergence
# scheme, <1e-12 deg in 2-4 rounds).

import functools as _functools
import struct as _struct


@_functools.lru_cache(maxsize=8)
def _read_ntv2(path: str):
    """Parse an NTv2 .gsb file into subgrid tuples:
    (s_lat, n_lat, e_lonw, w_lonw, lat_inc, lon_inc, ncols, nrows,
    lat_shifts, lon_shifts) — all seconds, longitudes positive west,
    node rows south->north, columns east->west (the NTv2 layout)."""
    raw = open(path, "rb").read()

    # endianness: NUM_OREC's int32 is 11 in every conformant file
    for fmt in ("<", ">"):
        if _struct.unpack(fmt + "i", raw[8:12])[0] == 11:
            en = fmt
            break
    else:
        raise ValueError(f"{path}: not an NTv2 file (bad NUM_OREC)")

    def rec_name(off):
        return raw[off:off + 8].decode("ascii", "replace").strip()

    def rec_int(off):
        return _struct.unpack(en + "i", raw[off + 8:off + 12])[0]

    def rec_double(off):
        return _struct.unpack(en + "d", raw[off + 8:off + 16])[0]

    n_orec = rec_int(0)
    n_srec = rec_int(16)
    n_files = rec_int(32)
    gs_type = rec_name(3 * 16) and raw[3 * 16 + 8:3 * 16 + 16].decode(
        "ascii", "replace").strip()
    if gs_type and gs_type != "SECONDS":
        raise NotImplementedError(f"NTv2 GS_TYPE {gs_type!r} (only SECONDS)")
    off = n_orec * 16
    subs = []
    for _ in range(n_files):
        hdr = {}
        for r in range(n_srec):
            nm = rec_name(off + r * 16)
            hdr[nm] = (off + r * 16)
        s_lat = rec_double(hdr["S_LAT"])
        n_lat = rec_double(hdr["N_LAT"])
        e_lon = rec_double(hdr["E_LONG"])
        w_lon = rec_double(hdr["W_LONG"])
        lat_inc = rec_double(hdr["LAT_INC"])
        lon_inc = rec_double(hdr["LONG_INC"])
        count = rec_int(hdr["GS_COUNT"])
        off += n_srec * 16
        ncols = int(round((w_lon - e_lon) / lon_inc)) + 1
        nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
        if ncols * nrows != count:
            raise ValueError(
                f"{path}: GS_COUNT {count} != {nrows}x{ncols} grid"
            )
        lat_sh = [0.0] * count
        lon_sh = [0.0] * count
        for i in range(count):
            ls, lo = _struct.unpack(en + "ff", raw[off:off + 8])
            lat_sh[i] = ls
            lon_sh[i] = lo
            off += 16  # 4 float32 fields per node (2 shifts + 2 accuracies)
        subs.append(
            (s_lat, n_lat, e_lon, w_lon, lat_inc, lon_inc,
             ncols, nrows, tuple(lat_sh), tuple(lon_sh))
        )
    # densest (smallest cell) grids FIRST so child grids win over parents
    subs.sort(key=lambda s: s[4] * s[5])
    return tuple(subs)


def _ntv2_shift(subs, lon: float, lat: float) -> tuple[float, float]:
    """Bilinear shift lookup at a Greenwich east-positive lon/lat
    (degrees); returns the shifted coordinates. Raises outside every
    subgrid — a silent null transform would corrupt data quietly."""
    lat_s = lat * 3600.0
    lonw_s = -lon * 3600.0  # NTv2 longitudes are positive WEST
    for s_lat, n_lat, e_lon, w_lon, lat_inc, lon_inc, ncols, nrows, \
            lat_sh, lon_sh in subs:
        if not (s_lat <= lat_s <= n_lat and e_lon <= lonw_s <= w_lon):
            continue
        fr = (lat_s - s_lat) / lat_inc
        fc = (lonw_s - e_lon) / lon_inc
        r0 = min(int(fr), nrows - 2) if nrows > 1 else 0
        c0 = min(int(fc), ncols - 2) if ncols > 1 else 0
        dr, dc = fr - r0, fc - c0
        i00 = r0 * ncols + c0
        i01 = i00 + (1 if ncols > 1 else 0)
        i10 = i00 + (ncols if nrows > 1 else 0)
        i11 = i10 + (1 if ncols > 1 else 0)
        w00 = (1 - dr) * (1 - dc)
        w01 = (1 - dr) * dc
        w10 = dr * (1 - dc)
        w11 = dr * dc
        dlat = (w00 * lat_sh[i00] + w01 * lat_sh[i01]
                + w10 * lat_sh[i10] + w11 * lat_sh[i11])
        dlonw = (w00 * lon_sh[i00] + w01 * lon_sh[i01]
                 + w10 * lon_sh[i10] + w11 * lon_sh[i11])
        return lon - dlonw / 3600.0, lat + dlat / 3600.0
    raise ValueError(
        f"point ({lon}, {lat}) outside every NTv2 subgrid (refusing a "
        "silent null transform)"
    )


def _ntv2_unshift(subs, lon: float, lat: float) -> tuple[float, float]:
    """Inverse grid shift: fixed-point iteration of the forward
    interpolation (the shift field is smooth; converges in 2-4)."""
    glon, glat = lon, lat
    for _ in range(10):
        flon, flat = _ntv2_shift(subs, glon, glat)
        nlon, nlat = glon + (lon - flon), glat + (lat - flat)
        if abs(nlon - glon) < 1e-13 and abs(nlat - glat) < 1e-13:
            return nlon, nlat
        glon, glat = nlon, nlat
    return glon, glat


def _projdef_transform(def_str: str):
    """(to_wgs84, from_wgs84) callables for a proj4-style definition.

    The datum leg uses +nadgrids=<path.gsb> (NTv2 grid shift, wins
    over towgs84 — the PROJ precedence) or +towgs84 (position-vector
    Helmert, 3 or 7 params, local->WGS84 as published); absent both,
    the def's datum is treated as WGS84-coincident (the PROJ
    null-transform convention without grids)."""
    d = _parse_projdef(def_str)
    a, f = _projdef_ellipsoid(d)
    fwd, inv = _projdef_fns(d)
    tw = d.get("towgs84")
    helm = None
    if tw and tw is not True:
        vals = [float(v) for v in str(tw).split(",")]
        if len(vals) == 3:
            vals += [0.0, 0.0, 0.0, 0.0]
        helm = tuple(vals)
    ng = d.get("nadgrids")
    grids = None
    if ng and ng is not True and str(ng) != "@null":
        grids = _read_ntv2(str(ng).lstrip("@"))

    def to_wgs84(x: float, y: float) -> tuple[float, float]:
        lon, lat = inv(x, y)
        if grids is not None:
            return _ntv2_shift(grids, lon, lat)
        if helm is None:
            return lon, lat
        cart = _geodetic_to_cart(a, f, lon, lat)
        cart = _helmert(helm, *cart)
        return _cart_to_geodetic(_WGS84_A, _WGS84_F, *cart)

    def from_wgs84(lon: float, lat: float) -> tuple[float, float]:
        if grids is not None:
            lon, lat = _ntv2_unshift(grids, lon, lat)
        elif helm is not None:
            cart = _geodetic_to_cart(_WGS84_A, _WGS84_F, lon, lat)
            cart = _helmert(helm, *cart, inverse=True)
            lon, lat = _cart_to_geodetic(a, f, *cart)
        return fwd(lon, lat)

    return to_wgs84, from_wgs84


#: Generic Transverse Mercator grids on WGS84-coincident datums:
#: srid -> (a, f, lat0, lon0, k0, FE, FN). NZGD2000/GDA2020/ETRS89/
#: NAD83/GDA94 are WGS84-coincident at analytics accuracy (same
#: null-transform convention as the LCC set).
_TM_PARAMS = {
    # NZGD2000 / New Zealand Transverse Mercator 2000
    2193: (_GRS80_A, _GRS80_F, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0),
}
# ETRS89 / UTM zones 28-38N (EU datasets), NAD83 / UTM zones 1-23N,
# and GDA94/GDA2020 MGA zones 49-56S — the GRS80 UTM families. Same
# Krüger series as WGS84 UTM but on the GRS80 ellipsoid (the two
# differ only in flattening's 12th digit; kept exact anyway).
for _z in range(28, 39):
    _TM_PARAMS[25800 + _z] = (
        _GRS80_A, _GRS80_F, 0.0, float(_z * 6 - 183), 0.9996, 500000.0, 0.0,
    )
for _z in range(1, 24):
    _TM_PARAMS[26900 + _z] = (
        _GRS80_A, _GRS80_F, 0.0, float(_z * 6 - 183), 0.9996, 500000.0, 0.0,
    )
for _z in range(49, 57):
    # MGA94 (283xx) and MGA2020 (78xx): south zones, FN 10,000,000
    for _base in (28300, 7800):
        _TM_PARAMS[_base + _z] = (
            _GRS80_A, _GRS80_F, 0.0, float(_z * 6 - 183), 0.9996,
            500000.0, 10000000.0,
        )
del _z, _base


def _osgb_forward():
    tm = _tm_forward_gen(_AIRY_A, _AIRY_F, 49.0, -2.0, 0.9996012717,
                         400000.0, -100000.0)

    def fn(x: float, y: float) -> tuple[float, float]:
        c = _geodetic_to_cart(_WGS84_A, _WGS84_F, x, y)
        c = _helmert(_HELMERT_WGS84_TO_OSGB36, *c)
        lon, lat = _cart_to_geodetic(_AIRY_A, _AIRY_F, *c)
        return tm(lon, lat)

    return fn


def _osgb_inverse():
    tm = _tm_inverse_gen(_AIRY_A, _AIRY_F, 49.0, -2.0, 0.9996012717,
                         400000.0, -100000.0)

    def fn(x: float, y: float) -> tuple[float, float]:
        lon, lat = tm(x, y)
        c = _geodetic_to_cart(_AIRY_A, _AIRY_F, lon, lat)
        c = _helmert(_HELMERT_WGS84_TO_OSGB36, *c, inverse=True)
        return _cart_to_geodetic(_WGS84_A, _WGS84_F, *c)

    return fn


# -- Albers Equal Area 2SP (EPSG method 9822) — the other common
# conic national grid (CONUS Albers). EPSG Guidance Note 7-2 formulas;
# same GRS80/WGS84 datum convention as the LCC set.

#: srid -> (a, f, lat0, lon0, sp1, sp2, fe_m, fn_m, unit_m)
_AEA_PARAMS = {
    # NAD83 / Conus Albers
    5070: (_GRS80_A, _GRS80_F, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0, 1.0),
}

# -- Polar Stereographic (EPSG method 9810, variants A and B) — the
# arctic/antarctic earth-science grids. Formulas follow EPSG Guidance
# Note 7-2 §Polar Stereographic exactly; variant B (standard parallel)
# reduces to variant A through the effective scale factor
# k0 = mF * sqrt((1+e)^(1+e) (1-e)^(1-e)) / (2 tF). The reference gets
# these via DuckDB-spatial/PROJ (shippable_spatial_functions.c).
# (_WGS84_A/_WGS84_F are the module-level constants defined above.)

#: srid -> (a, f, north, k0 | None, lat_ts | None, lon0, FE, FN)
_PS_PARAMS = {
    # NSIDC Sea Ice Polar Stereographic North (variant B, lat_ts 70N)
    3413: (_WGS84_A, _WGS84_F, True, None, 70.0, -45.0, 0.0, 0.0),
    # Antarctic Polar Stereographic (variant B, lat_ts 71S)
    3031: (_WGS84_A, _WGS84_F, False, None, -71.0, 0.0, 0.0, 0.0),
    # Australian Antarctic Polar Stereographic (variant B — the EPSG
    # GN7-2 worked example for 9810-B)
    3032: (_WGS84_A, _WGS84_F, False, None, -71.0, 70.0, 6000000.0, 6000000.0),
    # Universal Polar Stereographic North / South (variant A, k0 .994 —
    # the GN7-2 worked example for 9810-A uses exactly the UPS-N params)
    5041: (_WGS84_A, _WGS84_F, True, 0.994, None, 0.0, 2000000.0, 2000000.0),
    5042: (_WGS84_A, _WGS84_F, False, 0.994, None, 0.0, 2000000.0, 2000000.0),
}


def _ps_consts(p):
    a, f, north, k0, lat_ts, lon0, fe, fn_ = p
    e = math.sqrt(f * (2 - f))

    def t_of(phi):
        # GN7-2: t = tan(pi/4 - phi/2) * ((1+e sin phi)/(1-e sin phi))^(e/2)
        # for the north aspect; the south aspect uses phi -> -phi
        if not north:
            phi = -phi
        s = math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) * (
            (1 + e * s) / (1 - e * s)
        ) ** (e / 2)

    big = math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
    if k0 is None:
        pf = math.radians(lat_ts)
        sf = math.sin(pf)
        mf = math.cos(pf) / math.sqrt(1 - e * e * sf * sf)
        k0 = mf * big / (2 * t_of(pf))
    return a, e, north, k0, math.radians(lon0), fe, fn_, big, t_of


def _ps_forward(p):
    a, e, north, k0, lam0, fe, fn_, big, t_of = _ps_consts(p)

    def fn(x: float, y: float) -> tuple[float, float]:
        phi, lam = math.radians(y), math.radians(x)
        rho = 2 * a * k0 * t_of(phi) / big
        dl = lam - lam0
        E = fe + rho * math.sin(dl)
        N = fn_ - rho * math.cos(dl) if north else fn_ + rho * math.cos(dl)
        return E, N

    return fn


def _ps_inverse(p):
    a, e, north, k0, lam0, fe, fn_, big, _t = _ps_consts(p)

    def fn(x: float, y: float) -> tuple[float, float]:
        dx, dy = x - fe, y - fn_
        rho = math.hypot(dx, dy)
        tp = rho * big / (2 * a * k0)
        # chi = conformal latitude of the (north-aspect) point
        phi = math.pi / 2 - 2 * math.atan(tp)
        for _ in range(15):
            s = math.sin(phi)
            new = math.pi / 2 - 2 * math.atan(
                tp * ((1 - e * s) / (1 + e * s)) ** (e / 2)
            )
            if abs(new - phi) < 1e-13:
                phi = new
                break
            phi = new
        if rho == 0.0:
            return math.degrees(lam0), 90.0 if north else -90.0
        if north:
            lam = lam0 + math.atan2(dx, -dy)
            return math.degrees(lam), math.degrees(phi)
        lam = lam0 + math.atan2(dx, dy)
        return math.degrees(lam), -math.degrees(phi)

    return fn


def _aea_consts(p):
    a, f, lat0, lon0, sp1, sp2, fe, fn_, unit = p
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def q_of(phi):
        s = math.sin(phi)
        return (1 - e2) * (
            s / (1 - e2 * s * s)
            - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
        )

    def m_of(phi):
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1 - e2 * s * s)

    p0, p1, p2 = math.radians(lat0), math.radians(sp1), math.radians(sp2)
    m1, m2 = m_of(p1), m_of(p2)
    q0, q1, q2 = q_of(p0), q_of(p1), q_of(p2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * math.sqrt(C - n * q0) / n
    return a, e, e2, math.radians(lon0), n, C, rho0, fe, fn_, unit, q_of


def _aea_forward(p):
    a, e, e2, lam0, n, C, rho0, fe, fn_, unit, q_of = _aea_consts(p)

    def fn(x: float, y: float) -> tuple[float, float]:
        phi, lam = math.radians(y), math.radians(x)
        rho = a * math.sqrt(max(C - n * q_of(phi), 0.0)) / n
        th = n * (lam - lam0)
        return (fe + rho * math.sin(th)) / unit, (fn_ + rho0 - rho * math.cos(th)) / unit

    return fn


def _aea_inverse(p):
    a, e, e2, lam0, n, C, rho0, fe, fn_, unit, _q = _aea_consts(p)

    def fn(x: float, y: float) -> tuple[float, float]:
        dx = x * unit - fe
        dy = rho0 - (y * unit - fn_)
        rho = math.hypot(dx, dy)
        qp = (C - rho * rho * n * n / (a * a)) / n
        th = math.atan2(dx, dy) if n > 0 else math.atan2(-dx, -dy)
        lam = lam0 + th / n
        # iterate latitude from q (EPSG 9822 inverse series)
        phi = math.asin(max(-1.0, min(1.0, qp / 2.0)))
        for _ in range(15):
            s = math.sin(phi)
            den = 1 - e2 * s * s
            corr = (den * den / (2 * math.cos(phi))) * (
                qp / (1 - e2)
                - s / den
                + (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
            )
            phi += corr
            if abs(corr) < 1e-13:
                break
        return math.degrees(lam), math.degrees(phi)

    return fn


# -- Lambert Azimuthal Equal Area (EPSG method 9820; CRS 3035
# ETRS89-LAEA Europe — the European statistical grid — and 9311/2163
# US National Atlas Equal Area on the authalic sphere). Formulas from
# EPSG Guidance Note 7-2; the spherical case is the e->0 limit
# (q(phi) -> 2 sin phi), which reduces the oblique equations to
# Snyder's spherical LAEA exactly, so one kernel serves both. The
# reference reaches LAEA via DuckDB-spatial/PROJ
# (pg_lake_engine shippable_spatial_functions.c st_transform).


def _laea_fns(a, f, lat0, lon0, x0, y0):
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    if e > 0:
        def q_of(phi):
            s = math.sin(phi)
            return (1 - e2) * (
                s / (1 - e2 * s * s)
                - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
            )
    else:
        def q_of(phi):
            return 2.0 * math.sin(phi)

    qp = q_of(math.pi / 2)
    phi0, lam0 = math.radians(lat0), math.radians(lon0)
    # beta -> phi inverse series (GN7-2); all terms vanish on a sphere
    c2 = e2 / 3 + 31 * e2 ** 2 / 180 + 517 * e2 ** 3 / 5040
    c4 = 23 * e2 ** 2 / 360 + 251 * e2 ** 3 / 3780
    c6 = 761 * e2 ** 3 / 45360

    def phi_of_beta(bp):
        return bp + c2 * math.sin(2 * bp) + c4 * math.sin(4 * bp) \
            + c6 * math.sin(6 * bp)

    def wrap_lon(deg):
        # lam0 + atan2 can leave [-180, 180] when lon_0 is large (the
        # arctic grids run lon_0 up to 180); |lam| <= 2*pi so one
        # correction suffices. In-range values pass through untouched.
        if deg > 180.0:
            return deg - 360.0
        if deg < -180.0:
            return deg + 360.0
        return deg

    if abs(lat0) == 90.0:
        north = lat0 > 0

        def fwd(x: float, y: float) -> tuple[float, float]:
            phi, dl = math.radians(y), math.radians(x) - lam0
            rho = a * math.sqrt(max(qp - q_of(phi) if north
                                    else qp + q_of(phi), 0.0))
            if north:
                return x0 + rho * math.sin(dl), y0 - rho * math.cos(dl)
            return x0 + rho * math.sin(dl), y0 + rho * math.cos(dl)

        def inv(x: float, y: float) -> tuple[float, float]:
            dx, dy = x - x0, y - y0
            rho = math.hypot(dx, dy)
            q = qp - rho * rho / (a * a)
            if not north:
                q = -q
            bp = math.asin(max(-1.0, min(1.0, q / qp)))
            lam = lam0 + (math.atan2(dx, -dy) if north
                          else math.atan2(dx, dy))
            return wrap_lon(math.degrees(lam)), math.degrees(phi_of_beta(bp))

        return fwd, inv

    beta0 = math.asin(max(-1.0, min(1.0, q_of(phi0) / qp)))
    rq = a * math.sqrt(qp / 2.0)
    s0 = math.sin(phi0)
    d_const = a * math.cos(phi0) / (
        math.sqrt(1 - e2 * s0 * s0) * rq * math.cos(beta0)
    )
    sb0, cb0 = math.sin(beta0), math.cos(beta0)

    def fwd(x: float, y: float) -> tuple[float, float]:
        phi, dl = math.radians(y), math.radians(x) - lam0
        beta = math.asin(max(-1.0, min(1.0, q_of(phi) / qp)))
        sb, cb = math.sin(beta), math.cos(beta)
        denom = 1.0 + sb0 * sb + cb0 * cb * math.cos(dl)
        b = rq * math.sqrt(2.0 / max(denom, 1e-300))  # antipode guard
        return (
            x0 + b * d_const * cb * math.sin(dl),
            y0 + (b / d_const) * (cb0 * sb - sb0 * cb * math.cos(dl)),
        )

    def inv(x: float, y: float) -> tuple[float, float]:
        dx, dy = (x - x0) / d_const, d_const * (y - y0)
        rho = math.hypot(dx, dy)
        if rho == 0.0:
            return math.degrees(lam0), math.degrees(phi_of_beta(beta0))
        c = 2.0 * math.asin(max(-1.0, min(1.0, rho / (2.0 * rq))))
        sc, cc = math.sin(c), math.cos(c)
        bp = math.asin(max(-1.0, min(1.0, cc * sb0 + dy * sc * cb0 / rho)))
        lam = lam0 + math.atan2(dx * sc, rho * cb0 * cc - dy * sb0 * sc)
        return wrap_lon(math.degrees(lam)), math.degrees(phi_of_beta(bp))

    return fwd, inv


#: EPSG code -> (a, f, lat_0, lon_0, x_0, y_0) for embedded LAEA CRSs
_LAEA_PARAMS = {
    # ETRS89-extended / LAEA Europe (the INSPIRE / Eurostat grid)
    3035: (_ELLPS["GRS80"][0], _ELLPS["GRS80"][1],
           52.0, 10.0, 4321000.0, 3210000.0),
    # US National Atlas Equal Area (authalic sphere); 2163 is the
    # deprecated earlier code for the same projected CRS
    9311: (6370997.0, 0.0, 45.0, -100.0, 0.0, 0.0),
    2163: (6370997.0, 0.0, 45.0, -100.0, 0.0, 0.0),
    # WGS84 North Pole LAEA regional grids (polar aspect; only lon_0
    # differs): Bering Sea / Alaska / Canada / Atlantic / Europe / Russia
    3571: (_ELLPS["WGS84"][0], _ELLPS["WGS84"][1], 90.0, 180.0, 0.0, 0.0),
    3572: (_ELLPS["WGS84"][0], _ELLPS["WGS84"][1], 90.0, -150.0, 0.0, 0.0),
    3573: (_ELLPS["WGS84"][0], _ELLPS["WGS84"][1], 90.0, -100.0, 0.0, 0.0),
    3574: (_ELLPS["WGS84"][0], _ELLPS["WGS84"][1], 90.0, -40.0, 0.0, 0.0),
    3575: (_ELLPS["WGS84"][0], _ELLPS["WGS84"][1], 90.0, 10.0, 0.0, 0.0),
    3576: (_ELLPS["WGS84"][0], _ELLPS["WGS84"][1], 90.0, 90.0, 0.0, 0.0),
}


def _resolve_transform(s: int, d: int):
    """Point-transform callable for (s, d), composing through 4326 for
    pairs like 3857<->UTM or UTM<->LCC; None when unsupported."""
    direct = _TRANSFORMS.get((s, d))
    if direct is not None:
        return direct
    zs, zd = _utm_zone(s), _utm_zone(d)
    if s == 4326 and zd:
        return _utm_forward(*zd)
    if zs and d == 4326:
        return _utm_inverse(*zs)
    if s == 4326 and d in _LCC_PARAMS:
        return _lcc_forward(_LCC_PARAMS[d])
    if s in _LCC_PARAMS and d == 4326:
        return _lcc_inverse(_LCC_PARAMS[s])
    if s == 4326 and d in _AEA_PARAMS:
        return _aea_forward(_AEA_PARAMS[d])
    if s in _AEA_PARAMS and d == 4326:
        return _aea_inverse(_AEA_PARAMS[s])
    if s == 4326 and d in _LAEA_PARAMS:
        return _laea_fns(*_LAEA_PARAMS[d])[0]
    if s in _LAEA_PARAMS and d == 4326:
        return _laea_fns(*_LAEA_PARAMS[s])[1]
    if s == 4326 and d == 3395:
        # WGS84 / World Mercator (ellipsoidal variant A, k=1)
        return _projdef_fns({"proj": "merc", "ellps": "WGS84"})[0]
    if s == 3395 and d == 4326:
        return _projdef_fns({"proj": "merc", "ellps": "WGS84"})[1]
    if s == 4326 and d in _PS_PARAMS:
        return _ps_forward(_PS_PARAMS[d])
    if s in _PS_PARAMS and d == 4326:
        return _ps_inverse(_PS_PARAMS[s])
    if s == 4326 and d in _TM_PARAMS:
        return _tm_forward_gen(*_TM_PARAMS[d])
    if s in _TM_PARAMS and d == 4326:
        return _tm_inverse_gen(*_TM_PARAMS[s])
    if s == 4326 and d == 27700:
        return _osgb_forward()
    if s == 27700 and d == 4326:
        return _osgb_inverse()
    if s == 4326 and d == 28992:
        return _rd_forward()
    if s == 28992 and d == 4326:
        return _rd_inverse()
    if s == 4326 and d == 5514:
        return _krovak_5514_forward()
    if s == 5514 and d == 4326:
        return _krovak_5514_inverse()
    if s == 4326 and d == 21781:
        return _ch_forward()
    if s == 21781 and d == 4326:
        return _ch_inverse()
    if s == 4326 and d == 2056:
        return _ch_forward(2600000.0, 1200000.0)
    if s == 2056 and d == 4326:
        return _ch_inverse(2600000.0, 1200000.0)
    # compose via 4326 (3857<->UTM, UTM<->UTM zone change, conic<->any)
    _named = (3857, 3395, 27700, 28992, 5514, 21781, 2056)
    if (
        zs or s in _named or s in _LCC_PARAMS or s in _AEA_PARAMS
        or s in _LAEA_PARAMS or s in _PS_PARAMS or s in _TM_PARAMS
    ) and (
        zd or d in _named or d in _LCC_PARAMS or d in _AEA_PARAMS
        or d in _LAEA_PARAMS or d in _PS_PARAMS or d in _TM_PARAMS
    ):
        to_geo = _resolve_transform(s, 4326)
        from_geo = _resolve_transform(4326, d)
        return lambda x, y: from_geo(*to_geo(x, y))
    return None


@pandas_udf(BinaryType())
def _k_transform(g: pd.Series, src: pd.Series, dst: pd.Series) -> pd.Series:
    out = []
    for b, s, d in zip(g, src, dst):
        if b is None or s is None or d is None:
            out.append(None)
            continue
        s, d = int(s), int(d)
        if s == d:
            out.append(bytes(b))
            continue
        fn = _resolve_transform(s, d)
        if fn is None:
            raise NotImplementedError(
                f"st_transform supports EPSG:4326<->3857, 4326/3857<->"
                f"UTM (326zz/327zz), the embedded LCC set {sorted(_LCC_PARAMS)} "
                f"Albers {sorted(_AEA_PARAMS)}, LAEA {sorted(_LAEA_PARAMS)}, "
                f"polar stereographic "
                f"{sorted(_PS_PARAMS)}, TM grids {sorted(_TM_PARAMS)}, "
                f"OSGB 27700, RD New 28992, S-JTSK Krovak 5514 and "
                f"Swiss 21781/2056, got {s}->{d} "
                "(the reference delegates other pairs to PROJ)"
            )
        gtype, coords = _parse(bytes(b))
        out.append(_pack(gtype, _map_coords(gtype, coords, lambda p: fn(*p))))
    return pd.Series(out, dtype=object)


def st_transform(g, src_srid, dst_srid) -> Column:
    """Reproject between EPSG:4326 (lon/lat), EPSG:3857 (spherical Web
    Mercator) and the UTM zones (EPSG:326zz north / 327zz south, via
    the order-n^6 Krüger flattening series on WGS84 — the expansion
    proj's tmerc uses, sub-mm within a zone). 3857<->UTM and cross-zone
    UTM compose through 4326. Other SRID pairs raise. SRIDs are
    explicit arguments because this WKB slice stores geometries
    SRID-less."""
    s = F.lit(src_srid) if isinstance(src_srid, int) else _colify(src_srid)
    d = F.lit(dst_srid) if isinstance(dst_srid, int) else _colify(dst_srid)
    return _k_transform(_colify(g), s, d)


def _resolve_def_pair(src_def: str, dst_def: str):
    """Point transform for a pair of CRS definitions, each either
    'epsg:NNNN' (embedded-code path) or a proj4-style '+proj=...'
    string (method-kernel path). Composes through WGS84 geographic."""

    def leg(defn: str):
        defn = defn.strip()
        if defn.lower().startswith("epsg:"):
            code = int(defn.split(":", 1)[1])
            if code == 4326:
                ident = lambda x, y: (x, y)  # noqa: E731
                return ident, ident
            to_geo = _resolve_transform(code, 4326)
            from_geo = _resolve_transform(4326, code)
            if to_geo is None or from_geo is None:
                raise NotImplementedError(
                    f"epsg:{code} is not in the embedded set; pass its "
                    "proj4 definition (+proj=...) instead"
                )
            return to_geo, from_geo
        return _projdef_transform(defn)

    s_to, _ = leg(src_def)
    _, d_from = leg(dst_def)
    return lambda x, y: d_from(*s_to(x, y))


@pandas_udf(BinaryType())
def _k_transform_def(g: pd.Series, src: pd.Series, dst: pd.Series) -> pd.Series:
    out = []
    cache: dict = {}
    for b, s, d in zip(g, src, dst):
        if b is None or s is None or d is None:
            out.append(None)
            continue
        key = (s, d)
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = _resolve_def_pair(str(s), str(d))
        gtype, coords = _parse(bytes(b))
        out.append(_pack(gtype, _map_coords(gtype, coords, lambda p: fn(*p))))
    return pd.Series(out, dtype=object)


def st_transform_def(g, src_def, dst_def) -> Column:
    """Reproject between CRS *definitions*: each side is either
    'epsg:NNNN' (the embedded-code fast path) or a proj4-style string
    ('+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 +ellps=GRS80
    +towgs84=0,0,0'), covering any EPSG code whose method is an
    embedded kernel (utm/tmerc, lcc, aea, polar stere, sterea,
    merc/webmerc, longlat); datum legs take +towgs84 or +nadgrids=
    (NTv2 .gsb grid files, which win over towgs84 as in PROJ).
    The reference gets this via DuckDB-spatial/PROJ
    (pg_lake_engine shippable_spatial_functions.c st_transform)."""
    s = F.lit(src_def) if isinstance(src_def, str) else _colify(src_def)
    d = F.lit(dst_def) if isinstance(dst_def, str) else _colify(dst_def)
    return _k_transform_def(_colify(g), s, d)


# ---------------------------------------------------------------------------
# Overlay operations: st_intersection / st_union / st_difference
# (reference: shippable_spatial_functions.c delegates to GEOS overlay)
#
# polygon/polygon uses Greiner-Hormann clipping on simple shells —
# exact for polygons in general position. Degenerate configurations
# (shared vertices, collinear overlapping edges, a vertex of one on the
# other's boundary — adjacent parcels, T-joints) fall back to
# _overlay_snap_fallback: a ppb dilation of one input breaks the
# degeneracy, and the result snaps to a ~1e-6-of-scale grid so the
# perturbation slivers collapse — the snap-rounding strategy GEOS
# applies to the same inputs. Unresolvable cases still raise
# SpatialDegeneracyError with a pointer at st_reduceprecision.
# Lower-dimension combos (point/line with anything) are computed
# directly and exactly.
# ---------------------------------------------------------------------------

class _GHV:
    __slots__ = ("x", "y", "nxt", "prv", "neighbor", "intersect", "entry",
                 "alpha", "visited")

    def __init__(self, x, y, intersect=False, alpha=0.0):
        self.x, self.y = x, y
        self.nxt = self.prv = self.neighbor = None
        self.intersect = intersect
        self.entry = False
        self.alpha = alpha
        self.visited = False


def _gh_ring(ring):
    verts = [_GHV(x, y) for x, y in ring[:-1]]
    for i, v in enumerate(verts):
        v.nxt = verts[(i + 1) % len(verts)]
        v.prv = verts[(i - 1) % len(verts)]
    return verts[0]


def _gh_vertices(first):
    v = first
    while True:
        yield v
        v = v.nxt
        if v is first:
            break


def _gh_edges(first):
    """(start, end) pairs over ORIGINAL vertices, skipping inserted
    intersection vertices."""
    orig = [v for v in _gh_vertices(first) if not v.intersect]
    for i, v in enumerate(orig):
        yield v, orig[(i + 1) % len(orig)]


def _gh_insert(v_new, start, end):
    """Insert between start and end, keeping alpha order."""
    cur = start
    while cur.nxt is not end and cur.nxt.alpha < v_new.alpha:
        cur = cur.nxt
    v_new.nxt = cur.nxt
    v_new.prv = cur
    cur.nxt.prv = v_new
    cur.nxt = v_new


class SpatialDegeneracyError(NotImplementedError):
    pass


def _gh_intersections(fa, fb) -> int:
    n = 0
    for a0, a1 in list(_gh_edges(fa)):
        for b0, b1 in list(_gh_edges(fb)):
            d = (a1.x - a0.x) * (b1.y - b0.y) - (a1.y - a0.y) * (b1.x - b0.x)
            if d == 0:
                if _orient(a0.x, a0.y, a1.x, a1.y, b0.x, b0.y) == 0:
                    # collinear: any positive-length overlap is degenerate
                    if abs(a1.x - a0.x) >= abs(a1.y - a0.y):
                        lo1, hi1 = sorted((a0.x, a1.x))
                        lo2, hi2 = sorted((b0.x, b1.x))
                    else:
                        lo1, hi1 = sorted((a0.y, a1.y))
                        lo2, hi2 = sorted((b0.y, b1.y))
                    if min(hi1, hi2) - max(lo1, lo2) > 0:
                        raise SpatialDegeneracyError(
                            "overlay: collinear overlapping edges; "
                            "perturb or st_reduceprecision the input"
                        )
                continue
            s = ((b0.x - a0.x) * (b1.y - b0.y) - (b0.y - a0.y) * (b1.x - b0.x)) / d
            t = ((b0.x - a0.x) * (a1.y - a0.y) - (b0.y - a0.y) * (a1.x - a0.x)) / d
            if 0 <= s <= 1 and 0 <= t <= 1:
                if s in (0.0, 1.0) or t in (0.0, 1.0):
                    raise SpatialDegeneracyError(
                        "overlay: intersection at a vertex / on an edge "
                        "endpoint; perturb or st_reduceprecision the input"
                    )
                ix = a0.x + s * (a1.x - a0.x)
                iy = a0.y + s * (a1.y - a0.y)
                va = _GHV(ix, iy, True, s)
                vb = _GHV(ix, iy, True, t)
                va.neighbor, vb.neighbor = vb, va
                _gh_insert(va, a0, a1)
                _gh_insert(vb, b0, b1)
                n += 1
    return n


def _gh_mark_entries(first, other_ring, invert: bool):
    pos = _poly_pos([other_ring], first.x, first.y)
    if pos == 1:
        raise SpatialDegeneracyError(
            "overlay: polygon vertex on the other polygon's boundary"
        )
    entry = pos == 0  # next crossing enters the other polygon
    if invert:
        entry = not entry
    for v in _gh_vertices(first):
        if v.intersect:
            v.entry = entry
            entry = not entry


def _gh_traverse(fa) -> list:
    rings = []
    for start in _gh_vertices(fa):
        if not start.intersect or start.visited:
            continue
        ring = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if cur.entry:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.intersect:
                        break
            else:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.intersect:
                        break
            cur = cur.neighbor
            if cur is start or cur.visited and cur is not start:
                break
        ring.append(ring[0])
        rings.append(ring)
    return rings


def _gh_overlay(ring_a, ring_b, op: str) -> list:
    """Overlay two simple closed rings. op: 'inter' | 'union' | 'diff'.
    Returns a list of closed result rings ([] = empty result)."""
    fa, fb = _gh_ring(ring_a), _gh_ring(ring_b)
    n = _gh_intersections(fa, fb)
    if n == 0:
        a_in_b = _poly_pos([ring_b], *ring_a[0]) == 2
        b_in_a = _poly_pos([ring_a], *ring_b[0]) == 2
        if op == "inter":
            return [ring_b] if b_in_a else ([ring_a] if a_in_b else [])
        if op == "union":
            if b_in_a:
                return [ring_a]
            if a_in_b:
                return [ring_b]
            return [ring_a, ring_b]
        # diff
        if b_in_a:
            return [ring_a, ring_b[::-1]]  # hole
        if a_in_b:
            return []
        return [ring_a]
    # entry-flag convention: intersection inverts neither list, union
    # inverts both, difference a-b inverts a's only
    _gh_mark_entries(fa, ring_b, invert=op in ("union", "diff"))
    _gh_mark_entries(fb, ring_a, invert=op == "union")
    return _gh_traverse(fa)


def _assemble_polygons(rings: list) -> bytes | None:
    """Classify overlay result rings into shells and holes (even-odd
    nesting depth) and pack as (MULTI)POLYGON."""
    if not rings:
        return None
    depth = []
    for i, r in enumerate(rings):
        d = sum(
            1
            for j, o in enumerate(rings)
            if j != i and _ring_pos(r[0][0], r[0][1], o) == 2
        )
        depth.append(d)
    shells = [(i, r) for i, r in enumerate(rings) if depth[i] % 2 == 0]
    holes = [(i, r) for i, r in enumerate(rings) if depth[i] % 2 == 1]
    polys = {i: [r] for i, r in shells}
    for _, hr in holes:
        # attach to the smallest containing shell
        cands = [
            (abs(_ring_area(sr)), i)
            for i, sr in shells
            if _ring_pos(hr[0][0], hr[0][1], sr) == 2
        ]
        polys[min(cands)[1]].append(hr)
    out = list(polys.values())
    if len(out) == 1:
        return _pack(WKB_POLYGON, out[0])
    return _pack(WKB_MULTIPOLYGON, [(WKB_POLYGON, p) for p in out])


def _points_of(gtype, coords) -> list:
    if gtype == WKB_POINT:
        return [coords[0]]
    if gtype == WKB_MULTIPOINT:
        return [kc[0] for _, kc in coords]
    raise ValueError("expected (MULTI)POINT")


def _pack_points(pts: list) -> bytes | None:
    pts = list(dict.fromkeys(pts))
    if not pts:
        return None
    if len(pts) == 1:
        return _pack_point(*pts[0])
    return _pack(WKB_MULTIPOINT, [(WKB_POINT, [p]) for p in pts])


def _pack_lines(pieces: list) -> bytes | None:
    pieces = [p for p in pieces if len(p) >= 2]
    if not pieces:
        return None
    if len(pieces) == 1:
        return _pack_linestring(pieces[0])
    return _pack(WKB_MULTILINESTRING, [(WKB_LINESTRING, p) for p in pieces])


def _line_parts(gtype, coords) -> list:
    if gtype == WKB_LINESTRING:
        return [coords]
    if gtype == WKB_MULTILINESTRING:
        return [kc for _, kc in coords]
    raise ValueError("expected (MULTI)LINESTRING")


def _poly_rings_pos(parsed, x, y) -> int:
    """Position against a (MULTI)POLYGON's union (max over parts)."""
    gt, cs = parsed
    if gt == WKB_POLYGON:
        return _poly_pos(cs, x, y)
    return max((_poly_pos(kc, x, y) for kt, kc in cs), default=0)


def _clip_line_by_polygon(parts: list, poly_parsed, keep_inside: bool) -> list:
    """Split line parts at polygon-boundary crossings; keep the pieces
    whose midpoints are covered (keep_inside) or outside."""
    gt, cs = poly_parsed
    boundary = list(_segments_of(gt, cs))
    pieces = []
    for part in parts:
        cur = []
        for p, q in zip(part, part[1:]):
            ts = {0.0, 1.0}
            for b0, b1 in boundary:
                d = (q[0] - p[0]) * (b1[1] - b0[1]) - (q[1] - p[1]) * (b1[0] - b0[0])
                if d == 0:
                    continue
                s = ((b0[0] - p[0]) * (b1[1] - b0[1]) - (b0[1] - p[1]) * (b1[0] - b0[0])) / d
                t = ((b0[0] - p[0]) * (q[1] - p[1]) - (b0[1] - p[1]) * (q[0] - p[0])) / d
                if 0 <= s <= 1 and 0 <= t <= 1:
                    ts.add(s)
            ts = sorted(ts)
            for t0, t1 in zip(ts, ts[1:]):
                if t1 - t0 <= 0:
                    continue
                mid = (
                    p[0] + (t0 + t1) / 2 * (q[0] - p[0]),
                    p[1] + (t0 + t1) / 2 * (q[1] - p[1]),
                )
                inside = _poly_rings_pos(poly_parsed, *mid) != 0
                a = (p[0] + t0 * (q[0] - p[0]), p[1] + t0 * (q[1] - p[1]))
                b = (p[0] + t1 * (q[0] - p[0]), p[1] + t1 * (q[1] - p[1]))
                if inside == keep_inside:
                    if cur and cur[-1] == a:
                        cur.append(b)
                    else:
                        if len(cur) >= 2:
                            pieces.append(cur)
                        cur = [a, b]
                else:
                    if len(cur) >= 2:
                        pieces.append(cur)
                    cur = []
        if len(cur) >= 2:
            pieces.append(cur)
    return pieces


def _line_line_points(pa: list, pb: list) -> list:
    """Intersection points of two line-part sets (inclusive endpoints);
    collinear overlap raises (1-dim intersection of lines)."""
    pts = []
    for part_a in pa:
        for part_b in pb:
            for p, q in zip(part_a, part_a[1:]):
                for b0, b1 in zip(part_b, part_b[1:]):
                    d = (q[0] - p[0]) * (b1[1] - b0[1]) - (q[1] - p[1]) * (b1[0] - b0[0])
                    if d == 0:
                        if (
                            _orient(*p, *q, *b0) == 0
                            and _collinear_overlap(
                                WKB_LINESTRING, [p, q], WKB_LINESTRING, [b0, b1]
                            )
                        ):
                            raise SpatialDegeneracyError(
                                "st_intersection: collinear overlapping "
                                "line segments (1-dim intersection)"
                            )
                        continue
                    s = ((b0[0] - p[0]) * (b1[1] - b0[1]) - (b0[1] - p[1]) * (b1[0] - b0[0])) / d
                    t = ((b0[0] - p[0]) * (q[1] - p[1]) - (b0[1] - p[1]) * (q[0] - p[0])) / d
                    if 0 <= s <= 1 and 0 <= t <= 1:
                        pts.append(
                            (p[0] + s * (q[0] - p[0]), p[1] + s * (q[1] - p[1]))
                        )
    return pts


def _shells_only(parsed) -> list:
    """Shell rings of a (MULTI)POLYGON; raises on holes (GH slice)."""
    gt, cs = parsed
    polys = [cs] if gt == WKB_POLYGON else [kc for _, kc in cs]
    for p in polys:
        if len(p) > 1:
            raise SpatialDegeneracyError(
                "overlay on polygons with interior rings is only "
                "supported for disjoint/nested cases"
            )
    return [p[0] for p in polys]


def _snapped_ring_is_sliver(ring: list, grid: float) -> bool:
    """True when a snapped overlay ring is a one-grid-cell-wide snap
    artifact. Width test (area/perimeter — half the mean width of a
    long thin ring), not raw area: a legitimate thin overlay result
    (a genuinely narrow intersection strip between boundary-sharing
    parcels) is many grid cells wide no matter how short, while a
    perturbation artifact is at most ~one cell wide no matter how
    long. An area threshold can't separate the two (short real strips
    have small areas; long artifacts have large ones)."""
    area = abs(_ring_area(ring))
    perim = sum(
        ((ring[i + 1][0] - ring[i][0]) ** 2 + (ring[i + 1][1] - ring[i][1]) ** 2)
        ** 0.5
        for i in range(len(ring) - 1)
    )
    return perim <= 0.0 or area / perim <= grid


def _overlay_snap_fallback(ring_a: list, ring_b: list, op: str) -> bytes | None:
    """Overlay for degenerate (boundary-sharing) rings: dilate/shrink B
    by parts-per-billion about its centroid to break the degeneracy,
    run Greiner-Hormann on the perturbed pair, then SNAP the result to
    a grid ~1e-6 of the geometry scale — perturbation artifacts (slivers
    along the formerly-shared boundary) collapse to zero-area rings and
    are dropped, so adjacent parcels union/difference cleanly. This is
    the snap-rounding strategy GEOS applies to the same inputs; the
    documented precision of this path is the snap grid. A boundary-only
    intersection (adjacent parcels) comes back EMPTY here — this is
    polygon-dimension overlay; measure-zero shared edges are dropped
    (GEOS would return the LINESTRING).

    Dilation (not translation) is direction-free: a shared edge always
    becomes a proper crossing whichever side B sits on.
    """
    xs = [p[0] for p in ring_a] + [p[0] for p in ring_b]
    ys = [p[1] for p in ring_a] + [p[1] for p in ring_b]
    scale = max(max(xs) - min(xs), max(ys) - min(ys), 1e-30)
    grid = scale * 1e-6
    bx = sum(p[0] for p in ring_b[:-1]) / (len(ring_b) - 1)
    by = sum(p[1] for p in ring_b[:-1]) / (len(ring_b) - 1)
    for f in (1 + 1e-9, 1 - 1e-9, 1 + 7.3e-9, 1 - 7.3e-9):
        ring_bp = [(bx + (x - bx) * f, by + (y - by) * f) for x, y in ring_b]
        try:
            rings = _gh_overlay(ring_a, ring_bp, op)
        except SpatialDegeneracyError:
            continue
        snapped = []
        for r in rings:
            s = _dedupe_consecutive(
                [(round(x / grid) * grid, round(y / grid) * grid) for x, y in r]
            )
            if s[0] != s[-1]:
                s.append(s[0])
            if len(s) >= 4 and not _snapped_ring_is_sliver(s, grid):
                snapped.append(s)
        return _assemble_polygons(snapped)
    raise SpatialDegeneracyError(
        "overlay: degenerate input not resolved by snap-rounding; "
        "perturb or st_reduceprecision the input"
    )


def _overlay_polys(a: bytes, b: bytes, op: str) -> bytes | None:
    pa, pb = _parse(a), _parse(b)
    ta, ca = pa
    tb, cb = pb
    # hole-aware fast paths first (exact via covers/intersects)
    if not _geoms_intersect(a, b):
        if op == "inter":
            return None
        if op == "diff":
            return a
        polys = ([ca] if ta == WKB_POLYGON else [kc for _, kc in ca]) + (
            [cb] if tb == WKB_POLYGON else [kc for _, kc in cb]
        )
        return _pack(WKB_MULTIPOLYGON, [(WKB_POLYGON, p) for p in polys])
    if _rel_covers(tb, cb, ta, ca):  # b covers a
        if op == "inter":
            return a
        if op == "union":
            return b
        return None
    if _rel_covers(ta, ca, tb, cb):  # a covers b
        if op == "inter":
            return b
        if op == "union":
            return a
        # a minus nested hole-free b: punch b's shell as a hole
        if ta == WKB_POLYGON and tb == WKB_POLYGON and len(cb) == 1:
            return _pack(WKB_POLYGON, list(ca) + [cb[0][::-1]])
        raise SpatialDegeneracyError(
            "st_difference: nested multipolygon/holed difference "
            "not supported"
        )
    shells_a, shells_b = _shells_only(pa), _shells_only(pb)
    if len(shells_a) > 1 or len(shells_b) > 1:
        raise SpatialDegeneracyError(
            "overlay on overlapping multipolygons is not supported"
        )
    try:
        return _assemble_polygons(_gh_overlay(shells_a[0], shells_b[0], op))
    except SpatialDegeneracyError:
        # boundary-sharing inputs (shared parcel edges, vertex-on-edge
        # T-joints): snap-rounding fallback, the GEOS strategy
        return _overlay_snap_fallback(shells_a[0], shells_b[0], op)


def _overlay_geoms(a: bytes, b: bytes, op: str) -> bytes | None:
    pa, pb = _parse(a), _parse(b)
    da, db = _dim_of(*pa), _dim_of(*pb)
    if op == "union" and da != db:
        raise NotImplementedError(
            "st_union of mixed-dimension geometries (GEOMETRYCOLLECTION "
            "results) is not supported"
        )
    if da == 0:
        pts = _points_of(*pa)
        if op == "inter":
            keep = [p for p in pts if _geom_pos(*pb, *p) != 0]
            return _pack_points(keep)
        if op == "diff":
            return _pack_points([p for p in pts if _geom_pos(*pb, *p) == 0])
        return _pack_points(pts + _points_of(*pb))
    if db == 0:
        pts = _points_of(*pb)
        if op == "inter":
            return _pack_points([p for p in pts if _geom_pos(*pa, *p) != 0])
        # removing a measure-zero set leaves a unchanged
        return a
    if da == 1 and db == 1:
        if op == "inter":
            return _pack_points(
                _line_line_points(_line_parts(*pa), _line_parts(*pb))
            )
        if op == "diff":
            return a  # measure-zero removal
        raise NotImplementedError(
            "st_union of lines (noded MULTILINESTRING) is not supported"
        )
    if da == 1:  # line vs polygon
        parts = _line_parts(*pa)
        if op == "inter":
            return _pack_lines(_clip_line_by_polygon(parts, pb, True))
        if op == "diff":
            return _pack_lines(_clip_line_by_polygon(parts, pb, False))
        raise NotImplementedError("st_union line/polygon is not supported")
    if db == 1:  # polygon vs line
        if op == "inter":
            return _pack_lines(_clip_line_by_polygon(_line_parts(*pb), pa, True))
        return a  # diff: measure-zero removal
    return _overlay_polys(a, b, op)


def _make_overlay_kernel(op):
    @pandas_udf(BinaryType())
    def k(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(a, b):
            if ba is None or bb is None:
                out.append(None)
            else:
                out.append(_overlay_geoms(bytes(ba), bytes(bb), op))
        return pd.Series(out, dtype=object)

    return k


_k_intersection = _make_overlay_kernel("inter")
_k_union = _make_overlay_kernel("union")
_k_difference = _make_overlay_kernel("diff")


def st_intersection(a, b) -> Column:
    """Exact overlay intersection: Greiner-Hormann clipping for
    polygon/polygon in general position, direct splitting/filtering for
    point and line combos; NULL for an empty result. Degenerate
    boundary-sharing inputs raise (see SpatialDegeneracyError)."""
    return _k_intersection(_colify(a), _colify(b))


def st_union(a, b) -> Column:
    """Two-geometry union (dissolves shared borders for polygons in
    general position; collects disjoint parts into a MULTI)."""
    return _k_union(_colify(a), _colify(b))


def st_difference(a, b) -> Column:
    """a minus b; removing a lower-dimension b returns a unchanged
    (measure-zero removal, as in GEOS)."""
    return _k_difference(_colify(a), _colify(b))


# ---------------------------------------------------------------------------
# Geography slice: spherical measures on EPSG:4326 lon/lat coordinates.
#
# The reference's geography variants come from DuckDB-spatial/PROJ
# (pg_lake_engine/src/pgduck/shippable_spatial_functions.c geography
# rows). This dependency-free slice covers the most-used calls with
# closed-form spherical formulas on the IUGG mean Earth radius — the
# same model PostGIS's st_distancesphere uses. Spheroid (ellipsoidal)
# variants are out of scope and raise nowhere: the names say _sphere.
#
# - st_distance_sphere: haversine great-circle distance, point-point.
#   Pure JVM expression over the extracted (x, y) — no Python in the
#   hot path, safe in joins/filters at scale.
# - st_length_sphere: per-segment haversine sum over (MULTI)LINESTRING.
# - st_area_sphere: exact spherical polygon area via the signed
#   spherical excess, fan-triangulated from the first vertex with the
#   van Oosterom & Strackee tangent formula per triangle (signed, so
#   concave fans cancel correctly); holes subtract.
# ---------------------------------------------------------------------------

#: IUGG mean Earth radius in meters (PostGIS st_distancesphere's model)
EARTH_RADIUS_M = 6371008.8


def _haversine_expr(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Great-circle distance in meters between lon/lat degree pairs —
    plain Column arithmetic (whole-stage codegen applies)."""
    lat1, lat2 = F.radians(y1), F.radians(y2)
    dlat = lat2 - lat1
    dlon = F.radians(x2) - F.radians(x1)
    h = (
        F.pow(F.sin(dlat / 2), F.lit(2.0))
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), F.lit(2.0))
    )
    # clamp against fp drift pushing sqrt(h) epsilon-above 1 at antipodes
    return 2.0 * F.lit(EARTH_RADIUS_M) * F.asin(F.least(F.sqrt(h), F.lit(1.0)))


def st_distance_sphere(a, b) -> Column:
    """Great-circle point-point distance in meters (haversine on the
    mean-radius sphere). Accurate to ~0.3% of the WGS84 geodesic —
    PostGIS st_distancesphere parity."""
    pa_, pb = _k_xy(a), _k_xy(b)
    return _haversine_expr(pa_["x"], pa_["y"], pb["x"], pb["y"])


def st_dwithin_sphere(a, b, meters) -> Column:
    return st_distance_sphere(a, b) <= F.lit(float(meters))


def _hav(x1: float, y1: float, x2: float, y2: float) -> float:
    la1, la2 = math.radians(y1), math.radians(y2)
    h = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((math.radians(x2 - x1)) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * math.asin(min(1.0, math.sqrt(h)))


def _sphere_length_of(gtype: int, coords: list) -> float:
    base = gtype % 1000
    if base == 2:
        pts = coords
        return sum(_hav(*pts[i][:2], *pts[i + 1][:2]) for i in range(len(pts) - 1))
    if base == 5:
        # multi parts are (gtype, coords) tuples from _parse
        return sum(_sphere_length_of(*part) for part in coords)
    return 0.0


def _unit_vec(x: float, y: float) -> tuple[float, float, float]:
    lon, lat = math.radians(x), math.radians(y)
    cl = math.cos(lat)
    return (cl * math.cos(lon), cl * math.sin(lon), math.sin(lat))


def _triangle_excess(v0, v1, v2) -> float:
    """Signed spherical excess of the triangle (v0, v1, v2) — van
    Oosterom & Strackee 1983: tan(E/2) = v0.(v1 x v2) / (1 + dots)."""
    cx = v1[1] * v2[2] - v1[2] * v2[1]
    cy = v1[2] * v2[0] - v1[0] * v2[2]
    cz = v1[0] * v2[1] - v1[1] * v2[0]
    num = v0[0] * cx + v0[1] * cy + v0[2] * cz
    dot = lambda a, b: a[0] * b[0] + a[1] * b[1] + a[2] * b[2]  # noqa: E731
    den = 1.0 + dot(v0, v1) + dot(v1, v2) + dot(v2, v0)
    return 2.0 * math.atan2(num, den)


def _sphere_ring_area(ring: list) -> float:
    """Unsigned spherical area of one ring (m^2): |sum of signed fan
    excesses| * R^2. Exact for great-circle edges; sign cancellation
    makes the fan correct for concave rings."""
    pts = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else ring
    if len(pts) < 3:
        return 0.0
    vecs = [_unit_vec(p[0], p[1]) for p in pts]
    excess = sum(
        _triangle_excess(vecs[0], vecs[i], vecs[i + 1])
        for i in range(1, len(vecs) - 1)
    )
    return abs(excess) * EARTH_RADIUS_M * EARTH_RADIUS_M


def _sphere_area_of(gtype: int, coords: list) -> float:
    base = gtype % 1000
    if base == 3:
        if not coords:
            return 0.0
        area = _sphere_ring_area(coords[0])
        for hole in coords[1:]:
            area -= _sphere_ring_area(hole)
        return area
    if base == 6:
        return sum(_sphere_area_of(*poly) for poly in coords)
    return 0.0


@pandas_udf(DoubleType())
def _k_sphere_length(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _sphere_length_of(*_parse(bytes(b))) for b in g],
        dtype="float64",
    )


@pandas_udf(DoubleType())
def _k_sphere_area(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _sphere_area_of(*_parse(bytes(b))) for b in g],
        dtype="float64",
    )


def st_length_sphere(g) -> Column:
    """Great-circle length in meters of a (MULTI)LINESTRING whose
    coordinates are lon/lat degrees; 0 for other types (PostGIS
    geography length semantics on the sphere)."""
    return _k_sphere_length(_colify(g))


def st_area_sphere(g) -> Column:
    """Spherical area in m^2 of a (MULTI)POLYGON on lon/lat degrees —
    exact signed spherical excess (not the small-polygon approximation),
    holes subtracted; 0 for points/lines."""
    return _k_sphere_area(_colify(g))


# -- Spheroid (ellipsoidal) distance: Vincenty inverse on WGS84 with a
# bounded iteration; near-antipodal non-convergence falls back to the
# haversine sphere (documented ~0.5% there, exact-to-0.5mm elsewhere).
# This is the st_distance(geography) ellipsoid the reference gets from
# DuckDB-spatial; Karney's always-convergent method needs elliptic
# integrals, out of scope for this dependency-free slice.

def _vincenty_m(x1: float, y1: float, x2: float, y2: float) -> float:
    if x1 == x2 and y1 == y2:
        return 0.0
    a, f = _WGS84_A, _WGS84_F
    b = a * (1 - f)
    L = math.radians(x2 - x1)
    U1 = math.atan((1 - f) * math.tan(math.radians(y1)))
    U2 = math.atan((1 - f) * math.tan(math.radians(y2)))
    sU1, cU1 = math.sin(U1), math.cos(U1)
    sU2, cU2 = math.sin(U2), math.cos(U2)
    lam = L
    for _ in range(100):
        sl, cl = math.sin(lam), math.cos(lam)
        s_sig = math.hypot(cU2 * sl, cU1 * sU2 - sU1 * cU2 * cl)
        if s_sig == 0:
            return 0.0  # coincident
        c_sig = sU1 * sU2 + cU1 * cU2 * cl
        sig = math.atan2(s_sig, c_sig)
        s_alpha = cU1 * cU2 * sl / s_sig
        cos2_alpha = 1 - s_alpha * s_alpha
        c2sm = c_sig - 2 * sU1 * sU2 / cos2_alpha if cos2_alpha else 0.0
        C = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
        lam_prev = lam
        lam = L + (1 - C) * f * s_alpha * (
            sig + C * s_sig * (c2sm + C * c_sig * (-1 + 2 * c2sm * c2sm))
        )
        if abs(lam - lam_prev) < 1e-12:
            break
    else:
        return _hav(x1, y1, x2, y2)  # near-antipodal: sphere fallback
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A_ = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B_ = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    d_sig = B_ * s_sig * (
        c2sm
        + B_ / 4 * (
            c_sig * (-1 + 2 * c2sm * c2sm)
            - B_ / 6 * c2sm * (-3 + 4 * s_sig * s_sig) * (-3 + 4 * c2sm * c2sm)
        )
    )
    return b * A_ * (sig - d_sig)


@pandas_udf(DoubleType())
def _k_distance_spheroid(ax: pd.Series, ay: pd.Series, bx: pd.Series, by: pd.Series) -> pd.Series:
    out = []
    for x1, y1, x2, y2 in zip(ax, ay, bx, by):
        if x1 is None or pd.isna(x1) or x2 is None or pd.isna(x2):
            out.append(None)
        else:
            out.append(_vincenty_m(float(x1), float(y1), float(x2), float(y2)))
    return pd.Series(out, dtype="float64")


def st_distance_spheroid(a, b) -> Column:
    """Ellipsoidal (WGS84) point-point distance in meters — Vincenty
    inverse, 0.5mm-grade where it converges, sphere fallback at the
    near-antipodal edge. PostGIS st_distance(geography) parity."""
    pa_, pb = _k_xy(a), _k_xy(b)
    return _k_distance_spheroid(pa_["x"], pa_["y"], pb["x"], pb["y"])


# -- Spheroid length/perimeter/area (r8): the remaining geography
# measures the reference ships via DuckAB-spatial/PROJ
# (shippable_spatial_functions.c spheroid rows).
#
# Length/perimeter: sum of Vincenty inverse distances over consecutive
# vertices — each segment is the true geodesic distance, so polyline
# length inherits Vincenty's sub-mm accuracy (the chord/geodesic path
# distinction is a property of the INPUT's vertex density, as in
# PostGIS).
#
# Area: spherical excess evaluated in AUTHALIC latitude on the authalic
# sphere. The authalic projection is exactly equal-area between the
# ellipsoid and the sphere of radius R_A = a*sqrt(q_p/2), so latitude-
# band distortion — the entire first-order flattening effect — is
# captured exactly; the only residual is the second-order difference
# between the ellipsoidal geodesic edge and the corresponding great
# circle (relative error O(f * (edge/R)^2), < 1e-6 for edges under
# ~1000 km, and exactly zero for meridian/equator edges, which map to
# great circles). Polygons bounded by meridians and the equator (e.g.
# the octant test vector) are exact to float precision.

_WGS84_E2 = _WGS84_F * (2.0 - _WGS84_F)
_WGS84_E = math.sqrt(_WGS84_E2)


def _authalic_q(sin_phi: float) -> float:
    e, e2 = _WGS84_E, _WGS84_E2
    return (1.0 - e2) * (
        sin_phi / (1.0 - e2 * sin_phi * sin_phi)
        - (1.0 / (2.0 * e)) * math.log((1.0 - e * sin_phi) / (1.0 + e * sin_phi))
    )


_AUTHALIC_QP = _authalic_q(1.0)
#: authalic radius: the sphere with the ellipsoid's exact surface area
_AUTHALIC_R = _WGS84_A * math.sqrt(_AUTHALIC_QP / 2.0)


def _authalic_lat_deg(lat_deg: float) -> float:
    s = math.sin(math.radians(lat_deg))
    q = _authalic_q(s)
    x = max(-1.0, min(1.0, q / _AUTHALIC_QP))
    return math.degrees(math.asin(x))


def _spheroid_line_m(pts: list) -> float:
    return sum(
        _vincenty_m(pts[i][0], pts[i][1], pts[i + 1][0], pts[i + 1][1])
        for i in range(len(pts) - 1)
    )


def _spheroid_length_of(gtype: int, coords: list) -> float:
    base = gtype % 1000
    if base == 2:
        return _spheroid_line_m(coords)
    if base == 5:
        # multi parts are (gtype, coords) tuples from _parse
        return sum(_spheroid_length_of(*part) for part in coords)
    return 0.0


def _spheroid_perimeter_of(gtype: int, coords: list) -> float:
    base = gtype % 1000
    if base == 3:
        return sum(_spheroid_line_m(ring) for ring in coords)
    if base == 6:
        return sum(_spheroid_perimeter_of(*poly) for poly in coords)
    return 0.0


def _spheroid_ring_area(ring: list) -> float:
    pts = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else ring
    if len(pts) < 3:
        return 0.0
    vecs = [_unit_vec(p[0], _authalic_lat_deg(p[1])) for p in pts]
    excess = sum(
        _triangle_excess(vecs[0], vecs[i], vecs[i + 1])
        for i in range(1, len(vecs) - 1)
    )
    return abs(excess) * _AUTHALIC_R * _AUTHALIC_R


def _spheroid_area_of(gtype: int, coords: list) -> float:
    base = gtype % 1000
    if base == 3:
        if not coords:
            return 0.0
        area = _spheroid_ring_area(coords[0])
        for hole in coords[1:]:
            area -= _spheroid_ring_area(hole)
        return area
    if base == 6:
        return sum(_spheroid_area_of(*poly) for poly in coords)
    return 0.0


@pandas_udf(DoubleType())
def _k_spheroid_length(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _spheroid_length_of(*_parse(bytes(b))) for b in g],
        dtype="float64",
    )


@pandas_udf(DoubleType())
def _k_spheroid_perimeter(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _spheroid_perimeter_of(*_parse(bytes(b))) for b in g],
        dtype="float64",
    )


@pandas_udf(DoubleType())
def _k_spheroid_area(g: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else _spheroid_area_of(*_parse(bytes(b))) for b in g],
        dtype="float64",
    )


def st_length_spheroid(g) -> Column:
    """Ellipsoidal (WGS84) length in meters of a (MULTI)LINESTRING on
    lon/lat degrees: per-segment Vincenty geodesic distances summed; 0
    for other types (PostGIS st_length(geography) semantics)."""
    return _k_spheroid_length(_colify(g))


def st_perimeter_spheroid(g) -> Column:
    """Ellipsoidal (WGS84) ring perimeter in meters of a
    (MULTI)POLYGON — Vincenty per edge over every ring, holes
    included (PostGIS st_perimeter(geography))."""
    return _k_spheroid_perimeter(_colify(g))


def st_area_spheroid(g) -> Column:
    """Ellipsoidal (WGS84) polygon area in m^2 via exact authalic-
    latitude mapping onto the authalic sphere (see module note: the
    equal-area mapping is exact per latitude band; residual is the
    O(f*(edge/R)^2) geodesic-vs-great-circle edge difference, zero for
    meridian/equator-bounded polygons). PostGIS st_area(geography)
    model."""
    return _k_spheroid_area(_colify(g))
