"""Dependency-free DXF reader (ASCII, ENTITIES section) — pure text.

Reference: GDAL's DXF driver (docs/file-formats-reference.md:
`.dxf .dwg | AutoCAD files`; .dwg is a closed binary format and stays
out of reach). ASCII DXF is a stream of (group code, value) line pairs;
the ENTITIES section carries the drawing's geometry. Supported
entities → WKB:

- ``POINT`` (codes 10/20) → POINT
- ``LINE`` (10/20 start, 11/21 end) → LINESTRING
- ``LWPOLYLINE`` (repeated 10/20 vertices; flag 70 bit 1 = closed) →
  LINESTRING, or POLYGON when closed
- ``POLYLINE``/``VERTEX``/``SEQEND`` (legacy heavyweight polyline) →
  same mapping
- ``CIRCLE`` (center 10/20, radius 40) → regular-polygon approximation
  (the same quad_segs shape st_buffer emits)

Output: (entity string, layer string, geometry WKB). Z values (30/31)
are ignored — 2D engine. Single-node parse like every GDAL-funnel
format.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.functions.spatial import (
    _pack_linestring,
    _pack_point,
    _pack_polygon,
)


def _pairs(path: str):
    with open(path, errors="replace") as fh:
        lines = [ln.rstrip("\r\n") for ln in fh]
    for i in range(0, len(lines) - 1, 2):
        try:
            yield int(lines[i].strip()), lines[i + 1].strip()
        except ValueError:
            continue


def read_dxf(spark: SparkSession, path: str, *, circle_segments: int = 32) -> DataFrame:
    rows: list[tuple] = []
    in_entities = False
    cur: dict | None = None
    poly: dict | None = None  # open POLYLINE accumulator

    def flush(entity: dict | None):
        if not entity:
            return
        kind = entity["kind"]
        layer = entity.get("layer", "0")
        if kind == "POINT" and "x" in entity:
            rows.append(("POINT", layer, _pack_point(entity["x"], entity["y"])))
        elif kind == "LINE" and "x" in entity and "x2" in entity:
            rows.append(
                (
                    "LINE",
                    layer,
                    _pack_linestring(
                        [(entity["x"], entity["y"]), (entity["x2"], entity["y2"])]
                    ),
                )
            )
        elif kind in ("LWPOLYLINE", "POLYLINE") and entity.get("verts"):
            verts = entity["verts"]
            if entity.get("closed") and len(verts) >= 3:
                ring = verts + [verts[0]]
                rows.append((kind, layer, _pack_polygon([ring])))
            elif len(verts) >= 2:
                rows.append((kind, layer, _pack_linestring(verts)))
        elif kind == "CIRCLE" and "x" in entity and "r" in entity:
            n = max(8, circle_segments)
            ring = [
                (
                    entity["x"] + entity["r"] * math.cos(2 * math.pi * i / n),
                    entity["y"] + entity["r"] * math.sin(2 * math.pi * i / n),
                )
                for i in range(n)
            ]
            ring.append(ring[0])
            rows.append(("CIRCLE", layer, _pack_polygon([ring])))

    for code, value in _pairs(path):
        if code == 0:
            if value == "SECTION":
                cur = {"kind": "_section"}
                continue
            if value == "ENDSEC":
                in_entities = False
                flush(cur if cur and cur.get("kind") != "_section" else None)
                cur = None
                continue
            if not in_entities and cur is not None and cur.get("kind") == "_section":
                cur = None
            if in_entities:
                if value == "VERTEX" and poly is not None:
                    if cur is not None and cur.get("kind") == "_vertex" and "x" in cur:
                        poly["verts"].append((cur["x"], cur["y"]))
                    cur = {"kind": "_vertex"}
                    continue
                if value == "SEQEND" and poly is not None:
                    if cur and cur.get("kind") == "_vertex" and "x" in cur:
                        poly["verts"].append((cur["x"], cur["y"]))
                    flush(poly)
                    poly = None
                    cur = None
                    continue
                # close out the previous entity
                if cur is not None and cur.get("kind") == "_vertex" and "x" in cur:
                    poly["verts"].append((cur["x"], cur["y"]))
                elif cur is not None and cur is not poly:
                    flush(cur)
                if value == "POLYLINE":
                    poly = {"kind": "POLYLINE", "verts": []}
                    cur = poly
                elif value in ("POINT", "LINE", "LWPOLYLINE", "CIRCLE"):
                    cur = {"kind": value}
                    if value == "LWPOLYLINE":
                        cur["verts"] = []
                else:
                    cur = None
            continue
        if code == 2 and value == "ENTITIES":
            in_entities = True
            continue
        if not in_entities or cur is None:
            continue
        if code == 8:
            cur["layer"] = value
        elif code == 10:
            if cur.get("kind") == "LWPOLYLINE":
                cur["verts"].append((float(value), None))
            else:
                cur["x"] = float(value)
        elif code == 20:
            if cur.get("kind") == "LWPOLYLINE" and cur["verts"]:
                x, _ = cur["verts"][-1]
                cur["verts"][-1] = (x, float(value))
            else:
                cur["y"] = float(value)
        elif code == 11:
            cur["x2"] = float(value)
        elif code == 21:
            cur["y2"] = float(value)
        elif code == 40:
            cur["r"] = float(value)
        elif code == 70:
            try:
                cur["closed"] = bool(int(value) & 1)
            except ValueError:
                pass
    flush(cur if cur and cur.get("kind") not in ("_section", "_vertex") else None)
    return spark.createDataFrame(rows, "entity string, layer string, geometry binary")
