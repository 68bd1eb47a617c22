"""Dependency-free GML reader (simple-features profile) — xml.etree.

Reference: GDAL's GML driver (docs/file-formats-reference.md: `.gml |
Geography Markup Language`). GML application schemas vary; this reader
covers the common simple-features encoding produced by WFS servers and
ogr2ogr: feature members whose children are property elements, one of
which holds a ``gml:Point`` / ``gml:LineString`` / ``gml:Polygon`` /
``gml:MultiPoint|MultiCurve|MultiSurface`` geometry with ``gml:pos`` /
``gml:posList`` / ``gml:coordinates`` coordinate text.

Output: one row per feature — ``feature`` (the member tag's local
name), ``properties`` JSON of scalar child elements, ``geometry`` WKB.
Coordinates: ``pos``/``posList`` are space-separated x y pairs;
``coordinates`` (GML2) is comma-within-tuple, space-between-tuples.
Single-node XML parse like the reference's GDAL funnel.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.functions.spatial import (
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    WKB_MULTIPOINT,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    WKB_POLYGON,
    _pack,
)

_GEOM_TAGS = {
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiCurve",
    "MultiLineString",
    "MultiSurface",
    "MultiPolygon",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _coords_text(el) -> list[tuple[float, float]]:
    for sub in el.iter():
        t = _local(sub.tag)
        if t in ("pos", "posList"):
            vals = [float(v) for v in (sub.text or "").split()]
            # srsDimension=3 posLists interleave x y z — a fixed stride
            # of 2 would silently mispair every coordinate after the
            # first (the attribute sits on posList or an ancestor)
            dim = int(sub.get("srsDimension") or el.get("srsDimension") or 2)
            return [
                (vals[i], vals[i + 1]) for i in range(0, len(vals) - dim + 1, dim)
            ]
        if t == "coordinates":
            out = []
            for tok in (sub.text or "").split():
                parts = tok.split(",")
                out.append((float(parts[0]), float(parts[1])))
            return out
    return []


def _rings_of_polygon(el) -> list[list[tuple[float, float]]]:
    exterior: list = []
    holes: list = []
    for sub in el.iter():
        t = _local(sub.tag)
        if t in ("exterior", "outerBoundaryIs"):
            exterior = _coords_text(sub)
        elif t in ("interior", "innerBoundaryIs"):
            holes.append(_coords_text(sub))
    rings = ([exterior] if exterior else []) + [h for h in holes if h]
    return rings


def _geom_of(el) -> tuple[int, list] | None:
    t = _local(el.tag)
    if t == "Point":
        c = _coords_text(el)
        return (WKB_POINT, [c[0]]) if c else None
    if t == "LineString":
        c = _coords_text(el)
        return (WKB_LINESTRING, c) if c else None
    if t == "Polygon":
        rings = _rings_of_polygon(el)
        return (WKB_POLYGON, rings) if rings else None
    if t == "MultiPoint":
        kids = [
            (WKB_POINT, [c[0]])
            for sub in el.iter()
            if _local(sub.tag) == "Point" and (c := _coords_text(sub))
        ]
        return (WKB_MULTIPOINT, kids) if kids else None
    if t in ("MultiCurve", "MultiLineString"):
        kids = [
            (WKB_LINESTRING, c)
            for sub in el.iter()
            if _local(sub.tag) == "LineString" and (c := _coords_text(sub))
        ]
        return (WKB_MULTILINESTRING, kids) if kids else None
    if t in ("MultiSurface", "MultiPolygon"):
        kids = [
            (WKB_POLYGON, r)
            for sub in el.iter()
            if _local(sub.tag) == "Polygon" and (r := _rings_of_polygon(sub))
        ]
        return (WKB_MULTIPOLYGON, kids) if kids else None
    return None


def read_gml(spark: SparkSession, path: str) -> DataFrame:
    """One row per feature member: (feature, properties JSON, WKB)."""
    root = ET.parse(path).getroot()
    rows = []
    for member in root.iter():
        if _local(member.tag) not in ("featureMember", "member"):
            continue
        for feature in list(member):
            props: dict[str, str] = {}
            geom = None
            for child in list(feature):
                g_el = None
                if _local(child.tag) in _GEOM_TAGS:
                    g_el = child
                else:
                    g_el = next(
                        (c for c in list(child) if _local(c.tag) in _GEOM_TAGS), None
                    )
                if g_el is not None:
                    geom = _geom_of(g_el)
                elif child.text and child.text.strip() and not list(child):
                    props[_local(child.tag)] = child.text.strip()
            rows.append(
                (
                    _local(feature.tag),
                    json.dumps(props),
                    None if geom is None else _pack(*geom),
                )
            )
    return spark.createDataFrame(
        rows, "feature string, properties string, geometry binary"
    )
