"""Dependency-free KML/KMZ reader — stdlib xml.etree + the WKB slice.

Reference: GDAL's KML driver (docs/file-formats-reference.md: `.kml
.kmz | Key-Hole Markup Language`). KML is plain XML: Placemarks carry a
name, optional ExtendedData key/values, and one geometry element
(Point / LineString / Polygon / MultiGeometry) whose ``coordinates``
text is ``lon,lat[,alt]`` whitespace-separated tuples. A .kmz is a zip
whose first ``*.kml`` member is the document.

Output: one row per Placemark — ``name`` string, ``extended`` JSON
string of ExtendedData, ``geometry`` WKB. Altitude is dropped (2D
engine). Single-node parse like every GDAL-funnel format; convert to
(Geo)Parquet at scale.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.functions.spatial import (
    WKB_LINESTRING,
    WKB_POINT,
    WKB_POLYGON,
    _pack,
    _pack_linestring,
    _pack_point,
    _pack_polygon,
)

_MULTI_OF = {WKB_POINT: 4, WKB_LINESTRING: 5, WKB_POLYGON: 6}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _coords(text: str) -> list[tuple[float, float]]:
    out = []
    for tok in (text or "").split():
        parts = tok.split(",")
        out.append((float(parts[0]), float(parts[1])))
    return out


def _geom_of(el) -> tuple[int, list] | None:
    tag = _local(el.tag)
    if tag == "Point":
        c = _coords(_find_text(el, "coordinates"))
        return (WKB_POINT, [c[0]]) if c else None
    if tag == "LineString":
        c = _coords(_find_text(el, "coordinates"))
        return (WKB_LINESTRING, c) if c else None
    if tag == "Polygon":
        rings = []
        for sub in el.iter():
            if _local(sub.tag) in ("outerBoundaryIs", "innerBoundaryIs"):
                ring = _coords(_find_text(sub, "coordinates"))
                if ring:
                    if _local(sub.tag) == "outerBoundaryIs":
                        rings.insert(0, ring)
                    else:
                        rings.append(ring)
        return (WKB_POLYGON, rings) if rings else None
    if tag == "MultiGeometry":
        kids = []
        for sub in list(el):
            g = _geom_of(sub)
            if g is not None:
                kids.append(g)
        if not kids:
            return None
        kinds = {kt for kt, _ in kids}
        if len(kinds) == 1:
            return (_MULTI_OF[next(iter(kinds))], kids)
        raise ValueError("mixed-type MultiGeometry is not supported")
    return None


def _find_text(el, local_name: str) -> str:
    for sub in el.iter():
        if _local(sub.tag) == local_name:
            return sub.text or ""
    return ""


def _kml_root(path: str):
    if path.lower().endswith(".kmz"):
        with zipfile.ZipFile(path) as zf:
            member = next(
                (m for m in zf.namelist() if m.lower().endswith(".kml")), None
            )
            if member is None:
                raise FileNotFoundError(f"no .kml member in {path}")
            return ET.fromstring(zf.read(member))
    return ET.parse(path).getroot()


def read_kml(spark: SparkSession, path: str) -> DataFrame:
    """One row per Placemark: (name, extended JSON, geometry WKB)."""
    root = _kml_root(path)
    rows = []
    for pm in root.iter():
        if _local(pm.tag) != "Placemark":
            continue
        name = None
        ext: dict[str, str] = {}
        geom = None
        for child in list(pm):
            tag = _local(child.tag)
            if tag == "name":
                name = (child.text or "").strip() or None
            elif tag == "ExtendedData":
                for d in child.iter():
                    if _local(d.tag) == "Data":
                        ext[d.get("name", "")] = _find_text(d, "value").strip()
            else:
                g = _geom_of(child)
                if g is not None:
                    geom = g
        rows.append(
            (name, json.dumps(ext), None if geom is None else _pack(*geom))
        )
    return spark.createDataFrame(
        rows, "name string, extended string, geometry binary"
    )
