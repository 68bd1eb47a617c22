"""Dependency-free OpenDRIVE ``.xodr`` reader (road reference lines).

Reference: GDAL's XODR driver row in docs/file-formats-reference.md
(`.xodr | OpenDRIVE Road Description Format`). OpenDRIVE is XML; each
``<road>`` carries a ``<planView>`` of ``<geometry>`` records (start
point ``x,y``, heading ``hdg``, ``length``) whose child element selects
the primitive:

- ``<line/>``      — straight segment (exact endpoints)
- ``<arc/>``       — constant curvature (sampled along the circle)
- ``<spiral/>``    — linear curvature transition (Euler-step sampled)
- ``<poly3/>``     — cubic in local (u,v) frame (sampled)

Each road becomes one row: (road_id, name, length, geometry LINESTRING
WKB of the sampled reference line). stdlib ``xml.etree`` parse,
single-node like the other GDAL-funnel formats.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.functions.spatial import _pack_linestring


def _sample_geometry(g: ET.Element, step: float) -> list[tuple[float, float]]:
    x = float(g.get("x", 0))
    y = float(g.get("y", 0))
    hdg = float(g.get("hdg", 0))
    length = float(g.get("length", 0))
    n = max(1, int(math.ceil(length / step)))
    child = next(iter(g), None)
    kind = child.tag if child is not None else "line"

    if kind == "line":
        return [
            (x + s * math.cos(hdg), y + s * math.sin(hdg))
            for s in (0.0, length)
        ]
    pts = []
    if kind == "arc":
        k = float(child.get("curvature", 0))
        for i in range(n + 1):
            s = length * i / n
            if k == 0:
                pts.append((x + s * math.cos(hdg), y + s * math.sin(hdg)))
            else:
                h = hdg + k * s
                pts.append(
                    (
                        x + (math.sin(h) - math.sin(hdg)) / k,
                        y - (math.cos(h) - math.cos(hdg)) / k,
                    )
                )
        return pts
    if kind == "spiral":
        k0 = float(child.get("curvStart", 0))
        k1 = float(child.get("curvEnd", 0))
        # Euler integration of the clothoid (curvature linear in s)
        cx, cy, h = x, y, hdg
        pts = [(cx, cy)]
        ds = length / n
        for i in range(n):
            s_mid = (i + 0.5) * ds
            k = k0 + (k1 - k0) * s_mid / length if length else k0
            h_mid = h + k * ds / 2
            cx += ds * math.cos(h_mid)
            cy += ds * math.sin(h_mid)
            h += k * ds
            pts.append((cx, cy))
        return pts
    if kind == "poly3":
        a, b = float(child.get("a", 0)), float(child.get("b", 0))
        c, d = float(child.get("c", 0)), float(child.get("d", 0))
        cos_h, sin_h = math.cos(hdg), math.sin(hdg)
        for i in range(n + 1):
            u = length * i / n
            v = a + b * u + c * u * u + d * u * u * u
            pts.append((x + u * cos_h - v * sin_h, y + u * sin_h + v * cos_h))
        return pts
    raise ValueError(f"unsupported OpenDRIVE geometry primitive <{kind}>")


def read_xodr(spark: SparkSession, path: str, *, step: float = 5.0) -> DataFrame:
    root = ET.parse(path).getroot()
    rows: list[tuple] = []
    for road in root.iter("road"):
        plan = road.find("planView")
        if plan is None:
            continue
        coords: list[tuple[float, float]] = []
        for g in plan.findall("geometry"):
            seg = _sample_geometry(g, step)
            if coords and coords[-1] == seg[0]:
                seg = seg[1:]
            coords.extend(seg)
        if len(coords) < 2:
            continue
        rows.append(
            (
                road.get("id", ""),
                road.get("name") or None,
                float(road.get("length", 0)),
                _pack_linestring(coords),
            )
        )
    return spark.createDataFrame(
        rows, "road_id string, name string, length double, geometry binary"
    )
