"""MapInfo TAB dataset reader — the dependency-free slice.

Reference: GDAL's MapInfo driver behind ``format 'gdal'``
(docs/file-formats-reference.md: `.mif .mit .tab | MapInfo datasets`).
A ``.tab`` dataset is a TEXT control file plus sidecars:

- ``.dat`` — the attribute table. ``Type DBF`` datasets use a plain
  xBase/dBASE III file (open spec; the same layout as a shapefile's
  ``.dbf`` sidecar, parsed by :func:`shapefile._parse_dbf`).
  ``Type NATIVE`` datasets store numerics in MapInfo's own binary
  field encodings, which have no published byte-level specification —
  those refuse loudly rather than risk silently misread values.
- ``.map``/``.id`` — binary geometry. Also unpublished; a dataset that
  carries geometry refuses loudly and names the GDAL fallback
  (matching the repo's closed-binary-format policy; the TEXT
  interchange twin ``.mif`` is fully supported in sources/mif.py).

So the supported slice is exactly the openly-specified one: MapInfo
ATTRIBUTE tables declared ``Type DBF`` — a real and common case
(MapInfo "data tables" have no geometry at all).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def _parse_tab_control(path: str) -> dict:
    """Parse the ``.tab`` text control file: table type, declared
    fields, charset."""
    with open(path, "r", encoding="latin-1") as fh:
        text = fh.read()
    m = re.search(r"(?im)^\s*Type\s+(\w+)", text)
    ttype = (m.group(1) if m else "NATIVE").upper()
    fields = []
    nfields = None
    fm = re.search(r"(?is)Fields\s+(\d+)\s*\n(.*)", text)
    if fm:
        nfields = int(fm.group(1))
        for line in fm.group(2).splitlines():
            line = line.strip().rstrip(";").strip()
            if not line:
                continue
            fdef = re.match(r"(\w+)\s+(\w+)", line)
            if fdef and len(fields) < nfields:
                fields.append((fdef.group(1), fdef.group(2).lower()))
    return {"type": ttype, "fields": fields, "nfields": nfields}


def _sibling(path: str, ext: str) -> str | None:
    base = os.path.splitext(path)[0]
    for cand in (base + ext, base + ext.upper()):
        if os.path.exists(cand):
            return cand
    return None


def read_tab(spark: SparkSession, path: str) -> DataFrame:
    """Read a MapInfo ``.tab`` attribute dataset (Type DBF)."""
    ctl = _parse_tab_control(path)
    if _sibling(path, ".map"):
        raise NotImplementedError(
            f"{path}: .tab dataset carries binary .map geometry, which "
            "has no published specification — convert with GDAL "
            "(ogr2ogr) or export the TEXT twin (.mif), which reads "
            "natively"
        )
    dat = _sibling(path, ".dat")
    if dat is None:
        raise FileNotFoundError(f"{path}: no sibling .dat attribute file")
    if ctl["type"] != "DBF":
        raise NotImplementedError(
            f"{path}: Type {ctl['type']} stores fields in MapInfo's "
            "unpublished binary encodings; only Type DBF (open xBase "
            "layout) reads dependency-free — convert with GDAL or "
            "re-export as Type DBF / .mif"
        )
    from pg_lake_spark.sources.shapefile import _parse_dbf

    fields, rows = _parse_dbf(dat)
    if ctl["nfields"] is not None and ctl["nfields"] != len(fields):
        raise ValueError(
            f"{path}: control file declares {ctl['nfields']} fields "
            f"but .dat carries {len(fields)}"
        )
    schema = ", ".join(f"`{n}` {t}" for n, t in fields)
    norm = [
        [float(v) if t == "double" and v is not None else v
         for v, (_n, t) in zip(r, fields)]
        for r in rows
    ]
    return spark.createDataFrame(norm, schema)
