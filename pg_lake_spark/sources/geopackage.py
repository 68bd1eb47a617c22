"""Dependency-free GeoPackage (.gpkg) reader — stdlib sqlite3 + WKB.

The reference reads GeoPackage through GDAL (docs/file-formats-
reference.md: `.gpkg | Geopackage | inferred`). A .gpkg is just SQLite
with OGC-specified metadata tables, so no GDAL is needed:

- ``gpkg_contents`` lists feature tables (data_type='features');
- ``gpkg_geometry_columns`` names each table's geometry column;
- geometry values are GPKG blobs (OGC GeoPackage §2.1.3 'GeoPackage
  Binary Format'): magic 'GP', version, flags (endianness, envelope
  size, empty bit), srs_id, optional envelope doubles, then standard
  WKB — which this engine's spatial slice consumes directly.

Scale: one SQLite file is single-node by construction (same funnel the
reference's GDAL path has); convert once to (Geo)Parquet for real scale.
"""

from __future__ import annotations

import sqlite3
import struct

from pyspark.sql import DataFrame, SparkSession

#: flags bits 1-3: envelope indicator → envelope double count
_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def _gpkg_blob_to_wkb(blob: bytes) -> bytes | None:
    if blob is None:
        return None
    if len(blob) < 8 or blob[0:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob (bad magic)")
    flags = blob[3]
    # flags byte (OGC GeoPackage §2.1.3): RRXYEEEB — bit 5 (X) is the
    # EXTENDED-binary type, bit 4 (Y) the empty flag. These were
    # swapped: extended blobs silently read as NULL and empty-flagged
    # blobs were handed to the WKB parser.
    if flags & 0b100000:
        raise NotImplementedError(
            "ExtendedGeoPackageBinary geometry (flags bit 5) is not "
            "supported — only StandardGeoPackageBinary WKB"
        )
    if flags & 0b10000:  # empty-geometry bit
        return None
    env = (flags >> 1) & 0b111
    if env not in _ENVELOPE_DOUBLES:
        raise ValueError(f"invalid GeoPackage envelope indicator {env}")
    off = 8 + 8 * _ENVELOPE_DOUBLES[env]
    return blob[off:]


def list_feature_tables(path: str) -> list[str]:
    with sqlite3.connect(path) as con:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features' "
            "ORDER BY table_name"
        ).fetchall()
    return [r[0] for r in rows]


_AFFINITY_TO_SPARK = {
    "INTEGER": "bigint",
    "INT": "bigint",
    "MEDIUMINT": "bigint",
    "SMALLINT": "bigint",
    "TINYINT": "bigint",
    "BOOLEAN": "boolean",
    "REAL": "double",
    "DOUBLE": "double",
    "FLOAT": "double",
    "TEXT": "string",
    "DATE": "string",
    "DATETIME": "string",
    "BLOB": "binary",
}


def read_geopackage(
    spark: SparkSession, path: str, table: str | None = None
) -> DataFrame:
    """One feature table (default: the only/first one) as a DataFrame:
    attribute columns + ``geometry`` (plain WKB, st_*-ready)."""
    tables = list_feature_tables(path)
    if not tables:
        raise ValueError(f"no feature tables in {path}")
    if table is None:
        table = tables[0]
    elif table not in tables:
        raise ValueError(f"feature table {table!r} not in {tables}")
    with sqlite3.connect(path) as con:
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (table,),
        ).fetchone()
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        attr_cols = [
            (name, _AFFINITY_TO_SPARK.get(dtype.split("(")[0].upper(), "string"))
            for _cid, name, dtype, _nn, _dflt, _pk in info
            if name != geom_col
        ]
        sel = ", ".join([f'"{n}"' for n, _ in attr_cols] + [f'"{geom_col}"'])
        raw = con.execute(f'SELECT {sel} FROM "{table}"').fetchall()
    rows = [(*r[:-1], _gpkg_blob_to_wkb(r[-1])) for r in raw]
    ddl = ", ".join([f"`{n}` {t}" for n, t in attr_cols] + ["geometry binary"])
    return spark.createDataFrame(rows, ddl)
