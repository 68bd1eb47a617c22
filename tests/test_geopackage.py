"""GeoPackage reader tests: a spec-shaped .gpkg built with stdlib
sqlite3 (gpkg_contents/gpkg_geometry_columns + GP geometry blobs with
and without envelopes), read back through the spatial slice."""

from __future__ import annotations

import sqlite3
import struct

import pytest

from pg_lake_spark.functions import spatial as S
from pg_lake_spark.sources.geopackage import list_feature_tables, read_geopackage


def _gp_blob(wkb: bytes, envelope: list[float] | None = None, empty: bool = False) -> bytes:
    flags = 0b1  # little-endian header
    if envelope:
        flags |= 1 << 1  # envelope indicator 1 (xy)
    if empty:
        flags |= 1 << 4  # bit 4 = empty (bit 5 is the EXTENDED type flag)
    out = b"GP" + bytes([0, flags]) + struct.pack("<i", 4326)
    if envelope:
        out += struct.pack("<4d", *envelope)
    return out + wkb


def _build_gpkg(path: str):
    con = sqlite3.connect(path)
    con.executescript(
        """
        CREATE TABLE gpkg_contents (
            table_name TEXT PRIMARY KEY, data_type TEXT, identifier TEXT,
            srs_id INTEGER);
        CREATE TABLE gpkg_geometry_columns (
            table_name TEXT, column_name TEXT, geometry_type_name TEXT,
            srs_id INTEGER, z TINYINT, m TINYINT);
        CREATE TABLE cities (
            fid INTEGER PRIMARY KEY, name TEXT, pop INTEGER,
            ratio DOUBLE, geom BLOB);
        INSERT INTO gpkg_contents VALUES
            ('cities', 'features', 'cities', 4326),
            ('notes', 'attributes', 'notes', 0);
        INSERT INTO gpkg_geometry_columns VALUES
            ('cities', 'geom', 'POINT', 4326, 0, 0);
        """
    )
    pts = [
        (1, "ams", 900, 1.5, _gp_blob(S._pack_point(4.9, 52.4))),
        (2, "ber", 3700, 2.25, _gp_blob(S._pack_point(13.4, 52.5), envelope=[13.4, 13.4, 52.5, 52.5])),
        (3, "nowhere", None, None, _gp_blob(b"", empty=True)),
    ]
    con.executemany("INSERT INTO cities VALUES (?,?,?,?,?)", pts)
    con.commit()
    con.close()


def test_geopackage_roundtrip(spark, tmp_path):
    g = str(tmp_path / "cities.gpkg")
    _build_gpkg(g)
    assert list_feature_tables(g) == ["cities"]  # attributes table excluded
    df = read_geopackage(spark, g)
    assert df.columns == ["fid", "name", "pop", "ratio", "geometry"]
    assert dict(df.dtypes)["pop"] == "bigint" and dict(df.dtypes)["ratio"] == "double"
    rows = df.select(
        "name", "pop", S.st_astext("geometry").alias("wkt")
    ).orderBy("fid").collect()
    assert [(r.name, r.pop, r.wkt) for r in rows] == [
        ("ams", 900, "POINT(4.9 52.4)"),
        ("ber", 3700, "POINT(13.4 52.5)"),  # envelope skipped correctly
        ("nowhere", None, None),  # empty-geometry bit → NULL
    ]
    with pytest.raises(ValueError, match="not in"):
        read_geopackage(spark, g, table="missing")


def test_geopackage_rejects_bad_blob(spark, tmp_path):
    from pg_lake_spark.sources.geopackage import _gpkg_blob_to_wkb

    with pytest.raises(ValueError, match="bad magic"):
        _gpkg_blob_to_wkb(b"XX\x00\x01aaaa....")


def test_layer_option_selects_feature_table(spark, tmp_path):
    """docs/file-formats-reference.md GDAL option `layer` routes to the
    GeoPackage feature table through read_lake."""
    import sqlite3 as _sq

    from pg_lake_spark.sources.readers import read_lake

    p = str(tmp_path / "two.gpkg")
    _build_gpkg(p)
    with _sq.connect(p) as con:
        con.execute("CREATE TABLE beta AS SELECT * FROM cities WHERE fid = 1")
        con.execute(
            "INSERT INTO gpkg_contents VALUES ('beta', 'features', 'beta', 4326)"
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES ('beta', 'geom', 'POINT', 4326, 0, 0)"
        )
        con.commit()
    assert read_lake(spark, p, fmt="gpkg", layer="beta").count() == 1
    assert read_lake(spark, p, fmt="gpkg", layer="cities").count() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="layer"):
        read_lake(spark, p, fmt="parquet", layer="x")


def test_gpkg_gz_reads_through_umbrella(spark, tmp_path):
    """file-formats-reference.md lists `.gpkg.gz` with inference: the
    umbrella sniffs through the .gz suffix and the driver-side SQLite
    parse reads a transparently-decompressed copy."""
    import gzip

    from pg_lake_spark.sources.readers import read_lake

    g = str(tmp_path / "cities.gpkg")
    _build_gpkg(g)
    gz = str(tmp_path / "cities.gpkg.gz")
    with open(g, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    df = read_lake(spark, gz, fmt="gdal")
    assert df.count() == 3 and "geometry" in df.columns


def test_extended_binary_refused(spark, tmp_path):
    """Bit 5 of the flags byte marks ExtendedGeoPackageBinary, NOT
    empty (that's bit 4) — extended blobs must refuse loudly instead of
    silently reading as NULL (r14 review, OGC GPKG spec 2.1.3)."""
    import pytest

    from pg_lake_spark.sources.geopackage import _gpkg_blob_to_wkb

    blob = b"GP" + bytes([0, 0b100001]) + struct.pack("<i", 4326) + b"\x01"
    with pytest.raises(NotImplementedError, match="Extended"):
        _gpkg_blob_to_wkb(blob)
    # bit 4 = empty → NULL
    empty = b"GP" + bytes([0, 0b10001]) + struct.pack("<i", 4326)
    assert _gpkg_blob_to_wkb(empty) is None
