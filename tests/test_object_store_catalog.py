"""Object-store catalog (catalog.json publish + discovery) — parity
with object_store_catalog.c: exact field names, max-age cadence,
fresh reads, and mounting a discovered table through the external
Iceberg scanner."""

from __future__ import annotations

import json
import time

import pytest

from pg_lake_spark.lakehouse.object_store_catalog import ObjectStoreCatalog


def _export_table(spark, tmp_path, name, n):
    from pg_lake_spark.lakehouse.iceberg_meta import export_iceberg
    from pg_lake_spark.lakehouse.table import LakeTable

    loc = str(tmp_path / name)
    t = LakeTable.create_from_dataframe(
        spark, loc, spark.range(n).selectExpr("id AS k")
    )
    export_iceberg(t)
    return loc


def test_push_and_file_shape(spark, tmp_path):
    cat = ObjectStoreCatalog(str(tmp_path / "store"), name="db1")
    loc = _export_table(spark, tmp_path, "t1", 7)
    cat.register("public", "t1", loc)
    path = cat.push()
    doc = json.load(open(path))
    # the reference's exact field names
    assert set(doc) == {"catalog-snapshot-time", "tables"}
    assert doc["catalog-snapshot-time"].endswith("Z")
    assert doc["tables"] == [
        {"metadata-location": loc, "table-name": "t1", "namespace": "public"}
    ]


def test_max_age_cadence(spark, tmp_path):
    cat = ObjectStoreCatalog(str(tmp_path / "store"), max_age_s=30.0)
    cat.register("ns", "a", "/x/a")
    assert cat.push_if_stale() is True  # first export always happens
    cat.register("ns", "b", "/x/b")
    assert cat.push_if_stale() is False  # within max_age: held back
    cat._last_push -= 31.0  # age the last push past the window
    assert cat.push_if_stale() is True
    assert cat.push_if_stale() is False  # clean: nothing to export
    names = {t["table-name"] for t in cat.list_tables()}
    assert names == {"a", "b"}
    cat.unregister("ns", "a")
    cat._last_push -= 31.0
    assert cat.push_if_stale() is True
    assert {t["table-name"] for t in cat.list_tables()} == {"b"}


def test_discovery_and_scan_foreign_catalog(spark, tmp_path):
    """A second engine reads the pushed catalog.json and scans the
    discovered table end-to-end."""
    loc = _export_table(spark, tmp_path, "facts", 25)
    publisher = ObjectStoreCatalog(str(tmp_path / "store"), name="prod")
    publisher.register("analytics", "facts", loc)
    catalog_file = publisher.push()

    consumer = ObjectStoreCatalog(str(tmp_path / "other"), name="reader")
    assert (
        consumer.metadata_location("analytics", "facts", catalog_file) == loc
    )
    df = consumer.scan(spark, "analytics", "facts", catalog_file)
    assert sorted(r.k for r in df.collect()) == list(range(25))
    with pytest.raises(KeyError, match="nope"):
        consumer.metadata_location("analytics", "nope", catalog_file)


def test_reads_are_fresh(spark, tmp_path):
    cat = ObjectStoreCatalog(str(tmp_path / "store"))
    cat.register("ns", "t", "/loc1")
    cat.push()
    assert cat.list_tables()[0]["metadata-location"] == "/loc1"
    # out-of-band change (another engine rewrote the file) is seen
    doc = json.load(open(cat.catalog_path))
    doc["tables"][0]["metadata-location"] = "/loc2"
    json.dump(doc, open(cat.catalog_path, "w"))
    assert cat.list_tables()[0]["metadata-location"] == "/loc2"
