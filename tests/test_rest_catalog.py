"""Iceberg REST catalog interop: a real HTTP server (stdlib, in-process
thread) serves the catalog API over an exported LakeTable; the client
lists namespaces/tables and scans — through both the inline-metadata
and metadata-location shapes of LoadTableResult.

Reference parity: pg_lake_iceberg/src/test/rest_catalog.c and
test_common/rest_catalog/ (the reference's REST-served catalog tests).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

import pytest

from pg_lake_spark.lakehouse.rest_catalog import RestCatalog
from pg_lake_spark.lakehouse.table import LakeTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class _CatalogHandler(BaseHTTPRequestHandler):
    """Routes the read surface of the Iceberg REST catalog spec."""

    routes: dict[str, dict] = {}
    auth_required: str | None = None

    def do_GET(self):  # noqa: N802 (stdlib API)
        if self.auth_required and self.headers.get("Authorization") != self.auth_required:
            self.send_response(401)
            self.end_headers()
            return
        body = self.routes.get(unquote(self.path))
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        payload = json.dumps(body).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # silence request logging
        pass


@pytest.fixture()
def rest_server(spark, tmp_path):
    """An exported LakeTable served over a live REST catalog API."""
    t = LakeTable.create(spark, str(tmp_path / "rest_t"), "id bigint, name string")
    t.append(
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(12)], "id bigint, name string"
        )
    )
    meta_path = t.export_iceberg()
    meta = json.load(open(meta_path))

    ns = "analytics"
    _CatalogHandler.auth_required = None
    _CatalogHandler.routes = {
        "/v1/config": {"defaults": {}, "overrides": {}},
        "/v1/namespaces": {"namespaces": [[ns]]},
        f"/v1/namespaces/{ns}/tables": {
            "identifiers": [
                {"namespace": [ns], "name": "events_inline"},
                {"namespace": [ns], "name": "events_by_location"},
            ]
        },
        # LoadTableResult with the full metadata document inline
        f"/v1/namespaces/{ns}/tables/events_inline": {
            "metadata-location": meta_path,
            "metadata": meta,
        },
        # LoadTableResult pointing at the metadata file only
        f"/v1/namespaces/{ns}/tables/events_by_location": {
            "metadata-location": meta_path
        },
    }
    server = ThreadingHTTPServer(("127.0.0.1", 0), _CatalogHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", t
    finally:
        server.shutdown()
        thread.join()


def test_list_and_scan_inline_metadata(spark, rest_server):
    uri, t = rest_server
    cat = RestCatalog(uri)
    assert cat.list_namespaces() == ["analytics"]
    assert cat.list_tables("analytics") == ["events_inline", "events_by_location"]
    got = cat.scan(spark, "analytics", "events_inline")
    assert got.columns == ["id", "name"]
    assert _rows(got) == _rows(t.to_df())


def test_scan_via_metadata_location(spark, rest_server):
    uri, t = rest_server
    got = RestCatalog(uri).scan(spark, "analytics", "events_by_location")
    assert _rows(got) == _rows(t.to_df())


def test_scan_with_filter_and_time_travel(spark, rest_server):
    uri, _t = rest_server
    cat = RestCatalog(uri)
    got = cat.scan(spark, "analytics", "events_inline", where="id < 3")
    assert got.count() == 3
    snap1 = cat.scan(spark, "analytics", "events_inline", snapshot_id=1)
    assert snap1.count() == 12


def test_bearer_token_sent(spark, rest_server):
    uri, t = rest_server
    _CatalogHandler.auth_required = "Bearer sekrit"
    try:
        # no token → 401 surfaces as HTTPError
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            RestCatalog(uri, prefix="").load_table("analytics", "events_inline")
        got = RestCatalog(uri, token="sekrit", prefix="").scan(
            spark, "analytics", "events_inline"
        )
        assert _rows(got) == _rows(t.to_df())
    finally:
        _CatalogHandler.auth_required = None


def test_session_facade(spark, rest_server):
    from pg_lake_spark.session import LakeSession

    uri, t = rest_server
    sess = LakeSession(spark)
    sess.register_rest_table("rest_events", uri, "analytics", "events_inline")
    n = sess.sql("SELECT count(*) AS n FROM rest_events").collect()[0].n
    assert n == 12
