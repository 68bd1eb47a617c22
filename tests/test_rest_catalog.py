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


# ---------------------------------------------------------------------------
# Write-through: a stateful in-process catalog (create/commit/register/drop
# with spec requirement validation) — parity with the reference's commit
# path through the catalog (pg_lake_iceberg/src/rest_catalog/).
# ---------------------------------------------------------------------------


class _WritableCatalogHandler(BaseHTTPRequestHandler):
    tables: dict[tuple[str, str], dict] = {}
    namespaces: set = set()

    def _send(self, code: int, body: dict | None = None):
        payload = json.dumps(body or {}).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n).decode("utf-8")) if n else {}

    def do_GET(self):  # noqa: N802
        path = unquote(self.path)
        if path == "/v1/config":
            return self._send(200, {"defaults": {}, "overrides": {}})
        if path == "/v1/namespaces":
            return self._send(200, {"namespaces": [[n] for n in sorted(self.namespaces)]})
        parts = path.strip("/").split("/")
        if len(parts) == 4 and parts[:2] == ["v1", "namespaces"] and parts[3] == "tables":
            ns = parts[2]
            idents = [
                {"namespace": [n], "name": t}
                for (n, t) in sorted(self.tables)
                if n == ns
            ]
            return self._send(200, {"identifiers": idents})
        if len(parts) == 5 and parts[3] == "tables":
            key = (parts[2], parts[4])
            if key not in self.tables:
                return self._send(404, {"error": "no such table"})
            md = self.tables[key]
            return self._send(200, {"metadata-location": "inline://", "metadata": md})
        return self._send(404, {})

    def do_POST(self):  # noqa: N802
        path = unquote(self.path)
        parts = path.strip("/").split("/")
        body = self._body()
        if path == "/v1/namespaces":
            self.namespaces.add(body["namespace"][0])
            return self._send(200, {"namespace": body["namespace"], "properties": {}})
        if len(parts) == 4 and parts[3] == "tables":  # CreateTableRequest
            ns = parts[2]
            key = (ns, body["name"])
            if key in self.tables:
                return self._send(409, {"error": "table exists"})
            self.namespaces.add(ns)
            md = {
                "format-version": 2,
                "table-uuid": f"srv-{len(self.tables)}",
                "location": body.get("location") or f"mem://{ns}/{body['name']}",
                "schemas": [body["schema"]],
                "current-schema-id": body["schema"].get("schema-id", 0),
                "snapshots": [],
                "current-snapshot-id": None,
                "properties": body.get("properties") or {},
                "last-sequence-number": 0,
            }
            self.tables[key] = md
            return self._send(200, {"metadata-location": "inline://", "metadata": md})
        if len(parts) == 4 and parts[3] == "register":
            ns = parts[2]
            with open(body["metadata-location"]) as fh:
                md = json.load(fh)
            self.tables[(ns, body["name"])] = md
            return self._send(200, {"metadata-location": body["metadata-location"], "metadata": md})
        if len(parts) == 5 and parts[3] == "tables":  # CommitTableRequest
            key = (parts[2], parts[4])
            if key not in self.tables:
                return self._send(404, {"error": "no such table"})
            md = self.tables[key]
            for r in body.get("requirements", []):
                if r["type"] == "assert-ref-snapshot-id":
                    if md.get("current-snapshot-id") != r.get("snapshot-id"):
                        return self._send(409, {"error": "ref main moved"})
                elif r["type"] == "assert-table-uuid":
                    if md.get("table-uuid") != r.get("uuid"):
                        return self._send(409, {"error": "uuid mismatch"})
            for u in body.get("updates", []):
                if u["action"] == "add-snapshot":
                    md["snapshots"].append(u["snapshot"])
                    # real catalogs advance last-sequence-number with
                    # each committed snapshot (publish's ahead/stale
                    # tiebreak depends on it)
                    md["last-sequence-number"] = max(
                        md.get("last-sequence-number") or 0,
                        u["snapshot"].get("sequence-number") or 0,
                    )
                elif u["action"] == "set-snapshot-ref":
                    md["current-snapshot-id"] = u["snapshot-id"]
                elif u["action"] == "set-properties":
                    md["properties"].update(u.get("updates") or {})
            return self._send(200, {"metadata-location": "inline://", "metadata": md})
        return self._send(404, {})

    def do_DELETE(self):  # noqa: N802
        parts = unquote(self.path).strip("/").split("/")
        if len(parts) == 5 and parts[3] == "tables":
            if self.tables.pop((parts[2], parts[4]), None) is None:
                return self._send(404, {})
            return self._send(204, None)
        return self._send(404, {})

    def log_message(self, *args):
        pass


@pytest.fixture()
def writable_server():
    _WritableCatalogHandler.tables = {}
    _WritableCatalogHandler.namespaces = set()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _WritableCatalogHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        thread.join()


def test_publish_create_then_rescan(spark, tmp_path, writable_server):
    """Write-through: export a LakeTable, publish into the catalog
    (create + commit snapshots), re-scan THROUGH the catalog."""
    from pg_lake_spark.lakehouse.rest_catalog import RestCommitConflict

    t = LakeTable.create(spark, str(tmp_path / "wt"), "id bigint, name string")
    t.append(spark.createDataFrame([(i, f"n{i}") for i in range(10)], "id bigint, name string"))
    meta = json.load(open(t.export_iceberg()))

    cat = RestCatalog(writable_server)
    cat.create_namespace("prod")
    cat.publish("prod", "events", meta)
    assert cat.list_tables("prod") == ["events"]
    got = cat.scan(spark, "prod", "events")
    assert _rows(got) == _rows(t.to_df())

    # incremental publish: append → export → publish commits ONLY the new
    # snapshot and moves main
    t.append(spark.createDataFrame([(100, "x")], "id bigint, name string"))
    meta2 = json.load(open(t.export_iceberg()))
    cat.publish("prod", "events", meta2)
    served = cat.load_table("prod", "events")["metadata"]
    assert len(served["snapshots"]) == len(meta2["snapshots"])
    assert served["current-snapshot-id"] == meta2["current-snapshot-id"]
    assert _rows(cat.scan(spark, "prod", "events")) == _rows(t.to_df())

    # conflict: a second client whose base ref is stale gets a 409
    with pytest.raises(RestCommitConflict):
        cat.commit_table(
            "prod",
            "events",
            [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 999}],
            [{"action": "set-snapshot-ref", "ref-name": "main", "type": "branch",
              "snapshot-id": 1}],
        )

    # drop through the catalog
    cat.drop_table("prod", "events")
    assert cat.list_tables("prod") == []


def test_publish_stale_export_conflicts_not_rolls_back(spark, tmp_path, writable_server):
    """r14 review: a publish from an export that has never seen the
    catalog's current snapshot must raise RestCommitConflict — NOT move
    'main' backwards over the other writer's commit."""
    from pg_lake_spark.lakehouse.rest_catalog import RestCommitConflict

    t = LakeTable.create(spark, str(tmp_path / "st"), "id bigint")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    stale = json.load(open(t.export_iceberg()))  # snapshot S1 only

    cat = RestCatalog(writable_server)
    cat.create_namespace("prod")
    cat.publish("prod", "t", stale)
    # another writer commits S2 through the catalog
    t.append(spark.createDataFrame([(2,)], "id bigint"))
    cat.publish("prod", "t", json.load(open(t.export_iceberg())))
    served = cat.load_table("prod", "t")["metadata"]
    s2 = served["current-snapshot-id"]
    # the stale client re-publishes its S1-only export
    with pytest.raises(RestCommitConflict, match="does not contain"):
        cat.publish("prod", "t", stale)
    assert cat.load_table("prod", "t")["metadata"]["current-snapshot-id"] == s2


def test_publish_after_local_expiry_is_not_stale(spark, tmp_path, writable_server):
    """r14 second review: a table that expires snapshots locally
    (max_snapshot_age=0 / VACUUM) legitimately lacks the catalog's
    current snapshot in its export while being AHEAD — publish must
    proceed (last-sequence-number tiebreak), not conflict forever."""
    t = LakeTable.create(spark, str(tmp_path / "ex"), "id bigint")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    cat = RestCatalog(writable_server)
    cat.create_namespace("prod")
    cat.publish("prod", "t", json.load(open(t.export_iceberg())))

    from pg_lake_spark.lakehouse import maintenance

    t.append(spark.createDataFrame([(2,)], "id bigint"))
    maintenance.expire_snapshots(t, max_age_s=0)  # drops S1 locally
    meta2 = json.load(open(t.export_iceberg()))
    served_cur = cat.load_table("prod", "t")["metadata"]["current-snapshot-id"]
    assert served_cur not in {s["snapshot-id"] for s in meta2["snapshots"]}
    cat.publish("prod", "t", meta2)  # must not raise
    assert (
        cat.load_table("prod", "t")["metadata"]["current-snapshot-id"]
        == meta2["current-snapshot-id"]
    )


def test_publish_idempotent_no_commit(spark, tmp_path, writable_server):
    """Re-publishing an already-current export is a no-op (no POST) —
    previously it always issued a set-snapshot-ref commit."""
    t = LakeTable.create(spark, str(tmp_path / "ip"), "id bigint")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    meta = json.load(open(t.export_iceberg()))
    cat = RestCatalog(writable_server)
    cat.create_namespace("prod")
    cat.publish("prod", "t", meta)
    before = cat.load_table("prod", "t")["metadata"]
    out = cat.publish("prod", "t", meta)  # second, identical publish
    assert out.get("metadata", out) == before


def test_publish_against_metadata_location_only_catalog(spark, tmp_path, writable_server):
    """r14 review: a catalog serving only metadata-location (spec-legal)
    must still publish incrementally — known/base_ref come from the
    document at the location, not an empty dict."""
    import pg_lake_spark.lakehouse.rest_catalog as rc

    t = LakeTable.create(spark, str(tmp_path / "ml"), "id bigint")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    meta = json.load(open(t.export_iceberg()))
    cat = RestCatalog(writable_server)
    cat.create_namespace("prod")
    cat.publish("prod", "t", meta)

    # serve metadata-location-only LoadTableResults: the location holds
    # the document the SERVER committed (S1, server uuid) — exactly what
    # a real catalog's metadata-location points at
    served_doc = cat.load_table("prod", "t")["metadata"]
    loc_s1 = str(tmp_path / "served_s1.metadata.json")
    json.dump(served_doc, open(loc_s1, "w"))
    real_load = rc.RestCatalog.load_table

    def location_only(self, namespace, table):
        res = real_load(self, namespace, table)
        if "metadata" in res:
            res = {"metadata-location": loc_s1}
        return res

    t.append(spark.createDataFrame([(2,)], "id bigint"))
    meta2 = json.load(open(t.export_iceberg()))
    try:
        rc.RestCatalog.load_table = location_only
        cat.publish("prod", "t", meta2)  # must not 409 or re-add S1
    finally:
        rc.RestCatalog.load_table = real_load
    served = cat.load_table("prod", "t")["metadata"]
    assert served["current-snapshot-id"] == meta2["current-snapshot-id"]
    assert len(served["snapshots"]) == len(meta2["snapshots"])


def test_create_table_conflict_is_not_commit_conflict(spark, tmp_path, writable_server):
    """409 from CreateTableRequest means AlreadyExists, not 'reload and
    retry the commit' — it must surface as the raw HTTPError."""
    import urllib.error

    t = LakeTable.create(spark, str(tmp_path / "cc"), "id bigint")
    meta = json.load(open(t.export_iceberg()))
    schema = meta["schemas"][0]
    cat = RestCatalog(writable_server)
    cat.create_namespace("prod")
    cat.create_table("prod", "dup", schema)
    with pytest.raises(urllib.error.HTTPError):
        cat.create_table("prod", "dup", schema)


def test_register_table_adopts_metadata(spark, tmp_path, writable_server):
    t = LakeTable.create(spark, str(tmp_path / "reg"), "id bigint, v double")
    t.append(spark.createDataFrame([(1, 1.5), (2, 2.5)], "id bigint, v double"))
    loc = t.export_iceberg()
    cat = RestCatalog(writable_server)
    cat.register_table("adopted", "ext", loc)
    got = cat.scan(spark, "adopted", "ext")
    assert _rows(got) == _rows(t.to_df())


class _OAuthCatalogHandler(BaseHTTPRequestHandler):
    """Server requiring a short-lived OAuth token: /oauth/tokens issues
    them (client-credentials, Basic auth), API paths verify them."""

    issued: list = []
    ttl = 3600

    def _send(self, code, body):
        raw = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def do_POST(self):  # noqa: N802
        if self.path == "/oauth/tokens":
            import base64

            auth = self.headers.get("Authorization", "")
            creds = base64.b64decode(auth.split(" ", 1)[1]).decode()
            if creds != "svc:hunter2":
                self._send(401, {"error": "bad client credentials"})
                return
            n = len(type(self).issued)
            tok = f"tok-{n}"
            type(self).issued.append(tok)
            self._send(200, {"access_token": tok, "expires_in": type(self).ttl})
            return
        self._send(404, {})

    def do_GET(self):  # noqa: N802
        auth = self.headers.get("Authorization", "")
        if not (auth.startswith("Bearer tok-") and auth[7:] in type(self).issued):
            self._send(401, {"error": "missing/invalid token"})
            return
        if self.path == "/v1/config":
            self._send(200, {"defaults": {}, "overrides": {}})
        elif self.path == "/v1/namespaces":
            self._send(200, {"namespaces": [["ns1"]]})
        else:
            self._send(404, {})

    def log_message(self, *args):
        pass


def test_oauth_client_credentials_flow():
    from http.server import HTTPServer
    from threading import Thread

    from pg_lake_spark.lakehouse.rest_catalog import (
        OAuthClientCredentials,
        RestCatalog,
    )

    _OAuthCatalogHandler.issued = []
    srv = HTTPServer(("127.0.0.1", 0), _OAuthCatalogHandler)
    Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        auth = OAuthClientCredentials(
            f"{base}/oauth/tokens", "svc", "hunter2", refresh_margin_s=0.0
        )
        cat = RestCatalog(base, token=auth)
        assert cat.list_namespaces() == ["ns1"]
        assert len(_OAuthCatalogHandler.issued) == 1
        # cached token reused across calls
        cat.list_namespaces()
        assert len(_OAuthCatalogHandler.issued) == 1
        # expiry → transparent refetch
        auth._expiry = 0.0
        cat.list_namespaces()
        assert len(_OAuthCatalogHandler.issued) == 2
        # invalidate() drops the cache like the reference's syscache hook
        auth.invalidate()
        cat.list_namespaces()
        assert len(_OAuthCatalogHandler.issued) == 3
        # wrong secret fails loudly
        bad = OAuthClientCredentials(f"{base}/oauth/tokens", "svc", "wrong")
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            RestCatalog(base, token=bad, prefix="").list_namespaces()
    finally:
        srv.shutdown()


def test_publish_rejects_schemaless_metadata():
    """A document with neither 'schemas' nor 'schema' must fail loudly
    client-side, not POST a null schema for an opaque server 400
    (r16 review)."""
    cat = RestCatalog("http://127.0.0.1:9", prefix="")
    with pytest.raises(ValueError, match="neither 'schemas' nor 'schema'"):
        cat.publish("prod", "t", {"snapshots": []})


def test_oauth_token_fetch_has_timeout():
    """The token POST must carry a timeout like every catalog request —
    a hung token endpoint must not block the session forever
    (r16 review)."""
    from pg_lake_spark.lakehouse.rest_catalog import OAuthClientCredentials

    auth = OAuthClientCredentials("http://u", "id", "sec", timeout_s=7.5)
    assert auth.timeout_s == 7.5
    captured = {}
    import urllib.request as _ur

    real = _ur.urlopen

    def spy(req, timeout=None):
        captured["timeout"] = timeout
        raise OSError("stop here")

    _ur.urlopen = spy
    try:
        with pytest.raises(OSError):
            auth()
    finally:
        _ur.urlopen = real
    assert captured["timeout"] == 7.5
