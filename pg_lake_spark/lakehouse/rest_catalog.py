"""Iceberg REST catalog client: list/load/scan plus write-through.

The reference tests against a REST catalog server
(pg_lake_iceberg/src/test/rest_catalog.c, test_common/rest_catalog/)
and POSTs its commits through the catalog
(pg_lake_iceberg/src/rest_catalog/); this is the same interop
Spark-side, speaking the public Iceberg REST Catalog OpenAPI surface
(https://iceberg.apache.org/spec/ — rest catalog spec) with stdlib
urllib:

- ``GET  /v1/config``                                 → catalog defaults
- ``GET  /v1/namespaces``                             → namespace list
- ``POST /v1/namespaces``                             → create namespace
- ``GET  /v1/namespaces/{ns}/tables``                 → table identifiers
- ``GET  /v1/namespaces/{ns}/tables/{table}``         → LoadTableResult
- ``POST /v1/namespaces/{ns}/tables``                 → CreateTableRequest
- ``POST /v1/namespaces/{ns}/tables/{table}``         → CommitTableRequest
  (``requirements`` [assert-table-uuid / assert-ref-snapshot-id] +
  ``updates`` [add-snapshot / set-snapshot-ref / ...]; 409 on a failed
  requirement is surfaced as :class:`RestCommitConflict`)
- ``POST /v1/namespaces/{ns}/register``               → RegisterTableRequest
- ``DELETE /v1/namespaces/{ns}/tables/{table}``       → drop

``LoadTableResult`` may carry the full ``metadata`` document inline or
only a ``metadata-location``; both resolve to the same spec reader
(:func:`iceberg_meta.scan_iceberg_metadata`), so REST-served tables get
every scan capability of file-resolved ones: snapshot time travel,
position deletes, equality deletes, name mapping with per-file
field-id precedence.

Only catalog METADATA crosses HTTP — the data path stays a distributed
parquet scan, so a 100 TB REST-served table costs one small JSON fetch
plus the normal scan.

Multi-level namespaces use the spec's ``%1F`` unit-separator encoding.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.lakehouse import iceberg_meta

#: REST spec: multipart namespace levels join with the 0x1F unit
#: separator, percent-encoded in URLs.
_NS_SEP = "\x1f"


class RestCommitConflict(RuntimeError):
    """The catalog rejected a commit requirement (HTTP 409) — reload the
    table and retry against its new state (spec: CommitFailedException)."""


class OAuthClientCredentials:
    """OAuth2 client-credentials token source (reference:
    rest_catalog_auth.c — Basic(client_id:client_secret) POST to the
    oauth endpoint with ``grant_type=client_credentials&scope=…``;
    the access token is cached until shortly before ``expires_in``
    and refetched on expiry)."""

    def __init__(
        self,
        token_url: str,
        client_id: str,
        client_secret: str,
        scope: str = "catalog",
        refresh_margin_s: float = 30.0,
        timeout_s: float = 30.0,
    ) -> None:
        self.token_url = token_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.scope = scope
        self.refresh_margin_s = refresh_margin_s
        self.timeout_s = timeout_s
        self._token: str | None = None
        self._expiry: float = 0.0

    def invalidate(self) -> None:
        """Drop the cached token (the reference resets its cache on any
        server/user-mapping change)."""
        self._token, self._expiry = None, 0.0

    def __call__(self) -> str:
        import base64
        import time as _time

        if self._token is not None and _time.monotonic() < self._expiry:
            return self._token
        basic = base64.b64encode(
            f"{self.client_id}:{self.client_secret}".encode()
        ).decode()
        body = urllib.parse.urlencode(
            {"grant_type": "client_credentials", "scope": self.scope}
        ).encode()
        req = urllib.request.Request(self.token_url, data=body, method="POST")
        req.add_header("Authorization", f"Basic {basic}")
        req.add_header("Content-Type", "application/x-www-form-urlencoded")
        # timeout, like every catalog request: a hung token endpoint
        # must not block the session forever (r16 review)
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            doc = json.loads(resp.read().decode("utf-8"))
        if "access_token" not in doc:
            raise ValueError('key "access_token" missing in oauth response')
        if "expires_in" not in doc:
            raise ValueError('key "expires_in" missing in oauth response')
        self._token = doc["access_token"]
        self._expiry = (
            _time.monotonic() + float(doc["expires_in"]) - self.refresh_margin_s
        )
        return self._token


class RestCatalog:
    """Iceberg REST catalog client (read path + write-through).

    ``token`` may be a static bearer string or a CALLABLE returning the
    current token (e.g. :class:`OAuthClientCredentials`) — evaluated per
    request so expiry-driven refresh is transparent."""

    def __init__(
        self,
        uri: str,
        *,
        token=None,
        prefix: str | None = None,
        timeout_s: float = 30.0,
    ) -> None:
        self.uri = uri.rstrip("/")
        self.token = token
        self.timeout_s = timeout_s
        if prefix is None:
            # /v1/config may advertise a path prefix in its defaults /
            # overrides; tolerate servers that don't implement it.
            try:
                cfg = self._get("/v1/config")
                prefix = (cfg.get("overrides") or {}).get("prefix") or (
                    cfg.get("defaults") or {}
                ).get("prefix")
            except Exception:
                prefix = None
        self.prefix = (prefix or "").strip("/")

    # -- plumbing ----------------------------------------------------------

    def _req(
        self, method: str, path: str, body: dict | None = None, *, commit: bool = False
    ) -> dict:
        data = json.dumps(body).encode("utf-8") if body is not None else None
        req = urllib.request.Request(self.uri + path, data=data, method=method)
        req.add_header("Accept", "application/json")
        if data is not None:
            req.add_header("Content-Type", "application/json")
        if self.token:
            tok = self.token() if callable(self.token) else self.token
            req.add_header("Authorization", f"Bearer {tok}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                raw = resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 409 and commit:
                # only a CommitTableRequest 409 means "requirement
                # failed, reload and retry" — the spec also uses 409
                # for AlreadyExists on create_namespace/create_table,
                # where a retry loop could never succeed; those keep
                # the raw HTTPError.
                raise RestCommitConflict(
                    f"{method} {path}: commit requirement failed "
                    f"({e.read().decode('utf-8', 'replace')[:200]})"
                ) from None
            raise
        return json.loads(raw.decode("utf-8")) if raw else {}

    def _get(self, path: str) -> dict:
        return self._req("GET", path)

    def _base(self) -> str:
        return f"/v1/{self.prefix}" if self.prefix else "/v1"

    @staticmethod
    def _ns_path(namespace: str | list[str]) -> str:
        levels = (
            namespace.split(".") if isinstance(namespace, str) else list(namespace)
        )
        return urllib.parse.quote(_NS_SEP.join(levels), safe="")

    # -- catalog surface ---------------------------------------------------

    def list_namespaces(self) -> list[str]:
        out = self._get(f"{self._base()}/namespaces")
        return [".".join(ns) for ns in out.get("namespaces", [])]

    def list_tables(self, namespace: str | list[str]) -> list[str]:
        out = self._get(f"{self._base()}/namespaces/{self._ns_path(namespace)}/tables")
        return [ident["name"] for ident in out.get("identifiers", [])]

    def load_table(self, namespace: str | list[str], table: str) -> dict:
        """The raw LoadTableResult document."""
        return self._get(
            f"{self._base()}/namespaces/{self._ns_path(namespace)}/tables/"
            f"{urllib.parse.quote(table, safe='')}"
        )

    def scan(
        self,
        spark: SparkSession,
        namespace: str | list[str],
        table: str,
        snapshot_id: int | None = None,
        where: str | None = None,
    ) -> DataFrame:
        """Scan a REST-served table into a DataFrame."""
        res = self.load_table(namespace, table)
        meta = res.get("metadata")
        if meta is None:
            loc = res.get("metadata-location")
            if not loc:
                raise ValueError(
                    "LoadTableResult carries neither metadata nor metadata-location"
                )
            return iceberg_meta.scan_iceberg(
                spark, loc, snapshot_id=snapshot_id, where=where
            )
        return iceberg_meta.scan_iceberg_metadata(
            spark, meta, snapshot_id=snapshot_id, where=where
        )

    # -- write-through surface --------------------------------------------

    def create_namespace(self, namespace: str | list[str], properties: dict | None = None) -> dict:
        levels = (
            namespace.split(".") if isinstance(namespace, str) else list(namespace)
        )
        return self._req(
            "POST",
            f"{self._base()}/namespaces",
            {"namespace": levels, "properties": properties or {}},
        )

    def create_table(
        self,
        namespace: str | list[str],
        name: str,
        schema: dict,
        *,
        partition_spec: dict | None = None,
        properties: dict | None = None,
        location: str | None = None,
        stage_create: bool = False,
    ) -> dict:
        """CreateTableRequest → LoadTableResult. ``schema`` is an
        Iceberg struct-schema document (the same shape metadata.json's
        ``schemas`` entries carry)."""
        body: dict = {
            "name": name,
            "schema": schema,
            "properties": properties or {},
            "stage-create": stage_create,
        }
        if partition_spec is not None:
            body["partition-spec"] = partition_spec
        if location is not None:
            body["location"] = location
        return self._req(
            "POST", f"{self._base()}/namespaces/{self._ns_path(namespace)}/tables", body
        )

    def register_table(
        self, namespace: str | list[str], name: str, metadata_location: str
    ) -> dict:
        """RegisterTableRequest: adopt an existing metadata.json."""
        return self._req(
            "POST",
            f"{self._base()}/namespaces/{self._ns_path(namespace)}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def commit_table(
        self,
        namespace: str | list[str],
        table: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        """CommitTableRequest (requirements + updates) → CommitTableResponse.

        Raises :class:`RestCommitConflict` when the catalog rejects a
        requirement (someone committed first) — reload and retry."""
        return self._req(
            "POST",
            f"{self._base()}/namespaces/{self._ns_path(namespace)}/tables/"
            f"{urllib.parse.quote(table, safe='')}",
            {
                "identifier": {
                    "namespace": (
                        namespace.split(".")
                        if isinstance(namespace, str)
                        else list(namespace)
                    ),
                    "name": table,
                },
                "requirements": requirements,
                "updates": updates,
            },
            commit=True,
        )

    def drop_table(self, namespace: str | list[str], table: str) -> None:
        self._req(
            "DELETE",
            f"{self._base()}/namespaces/{self._ns_path(namespace)}/tables/"
            f"{urllib.parse.quote(table, safe='')}",
        )

    def publish(
        self,
        namespace: str | list[str],
        name: str,
        metadata: dict,
    ) -> dict:
        """Write-through an exported Iceberg metadata document (e.g.
        ``LakeTable.export_iceberg()``'s output) into the catalog — the
        reference's commit path (pg_lake_iceberg/src/rest_catalog/):

        - table absent → CreateTableRequest carrying the current schema,
          then commit every exported snapshot;
        - table present → commit only the snapshots the catalog hasn't
          seen, guarded by ``assert-ref-snapshot-id`` on ``main`` so a
          concurrent writer's commit surfaces as RestCommitConflict
          instead of a silent overwrite.
        """
        schemas = metadata.get("schemas") or [metadata.get("schema")]
        if not any(schemas):
            # a v1 doc without schema/schemas would otherwise POST a
            # null schema and fail server-side with an opaque 400
            raise ValueError(
                "metadata document carries neither 'schemas' nor 'schema' "
                "— not a valid Iceberg metadata export"
            )
        current_schema = next(
            (
                s
                for s in schemas
                if s and s.get("schema-id", 0) == metadata.get("current-schema-id", 0)
            ),
            schemas[0],
        )
        try:
            existing = self.load_table(namespace, name)
        except urllib.error.HTTPError as e:
            if e.code != 404:
                raise
            existing = None
        if existing is None:
            self.create_table(
                namespace,
                name,
                current_schema,
                properties=metadata.get("properties") or {},
                location=metadata.get("location"),
            )
            known: set[int] = set()
            base_ref: int | None = None
            served_uuid = None
        else:
            served = existing.get("metadata")
            if served is None:
                # metadata-location-only LoadTableResult (spec-legal):
                # read the document from the location — without it,
                # known/base_ref would come out empty and every publish
                # would re-add committed snapshots and fail its own
                # assert-ref requirement.
                loc = existing.get("metadata-location")
                if not loc:
                    raise ValueError(
                        "LoadTableResult carries neither metadata nor "
                        "metadata-location"
                    )
                if loc.startswith(("http://", "https://", "hf://")):
                    from pg_lake_spark.sources.readers import fetch_remote

                    loc = fetch_remote(loc)
                elif "://" in loc and not loc.startswith("file:"):
                    raise ValueError(
                        f"metadata-location scheme not fetchable driver-side: "
                        f"{loc!r} (ask the catalog for inline metadata, or "
                        "mirror the document locally)"
                    )
                with open(
                    iceberg_meta._resolve_metadata_path(iceberg_meta._localize(loc))
                ) as fh:
                    served = json.load(fh)
            known = {s["snapshot-id"] for s in served.get("snapshots", [])}
            base_ref = served.get("current-snapshot-id")
            served_uuid = served.get("table-uuid")
            # a catalog current snapshot the local export has never seen
            # usually means the export is STALE (someone else committed
            # since) — setting main from it would silently roll their
            # commit back; the assert-ref guard alone cannot catch this
            # because we read base_ref moments ago. EXCEPTION: a table
            # that expires snapshots locally (max_snapshot_age=0 /
            # VACUUM) legitimately drops base_ref from its history while
            # being AHEAD of the catalog — distinguishable by
            # last-sequence-number (local > served means local is ahead;
            # the assert-ref requirement still guards the final commit).
            local_ids = {s["snapshot-id"] for s in metadata.get("snapshots", [])}
            if base_ref is not None and base_ref not in local_ids:
                local_seq = metadata.get("last-sequence-number")
                served_seq = served.get("last-sequence-number")
                ahead = (
                    local_seq is not None
                    and served_seq is not None
                    and local_seq > served_seq
                )
                if not ahead:
                    raise RestCommitConflict(
                        f"catalog 'main' is at snapshot {base_ref}, which "
                        "the local export does not contain — reload the "
                        "table, re-export, and retry"
                    )

        updates: list[dict] = []
        for s in metadata.get("snapshots", []):
            if s["snapshot-id"] not in known:
                updates.append({"action": "add-snapshot", "snapshot": s})
        cur = metadata.get("current-snapshot-id")
        if cur is not None and cur != base_ref:
            updates.append(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "main",
                    "type": "branch",
                    "snapshot-id": cur,
                }
            )
        if not updates:
            # idempotent re-publish of an already-current export:
            # nothing to commit, no POST
            return existing or {}
        requirements: list[dict] = [
            {
                "type": "assert-ref-snapshot-id",
                "ref": "main",
                "snapshot-id": base_ref,
            }
        ]
        if served_uuid:
            requirements.append(
                {"type": "assert-table-uuid", "uuid": served_uuid}
            )
        return self.commit_table(namespace, name, requirements, updates)
