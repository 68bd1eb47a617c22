"""Iceberg REST catalog client: list namespaces/tables, load, scan.

The reference tests against a REST catalog server
(pg_lake_iceberg/src/test/rest_catalog.c, test_common/rest_catalog/);
this is the same interop Spark-side, speaking the public Iceberg REST
Catalog OpenAPI surface (https://iceberg.apache.org/spec/ — rest
catalog spec) with stdlib urllib:

- ``GET /v1/config``                                  → catalog defaults
- ``GET /v1/namespaces``                              → namespace list
- ``GET /v1/namespaces/{ns}/tables``                  → table identifiers
- ``GET /v1/namespaces/{ns}/tables/{table}``          → LoadTableResult

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
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.lakehouse import iceberg_meta

#: REST spec: multipart namespace levels join with the 0x1F unit
#: separator, percent-encoded in URLs.
_NS_SEP = "\x1f"


class RestCatalog:
    """Minimal read-path client for an Iceberg REST catalog."""

    def __init__(
        self,
        uri: str,
        *,
        token: str | None = None,
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

    def _get(self, path: str) -> dict:
        req = urllib.request.Request(self.uri + path)
        req.add_header("Accept", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))

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
