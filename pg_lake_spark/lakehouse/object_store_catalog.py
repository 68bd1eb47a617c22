"""Object-store catalog: table discovery via a ``catalog.json`` file.

Reference: pg_lake_iceberg/src/object_store_catalog/object_store_catalog.c
— the engine periodically pushes a JSON snapshot of its Iceberg tables
(``{"catalog-snapshot-time": "...", "tables": [{"metadata-location",
"table-name", "namespace"}, ...]}``) to a fixed object-store path
(``<prefix>/<db>/catalog/<name>/catalog.json``) so OTHER engines can
discover tables without a live catalog service; symmetrically, it reads
a foreign engine's file to mount external tables
(``list_object_store_tables``, ``GetTableMetadataLocationFrom
ExternalObjectStoreCatalog``). The file is always read fresh (the
reference routes it around its cache) because it changes out of band.

This is the same protocol on the Spark engine:

- :meth:`ObjectStoreCatalog.register` tracks (namespace, table) →
  Iceberg metadata location and marks the catalog dirty
- :meth:`push` writes ``catalog.json`` atomically with the reference's
  exact field names; :meth:`push_if_stale` applies the
  ``object_store_catalog_max_age`` cadence (export when dirty AND older
  than max_age — the CatalogNeedsExport logic)
- :meth:`list_tables` / :meth:`metadata_location` read a catalog file
  fresh (ours or a foreign engine's)
- :meth:`scan` mounts a discovered table through the external Iceberg
  scanner (position/equality deletes, name mapping — the full read
  path)
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


class ObjectStoreCatalog:
    def __init__(self, root: str, name: str = "pg_lake", max_age_s: float = 60.0):
        self.root = root
        self.name = name
        self.max_age_s = max_age_s
        self._tables: dict[tuple[str, str], str] = {}
        self._dirty = True  # always export at least once after start-up
        self._last_push = 0.0
        # NO makedirs here: a discovery-only consumer (constructed just
        # to read a foreign engine's catalog) must not mutate the store
        # — it may be a read-only mount. push() creates the directory.

    @property
    def catalog_dir(self) -> str:
        return os.path.join(self.root, "catalog", self.name)

    @property
    def catalog_path(self) -> str:
        return os.path.join(self.catalog_dir, "catalog.json")

    # -- publish side ------------------------------------------------------

    def register(self, namespace: str, table: str, metadata_location: str) -> None:
        self._tables[(namespace, table)] = metadata_location
        self._dirty = True

    def unregister(self, namespace: str, table: str) -> None:
        if self._tables.pop((namespace, table), None) is not None:
            self._dirty = True

    def push(self) -> str:
        """Write catalog.json now (force_push_object_store_catalog)."""
        doc = {
            "catalog-snapshot-time": datetime.now(timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            ),
            "tables": [
                {
                    "metadata-location": loc,
                    "table-name": tbl,
                    "namespace": ns,
                }
                for (ns, tbl), loc in sorted(self._tables.items())
            ],
        }
        # uuid-suffixed tmp + fsync via the shared helper: a fixed
        # ".tmp" name lets two concurrent pushers interleave writes or
        # race the rename (r15 review).
        from pg_lake_spark.lakehouse.catalog import _atomic_write

        os.makedirs(self.catalog_dir, exist_ok=True)
        _atomic_write(self.catalog_path, json.dumps(doc, indent=1))
        self._dirty = False
        self._last_push = time.monotonic()
        return self.catalog_path

    def push_if_stale(self) -> bool:
        """The trigger_object_store_catalog_generation cadence: export
        when something changed and the last push is older than
        max_age_s (or never happened)."""
        if not self._dirty:
            return False
        if self._last_push and time.monotonic() - self._last_push < self.max_age_s:
            return False
        self.push()
        return True

    # -- discovery side (reads any engine's catalog file, always fresh) ----

    @staticmethod
    def _read(path: str) -> dict:
        with open(path) as fh:  # no caching: the file changes out of band
            return json.load(fh)

    def list_tables(self, catalog_path: str | None = None) -> list[dict]:
        """list_object_store_tables parity: rows of namespace /
        table-name / metadata-location."""
        return self._read(catalog_path or self.catalog_path).get("tables", [])

    def metadata_location(
        self, namespace: str, table: str, catalog_path: str | None = None
    ) -> str:
        for t in self.list_tables(catalog_path):
            if t.get("namespace") == namespace and t.get("table-name") == table:
                return t["metadata-location"]
        raise KeyError(f"{namespace}.{table} not in object store catalog")

    def scan(
        self,
        spark: SparkSession,
        namespace: str,
        table: str,
        catalog_path: str | None = None,
        **scan_kwargs,
    ) -> DataFrame:
        from pg_lake_spark.lakehouse.iceberg_meta import scan_iceberg

        loc = self.metadata_location(namespace, table, catalog_path)
        return scan_iceberg(spark, loc, **scan_kwargs)
