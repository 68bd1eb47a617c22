"""Warehouse-level catalog view (`iceberg_tables` analogue).

Reference: the ``iceberg_tables`` SQL-catalog view that JDBC/pyiceberg/
iceberg-rust clients read (docs/iceberg-tables.md, "Viewing the Iceberg
catalog") — one row per table with its current metadata pointer. Here a
warehouse is any directory whose children are LakeTable locations.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.lakehouse import catalog as cat

_SCHEMA = (
    "table_name string, location string, metadata_location string, "
    "current_snapshot_id bigint, "
    "n_snapshots int, last_updated_ms bigint, schema_ddl string, "
    "partition_spec string, metadata_version int"
)


def _metadata_location(loc: str, version: int) -> str:
    mdir = os.path.join(loc, "metadata")
    if os.path.isdir(mdir):
        from pg_lake_spark.lakehouse.iceberg_meta import _metadata_version_key

        exported = sorted(
            (f for f in os.listdir(mdir) if f.endswith(".metadata.json")),
            key=_metadata_version_key,
        )
        if exported:
            return os.path.join(mdir, exported[-1])
    return os.path.join(loc, cat.METADATA_DIR, f"v{version}.metadata.json")


def list_tables(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    """One row per LakeTable under ``warehouse_dir`` (non-recursive).

    Driver-side metadata reads only — O(#tables) small JSON files, the
    same cost any Iceberg catalog listing pays.
    """
    rows = []
    if os.path.isdir(warehouse_dir):
        for name in sorted(os.listdir(warehouse_dir)):
            loc = os.path.join(warehouse_dir, name)
            if not cat.table_exists(loc):
                continue
            md = cat.read_current_metadata(loc)
            snap = md.current_snapshot()
            rows.append(
                (
                    name,
                    loc,
                    # the doc's iceberg_tables carries the metadata
                    # pointer (iceberg-tables.md:605): the Iceberg
                    # EXPORT when one exists (what external engines
                    # read), else the internal catalog file
                    _metadata_location(loc, md.version),
                    md.current_snapshot_id,
                    len(md.snapshots),
                    snap.timestamp_ms if snap else None,
                    md.schema_ddl,
                    json.dumps(md.partition_spec),
                    md.version,
                )
            )
    return spark.createDataFrame(rows, _SCHEMA)


def deletion_queue(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    """One row per queued-for-deletion file across the warehouse — the
    ``lake_engine.deletion_queue`` observability view
    (iceberg-tables.md:857: operators query it to find e.g. the most
    recent orphaned metadata before retention purges it). Columns:
    table_name, path, orphaned_at_ms. DROPPED tables are included —
    DROP enqueues every retained file and renames the version hint, so
    they are the largest producers of queue entries (the doc's workflow
    is precisely recovering a dropped table's metadata before purge)."""
    from pg_lake_spark.lakehouse.maintenance import read_dropped_metadata

    rows = []
    if os.path.isdir(warehouse_dir):
        for name in sorted(os.listdir(warehouse_dir)):
            loc = os.path.join(warehouse_dir, name)
            if cat.table_exists(loc):
                md = cat.read_current_metadata(loc)
            else:
                dropped = read_dropped_metadata(loc)
                if dropped is None:
                    continue
                _, md = dropped
            for e in md.deletion_queue:
                rows.append((name, e["path"], int(e.get("enqueued_ms") or 0)))
    return spark.createDataFrame(
        rows, "table_name string, path string, orphaned_at_ms bigint"
    )


def list_dropped_tables(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    """One row per DROPPED-but-restorable table under ``warehouse_dir``
    (drop_table.c soft-delete observability): the dropped metadata
    version, when it was dropped, how many files await purge, and the
    restore target version — so an operator can see what
    ``restore_table`` can still bring back before retention expires."""
    from pg_lake_spark.lakehouse.maintenance import read_dropped_metadata

    rows = []
    if os.path.isdir(warehouse_dir):
        for name in sorted(os.listdir(warehouse_dir)):
            loc = os.path.join(warehouse_dir, name)
            dropped = read_dropped_metadata(loc)
            if dropped is None:
                continue
            dropped_version, md = dropped
            rows.append(
                (
                    name,
                    loc,
                    dropped_version,
                    int(md.properties.get("dropped_ms") or 0),
                    len(md.deletion_queue),
                    dropped_version - 1,
                )
            )
    return spark.createDataFrame(
        rows,
        "table_name string, location string, dropped_version int, "
        "dropped_ms bigint, queued_files int, restore_version int",
    )
