"""Delta-scan query: the driver-visible proof of §2.1 Delta support.

Builds a genuine ``_delta_log`` from corpus data (create + append +
partition remove + checkpoint — the full replay surface), then scans it
back through :func:`scan_delta`; the oracle computes the same end state
straight from the orders parquet. Mirrors the dml_* pattern of making a
write-then-read lifecycle externally checkable.

Reference: docs/file-formats-reference.md:34-37 (PG_LAKE_DELTA_SUPPORT
read-only Delta scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_lake_spark.lakehouse.delta_meta import (
    append_delta,
    remove_delta_files,
    scan_delta,
    write_delta_checkpoint,
    write_delta_table,
)
from pg_lake_spark.queries.dml import _scratch
from pg_lake_spark.queries.registry import query
from pg_lake_spark.session import load_tables


@query(
    "d_delta_scan",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey <= 3000 AND o_orderstatus <> 'P'
    ORDER BY o_orderkey
    """,
    doc="Delta table lifecycle scanned through the _delta_log reader: "
    "commit 0 creates a partitioned table, commit 1 appends, commit 2 "
    "removes the 'P' partition's files, a checkpoint is written, and "
    "the scan replays the log (checkpoint-seeded) to the active file "
    "set — one distributed parquet read plus a broadcast partition-"
    "value join.",
)
def d_delta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    src = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    batch1 = src.filter(F.col("o_orderkey") <= 1500)
    batch2 = src.filter((F.col("o_orderkey") > 1500) & (F.col("o_orderkey") <= 3000))
    loc = _scratch("d_delta_scan")
    write_delta_table(spark, loc, batch1, partition_by=["o_orderstatus"])
    append_delta(spark, loc, batch2)
    remove_delta_files(loc, lambda pv: pv.get("o_orderstatus") == "P")
    write_delta_checkpoint(spark, loc)
    return scan_delta(spark, loc).orderBy("o_orderkey")


@query(
    "d_delta_column_mapping",
    oracle="""
    SELECT o_orderkey AS ok, o_orderstatus AS status, o_totalprice AS price
    FROM orders
    WHERE o_orderkey <= 2000 AND o_orderstatus <> 'P'
    ORDER BY ok
    """,
    doc="delta.columnMapping=name scan: data parquet stores physical "
    "col-<uuid> names, add.partitionValues keyed by physical names; the "
    "reader resolves physicalName metadata back to logical columns and "
    "still partition-prunes on the logical name (protocol §column-"
    "mapping; same widening the Iceberg path got from name mapping).",
)
def d_delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os

    t = load_tables(spark, sf_dir)
    src = (
        t["orders"]
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            F.col("o_orderkey").alias("col-k"),
            F.col("o_totalprice").alias("col-p"),
            F.col("o_orderstatus").alias("col-s"),
        )
    )
    loc = _scratch("d_delta_cmap")
    data_root = os.path.join(loc, "data")
    src.write.partitionBy("col-s").parquet(data_root)
    log_dir = os.path.join(loc, "_delta_log")
    os.makedirs(log_dir)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "ok", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-k"}},
            {"name": "price", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-p"}},
            {"name": "status", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-s"}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cmap-query",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["status"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"},
        }},
    ]
    for sub in sorted(os.listdir(data_root)):
        if not sub.startswith("col-s="):
            continue
        pv = sub.split("=", 1)[1]
        d = os.path.join(data_root, sub)
        for n in sorted(os.listdir(d)):
            if n.endswith(".parquet"):
                actions.append({"add": {
                    "path": f"data/{sub}/{n}",
                    "partitionValues": {"col-s": pv},
                    "size": os.path.getsize(os.path.join(d, n)),
                    "modificationTime": 0,
                    "dataChange": True,
                }})
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return (
        scan_delta(spark, loc, where="status <> 'P'")
        .select("ok", "status", "price")
        .orderBy("ok")
    )
