"""Iceberg-style lakehouse layer, pure PySpark.

The reference's transactional core re-expressed over Spark + Parquet +
JSON metadata (no Iceberg runtime jar needed in this environment):

- ``transforms``  — hidden-partitioning transforms incl. spec-exact
                    murmur3 bucket (partition_transform.c:760-800).
- ``catalog``     — table metadata: schema, partition spec, snapshots,
                    per-file column stats (§1.3 catalogs:
                    lake_table.files / data_file_column_stats /
                    data_file_partition_values).
- ``table``       — LakeTable: CREATE/CTAS, INSERT (append), snapshot
                    reads + time travel, DELETE/UPDATE (metadata-only +
                    copy-on-write), scan reports (Data Files
                    Scanned/Skipped observability).
- ``pruning``     — min/max-stats + partition-transform file pruning
                    (data_file_pruning.c:186 PruneDataFiles).
- ``maintenance`` — vacuum: compaction, snapshot expiry, orphan/
                    deletion-queue cleanup (vacuum.c:670-891).
"""

from pg_lake_spark.lakehouse.table import LakeTable

__all__ = ["LakeTable"]
