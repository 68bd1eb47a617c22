"""Multi-statement read isolation: PG repeatable-read emulation.

The reference's readers get Postgres MVCC semantics for free — a
REPEATABLE READ transaction sees one table snapshot no matter how many
statements it runs or what concurrent writers commit
(pg_lake_table/tests/isolation/specs/isolation_iceberg_repeatable_read
.spec, isolation_iceberg_serializable.spec; docs/iceberg-tables.md "An
update/delete command locks the table"). Spark has no transactions, so
the SURVEY (§6 concurrency row) calls for pinning one snapshot per
multi-statement "transaction" — that is exactly what this module does:

- :class:`ReadTransaction` captures each table's metadata at FIRST
  access (PG captures its MVCC snapshot at first statement) and serves
  every subsequent scan of that table from the captured state. Writers
  are never blocked (snapshot isolation, not locking), and the
  transaction never sees their commits.
- Safety against VACUUM: expired files sit in the deletion queue for
  ``DEFAULT_DELETION_RETENTION_S`` (10 days, the reference default)
  before physical deletion, so a pinned read has that long to finish —
  the same contract the reference gives its long-running readers.

Writer isolation needs no emulation: every LakeTable commit takes the
table's CommitLock and re-validates against the current metadata
(catalog.commit_metadata raises on concurrent commits), which is the
reference's writer-serialization behavior.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.lakehouse.table import LakeTable


class ReadTransaction:
    """Repeatable-read view over any number of LakeTables."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._pinned: dict[str, LakeTable] = {}

    def table(self, location: str) -> LakeTable:
        """The pinned handle for ``location`` (pinned at first access;
        its metadata is never refreshed inside this transaction)."""
        if location not in self._pinned:
            self._pinned[location] = LakeTable.load(self.spark, location)
        return self._pinned[location]

    def scan(self, location: str, **kwargs) -> DataFrame:
        return self.table(location).scan(**kwargs)

    @property
    def pins(self) -> dict[str, int | None]:
        """location → pinned current-snapshot id (diagnostics)."""
        return {
            loc: t.metadata.current_snapshot_id for loc, t in self._pinned.items()
        }


@contextmanager
def read_transaction(spark: SparkSession):
    """``with read_transaction(spark) as txn:`` — every ``txn.scan``
    inside the block is repeatable-read consistent per table."""
    yield ReadTransaction(spark)
