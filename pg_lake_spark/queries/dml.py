"""DML/DDL lifecycle queries — the §2.8 write surface, driver-visible.

Each query creates a scratch LakeTable from corpus data, runs a write
lifecycle (CoW/MoR DELETE, MERGE, schema evolution), and returns the
final table scan; the oracle is plain SQL computing the same end state
directly from the same parquet. This makes the lakehouse write path —
the reference's core (writable_table.c 1,822 LoC, alter_table.c 1,866
LoC, writes.md:15-44) — verifiable by the external correctness driver,
not only by local tests.

Scratch tables live under ONE session-scoped root (cleaned at process
exit); re-running a query replaces its own subdirectory, so any number
of re-runs leaves exactly one root on disk. The returned DataFrame
stays valid until the same query runs again in this process.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_lake_spark.lakehouse.table import LakeTable
from pg_lake_spark.queries.registry import query
from pg_lake_spark.session import load_tables

_SCRATCH_ROOT: str | None = None


def _scratch(name: str) -> str:
    """Per-query scratch dir under a single session-scoped root."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="pg_lake_dml_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    path = os.path.join(_SCRATCH_ROOT, name)
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


@query(
    "dml_cow_delete",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey <= 2000
      AND NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
      AND NOT (o_orderstatus = 'P')
    ORDER BY o_orderkey
    """,
    doc="Copy-on-write DELETE lifecycle (writes.md:15-31): a partitioned "
    "scratch table takes a partial-rewrite delete (stats-pruned to the "
    "'F' partition files) then a full-partition delete (metadata-only "
    "drop, the Data Files Skipped fast path); final scan is the oracle-"
    "checked end state.",
)
def dml_cow_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    src = (
        t["orders"]
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    lt = LakeTable.create_from_dataframe(
        spark, _scratch("dml_cow_delete"), src, partition_by=["o_orderstatus"]
    )
    # Partial CoW: only 'F'-partition files are candidates (partition
    # pruning), and survivors inside them are rewritten.
    lt.delete("o_orderstatus = 'F' AND o_totalprice < 100000", mode="cow")
    # Full-file fast path: the whole 'P' partition drops without reading
    # a single data row.
    lt.delete("o_orderstatus = 'P'", mode="cow")
    return lt.scan().orderBy("o_orderkey")


@query(
    "dml_mor_lifecycle",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE (l_orderkey <= 1000 AND NOT (l_discount > 0.08) AND NOT (l_quantity <= 5))
       OR (l_orderkey > 1000 AND l_orderkey <= 2000 AND NOT (l_quantity <= 5))
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Merge-on-read DELETE lifecycle (position_delete_dest.c analogue, "
    "predicate-scoped): MoR delete #1 applies only to pre-existing "
    "files, a subsequent append is NOT hidden by it, MoR delete #2 "
    "covers both batches, then VACUUM-style materialization rewrites "
    "physically — the sequence-scoping semantics fixed in round 2.",
)
def dml_mor_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"]
    li = t["lineitem"]
    batch1 = li.filter(F.col("l_orderkey") <= 1000).select(*cols)
    batch2 = li.filter(
        (F.col("l_orderkey") > 1000) & (F.col("l_orderkey") <= 2000)
    ).select(*cols)
    lt = LakeTable.create_from_dataframe(spark, _scratch("dml_mor_lifecycle"), batch1)
    lt.delete("l_discount > 0.08", mode="mor")  # scoped to batch1's files
    lt.append(batch2)  # appended after the delete — never hidden by it
    lt.delete("l_quantity <= 5", mode="mor")  # scoped to both batches
    lt.materialize_deletes()  # physical rewrite; scan must be unchanged
    return lt.scan().orderBy("l_orderkey", "l_linenumber")


@query(
    "dml_merge_upsert",
    oracle="""
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey > 200 THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal
    FROM customer
    WHERE c_custkey <= 400
    ORDER BY c_custkey
    """,
    doc="MERGE INTO upsert (additive over the reference, which documents "
    "MERGE as unsupported — docs/iceberg-tables.md): matched keys "
    "update, unmatched source keys insert, files outside the source key "
    "range survive untouched via stats pruning.",
)
def dml_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    target = cust.filter(F.col("c_custkey") <= 300).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    source = (
        cust.filter((F.col("c_custkey") > 200) & (F.col("c_custkey") <= 400))
        .select("c_custkey", "c_name", (F.col("c_acctbal") + 1000).alias("c_acctbal"))
    )
    lt = LakeTable.create_from_dataframe(spark, _scratch("dml_merge_upsert"), target)
    lt.merge(
        source,
        on=["c_custkey"],
        when_matched_update={"c_acctbal": "s.c_acctbal"},
        when_not_matched_insert=True,
    )
    return lt.scan().orderBy("c_custkey")


@query(
    "ddl_schema_evolution",
    oracle="""
    SELECT n_nationkey, n_name AS n_label, 'unassigned' AS n_zone
    FROM nation
    UNION ALL
    SELECT r_regionkey + 100, upper(r_name),
           concat('zone-', CAST(r_regionkey AS VARCHAR))
    FROM region
    UNION ALL
    SELECT r_regionkey + 200, lower(r_name), 'floating'
    FROM region
    ORDER BY n_nationkey
    """,
    doc="Full ALTER lifecycle (alter_table.c analogue): ADD COLUMN with "
    "const default (backfill-on-read, no rewrite), insert with the new "
    "column, RENAME COLUMN (metadata-only, per-file schema eras), SET "
    "DEFAULT (future inserts only), insert relying on the new default, "
    "DROP COLUMN — then one scan presenting every file era in the "
    "current logical schema.",
)
def ddl_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    nation, region = t["nation"], t["region"]
    lt = LakeTable.create_from_dataframe(
        spark,
        _scratch("ddl_schema_evolution"),
        nation.select("n_nationkey", "n_name", "n_regionkey"),
    )
    lt.add_column("n_zone", "string", default="'unassigned'")
    lt.append(
        region.select(
            (F.col("r_regionkey") + 100).alias("n_nationkey"),
            F.upper("r_name").alias("n_name"),
            F.col("r_regionkey").alias("n_regionkey"),
            F.concat(F.lit("zone-"), F.col("r_regionkey").cast("string")).alias("n_zone"),
        )
    )
    lt.rename_column("n_name", "n_label")
    lt.set_column_default("n_zone", "'floating'")
    lt.append(  # n_zone omitted → write-time default 'floating'
        region.select(
            (F.col("r_regionkey") + 200).alias("n_nationkey"),
            F.lower("r_name").alias("n_label"),
            F.col("r_regionkey").alias("n_regionkey"),
        )
    )
    lt.drop_column("n_regionkey")
    return lt.scan().orderBy("n_nationkey")


@query(
    "dml_incremental_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey > 1000 AND l_orderkey <= 2000
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Incremental append scan (Iceberg incremental-read contract, "
    "additive over the reference): two appends land as snapshots 1 and "
    "2; the delta from snapshot 1 is exactly the second batch's rows — "
    "the natural feed for downstream ETL/streaming consumers.",
)
def dml_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cols = ["l_orderkey", "l_linenumber", "l_quantity"]
    li = t["lineitem"].select(*cols)
    batch1 = li.filter(F.col("l_orderkey") <= 1000)
    batch2 = li.filter((F.col("l_orderkey") > 1000) & (F.col("l_orderkey") <= 2000))
    lt = LakeTable.create_from_dataframe(spark, _scratch("dml_incremental_scan"), batch1)
    lt.append(batch2)
    return lt.incremental_scan(1).orderBy("l_orderkey", "l_linenumber")


@query(
    "dml_update_set",
    oracle="""
    SELECT c_custkey, c_nationkey,
           round(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END, 2) AS c_acctbal
    FROM customer
    WHERE c_custkey <= 500
    ORDER BY c_custkey
    """,
    doc="Copy-on-write UPDATE (writes.md:15-31, writable_table.c CoW "
    "branch): SET clamps negative balances to zero WHERE they are "
    "negative; files with no matching rows survive untouched via stats "
    "pruning and the final scan is the oracle-checked end state.",
)
def dml_update_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    src = (
        t["customer"]
        .filter(F.col("c_custkey") <= 500)
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    lt = LakeTable.create_from_dataframe(spark, _scratch("dml_update_set"), src)
    lt.update({"c_acctbal": "0.0"}, where="c_acctbal < 0")
    return lt.scan().select(
        "c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("c_acctbal")
    ).orderBy("c_custkey")


@query(
    "dml_drop_restore",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_orderkey <= 2500
      AND NOT (o_orderkey > 2000 AND o_orderstatus = 'O')
    ORDER BY o_orderkey
    """,
    doc="DROP TABLE soft-delete lifecycle (drop_table.c; iceberg-"
    "tables.md:845-850): create + append, drop (files to the deletion "
    "queue, table hidden), restore from the retained pre-drop metadata, "
    "then DELETE on the restored table proves it is fully writable; the "
    "final scan is the oracle-checked end state.",
)
def dml_drop_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.lakehouse import catalog as cat
    from pg_lake_spark.lakehouse import maintenance

    t = load_tables(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    loc = _scratch("dml_drop_restore")
    lt = LakeTable.create_from_dataframe(
        spark, loc, base.filter(F.col("o_orderkey") <= 2000)
    )
    lt.append(
        base.filter((F.col("o_orderkey") > 2000) & (F.col("o_orderkey") <= 2500))
    )
    maintenance.drop_table(loc)
    assert not cat.table_exists(loc)
    lt = maintenance.restore_table(spark, loc)  # un-drop: both commits back
    lt.delete("o_orderkey > 2000 AND o_orderstatus = 'O'")
    return (
        lt.scan()
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


@query(
    "ddl_guc_numeric_schema",
    oracle="""
    SELECT 'type_small' AS item, 'decimal(12,2)' AS val
    UNION ALL SELECT 'type_big', 'double'
    UNION ALL SELECT 'type_unb', 'double'
    UNION ALL SELECT 'type_strict', 'decimal(38,4)'
    UNION ALL SELECT 'reject_p50', 'rejected'
    UNION ALL SELECT 'rows',
        (SELECT CAST(count(*) AS VARCHAR) FROM customer WHERE c_custkey <= 300)
    UNION ALL SELECT 'cents_big',
        (SELECT CAST(sum(CAST(round(c_acctbal * 200) AS BIGINT)) AS VARCHAR)
         FROM customer WHERE c_custkey <= 300)
    ORDER BY item
    """,
    doc="Session-GUC effect on CREATE TABLE (iceberg-tables.md:104-107, "
    "guc.c analogue): with pg_lake_iceberg.unsupported_numeric_as_double "
    "on, numeric(50,10) and unbounded numeric map to double while "
    "numeric(12,2) stays decimal — queried back from the created "
    "table's schema plus a value round-trip through the double column; "
    "with the GUC off, numeric(38,4) still creates but numeric(50,10) "
    "is rejected at CREATE (the observable off-state).",
)
def ddl_guc_numeric_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.session import LakeSession

    t = load_tables(spark, sf_dir)
    t["customer"]  # register the corpus view for INSERT ... SELECT
    sess = LakeSession(spark)
    sess.warehouse = _scratch("ddl_guc_numeric_schema")
    sess.execute("SET pg_lake_iceberg.unsupported_numeric_as_double = on")
    sess.execute(
        "CREATE TABLE guc_num (k int, small numeric(12,2), big numeric(50,10), "
        "unb numeric) USING iceberg"
    )
    sess.execute(
        "INSERT INTO guc_num SELECT c_custkey, c_acctbal, c_acctbal * 2, "
        "c_acctbal / 4 FROM customer WHERE c_custkey <= 300"
    )
    sess.execute("SET pg_lake_iceberg.unsupported_numeric_as_double = off")
    sess.execute("CREATE TABLE guc_strict (a numeric(38,4)) USING iceberg")
    try:
        sess.execute("CREATE TABLE guc_reject (a numeric(50,10)) USING iceberg")
        reject = "accepted"
    except ValueError:
        reject = "rejected"
    sess.execute("RESET pg_lake_iceberg.unsupported_numeric_as_double")
    dt = dict(spark.table("guc_num").dtypes)
    dt_strict = dict(spark.table("guc_strict").dtypes)
    consts = spark.createDataFrame(
        [
            ("type_small", dt["small"]),
            ("type_big", dt["big"]),
            ("type_unb", dt["unb"]),
            ("type_strict", dt_strict["a"]),
            ("reject_p50", reject),
        ],
        "item string, val string",
    )
    stats = (
        spark.table("guc_num")
        .agg(
            F.count("*").cast("string").alias("n"),
            F.sum(F.round(F.col("big") * 100).cast("bigint")).cast("string").alias("c"),
        )
        .selectExpr("stack(2, 'rows', n, 'cents_big', c) AS (item, val)")
    )
    return consts.unionAll(stats).orderBy("item")


@query(
    "ddl_expire_on_write",
    oracle="""
    SELECT n_nationkey, n_name, 1 AS snapshots
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="Expire-on-write lifecycle (iceberg-tables.md:749): a table "
    "created WITH (max_snapshot_age = 0) expires superseded snapshots "
    "during each INSERT's commit — after four SQL INSERTs exactly one "
    "snapshot survives (stamped into every row) while the data is the "
    "union of all four batches.",
)
def ddl_expire_on_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.session import LakeSession

    t = load_tables(spark, sf_dir)
    t["nation"]
    sess = LakeSession(spark)
    sess.warehouse = _scratch("ddl_expire_on_write")
    sess.execute(
        "CREATE TABLE exp_t (n_nationkey int, n_name text) USING iceberg "
        "WITH (max_snapshot_age = 0)"
    )
    for lo, hi in ((0, 6), (7, 12), (13, 18), (19, 99)):
        sess.execute(
            f"INSERT INTO exp_t SELECT n_nationkey, n_name FROM nation "
            f"WHERE n_nationkey BETWEEN {lo} AND {hi}"
        )
    snaps = len(sess.lake_table_handle("exp_t").metadata.snapshots)
    return (
        spark.table("exp_t")
        .select("n_nationkey", "n_name", F.lit(snaps).alias("snapshots"))
        .orderBy("n_nationkey")
    )


@query(
    "ddl_alter_statements",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name AS p_label,
           'standard' AS p_tier
    FROM part WHERE p_partkey <= 600
    UNION ALL
    SELECT CAST(p_partkey + 1000 AS BIGINT), p_name, 'premium'
    FROM part WHERE p_partkey <= 200
    ORDER BY p_partkey
    """,
    doc="SQL-routed ALTER lifecycle (alter_table.c:1-120 statement "
    "surface, vs the API-routed ddl_schema_evolution): CTAS, ADD COLUMN "
    "with const default (backfill-on-read), INSERT with the new column, "
    "RENAME COLUMN (metadata-only), ALTER COLUMN TYPE int->bigint "
    "(in-place promotion over int32 file eras), DROP COLUMN — the final "
    "scan presents every era in the evolved schema.",
)
def ddl_alter_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.session import LakeSession

    t = load_tables(spark, sf_dir)
    t["part"]
    sess = LakeSession(spark)
    sess.warehouse = _scratch("ddl_alter_statements")
    sess.execute(
        "CREATE TABLE alt_t USING iceberg AS "
        "SELECT CAST(p_partkey AS INT) AS p_partkey, p_name, p_retailprice "
        "FROM part WHERE p_partkey <= 600"
    )
    sess.execute("ALTER TABLE alt_t ADD COLUMN p_tier text DEFAULT 'standard'")
    sess.execute(
        "INSERT INTO alt_t SELECT CAST(p_partkey + 1000 AS INT), p_name, "
        "p_retailprice + 50, 'premium' FROM part WHERE p_partkey <= 200"
    )
    sess.execute("ALTER TABLE alt_t RENAME COLUMN p_name TO p_label")
    sess.execute("ALTER TABLE alt_t ALTER COLUMN p_partkey TYPE bigint")
    sess.execute("ALTER TABLE alt_t DROP COLUMN p_retailprice")
    return spark.table("alt_t").orderBy("p_partkey")


@query(
    "dml_changelog",
    oracle="""
    SELECT 'delete' AS _change_type, c_custkey, round(c_acctbal, 2) AS bal
    FROM customer WHERE c_custkey <= 400 AND c_custkey % 7 = 0
    UNION ALL
    SELECT 'insert', c_custkey, round(c_acctbal + 100.0, 2)
    FROM customer WHERE c_custkey <= 400 AND c_custkey % 7 = 0
    ORDER BY _change_type, c_custkey
    """,
    doc="Row-level changelog between snapshots (Iceberg changelog-view "
    "parity, test_iceberg_changelog.py): a CoW UPDATE reports each "
    "changed row once as delete(old)+insert(new); rows merely copied "
    "by the rewrite cancel out (net-changes multiset diff, shared "
    "files pruned from both sides).",
)
def dml_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    src = (
        t["customer"]
        .filter(F.col("c_custkey") <= 400)
        .select("c_custkey", "c_acctbal")
    )
    lt = LakeTable.create_from_dataframe(spark, _scratch("dml_changelog"), src)
    s1 = lt.metadata.current_snapshot().snapshot_id
    lt.update({"c_acctbal": "c_acctbal + 100.0"}, where="c_custkey % 7 = 0")
    s2 = lt.metadata.current_snapshot().snapshot_id
    return (
        lt.changelog(s1, s2)
        .select(
            "_change_type",
            "c_custkey",
            F.round("c_acctbal", 2).alias("bal"),
        )
        .orderBy("_change_type", "c_custkey")
    )
