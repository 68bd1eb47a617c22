"""A guided tour of the engine — every workflow from the reference's
docs, runnable end to end on a scratch directory.

Run: ``python examples/tour.py [scratch_dir]``. Each step prints what
it proved; ``tests/test_tour.py`` executes the whole tour so the
examples can never rot.

Workflows covered (reference doc -> step):
- query-data-lake-files.md  -> foreign tables over files, filename
  column, file listing, SQL DDL
- data-lake-import-export.md -> COPY TO/FROM, load_from creation
- iceberg-tables.md         -> lakehouse lifecycle: CTAS, DML, time
  travel, schema evolution, vacuum, drop/restore, Iceberg export +
  object-store catalog discovery
- spatial.md                -> WKB geometry functions + spatial joins
- (north star)              -> dedup / quality / membership pipeline ops
"""

from __future__ import annotations

import os
import sys
import tempfile


def tour(spark, scratch: str) -> dict:
    from pyspark.sql import functions as F

    from pg_lake_spark.session import LakeSession

    out: dict = {}
    sess = LakeSession(spark)
    # the docs' getting-started opener, verbatim
    # (building-from-source.md:504-507)
    sess.execute(
        "CREATE EXTENSION pg_lake CASCADE;\n"
        "SET pg_lake_iceberg.default_location_prefix TO "
        f"'{os.path.join(scratch, 'warehouse')}';"
    )
    os.makedirs(sess.warehouse, exist_ok=True)

    # -- 1. files become tables (query-data-lake-files.md) ---------------
    csv_path = os.path.join(scratch, "events.csv")
    with open(csv_path, "w") as fh:
        fh.write("user_id,kind,amount\n")
        for i in range(100):
            fh.write(f"{i % 10},k{i % 3},{i / 4}\n")
    sess.execute(
        f"CREATE FOREIGN TABLE raw_events () SERVER pg_lake "
        f"OPTIONS (path '{csv_path}', format 'csv')"
    )
    out["foreign_rows"] = sess.execute("SELECT count(*) n FROM raw_events").collect()[0].n

    # -- 2. COPY + load_from (data-lake-import-export.md) ----------------
    pq_dir = os.path.join(scratch, "events_parquet")
    sess.execute(f"COPY (SELECT * FROM raw_events) TO '{pq_dir}' (FORMAT parquet)")
    sess.execute(f"CREATE TABLE events_lake () WITH (load_from = '{csv_path}')")
    out["lake_rows"] = spark.table("events_lake").count()

    # -- 3. lakehouse lifecycle (iceberg-tables.md) ----------------------
    # DML runs as SQL statements, verbatim from the docs
    sess.execute("INSERT INTO events_lake VALUES (99, 'k9', 123.0)")
    sess.execute("UPDATE events_lake SET amount = amount + 1 WHERE user_id = 99")
    sess.execute("DELETE FROM events_lake WHERE user_id = 99")
    t = sess.lake_table_handle("events_lake")
    t.delete("kind = 'k2'")
    v_before_update = t.metadata.current_snapshot().snapshot_id
    t.update({"amount": "amount * 2"}, where="user_id = 3")
    out["after_dml"] = t.to_df().count()
    out["time_travel"] = t.to_df(snapshot_id=v_before_update).count()

    # Iceberg export + cross-engine discovery via the object store
    from pg_lake_spark.lakehouse.iceberg_meta import export_iceberg

    export_iceberg(t)
    cat = sess.enable_object_store_catalog(os.path.join(scratch, "store"))
    cat.register("public", "events_lake", t.location)
    catalog_file = cat.push()
    discovered = cat.scan(spark, "public", "events_lake", catalog_file)
    out["discovered_rows"] = discovered.count()

    # the docs' inspection statements (iceberg-tables.md:599-656)
    cat_rows = sess.execute(
        "SELECT table_name, metadata_location FROM iceberg_tables "
        "WHERE table_name = 'events_lake'"
    ).collect()
    out["catalog_tables"] = len(cat_rows)
    files = sess.execute(
        "select file_path, record_count from "
        f"lake_iceberg.files('{cat_rows[0].metadata_location}')"
    ).collect()
    out["inspected_rows"] = sum(
        r.record_count for r in files if r.file_path.endswith(".parquet")
    )

    # schema evolution — the docs' verbatim ALTER statements
    # (iceberg-tables.md:684-710); constant-backfill columns export
    # after a compaction rewrite (see iceberg_meta.export_iceberg)
    sess.execute("ALTER TABLE events_lake ADD COLUMN source text DEFAULT 'tour'")
    sess.execute("ALTER TABLE events_lake ALTER COLUMN user_id TYPE bigint")
    out["evolved_cols"] = t.to_df().columns

    # -- 4. spatial (spatial.md) -----------------------------------------
    sess.enable_spatial_sql()
    row = sess.sql(
        "SELECT st_area(st_intersection("
        "  st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'),"
        "  st_geomfromtext('POLYGON((5 5,15 5,15 15,5 15,5 5))'))) AS a, "
        "st_contains("
        "  st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'),"
        "  st_geomfromtext('POINT(3 3)')) AS c"
    ).collect()[0]
    out["intersection_area"], out["contains"] = row.a, row.c

    # -- 4b. round-7 spatial additions: snap overlay, geodesy, UTM ------
    row = sess.sql(
        "SELECT st_area(st_union("  # shared-edge parcels dissolve (snap fallback)
        "  st_geomfromtext('POLYGON((0 0,1 0,1 1,0 1,0 0))'),"
        "  st_geomfromtext('POLYGON((1 0,2 0,2 1,1 1,1 0))'))) AS dissolved, "
        "round(st_length_sphere(st_geomfromtext('LINESTRING(0 0,1 0)')), 0) AS deg_m, "
        "round(st_x(st_transform("
        "  st_geomfromtext('POINT(-79.387139 43.642567)'), 4326, 32617)), 0) AS utm_e"
    ).collect()[0]
    out["parcel_union_area"] = row.dissolved
    out["equator_degree_m"], out["cn_tower_utm_e"] = row.deg_m, row.utm_e

    # -- 4c. matview + UPDATE..FROM/RETURNING (round-7 write surface) ----
    sess.execute(
        "CREATE MATERIALIZED VIEW kind_totals AS "
        "SELECT kind, sum(amount) AS total FROM raw_events GROUP BY kind"
    )
    out["matview_rows"] = sess.execute("SELECT * FROM kind_totals").count()
    sess.execute("REFRESH MATERIALIZED VIEW kind_totals")
    ret = sess.execute(
        "UPDATE events_lake SET amount = amount * 2 WHERE user_id = 1 RETURNING user_id, amount"
    )
    out["update_returning_rows"] = ret.count() if ret is not None else 0

    # -- 5. pipeline operators (the 100 TB north star) -------------------
    from pg_lake_spark.operators.membership import bloom_semi_join

    docs = spark.createDataFrame(
        [(i, f"document body {i % 40}") for i in range(400)], "doc_id int, text string"
    )
    corpus = docs.filter(F.col("doc_id") < 200).select(F.md5("text").alias("h"))
    probe = docs.filter(F.col("doc_id") >= 200).select("doc_id", F.md5("text").alias("h"))
    out["dupes_found"] = bloom_semi_join(probe, corpus, "h").count()

    from pg_lake_spark.operators.sharding import write_training_shards

    shards = write_training_shards(
        docs.withColumn("n_tokens", F.length("text")),
        os.path.join(scratch, "shards"),
        ["doc_id"],
        shard_rows=100,
    )
    out["shards"] = len(shards)
    return out


def main() -> None:
    scratch = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lake_tour_")
    from pg_lake_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    results = tour(spark, scratch)
    for k, v in results.items():
        print(f"{k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
