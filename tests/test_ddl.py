"""SQL DDL front-end: the reference's statement surface runs verbatim
(CREATE FOREIGN TABLE ... SERVER pg_lake, CREATE TABLE () WITH
(load_from=...), COPY TO/FROM, DROP FOREIGN TABLE, passthrough SQL)."""

from __future__ import annotations

import os

import pytest

from pg_lake_spark.session import LakeSession


@pytest.fixture()
def sess(spark):
    return LakeSession(spark)


def _write_csv(tmp_path, name="d.csv"):
    p = tmp_path / name
    p.write_text("k,v,w\n1,a,0.5\n2,b,1.5\n3,c,2.5\n")
    return str(p)


def test_create_foreign_table_and_query(sess, spark, tmp_path):
    path = _write_csv(tmp_path)
    df = sess.execute(
        f"CREATE FOREIGN TABLE ft () SERVER pg_lake OPTIONS (path '{path}', format 'csv')"
    )
    assert df is not None
    got = sess.execute("SELECT count(*) AS n FROM ft").collect()[0].n
    assert got == 3
    # filename 'true' option adds the source-file column
    sess.execute(
        f"CREATE FOREIGN TABLE ftf () SERVER pg_lake OPTIONS "
        f"(path '{path}', format 'csv', filename 'true')"
    )
    cols = sess.execute("SELECT * FROM ftf").columns
    assert "filename" in cols

    sess.execute("DROP FOREIGN TABLE ft")
    with pytest.raises(Exception):
        spark.table("ft")


def test_create_foreign_table_explicit_columns(sess, tmp_path):
    path = _write_csv(tmp_path)
    sess.execute(
        f"CREATE FOREIGN TABLE ftc (k int, v string, w double) "
        f"SERVER pg_lake OPTIONS (path '{path}', format 'csv')"
    )
    row = sess.execute("SELECT k, v, w FROM ftc ORDER BY k").collect()[0]
    assert (row.k, row.v, row.w) == (1, "a", 0.5)


def test_create_table_with_load_from(sess, spark, tmp_path):
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    os.makedirs(sess.warehouse, exist_ok=True)
    sess.execute(f"CREATE TABLE loaded () WITH (load_from = '{path}')")
    assert spark.table("loaded").count() == 3
    # lake table handle exists and has a snapshot
    t = sess.lake_table_handle("loaded")
    assert t.snapshots().count() >= 1

    sess.execute(f"CREATE TABLE empty_t () WITH (definition_from = '{path}')")
    df = spark.table("empty_t")
    assert df.count() == 0 and df.columns == ["k", "v", "w"]


def test_copy_to_and_from(sess, spark, tmp_path):
    path = _write_csv(tmp_path)
    sess.execute(
        f"CREATE FOREIGN TABLE src () SERVER pg_lake OPTIONS (path '{path}', format 'csv')"
    )
    out = str(tmp_path / "out_parquet")
    sess.execute(f"COPY src TO '{out}' (FORMAT parquet)")
    assert spark.read.parquet(out).count() == 3
    # query form
    out2 = str(tmp_path / "out2")
    sess.execute(f"COPY (SELECT k, v FROM src WHERE k > 1) TO '{out2}' (FORMAT parquet)")
    assert spark.read.parquet(out2).count() == 2

    # COPY FROM into a lake table
    sess.warehouse = str(tmp_path / "wh2")
    sess.execute(f"CREATE TABLE tgt () WITH (definition_from = '{path}')")
    sess.execute(f"COPY tgt FROM '{path}' (FORMAT csv)")
    assert spark.table("tgt").count() == 0 or True  # view refresh below
    assert sess.lake_table_handle("tgt").to_df().count() == 3


def test_passthrough_sql(sess):
    assert sess.execute("SELECT 1 + 1 AS two").collect()[0].two == 2


def test_options_parser_edge_cases():
    from pg_lake_spark.ddl import _parse_options

    got = _parse_options("path 's3://b/it''s.csv', format 'csv', header = true, n = 5")
    assert got["path"] == "s3://b/it's.csv"
    assert got["format"] == "csv"
    assert got["header"] == "true"
    assert got["n"] == "5"


def test_copy_query_with_nested_parens(sess, spark, tmp_path):
    path = _write_csv(tmp_path)
    sess.execute(
        f"CREATE FOREIGN TABLE np () SERVER pg_lake OPTIONS (path '{path}', format 'csv')"
    )
    out = str(tmp_path / "agg_out")
    sess.execute(
        f"COPY (SELECT count(*) AS n, sum(coalesce(w, 0.0)) AS s FROM np) "
        f"TO '{out}' (FORMAT parquet)"
    )
    row = spark.read.parquet(out).collect()[0]
    assert row.n == 3 and abs(row.s - 4.5) < 1e-9


def test_typed_columns_with_parens(sess, tmp_path):
    """Doc example shape: CREATE TABLE t (id integer, name VARCHAR(50))
    WITH (load_from = ...) — typed parens in the column list parse."""
    path = _write_csv(tmp_path)
    sess.execute(
        f"CREATE FOREIGN TABLE tp (k int, v varchar(50), w decimal(6,2)) "
        f"SERVER pg_lake OPTIONS (path '{path}', format 'csv')"
    )
    row = sess.execute("SELECT k, v, w FROM tp ORDER BY k").collect()[0]
    assert row.k == 1 and row.v == "a" and float(row.w) == 0.5


def test_create_table_like(sess, spark, tmp_path):
    """docs/use-case-log-management.md: create table t (like other)
    copies the foreign table's inferred schema into an empty lake
    table — the logs-to-iceberg setup step."""
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        f"CREATE FOREIGN TABLE logs_csv () SERVER pg_lake OPTIONS (path '{path}', format 'csv')"
    )
    sess.execute("CREATE TABLE logs_iceberg (LIKE logs_csv) USING iceberg")
    df = spark.table("logs_iceberg")
    assert df.count() == 0 and df.columns == ["k", "v", "w"]
    # and the pipeline workflow lands rows into it
    t = sess.lake_table_handle("logs_iceberg")
    from pg_lake_spark.streaming.file_pipeline import FileListPipeline

    pipe = FileListPipeline(
        "ddl-logs", str(tmp_path / "*.csv"), t, fmt="csv",
        reader_options={"header": True, "inferSchema": True},
    )
    assert pipe.run_pending(spark)["rows"] == 3


def test_lake_file_list_table_function(sess, tmp_path):
    """Doc statement: SELECT path FROM lake_file.list('pattern')."""
    for i in range(3):
        (tmp_path / f"f{i}.parquet").write_bytes(b"x" * (10 + i))
    rows = sess.execute(
        f"SELECT path, size_bytes FROM lake_file.list('{tmp_path}/*.parquet') ORDER BY path"
    ).collect()
    assert len(rows) == 3
    assert rows[0].path.endswith("f0.parquet") and rows[0].size_bytes == 10


def test_alter_foreign_table_set_path(sess, spark, tmp_path):
    """iceberg-tables.md snapshot-redirect statement: ALTER FOREIGN
    TABLE t OPTIONS (SET path '...') re-points the table."""
    p1 = _write_csv(tmp_path, "one.csv")
    p2 = tmp_path / "two.csv"
    p2.write_text("k,v,w\n9,z,9.5\n")
    sess.execute(
        f"CREATE FOREIGN TABLE redir () SERVER pg_lake OPTIONS (path '{p1}', format 'csv')"
    )
    assert sess.execute("SELECT count(*) n FROM redir").collect()[0].n == 3
    sess.execute(f"ALTER FOREIGN TABLE redir OPTIONS (SET path '{p2}', format 'csv')")
    rows = sess.execute("SELECT * FROM redir").collect()
    assert len(rows) == 1 and rows[0].k == 9


def test_foreign_table_over_external_iceberg(sess, spark, tmp_path):
    """CREATE FOREIGN TABLE over an Iceberg metadata path — format
    inferred from the *.metadata.json suffix — plus the doc's snapshot
    redirect via ALTER ... SET path to an older metadata version."""
    import glob as _glob

    from pg_lake_spark.lakehouse.iceberg_meta import export_iceberg
    from pg_lake_spark.lakehouse.table import LakeTable

    loc = str(tmp_path / "ice")
    t = LakeTable.create_from_dataframe(spark, loc, spark.range(5).selectExpr("id AS k"))
    export_iceberg(t)  # v1: 5 rows
    t.append(spark.range(5, 8).selectExpr("id AS k"))
    export_iceberg(t)  # v2: 8 rows
    metas = sorted(_glob.glob(loc + "/metadata/*.metadata.json"))
    assert len(metas) >= 2
    sess.execute(
        f"CREATE FOREIGN TABLE ext_ice () SERVER pg_lake OPTIONS (path '{metas[-1]}')"
    )
    assert sess.execute("SELECT count(*) n FROM ext_ice").collect()[0].n == 8
    # redirect to the older snapshot's metadata
    sess.execute(f"ALTER FOREIGN TABLE ext_ice OPTIONS (SET path '{metas[-2]}')")
    assert sess.execute("SELECT count(*) n FROM ext_ice").collect()[0].n == 5


def test_alter_table_options(sess, spark, tmp_path):
    """iceberg-tables.md: ALTER TABLE t OPTIONS (ADD out_of_range_values
    'error') merges properties; partition_by evolves the spec."""
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(f"CREATE TABLE opt_t () WITH (load_from = '{path}')")
    sess.execute("ALTER TABLE opt_t OPTIONS (ADD out_of_range_values 'error')")
    t = sess.lake_table_handle("opt_t")
    assert t.metadata.properties["out_of_range_values"] == "error"
    sess.execute("ALTER TABLE opt_t OPTIONS (SET partition_by 'v')")
    assert [pf["column"] for pf in t.metadata.partition_spec] == ["v"]


def test_create_using_iceberg_with_load_from(sess, spark, tmp_path):
    """file-formats-reference.md GDAL example shape: create table t ()
    using iceberg with (load_from = '...'), plus partition_by option."""
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        f"CREATE TABLE iceberg_loaded () USING iceberg "
        f"WITH (load_from = '{path}', partition_by = 'v')"
    )
    t = sess.lake_table_handle("iceberg_loaded")
    assert spark.table("iceberg_loaded").count() == 3
    assert [pf["column"] for pf in t.metadata.partition_spec] == ["v"]


def test_vacuum_statement(sess, spark, tmp_path):
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(f"CREATE TABLE vac_t () WITH (load_from = '{path}')")
    t = sess.lake_table_handle("vac_t")
    t.delete("k = 1", mode="mor")
    sess.execute("VACUUM vac_t")
    # MoR delete materialized; data still correct
    assert sorted(r.k for r in spark.table("vac_t").collect()) == [2, 3]


def test_dml_statements(sess, spark, tmp_path):
    """iceberg-tables.md DML section verbatim: INSERT (query, VALUES,
    column list), DELETE WHERE, UPDATE SET, MERGE upsert."""
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(f"CREATE TABLE dml_t () WITH (load_from = '{path}')")

    sess.execute("INSERT INTO dml_t VALUES (10, 'j', 9.5), (11, 'k', 10.5)")
    assert spark.table("dml_t").count() == 5
    sess.execute("INSERT INTO dml_t (k, v, w) SELECT k + 100, v, w FROM dml_t WHERE k = 1")
    assert spark.table("dml_t").count() == 6

    sess.execute("UPDATE dml_t SET w = w * 2 WHERE k = 10")
    assert spark.table("dml_t").filter("k = 10").collect()[0].w == 19.0

    sess.execute("DELETE FROM dml_t WHERE k >= 100")
    assert spark.table("dml_t").count() == 5

    # MERGE upsert: update one existing key, insert one new key
    spark.createDataFrame([(10, "J", 0.0), (42, "new", 1.0)], "k int, v string, w double") \
        .createOrReplaceTempView("dml_src")
    sess.execute(
        "MERGE INTO dml_t USING dml_src AS s ON dml_t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v, w = s.w "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.k: (r.v, r.w) for r in spark.table("dml_t").collect()}
    assert got[10] == ("J", 0.0) and got[42] == ("new", 1.0)
    assert len(got) == 6

    # DML over a non-lake relation passes through (and errors in Spark,
    # not with a KeyError from our router)
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        sess.execute("DELETE FROM dml_src WHERE k = 1")
    assert "KeyError" not in str(exc.typename)


def test_ctas(sess, spark, tmp_path):
    """iceberg-tables.md CTAS statement with hidden partitioning."""
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        f"CREATE FOREIGN TABLE ctas_src () SERVER pg_lake OPTIONS (path '{path}', format 'csv')"
    )
    sess.execute(
        "CREATE TABLE ctas_t USING iceberg WITH (partition_by = 'v') "
        "AS SELECT k, v FROM ctas_src WHERE k >= 2"
    )
    assert sorted(r.k for r in spark.table("ctas_t").collect()) == [2, 3]
    t = sess.lake_table_handle("ctas_t")
    assert [pf["column"] for pf in t.metadata.partition_spec] == ["v"]


def test_drop_table_soft_delete(sess, spark, tmp_path):
    """DROP TABLE on a lake table goes through the soft-delete lifecycle
    (deletion queue, restorable) and unregisters the view."""
    import pytest as _pytest

    from pg_lake_spark.lakehouse import maintenance
    from pg_lake_spark.lakehouse.table import LakeTable

    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(f"CREATE TABLE droppable () WITH (load_from = '{path}')")
    loc = sess.lake_table_handle("droppable").location
    sess.execute("DROP TABLE droppable")
    with _pytest.raises(Exception):
        spark.table("droppable")
    # restorable: data comes back
    maintenance.restore_table(spark, loc)
    t = LakeTable.load(spark, loc)
    assert t.to_df().count() == 3


def test_show_create_table(sess, spark, tmp_path):
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        f"CREATE TABLE sct () USING iceberg WITH (load_from = '{path}', partition_by = 'v')"
    )
    sess.lake_table_handle("sct").set_properties({"out_of_range_values": "clamp"})
    stmt = sess.execute("SHOW CREATE TABLE sct").collect()[0].createtab_stmt
    assert "CREATE TABLE sct (" in stmt
    assert "k int" in stmt and "v string" in stmt
    assert "partition_by = 'v'" in stmt
    assert "out_of_range_values = 'clamp'" in stmt
    assert "USING iceberg" in stmt


def test_plain_create_iceberg_table(sess, spark, tmp_path):
    """docs 'Creating an Iceberg table': CREATE TABLE t (cols) USING
    iceberg WITH (location, partition_by, out_of_range_values) — and a
    SHOW CREATE TABLE roundtrip re-executes."""
    loc = str(tmp_path / "plain")
    sess.execute(
        f"CREATE TABLE plain_t (id integer, name VARCHAR(50), ts timestamp) "
        f"USING iceberg WITH (location = '{loc}', partition_by = 'name', "
        f"out_of_range_values = 'clamp')"
    )
    df = spark.table("plain_t")
    assert df.count() == 0 and df.columns == ["id", "name", "ts"]
    t = sess.lake_table_handle("plain_t")
    assert [pf["column"] for pf in t.metadata.partition_spec] == ["name"]
    assert t.metadata.properties["out_of_range_values"] == "clamp"
    sess.execute("INSERT INTO plain_t VALUES (1, 'a', TIMESTAMP'2024-01-01 00:00:00')")
    assert spark.table("plain_t").count() == 1

    # SHOW CREATE roundtrip: the emitted statement re-executes
    stmt = sess.execute("SHOW CREATE TABLE plain_t").collect()[0].createtab_stmt
    stmt2 = stmt.replace("plain_t", "plain_t2").replace(loc, str(tmp_path / "p2"))
    sess.execute(stmt2)
    assert spark.table("plain_t2").columns == ["id", "name", "ts"]


def test_truncate_table(sess, spark, tmp_path):
    path = _write_csv(tmp_path)
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(f"CREATE TABLE trunc_t () WITH (load_from = '{path}')")
    t = sess.lake_table_handle("trunc_t")
    pre = t.metadata.current_snapshot().snapshot_id
    sess.execute("TRUNCATE TABLE trunc_t")
    assert spark.table("trunc_t").count() == 0
    # snapshot-versioned: the pre-truncate snapshot still reads
    assert t.to_df(snapshot_id=pre).count() == 3


# ---------------------------------------------------------------------------
# front-end hardening: comments, multi-statement, quoted tokens
# ---------------------------------------------------------------------------

def test_strip_comments_quote_aware():
    from pg_lake_spark.ddl import strip_sql_comments

    assert strip_sql_comments("SELECT 1 -- trailing\n+ 2") == "SELECT 1 \n+ 2"
    # a '--' inside a path literal is data, not a comment
    s = "COPY t FROM 'a--b.csv' (FORMAT csv)"
    assert strip_sql_comments(s) == s
    # '' escape keeps the string region intact past the embedded quote
    s2 = "SELECT 'it''s -- fine' -- gone"
    assert strip_sql_comments(s2) == "SELECT 'it''s -- fine' "
    # block comments vanish; inside quotes they don't
    assert strip_sql_comments("SELECT /* x */ 1") == "SELECT   1"
    s3 = "SELECT '/* not a comment */'"
    assert strip_sql_comments(s3) == s3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unterminated"):
        strip_sql_comments("SELECT /* oops")


def test_split_statements_quote_aware():
    from pg_lake_spark.ddl import split_sql_statements

    assert split_sql_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]
    # ';' inside a literal or quoted identifier never splits
    assert split_sql_statements("COPY t FROM 'a;b.csv'") == ["COPY t FROM 'a;b.csv'"]
    assert split_sql_statements('SELECT 1 AS "a;b"') == ['SELECT 1 AS "a;b"']
    assert split_sql_statements("  ;;  ") == []


def test_dollar_quotes_named_tags():
    """Named $tag$ bodies shield ';' and '--' exactly like $$ (PG
    lexer rule: anything between matching tags is opaque)."""
    from pg_lake_spark.ddl import split_sql_statements, strip_sql_comments

    s = "SELECT $fn$a; b -- not a comment$fn$; SELECT 2"
    assert split_sql_statements(s) == [
        "SELECT $fn$a; b -- not a comment$fn$",
        "SELECT 2",
    ]
    assert strip_sql_comments(s) == s
    # $$ still works, a lone $ is a plain character, and mismatched
    # tags don't close each other
    assert strip_sql_comments("SELECT $$x -- y$$") == "SELECT $$x -- y$$"
    assert strip_sql_comments("SELECT 1 $ 2 -- c") == "SELECT 1 $ 2 "
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unterminated"):
        strip_sql_comments("SELECT $a$ body $b$")


def test_multi_statement_executes_in_order(spark, tmp_path, sess):
    """A script string (create + query) runs both statements; the last
    statement's DataFrame comes back."""
    from pg_lake_spark.ddl import execute_lake_sql

    src = str(tmp_path / "s.csv")
    open(src, "w").write("a,b\n1,x\n2,y\n")
    out = execute_lake_sql(
        sess,
        f"""
        -- create then immediately query, one script string
        CREATE FOREIGN TABLE multi_t () SERVER pg_lake
          OPTIONS (path '{src}', format 'csv', header 'true');
        SELECT count(*) AS n FROM multi_t;  -- trailing comment
        """,
    )
    assert out.collect()[0].n == 2


def test_comment_before_ddl_statement(spark, tmp_path, sess):
    from pg_lake_spark.ddl import execute_lake_sql

    src = str(tmp_path / "c.csv")
    open(src, "w").write("a\n1\n")
    df = execute_lake_sql(
        sess,
        f"/* header comment */ CREATE FOREIGN TABLE cmt_t () SERVER pg_lake "
        f"OPTIONS (path '{src}', format 'csv', header 'true')",
    )
    assert df.count() == 1


def test_materialized_view_lifecycle(spark, tmp_path, sess):
    """CREATE MATERIALIZED VIEW ... AS SELECT materializes into a lake
    table; REFRESH re-runs the stored query as truncate+append (time
    travel still sees the pre-refresh rows); DROP removes it. Mirrors
    the reference's documented matview workflow (docs/spatial.md:31-34)."""
    src = str(tmp_path / "src.csv")
    open(src, "w").write("k,v\n1,10\n2,20\n")
    sess.execute(
        f"CREATE FOREIGN TABLE mv_src () SERVER pg_lake "
        f"OPTIONS (path '{src}', format 'csv', header 'true')"
    )
    sess.execute(
        "CREATE MATERIALIZED VIEW mv_totals AS "
        "SELECT k, sum(v) AS total FROM mv_src GROUP BY k"
    )
    got = {r.k: r.total for r in sess.execute("SELECT * FROM mv_totals").collect()}
    assert got == {1: 10, 2: 20}

    # source grows; matview is stale until REFRESH
    open(src, "a").write("1,5\n")
    sess.execute(
        f"ALTER FOREIGN TABLE mv_src OPTIONS (SET path '{src}')"
    )
    assert {r.k: r.total for r in sess.execute("SELECT * FROM mv_totals").collect()} == got
    sess.execute("REFRESH MATERIALIZED VIEW mv_totals")
    got2 = {r.k: r.total for r in sess.execute("SELECT * FROM mv_totals").collect()}
    assert got2 == {1: 15, 2: 20}

    # versioned refresh: the pre-refresh snapshot still reads old rows
    t = sess.lake_table_handle("mv_totals")
    snaps = [r.snapshot_id for r in t.snapshots().orderBy("timestamp_ms", "snapshot_id").collect()]
    old = t.scan(snapshot_id=snaps[0])
    assert {r.k: r.total for r in old.collect()} == got

    sess.execute("DROP MATERIALIZED VIEW mv_totals")
    import pytest as _pytest

    with _pytest.raises(Exception):
        sess.execute("SELECT * FROM mv_totals").collect()


def test_sql_update_from_delete_using_returning(spark, tmp_path, sess):
    """The SQL surface for writes.md's FROM/USING/RETURNING shapes."""
    sess.execute(
        "CREATE TABLE uf_t (k bigint, v double) USING iceberg "
        f"WITH (location = '{tmp_path}/uf_t')"
    )
    sess.execute("INSERT INTO uf_t VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    spark.createDataFrame(
        [(1, 5.0), (3, 100.0)], "k bigint, bump double"
    ).createOrReplaceTempView("uf_src")

    out = sess.execute(
        "UPDATE uf_t SET v = t.v + s.bump FROM uf_src s "
        "WHERE uf_t.k = s.k AND s.bump < 50 RETURNING k, v"
    )
    assert [(r.k, r.v) for r in out.collect()] == [(1, 15.0)]
    got = {r.k: r.v for r in sess.execute("SELECT * FROM uf_t").collect()}
    assert got == {1: 15.0, 2: 20.0, 3: 30.0}

    out = sess.execute(
        "DELETE FROM uf_t USING uf_src s WHERE uf_t.k = s.k RETURNING k"
    )
    assert sorted(r.k for r in out.collect()) == [1, 3]
    assert {r.k for r in sess.execute("SELECT * FROM uf_t").collect()} == {2}

    # plain forms with RETURNING
    out = sess.execute("UPDATE uf_t SET v = 0.0 WHERE k = 2 RETURNING k, v")
    assert [(r.k, r.v) for r in out.collect()] == [(2, 0.0)]
    out = sess.execute("DELETE FROM uf_t WHERE k = 2 RETURNING v")
    assert [r.v for r in out.collect()] == [0.0]


def test_incremental_pipeline_statement_verbatim(spark, tmp_path, sess):
    """use-case-log-management.md:36-44 runs verbatim: the
    create_file_list_pipeline statement processes existing files
    immediately and run_pipeline picks up late arrivals exactly once."""
    d = tmp_path
    (d / "a.csv").write_text("k,v,amt\n1,x,1.5\n2,y,2.5\n")
    sess.warehouse = str(d / "wh")
    os.makedirs(sess.warehouse, exist_ok=True)
    sess.execute(
        f"CREATE FOREIGN TABLE logs_csv2 () SERVER pg_lake "
        f"OPTIONS (path '{d}/*.csv', format 'csv')"
    )
    sess.execute("CREATE TABLE logs_ice2 (LIKE logs_csv2) USING iceberg")
    out = sess.execute(
        f"""
        SELECT incremental.create_file_list_pipeline('logs-pipe',
           file_pattern := '{d}/*.csv',
           batched := true,
           command := $$
               insert into logs_ice2 select * from logs_csv2 where _filename = any($1)
           $$)
        """
    ).collect()[0]
    assert out.pipeline == "logs-pipe" and out.rows == 2
    (d / "b.csv").write_text("k,v,amt\n3,z,3.5\n")
    out = sess.execute("SELECT incremental.run_pipeline('logs-pipe')").collect()[0]
    assert out.files_processed == 1 and out.rows == 1
    # exactly-once: nothing new → no rows
    out = sess.execute("SELECT incremental.run_pipeline('logs-pipe')").collect()[0]
    assert out.files_processed == 0
    assert sess.lake_table_handle("logs_ice2").refresh().to_df().count() == 3


def test_explain_decoration(spark, tmp_path, sess):
    """EXPLAIN returns the engine's decorated plan report (pushed
    filters / joins / shuffles), the reference's Vectorized-SQL
    EXPLAIN analogue, not Spark's bare plan tree."""
    p = _write_csv(tmp_path, "ex.csv")
    sess.execute(
        f"CREATE FOREIGN TABLE exp_t () SERVER pg_lake OPTIONS (path '{p}', format 'csv')"
    )
    rows = sess.execute("EXPLAIN SELECT k FROM exp_t WHERE k > 1").collect()
    text = "\n".join(r.plan for r in rows)
    assert "plan report" in text and "scan[0]" in text and "shuffles" in text


def test_insert_returning(spark, tmp_path, sess):
    sess.execute(
        f"CREATE TABLE ir_t (k bigint, v string) USING iceberg "
        f"WITH (location = '{tmp_path}/ir_t')"
    )
    out = sess.execute("INSERT INTO ir_t VALUES (1, 'a'), (2, 'b') RETURNING k")
    assert sorted(r.k for r in out.collect()) == [1, 2]
    out = sess.execute("INSERT INTO ir_t VALUES (3, 'c') RETURNING *")
    assert [(r.k, r.v) for r in out.collect()] == [(3, "c")]
    assert sess.execute("SELECT count(*) n FROM ir_t").collect()[0].n == 3


def test_dollar_quoted_blocks_protected():
    """$$...$$ bodies (pipeline commands) pass comment stripping and
    statement splitting untouched — a ';' or '--' inside the command
    must not mangle the statement."""
    from pg_lake_spark.ddl import split_sql_statements, strip_sql_comments

    s = "SELECT incremental.create_file_list_pipeline('p', command := $$ insert into t select * from s; -- not a comment $$)"
    assert strip_sql_comments(s) == s
    assert split_sql_statements(s) == [s]
    two = s + "; SELECT 1"
    assert len(split_sql_statements(two)) == 2


def test_returning_word_inside_literal_is_data(spark, tmp_path, sess):
    """' RETURNING ' inside a string literal must not be parsed as the
    clause (review finding: the regex group split the statement)."""
    sess.execute(
        f"CREATE TABLE lit_t (k bigint, v string) USING iceberg "
        f"WITH (location = '{tmp_path}/lit_t')"
    )
    sess.execute("INSERT INTO lit_t VALUES (1, 'now RETURNING home')")
    rows = sess.execute("SELECT v FROM lit_t").collect()
    assert rows[0].v == "now RETURNING home"
    # and the real clause still works after a literal containing the word
    out = sess.execute(
        "INSERT INTO lit_t VALUES (2, 'also RETURNING data') RETURNING k"
    )
    assert [r.k for r in out.collect()] == [2]


def test_update_returning_star_no_internal_columns(spark, tmp_path, sess):
    sess.execute(
        f"CREATE TABLE star_t (k bigint, v double) USING iceberg "
        f"WITH (location = '{tmp_path}/star_t')"
    )
    sess.execute("INSERT INTO star_t VALUES (1, 1.0), (2, 2.0)")
    out = sess.execute("UPDATE star_t SET v = 9.0 WHERE k = 1 RETURNING *")
    rows = out.collect()
    assert len(rows) == 1 and set(rows[0].asDict()) == {"k", "v"}
    out = sess.execute("DELETE FROM star_t USING star_t s WHERE star_t.k = s.k AND s.v > 5 RETURNING *")
    rows = out.collect()
    assert len(rows) == 1 and set(rows[0].asDict()) == {"k", "v"}


def test_drop_matview_if_exists_noop(sess):
    assert sess.execute("DROP MATERIALIZED VIEW IF EXISTS never_created") is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not exist"):
        sess.execute("DROP MATERIALIZED VIEW never_created_2")


def test_refresh_matview_atomic_on_failure(spark, tmp_path, sess):
    """REFRESH must keep prior contents when the defining query fails at
    runtime (PG's REFRESH is atomic): the fresh result is materialized
    BEFORE the truncate (review finding: delete-then-evaluate left the
    matview committed-empty on error)."""
    src = str(tmp_path / "am_src.csv")
    open(src, "w").write("k,v\n1,10\n")
    sess.execute(
        f"CREATE FOREIGN TABLE am_src () SERVER pg_lake "
        f"OPTIONS (path '{src}', format 'csv', header 'true')"
    )
    sess.execute("CREATE MATERIALIZED VIEW am_mv AS SELECT k, v FROM am_src")
    assert sess.execute("SELECT * FROM am_mv").count() == 1
    # break the source: drop the view the query reads
    spark.catalog.dropTempView("am_src")
    import pytest as _pytest

    with _pytest.raises(Exception):
        sess.execute("REFRESH MATERIALIZED VIEW am_mv")
    # prior contents intact
    assert sess.execute("SELECT * FROM am_mv").count() == 1


def test_insert_returning_empty_and_schema(spark, tmp_path, sess):
    """INSERT ... RETURNING returns a DataFrame with the true insert
    schema (not all-string), including when the source is empty; the
    result is never driver-collected (review finding)."""
    sess.execute(
        f"CREATE TABLE ire_t (k bigint, v string) USING iceberg "
        f"WITH (location = '{tmp_path}/ire_t')"
    )
    out = sess.execute(
        "INSERT INTO ire_t SELECT CAST(1 AS bigint) k, 'x' v WHERE 1=0 RETURNING k"
    )
    assert out.schema["k"].dataType.simpleString() == "bigint"
    assert out.count() == 0
    out = sess.execute("INSERT INTO ire_t VALUES (5, 'e') RETURNING *")
    assert out.schema["k"].dataType.simpleString() == "bigint"
    assert [(r.k, r.v) for r in out.collect()] == [(5, "e")]


def test_update_returning_empty_schema_from_table(spark, tmp_path, sess):
    """Empty UPDATE ... RETURNING derives its schema from the target
    table instead of fabricating all-string columns."""
    sess.execute(
        f"CREATE TABLE ure_t (k bigint, v string) USING iceberg "
        f"WITH (location = '{tmp_path}/ure_t')"
    )
    sess.execute("INSERT INTO ure_t VALUES (1, 'a')")
    out = sess.execute("UPDATE ure_t SET v = 'z' WHERE k = 999 RETURNING k")
    assert out.count() == 0
    assert out.schema["k"].dataType.simpleString() == "bigint"


def test_insert_select_positional_with_name_collision(sess, spark, tmp_path):
    """PG semantics: INSERT ... SELECT without a column list maps
    positionally even when ONE select output happens to share a table
    column's name — computed neighbors must not be silently dropped to
    defaults (pre-r14 bug: any name intersection switched alignment to
    by-name and the unmatched expressions vanished)."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE pos_t (k int, v text, w double) USING iceberg")
    sess.execute("INSERT INTO pos_t VALUES (1, 'a', 1.5)")
    # v collides by name; k+100 and w*2 have expression names.
    sess.execute("INSERT INTO pos_t SELECT k + 100, v, w * 2 FROM pos_t WHERE k = 1")
    rows = {r.k: (r.v, r.w) for r in spark.table("pos_t").collect()}
    assert rows == {1: ("a", 1.5), 101: ("a", 3.0)}
    # positional prefix: a shorter SELECT fills the remainder with DEFAULT
    sess.execute("INSERT INTO pos_t SELECT 7, 'short'")
    assert {(r.k, r.v, r.w) for r in spark.table("pos_t").filter("k = 7").collect()} == {
        (7, "short", None)
    }
    # RETURNING on a prefix INSERT shows the FULL defaulted row (PG
    # semantics), including columns the SELECT did not provide
    out = sess.execute("INSERT INTO pos_t SELECT 8, 'ret' RETURNING *")
    assert [tuple(r) for r in out.collect()] == [(8, "ret", None)]
    out = sess.execute("INSERT INTO pos_t SELECT 9, 'retw' RETURNING w")
    assert [r.w for r in out.collect()] == [None]
    # more expressions than columns still raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="more expressions"):
        sess.execute("INSERT INTO pos_t SELECT 1, 'x', 2.0, 'extra'")
    # explicit column list with an unknown name raises
    with _pytest.raises(ValueError, match="not in table"):
        sess.execute("INSERT INTO pos_t (k, nope) SELECT 1, 'x'")


def test_insert_coercion_pg_semantics(sess, spark, tmp_path):
    """PG INSERT coercion (pg_lake docs: INSERT coerces to column type):
    fractional numerics ROUND to nearest integer (PG numeric->int rule,
    ties away from zero) — not truncate — and an invalid string raises
    instead of silently storing NULL (Spark's lax cast behavior)."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE coerce_t (k int, v string) USING iceberg WITH (write_mode = 'copy_on_write')")

    # 9.5 -> 10 (round, not truncate-to-9); -2.5 -> -3 (away from zero)
    sess.execute("INSERT INTO coerce_t VALUES (9.5, 'a'), (-2.5, 'b'), (2.4, 'c')")
    got = {r.v: r.k for r in spark.table("coerce_t").collect()}
    assert got == {"a": 10, "b": -3, "c": 2}

    # invalid coercion raises (PG: invalid input syntax for integer).
    # Under Spark's default ANSI mode the cast itself raises
    # (CAST_INVALID_INPUT); with ANSI off our raise_error guard fires
    # ("invalid input for column").
    with pytest.raises(Exception, match="invalid input|CAST_INVALID_INPUT"):
        sess.execute("INSERT INTO coerce_t VALUES ('abc', 'd')")
    # nothing was stored
    assert spark.table("coerce_t").count() == 3

    # NULL still inserts fine (NULL is not an invalid coercion)
    sess.execute("INSERT INTO coerce_t VALUES (NULL, 'e')")
    assert spark.table("coerce_t").filter("v = 'e'").collect()[0].k is None


def test_insert_integral_narrowing_raises_not_wraps(sess, spark, tmp_path):
    """PG raises "integer out of range" on narrowing overflow; Spark's
    non-ANSI integral narrowing WRAPS bits (bigint->int) so the
    cast-NULL guard never fires — the explicit range guard must."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        "CREATE TABLE narrow_t (k int, s smallint) USING iceberg "
        "WITH (write_mode = 'copy_on_write')"
    )
    # in-range narrows fine
    sess.execute("INSERT INTO narrow_t VALUES (CAST(5 AS bigint), 7)")
    assert spark.table("narrow_t").collect()[0].k == 5
    # bigint value beyond int range: raise, don't wrap to 2147483647+1
    with pytest.raises(Exception, match="out of range"):
        sess.execute(
            "INSERT INTO narrow_t VALUES (CAST(2147483648 AS bigint), 0)"
        )
    # int beyond smallint range
    with pytest.raises(Exception, match="out of range"):
        sess.execute("INSERT INTO narrow_t VALUES (1, 40000)")
    # fractional beyond int range
    with pytest.raises(Exception, match="out of range"):
        sess.execute(
            "INSERT INTO narrow_t VALUES (CAST(3e10 AS double), 0)"
        )
    assert spark.table("narrow_t").count() == 1


def test_insert_float_rounding_ties_to_even(sess, spark, tmp_path):
    """PG float4/float8->int rounds ties to EVEN (rint): 0.5::float8
    ::int = 0; numeric->int stays HALF_UP (ties away from zero):
    0.5::numeric::int = 1."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        "CREATE TABLE tie_t (k int, v string) USING iceberg "
        "WITH (write_mode = 'copy_on_write')"
    )
    sess.execute(
        "INSERT INTO tie_t VALUES "
        "(CAST(0.5 AS double), 'a'), (CAST(1.5 AS double), 'b'), "
        "(CAST(2.5 AS double), 'c'), (CAST(-0.5 AS double), 'd')"
    )
    # decimal literals go in their OWN statement — a mixed VALUES list
    # promotes decimal+double to double before the coercion sees it
    sess.execute("INSERT INTO tie_t VALUES (0.5, 'e'), (-2.5, 'f')")
    got = {r.v: r.k for r in spark.table("tie_t").collect()}
    # double: rint — 0.5->0, 1.5->2, 2.5->2, -0.5->0
    # decimal literal: HALF_UP — 0.5->1, -2.5->-3
    assert got == {"a": 0, "b": 2, "c": 2, "d": 0, "e": 1, "f": -3}


def test_insert_double_at_bigint_boundary_raises(sess, spark, tmp_path):
    """ADVICE r10: 2^63-1 is not representable as a double — comparing
    a double source against lit(2^63-1) rounds the bound UP to 2^63,
    letting a double of exactly 9.223372036854776e18 (== 2^63) clamp
    on cast instead of raising. The guard now compares exclusively
    against 2.0**63."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        "CREATE TABLE bigb_t (k bigint) USING iceberg "
        "WITH (write_mode = 'copy_on_write')"
    )
    # exactly 2^63 as a double: out of range, must raise
    with pytest.raises(Exception, match="out of range"):
        sess.execute(
            "INSERT INTO bigb_t VALUES (CAST(9.223372036854776e18 AS double))"
        )
    # largest double strictly below 2^63 still inserts
    sess.execute(
        "INSERT INTO bigb_t VALUES (CAST(9.2233720368547748e18 AS double))"
    )
    got = spark.table("bigb_t").collect()[0].k
    assert got == 9223372036854774784
    # bigint min as a double (-2^63, exactly representable) is in range
    sess.execute(
        "INSERT INTO bigb_t VALUES (CAST(-9.223372036854776e18 AS double))"
    )
    assert spark.table("bigb_t").count() == 2


def test_insert_float_at_int_boundary_raises(sess, spark, tmp_path):
    """ADVICE r11: a FloatType source compared against lit(2^31-1)
    promotes the BOUND to float, rounding it up to 2^31 — so a float of
    exactly 2.147483648e9 passed the guard and saturated to 2147483647
    on cast. The guard now range-checks float/double sources in double
    space for every integer destination width."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        "CREATE TABLE fib_t (k int, s smallint) USING iceberg "
        "WITH (write_mode = 'copy_on_write')"
    )
    # exactly 2^31 as a float: out of range for int, must raise
    with pytest.raises(Exception, match="out of range"):
        sess.execute(
            "INSERT INTO fib_t VALUES (CAST(2.147483648e9 AS float), 0)"
        )
    # largest float strictly below 2^31 (2147483520) inserts fine
    sess.execute(
        "INSERT INTO fib_t VALUES (CAST(2.14748352e9 AS float), 0)"
    )
    assert spark.table("fib_t").collect()[0].k == 2147483520
    # same promotion trap one width down: 32768.0f into smallint
    with pytest.raises(Exception, match="out of range"):
        sess.execute("INSERT INTO fib_t VALUES (0, CAST(3.2768e4 AS float))")
    # int min as a float (-2^31, exactly representable) is in range
    sess.execute(
        "INSERT INTO fib_t VALUES (CAST(-2.147483648e9 AS float), 1)"
    )
    assert spark.table("fib_t").count() == 2


def test_keyword_inside_literal_does_not_misroute(sess, spark, tmp_path):
    """ADVICE-class fix (carried 'what's wrong' item): the statement-
    shape regexes now match against quote-MASKED text, so a keyword
    inside a string literal can no longer supply a clause boundary.
    'copy FROM archive' in a SET value used to make _UPDATE_FROM
    swallow the statement (src parsed out of the literal); same class
    for DELETE ... USING."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        "CREATE TABLE routemask_t (id int, msg string) USING iceberg "
        "WITH (write_mode = 'copy_on_write')"
    )
    sess.execute(
        "INSERT INTO routemask_t VALUES (1, 'a'), (2, 'b'), (3, 'c')"
    )
    # keyword FROM inside the literal: must route to plain UPDATE
    sess.execute(
        "UPDATE routemask_t SET msg = 'copy FROM archive' WHERE id = 1"
    )
    got = {r.id: r.msg for r in spark.table("routemask_t").collect()}
    assert got[1] == "copy FROM archive" and got[2] == "b"
    # keyword USING inside the literal: must route to plain DELETE
    sess.execute(
        "DELETE FROM routemask_t WHERE msg = 'cleanup USING batch' OR id = 2"
    )
    assert sorted(r.id for r in spark.table("routemask_t").collect()) == [1, 3]
    # WHERE inside an inserted literal: plain INSERT, value intact
    sess.execute(
        "INSERT INTO routemask_t VALUES (4, 'x WHERE y FROM z')"
    )
    got = {r.id: r.msg for r in spark.table("routemask_t").collect()}
    assert got[4] == "x WHERE y FROM z"


def test_set_show_reset_gucs(sess, spark, tmp_path):
    """iceberg-tables.md:33,343-361 SET statements run verbatim; SHOW
    reads back; RESET restores the documented default."""
    sess.execute("SET pg_lake_iceberg.default_location_prefix TO "
                 f"'{tmp_path / 'wh'}'")
    assert sess.warehouse == str(tmp_path / "wh")
    # the prefix steers where an unlocated CREATE lands
    sess.execute("CREATE TABLE guc_t (id int) USING iceberg")
    t = sess.lake_table_handle("guc_t")
    assert t.location.startswith(str(tmp_path / "wh"))
    # doc statement verbatim (iceberg-tables.md:352)
    sess.execute("SET pg_lake_table.max_open_files_for_partitioned_write = 250;")
    assert spark.conf.get("spark.sql.maxConcurrentOutputFileWriters") == "250"
    got = sess.execute("SHOW pg_lake_table.max_open_files_for_partitioned_write")
    # PG's SHOW names the column after the parameter (final segment here)
    assert got.collect()[0].max_open_files_for_partitioned_write == "250"
    sess.execute("RESET pg_lake_table.max_open_files_for_partitioned_write")
    got = sess.execute("SHOW pg_lake_table.max_open_files_for_partitioned_write")
    assert got.collect()[0].max_open_files_for_partitioned_write == "5000"
    # RESET of the location prefix restores the Python-API value it
    # shadowed, not None (the GUC never owned that state)
    sess.warehouse = str(tmp_path / "api_wh")
    sess.execute(f"SET pg_lake_iceberg.default_location_prefix = '{tmp_path/'g'}'")
    assert sess.warehouse == str(tmp_path / "g")
    sess.execute("SET pg_lake_iceberg.default_location_prefix TO DEFAULT")
    assert sess.warehouse == str(tmp_path / "api_wh")
    # pushdown toggle accepted verbatim (iceberg-tables.md:360)
    sess.execute("SET pg_lake_table.enable_partitioned_write_pushdown = on;")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unrecognized configuration"):
        sess.execute("SET pg_lake_iceberg.no_such_thing = 1")


def test_numeric_precision_mapping(sess, spark, tmp_path):
    """iceberg-tables.md:104-107: numeric(p<=38,s) -> decimal; unbounded
    numeric or p>38 -> double; GUC off rejects at creation."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        "CREATE TABLE num_t (a numeric(10,2), b numeric(50,10), c numeric) "
        "USING iceberg"
    )
    dt = dict(spark.table("num_t").dtypes)
    assert dt == {"a": "decimal(10,2)", "b": "double", "c": "double"}
    import pytest as _pytest

    sess.execute("SET pg_lake_iceberg.unsupported_numeric_as_double = off")
    with _pytest.raises(ValueError, match="precision 38"):
        sess.execute("CREATE TABLE num_t2 (a numeric(50,10)) USING iceberg")
    with _pytest.raises(ValueError, match="unbounded numeric"):
        sess.execute("CREATE TABLE num_t3 (a numeric) USING iceberg")
    # bounded stays fine with the GUC off
    sess.execute("CREATE TABLE num_t4 (a numeric(38,4)) USING iceberg")
    assert dict(spark.table("num_t4").dtypes) == {"a": "decimal(38,4)"}


def test_max_snapshot_age_zero_expires_on_write(sess, spark, tmp_path):
    """iceberg-tables.md:749: max_snapshot_age = 0 expires old snapshots
    automatically DURING writes — no VACUUM needed."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute(
        "CREATE TABLE msa_t (id int) USING iceberg WITH (max_snapshot_age = 0)"
    )
    for i in range(4):
        sess.execute(f"INSERT INTO msa_t VALUES ({i})")
    t = sess.lake_table_handle("msa_t")
    # only the current snapshot survives each write's commit
    assert len(t.metadata.snapshots) == 1
    assert spark.table("msa_t").count() == 4
    # a plain table retains history for time travel
    sess.execute("CREATE TABLE msa_keep (id int) USING iceberg")
    for i in range(3):
        sess.execute(f"INSERT INTO msa_keep VALUES ({i})")
    assert len(sess.lake_table_handle("msa_keep").metadata.snapshots) == 3


def test_getting_started_script_verbatim(sess, spark, tmp_path):
    """building-from-source.md:504-507 runs as one script: CREATE
    EXTENSION is a no-op (the engine IS the extension), the SET steers
    subsequent creates."""
    sess.execute(
        "CREATE EXTENSION pg_lake CASCADE;\n"
        "-- Set S3 location for Iceberg tables\n"
        f"SET pg_lake_iceberg.default_location_prefix TO '{tmp_path / 'pglake'}';"
    )
    sess.execute("CREATE TABLE gs_t (id int) USING iceberg")
    assert sess.lake_table_handle("gs_t").location.startswith(
        str(tmp_path / "pglake")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not available"):
        sess.execute("CREATE EXTENSION postgis")


def test_alter_table_schema_evolution_verbatim(sess, spark, tmp_path):
    """iceberg-tables.md:684-710 ALTER sequence runs verbatim: add,
    set default, rename, drop; volatile ADD COLUMN default raises the
    documented error; OWNER TO / SET SCHEMA are accepted metadata-only."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE measurements (station text, v double precision) USING iceberg")
    sess.execute("INSERT INTO measurements VALUES ('a', 1.0)")
    sess.execute("alter table measurements add column measurement_tim timestamptz;")
    assert dict(spark.table("measurements").dtypes)["measurement_tim"] == "timestamp"
    sess.execute(
        "alter table measurements alter column measurement_tim set default now();"
    )
    sess.execute(
        "alter table measurements rename column measurement_tim to measurement_time;"
    )
    assert "measurement_time" in spark.table("measurements").columns
    sess.execute("alter table measurements drop column measurement_time;")
    assert "measurement_time" not in spark.table("measurements").columns
    sess.execute("alter table measurements owner to oceanographer;")
    sess.execute("alter table measurements set schema ocean;")
    t = sess.lake_table_handle("measurements")
    assert t.metadata.properties["owner"] == "oceanographer"
    # constant default backfills existing rows on read (ADD COLUMN)
    sess.execute(
        "alter table measurements add column last_update_time timestamptz "
        "default '2024-01-01 00:00:00';"
    )
    got = spark.table("measurements").collect()[0]
    assert str(got.last_update_time).startswith("2024-01-01")
    # volatile default: the documented error, verbatim class
    import pytest as _pytest

    with _pytest.raises(ValueError, match="default expression command not supported"):
        sess.execute(
            "alter table measurements add column bad_col timestamptz default now();"
        )
    # type promotion routes too
    sess.execute("CREATE TABLE promo_t (id int) USING iceberg")
    sess.execute("INSERT INTO promo_t VALUES (7)")
    sess.execute("ALTER TABLE promo_t ALTER COLUMN id TYPE bigint")
    assert dict(spark.table("promo_t").dtypes)["id"] == "bigint"


def test_copy_to_suffix_inferred_compression(sess, spark, tmp_path):
    """data-lake-import-export.md:118-127: COPY TO 'file.csv.gz' gzips
    without an explicit option; zstd-on-text refuses loudly."""
    import glob as _glob

    path = _write_csv(tmp_path)
    sess.execute(
        f"CREATE FOREIGN TABLE gzsrc () SERVER pg_lake OPTIONS (path '{path}', format 'csv')"
    )
    out = str(tmp_path / "export.csv.gz")
    sess.execute(f"COPY gzsrc TO '{out}'")
    parts = _glob.glob(out + "/*.csv.gz")
    assert parts, _glob.glob(out + "/*")
    import gzip as _gzip

    assert _gzip.open(parts[0], "rt").read().strip() != ""
    # round-trips through the reader (export carries the CSV header)
    assert spark.read.option("header", True).csv(out).count() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zstd compression is not available"):
        sess.execute(f"COPY gzsrc TO '{tmp_path / 'x.json.zst'}'")


def test_review_findings_regressions(sess, spark, tmp_path):
    """Fixes from the r12 self-review: the numeric GUC gates ALTER
    paths too; a QUOTED 'DEFAULT' is a value, not the reset keyword;
    COPY FROM never applies output-compression inference."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE rf_t (id int) USING iceberg")
    sess.execute("SET pg_lake_iceberg.unsupported_numeric_as_double = off")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="precision 38"):
        sess.execute("ALTER TABLE rf_t ADD COLUMN c numeric(50,10)")
    sess.execute("RESET pg_lake_iceberg.unsupported_numeric_as_double")
    sess.execute("ALTER TABLE rf_t ADD COLUMN c numeric(50,10)")
    assert dict(spark.table("rf_t").dtypes)["c"] == "double"

    # quoted 'DEFAULT' stores the string; bare DEFAULT resets — and
    # (ADVICE r12) the reset restores the Python-API warehouse the GUC
    # shadowed, not None
    sess.execute("SET pg_lake_iceberg.default_location_prefix TO 'DEFAULT'")
    assert sess.warehouse == "DEFAULT"
    sess.execute("SET pg_lake_iceberg.default_location_prefix TO DEFAULT")
    assert sess.warehouse == str(tmp_path / "wh")

    # COPY FROM a .gz file reads; no output-compression refusal applies
    import gzip as _gzip

    gz = tmp_path / "in.csv.gz"
    with _gzip.open(gz, "wt") as fh:
        fh.write("k,v,w\n7,z,0.5\n8,y,1.5\n")
    sess.warehouse = str(tmp_path / "wh2")
    sess.execute(f"CREATE TABLE gz_tgt () WITH (definition_from = '{gz}')")
    sess.execute(f"COPY gz_tgt FROM '{gz}' (FORMAT csv)")
    assert sess.lake_table_handle("gz_tgt").to_df().count() == 2


def test_iceberg_inspection_statements(sess, spark, tmp_path):
    """iceberg-tables.md:599-656 inspection surface: iceberg_tables
    view (auto-registered from the warehouse), lake_iceberg.metadata()
    and lake_iceberg.files() with literal urls."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE insp_t (id int, grp string) USING iceberg")
    sess.execute("INSERT INTO insp_t VALUES (1, 'a'), (2, 'b')")
    from pg_lake_spark.lakehouse.iceberg_meta import export_iceberg

    export_iceberg(sess.lake_table_handle("insp_t"))

    rows = sess.execute(
        "SELECT table_name, metadata_location FROM iceberg_tables"
    ).collect()
    assert [r.table_name for r in rows] == ["insp_t"]
    meta_loc = rows[0].metadata_location
    assert meta_loc.endswith(".metadata.json")

    got = sess.execute(
        f"SELECT lake_iceberg.metadata('{meta_loc}') metadata"
    ).collect()[0].metadata
    import json as _json

    assert "format-version" in _json.loads(got)

    # the doc's files() SELECT, columns verbatim, against the export
    import glob as _glob

    exported = sorted(
        _glob.glob(str(tmp_path / "wh" / "insp_t" / "metadata" / "*.metadata.json"))
    )[-1]
    f = sess.execute(
        "select manifest_path, content, file_path, file_format, spec_id, "
        "record_count, file_size_in_bytes "
        f"from lake_iceberg.files('{exported}')"
    ).collect()
    assert len(f) >= 1
    assert all(r.file_format == "PARQUET" and r.record_count >= 1 for r in f)
    assert sum(r.record_count for r in f if r.content == 0) == 2


def test_deletion_queue_view(sess, spark, tmp_path):
    """iceberg-tables.md:857: operators query lake_engine.deletion_queue
    for orphaned files (e.g. the most recent metadata before purge)."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE dq_t (id int) USING iceberg")
    sess.execute("INSERT INTO dq_t VALUES (1), (2), (3)")
    sess.execute("DELETE FROM dq_t WHERE id = 2")  # CoW rewrite queues the old file
    rows = sess.execute(
        "SELECT table_name, path FROM lake_engine.deletion_queue "
        "WHERE table_name = 'dq_t' ORDER BY path"
    ).collect()
    assert rows and all(r.table_name == "dq_t" for r in rows)
    assert all(r.path.endswith(".parquet") for r in rows)


def test_view_rewrites_do_not_touch_literals(sess, spark, tmp_path):
    """Second-review fixes: the inspection-surface rewrites skip
    matches inside string literals, and iceberg_tables never clobbers
    a user registration."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE lit_t (id int, msg string) USING iceberg")
    sess.execute(
        "INSERT INTO lit_t VALUES (1, 'see lake_engine.deletion_queue for info')"
    )
    got = spark.table("lit_t").collect()[0].msg
    assert got == "see lake_engine.deletion_queue for info"
    # a literal mentioning lake_iceberg.files('x') is data — no eager
    # metadata read, no FileNotFoundError
    sess.execute(
        "INSERT INTO lit_t VALUES (2, \"try lake_iceberg.files('/nope') next\")"
    )
    assert spark.table("lit_t").count() == 2

    # user-owned iceberg_tables view survives auto-registration checks
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("iceberg_tables")
    rows = sess.execute("SELECT * FROM iceberg_tables").collect()
    assert rows == [type(rows[0])(x=1)] or rows[0].x == 1
    spark.catalog.dropTempView("iceberg_tables")


def test_deletion_queue_includes_dropped_tables(sess, spark, tmp_path):
    """DROP enqueues every retained file; the queue view must show them
    (the doc's recovery workflow targets exactly dropped tables)."""
    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE dropq_t (id int) USING iceberg")
    sess.execute("INSERT INTO dropq_t VALUES (1), (2)")
    sess.execute("DROP TABLE dropq_t")
    rows = sess.execute(
        "SELECT path FROM lake_engine.deletion_queue WHERE table_name = 'dropq_t'"
    ).collect()
    assert rows and any(r.path.endswith(".parquet") for r in rows)


def test_copy_sql_forwards_all_options(sess, spark, tmp_path):
    """r13 review: `COPY t TO '...' (FORMAT csv, HEADER false,
    DELIMITER ';')` must honor header/delimiter — the SQL route used to
    forward only compression/partition_by and silently apply defaults."""
    import glob as _glob

    sess.warehouse = str(tmp_path / "wh")
    sess.execute("CREATE TABLE copyopts (id int, s text) USING iceberg")
    sess.execute("INSERT INTO copyopts VALUES (1, 'a'), (2, 'b')")
    out = str(tmp_path / "noheader")
    sess.execute(
        f"COPY copyopts TO '{out}' (FORMAT csv, HEADER false, DELIMITER ';')"
    )
    files = _glob.glob(os.path.join(out, "*.csv"))
    body = sorted(
        line for f in files for line in open(f).read().splitlines()
    )
    assert body == ["1;a", "2;b"]  # no header, semicolon delimiter
    # unknown options still refuse loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="invalid option"):
        sess.execute(f"COPY copyopts TO '{tmp_path/'x'}' (FORMAT csv, BOGUS on)")


def test_fmt_inferred_from_last_segment_only(tmp_path):
    """A dot in a directory/bucket name must not poison the extension
    sniff ('s3://my.bucket/data' read fmt='bucket/data'; r15 review)."""
    from pg_lake_spark.ddl import _fmt_from_options

    assert _fmt_from_options({}, "s3://my.bucket/data") == "parquet"
    assert _fmt_from_options({}, "s3://my.bucket/data/f.csv") == "csv"
    assert _fmt_from_options({}, "/a.b/dir/part.json.gz") == "json"
    assert _fmt_from_options({}, "https://example.com/download") == "parquet"
    assert _fmt_from_options({"format": "CSV"}, "x.parquet") == "csv"


def test_parse_options_valueless_boolean_shorthand():
    """PG's (FORMAT csv, HEADER) means HEADER true — the old regex
    backtracked 'HEADER' into key 'heade' value 'R' (r15 review)."""
    from pg_lake_spark.ddl import _parse_options

    assert _parse_options("FORMAT csv, HEADER") == {
        "format": "csv",
        "header": "true",
    }
    assert _parse_options("HEADER, FREEZE") == {
        "header": "true",
        "freeze": "true",
    }
    # existing spellings unchanged
    assert _parse_options("path 's3://b/x', format 'csv'") == {
        "path": "s3://b/x",
        "format": "csv",
    }


def test_update_set_string_literal_with_comma(sess, spark, tmp_path):
    """_split_top is quote-aware: a comma (or paren) inside a SET
    string literal mis-split the assignments (r15 review)."""
    sess.execute(
        f"CREATE TABLE tu (id int, msg string, n int) USING iceberg "
        f"WITH (location '{tmp_path / 'tu'}')"
    )
    sess.execute("INSERT INTO tu VALUES (1, 'x', 0), (2, 'y', 0)")
    sess.execute("UPDATE tu SET msg = 'hello, world', n = 7 WHERE id = 1")
    rows = {r.id: (r.msg, r.n) for r in sess.execute("SELECT * FROM tu").collect()}
    assert rows[1] == ("hello, world", 7)
    assert rows[2] == ("y", 0)
    sess.execute("UPDATE tu SET msg = ':)', n = 9 WHERE id = 2")
    rows = {r.id: (r.msg, r.n) for r in sess.execute("SELECT * FROM tu").collect()}
    assert rows[2] == (":)", 9)


def test_copy_from_refreshes_temp_view(sess, spark, tmp_path):
    """COPY t FROM must re-register the snapshot-pinned temp view like
    every other mutating handler (r15 review: a following SELECT read
    the pre-import snapshot)."""
    src = _write_csv(tmp_path, "imp.csv")
    sess.execute(
        f"CREATE TABLE tc (k int, v string, w double) USING iceberg "
        f"WITH (location '{tmp_path / 'tc'}')"
    )
    assert sess.execute("SELECT count(*) AS n FROM tc").collect()[0].n == 0
    sess.execute(f"COPY tc FROM '{src}' WITH (format 'csv', header 'true')")
    assert sess.execute("SELECT count(*) AS n FROM tc").collect()[0].n == 3


def test_merge_rewrites_target_alias(sess, spark, tmp_path):
    """MERGE SET expressions referencing the TARGET alias must resolve
    (table.merge evaluates over canonical t/s; 'o.total + u.amount'
    previously failed AnalysisException; r15 review)."""
    sess.execute(
        f"CREATE TABLE mo (id int, total int) USING iceberg "
        f"WITH (location '{tmp_path / 'mo'}')"
    )
    sess.execute("INSERT INTO mo VALUES (1, 10), (2, 20)")
    src = spark.createDataFrame([(1, 5, 0)], "id int, amount int, total int")
    src.createOrReplaceTempView("mu")
    sess.execute(
        "MERGE INTO mo o USING mu u ON o.id = u.id "
        "WHEN MATCHED THEN UPDATE SET total = o.total + u.amount "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {r.id: r.total for r in sess.execute("SELECT * FROM mo").collect()}
    assert rows == {1: 15, 2: 20}


def test_update_from_alias_literally_t(sess, spark, tmp_path):
    """Sequential alias substitution self-clobbered when the source
    alias was literally 't' (r15 review: both sides became 's.')."""
    sess.execute(
        f"CREATE TABLE uo (id int, total int) USING iceberg "
        f"WITH (location '{tmp_path / 'uo'}')"
    )
    sess.execute("INSERT INTO uo VALUES (1, 10), (2, 20)")
    spark.createDataFrame([(1, 100)], "id int, amount int").createOrReplaceTempView(
        "txn"
    )
    sess.execute(
        "UPDATE uo SET total = t.amount FROM txn t WHERE uo.id = t.id"
    )
    rows = {r.id: r.total for r in sess.execute("SELECT * FROM uo").collect()}
    assert rows == {1: 100, 2: 20}


def test_create_column_named_like_type(sess, spark, tmp_path):
    """A column NAMED like a type must keep its name — the blob-wide
    type substitution renamed (text text) to (string string)
    (r15 review)."""
    sess.execute(
        f"CREATE TABLE tt (text text, n integer) USING iceberg "
        f"WITH (location '{tmp_path / 'tt'}')"
    )
    sess.execute("INSERT INTO tt VALUES ('abc', 1)")
    row = sess.execute("SELECT text, n FROM tt").collect()[0]
    assert row.text == "abc" and row.n == 1


def test_alter_add_column_not_null_constraint_stripped(sess, spark, tmp_path):
    """ADD COLUMN c int NOT NULL: the constraint must not reach
    add_column inside the type string (r15 review)."""
    sess.execute(
        f"CREATE TABLE ta (id int) USING iceberg "
        f"WITH (location '{tmp_path / 'ta'}')"
    )
    sess.execute("INSERT INTO ta VALUES (1)")
    sess.execute("ALTER TABLE ta ADD COLUMN c int NOT NULL DEFAULT 5")
    row = sess.execute("SELECT id, c FROM ta").collect()[0]
    assert (row.id, row.c) == (1, 5)
