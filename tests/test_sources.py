"""Reader/writer surface tests: CSV sniffing, globbing, filename column,
log scan, file listing, COPY round-trips (reference test analogues:
test_csv_options.py, test_compressed_fdw.py, test_filename.py).
"""

from __future__ import annotations

import gzip
import os

import pytest

from pg_lake_spark.sources import copy_to, list_files, read_lake, sniff_csv_dialect
from tests.conftest import SF_DIR


@pytest.fixture()
def nationlike(spark):
    return spark.createDataFrame(
        [(0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1), (3, "CANADA", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def test_sniff_comma_header(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b,c\n1,x,2.5\n2,y,3.5\n")
    d = sniff_csv_dialect(str(p))
    assert d["sep"] == "," and d["header"] is True


def test_sniff_semicolon(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id;name;val\n1;aa;2\n2;bb;3\n")
    assert sniff_csv_dialect(str(p))["sep"] == ";"


def test_csv_roundtrip_with_sniffing(spark, nationlike, tmp_path):
    out = str(tmp_path / "nation_csv")
    copy_to(nationlike, out, "csv", compression="none", single_file=True)
    back = read_lake(spark, out, "csv")
    assert sorted(r.n_name for r in back.collect()) == ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA"]
    assert dict(back.dtypes)["n_nationkey"] == "int"  # inferSchema


def test_csv_gzip_roundtrip(spark, nationlike, tmp_path):
    out = str(tmp_path / "nation_gz")
    copy_to(nationlike, out, "csv", compression="gzip")
    files = [f for f in os.listdir(out) if f.endswith(".csv.gz")]
    assert files, "expected gzip csv parts"
    back = read_lake(spark, out + "/*.csv.gz", "csv", header=True, inferSchema=True)
    assert back.count() == 4


def test_json_roundtrip(spark, nationlike, tmp_path):
    out = str(tmp_path / "nation_json")
    copy_to(nationlike, out, "json", compression="none")
    back = read_lake(spark, out, "json")
    assert back.count() == 4


def test_parquet_glob_and_filename(spark, nationlike, tmp_path):
    for i in range(3):
        copy_to(nationlike.limit(i + 1), str(tmp_path / f"part{i}.parquet"), "parquet")
    df = read_lake(spark, str(tmp_path / "part*.parquet"), "parquet", filename=True)
    assert df.count() == 6  # 1+2+3
    names = {os.path.basename(r.filename).split("/")[-1] for r in df.select("filename").collect()}
    assert len({n for n in names}) >= 1


def test_filename_column(spark):
    df = read_lake(spark, os.path.join(SF_DIR, "region.parquet"), "parquet", filename=True)
    assert "filename" in df.columns
    assert all("region.parquet" in r.filename for r in df.collect())


def test_list_files(spark):
    df = list_files(spark, os.path.join(SF_DIR, "*.parquet"))
    rows = df.collect()
    assert any(r.path.endswith("lineitem.parquet") for r in rows)
    assert all(r.size_bytes > 0 for r in rows)


def test_log_reader(spark, tmp_path):
    line = (
        "79a5 mybucket [06/Feb/2019:00:00:38 +0000] 192.0.2.3 79a5 3E57427F3EXAMPLE "
        'REST.GET.VERSIONING mykey "GET /mybucket?versioning HTTP/1.1" 200 - - 113 7 10'
    )
    p = tmp_path / "access.log"
    p.write_text(line + "\n" + line + "\n")
    df = read_lake(spark, str(p), "log")
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0].bucket == "mybucket"
    assert rows[0].http_status == 200
    assert rows[0].bytes_sent is None  # '-' → NULL
    assert rows[0].object_size == 113


def test_copy_to_validates():
    with pytest.raises(ValueError):
        copy_to(None, "/tmp/x", "avro")
    with pytest.raises(ValueError):
        copy_to(None, "/tmp/x", "parquet", compression="bzip2")


def test_csv_partition_by(spark, nationlike, tmp_path):
    out = str(tmp_path / "by_region")
    copy_to(nationlike, out, "parquet", partition_by=["n_regionkey"])
    assert os.path.isdir(os.path.join(out, "n_regionkey=1"))
    back = read_lake(spark, out, "parquet")
    assert back.count() == 4


def test_copy_from_csv_into_lake_table(spark, nationlike, tmp_path):
    from pg_lake_spark.lakehouse.table import LakeTable
    from pg_lake_spark.sources.writers import copy_from, copy_to

    csv_url = str(tmp_path / "nation_csv")
    copy_to(nationlike, csv_url, fmt="csv", compression="none")

    t = LakeTable.create(
        spark,
        str(tmp_path / "nation_lake"),
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in nationlike.schema.fields),
    )
    snap = copy_from(spark, csv_url, t, fmt="csv", header=True, auto_detect=True)
    assert snap.operation == "append"
    got = sorted(tuple(r) for r in t.to_df().collect())
    want = sorted(tuple(r) for r in nationlike.collect())
    assert got == want

    # Spark-only names are NOT part of the PG COPY surface and must raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="invalid option"):
        copy_from(spark, csv_url, t, fmt="csv", inferSchema=True)


def test_copy_from_translates_null_marker(spark, tmp_path):
    """PG `null` option must reach the CSV reader as nullValue (round-2
    ADVICE: it was silently dropped and markers loaded as strings)."""
    from pg_lake_spark.lakehouse.table import LakeTable
    from pg_lake_spark.sources.writers import copy_from

    src_csv = tmp_path / "null_marker"
    src_csv.mkdir()
    (src_csv / "part.csv").write_text("k,v\n1,alpha\n2,\\N\n3,beta\n")
    t = LakeTable.create(spark, str(tmp_path / "null_lake"), "k int, v string")
    copy_from(spark, str(src_csv), t, fmt="csv", header=True, null="\\N")
    rows = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert rows == {1: "alpha", 2: None, 3: "beta"}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from pg_lake_spark.plans import plan_summary
    from pg_lake_spark.sources.bucketed import co_located_join, write_bucketed

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "k"), "b_orders", ["k"], 8,
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "k"), "b_lineitem", ["k"], 8,
        path=str(tmp_path / "b_lineitem"),
    )
    # at test scale the planner would broadcast instead and ignore the
    # buckets; force the (at-scale) shuffle-join path to show it needs
    # no exchange over pre-bucketed inputs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, "b_orders", "b_lineitem", on=["k"])
        # correctness: same as the plain join
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey)
        assert joined.count() == plain.count()
        # the point: no exchange on either side of the join
        s = plan_summary(joined, execute=True)
        assert s.exchanges == 0, f"bucketed join must not shuffle (got {s.exchanges})"
        assert s.shuffle_joins == 1  # SMJ over pre-bucketed inputs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_co_located_join_rejects_mismatched_specs(spark, tmp_path):
    """Mismatched bucket counts / columns / join keys silently degrade
    to a full shuffle join — co_located_join must refuse instead."""
    import pytest

    from pg_lake_spark.sources.bucketed import co_located_join, write_bucketed

    df = spark.range(100).selectExpr("id AS k", "id AS v")
    write_bucketed(df, "b_mm_8", ["k"], 8, path=str(tmp_path / "m8"))
    write_bucketed(df, "b_mm_16", ["k"], 16, path=str(tmp_path / "m16"))
    write_bucketed(df, "b_mm_v", ["v"], 8, path=str(tmp_path / "mv"))
    plain = df.selectExpr("k", "v AS w")
    plain.write.mode("overwrite").option("path", str(tmp_path / "mp")).saveAsTable(
        "b_mm_plain"
    )
    try:
        with pytest.raises(ValueError, match="bucket counts differ"):
            co_located_join(spark, "b_mm_8", "b_mm_16", on=["k"])
        with pytest.raises(ValueError, match="bucket specs"):
            co_located_join(spark, "b_mm_8", "b_mm_v", on=["k"])
        with pytest.raises(ValueError, match="requires bucketed"):
            co_located_join(spark, "b_mm_8", "b_mm_plain", on=["k"])
        with pytest.raises(ValueError, match="bucket specs"):
            co_located_join(spark, "b_mm_8", "b_mm_8", on=["v"])  # off-key join
        assert co_located_join(spark, "b_mm_8", "b_mm_8", on=["k"]).count() == 100
    finally:
        for t in ("b_mm_8", "b_mm_16", "b_mm_v", "b_mm_plain"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_co_located_join_accepts_reordered_keys(spark, tmp_path):
    """Key ORDER is free: Spark reorders join keys against the bucket
    spec, so bucketBy(a,b) joined on [b,a] runs with zero exchanges —
    the r15 ordered-list validation wrongly rejected it (self-review).
    Subset/superset keys stay rejected: both shuffle under the default
    requireAllClusterKeysForCoPartition."""
    import pytest

    from pg_lake_spark.plans import plan_summary
    from pg_lake_spark.sources.bucketed import co_located_join, write_bucketed

    df = spark.range(200).selectExpr("id % 7 AS a", "id % 5 AS b", "id AS v")
    write_bucketed(df, "b_ro_l", ["a", "b"], 8, path=str(tmp_path / "rol"))
    write_bucketed(df, "b_ro_r", ["a", "b"], 8, path=str(tmp_path / "ror"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, "b_ro_l", "b_ro_r", on=["b", "a"])
        assert j.count() > 0
        assert plan_summary(j, execute=True).exchanges == 0
        with pytest.raises(ValueError, match="bucket specs"):
            co_located_join(spark, "b_ro_l", "b_ro_r", on=["a", "b", "v"])
        with pytest.raises(ValueError, match="bucket specs"):
            co_located_join(spark, "b_ro_l", "b_ro_r", on=["a"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("b_ro_l", "b_ro_r"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_copy_to_force_quote_column_list(spark, tmp_path):
    """PG FORCE_QUOTE (col, ...) semantics (reference copy.c:815 passes
    the list through to the engine's CSV writer): forced columns are
    always quoted, others only when needed, NULLs never, empty strings
    written as \"\" like PG."""
    from pg_lake_spark.sources.writers import copy_to

    df = spark.createDataFrame(
        [
            (1, "plain", "x"),
            (2, "has,comma", "y"),
            (3, 'has"quote', None),
            (4, "", "z"),
        ],
        "k int, a string, b string",
    )
    out = str(tmp_path / "fq")
    copy_to(
        df.coalesce(1), out, fmt="csv", compression="none", force_quote=["b"]
    )
    # the force-quote path writes pre-formatted lines via the TEXT
    # writer (.txt parts) — the CSV writer NUL-wrapped any line holding
    # its delimiter or an embedded newline
    csv_file = next(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith((".csv", ".txt"))
    )
    lines = sorted(open(csv_file).read().splitlines())[:-1]  # drop header
    assert lines == [
        '1,plain,"x"',
        '2,"has,comma","y"',
        '3,"has""quote",',
        '4,"","z"',
    ]
    # round-trips through a PG-dialect CSV reader (DuckDB) unchanged,
    # including the NULL-vs-empty-string distinction
    import duckdb

    back = duckdb.sql(
        f"SELECT * FROM read_csv('{csv_file}', header=true, allow_quoted_nulls=false)"
    ).fetchall()
    assert sorted(back) == sorted(map(tuple, df.collect()))

    with pytest.raises(ValueError, match="not in result"):
        copy_to(
            df, str(tmp_path / "fq2"), fmt="csv", compression="none",
            force_quote=["nope"],
        )
    with pytest.raises(ValueError, match="invalid option"):
        copy_to(df, str(tmp_path / "fq3"), fmt="parquet", force_quote=["b"])


def test_zip_path_reader(spark, tmp_path):
    """.zip archives read through the zip_path option (file-formats-
    reference.md:118-126): exact member, glob member set, and the
    no-match loud failure."""
    import zipfile

    from pg_lake_spark.sources.readers import read_lake

    z = str(tmp_path / "bundle.zip")
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("data/a.csv", "k,v\n1,10.5\n2,20.5\n")
        zf.writestr("data/b.csv", "k,v\n3,30.5\n")
        zf.writestr("other/ignore.txt", "nope")

    one = read_lake(spark, z, fmt="csv", zip_path="data/a.csv")
    assert sorted((r.k, r.v) for r in one.collect()) == [(1, 10.5), (2, 20.5)]

    both = read_lake(spark, z, fmt="csv", zip_path="data/*.csv")
    assert sorted(r.k for r in both.collect()) == [1, 2, 3]

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="no member matching"):
        read_lake(spark, z, fmt="csv", zip_path="missing/*.csv")


def test_session_describe(spark, tmp_path):
    """DESCRIBE parity (describe.c): column/type rows per format,
    GeoParquet geometry columns typed geometry(WKB) (describe.c:225)."""
    from pg_lake_spark.functions import spatial as S
    from pg_lake_spark.session import LakeSession
    from pg_lake_spark.sources.geoparquet import attach_geo_metadata

    sess = LakeSession(spark)
    pq = str(tmp_path / "d.parquet")
    spark.createDataFrame([(1, "a", 1.5)], "k bigint, s string, v double").write.parquet(pq)
    rows = {r.column: r.type for r in sess.describe(pq).collect()}
    assert rows == {"k": "bigint", "s": "string", "v": "double"}

    gpq = str(tmp_path / "g.parquet")
    spark.createDataFrame([(1, 2.0, 3.0)], "id bigint, x double, y double").select(
        "id", S.st_point("x", "y").alias("geom")
    ).write.parquet(gpq)
    attach_geo_metadata(spark, gpq, ["geom"])
    rows = {r.column: r.type for r in sess.describe(gpq).collect()}
    assert rows == {"id": "bigint", "geom": "geometry(WKB)"}

    csv = tmp_path / "d.csv"
    csv.write_text("a,b\n1,2.5\n3,4.5\n")
    rows = {r.column: r.type for r in sess.describe(str(csv), fmt="csv").collect()}
    assert rows == {"a": "int", "b": "double"}


def test_lake_file_utilities(spark, tmp_path):
    """lake_file.exists/size/preview/copy/delete parity
    (pg_lake_file_* SQL utilities) over the Hadoop FS API."""
    from pg_lake_spark.sources.readers import (
        copy_file,
        delete_file,
        file_exists,
        file_preview,
        file_size,
    )

    p = tmp_path / "blob.bin"
    p.write_bytes(b"pg_lake preview bytes" + b"\x00" * 100)
    path = str(p)
    assert file_exists(spark, path) is True
    assert file_exists(spark, path + ".nope") is False
    assert file_size(spark, path) == 121
    assert file_preview(spark, path, 7) == b"pg_lake"
    dst = str(tmp_path / "copy.bin")
    copy_file(spark, path, dst)
    assert file_size(spark, dst) == 121
    assert delete_file(spark, dst) is True
    assert file_exists(spark, dst) is False


def test_table_size_and_unreferenced(spark, tmp_path):
    from pg_lake_spark.lakehouse.maintenance import (
        find_all_referenced_files,
        find_unreferenced_files,
        table_size,
    )
    from pg_lake_spark.lakehouse.table import LakeTable

    loc = str(tmp_path / "t")
    t = LakeTable.create_from_dataframe(spark, loc, spark.range(50).selectExpr("id AS k"))
    s = table_size(t)
    assert s["rows"] == 50 and s["files"] >= 1 and s["bytes"] > 0
    assert len(find_all_referenced_files(t)) == s["files"]
    assert find_unreferenced_files(t) == []
    import os as _os

    orphan = _os.path.join(loc, "data", "orphan.parquet")
    open(orphan, "wb").write(b"zz")
    assert [_os.path.basename(f) for f in find_unreferenced_files(t)] == ["orphan.parquet"]


def test_wasp_map_reader(spark, tmp_path):
    """GDAL-funnel WAsP .map parity: header + (left right n) records
    with wrapped coordinate lines -> LINESTRING rows."""
    from pg_lake_spark.functions.spatial import _to_wkt
    from pg_lake_spark.sources.readers import read_lake

    p = tmp_path / "rough.map"
    p.write_text(
        "Test roughness map\n"
        "0.0 0.0 1.0 0.0\n"
        "0.0 90.0\n"
        "0.0 1000.0 0.0 1000.0\n"
        "0.03 0.1 3\n"
        "0 0 500 250\n"
        "1000 500\n"
        "5.0 5.0 2 0 1000 1000 0\n"
    )
    df = read_lake(spark, str(p), fmt="map")
    rows = df.orderBy("left").collect()
    assert len(rows) == 2
    assert (rows[0].left, rows[0].right) == (0.03, 0.1)
    assert _to_wkt(bytes(rows[0].geometry)) == "LINESTRING(0 0,500 250,1000 500)"
    assert (rows[1].left, rows[1].right) == (5.0, 5.0)
    assert _to_wkt(bytes(rows[1].geometry)) == "LINESTRING(0 1000,1000 0)"


def test_xodr_reader(spark, tmp_path):
    """OpenDRIVE .xodr: line + arc reference-line geometry sampled to a
    LINESTRING; arc endpoints land on the exact circle."""
    import math

    from pg_lake_spark.functions.spatial import _parse
    from pg_lake_spark.sources.readers import read_lake

    p = tmp_path / "road.xodr"
    p.write_text(
        """<?xml version="1.0"?>
<OpenDRIVE>
 <road id="r1" name="Main" length="120">
  <planView>
   <geometry s="0" x="0" y="0" hdg="0" length="100"><line/></geometry>
   <geometry s="100" x="100" y="0" hdg="0" length="20">
     <arc curvature="0.05"/></geometry>
  </planView>
 </road>
</OpenDRIVE>"""
    )
    df = read_lake(spark, str(p), fmt="xodr")
    row = df.collect()[0]
    assert row.road_id == "r1" and row.name == "Main" and row.length == 120.0
    _, coords = _parse(bytes(row.geometry))
    assert coords[0] == (0.0, 0.0) and (100.0, 0.0) in coords
    # arc end: R=20, arc angle = length*k = 1 rad from (100,0) heading 0
    ex = 100 + math.sin(1.0) / 0.05
    ey = -(math.cos(1.0) - 1) / 0.05
    gx, gy = coords[-1]
    assert abs(gx - ex) < 1e-9 and abs(gy - ey) < 1e-9


def test_geo_format_glob_fanout(spark, tmp_path):
    """Single-file geo formats accept globs: per-file parse, unioned,
    with filename stamping."""
    from pg_lake_spark.functions.spatial import _from_wkt
    from pg_lake_spark.sources import flatgeobuf as fgb
    from pg_lake_spark.sources.readers import read_lake

    for i in range(3):
        fgb.write_flatgeobuf(
            str(tmp_path / f"part{i}.fgb"),
            [{"id": i * 10 + j, "geometry": _from_wkt(f"POINT({j} {i})")}
             for j in range(2)],
        )
    df = read_lake(spark, str(tmp_path / "part*.fgb"), fmt="fgb", filename=True)
    assert df.count() == 6
    assert df.select("filename").distinct().count() == 3
    assert sorted(r.id for r in df.collect()) == [0, 1, 10, 11, 20, 21]


def test_copy_csv_date_format_option(spark, tmp_path):
    """DuckDB-style COPY dateformat option (strftime codes) translates
    to Spark patterns on both COPY TO and the read side — a text column
    that LOOKS like a US date never corrupts a real date column
    (reference regression test_csv_date_format.py)."""
    from pg_lake_spark.sources.writers import copy_to, strftime_to_java

    assert strftime_to_java("%d/%m/%Y") == "dd/MM/yyyy"
    assert strftime_to_java("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    # '%%' is one token (a literal %, quoted for Java) — never rejected,
    # never half-eaten by a code ('%%S' is literal-% then seconds)
    assert strftime_to_java("%Y%%") == "yyyy'%'"
    assert strftime_to_java("%%S") == "'%S'"
    # bare letters in the format are literals and must be quoted
    assert strftime_to_java("T%HZ") == "'T'HH'Z'"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported"):
        strftime_to_java("%Q")

    df = spark.sql(
        "SELECT '12/25/2020' AS txt, DATE'2021-03-10' AS d"
    )
    out = str(tmp_path / "dates")
    copy_to(df, out, fmt="csv", compression="gzip", date_format="%d/%m/%Y")
    back = (
        spark.read.option("header", True)
        .option("dateFormat", "dd/MM/yyyy")
        .schema("txt string, d date")
        .csv(out)
        .collect()[0]
    )
    import datetime

    assert back.txt == "12/25/2020" and back.d == datetime.date(2021, 3, 10)


def test_gdal_umbrella_format_inference(spark, tmp_path):
    """format 'gdal' infers the concrete vector reader from the file
    (docs/spatial.md: 'the GDAL format will be inferred'), including a
    zip named without .zip via OPTIONS (compression 'zip')."""
    import zipfile

    from pg_lake_spark.functions.spatial import _from_wkt
    from pg_lake_spark.sources import flatgeobuf as fgb
    from pg_lake_spark.sources.readers import read_lake

    # fgb by magic (no extension)
    p = str(tmp_path / "layer.fgb")
    fgb.write_flatgeobuf(p, [{"id": 1, "geometry": _from_wkt("POINT(1 2)")}])
    assert read_lake(spark, p, fmt="gdal").count() == 1

    # geojson by content
    gj = str(tmp_path / "pts.geojson")
    open(gj, "w").write(
        '{"type":"FeatureCollection","features":[{"type":"Feature",'
        '"geometry":{"type":"Point","coordinates":[3,4]},"properties":{"a":1}}]}'
    )
    assert read_lake(spark, gj, fmt="gdal").count() == 1

    # zip without .zip extension + compression 'zip'
    blob = str(tmp_path / "download")  # no extension, like a WFS endpoint
    with zipfile.ZipFile(blob, "w") as z:
        z.write(gj, "pts.geojson")
    df = read_lake(spark, blob, fmt="gdal", compression="zip")
    assert df.count() == 1


def test_gdal_inference_kml(spark, tmp_path):
    from pg_lake_spark.sources.readers import read_lake

    p = str(tmp_path / "doc.noext")
    open(p, "w").write(
        '<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2">'
        "<Document><Placemark><name>x</name>"
        "<Point><coordinates>5,6</coordinates></Point>"
        "</Placemark></Document></kml>"
    )
    assert read_lake(spark, p, fmt="gdal").count() == 1


def test_filename_column_on_parsed_frames(spark, tmp_path):
    """Third-review fix: driver-parsed formats (createDataFrame frames)
    have no scan for input_file_name() — filename=True must stamp the
    resolved path, not an empty string."""
    from pg_lake_spark.sources.readers import read_lake

    (tmp_path / "m.mif").write_text(
        "Version 300\nDelimiter \",\"\nColumns 1\n  name Char(10)\nData\n\n"
        "POINT 1 2\n"
    )
    (tmp_path / "m.mid").write_text('"a"\n')
    df = read_lake(spark, str(tmp_path / "m.mif"), fmt="mif", filename=True)
    vals = [r.filename for r in df.select("filename").collect()]
    assert vals and all(v.endswith("m.mif") for v in vals)


def test_geojson_ndjson_mentioning_featurecollection(spark, tmp_path):
    """Third-review fix: the layout decision uses the PARSED type — a
    Feature whose property value mentions 'FeatureCollection' is still
    NDJSON; a bare top-level array parses as features."""
    from pg_lake_spark.sources.readers import read_geojson

    nd = tmp_path / "tricky.geojsonl"
    nd.write_text(
        '{"type": "Feature", "geometry": {"type": "Point", "coordinates": [1, 2]}, '
        '"properties": {"note": "from a FeatureCollection export"}}\n'
        '{"type": "Feature", "geometry": {"type": "Point", "coordinates": [3, 4]}, '
        '"properties": {}}\n'
    )
    assert read_geojson(spark, str(nd)).count() == 2

    arr = tmp_path / "arr.json"
    arr.write_text(
        '[{"type": "Feature", "geometry": {"type": "Point", "coordinates": [5, 6]}, '
        '"properties": {}}]'
    )
    assert read_geojson(spark, str(arr)).count() == 1

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_geojson(spark, str(tmp_path / "missing" / "*.geojson"))


def test_geojson_sniff_multibyte_split_across_chunks(spark, tmp_path):
    """ADVICE r12: the sniff must decode the accumulated bytes ONCE —
    per-chunk decoding turns a multibyte char that straddles the 64 KiB
    chunk boundary into U+FFFD, fails the first-line JSON parse, and
    misroutes a valid NDJSON file to the wholetext path."""
    from pg_lake_spark.sources.readers import read_geojson

    # pad so a 2-byte UTF-8 char ('é' = 0xC3 0xA9) straddles byte 65536
    prefix = (
        '{"type": "Feature", "geometry": {"type": "Point", '
        '"coordinates": [1, 2]}, "properties": {"pad": "'
    )
    pad = "x" * (64 * 1024 - len(prefix.encode()) - 1)
    line1 = prefix + pad + 'é close"}}'
    assert line1.encode()[64 * 1024 - 1 : 64 * 1024 + 1] == "é".encode()
    nd = tmp_path / "split.geojsonl"
    nd.write_text(
        line1 + "\n"
        '{"type": "Feature", "geometry": {"type": "Point", '
        '"coordinates": [3, 4]}, "properties": {"pad": "y"}}\n'
    )
    df = read_geojson(spark, str(nd))
    assert df.count() == 2  # NDJSON routing, one row per line


def test_gunzipped_prunes_superseded_copies(tmp_path):
    """ADVICE r12: rewriting a .gz source mints a new cache key — the
    superseded decompressed copy for the same basename must be pruned,
    not accumulate forever."""
    import glob
    import gzip
    import os
    import tempfile

    from pg_lake_spark.sources.readers import _gunzipped

    src = tmp_path / "grow.bin.gz"
    pat = os.path.join(tempfile.gettempdir(), "pg_lake_gz_*_grow.bin")
    for stale in glob.glob(pat):
        os.unlink(stale)
    with gzip.open(src, "wb") as fh:
        fh.write(b"one")
    first = _gunzipped(str(src))
    assert open(first, "rb").read() == b"one"
    os.utime(src, (1, 1))  # force a different mtime component in the key
    with gzip.open(src, "wb") as fh:
        fh.write(b"two-longer")
    second = _gunzipped(str(src))
    assert open(second, "rb").read() == b"two-longer"
    assert second != first
    left = glob.glob(pat)
    assert left == [second], f"stale copies not pruned: {left}"


def test_gunzipped_prune_spares_other_basenames(tmp_path):
    """ADVICE r13: the prune glob must not cross underscores — caching
    'x.csv.gz' must leave the live copy of 'prefix_x.csv.gz' (whose
    name also ends in '_x.csv') untouched."""
    import glob
    import gzip
    import os
    import tempfile

    from pg_lake_spark.sources.readers import _gunzipped

    for pat in ("pg_lake_gz_*_x.csv", "pg_lake_gz_*_prefix_x.csv"):
        for stale in glob.glob(os.path.join(tempfile.gettempdir(), pat)):
            os.unlink(stale)
    other = tmp_path / "prefix_x.csv.gz"
    with gzip.open(other, "wb") as fh:
        fh.write(b"a,b\n1,2\n")
    kept = _gunzipped(str(other))
    src = tmp_path / "x.csv.gz"
    with gzip.open(src, "wb") as fh:
        fh.write(b"c,d\n3,4\n")
    _gunzipped(str(src))
    os.utime(src, (1, 1))
    with gzip.open(src, "wb") as fh:
        fh.write(b"c,d\n5,6\n")
    _gunzipped(str(src))  # prunes x.csv's superseded copy only
    assert os.path.exists(kept), "live cache of prefix_x.csv.gz was unlinked"


def test_copy_to_header_pg_spellings(spark, tmp_path):
    """ADVICE r13: a direct copy_to caller passing header='off' (PG
    spelling) must not get a header line — previously only 'false'
    suppressed it; and 'on' must not leak to Spark's CSV parser.
    r14 second review: PG parse_bool prefixes ('of', 'n', 'f') count
    too, and an invalid spelling raises instead of silently meaning
    False."""
    from pg_lake_spark.sources.writers import copy_to, pg_bool

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    for spelling in ("off", "0", "no", "false", "of", "n", "f"):
        out = str(tmp_path / f"h_{spelling}")
        copy_to(df.coalesce(1), out, fmt="csv", compression="none", header=spelling)
        part = next(p for p in os.listdir(out) if p.startswith("part-"))
        assert open(os.path.join(out, part)).read().splitlines() == ["1,a"]
    for spelling in ("on", "tr", "y", "1", "TRUE"):
        out = str(tmp_path / f"h_t_{spelling}")
        copy_to(df.coalesce(1), out, fmt="csv", compression="none", header=spelling)
        part = next(p for p in os.listdir(out) if p.startswith("part-"))
        assert open(os.path.join(out, part)).read().splitlines() == ["k,v", "1,a"]
    import pytest as _pytest

    for bad in ("banana", "o", "onn", ""):
        with _pytest.raises(ValueError, match="invalid input syntax"):
            pg_bool(bad)


def test_copy_to_force_quote_hostile_values(spark, tmp_path):
    """r13 review: values holding an embedded newline (legal CSV when
    quoted) or the old internal writer delimiter \\x01 round-trip — the
    CSV writer used to NUL-wrap those lines."""
    import glob as _glob

    import duckdb

    from pg_lake_spark.sources.writers import copy_to

    df = spark.createDataFrame(
        [(1, "plain", "x"), (2, "line\nbreak", "y"), (3, "ctl\x01char", "z")],
        "k int, a string, b string",
    )
    out = str(tmp_path / "fqh")
    copy_to(df.coalesce(1), out, fmt="csv", compression="none", force_quote=["b"])
    f = _glob.glob(os.path.join(out, "*.txt"))[0]
    raw = open(f, "rb").read()
    assert b"\x00" not in raw, "writer NUL-wrapped a formatted line"
    back = duckdb.sql(
        f"SELECT * FROM read_csv('{f}', header=true)"
    ).fetchall()
    assert sorted(back) == sorted(map(tuple, df.collect()))


def test_copy_to_force_quote_honors_date_format(spark, tmp_path):
    """r13 review: DATE_FORMAT/TIMESTAMP_FORMAT apply on the force-quote
    path too (the writer option used to act on pre-formatted strings
    and silently did nothing)."""
    import glob as _glob

    from pg_lake_spark.sources.writers import copy_to

    df = spark.sql("SELECT 1 AS k, DATE'2024-01-05' AS d, 'v' AS b")
    out = str(tmp_path / "fqd")
    copy_to(
        df.coalesce(1), out, fmt="csv", compression="none",
        force_quote=["b"], date_format="%d/%m/%Y",
    )
    f = _glob.glob(os.path.join(out, "*.txt"))[0]
    body = open(f).read().splitlines()
    assert body[1] == '1,05/01/2024,"v"'


def test_copy_to_default_compression_per_format(spark, tmp_path):
    """r13 review: the vanilla copy_to(df, url, 'csv') must not die on
    the parquet-only 'snappy' default — text formats default to
    uncompressed like PG/DuckDB COPY."""
    from pg_lake_spark.sources.writers import copy_to, copy_from

    df = spark.createDataFrame([(1, "a")], "id int, s string")
    copy_to(df, str(tmp_path / "c.csv"), fmt="csv")  # used to raise
    copy_to(df, str(tmp_path / "j.json"), fmt="json")
    copy_to(df, str(tmp_path / "p.parquet"))  # parquet keeps snappy
    assert spark.read.parquet(str(tmp_path / "p.parquet")).count() == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported COPY FROM format"):
        copy_from(spark, str(tmp_path / "c.csv"), None, fmt="txt")


def test_copy_from_case_insensitive_headers(spark, tmp_path):
    """r13 review: a CSV header of 'ID,NAME' loads into (id, name) —
    Spark resolution is case-insensitive and PG folds."""
    from pg_lake_spark.lakehouse.table import LakeTable
    from pg_lake_spark.sources.writers import copy_from

    src = tmp_path / "up.csv"
    src.write_text("ID,NAME\n1,ada\n2,bob\n")
    t = LakeTable.create(spark, str(tmp_path / "ci"), "id int, name string")
    copy_from(spark, str(src), t, fmt="csv", header=True)
    got = {(r.id, r.name) for r in t.to_df().collect()}
    assert got == {(1, "ada"), (2, "bob")}


def test_strftime_reserved_punctuation_quoted():
    """r13 review: DateTimeFormatter reserves [ ] # { } — literal runs
    containing them must be quoted, not passed bare (bare [] becomes an
    optional section; # throws at format time)."""
    from pg_lake_spark.sources.writers import strftime_to_java

    assert strftime_to_java("%Y[%m]") == "yyyy'['MM']'"
    assert strftime_to_java("%d#%m") == "dd'#'MM"
    assert strftime_to_java("%Y-%m-%d") == "yyyy-MM-dd"  # plain stays bare


def test_ns_timestamp_normalization_hostile_column_name(spark, tmp_path):
    """r14 review: a timestamp[ns] parquet column whose name holds a
    space/dot must still normalize to timestamp_ntz — the div-1000
    rewrite goes through F.expr, which needs backtick quoting."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_lake_spark.session import _normalize_ns_timestamps

    p = str(tmp_path / "ns_hostile.parquet")
    tbl = pa.table(
        {
            "event time": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")),
            "v.x": pa.array([1], pa.int64()),
        }
    )
    pq.write_table(tbl, p)
    df = _normalize_ns_timestamps(spark.read.parquet(p), p)
    row = df.collect()[0]
    assert str(row["event time"]).startswith("2023-11-14")
    assert dict(df.dtypes)["event time"] == "timestamp_ntz"


def test_attach_geo_metadata_preserves_codec(spark, tmp_path):
    """The footer rewrite must keep the file's own compression codec
    instead of silently re-compressing with pyarrow's default (r14
    review)."""
    import os

    import pyarrow.parquet as pq

    from pg_lake_spark.functions.spatial import _from_wkt
    from pg_lake_spark.sources.geoparquet import attach_geo_metadata, geo_metadata

    p = str(tmp_path / "gzgeo")
    df = spark.createDataFrame(
        [(1, _from_wkt("POINT (1 2)")), (2, _from_wkt("POINT (3 4)"))],
        "id bigint, geometry binary",
    ).repartition(1)
    df.write.option("compression", "gzip").parquet(p)
    attach_geo_metadata(spark, p, ["geometry"])
    parts = [
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
    ]
    full = [f for f in parts if pq.ParquetFile(f).metadata.num_row_groups > 0]
    assert pq.ParquetFile(full[0]).metadata.row_group(0).column(0).compression == "GZIP"
    assert geo_metadata(p)["columns"]["geometry"]["encoding"] == "WKB"
    assert spark.read.parquet(p).count() == 2


def test_dbf_numeric_overflow_is_null(tmp_path):
    """dBase fills numeric fields with '*' on overflow — that reads as
    NULL, not a float() crash (r14 review)."""
    import struct

    from pg_lake_spark.sources.shapefile import _parse_dbf

    # minimal dBase III: header + one N field (len 8) + two records
    fields = b"VAL".ljust(11, b"\x00") + b"N" + b"\x00" * 4 + bytes([8, 0]) + b"\x00" * 14
    hsize = 32 + 32 + 1
    rsize = 1 + 8
    header = struct.pack("<BBBBIHH", 3, 24, 1, 1, 2, hsize, rsize) + b"\x00" * 20
    recs = b" " + b"     123" + b" " + b"********"
    path = str(tmp_path / "t.dbf")
    with open(path, "wb") as fh:
        fh.write(header + fields + b"\x0d" + recs + b"\x1a")
    fdefs, rows = _parse_dbf(path)
    assert fdefs == [("VAL", "bigint")]
    assert rows == [[123], [None]]


def test_copy_to_force_quote_honors_escape(spark, tmp_path):
    """A declared ESCAPE must apply inside quoted fields (PG
    CopyAttributeOutCSV escapes QUOTE and ESCAPE chars with ESCAPE);
    the force_quote path silently doubled quotes instead, which a
    '\\'-configured reader misparses (r15 review)."""
    from pg_lake_spark.sources.writers import copy_to

    df = spark.createDataFrame([(1, 'he said "hi"', "back\\slash")], "id int, q string, e string")
    url = str(tmp_path / "esc_csv")
    copy_to(df, url, fmt="csv", single_file=True, force_quote=["q"], escape="\\")
    import glob as g

    [f] = g.glob(url + "/part-*")
    lines = open(f).read().splitlines()
    assert lines[0] == "id,q,e"
    assert lines[1] == '1,"he said \\"hi\\"",back\\\\slash' or lines[1] == '1,"he said \\"hi\\"",back\\slash', lines[1]
    # and without ESCAPE the default stays PG quote-doubling
    url2 = str(tmp_path / "esc_csv2")
    copy_to(df.select("id", "q"), url2, fmt="csv", single_file=True, force_quote=["q"])
    [f2] = g.glob(url2 + "/part-*")
    assert open(f2).read().splitlines()[1] == '1,"he said ""hi"""'


def test_copy_to_csv_timestamp_microseconds(spark, tmp_path):
    """Default CSV export must write PG/DuckDB text form — space
    separator, microseconds kept, fraction omitted when zero — on BOTH
    the plain and force_quote paths (Spark's default ISO-'T'
    milliseconds silently truncated microseconds, r15 review)."""
    import glob as g

    from pg_lake_spark.sources.writers import copy_to

    df = spark.sql(
        "SELECT 1 AS id, TIMESTAMP_NTZ'2024-01-15 10:20:30.123456' AS ts, "
        "TIMESTAMP_NTZ'2024-01-15 10:20:30' AS whole"
    )
    plain = str(tmp_path / "ts_plain")
    copy_to(df, plain, fmt="csv", single_file=True)
    [f] = g.glob(plain + "/part-*")
    assert open(f).read().splitlines()[1] == "1,2024-01-15 10:20:30.123456,2024-01-15 10:20:30"
    forced = str(tmp_path / "ts_forced")
    copy_to(df, forced, fmt="csv", single_file=True, force_quote=["id"])
    [f2] = g.glob(forced + "/part-*")
    assert open(f2).read().splitlines()[1] == '"1",2024-01-15 10:20:30.123456,2024-01-15 10:20:30'


def test_copy_from_rejects_extra_source_columns(spark, tmp_path):
    """PG raises 'extra data after last expected column'; silently
    dropping a source column loses data without a whisper."""
    import pytest

    from pg_lake_spark.lakehouse.table import LakeTable
    from pg_lake_spark.sources.writers import copy_from

    src = tmp_path / "extra.csv"
    src.write_text("id,name,amount\n1,a,9.5\n")
    t = LakeTable.create(spark, str(tmp_path / "t_extra"), "id int, name string")
    with pytest.raises(ValueError, match="amount"):
        copy_from(spark, str(src), t, fmt="csv", header=True)


def test_sniff_handles_file_uri_and_partitioned_dirs(spark, tmp_path):
    """file:-scheme paths and Hive-partitioned directories must sniff:
    the old resolver open()'d the raw URI (FileNotFoundError) and the
    first dotless member even when it was a subdirectory
    (IsADirectoryError) — r15 review, both live-reproduced."""
    from pg_lake_spark.sources import sniff_csv_dialect

    plain = tmp_path / "t.csv"
    plain.write_text("id,amount\n1,10\n2,20\n")
    d = sniff_csv_dialect(f"file://{plain}")
    assert d["sep"] == "," and d["header"] is True
    assert sniff_csv_dialect(f"file:{plain}")["sep"] == ","
    # partitioned layout: table/date=2024/part-0.csv
    part = tmp_path / "table" / "date=2024"
    part.mkdir(parents=True)
    (part / "part-0.csv").write_text("k;v\n1;a\n2;b\n")
    assert sniff_csv_dialect(str(tmp_path / "table"))["sep"] == ";"
    # geojson layout sniff shares the resolver
    gj = tmp_path / "gj" / "batch=1"
    gj.mkdir(parents=True)
    import json as _json

    (gj / "f.geojsonl").write_text(
        _json.dumps({"type": "Feature", "geometry": {"type": "Point",
                     "coordinates": [1.0, 2.0]}, "properties": {"k": 1}}) + "\n"
    )
    out = read_lake(spark, str(tmp_path / "gj"), fmt="geojson")
    assert out.count() == 1


def test_remote_csv_sniffs_headerless(spark, tmp_path):
    """Scheme'd CSV paths sniff a bounded sample through Hadoop FS —
    forcing header=True silently ate the first row of every remote
    headerless file (r15 review). file:// exercises the same FS API."""
    from pg_lake_spark.sources.readers import sniff_csv_dialect_remote

    p = tmp_path / "nohdr.csv"
    p.write_text("1,11\n2,22\n3,33\n")
    d = sniff_csv_dialect_remote(spark, f"file://{p}")
    assert d["header"] is False and d["sep"] == ","
    p2 = tmp_path / "hdr.csv"
    p2.write_text("id,name\n1,a\n2,b\n")
    assert sniff_csv_dialect_remote(spark, f"file://{p2}")["header"] is True


def test_remote_csv_sniff_descends_hive_partitions(spark, tmp_path):
    """A hive-partitioned layout has no regular files at the top level
    — the one-level remote listing FileNotFoundError'd a directory
    Spark reads fine; the sniffer now descends like the local path
    (r15 self-review)."""
    from pg_lake_spark.sources.readers import sniff_csv_dialect_remote

    root = tmp_path / "events"
    (root / "date=2024" / "hour=3").mkdir(parents=True)
    (root / "date=2024" / "hour=3" / "part-0.csv").write_text(
        "1;11\n2;22\n3;33\n"
    )
    d = sniff_csv_dialect_remote(spark, f"file://{root}")
    assert d["header"] is False and d["sep"] == ";"
    # read_lake end-to-end: the headerless rows all survive
    from pg_lake_spark.sources.readers import read_lake

    out = read_lake(spark, f"file://{root}", fmt="csv")
    assert out.count() == 3


def test_gdal_sniff_gzipped_json(spark, tmp_path):
    """fc.json.gz must infer geojson: the magic probe read raw gzip
    bytes and failed inference for valid inputs (r15 review)."""
    import gzip
    import json as _json

    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [0.0, 1.0]},
         "properties": {"k": 7}}]}
    p = tmp_path / "fc.json.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(_json.dumps(fc))
    out = read_lake(spark, str(p), fmt="gdal")
    assert out.count() == 1


def test_hf_models_resolve_url():
    from pg_lake_spark.sources.readers import hf_to_https

    assert (
        hf_to_https("hf://models/org/repo/data.csv")
        == "https://huggingface.co/org/repo/resolve/main/data.csv"
    )
    assert (
        hf_to_https("hf://datasets/org/name/f.parquet")
        == "https://huggingface.co/datasets/org/name/resolve/main/f.parquet"
    )


def test_geojson_sniff_bounded_on_minified_collection(spark, tmp_path):
    """A single-line minified FeatureCollection (no trailing newline)
    must not be buffered whole on the driver; the bounded sniff routes
    it to the wholetext path and it still parses."""
    import json as _json

    features = [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [float(i), 0.0]},
         "properties": {"i": i}}
        for i in range(500)
    ]
    p = tmp_path / "mini.geojson"
    p.write_text(_json.dumps({"type": "FeatureCollection", "features": features}))
    assert read_lake(spark, str(p), fmt="geojson").count() == 500


def test_gunzipped_cache_distinct_dirs_same_basename(tmp_path):
    """Two .gz sources with the same basename in different directories
    must keep independent caches — the old prune evicted the live copy
    of the other path (r15 review)."""
    import gzip

    from pg_lake_spark.sources.readers import _gunzipped

    a = tmp_path / "a" / "x.bin.gz"
    b = tmp_path / "b" / "x.bin.gz"
    a.parent.mkdir()
    b.parent.mkdir()
    with gzip.open(a, "wb") as fh:
        fh.write(b"AAA")
    with gzip.open(b, "wb") as fh:
        fh.write(b"BBB")
    la = _gunzipped(str(a))
    lb = _gunzipped(str(b))
    assert open(la, "rb").read() == b"AAA"  # still alive after b's prune
    assert open(lb, "rb").read() == b"BBB"
