"""Scalar-function coverage probes (SURVEY §2.7).

One declared query per function family; each applies the family's
functions row-wise over corpus tables and is verified against the DuckDB
oracle. This mirrors the reference's operator_pushdown/ per-type corpus
(pg_lake_table/tests/pytests/operator_pushdown/test_int4.py:14-80): the
point is not the query shape but pinning down expression semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_lake_spark.functions.pg import pg_div, pg_mod, pg_substring, pg_to_char
from pg_lake_spark.queries.registry import query
from pg_lake_spark.session import load_tables


@query(
    "f_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(-l_quantity)                 AS abs_q,
           CAST(ceil(l_extendedprice / 100) AS BIGINT)  AS ceil_p,
           CAST(floor(l_extendedprice / 100) AS BIGINT) AS floor_p,
           round(l_extendedprice, 1)        AS round_p,
           sqrt(l_quantity)                 AS sqrt_q,
           round(ln(l_extendedprice), 9)    AS ln_p,
           round(log10(l_extendedprice), 9) AS log10_p,
           power(l_quantity, 2)             AS pow_q,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d,
           CAST(greatest(l_quantity, 25) AS DOUBLE) AS greatest_q,
           CAST(least(l_quantity, 25) AS DOUBLE)    AS least_q
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="abs/ceil/floor/round/sqrt/ln/log10/power/sign/greatest/least.",
)
def f_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(-F.col("l_quantity")).alias("abs_q"),
        F.ceil(F.col("l_extendedprice") / 100).alias("ceil_p"),
        F.floor(F.col("l_extendedprice") / 100).alias("floor_p"),
        F.round(F.col("l_extendedprice"), 1).alias("round_p"),
        F.sqrt("l_quantity").alias("sqrt_q"),
        # Rounded on BOTH sides: DuckDB and the JVM libm differ by 1 ulp on a
        # handful of rows, which a bit-exact hash would flag (VERDICT r2).
        F.round(F.log(F.col("l_extendedprice")), 9).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 9).alias("log10_p"),
        F.pow("l_quantity", F.lit(2)).alias("pow_q"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_d"),
        F.greatest(F.col("l_quantity"), F.lit(25)).cast("double").alias("greatest_q"),
        F.least(F.col("l_quantity"), F.lit(25)).cast("double").alias("least_q"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "f_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           sin(l_discount)  AS sin_d,
           cos(l_discount)  AS cos_d,
           tan(l_discount)  AS tan_d,
           asin(l_discount) AS asin_d,
           acos(l_discount) AS acos_d,
           atan(l_discount) AS atan_d,
           atan2(l_discount, l_tax + 0.01) AS atan2_dt,
           degrees(l_discount) AS deg_d,
           radians(l_quantity) AS rad_q,
           (exp(l_discount) - exp(-l_discount)) / 2 AS sinh_d,
           (exp(l_discount) + exp(-l_discount)) / 2 AS cosh_d,
           (exp(2*l_discount) - 1) / (exp(2*l_discount) + 1) AS tanh_d
    FROM lineitem WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Trig + hyperbolic family (rewrite_query.c:165-167 shims analogue).",
)
def f_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_orderkey") <= 200)
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sin(d).alias("sin_d"),
        F.cos(d).alias("cos_d"),
        F.tan(d).alias("tan_d"),
        F.asin(d).alias("asin_d"),
        F.acos(d).alias("acos_d"),
        F.atan(d).alias("atan_d"),
        F.atan2(d, F.col("l_tax") + 0.01).alias("atan2_dt"),
        F.degrees(d).alias("deg_d"),
        F.radians("l_quantity").alias("rad_q"),
        F.sinh(d).alias("sinh_d"),
        F.cosh(d).alias("cosh_d"),
        F.tanh(d).alias("tanh_d"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "f_intdiv",
    oracle="""
    SELECT o_orderkey,
           o_orderkey // 7                  AS div7,
           o_orderkey % 7                   AS mod7,
           CAST(o_orderkey AS DOUBLE) / 7   AS fdiv7
    FROM orders WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    doc="PG integer division semantics: 4/10=0 (rewrite_query.c:189).",
)
def f_intdiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        pg_div("o_orderkey", F.lit(7)).alias("div7"),
        pg_mod("o_orderkey", F.lit(7)).cast("bigint").alias("mod7"),
        (F.col("o_orderkey").cast("double") / 7).alias("fdiv7"),
    ).orderBy("o_orderkey")


@query(
    "f_string",
    oracle="""
    SELECT doc_id,
           length(text)                    AS len,
           upper(substr(text, 1, 12))      AS up12,
           lower(source)                   AS lo_src,
           substr(text, 5, 10)             AS sub_5_10,
           left(text, 6)                   AS left6,
           right(text, 6)                  AS right6,
           lpad(lang, 5, '*')              AS lpad_lang,
           rpad(lang, 5, '*')              AS rpad_lang,
           trim(' ' || lang || ' ')        AS trimmed,
           replace(lang, 'e', 'E')         AS repl,
           reverse(lang)                   AS rev,
           repeat(lang, 2)                 AS rep2,
           split_part(text, ' ', 2)        AS word2,
           strpos(text, 'data')            AS pos_data,
           concat_ws('|', lang, source)    AS cat,
           md5(text)                       AS text_md5,
           ascii(lang)                     AS first_ascii,
           starts_with(text, 'the')        AS starts_the,
           concat(upper(substr(split_part(text, ' ', 1), 1, 1)),
                  substr(split_part(text, ' ', 1), 2)) AS cap_word1
    FROM documents
    ORDER BY doc_id
    """,
    doc="String function family (shippable_builtin_functions.c:412-447).",
)
def f_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    return d.select(
        "doc_id",
        F.length("text").alias("len"),
        F.upper(F.substring("text", 1, 12)).alias("up12"),
        F.lower("source").alias("lo_src"),
        F.substring("text", 5, 10).alias("sub_5_10"),
        F.left(F.col("text"), F.lit(6)).alias("left6"),
        F.right(F.col("text"), F.lit(6)).alias("right6"),
        F.lpad("lang", 5, "*").alias("lpad_lang"),
        F.rpad("lang", 5, "*").alias("rpad_lang"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("lang"), F.lit("e"), F.lit("E")).alias("repl"),
        F.reverse("lang").alias("rev"),
        F.repeat("lang", 2).alias("rep2"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("word2"),
        F.instr(F.col("text"), "data").alias("pos_data"),
        F.concat_ws("|", "lang", "source").alias("cat"),
        F.md5("text").alias("text_md5"),
        F.ascii("lang").alias("first_ascii"),
        F.startswith(F.col("text"), F.lit("the")).alias("starts_the"),
        F.initcap(F.split_part(F.col("text"), F.lit(" "), F.lit(1))).alias("cap_word1"),
    ).orderBy("doc_id")


@query(
    "f_substring_pg",
    oracle="""
    SELECT doc_id,
           CASE WHEN -2 >= 1 THEN substr(text, -2, 5)
                ELSE substr(text, 1, greatest(5 - (1 - -2), 0)) END AS neg_start,
           substr(text, 3, 4) AS pos_start
    FROM documents WHERE doc_id <= 50 ORDER BY doc_id
    """,
    doc="PG negative-start substring (duckdb_pglake_extension.cpp:157 analogue).",
)
def f_substring_pg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") <= 50)
    return d.select(
        "doc_id",
        pg_substring("text", -2, 5).alias("neg_start"),
        pg_substring("text", 3, 4).alias("pos_start"),
    ).orderBy("doc_id")


@query(
    "f_regex",
    oracle="""
    SELECT doc_id,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g') AS no_vowels,
           regexp_matches(text, 'data.*table')                      AS has_seq,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2)             AS second_word,
           count(*) OVER () AS n
    FROM documents WHERE doc_id <= 100 ORDER BY doc_id
    """,
    doc="Regex family: replace (global), match test, capture-group extract.",
)
def f_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") <= 100)
    from pyspark.sql import Window

    return d.select(
        "doc_id",
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "*").alias("no_vowels"),
        F.col("text").rlike("data.*table").alias("has_seq"),
        F.regexp_extract(F.col("text"), "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).orderBy("doc_id")


@query(
    "f_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)     AS y,
           CAST(month(o_orderdate) AS INT)    AS m,
           CAST(day(o_orderdate) AS INT)      AS d,
           CAST(quarter(o_orderdate) AS INT)  AS q,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('year', o_orderdate) AS TIMESTAMP)  AS year_start,
           o_orderdate + INTERVAL 7 DAY       AS plus_week,
           date_diff('day', o_orderdate, TIMESTAMP '2001-12-31') AS days_to_eoy,
           CAST(extract(hour FROM o_orderdate) AS INT) AS hr
    FROM orders WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    doc="extract/date_trunc/interval arithmetic/date_diff family.",
)
def f_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_trunc("year", F.col("o_orderdate")).alias("year_start"),
        F.expr("o_orderdate + INTERVAL 7 DAY").alias("plus_week"),
        F.datediff(F.lit("2001-12-31").cast("timestamp_ntz"), F.col("o_orderdate")).alias(
            "days_to_eoy"
        ),
        F.hour("o_orderdate").alias("hr"),
    ).orderBy("o_orderkey")


@query(
    "f_to_char",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')          AS iso_day,
           strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS eu_ts,
           strftime(o_orderdate, '%Y')                AS just_year
    FROM orders WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    """,
    doc="to_char via PG-format→DateTimeFormatter compiler (to_char.c analogue).",
)
def f_to_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        pg_to_char("o_orderdate", "YYYY-MM-DD").alias("iso_day"),
        pg_to_char("o_orderdate", "DD/MM/YYYY HH24:MI:SS").alias("eu_ts"),
        pg_to_char("o_orderdate", "YYYY").alias("just_year"),
    ).orderBy("o_orderkey")


@query(
    "f_case_nullif",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open' ELSE 'other' END AS status_name,
           CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS size_tier,
           nullif(o_orderstatus, 'P')                    AS status_nullp,
           coalesce(nullif(o_orderstatus, 'P'), 'PEND')  AS status_coal,
           (o_orderstatus = 'F' AND o_totalprice > 50000) AS is_big_final
    FROM orders WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    doc="CASE/NULLIF/COALESCE/boolean logic (deparse walker surface §2.2).",
)
def f_case_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_tier"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_nullp"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PEND")).alias(
            "status_coal"
        ),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 50000)).alias("is_big_final"),
    ).orderBy("o_orderkey")


@query(
    "f_encode_decode",
    oracle="""
    SELECT doc_id,
           lower(hex(CAST(lang AS BLOB))) AS lang_hex,
           to_base64(CAST(lang AS BLOB))  AS lang_b64,
           md5(source)                    AS src_md5
    FROM documents WHERE doc_id <= 100 ORDER BY doc_id
    """,
    doc="encode/decode hex+base64 (shippable_builtin_functions.c:453-455).",
)
def f_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") <= 100)
    return d.select(
        "doc_id",
        F.lower(F.hex(F.col("lang").cast("binary"))).alias("lang_hex"),
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
        F.md5("source").alias("src_md5"),
    ).orderBy("doc_id")


@query(
    "f_casts",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS BIGINT)          AS price_int,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           CAST(o_orderkey AS VARCHAR)           AS key_str,
           CAST(o_orderkey AS DOUBLE)            AS key_dbl,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST('42' AS INTEGER)                 AS const_int,
           CAST('3.5' AS DOUBLE)                 AS const_dbl
    FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
    """,
    doc="Cast surface incl. numeric→int rounding (PG round-half-even on ::bigint).",
)
def f_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 500)
    # PG/DuckDB double→int casts round half-EVEN (rint); Spark CAST
    # truncates and round() is half-up — rint matches (SURVEY §2.7 casts).
    rounded = F.expr("CAST(rint(o_totalprice) AS BIGINT)")
    return o.select(
        "o_orderkey",
        rounded.alias("price_int"),
        # Compared as DOUBLE on both sides: the driver hashes the pandas
        # repr, and Decimal('…60') vs float 205941.6 mismatch (VERDICT r2).
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.lit("42").cast("int").alias("const_int"),
        F.lit("3.5").cast("double").alias("const_dbl"),
    ).orderBy("o_orderkey")


@query(
    "f_map_ops",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_val,
           2 AS m_card,
           'k,uid' AS m_keys,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS first_val,
           concat('k=', regexp_extract(props, '"k": (\\d+)', 1),
                  ';uid=', CAST(user_id AS VARCHAR)) AS entries_str,
           user_id AS uid_val
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
    doc="Map-type surface (pg_map parity: pg_map/src/map.c:809-1046): "
    "construction, element_at, cardinality, keys/values, entries, "
    "map_from_entries round-trip — all native MapType ops in Spark.",
)
def f_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    m = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k").cast("long"),
        F.lit("uid"),
        F.col("user_id"),
    )
    return (
        t["events"]
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.element_at(m, F.lit("k")).alias("k_val"),
            F.size(m).alias("m_card"),
            F.array_join(F.map_keys(m), ",").alias("m_keys"),
            F.element_at(F.map_values(m), 1).alias("first_val"),
            F.array_join(
                F.transform(
                    F.map_entries(m),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
                ),
                ";",
            ).alias("entries_str"),
            F.element_at(F.map_from_entries(F.map_entries(m)), F.lit("uid")).alias("uid_val"),
        )
        .orderBy("event_id")
    )


@query(
    "f_date_bin",
    oracle="""
    SELECT event_id,
           time_bucket(INTERVAL 15 MINUTE, ts, TIMESTAMP '1970-01-01 00:00:00') AS bin_15m,
           time_bucket(INTERVAL 1 HOUR,    ts, TIMESTAMP '1970-01-01 00:30:00') AS bin_1h_off
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    doc="date_bin (shippable_builtin_functions.c date_bin row): stride "
    "binning with an anchored origin, as codegen'd micros arithmetic.",
)
def f_date_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.functions.pg import pg_date_bin

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            pg_date_bin("15 minutes", "ts", "1970-01-01 00:00:00").alias("bin_15m"),
            pg_date_bin("1 hour", "ts", "1970-01-01 00:30:00").alias("bin_1h_off"),
        )
        .orderBy("event_id")
    )


@query(
    "arr_operators",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           list_has_all(ws, ['the', 'a'])                  AS contains_both,
           list_has_any(ws, ['data', 'model'])             AS overlaps_terms,
           CAST(list_position(ws, 'the') AS INT)           AS pos_the,
           CAST(len(list_concat(ws, ['<eos>'])) AS INT)    AS len_appended,
           array_to_string(list_sort(list_distinct(ws[1:4])), ',') AS head_sorted,
           ws[1] || '+' || ws[len(ws)]                     AS first_last
    FROM w
    ORDER BY doc_id
    """,
    doc="PG array operators @> <@/&& || plus position/append/distinct/sort "
    "(shippable_builtin_functions.c:378-384; operators @> <@ && ||).",
)
def arr_operators(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ws = F.split(F.trim(F.col("text")), r"\s+")
    return (
        t["documents"]
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            # @> containment: ws contains all of ['the','a']
            F.forall(F.array(F.lit("the"), F.lit("a")), lambda x: F.array_contains(ws, x)).alias(
                "contains_both"
            ),
            # && overlap
            F.arrays_overlap(ws, F.array(F.lit("data"), F.lit("model"))).alias("overlaps_terms"),
            F.array_position(ws, "the").cast("int").alias("pos_the"),
            # || concat + cardinality
            F.size(F.concat(ws, F.array(F.lit("<eos>")))).alias("len_appended"),
            # Serialized to string: the driver's canonicalizer pandas-sorts
            # the frame and raw list cells are unhashable (VERDICT r2).
            F.array_join(F.array_sort(F.array_distinct(F.slice(ws, 1, 4))), ",").alias(
                "head_sorted"
            ),
            F.concat(F.element_at(ws, 1), F.lit("+"), F.element_at(ws, -1)).alias("first_last"),
        )
        .orderBy("doc_id")
    )


@query(
    "f_json_variant",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS BIGINT)  AS k_long,
           CAST(props->>'k' AS DOUBLE)  AS k_double,
           props->>'k'                  AS k_string,
           CAST(json_array_length(json('[1,2,3]')) AS INT) AS arr_len
    FROM events
    WHERE event_id < 1000
    ORDER BY event_id
    """,
    doc="JSON via Spark 4 VariantType (SURVEY §1.2 JSON↔jsonb row): "
    "parse_json + typed variant_get, with json_array_length.",
)
def f_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    v = F.parse_json("props")
    return (
        t["events"]
        .filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            F.variant_get(v, "$.k", "bigint").alias("k_long"),
            F.variant_get(v, "$.k", "double").alias("k_double"),
            F.variant_get(v, "$.k", "string").alias("k_string"),
            F.json_array_length(F.lit("[1,2,3]")).alias("arr_len"),
        )
        .orderBy("event_id")
    )


@query(
    "f_width_bucket",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 60000 THEN 11
                ELSE CAST(floor(o_totalprice / 60000.0 * 10) AS BIGINT) + 1
           END AS price_bucket
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="width_bucket — THE reference example of a non-shippable function "
    "that forced partial pushdown (docs/iceberg-tables.md partial-pushdown "
    "section); here it runs natively in the vectorized engine. DuckDB "
    "lacks it, so the oracle computes the histogram arithmetic directly.",
)
def f_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(60000.0), F.lit(10))
            .cast("bigint")
            .alias("price_bucket"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "g_pivot_event_types",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'view')     AS view,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'error')    AS error
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="PIVOT: per-user counts fanned to one column per event type "
    "(Spark relational pivot; oracle uses FILTERed aggregates).",
)
def g_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
        .orderBy("user_id")
    )


@query(
    "f_hyperbolic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (exp(x) - exp(-x)) / 2                 AS sinh_x,
           (exp(x) + exp(-x)) / 2                 AS cosh_x,
           (exp(x) - exp(-x)) / (exp(x) + exp(-x)) AS tanh_x,
           ln(x + sqrt(x * x + 1))               AS asinh_x,
           ln(y + sqrt(y * y - 1))               AS acosh_y,
           0.5 * ln((1 + z) / (1 - z))           AS atanh_z
    FROM (
        SELECT l_orderkey, l_linenumber,
               l_discount * 10 - 0.5  AS x,
               1 + l_tax * 10          AS y,
               l_discount * 2 - 0.1    AS z
        FROM lineitem WHERE l_orderkey < 1000
    ) t
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Hyperbolics incl. inverses (shippable list sinh..atanh + the "
    "acosh_pg/atanh_pg shims, duckdb_pglake_extension.cpp:82-116); the "
    "DuckDB 1.0 oracle lacks the builtins so it evaluates the exp/ln "
    "identities — also pinning the functions' definitions, not just "
    "engine agreement.",
)
def f_hyperbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    x = F.col("l_discount") * 10 - 0.5
    y = 1 + F.col("l_tax") * 10
    z = F.col("l_discount") * 2 - 0.1
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.sinh(x).alias("sinh_x"),
            F.cosh(x).alias("cosh_x"),
            F.tanh(x).alias("tanh_x"),
            F.asinh(x).alias("asinh_x"),
            F.acosh(y).alias("acosh_y"),
            F.atanh(z).alias("atanh_z"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "f_bit_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                        AS and_mask,
           o_orderkey | 4096                       AS or_flag,
           xor(o_orderkey, o_custkey)              AS xor_keys,
           o_orderkey << 2                         AS shl2,
           o_orderkey >> 3                         AS shr3,
           CAST(bit_count(o_orderkey) AS BIGINT)   AS popcount,
           ~o_orderkey                             AS bnot
    FROM orders
    WHERE o_orderkey < 5000
    ORDER BY o_orderkey
    """,
    doc="Bitwise operator family (& | # << >> ~ and bit_count) from the "
    "shippable operator table's integer rows.",
)
def f_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = F.col("o_orderkey")
    return (
        t["orders"]
        .filter(k < 5000)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("and_mask"),
            k.bitwiseOR(F.lit(4096)).alias("or_flag"),
            k.bitwiseXOR(F.col("o_custkey")).alias("xor_keys"),
            F.shiftleft(k, 2).alias("shl2"),
            F.shiftright(k, 3).alias("shr3"),
            F.bit_count(k).cast("bigint").alias("popcount"),
            F.bitwise_not(k).alias("bnot"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "f_to_date",
    oracle="""
    SELECT o_orderkey,
           CAST(strptime(
             lpad(CAST(day(o_orderdate) AS VARCHAR), 2, '0') || '/' ||
             lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0') || '/' ||
             CAST(year(o_orderdate) AS VARCHAR), '%d/%m/%Y') AS DATE) AS parsed
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    doc="PG to_date(text, fmt) via the shared to_char pattern compiler "
    "(functions/pg.pg_to_date): format each order date as DD/MM/YYYY "
    "text and parse it back — proves the PG->Java pattern translation "
    "against DuckDB's strptime. Roundtrip identity makes the oracle "
    "exact.",
)
def f_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.functions.pg import pg_to_date

    t = load_tables(spark, sf_dir)
    txt = F.concat(
        F.lpad(F.dayofmonth("o_orderdate").cast("string"), 2, "0"), F.lit("/"),
        F.lpad(F.month("o_orderdate").cast("string"), 2, "0"), F.lit("/"),
        F.year("o_orderdate").cast("string"),
    )
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            pg_to_date(txt, "DD/MM/YYYY").alias("parsed"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "f_regexp_replace_pg",
    oracle="""
    SELECT doc_id,
           regexp_replace(substr(text, 1, 60), 'data', 'DATA')        AS first_only,
           regexp_replace(substr(text, 1, 60), '[aeiou]', '_', 'g')   AS all_vowels,
           regexp_replace(substr(text, 1, 60), '(\\w+) (\\w+)', '\\2 \\1') AS swap_pair,
           regexp_replace(substr(text, 1, 60), 'THE', '##', 'i')      AS ci_first
    FROM documents
    WHERE doc_id <= 300
    ORDER BY doc_id
    """,
    doc="PG regexp_replace semantics (pgduck_shippability.md: the 3- "
    "and 4-arg text forms ship): WITHOUT 'g' only the FIRST match is "
    "replaced (Spark natively replaces all — the shim rebuilds "
    "first-only from regexp_instr/extract splitting), backreferences "
    "use the \\1 spelling, 'i' is case-insensitive. DuckDB shares PG's "
    "default, so the oracle is the plain function.",
)
def f_regexp_replace_pg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.functions.pg import pg_regexp_replace

    t = load_tables(spark, sf_dir)
    head = F.substring("text", 1, 60)
    return (
        t["documents"]
        .filter(F.col("doc_id") <= 300)
        .select(
            "doc_id",
            pg_regexp_replace(head, "data", "DATA").alias("first_only"),
            pg_regexp_replace(head, "[aeiou]", "_", "g").alias("all_vowels"),
            pg_regexp_replace(head, "(\\w+) (\\w+)", "\\2 \\1").alias("swap_pair"),
            pg_regexp_replace(head, "THE", "##", "i").alias("ci_first"),
        )
        .orderBy("doc_id")
    )
