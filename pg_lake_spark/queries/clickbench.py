"""ClickBench-style wide-aggregation queries over the events table.

The reference's third benchmark surface (pg_lake_benchmark/README.md:
9-28 runs the 43-query ClickBench suite over the hits table). The
corpus has no hits table; these keep the suite's signature shapes —
regex extraction + high-cardinality GROUP BY + quantiles in one query,
top-N user analytics with tie-broken LIMIT, minute-grain time series —
over events. Placeholder module; populated below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_lake_spark.queries.registry import query
from pg_lake_spark.session import load_tables


@query(
    "cb_user_activity_topn",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 10
    """,
    doc="ClickBench shape (hits: 'top users by activity'): "
    "high-cardinality GROUP BY user with count / distinct / avg in one "
    "pass, tie-broken top-N. Partial aggregation map-side; TopK fuses "
    "to TakeOrderedAndProject.",
)
def cb_user_activity_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(10)
    )


@query(
    "cb_regex_extract_quantiles",
    oracle="""
    SELECT CAST(floor(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) / 10) AS INT) AS k_band,
           count(*) AS n,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
    FROM events
    WHERE regexp_extract(props, '"k": (\\d+)', 1) <> ''
    GROUP BY CAST(floor(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) / 10) AS INT)
    ORDER BY k_band
    """,
    doc="ClickBench shape (hits: regex URL extraction + quantiles): "
    "regexp_extract from a JSON-ish payload column, band the extracted "
    "int, exact interpolated quantiles per band — regex + group-by + "
    "percentile in ONE query, the suite's signature stress combo.",
)
def cb_regex_extract_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = F.regexp_extract("props", '"k": (\\d+)', 1)
    band = F.floor(k.cast("int") / 10).cast("int")  # floor, not trunc-cast: engines round casts differently
    return (
        t["events"]
        .filter(k != "")
        .groupBy(band.alias("k_band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        )
        .orderBy("k_band")
    )


@query(
    "cb_minute_timeseries",
    oracle="""
    SELECT date_trunc('minute', ts) AS minute,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    GROUP BY date_trunc('minute', ts)
    ORDER BY n_events DESC, minute
    LIMIT 20
    """,
    doc="ClickBench shape (hits: per-minute traffic): time-bucketed "
    "counts + distinct users over a day slice, busiest minutes first. "
    "The date filter pushes to the scan before the bucket shuffle.",
)
def cb_minute_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = F.lit("2024-01-15").cast("timestamp_ntz")
    hi = F.lit("2024-01-16").cast("timestamp_ntz")
    return (
        t["events"]
        .filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_events").desc(), "minute")
        .limit(20)
    )


@query(
    "cb_type_value_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(min(value), 6) AS min_v,
           round(max(value), 6) AS max_v,
           round(avg(value), 6) AS avg_v,
           round(stddev_samp(value), 6) AS sd_v,
           round(quantile_cont(value, 0.5), 6) AS p50
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="ClickBench shape (hits: wide stat profile per dimension): six "
    "aggregates including an exact quantile per event type, one scan.",
)
def cb_type_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
            F.round(F.avg("value"), 6).alias("avg_v"),
            F.round(F.stddev_samp("value"), 6).alias("sd_v"),
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        )
        .orderBy("event_type")
    )


@query(
    "cb_funnel_like_filter",
    oracle="""
    SELECT event_type,
           CAST(hour(ts) AS INT) AS h,
           count(*) AS n
    FROM events
    WHERE props LIKE '%"k": 1%' AND value > 10
      AND event_type IN ('click', 'view', 'purchase')
    GROUP BY event_type, CAST(hour(ts) AS INT)
    ORDER BY event_type, h
    """,
    doc="ClickBench shape (hits: LIKE-pattern traffic slice): "
    "LIKE + numeric + IN predicates compound on the scan, hour-of-day "
    "histogram per type. The string predicates stay JVM-side "
    "(StartsWith/Contains pushdown-eligible).",
)
def cb_funnel_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(
            F.col("props").like('%"k": 1%')
            & (F.col("value") > 10)
            & F.col("event_type").isin("click", "view", "purchase")
        )
        .groupBy("event_type", F.hour("ts").cast("int").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "h")
    )


# Synthetic deterministic URL from (source, doc_id) — ONE definition
# for the Spark side and one SQL CTE fragment for the oracles; the
# 20-line CASE was duplicated verbatim across cb_url_domain_topn and
# cb_url_strip_params_topn in four places (r15 review).
_SYNTH_URL_SQL = """
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'https://www.' || source || '.example.com/docs/'
                           || CAST(doc_id % 50 AS VARCHAR)
               WHEN 1 THEN 'http://' || source || '.example.org/p/'
                           || CAST(doc_id % 50 AS VARCHAR) || '?ref=home'
               ELSE 'https://cdn.' || source || '.example.net/a/'
                    || CAST(doc_id % 50 AS VARCHAR) || '#frag'
             END"""


def _synth_url():
    k = (F.col("doc_id") % 50).cast("string")
    return (
        F.when(
            (F.col("doc_id") % 3).cast("int") == 0,
            F.concat(F.lit("https://www."), F.col("source"),
                     F.lit(".example.com/docs/"), k),
        )
        .when(
            (F.col("doc_id") % 3).cast("int") == 1,
            F.concat(F.lit("http://"), F.col("source"),
                     F.lit(".example.org/p/"), k, F.lit("?ref=home")),
        )
        .otherwise(
            F.concat(F.lit("https://cdn."), F.col("source"),
                     F.lit(".example.net/a/"), k, F.lit("#frag")),
        )
    )


@query(
    "cb_url_domain_topn",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, lang,
{_SYNTH_URL_SQL} AS url
      FROM documents
    )
    SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
           count(*) AS n_pages,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM urls
    GROUP BY regexp_extract(url, '^https?://([^/]+)', 1)
    ORDER BY n_pages DESC, domain
    LIMIT 20
    """,
    doc="ClickBench shape (hits Q: 'top domains'): regex domain "
    "extraction from a URL column feeding a high-cardinality GROUP BY "
    "with tie-broken top-N. The URL is synthesized deterministically "
    "from (source, doc_id) identically in both engines; extraction and "
    "grouping are pure JVM expressions, TopK fuses to "
    "TakeOrderedAndProject.",
)
def cb_url_domain_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    url = _synth_url()
    domain = F.regexp_extract(url, r"^https?://([^/]+)", 1)
    return (
        t["documents"]
        .groupBy(domain.alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.col("n_pages").desc(), "domain")
        .limit(20)
    )


@query(
    "cb_multi_like_funnel",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN text LIKE '%join%' THEN 1 ELSE 0 END) AS BIGINT) AS has_join,
           CAST(sum(CASE WHEN text LIKE '%join%' AND text LIKE '%merge%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS join_merge,
           CAST(sum(CASE WHEN text LIKE '%join%' AND text LIKE '%merge%'
                         AND text NOT LIKE '%scan%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS join_merge_clean
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="ClickBench shape (hits Q: multi-term LIKE funnel over URL/"
    "Title): successive LIKE-conjunction counts computed as CASE "
    "aggregates in ONE scan — the funnel never rescans, each stage is "
    "a tighter conjunction. All stages are substring predicates inside "
    "whole-stage codegen.",
)
def cb_multi_like_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    has_join = F.col("text").like("%join%")
    has_merge = F.col("text").like("%merge%")
    has_scan = F.col("text").like("%scan%")
    one = F.lit(1)
    zero = F.lit(0)
    return (
        t["documents"]
        .groupBy("lang")
        .agg(
            F.count(one).alias("n_docs"),
            F.sum(F.when(has_join, one).otherwise(zero)).alias("has_join"),
            F.sum(F.when(has_join & has_merge, one).otherwise(zero)).alias("join_merge"),
            F.sum(
                F.when(has_join & has_merge & ~has_scan, one).otherwise(zero)
            ).alias("join_merge_clean"),
        )
        .orderBy("lang")
    )


@query(
    "cb_event_funnel_users",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_users
    FROM (
      SELECT user_id,
             min(CASE WHEN event_type = 'click'    THEN ts END) AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events
      GROUP BY user_id
    )
    WHERE first_click IS NOT NULL
      AND first_purchase IS NOT NULL
      AND first_click < first_purchase
    """,
    doc="ClickBench/funnel shape (windowFunnel analogue): users whose "
    "first click precedes their first purchase. The sequence condition "
    "collapses to conditional MIN aggregates per user — one shuffle, "
    "no self-join, no per-user sort.",
)
def cb_event_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    first = lambda typ: F.min(F.when(F.col("event_type") == typ, F.col("ts")))
    per_user = t["events"].groupBy("user_id").agg(
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    return per_user.filter(
        F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_click") < F.col("first_purchase"))
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


@query(
    "cb_hour_type_matrix",
    oracle="""
    SELECT CAST(hour(ts) AS INT) AS hr, event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY hour(ts), event_type
    HAVING count(*) > 5
    ORDER BY hr, event_type
    """,
    doc="ClickBench shape (hits Q: traffic by hour and type): "
    "hour-of-day x event-type matrix with a distinct-user count and a "
    "HAVING floor. Distinct count expands to a two-phase aggregate; "
    "partials combine map-side.",
)
def cb_hour_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.hour("ts").cast("int").alias("hr"), "event_type")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("n_events") > 5)
        .orderBy("hr", "event_type")
    )


@query(
    "cb_value_band_topsources",
    oracle="""
    SELECT source,
           CASE WHEN n_chars < 0 THEN 0
                WHEN n_chars >= 2000 THEN 9
                ELSE CAST(floor(n_chars / 2000.0 * 8) AS INT) + 1
           END AS len_band,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY source,
           CASE WHEN n_chars < 0 THEN 0
                WHEN n_chars >= 2000 THEN 9
                ELSE CAST(floor(n_chars / 2000.0 * 8) AS INT) + 1
           END
    ORDER BY n_docs DESC, source, len_band
    LIMIT 25
    """,
    doc="ClickBench shape (hits Q: size-band histograms per referrer): "
    "width_bucket banding of a measure crossed with a dimension, "
    "tie-broken top-N of the densest cells.",
)
def cb_value_band_topsources(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy(
            "source",
            F.width_bucket(
                F.col("n_chars"), F.lit(0.0), F.lit(2000.0), F.lit(8)
            ).cast("int").alias("len_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy(F.col("n_docs").desc(), "source", "len_band")
        .limit(25)
    )


@query(
    "cb_text_prefix_topn",
    oracle="""
    SELECT substr(text, 1, 16) AS prefix,
           count(*) AS n,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    WHERE text <> ''
    GROUP BY substr(text, 1, 16)
    ORDER BY n DESC, prefix
    LIMIT 15
    """,
    doc="ClickBench shape (hits: SELECT SearchPhrase ... LIMIT): "
    "high-cardinality GROUP BY on a string prefix with a distinct "
    "count, tie-broken top-N fused to TakeOrderedAndProject.",
)
def cb_text_prefix_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("text") != "")
        .groupBy(F.substring("text", 1, 16).alias("prefix"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
        )
        .orderBy(F.col("n").desc(), "prefix")
        .limit(15)
    )


@query(
    "cb_top_type_per_user",
    oracle="""
    SELECT user_id, event_type, n FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rk
      FROM events
      GROUP BY user_id, event_type
    ) WHERE rk = 1 AND user_id < 40
    ORDER BY user_id
    """,
    doc="ClickBench shape (hits: most-visited page per user): window "
    "rank directly over the aggregate output — count per (user, type), "
    "row_number per user with a deterministic tie-break, keep the top "
    "type. The window partitions on the aggregate's own grouping "
    "prefix, so it reuses the aggregation exchange.",
)
def cb_top_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per = (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        per.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & (F.col("user_id") < 40))
        .select("user_id", "event_type", "n")
        .orderBy("user_id")
    )


@query(
    "cb_type_share_of_total",
    oracle="""
    SELECT event_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS share
    FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
    ORDER BY event_type
    """,
    doc="ClickBench shape (hits: traffic share per segment): "
    "share-of-total via an unpartitioned window over the aggregate "
    "output — the window sees only the handful of grouped rows, never "
    "the fact. Integer counts divide identically in both engines.",
)
def cb_type_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per = t["events"].groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    return per.select(
        "event_type", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("share"),
    ).orderBy("event_type")


@query(
    "cb_power_users_histogram",
    oracle="""
    SELECT n_events, CAST(count(*) AS BIGINT) AS n_users
    FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
    GROUP BY n_events
    HAVING count(*) > 1
    ORDER BY n_events
    """,
    doc="ClickBench shape (hits: activity histogram): aggregation OF an "
    "aggregation — events per user, then users per activity level with "
    "a HAVING floor. Two shuffles, both over reduced frames.",
)
def cb_power_users_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_user = t["events"].groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_user.groupBy("n_events")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .filter(F.col("n_users") > 1)
        .orderBy("n_events")
    )


@query(
    "cb_props_coverage_by_type",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN props LIKE '%"k":%' THEN 1 ELSE 0 END) AS BIGINT) AS with_k,
           round(CAST(sum(CASE WHEN props LIKE '%"k":%' THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS coverage
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="ClickBench shape (hits: field-coverage profiling): per-segment "
    "fraction of rows whose payload carries a key — LIKE predicate as "
    "a CASE aggregate beside the total, one scan, exact integer ratio "
    "inputs.",
)
def cb_props_coverage_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    has_k = F.col("props").like('%"k":%')
    with_k = F.sum(F.when(has_k, 1).otherwise(0))
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            with_k.cast("bigint").alias("with_k"),
            F.round(with_k.cast("double") / F.count(F.lit(1)), 6).alias("coverage"),
        )
        .orderBy("event_type")
    )


@query(
    "cb_url_strip_params_topn",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id,
{_SYNTH_URL_SQL} AS url
      FROM documents
    )
    SELECT regexp_replace(url, '[?#].*$', '') AS clean_url,
           count(*) AS n,
           CAST(length(regexp_replace(url, '[?#].*$', ''))
                - length(replace(regexp_replace(url, '[?#].*$', ''), '/', ''))
                - 2 AS INT) AS path_depth
    FROM urls
    GROUP BY regexp_replace(url, '[?#].*$', '')
    ORDER BY n DESC, clean_url
    LIMIT 25
    """,
    doc="ClickBench shape (hits Q: 'URL without parameters'): "
    "regexp_replace strips the query string / fragment, the cleaned "
    "URL feeds a high-cardinality GROUP BY with a derived path-depth "
    "column (slash count minus the protocol's two). regexp_replace + "
    "replace + length are all JVM codegen expressions; top-N fuses to "
    "TakeOrderedAndProject.",
)
def cb_url_strip_params_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    url = _synth_url()
    clean = F.regexp_replace(url, r"[?#].*$", "")
    depth = (
        F.length(clean) - F.length(F.regexp_replace(clean, r"/", "")) - 2
    ).cast("int")
    return (
        t["documents"]
        .groupBy(clean.alias("clean_url"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first(depth).alias("path_depth"),
        )
        .orderBy(F.col("n").desc(), "clean_url")
        .limit(25)
    )


@query(
    "cb_bulk_arithmetic_sums",
    oracle="""
    SELECT """ + ",\n           ".join(
        f"round(sum(value + {k}), 4) AS s{k}" for k in range(20)
    ) + """
    FROM events
    WHERE event_type <> 'error'
    """,
    doc="ClickBench shape (hits Q29: SUM(ResolutionWidth), "
    "SUM(ResolutionWidth+1) ... +89 — ninety parallel arithmetic "
    "aggregates in one scan): twenty sum(value+k) aggregates computed "
    "in a single pass. Stresses whole-stage-codegen width: one scan, "
    "one projection feeding 20 accumulators, no shuffle beyond the "
    "final one-row combine. Rounded to 4dp because each sum folds "
    "~10k doubles and engines order the adds differently.",
)
def cb_bulk_arithmetic_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_type") != "error")
        .agg(*[F.round(F.sum(F.col("value") + k), 4).alias(f"s{k}") for k in range(20)])
    )


@query(
    "cb_paginated_topn",
    oracle="""
    SELECT user_id, event_type, count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY user_id, event_type
    ORDER BY n DESC, user_id, event_type
    LIMIT 20 OFFSET 40
    """,
    doc="ClickBench shape (hits Q: paginated leaderboards — LIMIT 10 "
    "OFFSET 10000 family): a grouped leaderboard page deep in the "
    "ordering. Spark plans ORDER BY + LIMIT + OFFSET as a global "
    "top-(limit+offset) then a drop — no full sort materialization; "
    "the tie-broken ORDER BY makes the page deterministic in both "
    "engines.",
)
def cb_paginated_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(F.col("n").desc(), "user_id", "event_type")
        .offset(40)
        .limit(20)
    )


@query(
    "cb_point_lookup",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 6) AS value
    FROM events
    WHERE user_id = 42
    ORDER BY event_id
    """,
    doc="ClickBench shape (hits Q19: `SELECT UserID FROM hits WHERE "
    "UserID = <const>`): a needle point-lookup on a high-cardinality "
    "key over a columnar scan. The equality predicate must push to the "
    "parquet scan (row-group stats skip non-matching groups); no "
    "shuffle, no aggregation — the plan is scan→filter→project and at "
    "cluster scale touches only the row groups whose min/max bracket "
    "the key.",
)
def cb_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("user_id") == 42)
        .select(
            "event_id", "user_id", "event_type",
            F.round("value", 6).alias("value"),
        )
        .orderBy("event_id")
    )


@query(
    "cb_raw_rows_by_time",
    oracle="""
    SELECT event_id, ts, user_id, event_type, round(value, 6) AS value
    FROM events
    WHERE props LIKE '%7}%'
    ORDER BY ts, event_id
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q23-25: `SELECT * FROM hits WHERE URL "
    "LIKE '%google%' ORDER BY EventTime LIMIT 10`): earliest raw rows "
    "matching a substring filter — a full-width top-N by time, no "
    "grouping. The LIKE pushes to the scan as a string-contains "
    "filter and the ORDER BY+LIMIT fuses to TakeOrderedAndProject, so "
    "each partition keeps only its local 10 earliest matches; "
    "event_id tie-breaks equal timestamps for a deterministic page.",
)
def cb_raw_rows_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("props").like("%7}%"))
        .select(
            "event_id", "ts", "user_id", "event_type",
            F.round("value", 6).alias("value"),
        )
        .orderBy("ts", "event_id")
        .limit(10)
    )


@query(
    "cb_min_string_mixed_like",
    oracle="""
    SELECT event_type, min(props) AS first_props, count(*) AS c,
           CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM events
    WHERE props LIKE '%"k"%' AND props NOT LIKE '%9}%'
      AND event_type <> ''
    GROUP BY event_type
    ORDER BY c DESC, event_type
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q22: MIN(URL), MIN(Title), COUNT, "
    "COUNT(DISTINCT UserID) under `Title LIKE ... AND URL NOT LIKE "
    "... AND SearchPhrase <> ''`): string MIN aggregates alongside "
    "counts under a mixed positive/negative LIKE filter pair. All "
    "three string predicates push to the scan; the min(string) rides "
    "the same hash aggregate as the counts (one shuffle), and the "
    "distinct-count expands in the same Expand node.",
)
def cb_min_string_mixed_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(
            F.col("props").like('%"k"%')
            & ~F.col("props").like("%9}%")
            & (F.col("event_type") != "")
        )
        .groupBy("event_type")
        .agg(
            F.min("props").alias("first_props"),
            F.count(F.lit(1)).alias("c"),
            F.count_distinct("user_id").cast("bigint").alias("u"),
        )
        .orderBy(F.col("c").desc(), "event_type")
        .limit(10)
    )


@query(
    "cb_model_distinct_users",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM events
    WHERE event_type <> 'view'
    GROUP BY event_type
    ORDER BY u DESC, event_type
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q11: MobilePhoneModel distinct-user "
    "top-N under a non-empty filter): COUNT(DISTINCT user) per model "
    "with the model filter pushed to the scan. The distinct expands "
    "in an Expand node over one shuffle; top-N fuses.",
)
def cb_model_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_type") != "view")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("bigint").alias("u"))
        .orderBy(F.col("u").desc(), "event_type")
        .limit(10)
    )


@query(
    "cb_model_pair_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(floor(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                           AS INT) / 25) AS INT) AS k_band,
           CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM events
    WHERE event_type <> 'view'
    GROUP BY 1, 2
    ORDER BY u DESC, event_type, k_band
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q12: (MobilePhone, MobilePhoneModel) "
    "pair distinct-user top-N): the two-dimension variant of Q11 — "
    "the second key is computed (regexp band), so the grouping runs "
    "over an expression pair, not raw columns.",
)
def cb_model_pair_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k_band = F.floor(
        F.regexp_extract("props", '"k": (\\d+)', 1).cast("int") / 25
    ).cast("int")
    return (
        t["events"]
        .filter(F.col("event_type") != "view")
        .groupBy("event_type", k_band.alias("k_band"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("u"))
        .orderBy(F.col("u").desc(), "event_type", "k_band")
        .limit(10)
    )


@query(
    "cb_global_scalar_profile",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
             / 10000.0 AS sum_value,
           round(CAST(sum(CAST(round(value * 10000) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 1000000.0
             AS avg_value,
           min(ts) AS min_ts, max(ts) AS max_ts
    FROM events
    """,
    doc="ClickBench shape (hits Q1-Q7 scalar family: COUNT(*), "
    "SUM/AVG, COUNT(DISTINCT UserID), COUNT(DISTINCT SearchPhrase), "
    "MIN/MAX(EventDate) — the whole-table scalar profile in one "
    "pass): two distinct-counts expand together; the value sum "
    "accumulates as exact scaled integers so both engines emit the "
    "identical double.",
)
def cb_global_scalar_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sv = F.sum(F.round(F.col("value") * 10000).cast("bigint")).cast("bigint")
    n = F.count(F.lit(1))
    return t["events"].agg(
        n.cast("bigint").alias("n_rows"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count_distinct("event_type").cast("bigint").alias("n_types"),
        (sv / 10000.0).alias("sum_value"),
        (F.round(sv * 100.0 / n) / 1000000.0).alias("avg_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "cb_phrase_count_and_users",
    oracle="""
    SELECT regexp_extract(props, '"k": (\\d+)', 1) AS phrase,
           CAST(count(*) AS BIGINT) AS c,
           CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM events
    WHERE regexp_extract(props, '"k": (\\d+)', 1) <> ''
    GROUP BY 1
    ORDER BY c DESC, phrase
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q13/Q14: SearchPhrase top-N by count "
    "AND by distinct users, phrase non-empty): the phrase is an "
    "extracted expression, grouped at high cardinality with both a "
    "plain and a distinct count in the same aggregate.",
)
def cb_phrase_count_and_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    phrase = F.regexp_extract("props", '"k": (\\d+)', 1)
    return (
        t["events"]
        .filter(phrase != "")
        .groupBy(phrase.alias("phrase"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.count_distinct("user_id").cast("bigint").alias("u"),
        )
        .orderBy(F.col("c").desc(), "phrase")
        .limit(10)
    )


@query(
    "cb_user_minute_phrase",
    oracle="""
    SELECT user_id, CAST(minute(ts) AS INT) AS m, event_type,
           CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY c DESC, user_id, m, event_type
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q19: GROUP BY UserID, "
    "extract(minute), SearchPhrase — a three-key grouping where one "
    "key is a time-part expression): the widest-cardinality "
    "grouping of the suite; partial aggregation map-side, top-N "
    "fused with full tie-break.",
)
def cb_user_minute_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            "user_id",
            F.minute("ts").cast("int").alias("m"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "user_id", "m", "event_type")
        .limit(10)
    )


@query(
    "cb_ip_arith_grouping",
    oracle="""
    SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2,
           user_id - 3 AS u3, CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY 1, 2, 3, 4
    ORDER BY c DESC, user_id
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q37: GROUP BY ClientIP, ClientIP-1, "
    "ClientIP-2, ClientIP-3): grouping keys that are arithmetic "
    "derivations of one column — the optimizer must not collapse "
    "them away, and the aggregate keys stay functionally redundant "
    "on purpose (tests expression-grouping overhead).",
)
def cb_ip_arith_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            "user_id",
            (F.col("user_id") - 1).alias("u1"),
            (F.col("user_id") - 2).alias("u2"),
            (F.col("user_id") - 3).alias("u3"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "user_id")
        .limit(10)
    )


@query(
    "cb_windowed_offset_pageviews",
    oracle="""
    SELECT regexp_extract(props, '"k": (\\d+)', 1) AS page,
           CAST(count(*) AS BIGINT) AS page_views
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05'
      AND ts <  TIMESTAMP '2024-01-20'
      AND event_type <> 'error'
      AND regexp_extract(props, '"k": (\\d+)', 1) <> ''
    GROUP BY 1
    ORDER BY page_views DESC, page
    LIMIT 10 OFFSET 40
    """,
    doc="ClickBench shape (hits Q38/Q39: URL pageviews inside a "
    "counter + date window + refresh filters, ORDER BY views DESC "
    "LIMIT 10 OFFSET 1000): the deep-OFFSET top-N over a filtered, "
    "computed grouping key. Spark has no native OFFSET pushdown "
    "into TakeOrdered, so the plan sorts the grouped frame "
    "(|pages|, tiny) — not the fact.",
)
def cb_windowed_offset_pageviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    page = F.regexp_extract("props", '"k": (\\d+)', 1)
    return (
        t["events"]
        .filter(
            (F.col("ts") >= F.lit("2024-01-05").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-20").cast("timestamp_ntz"))
            & (F.col("event_type") != "error")
            & (page != "")
        )
        .groupBy(page.alias("page"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("page_views"))
        .orderBy(F.col("page_views").desc(), "page")
        .offset(40)
        .limit(10)
    )


@query(
    "cb_case_src_dst_matrix",
    oracle="""
    SELECT event_type,
           CASE WHEN user_id % 10 = 0 THEN 'organic'
                ELSE '' END AS src,
           CAST(floor(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                           AS INT) / 20) AS INT) AS dst,
           CAST(count(*) AS BIGINT) AS page_views
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05'
      AND ts <  TIMESTAMP '2024-01-25'
    GROUP BY 1, 2, 3
    ORDER BY page_views DESC, event_type, src, dst
    LIMIT 10 OFFSET 20
    """,
    doc="ClickBench shape (hits Q40: TraficSourceID/SearchEngineID "
    "matrix with a CASE-derived Src column and URL Dst, deep "
    "OFFSET): a grouping key that is CONDITIONALLY blanked by a "
    "CASE over other columns — the classic traffic-attribution "
    "matrix. The CASE evaluates pre-aggregation in both engines.",
)
def cb_case_src_dst_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    src = F.when(F.col("user_id") % 10 == 0, F.lit("organic")).otherwise(
        F.lit("")
    )
    dst = F.floor(
        F.regexp_extract("props", '"k": (\\d+)', 1).cast("int") / 20
    ).cast("int")
    return (
        t["events"]
        .filter(
            (F.col("ts") >= F.lit("2024-01-05").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-25").cast("timestamp_ntz"))
        )
        .groupBy("event_type", src.alias("src"), dst.alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("page_views"))
        .orderBy(
            F.col("page_views").desc(), "event_type", "src", "dst"
        )
        .offset(20)
        .limit(10)
    )


@query(
    "cb_highcard_pair_stats",
    oracle="""
    SELECT event_id % 997 AS wid, user_id,
           CAST(count(*) AS BIGINT) AS c,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS refreshes,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
             / 10000.0 AS sum_value
    FROM events
    WHERE regexp_extract(props, '"k": (\\d+)', 1) <> ''
    GROUP BY 1, 2
    ORDER BY c DESC, wid, user_id
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q31-Q33: (WatchID, ClientIP) "
    "high-cardinality pair grouping with COUNT, SUM(IsRefresh), "
    "AVG(ResolutionWidth)): the near-unique composite-key "
    "aggregation family. One key is derived (hash-mod), the "
    "conditional refresh sum folds map-side, the value sum is "
    "exact-scaled.",
)
def cb_highcard_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.regexp_extract("props", '"k": (\\d+)', 1) != "")
        .groupBy((F.col("event_id") % 997).alias("wid"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint").alias("refreshes"),
            (
                F.sum(F.round(F.col("value") * 10000).cast("bigint"))
                .cast("bigint") / 10000.0
            ).alias("sum_value"),
        )
        .orderBy(F.col("c").desc(), "wid", "user_id")
        .limit(10)
    )


@query(
    "cb_region_profile_topn",
    oracle="""
    SELECT CAST(user_id % 97 AS BIGINT) AS region,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS adv_sum,
           CAST(count(*) AS BIGINT) AS c,
           round(CAST(sum(CAST(round(value * 10000) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 1000000.0
             AS avg_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM events
    GROUP BY 1
    ORDER BY c DESC, region
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q9/Q10: RegionID with "
    "SUM(AdvEngineID), COUNT, AVG(ResolutionWidth), COUNT(DISTINCT "
    "UserID) in one aggregate): the four-measure regional profile — "
    "a plain sum, a conditional sum, an exact-scaled average and a "
    "distinct count share one Expand+shuffle.",
)
def cb_region_profile_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sv = F.sum(F.round(F.col("value") * 10000).cast("bigint")).cast("bigint")
    n = F.count(F.lit(1))
    return (
        t["events"]
        .groupBy((F.col("user_id") % 97).cast("bigint").alias("region"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint").alias("adv_sum"),
            n.cast("bigint").alias("c"),
            (F.round(sv * 100.0 / n) / 1000000.0).alias("avg_value"),
            F.count_distinct("user_id").cast("bigint").alias("u"),
        )
        .orderBy(F.col("c").desc(), "region")
        .limit(10)
    )


@query(
    "cb_wide_rows_like_by_time",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    WHERE props LIKE '%3%'
    ORDER BY ts, event_id
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q23: SELECT * WHERE URL LIKE "
    "'%google%' ORDER BY EventTime LIMIT 10): the full-width row "
    "fetch under a substring filter, time-ordered — the LIKE pushes "
    "to the scan, every column rides the TakeOrderedAndProject, and "
    "nothing aggregates (a pure wide-row top-N; cb_raw_rows_by_time "
    "is the projection-narrowed sibling).",
)
def cb_wide_rows_like_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("props").like("%3%"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts", "event_id")
        .limit(10)
    )


@query(
    "cb_domain_length_profile",
    oracle="""
    SELECT regexp_replace(props, '^.*"k": (\\d).*$', '\\1') AS k,
           round(CAST(sum(CAST(length(props) AS BIGINT)) AS BIGINT)
                 * 10000.0 / count(*)) / 10000.0 AS avg_len,
           CAST(count(*) AS BIGINT) AS c,
           min(props) AS first_props
    FROM events
    WHERE props <> ''
    GROUP BY 1
    HAVING count(*) > 100
    ORDER BY avg_len DESC, k
    LIMIT 25
    """,
    doc="ClickBench shape (hits Q28/Q29: REGEXP_REPLACE(Referer -> "
    "domain key), AVG(length(Referer)), COUNT with HAVING > "
    "threshold, MIN(Referer), ORDER BY length DESC LIMIT 25): regex "
    "key derivation + string-length statistics + a post-aggregation "
    "HAVING gate + a MIN(string) in one shuffle. The average is an "
    "exact integer length sum over count.",
)
def cb_domain_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = F.regexp_replace("props", '^.*"k": (\\d).*$', "$1")
    n = F.count(F.lit(1))
    return (
        t["events"]
        .filter(F.col("props") != "")
        .groupBy(k.alias("k"))
        .agg(
            (
                F.round(
                    F.sum(F.length("props").cast("bigint")).cast("bigint")
                    * 10000.0 / n
                ) / 10000.0
            ).alias("avg_len"),
            n.cast("bigint").alias("c"),
            F.min("props").alias("first_props"),
        )
        .filter(F.col("c") > 100)
        .orderBy(F.col("avg_len").desc(), "k")
        .limit(25)
    )


@query(
    "cb_phrase_lexical_order",
    oracle="""
    SELECT regexp_extract(props, '"k": (\\d+)', 1) AS phrase, event_id
    FROM events
    WHERE regexp_extract(props, '"k": (\\d+)', 1) <> ''
    ORDER BY phrase, event_id
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q26: SELECT SearchPhrase WHERE "
    "non-empty ORDER BY SearchPhrase LIMIT 10): raw-row top-N by the "
    "STRING key itself (Q25 orders by time — cb_raw_rows_by_time; "
    "Q27 by both — cb_phrase_time_then_phrase). The event_id tie-break "
    "is kept IN the output: the r16 oracle audit found the phrase-only "
    "projection degenerate (this corpus's ten lexically-smallest "
    "phrases are all '0', a constant vector any always-'0' bug would "
    "match); with the tie-break column the ten rows are distinct and "
    "the selection is value-checked.",
)
def cb_phrase_lexical_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    phrase = F.regexp_extract("props", '"k": (\\d+)', 1)
    return (
        t["events"]
        .withColumn("phrase", phrase)
        .filter(F.col("phrase") != "")
        .select("phrase", "event_id")
        .orderBy("phrase", "event_id")
        .limit(10)
    )


@query(
    "cb_phrase_time_then_phrase",
    oracle="""
    SELECT ts, regexp_extract(props, '"k": (\\d+)', 1) AS phrase
    FROM events
    WHERE regexp_extract(props, '"k": (\\d+)', 1) <> ''
    ORDER BY ts, phrase, event_id
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q27: SELECT SearchPhrase WHERE "
    "non-empty ORDER BY EventTime, SearchPhrase LIMIT 10): the "
    "composite time-then-string top-N completing the Q25/Q26/Q27 "
    "sort-variant family. TakeOrderedAndProject on the composite "
    "key; filter pushes as a regexp residual.",
)
def cb_phrase_time_then_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    phrase = F.regexp_extract("props", '"k": (\\d+)', 1)
    return (
        t["events"]
        .withColumn("phrase", phrase)
        .filter(F.col("phrase") != "")
        .select("ts", "phrase", "event_id")
        .orderBy("ts", "phrase", "event_id")
        .limit(10)
        .select("ts", "phrase")
    )


@query(
    "cb_const_key_grouping",
    oracle="""
    SELECT 1 AS one, event_type,
           CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY 1, 2
    ORDER BY c DESC, event_type
    LIMIT 10
    """,
    doc="ClickBench shape (hits Q35: SELECT 1, URL, COUNT(*) GROUP "
    "BY 1, URL): a constant grouping key alongside the real one — "
    "the optimizer must fold the constant without changing the "
    "aggregation, and the constant column must survive to the "
    "output schema.",
)
def cb_const_key_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.lit(1).alias("one"), F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "event_type")
        .limit(10)
    )
