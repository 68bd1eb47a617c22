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
