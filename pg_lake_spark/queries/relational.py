"""Relational operator coverage: windows, grouping sets, set ops,
semi/anti joins, subqueries, CTE/VALUES, distinct-on, stat aggregates,
array/JSON access.

Reference parity: the pushdown suites under
pg_lake_table/tests/pytests/ — test_window_function_pushdown.py,
test_grouping_set_pushdown.py, test_set_operation_pushdown.py,
test_cte_subquery_pushdown.py, test_queries.py:1599 (semi join) — define
this surface (SURVEY §2.2-2.6). Every query here is a 1:1 Spark built-in
construction; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg_lake_spark.plans.broadcast import broadcast_if_small as _bcast
from pg_lake_spark.queries.registry import query
from pg_lake_spark.session import load_tables


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.5)
# ---------------------------------------------------------------------------

@query(
    "w_topk_per_user",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      FROM events) t
    WHERE rn <= 3
    ORDER BY user_id, rn
    """,
    doc="row_number top-k per group (DISTINCT ON generalization).",
)
def w_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        t["events"]
        .select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("user_id", "rn")
    )


@query(
    "w_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)        OVER w AS prev_value,
           lead(value)       OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="lag/lead with offset and default; named-window semantics.",
)
def w_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "w_running_agg",
    oracle="""
    SELECT event_id, user_id, ts,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_sum,
           avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3,
           count(*)   OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="Running/moving aggregates with explicit ROWS frames.",
)
def w_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            "ts",
            F.sum("value").over(run).alias("running_sum"),
            F.avg("value").over(mov).alias("moving_avg_3"),
            F.count(F.lit(1)).over(run).alias("running_n"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "w_rank_family",
    oracle="""
    SELECT event_id, event_type, value,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist()    OVER w AS cdist,
           ntile(4)       OVER w AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    ORDER BY event_type, rnk, event_id
    """,
    doc="rank/dense_rank/percent_rank/cume_dist/ntile.",
)
def w_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        t["events"]
        .select(
            "event_id",
            "event_type",
            "value",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("event_type", "rnk", "event_id")
    )


@query(
    "w_value_family",
    oracle="""
    SELECT event_id, user_id, value,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val,
           nth_value(value,2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id, event_id
    """,
    doc="first_value/last_value/nth_value over full-partition frame.",
)
def w_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            "value",
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w).alias("last_val"),
            F.nth_value("value", 2).over(w).alias("second_val"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "w_range_frame",
    oracle="""
    SELECT event_id, user_id, value,
           count(*)   OVER (PARTITION BY user_id ORDER BY value
                            RANGE BETWEEN 10.0 PRECEDING AND 10.0 FOLLOWING) AS peers_within_10,
           sum(value) OVER (PARTITION BY user_id ORDER BY value
                            RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW) AS sum_below_10
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="RANGE frames over a numeric ordering (value-distance windows).",
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w1 = Window.partitionBy("user_id").orderBy("value").rangeBetween(-10, 10)
    w2 = Window.partitionBy("user_id").orderBy("value").rangeBetween(-10, Window.currentRow)
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            "value",
            F.count(F.lit(1)).over(w1).alias("peers_within_10"),
            F.sum("value").over(w2).alias("sum_below_10"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "w_agg_over_window_filter",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS clicks,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
           sum(value) FILTER (WHERE event_type = 'purchase') AS purchase_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="FILTER (WHERE …) on aggregates (test_window_function_pushdown.py:17).",
)
def w_agg_over_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.expr("count(*) FILTER (WHERE event_type = 'click')").alias("clicks"),
            F.expr("count(*) FILTER (WHERE event_type = 'purchase')").alias("purchases"),
            F.expr("sum(value) FILTER (WHERE event_type = 'purchase')").alias("purchase_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube (SURVEY §2.4)
# ---------------------------------------------------------------------------

@query(
    "g_rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus)   AS g_status,
           grouping(o_orderpriority) AS g_priority,
           count(*) AS n_orders,
           sum(o_totalprice) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    doc="ROLLUP with grouping() disambiguation.",
)
def g_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n_orders", "total"
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


@query(
    "g_cube_events",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           grouping(event_type) AS g_type,
           grouping(date_trunc('day', ts)) AS g_day,
           count(*) AS n, sum(value) AS total_value
    FROM events
    GROUP BY CUBE (event_type, date_trunc('day', ts))
    ORDER BY g_type, g_day, event_type, day
    """,
    doc="CUBE over a computed grouping expression.",
)
def g_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn("day", F.date_trunc("day", F.col("ts")))
    return (
        ev.cube("event_type", "day")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select("event_type", "day", "g_type", "g_day", "n", "total_value")
        .orderBy("g_type", "g_day", "event_type", "day")
    )


@query(
    "g_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
    """,
    doc="Explicit GROUPING SETS (test_grouping_set_pushdown.py:6-19).",
)
def g_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
        """
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.6)
# ---------------------------------------------------------------------------

@query(
    "s_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    ORDER BY nationkey, src
    """,
    doc="UNION ALL with provenance column.",
)
def s_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src"))
    return a.unionAll(b).orderBy("nationkey", "src")


@query(
    "s_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="INTERSECT (distinct semantics).",
)
def s_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b).orderBy("nationkey")


@query(
    "s_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    ORDER BY custkey
    """,
    doc="EXCEPT (distinct semantics): high-balance customers with no "
    "large order. The r16 oracle audit found the old nationkey form "
    "VACUOUS — this corpus covers every nation on both sides at every "
    "SF, so the difference was always empty and an always-empty bug "
    "would have passed. The custkey form is non-degenerate at sf0.001/"
    "0.01/0.1 (2/25/351 rows).",
)
def s_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = (
        t["customer"]
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        t["orders"]
        .filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    # subtract() = EXCEPT DISTINCT; exceptAll().distinct() would keep
    # values whose multiplicity in a exceeds that in b — wrong semantics.
    return a.subtract(b).orderBy("custkey")


# ---------------------------------------------------------------------------
# Joins beyond inner (SURVEY §2.3)
# ---------------------------------------------------------------------------

@query(
    "j_outer_join_coalesce",
    oracle="""
    SELECT n_name, coalesce(cnt, 0) AS n_customers
    FROM nation LEFT JOIN (
      SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY c_nationkey
    ) c ON n_nationkey = c_nationkey
    ORDER BY n_name
    """,
    doc="LEFT OUTER join + COALESCE null handling.",
)
def j_outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    counts = t["customer"].groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        t["nation"]
        .join(counts, F.col("n_nationkey") == F.col("c_nationkey"), "left")
        .select("n_name", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_customers"))
        .orderBy("n_name")
    )


@query(
    "j_full_outer",
    oracle="""
    SELECT coalesce(c.k, s.k) AS nationkey, c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.k = s.k
    ORDER BY nationkey
    """,
    doc="FULL OUTER join of two aggregates.",
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_cust"))
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        c.join(s, c.k == s.k, "full_outer")
        .select(F.coalesce(c.k, s.k).alias("nationkey"), "n_cust", "n_supp")
        .orderBy("nationkey")
    )


@query(
    "j_semi_anti",
    oracle="""
    SELECT
      (SELECT count(*) FROM part WHERE p_partkey IN
          (SELECT l_partkey FROM lineitem WHERE l_quantity > 45))      AS parts_with_bulk_sales,
      (SELECT count(*) FROM part WHERE p_partkey NOT IN
          (SELECT l_partkey FROM lineitem WHERE l_quantity > 45))      AS parts_without_bulk_sales,
      (SELECT count(*) FROM customer WHERE NOT EXISTS
          (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_totalprice > 350000))                               AS customers_without_big_orders
    """,
    doc="SEMI/ANTI join counts from IN / NOT IN / NOT EXISTS "
    "(test_queries.py:1599). The right sides carry selective predicates "
    "(l_quantity > 45, o_totalprice > 350000): the r16 oracle audit found "
    "the unfiltered form degenerate — this corpus covers every partkey "
    "and custkey, so the anti legs were constant 0 and the semi leg the "
    "full table count. All three legs are now strictly between 0 and "
    "the table size at sf0.001/0.01/0.1.",
)
def j_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One lazy plan, one job: three single-row aggregates cross-joined
    # (no driver-side .count() round-trips; the semi and anti scans of
    # part⋈lineitem share their shuffle via ReusedExchange).
    t = load_tables(spark, sf_dir)
    part, cust = t["part"], t["customer"]
    li = t["lineitem"].filter(F.col("l_quantity") > 45)
    ords = t["orders"].filter(F.col("o_totalprice") > 350000)
    with_sales = part.join(li, part.p_partkey == li.l_partkey, "left_semi").agg(
        F.count("*").alias("parts_with_bulk_sales")
    )
    without_sales = part.join(li, part.p_partkey == li.l_partkey, "left_anti").agg(
        F.count("*").alias("parts_without_bulk_sales")
    )
    cust_no_orders = cust.join(ords, cust.c_custkey == ords.o_custkey, "left_anti").agg(
        F.count("*").alias("customers_without_big_orders")
    )
    return with_sales.crossJoin(without_sales).crossJoin(cust_no_orders)


@query(
    "j_cross_join",
    oracle="""
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_name < r2.r_name
    ORDER BY region_a, region_b
    """,
    doc="Cross join with theta filter (comma-join shape).",
)
def j_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    r1 = t["region"].select(F.col("r_name").alias("region_a"))
    r2 = t["region"].select(F.col("r_name").alias("region_b"))
    return r1.crossJoin(r2).filter(F.col("region_a") < F.col("region_b")).orderBy("region_a", "region_b")


# ---------------------------------------------------------------------------
# Distinct / subqueries / CTE / VALUES (SURVEY §2.4, §2.6)
# ---------------------------------------------------------------------------

@query(
    "d_distinct_on_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    ORDER BY user_id
    """,
    doc="DISTINCT ON (latest event per user) via row_number()=1.",
)
def d_distinct_on_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id"))
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


@query(
    "d_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           count(DISTINCT date_trunc('day', ts)) AS n_days
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Multiple COUNT(DISTINCT) in one aggregate (expand-based plan).",
)
def d_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("n_days"),
        )
        .orderBy("event_type")
    )


@query(
    "d_cte_values_join",
    oracle="""
    WITH seg(mktsegment, tier) AS (
      VALUES ('BUILDING', 'core'), ('AUTOMOBILE', 'core'),
             ('MACHINERY', 'growth'), ('HOUSEHOLD', 'growth'), ('FURNITURE', 'other')
    )
    SELECT tier, count(*) AS n_customers, sum(c_acctbal) AS total_balance
    FROM customer JOIN seg ON c_mktsegment = seg.mktsegment
    GROUP BY tier
    ORDER BY tier
    """,
    doc="CTE + VALUES list join (query_pushdown.c:346-383 alias fixups analogue).",
)
def d_cte_values_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t["customer"]  # registers the view (loading is lazy)
    return spark.sql(
        """
        WITH seg AS (
          SELECT * FROM VALUES ('BUILDING','core'), ('AUTOMOBILE','core'),
                               ('MACHINERY','growth'), ('HOUSEHOLD','growth'),
                               ('FURNITURE','other') AS seg(mktsegment, tier)
        )
        SELECT tier, count(*) AS n_customers, sum(c_acctbal) AS total_balance
        FROM customer JOIN seg ON c_mktsegment = seg.mktsegment
        GROUP BY tier
        ORDER BY tier
        """
    )


@query(
    "d_correlated_scalar_subquery",
    oracle="""
    SELECT n_name,
           (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
    FROM nation
    ORDER BY n_name
    """,
    doc="Correlated scalar subquery (decorrelated to an aggregate join).",
)
def d_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t["customer"], t["nation"]  # register views (loading is lazy)
    return spark.sql(
        """
        SELECT n_name,
               (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
        FROM nation
        ORDER BY n_name
        """
    )


# ---------------------------------------------------------------------------
# Statistical & ordered-set aggregates (SURVEY §2.4)
# ---------------------------------------------------------------------------

@query(
    "a_stat_aggs",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 6) AS sd_price,
           round(stddev_pop(l_extendedprice), 6)  AS sdp_price,
           round(var_samp(l_discount), 9)         AS var_disc,
           round(var_pop(l_discount), 9)          AS varp_disc,
           round(corr(l_extendedprice, l_quantity), 9)      AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 6) AS cov_pq,
           round(covar_pop(l_extendedprice, l_quantity), 6)  AS covp_pq
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="stddev/variance/corr/covar family (shippable_builtin_functions.c:110-165).",
)
def a_stat_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        # rounded on both sides: the moment accumulations associate
        # differently per engine (comparator compat, not semantics)
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
            F.round(F.stddev_pop("l_extendedprice"), 6).alias("sdp_price"),
            F.round(F.var_samp("l_discount"), 9).alias("var_disc"),
            F.round(F.var_pop("l_discount"), 9).alias("varp_disc"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 9).alias("corr_pq"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 6).alias("cov_pq"),
            F.round(F.covar_pop("l_extendedprice", "l_quantity"), 6).alias("covp_pq"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a_regr_aggs",
    oracle="""
    SELECT CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS r_count,
           round(regr_avgx(l_extendedprice, l_quantity), 6)      AS r_avgx,
           round(regr_avgy(l_extendedprice, l_quantity), 6)      AS r_avgy,
           round(regr_slope(l_extendedprice, l_quantity), 9)     AS r_slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS r_intercept,
           round(regr_r2(l_extendedprice, l_quantity), 9)        AS r_r2,
           round(regr_sxx(l_extendedprice, l_quantity), 4)       AS r_sxx,
           round(regr_syy(l_extendedprice, l_quantity), 4)       AS r_syy,
           round(regr_sxy(l_extendedprice, l_quantity), 4)       AS r_sxy
    FROM lineitem
    """,
    doc="Linear-regression aggregate family.",
)
def a_regr_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    # r_count cast (DuckDB returns UINT) and floats rounded on both
    # sides — comparator compat for engine-order accumulation diffs
    return li.agg(
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias("r_count"),
        F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 6).alias("r_avgx"),
        F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 6).alias("r_avgy"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 9).alias("r_slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("r_intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 9).alias("r_r2"),
        F.round(F.regr_sxx("l_extendedprice", "l_quantity"), 4).alias("r_sxx"),
        F.round(F.regr_syy("l_extendedprice", "l_quantity"), 4).alias("r_syy"),
        F.round(F.regr_sxy("l_extendedprice", "l_quantity"), 4).alias("r_sxy"),
    )


@query(
    "a_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.95) AS p95,
           min(value) AS min_v, max(value) AS max_v
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="percentile_cont (exact interpolated) per group.",
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .orderBy("event_type")
    )


@query(
    "a_mode_disc",
    oracle="""
    WITH c AS (SELECT event_type, value, count(*) AS n
               FROM events GROUP BY event_type, value),
    m AS (SELECT event_type, value AS mode_v FROM (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY n DESC, value) AS rn
            FROM c) WHERE rn = 1),
    p AS (SELECT event_type,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_disc,
                 percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90_disc
          FROM events GROUP BY event_type)
    SELECT p.event_type, m.mode_v, p.p50_disc, p.p90_disc
    FROM p JOIN m USING (event_type)
    ORDER BY event_type
    """,
    doc="mode() ordered-set aggregate + percentile_disc "
    "(shippable_builtin_functions.c:166-171). Spark's deterministic "
    "mode breaks count ties by lowest value; the oracle reproduces that "
    "tie-break explicitly since DuckDB's mode() tie order is arbitrary.",
)
def a_mode_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.mode("value", True).alias("mode_v"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50_disc"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90_disc"),
        )
        .orderBy("event_type")
    )


@query(
    "a_bool_string_agg",
    oracle="""
    SELECT n_regionkey,
           bool_and(n_nationkey >= 0) AS all_nonneg,
           bool_or(n_nationkey > 20)  AS any_gt20,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           array_to_string(list(n_nationkey ORDER BY n_nationkey), ',') AS keys_csv
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    doc="bool_and/bool_or/string_agg/array_agg with deterministic ordering.",
)
def a_bool_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .groupBy("n_regionkey")
        .agg(
            F.bool_and(F.col("n_nationkey") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("n_nationkey") > 20).alias("any_gt20"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("n_nationkey")), lambda x: x.cast("string")),
                ",",
            ).alias("keys_csv"),
        )
        .orderBy("n_regionkey")
    )


# ---------------------------------------------------------------------------
# Arrays / JSON / generate_series-unnest (SURVEY §2.7 array & JSON rows)
# ---------------------------------------------------------------------------

@query(
    "arr_ops",
    oracle="""
    SELECT vec_id,
           len(embedding)                                  AS dim,
           CAST(embedding[1] AS DOUBLE)                    AS first_elem,
           CAST(list_aggregate(embedding, 'sum') AS DOUBLE) AS vec_sum,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vec_max
    FROM embeddings
    ORDER BY vec_id
    LIMIT 50
    """,
    doc="Array length/index/fold (cardinality, element access, aggregate-over-array).",
)
def arr_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    emb = F.col("embedding").cast("array<double>")
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            emb.getItem(0).alias("first_elem"),
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
            F.array_max(emb).alias("vec_max"),
        )
        .orderBy("vec_id")
        .limit(50)
    )


@query(
    "arr_unnest_series",
    oracle="""
    SELECT g.i AS i, count(*) AS n_orders
    FROM orders, generate_series(1, 5) AS g(i)
    WHERE o_orderkey % 5 = g.i % 5
    GROUP BY g.i ORDER BY g.i
    """,
    doc="generate_series lateral + unnest-style expansion (UDTF surface §2.10).",
)
def arr_unnest_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    series = spark.range(1, 6).select(F.col("id").alias("i"))
    return (
        t["orders"]
        .crossJoin(F.broadcast(series))
        .filter(F.col("o_orderkey") % 5 == F.col("i") % 5)
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("i")
    )


@query(
    "json_extract_agg",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           sum(value) AS total_value
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
    doc="JSON field extraction + cast + aggregate (jsonb operator surface).",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        t["events"]
        .groupBy((k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .orderBy("k_bucket")
    )


@query(
    "w_exclude_current_row",
    oracle="""
    SELECT event_id, user_id, value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                             EXCLUDE CURRENT ROW), 6) AS sum_others,
           count(*)    OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                             EXCLUDE CURRENT ROW) AS n_others,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                                  EXCLUDE CURRENT ROW), 6) AS avg_neighbors
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="EXCLUDE CURRENT ROW frames (SURVEY §2.5 hard part — no Spark "
    "support, emulated by subtracting the current row's contribution "
    "from the inclusive frame; the oracle uses DuckDB's native EXCLUDE).",
)
def w_exclude_current_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    near = w.rowsBetween(-3, 3)
    n_near_excl = F.count(F.lit(1)).over(near) - 1
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            "value",
            # rounded like avg_neighbors: partition-wide double sums
            # associate differently per engine (ulp-level)
            F.round(F.sum("value").over(full) - F.col("value"), 6).alias("sum_others"),
            (F.count(F.lit(1)).over(full) - 1).alias("n_others"),
            # avg EXCLUDE CURRENT ROW = (frame_sum - value) / (frame_n - 1);
            # NULL when the row is alone in its frame, matching the spec.
            # rounded: windowed sums associate differently per engine, and
            # this float is the comparator's first sort column — 6-decimal
            # rounding makes the cross-engine ordering deterministic
            F.round(
                F.when(
                    n_near_excl > 0,
                    (F.sum("value").over(near) - F.col("value")) / n_near_excl,
                ),
                6,
            ).alias("avg_neighbors"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "d_limit_with_ties",
    oracle="""
    SELECT o_totalprice, o_orderkey FROM (
        SELECT o_totalprice, o_orderkey,
               rank() OVER (ORDER BY o_totalprice DESC) AS rnk
        FROM orders
    ) WHERE rnk <= 10
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    doc="LIMIT WITH TIES (reference declares it not-shippable, "
    "query_pushdown.c NOT_SHIPPABLE_SQL_LIMIT_WITH_TIES; we support it "
    "via the standard rank()<=n rewrite).",
)
def d_limit_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.orderBy(F.col("o_totalprice").desc())
    return (
        t["orders"]
        .select("o_totalprice", "o_orderkey", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 10)
        .select("o_totalprice", "o_orderkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@query(
    "g_grouping_fn",
    oracle="""
    SELECT CAST(grouping(o_orderstatus) AS INT)   AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           o_orderstatus, o_orderpriority,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
    """,
    doc="GROUPING() marker function distinguishing rollup NULLs from data "
    "NULLs (shippable aggregate surface; test_grouping_set_pushdown.py).",
)
def g_grouping_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("g_status", "g_prio", "o_orderstatus", "o_orderpriority", "n")
        .orderBy(
            "g_status",
            "g_prio",
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


@query(
    "d_not_in_three_valued",
    oracle="""
    SELECT count(*) AS n_not_in_with_null,
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderdate >= TIMESTAMP '2001-01-01')
           ) AS n_not_in_no_null
    FROM customer
    WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                                        ELSE o_custkey END
                            FROM orders)
    """,
    doc="NOT IN three-valued logic: a NULL in the subquery list makes "
    "NOT IN never-true (count 0), while the NULL-free variant anti-joins "
    "— the PG semantics Catalyst's RewritePredicateSubquery must preserve.",
)
def d_not_in_three_valued(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t["customer"].createOrReplaceTempView("customer")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT count(*) AS n_not_in_with_null,
               (SELECT count(*) FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                        WHERE o_orderdate >= TIMESTAMP '2001-01-01')
               ) AS n_not_in_no_null
        FROM customer
        WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                                            ELSE o_custkey END
                                FROM orders)
        """
    )


@query(
    "j_lateral_topn",
    oracle="""
    SELECT n_name, t.top_custkey, t.top_acctbal
    FROM nation, LATERAL (
        SELECT c_custkey AS top_custkey, c_acctbal AS top_acctbal
        FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) t
    ORDER BY n_name, top_acctbal DESC, top_custkey
    """,
    doc="Correlated LATERAL re-scan (test_queries.py:96-103 cursor "
    "re-scan shape): top-2 customers per nation via a lateral subquery "
    "— Catalyst decorrelates it into a ranked window join.",
)
def j_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t["nation"].createOrReplaceTempView("nation")
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n_name, t.top_custkey, t.top_acctbal
        FROM nation, LATERAL (
            SELECT c_custkey AS top_custkey, c_acctbal AS top_acctbal
            FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
        ORDER BY n_name, top_acctbal DESC, top_custkey
        """
    )


@query(
    "e_funnel",
    oracle="""
    SELECT
        count(*) FILTER (t_view IS NOT NULL) AS n_viewed,
        count(*) FILTER (t_view IS NOT NULL AND t_click > t_view) AS n_clicked_after,
        count(*) FILTER (t_view IS NOT NULL AND t_click > t_view
                         AND t_buy > t_click) AS n_purchased_after
    FROM (
        SELECT user_id,
               min(ts) FILTER (event_type = 'view')     AS t_view,
               min(ts) FILTER (event_type = 'click')    AS t_click,
               min(ts) FILTER (event_type = 'purchase') AS t_buy
        FROM events
        GROUP BY user_id
    ) u
    """,
    doc="Event funnel (view → click → purchase, strictly ordered first "
    "timestamps per user) — one grouped pass with FILTERed min aggs.",
)
def e_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_user = t["events"].groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("n_viewed"),
        F.count(F.when(clicked, 1)).alias("n_clicked_after"),
        F.count(F.when(bought, 1)).alias("n_purchased_after"),
    )


@query(
    "e_retention",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    )
    SELECT CAST(a.d AS TIMESTAMP) AS cohort_day,
           count(DISTINCT a.user_id) AS n_active,
           count(DISTINCT b.user_id) AS n_retained_next_day
    FROM active a
    LEFT JOIN active b ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
    GROUP BY a.d
    ORDER BY cohort_day
    """,
    doc="Day-over-day retention: distinct active users per day self-joined "
    "to the next day — the cohort-retention primitive for event analytics.",
)
def e_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    active = (
        t["events"]
        .select("user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .distinct()
    )
    nxt = active.select(F.col("user_id").alias("b_user"), F.col("d").alias("b_d"))
    return (
        active.join(
            nxt,
            (F.col("b_user") == F.col("user_id"))
            & (F.col("b_d") == F.date_add(F.col("d"), 1)),
            "left_outer",
        )
        # cohort_day as TIMESTAMP on both sides: a DATE column reaches
        # pandas as object-dtype date cells on the Spark side but
        # datetime64 from DuckDB — different reprs, failed hash
        .groupBy(F.col("d").cast("timestamp_ntz").alias("cohort_day"))
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.countDistinct("b_user").alias("n_retained_next_day"),
        )
        .orderBy("cohort_day")
    )


@query(
    "j_asof_prior_view",
    oracle="""
    WITH v AS (
        SELECT user_id, ts AS view_ts, min(event_id) AS view_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, v.view_ts AS ts_r, v.view_id AS view_id_r
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    ORDER BY p.event_id
    """,
    doc="As-of join (operator Spark lacks; built as union + carry-forward "
    "window, one shuffle on the key) — each purchase joined to the user's "
    "most recent prior-or-same view; oracle uses DuckDB's native ASOF JOIN.",
)
def j_asof_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.operators.asof import asof_join

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    # dedup right side per (user, ts) so the as-of pick is deterministic
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(F.min("event_id").alias("view_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        right_cols=["view_id"],
        suffix="_r",
    )
    return (
        out.select(
            "event_id",
            "user_id",
            "ts",
            F.col("view_ts_r").alias("ts_r"),
            F.col("view_id_r"),
        )
        .orderBy("event_id")
    )


@query(
    "j_range_within_hour",
    oracle="""
    SELECT v.user_id, count(*) AS n_pairs,
           CAST(sum(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS total_gap_us
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
    doc="Keyed range join: view→purchase pairs within one hour per user "
    "— equi key carries the shuffle, the range predicate filters in the "
    "join (SMJ post-filter); the additive operator class SURVEY §2.3 "
    "notes is absent from the reference.",
)
def j_range_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") < F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.unix_micros(F.col("p_ts").cast("timestamp"))
                - F.unix_micros(F.col("v_ts").cast("timestamp"))
            ).alias("total_gap_us"),
        )
        .orderBy("user_id")
    )


@query(
    "s_except_all",
    oracle="""
    SELECT nationkey, count(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
    ) e
    GROUP BY nationkey
    ORDER BY nationkey
    """,
    doc="EXCEPT ALL (bag semantics — each supplier occurrence cancels one "
    "customer occurrence), distinct-variant twin of s_except.",
)
def s_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


@query(
    "g_rollup_rank_hierarchy",
    oracle="""
    WITH agg AS (
      SELECT n_name, o_orderstatus,
             round(sum(o_totalprice), 2) AS revenue,
             CAST(grouping(n_name) + grouping(o_orderstatus) AS INT) AS lochier
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, o_orderstatus)
    )
    SELECT n_name, o_orderstatus, revenue, lochier,
           CAST(rank() OVER (
             PARTITION BY lochier, CASE WHEN lochier = 0 THEN n_name END
             ORDER BY revenue DESC, n_name, o_orderstatus) AS INT) AS rank_in_parent
    FROM agg
    ORDER BY lochier DESC, n_name NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    doc="TPC-DS q36 shape: rank within a rollup hierarchy — ROLLUP + "
    "GROUPING() feeding a window partitioned by hierarchy level. The "
    "window runs over the already-aggregated (tiny) frame, so the only "
    "full-data work is the rollup's one shuffle.",
)
def g_rollup_rank_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:

    t = load_tables(spark, sf_dir)
    base = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(_bcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = base.rollup("n_name", "o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        (F.grouping("n_name") + F.grouping("o_orderstatus")).cast("int").alias("lochier"),
    )
    w = Window.partitionBy(
        "lochier", F.when(F.col("lochier") == 0, F.col("n_name"))
    ).orderBy(F.col("revenue").desc(), "n_name", "o_orderstatus")
    return (
        agg.withColumn("rank_in_parent", F.rank().over(w).cast("int"))
        .select("n_name", "o_orderstatus", "revenue", "lochier", "rank_in_parent")
        .orderBy(
            F.col("lochier").desc(),
            F.col("n_name").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@query(
    "j_bucketed_colocated",
    oracle="""
    SELECT c_custkey AS ckey, c_name, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY ckey
    """,
    doc="Co-located bucketed join (sources/bucketed.py): both sides are "
    "bucket-written on the join key with equal bucket counts, so the "
    "join itself runs with zero Exchange (asserted in test_sources.py); "
    "this row proves the RESULT equals the plain join through the "
    "external oracle.",
)
def j_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pg_lake_spark.queries.dml import _scratch
    from pg_lake_spark.sources.bucketed import co_located_join, write_bucketed

    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(
        F.col("c_custkey").alias("ckey"), "c_name"
    )
    ords = t["orders"].select(
        F.col("o_custkey").alias("ckey"), "o_totalprice"
    )
    # Session-scoped scratch locations + drop-if-exists make the query
    # re-runnable across sessions (a stale warehouse dir would otherwise
    # fail saveAsTable with LOCATION_ALREADY_EXISTS).
    root = _scratch("j_bucketed_colocated")
    for name in ("q_bkt_customer", "q_bkt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(cust, "q_bkt_customer", ["ckey"], 8, path=os.path.join(root, "cust"))
    write_bucketed(ords, "q_bkt_orders", ["ckey"], 8, path=os.path.join(root, "ords"))
    return (
        co_located_join(spark, "q_bkt_customer", "q_bkt_orders", on=["ckey"])
        .groupBy("ckey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("ckey")
    )


@query(
    "j_salted_skew",
    oracle="""
    SELECT c_nationkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="Salted skew join (operators/skew.py): the fact side gets a "
    "deterministic xxhash64 salt, the dim side replicates per salt, and "
    "the (key, salt) join spreads any hot key over salt_factor "
    "reducers; the result must equal the plain join.",
)
def j_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lake_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir)
    fact = t["orders"].select(F.col("o_custkey").alias("ckey"), "o_totalprice")
    dim = t["customer"].select(F.col("c_custkey").alias("ckey"), "c_nationkey")
    return (
        salted_join(fact, dim, on=["ckey"], salt_factor=8)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "d_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT doc_id AS child, CAST(floor(doc_id / 2) AS BIGINT) AS parent
      FROM documents WHERE doc_id > 1
    ), walk AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT e.child, w.depth + 1
      FROM walk w JOIN edges e ON e.parent = w.node
      WHERE w.depth < 30
    )
    SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM walk GROUP BY depth ORDER BY depth
    """,
    doc="WITH RECURSIVE over a data-derived edge set (binary-tree "
    "parent = floor(id/2) over documents): per-depth node counts of "
    "the traversal from the root. PG runs recursive CTEs natively and "
    "the reference delegates them to the PG executor; Spark 4 grants "
    "the same surface (recursion depth bounded by the WHERE guard). "
    "floor() before the cast on BOTH engines — DuckDB CASTs round "
    "while Spark CASTs truncate, the classic cross-engine trap.",
)
def d_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16 opt (guide §1.2, §2.3): the recursion itself stays native
    # WITH RECURSIVE — the surface this row certifies — but the
    # loop-INVARIANT edge set is materialized once (2 bigints/row,
    # eager localCheckpoint) instead of re-scanning and re-projecting
    # the documents parquet on every iteration, and the per-level join
    # carries a BROADCAST hint so no iteration shuffles (the walk
    # level probes a rebuilt-from-memory broadcast; same rows by
    # construction — the hint only picks the join strategy).
    # A/B noop at sf0.1: 2.88s median -> 2.17s, variance collapsed.
    t = load_tables(spark, sf_dir)
    edges = (
        t["documents"]
        .where(F.col("doc_id") > 1)
        .select(
            F.col("doc_id").alias("child"),
            F.floor(F.col("doc_id") / 2).cast("bigint").alias("parent"),
        )
        .localCheckpoint(eager=True)
    )
    edges.createOrReplaceTempView("_rh_edges")
    return spark.sql("""
    WITH RECURSIVE walk AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT /*+ BROADCAST(e) */ e.child, w.depth + 1
      FROM walk w JOIN _rh_edges e ON e.parent = w.node
      WHERE w.depth < 30
    )
    SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM walk GROUP BY depth ORDER BY depth
    """)
