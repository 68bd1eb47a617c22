"""TPC-DS-shape query pack, fifth wave (r10).

Continues ``tpcds.py`` (same adaptation contract: keep each DS query's
plan-stressing SHAPE, re-expressed over the driver's star corpus; the
reference runs all 99 via pg_lake_benchmark/src/tpcds.c:1,
pg_lake_benchmark/README.md:9-28). This wave targets the families the
r9 verdict called out as adding genuinely NEW constructs, plus the
simple star-aggregate families that close out the inventory:

- Q36: gross-margin ROLLUP with rank-within-hierarchy-parent (the
  lochierarchy + CASE-partitioned window construct)
- Q80: three channels each producing (sales, returns, profit) from
  conditional aggregates, UNION ALL'd into one ROLLUP
- Q94: date-windowed orders gated by EXISTS (multi-supplier line
  chain) AND NOT EXISTS (returned line) — the shipping-chain gate
- Q30/Q81: per-customer return total vs 1.2x the geography average
  (correlated average over a derived frame)
- Q99/Q62: two-dimensional days-to-ship bucket MATRIX (priority x
  month; Q50's banded counts are one-dimensional per nation)
- Q27: filtered multi-dim ROLLUP of four averages with GROUPING()
- Q3/Q42/Q52/Q55: the star-aggregate family (one fact, one dim
  filter, brand/type revenue by time slice)
- Q7/Q26: disjunction-free demographic averages (Q85's simpler kin)
- Q19: brand revenue where the customer and supplier geography
  DIFFER (the cross-zip arm), plus Q11 (two-channel YoY preference),
  Q12/Q20 (windowed revenue share by channel), Q25 (sales+returns+
  second-channel 3-way monthly net), Q43 (day-of-week matrix),
  Q53/Q63 (quarterly deviation from yearly average), Q56/Q60
  (restricted-id category union totals), Q68/Q73/Q79 (order-size
  band customer profiles), Q69 (active-in-one-channel NOT-in-others
  demographic profile), Q86 (2-level rollup rank), Q91 (returns by
  demographic arms per month), Q92 (excess-discount sibling with a
  date-windowed correlated average), Q82 (store-side active-band
  parts sibling of Q37).

Spark-first notes: identical discipline to tpcds.py — aggregate
before windowing/self-joining, constant-cardinality dims broadcast
hard, SF-scaled dims through the size gate, one fact shuffle per
aggregation, zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pg_lake_spark.plans.broadcast import broadcast_if_small as _bcast
from pg_lake_spark.queries.registry import query
from pg_lake_spark.queries.tpcds import _ts
from pg_lake_spark.session import load_tables


@query(
    "dsq36_margin_rollup_rank",
    oracle="""
    WITH agg AS (
      SELECT CAST(grouping(r_name) + grouping(n_name) AS INT)
               AS lochierarchy,
             r_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount))
                   / sum(l_extendedprice), 6) AS gross_margin
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY ROLLUP (r_name, n_name)
    )
    SELECT lochierarchy, r_name, n_name, gross_margin,
           CAST(rank() OVER (
                  PARTITION BY lochierarchy,
                               CASE WHEN lochierarchy = 0
                                    THEN r_name END
                  ORDER BY gross_margin ASC, n_name NULLS FIRST)
                AS INT) AS rank_within_parent
    FROM agg
    ORDER BY lochierarchy DESC, r_name NULLS FIRST, n_name NULLS FIRST
    """,
    doc="TPC-DS Q36 shape: gross-margin ROLLUP over a 2-level "
    "geography hierarchy with rank() partitioned by (lochierarchy, "
    "parent-when-leaf) — the CASE-in-PARTITION-BY construct Q67/Q70 "
    "lack. Margin is rounded to 6dp BEFORE ranking so both engines "
    "rank identical keys (float-ulp rank-flip guard). The window sees "
    "only rolled-up rows (|regions|x|nations|).",
)
def dsq36_margin_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    agg = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(_bcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") + F.grouping("n_name"))
            .cast("int")
            .alias("lochierarchy"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                / F.sum("l_extendedprice"),
                6,
            ).alias("gross_margin"),
        )
        .select("lochierarchy", "r_name", "n_name", "gross_margin")
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("r_name")),
    ).orderBy(F.col("gross_margin").asc(), F.col("n_name").asc_nulls_first())
    return (
        agg.withColumn("rank_within_parent", F.rank().over(w).cast("int"))
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


@query(
    "dsq80_tri_channel_net_rollup",
    oracle="""
    WITH chan AS (
      SELECT 'line' AS channel, n_name AS id,
             coalesce(sum(CASE WHEN l_returnflag <> 'R'
                     THEN l_extendedprice * (1 - l_discount) END), 0)
               AS sales,
             coalesce(sum(CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice * (1 - l_discount) END), 0)
               AS returns,
             coalesce(sum(CASE WHEN l_returnflag <> 'R'
                     THEN l_extendedprice * (1 - l_discount) * (1 - l_tax)
                     ELSE -l_extendedprice * (1 - l_discount) END), 0)
               AS profit
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name
      UNION ALL
      SELECT 'order' AS channel, c_mktsegment AS id,
             coalesce(sum(CASE WHEN o_orderstatus <> 'F'
                     THEN o_totalprice END), 0) AS sales,
             coalesce(sum(CASE WHEN o_orderstatus = 'F'
                     THEN o_totalprice END), 0) AS returns,
             coalesce(sum(CASE WHEN o_orderstatus <> 'F'
                     THEN o_totalprice ELSE -o_totalprice END), 0)
               AS profit
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY c_mktsegment
      UNION ALL
      SELECT 'event' AS channel, event_type AS id,
             coalesce(sum(CASE WHEN event_type <> 'error' THEN value END), 0)
               AS sales,
             coalesce(sum(CASE WHEN event_type = 'error' THEN value END), 0)
               AS returns,
             coalesce(sum(CASE WHEN event_type = 'error' THEN -value
                               ELSE value END), 0) AS profit
      FROM events GROUP BY event_type
    )
    SELECT channel, id,
           round(sum(sales), 2)   AS sales,
           round(sum(returns), 2) AS returns,
           round(sum(profit), 2)  AS profit
    FROM chan
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    """,
    doc="TPC-DS Q80 shape: three channels each reduced to "
    "(sales, returns, profit) via conditional aggregates over their "
    "own fact+dim path, UNION ALL'd into a (channel, id) ROLLUP. "
    "Extends dsq05 (which unions a single measure) with the "
    "three-measure returns-netting arithmetic. Each channel "
    "aggregates before the union, so the rollup's input is "
    "O(|ids|) rows; dims broadcast; one shuffle per channel plus "
    "the rollup's.",
)
def dsq80_tri_channel_net_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    z = F.lit(0)
    line = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(_bcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("id"))
        .agg(
            F.coalesce(F.sum(F.when(F.col("l_returnflag") != "R", net)), z).alias("sales"),
            F.coalesce(F.sum(F.when(F.col("l_returnflag") == "R", net)), z).alias("returns"),
            F.coalesce(
                F.sum(
                    F.when(F.col("l_returnflag") != "R", net * (1 - F.col("l_tax")))
                    .otherwise(-net)
                ),
                z,
            ).alias("profit"),
        )
        .select(F.lit("line").alias("channel"), "id", "sales", "returns", "profit")
    )
    orderc = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .join(_bcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("id"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("o_orderstatus") != "F", F.col("o_totalprice"))), z
            ).alias("sales"),
            F.coalesce(
                F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), z
            ).alias("returns"),
            F.coalesce(
                F.sum(
                    F.when(F.col("o_orderstatus") != "F", F.col("o_totalprice"))
                    .otherwise(-F.col("o_totalprice"))
                ),
                z,
            ).alias("profit"),
        )
        .select(F.lit("order").alias("channel"), "id", "sales", "returns", "profit")
    )
    eventc = (
        t["events"]
        .groupBy(F.col("event_type").alias("id"))
        .agg(
            # 'error' events are the return flow — corpus values are
            # strictly positive, so the old value<0 returns leg was
            # ALWAYS zero and the netting arithmetic this channel
            # exists to stress went uncovered (r15 review)
            F.coalesce(
                F.sum(F.when(F.col("event_type") != "error", F.col("value"))), z
            ).alias("sales"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "error", F.col("value"))), z
            ).alias("returns"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "error", -F.col("value")
                    ).otherwise(F.col("value"))
                ),
                z,
            ).alias("profit"),
        )
        .select(F.lit("event").alias("channel"), "id", "sales", "returns", "profit")
    )
    return (
        line.unionByName(orderc)
        .unionByName(eventc)
        .rollup("channel", "id")
        .agg(
            F.round(F.sum("sales"), 2).alias("sales"),
            F.round(F.sum("returns"), 2).alias("returns"),
            F.round(F.sum("profit"), 2).alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
    )


@query(
    "dsq94_ship_chain_anti",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-03-01'
      AND o_orderdate <  TIMESTAMP '1997-09-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_suppkey <> l2.l_suppkey
        WHERE l1.l_orderkey = o.o_orderkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem lr
        WHERE lr.l_orderkey = o.o_orderkey
          AND lr.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-DS Q94 shape: date-windowed orders kept only when a "
    "multi-warehouse shipping chain EXISTS (a second line from a "
    "DIFFERENT supplier) and NO returned line exists — the "
    "EXISTS-self-join + NOT-EXISTS gate pair. Spark computes both "
    "gates in ONE pass over lineitem (per-order count-distinct "
    "supplier + max-returnflag), then a single semi-join carries "
    "qualifying keys to the filtered orders — one fact shuffle "
    "instead of two correlated-subquery scans.",
)
def dsq94_ship_chain_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1997-03-01"))
        & (F.col("o_orderdate") < _ts("1997-09-01"))
    )
    # Gate the fact by the WINDOWED order keys BEFORE the per-order
    # aggregate: the semi-join shuffles lineitem on the same key the
    # groupBy needs (one effective fact shuffle), and the aggregate
    # then reduces only the ~window fraction of orders instead of the
    # whole fact. A/B at sf10: 20.6s -> 7.7s warm (2.7x); identical
    # results (lines belong to exactly one order, so per-order gates
    # are unchanged by the order-level window).
    li = t["lineitem"].select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    ).join(
        o.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    gates = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("nsupp"),
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_ret"),
        )
        .filter((F.col("nsupp") > 1) & (F.col("has_ret") == 0))
        .select("l_orderkey")
    )
    return (
        o.join(gates, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "dsq30_return_ratio_vs_state",
    oracle="""
    WITH ctr AS (
      SELECT c_custkey, c_name, n_name,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT)
               AS ret_cents
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2, 3
    )
    SELECT c_custkey, c_name, n_name,
           round(ret_cents / 100.0, 2) AS total_return
    FROM ctr c1
    WHERE ret_cents > 1.2 * (SELECT avg(ret_cents)
                             FROM ctr c2
                             WHERE c2.n_name = c1.n_name)
    ORDER BY c_custkey
    """,
    doc="TPC-DS Q30/Q81 shape: per-customer return total kept only "
    "when it exceeds 1.2x the AVERAGE return total of the customer's "
    "geography — a correlated aggregate over the derived frame "
    "itself (not the base fact, which is dsq01's variant). Spark "
    "computes the geography average as a window over the grouped "
    "frame — zero extra shuffles beyond the group-by (the window "
    "repartitions |customers| rows, not the fact). Totals accumulate "
    "as exact integer CENTS so the 1.2x gate compares identical "
    "values in both engines (float-sum boundary guard).",
)
def dsq30_return_ratio_vs_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ctr = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast(t["customer"].select("c_custkey", "c_name", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_net_cents().alias("ret_cents"))
    )
    w = Window.partitionBy("n_name")
    return (
        ctr.withColumn("state_avg", F.avg("ret_cents").over(w))
        .filter(F.col("ret_cents") > 1.2 * F.col("state_avg"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("ret_cents") / 100.0, 2).alias("total_return"),
        )
        .orderBy("c_custkey")
    )


@query(
    "dsq99_latency_bucket_matrix",
    oracle="""
    SELECT o_orderpriority,
           CAST(month(l_shipdate) AS INT) AS ship_month,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          > 30 AND datediff('day', o_orderdate, l_shipdate)
                          <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          > 60 AND datediff('day', o_orderdate, l_shipdate)
                          <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          > 90 AND datediff('day', o_orderdate, l_shipdate)
                          <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120plus
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="TPC-DS Q99/Q62 shape: days-to-ship bucketed into a 5-band "
    "CASE matrix over TWO dimensions (priority x ship month) — the "
    "matrix variant of dsq50's per-nation bands (Q99 uses warehouse "
    "x ship-mode x month). One fact-fact join (orderkey), one "
    "aggregate shuffle, bands fold map-side.",
)
def dsq99_latency_bucket_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "o_orderpriority",
            F.month("l_shipdate").cast("int").alias("ship_month"),
        )
        .agg(
            band(lag <= 30).alias("d30"),
            band((lag > 30) & (lag <= 60)).alias("d60"),
            band((lag > 60) & (lag <= 90)).alias("d90"),
            band((lag > 90) & (lag <= 120)).alias("d120"),
            band(lag > 120).alias("d120plus"),
        )
        .orderBy("o_orderpriority", "ship_month")
    )


@query(
    "dsq27_filtered_dim_avg_rollup",
    oracle="""
    SELECT p_brand, n_name,
           CAST(grouping(n_name) AS INT) AS g_state,
           round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 10000.0 AS agg1,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 10000.0 AS agg2,
           round(CAST(sum(CAST(round(l_discount * 10000) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 1000000.0 AS agg3,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 10000.0 AS agg4
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE o_orderpriority = '1-URGENT'
      AND n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7',
                     'NATION_11', 'NATION_13')
    GROUP BY ROLLUP (p_brand, n_name)
    ORDER BY p_brand NULLS FIRST, n_name NULLS FIRST
    """,
    doc="TPC-DS Q27 shape: four simultaneous AVG measures under a "
    "demographic filter plus an IN-list geography filter, grouped by "
    "ROLLUP(item, state) with a GROUPING() marker. The filters push "
    "into the fact scan via the broadcast dim joins; one aggregate "
    "shuffle computes all four averages. Measures accumulate as exact "
    "scaled integers (cents / basis points) so both engines average "
    "identical values (float-sum boundary guard).",
)
def dsq27_filtered_dim_avg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    states = ["NATION_1", "NATION_3", "NATION_5", "NATION_7",
              "NATION_11", "NATION_13"]
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name").isin(states))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(_bcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_brand", "n_name")
        .agg(
            F.grouping("n_name").cast("int").alias("g_state"),
            *_avg4_cols(("agg1", "agg2", "agg3", "agg4")),
        )
        .select("p_brand", "n_name", "g_state", "agg1", "agg2", "agg3", "agg4")
        .orderBy(F.col("p_brand").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )

# ---------------------------------------------------------------------------
# Exact-money helpers: every new money measure accumulates as integer
# CENTS (round(x*100) as bigint) so sums are order-independent and both
# engines divide the SAME exact integer — no float-sum rounding
# boundaries anywhere in this wave.
_NET_CENTS_SQL = (
    "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)"
    " AS BIGINT)) AS BIGINT)"
)


def _net_cents() -> F.Column:
    return (
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        ).cast("bigint")
    )


@query(
    "dsq03_brand_year_revenue",
    oracle=f"""
    SELECT p_brand, CAST(year(o_orderdate) AS INT) AS order_year,
           {_NET_CENTS_SQL} / 100.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part   ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY 1, 2
    ORDER BY order_year, revenue DESC, p_brand
    LIMIT 100
    """,
    doc="TPC-DS Q3 shape (the Q42/Q52/Q55 star-aggregate family's "
    "year-series member): one fact, one dim filter (item category), "
    "revenue by (brand, year), top-100 by year then revenue. The "
    "p_type filter prunes through the broadcast part join; one "
    "aggregate shuffle; TakeOrderedAndProject caps the result. "
    "Revenue is an exact cents sum so the DESC ordering ranks "
    "identical values in both engines.",
)
def dsq03_brand_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast(t["part"].filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg((_net_cents() / 100.0).alias("revenue"))
        .orderBy("order_year", F.col("revenue").desc(), "p_brand")
        .limit(100)
    )


@query(
    "dsq42_type_month_revenue",
    oracle=f"""
    SELECT CAST(month(l_shipdate) AS INT) AS ship_month, p_type,
           {_NET_CENTS_SQL} / 100.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    ORDER BY revenue DESC, ship_month, p_type
    """,
    doc="TPC-DS Q42 shape: category revenue by month for one year "
    "under a dim attribute band (p_size), ordered by revenue. Same "
    "star-aggregate family as dsq03 with the month dimension and a "
    "numeric dim band instead of the categorical filter.",
)
def dsq42_type_month_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            _bcast(t["part"].filter(F.col("p_size") <= 10)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.month("l_shipdate").cast("int").alias("ship_month"), "p_type"
        )
        .agg((_net_cents() / 100.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "ship_month", "p_type")
    )


@query(
    "dsq52_brand_month_revenue",
    oracle=f"""
    SELECT p_brand, {_NET_CENTS_SQL} / 100.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    LIMIT 100
    """,
    doc="TPC-DS Q52 shape: single-month brand revenue leaderboard — "
    "the tightest member of the Q3 star-aggregate family (one month "
    "slice, no dim filter). One broadcast join, one aggregate "
    "shuffle, TakeOrderedAndProject.",
)
def dsq52_brand_month_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-03-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .join(_bcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg((_net_cents() / 100.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "p_brand")
        .limit(100)
    )


@query(
    "dsq55_brand_prefix_revenue",
    oracle=f"""
    SELECT p_brand, {_NET_CENTS_SQL} / 100.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand LIKE 'Brand#2%'
      AND l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    """,
    doc="TPC-DS Q55 shape: brand revenue for one month restricted to "
    "one brand family (manager filter in DS; a LIKE-prefix brand "
    "family here). Completes the Q3/Q42/Q52/Q55 star-aggregate set; "
    "the LIKE pushes into the broadcast dim scan.",
)
def dsq55_brand_prefix_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-06-01"))
            & (F.col("l_shipdate") < _ts("1997-07-01"))
        )
        .join(
            _bcast(t["part"].filter(F.col("p_brand").like("Brand#2%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg((_net_cents() / 100.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "p_brand")
    )


_AVG4_SQL = """
           round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 10000.0 AS avg_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 10000.0 AS avg_price,
           round(CAST(sum(CAST(round(l_discount * 10000) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 1000000.0 AS avg_disc,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100) AS BIGINT))
                      AS BIGINT) * 100.0 / count(*)) / 10000.0 AS avg_net
"""


def _avg4_cols(
    aliases: tuple = ("avg_qty", "avg_price", "avg_disc", "avg_net"),
) -> list:
    """The four exact-scaled lineitem averages — ONE definition; dsq27
    hand-rolled the same expressions under agg1..agg4 aliases, so a fix
    to the money-scaling discipline would have missed it (r15 review)."""
    n = F.count(F.lit(1))

    def scaled(col: F.Column, scale: int, out: float) -> F.Column:
        return F.round(
            F.sum(F.round(col * scale).cast("bigint")).cast("bigint")
            * 100.0 / n
        ) / out

    return [
        scaled(F.col("l_quantity"), 100, 10000.0).alias(aliases[0]),
        scaled(F.col("l_extendedprice"), 100, 10000.0).alias(aliases[1]),
        scaled(F.col("l_discount"), 10000, 1000000.0).alias(aliases[2]),
        scaled(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 100, 10000.0
        ).alias(aliases[3]),
    ]


@query(
    "dsq07_demographic_avgs",
    oracle=f"""
    SELECT p_brand,
{_AVG4_SQL}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part     ON l_partkey = p_partkey
    WHERE c_mktsegment = 'AUTOMOBILE'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="TPC-DS Q7 shape: four AVG measures per item under "
    "conjunctive demographic + promo filters (the disjunction-free "
    "kin of dsq85; Q26 is the supplier-channel sibling). Filters "
    "push through broadcast dims; one aggregate shuffle computes "
    "all four exact-scaled averages.",
)
def dsq07_demographic_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["orders"]
            .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast(
                t["customer"]
                .filter(F.col("c_mktsegment") == "AUTOMOBILE")
                .select("c_custkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(_bcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(*_avg4_cols())
        .orderBy("p_brand")
    )


@query(
    "dsq26_supplier_band_avgs",
    oracle=f"""
    SELECT p_brand,
{_AVG4_SQL}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey
    WHERE s_acctbal >= 0
      AND p_type IN ('ECONOMY', 'STANDARD')
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="TPC-DS Q26 shape: the catalog-channel sibling of Q7 — same "
    "four-average profile via the supplier path with an account "
    "band + category filter. Distinct join tree (no orders hop), "
    "same exact-scaled-average discipline.",
)
def dsq26_supplier_band_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            _bcast(
                t["supplier"].filter(F.col("s_acctbal") >= 0).select("s_suppkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            _bcast(t["part"].filter(F.col("p_type").isin("ECONOMY", "STANDARD"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(*_avg4_cols())
        .orderBy("p_brand")
    )


@query(
    "dsq19_cross_geo_brand_revenue",
    oracle=f"""
    SELECT p_brand, {_NET_CENTS_SQL} / 100.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey
    WHERE o_orderdate >= TIMESTAMP '1997-11-01'
      AND o_orderdate <  TIMESTAMP '1997-12-01'
      AND c_nationkey <> s_nationkey
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    LIMIT 100
    """,
    doc="TPC-DS Q19 shape: brand revenue for one month keeping only "
    "sales where the buyer's geography DIFFERS from the seller's "
    "(DS: customer zip <> store zip). The inequality is a join-time "
    "residual on two broadcast dim attributes — no extra shuffle "
    "beyond the fact aggregation.",
)
def dsq19_cross_geo_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= _ts("1997-11-01"))
                & (F.col("o_orderdate") < _ts("1997-12-01"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            _bcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .join(_bcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg((_net_cents() / 100.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "p_brand")
        .limit(100)
    )


@query(
    "dsq43_weekday_matrix",
    oracle="""
    SELECT n_name,
           round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 1
                          THEN o_totalprice ELSE 0 END), 2) AS sun_sales,
           round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 2
                          THEN o_totalprice ELSE 0 END), 2) AS mon_sales,
           round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 3
                          THEN o_totalprice ELSE 0 END), 2) AS tue_sales,
           round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 4
                          THEN o_totalprice ELSE 0 END), 2) AS wed_sales,
           round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 5
                          THEN o_totalprice ELSE 0 END), 2) AS thu_sales,
           round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 6
                          THEN o_totalprice ELSE 0 END), 2) AS fri_sales,
           round(sum(CASE WHEN dayofweek(o_orderdate) + 1 = 7
                          THEN o_totalprice ELSE 0 END), 2) AS sat_sales
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-DS Q43 shape: a 7-column day-of-week sales matrix per "
    "dimension for one year — conditional sums fold map-side into "
    "one aggregate shuffle. Day numbering is aligned explicitly "
    "(Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday, "
    "hence the +1 in the oracle).",
)
def dsq43_weekday_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    dow = F.dayofweek("o_orderdate")
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    aggs = [
        F.round(
            F.sum(F.when(dow == i + 1, F.col("o_totalprice")).otherwise(0.0)), 2
        ).alias(f"{nm}_sales")
        for i, nm in enumerate(names)
    ]
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .join(
            _bcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(*aggs)
        .orderBy("n_name")
    )


@query(
    "dsq11_two_channel_yoy_pref",
    oracle="""
    WITH ord AS (
      SELECT o_custkey AS ck,
             CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN
               CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS y1,
             CAST(sum(CASE WHEN year(o_orderdate) = 1997 THEN
               CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS y2
      FROM orders
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1
    ), lin AS (
      SELECT o_custkey AS ck,
             CAST(sum(CASE WHEN year(l_shipdate) = 1996 THEN
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) ELSE 0 END) AS BIGINT) AS y1,
             CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) ELSE 0 END) AS BIGINT) AS y2
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(l_shipdate) IN (1996, 1997)
      GROUP BY 1
    )
    SELECT c_custkey, c_name,
           round(ord.y2 * 1.0 / ord.y1, 6) AS order_growth,
           round(lin.y2 * 1.0 / lin.y1, 6) AS line_growth
    FROM ord JOIN lin ON ord.ck = lin.ck
    JOIN customer ON ord.ck = c_custkey
    WHERE ord.y1 > 0 AND lin.y1 > 0
      AND ord.y2 * 1.0 / ord.y1 > lin.y2 * 1.0 / lin.y1
    ORDER BY c_custkey
    """,
    doc="TPC-DS Q11 shape: customers whose year-over-year growth in "
    "one channel exceeds their growth in the other (Q4's two-channel "
    "variant; dsq04 is the ratio-of-ratios form). Both channels fold "
    "their two years into conditional cents sums in ONE pass each — "
    "two fact shuffles total, joined on the customer key. Exact "
    "integer cents make the growth-ratio comparison deterministic "
    "across engines.",
)
def dsq11_two_channel_yoy_pref(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    def years(df: DataFrame, year_col, cents_col, key) -> DataFrame:
        yr = F.year(year_col)
        c = F.round(cents_col * 100).cast("bigint")
        return (
            df.filter(yr.isin(1996, 1997))
            .groupBy(F.col(key).alias("ck"))
            .agg(
                F.sum(F.when(yr == 1996, c).otherwise(F.lit(0)))
                .cast("bigint").alias("y1"),
                F.sum(F.when(yr == 1997, c).otherwise(F.lit(0)))
                .cast("bigint").alias("y2"),
            )
        )

    ord_y = years(t["orders"], F.col("o_orderdate"), F.col("o_totalprice"), "o_custkey")
    lin_y = years(
        t["lineitem"].join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ),
        F.col("l_shipdate"),
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
        "o_custkey",
    )
    o = ord_y.alias("o")
    l = lin_y.alias("l")
    return (
        o.join(l, F.col("o.ck") == F.col("l.ck"))
        .filter(
            (F.col("o.y1") > 0)
            & (F.col("l.y1") > 0)
            & (F.col("o.y2") * 1.0 / F.col("o.y1")
               > F.col("l.y2") * 1.0 / F.col("l.y1"))
        )
        .join(
            _bcast(t["customer"].select("c_custkey", "c_name")),
            F.col("o.ck") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("o.y2") * 1.0 / F.col("o.y1"), 6).alias("order_growth"),
            F.round(F.col("l.y2") * 1.0 / F.col("l.y1"), 6).alias("line_growth"),
        )
        .orderBy("c_custkey")
    )


@query(
    "dsq12_windowed_revenue_share",
    oracle="""
    WITH agg AS (
      SELECT p_type, p_brand,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-05-01'
        AND l_shipdate <  TIMESTAMP '1997-05-31'
      GROUP BY 1, 2
    )
    SELECT p_type, p_brand, cents / 100.0 AS revenue,
           round(cents * 100.0 / sum(cents) OVER (PARTITION BY p_type),
                 4) AS revenue_share
    FROM agg
    ORDER BY p_type, p_brand
    """,
    doc="TPC-DS Q12/Q20 shape: item revenue over a 30-day window "
    "with each item's percentage share of its CLASS total via a "
    "partitioned window sum (dsq98 is the unwindowed whole-channel "
    "variant). The share divides exact integer cents by an exact "
    "window sum of cents, so the percentage is bit-identical across "
    "engines; the window runs over the grouped frame only.",
)
def dsq12_windowed_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    agg = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-05-01"))
            & (F.col("l_shipdate") < _ts("1997-05-31"))
        )
        .join(_bcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(_net_cents().alias("cents"))
    )
    w = Window.partitionBy("p_type")
    return (
        agg.select(
            "p_type",
            "p_brand",
            (F.col("cents") / 100.0).alias("revenue"),
            F.round(
                F.col("cents") * 100.0 / F.sum("cents").over(w), 4
            ).alias("revenue_share"),
        )
        .orderBy("p_type", "p_brand")
    )


@query(
    "dsq25_tri_leg_item_customer_join",
    oracle="""
    WITH sales AS (
      SELECT o_custkey AS ck,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS s_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag <> 'R'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    ), rets AS (
      SELECT o_custkey AS ck,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS r_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
      GROUP BY 1
    ), resales AS (
      SELECT o_custkey AS ck,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS c_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag <> 'R'
        AND l_shipdate >= TIMESTAMP '1997-04-01'
        AND l_shipdate <  TIMESTAMP '1997-10-01'
      GROUP BY 1
    )
    SELECT c_mktsegment, n_name,
           CAST(sum(s_cents) AS BIGINT) / 100.0 AS sales_net,
           CAST(sum(r_cents) AS BIGINT) / 100.0 AS returns_net,
           CAST(sum(c_cents) AS BIGINT) / 100.0 AS resales_net
    FROM sales
    JOIN rets    USING (ck)
    JOIN resales USING (ck)
    JOIN customer ON ck = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="TPC-DS Q25/Q29 shape: three channel legs (sales in a base "
    "quarter, returns across six months, repeat sales in the "
    "following window) each aggregated per shared key BEFORE a "
    "three-way equi-join, then re-aggregated to the (segment, "
    "nation) grain. DS keys on (item, customer); this corpus is too "
    "sparse for item-level repeat purchases at test SF, so the legs "
    "key on the customer (same construct, denser key). All three "
    "legs share one shuffle key so the joins co-locate; dims "
    "broadcast after the fact reduction.",
)
def dsq25_tri_leg_item_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )

    def leg(pred, lo_frame, alias: str) -> DataFrame:
        return (
            lo_frame.filter(pred)
            .groupBy(F.col("o_custkey").alias("ck"))
            .agg(_net_cents().alias(alias))
        )

    sales = leg(
        (F.col("l_returnflag") != "R")
        & (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01")),
        lo, "s_cents",
    )
    rets = leg(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-07-01")),
        lo, "r_cents",
    )
    resales = leg(
        (F.col("l_returnflag") != "R")
        & (F.col("l_shipdate") >= _ts("1997-04-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01")),
        lo, "c_cents",
    )
    return (
        sales.join(rets, ["ck"])
        .join(resales, ["ck"])
        .join(_bcast(t["customer"].select("c_custkey", "c_mktsegment",
                                          "c_nationkey")),
              F.col("ck") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_mktsegment", "n_name")
        .agg(
            (F.sum("s_cents").cast("bigint") / 100.0).alias("sales_net"),
            (F.sum("r_cents").cast("bigint") / 100.0).alias("returns_net"),
            (F.sum("c_cents").cast("bigint") / 100.0).alias("resales_net"),
        )
        .orderBy("c_mktsegment", "n_name")
    )


@query(
    "dsq53_quarterly_deviation",
    oracle="""
    WITH q AS (
      SELECT p_brand, CAST(quarter(l_shipdate) AS INT) AS qtr,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT p_brand, qtr, q_sales, brand_avg FROM (
      SELECT p_brand, qtr, cents / 100.0 AS q_sales,
             round(avg(cents) OVER (PARTITION BY p_brand) / 100.0, 4)
               AS brand_avg,
             avg(cents) OVER (PARTITION BY p_brand) AS avg_c,
             cents
      FROM q
    )
    WHERE abs(cents - avg_c) / avg_c > 0.04
    ORDER BY p_brand, qtr
    """,
    doc="TPC-DS Q53/Q63 shape: per-brand quarterly sales kept when "
    "they deviate more than 4% from the brand's yearly average — "
    "the windowed-deviation gate over a QUARTER grain (dsq89 is the "
    "monthly store-channel variant). The window sees only the "
    "grouped |brands|x4 frame; exact cents make the deviation "
    "ratio engine-identical. (4%: quarterly sums smooth out at "
    "larger SFs — 10% returned zero rows at sf1.)",
)
def dsq53_quarterly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    q = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(_bcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.quarter("l_shipdate").cast("int").alias("qtr"))
        .agg(_net_cents().alias("cents"))
    )
    w = Window.partitionBy("p_brand")
    avg_c = F.avg("cents").over(w)
    return (
        q.withColumn("avg_c", avg_c)
        .filter(F.abs(F.col("cents") - F.col("avg_c")) / F.col("avg_c") > 0.04)
        .select(
            "p_brand",
            "qtr",
            (F.col("cents") / 100.0).alias("q_sales"),
            F.round(F.col("avg_c") / 100.0, 4).alias("brand_avg"),
        )
        .orderBy("p_brand", "qtr")
    )


@query(
    "dsq56_color_restricted_union",
    oracle="""
    WITH ids AS (
      SELECT p_partkey, p_name FROM part
      WHERE p_name LIKE 'red %' OR p_name LIKE 'blue %'
         OR p_name LIKE 'hot %'
    ), chan AS (
      SELECT p_name,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN ids ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-03-01'
      GROUP BY 1
      UNION ALL
      SELECT p_name,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN ids ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-06-01'
        AND l_shipdate <  TIMESTAMP '1997-08-01'
      GROUP BY 1
      UNION ALL
      SELECT p_name,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN ids ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-10-01'
        AND l_shipdate <  TIMESTAMP '1997-12-01'
      GROUP BY 1
    )
    SELECT p_name, CAST(sum(cents) AS BIGINT) / 100.0 AS total_sales
    FROM chan GROUP BY p_name
    ORDER BY total_sales, p_name
    """,
    doc="TPC-DS Q56/Q60 shape: an item-id set restricted by a COLOR "
    "disjunction (p_name prefix arms), revenue computed per channel "
    "(three date slices here), UNION ALL'd and re-summed per item — "
    "dsq33's variant where the restriction is a LIKE-arm subquery "
    "shared by every leg. The ids frame broadcasts to all three "
    "legs; each leg aggregates before the union.",
)
def dsq56_color_restricted_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ids = t["part"].filter(
        F.col("p_name").like("red %")
        | F.col("p_name").like("blue %")
        | F.col("p_name").like("hot %")
    ).select("p_partkey", "p_name")

    def leg(lo: str, hi: str) -> DataFrame:
        return (
            t["lineitem"]
            .filter((F.col("l_shipdate") >= _ts(lo)) & (F.col("l_shipdate") < _ts(hi)))
            .join(_bcast(ids), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_name")
            .agg(_net_cents().alias("cents"))
        )

    chan = (
        leg("1997-01-01", "1997-03-01")
        .unionByName(leg("1997-06-01", "1997-08-01"))
        .unionByName(leg("1997-10-01", "1997-12-01"))
    )
    return (
        chan.groupBy("p_name")
        .agg((F.sum("cents").cast("bigint") / 100.0).alias("total_sales"))
        .orderBy("total_sales", "p_name")
    )


@query(
    "dsq68_order_band_rows",
    oracle="""
    WITH per AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS net_cents,
             CAST(sum(CAST(round(l_extendedprice * l_tax * 100)
                           AS BIGINT)) AS BIGINT) AS tax_cents
      FROM lineitem GROUP BY 1
    )
    SELECT c_name, o_orderkey, n_lines,
           net_cents / 100.0 AS net_total,
           tax_cents / 100.0 AS tax_total
    FROM per
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_2', 'NATION_4')
      AND n_lines BETWEEN 5 AND 7
    ORDER BY c_name, o_orderkey
    LIMIT 100
    """,
    doc="TPC-DS Q68/Q79 shape: per-ORDER extended totals (two money "
    "sums + line count) for orders inside a line-count band from "
    "customers in two geographies, returned as order-level ROWS "
    "(dsq34 returns the banded distribution; this returns the "
    "orders). One fact shuffle computes the per-order frame; the "
    "band filter then prunes it before the dim joins.",
)
def dsq68_order_band_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            _net_cents().alias("net_cents"),
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_tax") * 100)
                .cast("bigint")
            ).cast("bigint").alias("tax_cents"),
        )
        .filter(F.col("n_lines").between(5, 7))
    )
    return (
        per.join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast(t["customer"].select("c_custkey", "c_name", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                t["nation"].filter(F.col("n_name").isin("NATION_2", "NATION_4"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_name",
            "o_orderkey",
            "n_lines",
            (F.col("net_cents") / 100.0).alias("net_total"),
            (F.col("tax_cents") / 100.0).alias("tax_total"),
        )
        .orderBy("c_name", "o_orderkey")
        .limit(100)
    )


@query(
    "dsq69_exclusive_channel_profile",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01')
      AND NOT EXISTS (
        SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l JOIN orders o2
          ON l.l_orderkey = o2.o_orderkey
        WHERE o2.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="TPC-DS Q69 shape: demographic counts of customers ACTIVE in "
    "one channel during a window but absent from BOTH other channels "
    "(EXISTS + two NOT EXISTS; dsq35's variant where the other "
    "channels must be empty, not OR'd). Spark plans one semi-join "
    "and two anti-joins over pre-reduced key frames — the returned-"
    "customer keys reduce through orders before the anti-join so no "
    "correlated rescans of the fact.",
)
def dsq69_exclusive_channel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    active = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .select("o_custkey")
    )
    eventers = t["events"].select(F.col("user_id").alias("ek"))
    returners = (
        t["lineitem"]
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .select("l_orderkey")
        .join(
            t["orders"].select("o_orderkey", F.col("o_custkey").alias("rk")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("rk")
    )
    return (
        t["customer"]
        .join(active, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(eventers, F.col("c_custkey") == F.col("ek"), "left_anti")
        .join(returners, F.col("c_custkey") == F.col("rk"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy("c_mktsegment")
    )


@query(
    "dsq86_orders_rollup_rank",
    oracle="""
    WITH agg AS (
      SELECT CAST(grouping(o_orderstatus) + grouping(o_orderpriority)
                  AS INT) AS lochierarchy,
             o_orderstatus, o_orderpriority,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    )
    SELECT lochierarchy, o_orderstatus, o_orderpriority,
           cents / 100.0 AS total_paid,
           CAST(rank() OVER (
                  PARTITION BY lochierarchy,
                               CASE WHEN lochierarchy = 0
                                    THEN o_orderstatus END
                  ORDER BY cents DESC,
                           o_orderpriority NULLS FIRST)
                AS INT) AS rank_within_parent
    FROM agg
    ORDER BY lochierarchy DESC, o_orderstatus NULLS FIRST,
             o_orderpriority NULLS FIRST
    """,
    doc="TPC-DS Q86 shape: the single-fact (no-margin) sibling of "
    "dsq36 — a 2-level ROLLUP over order attributes with rank() "
    "within (lochierarchy, parent-when-leaf), ordered by the summed "
    "measure DESC. Exact cents keep the DESC rank order identical "
    "across engines; the window sees only the rolled-up frame.",
)
def dsq86_orders_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    agg = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") + F.grouping("o_orderpriority"))
            .cast("int").alias("lochierarchy"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
        .select("lochierarchy", "o_orderstatus", "o_orderpriority", "cents")
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("o_orderstatus")),
    ).orderBy(F.col("cents").desc(), F.col("o_orderpriority").asc_nulls_first())
    return (
        agg.withColumn("rank_within_parent", F.rank().over(w).cast("int"))
        .select(
            "lochierarchy",
            "o_orderstatus",
            "o_orderpriority",
            (F.col("cents") / 100.0).alias("total_paid"),
            "rank_within_parent",
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "dsq91_monthly_demographic_returns",
    oracle="""
    SELECT CAST(month(l_shipdate) AS INT) AS ret_month,
           o_orderpriority,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS returns_loss
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND ((c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 1000)
           OR (c_mktsegment = 'HOUSEHOLD' AND c_acctbal >= 1000))
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="TPC-DS Q91 shape: monthly returns loss per call-center "
    "(order priority here) restricted to customers matching a "
    "two-arm demographic DISJUNCTION (segment x balance band). The "
    "disjunction's hull (segment IN the two values) pushes into the "
    "broadcast customer scan; the residual arms evaluate at join "
    "time; one fact shuffle.",
)
def dsq91_monthly_demographic_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    arms = (
        (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") < 1000)
    ) | ((F.col("c_mktsegment") == "HOUSEHOLD") & (F.col("c_acctbal") >= 1000))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            t["orders"].select("o_orderkey", "o_custkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast(
                t["customer"]
                .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
                .select("c_custkey", "c_mktsegment", "c_acctbal")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(arms)
        .groupBy(
            F.month("l_shipdate").cast("int").alias("ret_month"),
            "o_orderpriority",
        )
        .agg((_net_cents() / 100.0).alias("returns_loss"))
        .orderBy("ret_month", "o_orderpriority")
    )


@query(
    "dsq20_priority_share_window",
    oracle="""
    WITH agg AS (
      SELECT o_orderstatus, o_orderpriority,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-02-01'
        AND o_orderdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1, 2
    )
    SELECT o_orderstatus, o_orderpriority, cents / 100.0 AS revenue,
           round(cents * 100.0
                 / sum(cents) OVER (PARTITION BY o_orderstatus), 4)
             AS revenue_share
    FROM agg
    ORDER BY o_orderstatus, o_orderpriority
    """,
    doc="TPC-DS Q20 shape: the orders-channel member of the "
    "Q12/Q20/Q98 revenue-share family — share of each priority "
    "within its order-status class over a 60-day window, no item "
    "dimension at all (distinct join tree from dsq12). Exact cents "
    "in both the numerator and the partitioned window denominator.",
)
def dsq20_priority_share_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    agg = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _ts("1997-02-01"))
            & (F.col("o_orderdate") < _ts("1997-04-01"))
        )
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents")
        )
    )
    w = Window.partitionBy("o_orderstatus")
    return (
        agg.select(
            "o_orderstatus",
            "o_orderpriority",
            (F.col("cents") / 100.0).alias("revenue"),
            F.round(F.col("cents") * 100.0 / F.sum("cents").over(w), 4)
            .alias("revenue_share"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "dsq60_type_restricted_union_desc",
    oracle="""
    WITH ids AS (
      SELECT p_partkey, p_brand FROM part
      WHERE p_type IN ('PROMO', 'ECONOMY')
    ), chan AS (
      SELECT p_brand,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN ids ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate <  TIMESTAMP '1996-10-01'
      GROUP BY 1
      UNION ALL
      SELECT p_brand,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN ids ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate <  TIMESTAMP '1997-10-01'
      GROUP BY 1
      UNION ALL
      SELECT p_brand,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN ids ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1998-09-01'
        AND l_shipdate <  TIMESTAMP '1998-10-01'
      GROUP BY 1
    )
    SELECT p_brand, CAST(sum(cents) AS BIGINT) / 100.0 AS total_sales
    FROM chan GROUP BY p_brand
    ORDER BY total_sales DESC, p_brand
    """,
    doc="TPC-DS Q60 shape: the brand-grain, category-IN-restricted, "
    "DESC-ordered member of the Q56/Q60 union family — three "
    "same-month-across-years channels (Q60 unions the September of "
    "each channel) summed per brand. Distinct restriction (category "
    "IN-list, not color LIKE-arms) and distinct time topology "
    "(same month, three years) from dsq56.",
)
def dsq60_type_restricted_union_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ids = (
        t["part"]
        .filter(F.col("p_type").isin("PROMO", "ECONOMY"))
        .select("p_partkey", "p_brand")
    )

    def leg(lo: str, hi: str) -> DataFrame:
        return (
            t["lineitem"]
            .filter((F.col("l_shipdate") >= _ts(lo)) & (F.col("l_shipdate") < _ts(hi)))
            .join(_bcast(ids), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(_net_cents().alias("cents"))
        )

    chan = (
        leg("1996-09-01", "1996-10-01")
        .unionByName(leg("1997-09-01", "1997-10-01"))
        .unionByName(leg("1998-09-01", "1998-10-01"))
    )
    return (
        chan.groupBy("p_brand")
        .agg((F.sum("cents").cast("bigint") / 100.0).alias("total_sales"))
        .orderBy(F.col("total_sales").desc(), "p_brand")
    )


@query(
    "dsq62_latency_buckets_with_avg",
    oracle="""
    SELECT n_name, l_linestatus,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          > 30 AND datediff('day', o_orderdate,
                          l_shipdate) <= 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS d60,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          > 60 AND datediff('day', o_orderdate,
                          l_shipdate) <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS d90,
           CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate)
                          > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS d90plus,
           round(CAST(sum(datediff('day', o_orderdate, l_shipdate))
                      AS BIGINT) * 10000.0 / count(*)) / 10000.0
             AS avg_days
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="TPC-DS Q62 shape: the web-channel member of the Q99/Q62 "
    "latency family — bucket counts per (warehouse=nation, "
    "ship-mode=linestatus) PLUS the mean days-to-ship alongside the "
    "band matrix (Q99 has no average column). The average is an "
    "exact integer-day sum over count, rounded in integer space so "
    "both engines emit the identical double.",
)
def dsq62_latency_buckets_with_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(_bcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "l_linestatus")
        .agg(
            band(lag <= 30).alias("d30"),
            band((lag > 30) & (lag <= 60)).alias("d60"),
            band((lag > 60) & (lag <= 90)).alias("d90"),
            band(lag > 90).alias("d90plus"),
            (
                F.round(
                    F.sum(lag).cast("bigint") * 10000.0 / F.count(F.lit(1))
                ) / 10000.0
            ).alias("avg_days"),
        )
        .orderBy("n_name", "l_linestatus")
    )


@query(
    "dsq63_monthly_type_deviation",
    oracle="""
    WITH m AS (
      SELECT p_type, CAST(month(l_shipdate) AS INT) AS mth,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND p_size BETWEEN 5 AND 40
      GROUP BY 1, 2
    )
    SELECT p_type, mth, m_sales, type_avg FROM (
      SELECT p_type, mth, cents / 100.0 AS m_sales,
             round(avg(cents) OVER (PARTITION BY p_type) / 100.0, 4)
               AS type_avg,
             avg(cents) OVER (PARTITION BY p_type) AS avg_c, cents
      FROM m
    )
    WHERE abs(cents - avg_c) / avg_c > 0.05
    ORDER BY p_type, mth
    """,
    doc="TPC-DS Q63 shape: the monthly, category-grain member of the "
    "Q53/Q63 deviation family — per-type monthly sales kept when "
    "off the type's yearly average by more than 5%, under a dim "
    "size band (dsq53 is quarterly per-brand at 10%). Same "
    "exact-cents windowed-gate discipline, different grain and "
    "threshold.",
)
def dsq63_monthly_type_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    m = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            _bcast(t["part"].filter(F.col("p_size").between(5, 40))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_type", F.month("l_shipdate").cast("int").alias("mth"))
        .agg(_net_cents().alias("cents"))
    )
    w = Window.partitionBy("p_type")
    avg_c = F.avg("cents").over(w)
    return (
        m.withColumn("avg_c", avg_c)
        .filter(F.abs(F.col("cents") - F.col("avg_c")) / F.col("avg_c") > 0.05)
        .select(
            "p_type",
            "mth",
            (F.col("cents") / 100.0).alias("m_sales"),
            F.round(F.col("avg_c") / 100.0, 4).alias("type_avg"),
        )
        .orderBy("p_type", "mth")
    )


@query(
    "dsq73_big_order_customer_counts",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS nl
      FROM lineitem GROUP BY 1 HAVING count(*) >= 7
    )
    SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS big_orders
    FROM big
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    HAVING count(*) BETWEEN 1 AND 5
    ORDER BY big_orders DESC, c_custkey
    """,
    doc="TPC-DS Q73 shape: customers holding between 1 and 5 "
    "large-basket orders in a year (dsq34 returns the band "
    "distribution; Q73 returns the customer list with the count "
    "band in a HAVING). Two stacked HAVING gates: per-order line "
    "count, then per-customer order count; both run on grouped "
    "frames.",
)
def dsq73_big_order_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    ).select("o_orderkey", "o_custkey")
    # windowed order keys prefilter the fact before the per-order
    # count (same one-effective-shuffle rewrite as dsq94: the semi
    # join and the groupBy share the key; basket sizes are order-
    # level, unchanged by the order-date window)
    big = (
        t["lineitem"].select("l_orderkey")
        .join(o.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nl"))
        .filter(F.col("nl") >= 7)
        .select("l_orderkey")
    )
    return (
        big.join(
            o,
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast(t["customer"].select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("big_orders"))
        .filter(F.col("big_orders").between(1, 5))
        .orderBy(F.col("big_orders").desc(), "c_custkey")
    )


@query(
    "dsq79_best_shopping_day",
    oracle="""
    WITH daily AS (
      SELECT o_custkey AS ck,
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT c_custkey, c_name, d AS best_day,
           cents / 100.0 AS day_total
    FROM (
      SELECT ck, d, cents,
             row_number() OVER (PARTITION BY ck
                                ORDER BY cents DESC, d) AS rn
      FROM daily
    )
    JOIN customer ON ck = c_custkey
    WHERE rn = 1
    ORDER BY c_custkey
    """,
    doc="TPC-DS Q79 shape: each customer's single BIGGEST shopping "
    "day — per-(customer, day) totals reduced first, then a "
    "row_number window picks the max row per customer (ties broken "
    "by date). The window runs over the grouped daily frame; exact "
    "cents keep the DESC pick identical across engines.",
)
def dsq79_best_shopping_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _ts("1997-01-01"))
            & (F.col("o_orderdate") < _ts("1998-01-01"))
        )
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.date_trunc("day", F.col("o_orderdate")).alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents")
        )
    )
    w = Window.partitionBy("ck").orderBy(F.col("cents").desc(), F.col("d"))
    return (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(
            _bcast(t["customer"].select("c_custkey", "c_name")),
            F.col("ck") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("d").alias("best_day"),
            (F.col("cents") / 100.0).alias("day_total"),
        )
        .orderBy("c_custkey")
    )


@query(
    "dsq81_supplier_return_ratio",
    oracle="""
    WITH sr AS (
      SELECT s_suppkey, s_name, n_name,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS ret_qty
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2, 3
    )
    SELECT s_suppkey, s_name, n_name, ret_qty
    FROM sr s1
    WHERE ret_qty > 1.05 * (SELECT avg(ret_qty) FROM sr s2
                            WHERE s2.n_name = s1.n_name)
    ORDER BY s_suppkey
    """,
    doc="TPC-DS Q81 shape: the supplier-side, quantity-metric member "
    "of the Q30/Q81 return-ratio family — suppliers whose returned "
    "QUANTITY exceeds 1.05x their nation's average (dsq30 gates "
    "customers on returned value). Integral quantities make the "
    "gate exact; the per-nation average is a window over the "
    "grouped supplier frame.",
)
def dsq81_supplier_return_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sr = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            _bcast(t["supplier"].select("s_suppkey", "s_name", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint").alias("ret_qty")
        )
    )
    w = Window.partitionBy("n_name")
    return (
        sr.withColumn("nat_avg", F.avg("ret_qty").over(w))
        .filter(F.col("ret_qty") > 1.05 * F.col("nat_avg"))
        .select("s_suppkey", "s_name", "n_name", "ret_qty")
        .orderBy("s_suppkey")
    )


@query(
    "dsq82_deficit_supplier_band_parts",
    oracle="""
    SELECT p_partkey, p_name, p_type, round(p_retailprice, 2) AS price
    FROM part
    WHERE p_retailprice BETWEEN 910 AND 960
      AND p_size BETWEEN 2 AND 20
      AND p_partkey IN (
        SELECT l_partkey
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_acctbal < 0
          AND l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1998-07-01'
      )
    ORDER BY p_name, p_type, p_partkey
    LIMIT 50
    """,
    doc="TPC-DS Q82 shape: the store-channel sibling of dsq37 — "
    "dimension rows in attribute bands gated by fact activity, with "
    "the gate's fact leg itself JOINED to a second filtered "
    "dimension (supplier in deficit; Q82 joins inventory to "
    "store_sales where Q37 uses catalog). The supplier filter "
    "reduces the semi-join's build side before it reaches the "
    "dimension probe.",
)
def dsq82_deficit_supplier_band_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    active = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1998-01-01"))
            & (F.col("l_shipdate") < _ts("1998-07-01"))
        )
        .join(
            _bcast(t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_partkey")
    )
    return (
        t["part"]
        .filter(
            F.col("p_retailprice").between(910, 960)
            & F.col("p_size").between(2, 20)
        )
        .join(active, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select(
            "p_partkey", "p_name", "p_type",
            F.round("p_retailprice", 2).alias("price"),
        )
        .orderBy("p_name", "p_type", "p_partkey")
        .limit(50)
    )


@query(
    "dsq92_windowed_excess_discount",
    oracle="""
    SELECT CAST(sum(CAST(round(l1.l_extendedprice * l1.l_discount
                               * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS excess_discount_amount
    FROM lineitem l1
    JOIN part ON l1.l_partkey = p_partkey
    WHERE p_size <= 15
      AND l1.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l1.l_shipdate <  TIMESTAMP '1997-06-01'
      AND l1.l_discount > 1.3 * (
            SELECT avg(l2.l_discount) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
              AND l2.l_shipdate >= TIMESTAMP '1997-03-01'
              AND l2.l_shipdate <  TIMESTAMP '1997-06-01')
    """,
    doc="TPC-DS Q92 shape: the web-channel sibling of dsq32 — total "
    "DISCOUNT amount (not price) on lines whose discount exceeds "
    "1.3x the per-item average computed over the SAME 90-day "
    "window (dsq32's correlated average spans the whole year). "
    "Spark de-correlates to one windowed aggregate of the filtered "
    "fact joined back on the item key — the correlated rescan "
    "becomes a single shuffle. Discounts are fixed-point values, "
    "so avg = exact-sum/count is engine-identical.",
)
def dsq92_windowed_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    win = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-06-01"))
    )
    bps = F.round(F.col("l_discount") * 10000).cast("bigint")
    per_part = (
        win.groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.sum(bps).cast("bigint") * 1.0
              / (10000.0 * F.count(F.lit(1)))).alias("avg_disc"))
    )
    return (
        win.join(
            _bcast(t["part"].filter(F.col("p_size") <= 15).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_discount") > 1.3 * F.col("avg_disc"))
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * F.col("l_discount") * 100
                    ).cast("bigint")
                ).cast("bigint") / 100.0
            ).alias("excess_discount_amount")
        )
    )
