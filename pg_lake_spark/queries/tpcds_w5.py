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
             coalesce(sum(CASE WHEN value >= 0 THEN value END), 0)
               AS sales,
             coalesce(sum(CASE WHEN value < 0 THEN -value END), 0)
               AS returns,
             coalesce(sum(value), 0) AS profit
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
            F.coalesce(F.sum(F.when(F.col("value") >= 0, F.col("value"))), z).alias("sales"),
            F.coalesce(F.sum(F.when(F.col("value") < 0, -F.col("value"))), z).alias("returns"),
            F.coalesce(F.sum("value"), z).alias("profit"),
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
    gates = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("nsupp"),
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_ret"),
        )
        .filter((F.col("nsupp") > 1) & (F.col("has_ret") == 0))
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _ts("1997-03-01"))
            & (F.col("o_orderdate") < _ts("1997-09-01"))
        )
        .join(gates, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
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
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
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
        .agg(F.sum(cents).cast("bigint").alias("ret_cents"))
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
            (
                F.round(
                    F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
                    .cast("bigint") * 100.0 / F.count(F.lit(1))
                ) / 10000.0
            ).alias("agg1"),
            (
                F.round(
                    F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                    .cast("bigint") * 100.0 / F.count(F.lit(1))
                ) / 10000.0
            ).alias("agg2"),
            (
                F.round(
                    F.sum(F.round(F.col("l_discount") * 10000).cast("bigint"))
                    .cast("bigint") * 100.0 / F.count(F.lit(1))
                ) / 1000000.0
            ).alias("agg3"),
            (
                F.round(
                    F.sum(
                        F.round(
                            F.col("l_extendedprice")
                            * (1 - F.col("l_discount")) * 100
                        ).cast("bigint")
                    ).cast("bigint") * 100.0 / F.count(F.lit(1))
                ) / 10000.0
            ).alias("agg4"),
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


def _avg4_cols() -> list:
    n = F.count(F.lit(1))

    def scaled(col: F.Column, scale: int, out: float) -> F.Column:
        return F.round(
            F.sum(F.round(col * scale).cast("bigint")).cast("bigint")
            * 100.0 / n
        ) / out

    return [
        scaled(F.col("l_quantity"), 100, 10000.0).alias("avg_qty"),
        scaled(F.col("l_extendedprice"), 100, 10000.0).alias("avg_price"),
        scaled(F.col("l_discount"), 10000, 1000000.0).alias("avg_disc"),
        scaled(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 100, 10000.0
        ).alias("avg_net"),
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
