-- materialized: table
-- A staging model: cleaned projection of the raw orders foreign table.
SELECT o_orderkey   AS order_key,
       o_custkey    AS cust_key,
       o_orderdate  AS order_ts,
       o_totalprice AS total_price
FROM raw_orders
WHERE o_orderstatus <> 'X'
