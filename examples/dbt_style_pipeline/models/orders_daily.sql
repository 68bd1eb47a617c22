-- materialized: incremental
-- unique_key: day
-- Daily rollup over the staging model. On incremental runs dbt wraps
-- this SELECT with an INSERT INTO over only-new rows; the is_incremental
-- filter below is the standard dbt pattern, expressed as a runner macro.
SELECT CAST(date_trunc('DAY', order_ts) AS DATE) AS day,
       count(*)         AS n_orders,
       sum(total_price) AS revenue
FROM stg_orders
{% if is_incremental %}
WHERE CAST(date_trunc('DAY', order_ts) AS DATE) > (SELECT max(day) FROM orders_daily)
{% endif %}
GROUP BY CAST(date_trunc('DAY', order_ts) AS DATE)
