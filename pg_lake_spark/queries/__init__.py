"""Declared query inventory.

Each query is declared once — a PySpark builder plus (where expressible)
the equivalent DuckDB oracle SQL — and flows from here into
``__spark_entry__.py`` (driver contract), ``tests/`` (differential
harness) and ``bench.py`` (perf loop). This mirrors the reference's test
strategy: differential testing against an oracle is the spine
(SURVEY §5; reference test_common/helpers/comparisons.py:98-127).
"""

from pg_lake_spark.queries.registry import QUERIES, QuerySpec, query

# Import for registration side effects — each module adds to QUERIES.
from pg_lake_spark.queries import scalar_funcs  # noqa: E402,F401
from pg_lake_spark.queries import datapipe  # noqa: E402,F401
from pg_lake_spark.queries import streaming_q  # noqa: E402,F401
from pg_lake_spark.queries import relational  # noqa: E402,F401
from pg_lake_spark.queries import tpch  # noqa: E402,F401
from pg_lake_spark.queries import dml  # noqa: E402,F401

# Registration order is driver-visible: the correctness driver checks the
# FIRST 50 registry entries each round, so queries without an official
# green row yet rotate to the front. Round-3 window: the 7 rows that were
# red in CORRECTNESS_r02 (now fixed), the 12 never-checked operator
# queries the round-2 verdict named, set-ops/grouping, the new DML/DDL
# lifecycle queries, and all 23 TPC-H shapes. The 14 still-unchecked
# relational queries rotate in next round; the 43 round-2 greens sit
# behind them.
_R3_WINDOW = [
    # fixed-this-round (red in r2)
    "f_math", "f_casts", "arr_operators", "ds_train_val_split",
    "ds_pack_sequences", "dd_lsh_candidates", "sim_lsh_topk",
    # never-checked, named in VERDICT r2
    "a_mode_disc", "json_extract_agg", "w_exclude_current_row",
    "d_limit_with_ties", "g_grouping_fn", "d_not_in_three_valued",
    "j_lateral_topn", "e_funnel", "e_retention", "j_asof_prior_view",
    "j_range_within_hour", "s_except_all",
    # set ops + grouping sets
    "g_grouping_sets", "s_union_all", "s_intersect", "s_except",
    # DML/DDL lifecycle (new in r3)
    "dml_cow_delete", "dml_mor_lifecycle", "dml_merge_upsert",
    "ddl_schema_evolution",
    # TPC-H (never officially driver-checked)
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_late_lineitems",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_qty_revenue",
    "q18_large_volume_customer", "q19_discounted_revenue",
    "q20_excess_suppliers", "q21_waiting_suppliers", "q22_dormant_customers",
    "q_top_parts_by_revenue",
]
# still-unchecked queries that didn't fit the 50-slot window — next round's
# rotation MUST lead with these (then any r3 reds):
_R4_BACKLOG = [
    "j_outer_join_coalesce", "j_full_outer", "j_semi_anti", "j_cross_join",
    "d_distinct_on_latest", "d_count_distinct", "d_cte_values_join",
    "d_correlated_scalar_subquery", "a_stat_aggs", "a_regr_aggs",
    "a_percentiles", "a_bool_string_agg", "arr_ops", "arr_unnest_series",
]


def _rotate(front: list[str]) -> None:
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"rotation names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in front}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R3_WINDOW + _R4_BACKLOG)

__all__ = ["QUERIES", "QuerySpec", "query"]
