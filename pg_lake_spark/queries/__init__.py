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
from pg_lake_spark.queries import delta_q  # noqa: E402,F401

# Registration order is driver-visible: the correctness driver checks the
# FIRST 50 registry entries each round, so queries without an official
# green row yet rotate to the front. After round 4 every declared query
# has had an official green row at least once; the round-5 window is the
# queries newly declared THIS round (never driver-checked), then the
# queries whose newest official evidence is oldest — the round-3 rows,
# in their CORRECTNESS_r03 order (the r2 rows were all re-confirmed in
# round 4). The last ten r3 TPC-H rows are bumped to make room and
# rotate back next round.
_R5_NEW = ["d_delta_scan", "dml_incremental_scan", "sim_ivf_topk",
           "dd_neardup_clusters", "g_rollup_rank_hierarchy",
           "j_bucketed_colocated", "j_salted_skew", "mm_frame_sample",
           "dml_update_set", "mm_resize_thumbs"]
_R3_GREENS = [
    "f_math", "f_casts", "arr_operators", "ds_train_val_split",
    "ds_pack_sequences", "dd_lsh_candidates", "sim_lsh_topk", "a_mode_disc",
    "json_extract_agg", "w_exclude_current_row", "d_limit_with_ties",
    "g_grouping_fn", "d_not_in_three_valued", "j_lateral_topn", "e_funnel",
    "e_retention", "j_asof_prior_view", "j_range_within_hour",
    "s_except_all", "g_grouping_sets", "s_union_all", "s_intersect",
    "s_except", "dml_cow_delete", "dml_mor_lifecycle", "dml_merge_upsert",
    "ddl_schema_evolution", "q1_pricing_summary", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_important_stock",
    "q12_late_lineitems", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_part_counts", "q17_small_qty_revenue",
    "q18_large_volume_customer", "q19_discounted_revenue",
    "q20_excess_suppliers", "q21_waiting_suppliers", "q22_dormant_customers",
    "q_top_parts_by_revenue",
]
_R5_WINDOW = (_R5_NEW + _R3_GREENS)[:50]


def _rotate(front: list[str]) -> None:
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"rotation names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in front}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R5_WINDOW)

__all__ = ["QUERIES", "QuerySpec", "query"]
