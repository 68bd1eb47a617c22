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
from pg_lake_spark.queries import spatial_q  # noqa: E402,F401

# Registration order is driver-visible: the correctness driver checks the
# FIRST 50 registry entries each round, so queries without an official
# green row yet rotate to the front. Round-6 window: queries newly
# declared THIS round, then the 17 rows whose newest official green is
# r2/r3 (they fell off the r5 window's tail), then backfill with the
# oldest re-confirmations (r4 rows, in CORRECTNESS_r04 order) up to 50.
_R6_NEW: list[str] = [
    "f_spatial_point", "j_spatial_bbox_join", "f_spatial_measures",
    "f_geojson_scan", "dml_drop_restore", "d_delta_column_mapping",
    "ds_chunk_documents", "ds_stratified_sample", "ds_mix_corpora",
    "sk_hll_bounded_error", "j_polygon_point_exact", "dd_url_canonical",
    "txt_pii_scrub", "txt_gopher_quality", "dd_decontaminate",
    "f_spatial_relations", "f_spatial_overlay", "dd_bloom_semi_join",
    "j_polygon_overlap_join", "f_to_date", "st_stream_dedup",
    "st_stream_lsh_neardup", "dml_changelog",
]
_STALE_R2R3 = [
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_qty_revenue", "q18_large_volume_customer",
    "q19_discounted_revenue", "q20_excess_suppliers",
    "q21_waiting_suppliers", "q22_dormant_customers",
    "q_top_parts_by_revenue", "g_cube_events", "g_rollup_orders",
    "w_agg_over_window_filter", "w_range_frame", "w_rank_family",
    "w_running_agg", "w_value_family",
]
_R4_GREENS = [
    "j_outer_join_coalesce", "j_full_outer", "j_semi_anti", "j_cross_join",
    "d_distinct_on_latest", "d_count_distinct", "d_cte_values_join",
    "d_correlated_scalar_subquery", "a_stat_aggs", "a_regr_aggs",
    "a_percentiles", "a_bool_string_agg", "arr_ops", "arr_unnest_series",
    "f_trig", "f_intdiv", "f_string", "f_substring_pg", "f_regex",
    "f_datetime", "f_to_char", "f_case_nullif", "f_encode_decode",
    "f_map_ops", "f_date_bin", "f_json_variant", "f_width_bucket",
    "g_pivot_event_types", "f_hyperbolic", "f_bit_ops",
    "dd_exact_hash_groups", "dd_minhash_signatures",
    "dd_ngram_jaccard_pairs", "dd_fingerprint", "sim_cosine_topk",
    "txt_stats", "txt_quality_by_lang", "mm_binary_features",
]
_R6_WINDOW = (_R6_NEW + _STALE_R2R3 + _R4_GREENS)[:50]

# r7 rotation note: after this round the oldest official greens are the
# r4 rows beyond position 50 of this window (the tail of _R4_GREENS —
# arr_ops onward) plus the r5-only rows (q1-q13, s_* set ops, a_mode,
# json_extract_agg, w_exclude_current_row, d_limit_with_ties, lifecycle
# dml_* rows). Put r7-new queries first, then those, keep [:50].


def _rotate(front: list[str]) -> None:
    # _R6_NEW entries may not be registered yet mid-round; skip those,
    # but a stale/backfill name missing from the registry is a bug.
    missing = [n for n in front if n not in QUERIES and n not in _R6_NEW]
    assert not missing, f"rotation names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in front if n in QUERIES}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R6_WINDOW)

__all__ = ["QUERIES", "QuerySpec", "query"]
