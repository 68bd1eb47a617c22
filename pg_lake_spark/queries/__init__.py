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
from pg_lake_spark.queries import tpcds  # noqa: E402,F401
from pg_lake_spark.queries import clickbench  # noqa: E402,F401

# Registration order is driver-visible: the correctness driver checks the
# FIRST 50 registry entries each round, so queries without an official
# green row yet rotate to the front. Round-7 window: the TPC-DS-shape +
# ClickBench packs declared THIS round (never driver-checked), then
# backfill with the rows whose newest official green is r4 (in
# CORRECTNESS_r04 order) up to 50.
_R7_NEW: list[str] = [
    "dsq05_channel_rollup", "dsq77_channel_profit", "dsq67_rollup_topk",
    "dsq10_exists_chain", "dsq88_case_counts", "dsq01_returns_above_avg",
    "dsq15_having_gate", "dsq23_frequent_best", "dsq34_order_size_band",
    "dsq38_intersect_channels", "dsq87_except_channels",
    "dsq51_cumulative_crossover", "dsq54_revenue_bands",
    "dsq49_return_ratio_rank", "dsq93_net_after_returns",
    "dsq89_monthly_deviation", "dsq17_quantity_cov", "dsq04_yoy_growth",
    "cb_user_activity_topn", "cb_regex_extract_quantiles",
    "cb_minute_timeseries", "cb_type_value_stats", "cb_funnel_like_filter",
    "f_geodesic_sphere",
    # second DS wave
    "dsq14_cross_channel_items", "dsq31_qoq_growth_compare",
    "dsq48_band_disjunction", "dsq58_channel_tolerance",
    "dsq90_am_pm_ratio", "dsq74_two_metric_growth",
    "dsq96_multi_filter_count", "f_regexp_replace_pg",
]
#: rows whose latest official green is r4 (40 total; the first 27 fit
#: this window, the tail rolls to r8's)
_R4_STALE = [
    "a_bool_string_agg", "a_percentiles", "arr_ops", "arr_unnest_series",
    "dd_embedding_neardup", "dd_exact_hash_groups", "dd_fingerprint",
    "dd_minhash_signatures", "dd_ngram_jaccard_pairs", "dd_simhash",
    "dd_simhash_pairs", "ds_weighted_sample", "f_bit_ops", "f_case_nullif",
    "f_date_bin", "f_datetime", "f_encode_decode", "f_hyperbolic",
    "f_intdiv", "f_json_variant", "f_map_ops", "f_regex", "f_string",
    "f_substring_pg", "f_to_char", "f_trig", "f_width_bucket",
    "g_pivot_event_types", "mm_binary_features", "sim_cosine_topk",
    "sk_kmv_distinct", "st_session_windows", "st_sliding_counts",
    "st_stateful_user_totals", "st_tumbling_counts", "ts_gapfill_rollup",
    "txt_quality_by_lang", "txt_stats", "w_lag_lead", "w_topk_per_user",
]
_R7_WINDOW = (_R7_NEW + _R4_STALE)[:50]

# r8 rotation note: with 32 new rows this round only the first 18
# stale names fit; after this round the oldest official greens are the
# _R4_STALE tail beyond position 50 (f_encode_decode onward, 22 rows)
# plus the r5-only rows (q1-q13, s_* set ops, a_mode, json_extract_agg,
# w_exclude_current_row, d_limit_with_ties, lifecycle dml_* rows). Put
# r8-new queries first, then those, keep [:50].


def _rotate(front: list[str]) -> None:
    # _R7_NEW entries may not be registered yet mid-round; skip those,
    # but a stale/backfill name missing from the registry is a bug.
    missing = [n for n in front if n not in QUERIES and n not in _R7_NEW]
    assert not missing, f"rotation names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in front if n in QUERIES}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R7_WINDOW)

__all__ = ["QUERIES", "QuerySpec", "query"]
