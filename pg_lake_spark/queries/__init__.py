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
# green row yet rotate to the front. Round-8 window: the third TPC-DS
# wave + new ClickBench shapes declared THIS round (never
# driver-checked), then ALL 22 rows whose newest official green is r4
# (f_intdiv..w_topk_per_user — after this round nothing is older than
# r5), then the alphabetically-first r5-only rows up to 50.
_R8_NEW: list[str] = [
    "dsq64_cross_year_wide_join", "dsq72_late_ship_chain",
    "dsq78_channel_fullouter_ratio", "dsq95_dual_semijoin",
    "dsq16_exists_notexists_window",
    "cb_url_domain_topn", "cb_multi_like_funnel", "cb_event_funnel_users",
    "cb_hour_type_matrix", "cb_value_band_topsources",
    "f_geodesic_spheroid",
    "dsq47_moving_avg_deviation", "dsq35_segment_profile_exists",
    "dsq21_before_after_pivot", "cb_text_prefix_topn",
    "cb_top_type_per_user",
    "dsq39_cov_month_pairs", "dsq59_week_over_year_ratio",
    "dsq76_channel_null_dims", "dsq66_monthly_pivot_wide",
    "cb_type_share_of_total", "cb_power_users_histogram",
    "cb_props_coverage_by_type",
    "dsq50_ship_latency_buckets", "dsq33_category_union_sum",
    "dsq65_min_share_brands", "dsq29_buy_return_rebuy",
    "dsq45_disjunctive_semijoin",
]
#: the 22 rows whose latest official green is r4 (from CORRECTNESS_r0*)
_R4_STALE = [
    "f_intdiv", "f_json_variant", "f_map_ops", "f_regex", "f_string",
    "f_substring_pg", "f_to_char", "f_trig", "f_width_bucket",
    "g_pivot_event_types", "mm_binary_features", "sim_cosine_topk",
    "sk_kmv_distinct", "st_session_windows", "st_sliding_counts",
    "st_stateful_user_totals", "st_tumbling_counts", "ts_gapfill_rollup",
    "txt_quality_by_lang", "txt_stats", "w_lag_lead", "w_topk_per_user",
]
#: r5-only rows, stalest-alphabetical; the first 18 fit this window
_R5_STALE = [
    "a_mode_disc", "arr_operators", "d_delta_scan", "d_limit_with_ties",
    "d_not_in_three_valued", "dd_lsh_candidates", "dd_neardup_clusters",
    "ddl_schema_evolution", "dml_cow_delete", "dml_incremental_scan",
    "dml_merge_upsert", "dml_mor_lifecycle", "dml_update_set",
    "ds_pack_sequences", "ds_train_val_split", "e_funnel", "e_retention",
    "f_casts", "f_math", "g_grouping_fn", "g_grouping_sets",
    "g_rollup_rank_hierarchy", "j_asof_prior_view",
]
_R8_WINDOW = (_R8_NEW + _R4_STALE + _R5_STALE)[:50]

# r9 rotation note: dsq70_rank_within_parent and ds_temperature_mix
# were declared late in r8 and did NOT fit the 50-row window (28
# r8-new + all 22 r4-stale) — put them FIRST in r9. After it: r9-new queries, then the stalest rows —
# the r5-only names (_R5_STALE plus q1-q13, s_* set ops,
# w_exclude_current_row, remaining dml_*/j_* rows; compute from
# CORRECTNESS_r0*.json latest-green as r8 did). Keep [:50].


def _rotate(front: list[str]) -> None:
    # _R8_NEW entries may not be registered yet mid-round; skip those,
    # but a stale/backfill name missing from the registry is a bug.
    missing = [n for n in front if n not in QUERIES and n not in _R8_NEW]
    assert not missing, f"rotation names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in front if n in QUERIES}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R8_WINDOW)

__all__ = ["QUERIES", "QuerySpec", "query"]
