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
from pg_lake_spark.queries import tpcds_w5  # noqa: E402,F401
from pg_lake_spark.queries import clickbench  # noqa: E402,F401

# Registration order is driver-visible: the correctness driver checks the
# FIRST 50 registry entries each round, so queries without an official
# green row yet rotate to the front. Round-10 window, CHANGED-CODE-FIRST
# (an official green must postdate the code it certifies):
#   1. never-driver-checked rows declared late in r9 (pytest-green only)
#   2. rows whose IMPLEMENTATION changed in r10 after their r9 green:
#      the r9-advice commit touched operators/dedup.py (word_shingles
#      identifier quoting + repeated_spans whitespace trim — the trim
#      CHANGES behavior on non-clean corpora) and ddl.py's INSERT cast
#      guards (integer narrowing + float rounding), so every dedup-
#      path row and every DML row re-certifies on the shipping code
#   3. r10-new queries, most shape-novel first (5th TPC-DS wave A/C,
#      Krovak CRS, maximal spans, ClickBench batch)
#   4. remaining r10-new (star-agg B/D waves) + the 31-row r5-stale
#      backfill roll to r11 — recompute from CORRECTNESS_r0*.json as
#      always; pytest re-proves all of them every round meanwhile.
_NEVER_CHECKED: list[str] = [
    "dsq06_pricey_vs_brand_avg", "dsq83_tri_period_return_share",
    "dsq13_disjunctive_band_profile", "dsq61_promo_share",
    "dsq18_rollup_multi_avg", "dsq85_reason_profile_disjunction",
    "dsq40_before_after_returns_net", "dsq84_identity_lookup_chain",
    "cb_point_lookup", "cb_raw_rows_by_time", "cb_min_string_mixed_like",
]
#: newest official green predates the shipping implementation
_CODE_CHANGED: list[str] = [
    "dd_repeated_spans",                              # r10 trim change
    "dd_minhash_signatures", "dd_ngram_jaccard_pairs",  # word_shingles
    "dd_decontaminate", "dd_lsh_candidates",          # quoting (r10)
    "dd_simhash", "dd_simhash_pairs",
    "st_stream_lsh_neardup",
    "dml_merge_upsert", "dml_update_set", "dml_cow_delete",
    "dml_mor_lifecycle", "dml_incremental_scan",      # ddl cast guards
    "ddl_schema_evolution",
]
_R10_NEW: list[str] = [
    # wave-5 batch A — the genuinely new TPC-DS shapes
    "dsq36_margin_rollup_rank", "dsq80_tri_channel_net_rollup",
    "dsq94_ship_chain_anti", "dsq30_return_ratio_vs_state",
    "dsq99_latency_bucket_matrix", "dsq27_filtered_dim_avg_rollup",
    # beyond-reference + CRS
    "dd_maximal_spans", "f_krovak_transform",
    # batch C distinct shapes
    "dsq11_two_channel_yoy_pref", "dsq12_windowed_revenue_share",
    "dsq25_tri_leg_item_customer_join", "dsq53_quarterly_deviation",
    "dsq56_color_restricted_union", "dsq68_order_band_rows",
    "dsq69_exclusive_channel_profile", "dsq86_orders_rollup_rank",
    "dsq91_monthly_demographic_returns",
    # ClickBench batch
    "cb_model_distinct_users", "cb_model_pair_distinct_users",
    "cb_global_scalar_profile", "cb_phrase_count_and_users",
    "cb_user_minute_phrase", "cb_ip_arith_grouping",
    "cb_windowed_offset_pageviews", "cb_case_src_dst_matrix",
]
_R10_WINDOW = (_NEVER_CHECKED + _CODE_CHANGED + _R10_NEW)[:50]

# r11 rotation note (recompute from CORRECTNESS_r0*.json, don't trust
# blindly): never-checked first — the r10-new rows that missed this
# window (cb_highcard_pair_stats, cb_region_profile_topn,
# cb_wide_rows_like_by_time, cb_domain_length_profile,
# cb_phrase_lexical_order, cb_phrase_time_then_phrase,
# cb_const_key_grouping, f_oblique_mercator, txt_bm25_topk,
# txt_unigram_surprisal, dd_semantic_prune, f_ntv2_grid_shift;
# batch B dsq03/dsq42/dsq52/dsq55/
# dsq07/dsq26/dsq19/dsq43; batch D dsq20/dsq60/dsq62/dsq63/dsq73/
# dsq79/dsq81/dsq82/dsq92) — then the r5-last-green backfill (31 rows
# as of r9: a_mode_disc, arr_operators, d_delta_scan,
# d_limit_with_ties, d_not_in_three_valued, e_funnel, e_retention,
# f_casts, f_math, g_grouping_fn, g_grouping_sets,
# g_rollup_rank_hierarchy, j_* (6), json_extract_agg, mm_* (2),
# q1..q13 TPC-H (9 of them), s_* set ops (4), sim_ivf_topk,
# sim_lsh_topk, w_exclude_current_row — minus any greened in r10),
# then r6-last-green alphabetical.


def _rotate(front: list[str]) -> None:
    # _R10_NEW entries may not be registered yet mid-round; skip those,
    # but a stale/backfill name missing from the registry is a bug.
    missing = [n for n in front if n not in QUERIES and n not in _R10_NEW]
    assert not missing, f"rotation names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in front if n in QUERIES}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R10_WINDOW)

__all__ = ["QUERIES", "QuerySpec", "query"]
