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
# green row yet rotate to the front. Round-4 window: the 14 queries that
# have NEVER had an official driver row (r3's backlog — joins, DISTINCT,
# CTE+VALUES, correlated subquery, stat/regr/percentile/bool-string
# aggregates, array ops), then any queries newly declared this round,
# then backfill to 50 with the OLDEST round-2 greens (regression
# re-confirmation). After this round every declared query has had an
# official green row at least once.
_R4_BACKLOG = [
    "j_outer_join_coalesce", "j_full_outer", "j_semi_anti", "j_cross_join",
    "d_distinct_on_latest", "d_count_distinct", "d_cte_values_join",
    "d_correlated_scalar_subquery", "a_stat_aggs", "a_regr_aggs",
    "a_percentiles", "a_bool_string_agg", "arr_ops", "arr_unnest_series",
]
# Queries first declared in round 4 — also never driver-checked.
_R4_NEW = [n for n in ("d_delta_scan",) if n in QUERIES]
# Round-2 greens in their CORRECTNESS_r02 order (oldest official evidence;
# re-confirming these guards against silent regression).
_R2_GREENS = [
    "f_trig", "f_intdiv", "f_string", "f_substring_pg", "f_regex",
    "f_datetime", "f_to_char", "f_case_nullif", "f_encode_decode",
    "f_map_ops", "f_date_bin", "f_json_variant", "f_width_bucket",
    "g_pivot_event_types", "f_hyperbolic", "f_bit_ops",
    "dd_exact_hash_groups", "dd_minhash_signatures",
    "dd_ngram_jaccard_pairs", "dd_fingerprint", "sim_cosine_topk",
    "txt_stats", "txt_quality_by_lang", "mm_binary_features", "dd_simhash",
    "dd_simhash_pairs", "dd_embedding_neardup", "sk_kmv_distinct",
    "ts_gapfill_rollup", "ds_weighted_sample", "st_tumbling_counts",
    "st_session_windows", "st_stateful_user_totals", "st_sliding_counts",
    "w_topk_per_user", "w_lag_lead", "w_running_agg", "w_rank_family",
    "w_value_family", "w_range_frame", "w_agg_over_window_filter",
    "g_rollup_orders", "g_cube_events",
]
_R4_WINDOW = (_R4_BACKLOG + _R4_NEW + _R2_GREENS)[:50]


def _rotate(front: list[str]) -> None:
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"rotation names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in front}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_R4_WINDOW)

__all__ = ["QUERIES", "QuerySpec", "query"]
