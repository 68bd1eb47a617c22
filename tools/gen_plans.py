"""Generate PLANS.md: executed-plan evidence for the flagship queries."""
import io, sys
from pg_lake_spark.session import get_spark
from pg_lake_spark.plans.explain import explain_report, plan_summary
from pg_lake_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"
spark = get_spark(master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

PICKS = [
    ("q3_shipping_priority", "3-table star join: both dims broadcast, zero shuffle joins, top-k fused into TakeOrderedAndProject."),
    ("q6_forecast_revenue", "All three predicates pushed to the parquet scan; 4-column read schema on a 16-column table."),
    ("q21_waiting_suppliers", "One lineitem scan with per-order window aggregates replacing both EXISTS subqueries (2 shuffles total)."),
    ("q9_product_profit", "5-way join: dimension sides broadcast; the one fact-fact join shuffles on its key."),
    ("dd_lsh_candidates", "Banded MinHash-LSH: candidate generation is a groupBy on short band keys (no cross join anywhere)."),
    ("dd_bloom_semi_join", "Bloom prefilter: packed-word filter broadcast to the probe side; no Python eval in the plan."),
    ("j_polygon_overlap_join", "Grid-bucketed polygon join: cell equi-join + reference-point dedup; the exact kernel only sees candidates."),
    ("sim_cosine_topk", "Broadcast query matrix over the corpus scan; map-side dot products, one top-k reduction."),
    ("dsq05_channel_rollup", "TPC-DS Q5 shape: two channels union, four dims broadcast (size-gated), zero shuffle joins; one rollup shuffle."),
    ("dsq88_case_counts", "TPC-DS Q88 shape: eight CASE counts in one scan, zero joins (DS runs 8 subqueries + cross join)."),
    ("cb_user_activity_topn", "ClickBench shape: high-cardinality groupBy + tie-broken top-N fused to TakeOrderedAndProject."),
    ("dsq64_cross_year_wide_join", "TPC-DS Q64 shape: 6-hop wide join (all dims broadcast) aggregated per item-year, THEN self-joined year-vs-year over the grouped frame — at most two lineitem scans."),
    ("dsq95_dual_semijoin", "TPC-DS Q95 shape (r12 rewrite): ONE fact scan semi-joined to the windowed order keys feeds a single per-order gate aggregate (was two full-fact aggregations); both IN-gates resolve as LeftSemi; date filter pushed to the orders scan."),
    ("dsq16_exists_notexists_window", "TPC-DS Q16 shape: EXISTS -> LeftSemi and NOT EXISTS -> LeftAnti in one plan, window filter pruning orders before either join."),
    ("cb_top_type_per_user", "ClickBench shape: per-user rank window over the aggregate output only — one scan, map-side partials, every exchange post-reduction."),
    ("dsq44_best_worst_items", "TPC-DS Q44 shape (r9): one lineitem scan feeds one grouped frame; both opposite-direction rank windows and the rank-position join run above the aggregate."),
    ("dsq97_channel_overlap_counts", "TPC-DS Q97 shape (r9): two DISTINCT channel key-sets FULL OUTER joined on the composite key; both distincts aggregate below the join."),
    ("dsq08_intersect_membership", "TPC-DS Q8 shape (r9): INTERSECT of two subquery key sets consumed as a LeftSemi by the aggregating fact pass."),
    ("dd_repeated_spans", "Repeated-span dedup (r9): explode -> one groupBy; linear in corpus tokens; hash-keyed shuffle on the scale path."),
    ("dsq94_ship_chain_anti", "TPC-DS Q94 shape (r10): both gates (multi-supplier EXISTS + no-returns NOT EXISTS) fold into ONE lineitem pass feeding one LeftSemi; date window pushed to the orders scan."),
    ("dsq36_margin_rollup_rank", "TPC-DS Q36 shape (r10): margin ROLLUP with rank-within-parent — one Window above one Expand, all three dims broadcast, ship-date filter pushed."),
    ("dsq30_return_ratio_vs_state", "TPC-DS Q30 shape (r10): per-nation average as a window over the GROUPED customer frame — one fact aggregation, zero extra shuffles for the correlated gate."),
    ("dd_maximal_spans", "Maximal repeated spans (r10): one (doc,pos) sort shared by window generation and island detection; hot-position gate plans as LeftSemi on the span hash."),
    ("cb_windowed_offset_pageviews", "ClickBench deep-OFFSET shape (r10): time filters pushed to the events scan; the only Sort consumes the grouped |pages| frame."),
    ("st_stream_dedup", None),  # streaming: plan shape not comparable; skipped
]

out = ["""# PLANS — executed-plan evidence (generated at sf0.01, local mode)

`.explain()`-level proof that the flagship plans have the shape the
100 TB design calls for: filters pushed into scans, pruned read
schemas, broadcast-vs-shuffle chosen correctly, and Python kept out of
the hot path. Produced by `tools/gen_plans.py` via `plans.explain`
(the reference's EXPLAIN `Vectorized SQL` analogue); the same
assertions are pinned by `tests/test_plans.py` so regressions fail CI,
not just this document.
"""]
for name, note in PICKS:
    if note is None:
        continue
    df = QUERIES[name].fn(spark, SF)
    rep = explain_report(df, execute=True)
    out.append(f"## {name}\n\n{note}\n\n```\n{rep}\n```\n")
open("PLANS.md", "w").write("\n".join(out))
print("written")
spark.stop()
