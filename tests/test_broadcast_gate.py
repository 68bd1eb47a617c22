"""Size-gated broadcast hints (plans/broadcast.py).

An unconditional broadcast hint on an SF-scaled dimension is a scale
killer (at 100-TB SF ``customer`` is billions of rows); the gate applies
the hint only under a size threshold and otherwise leaves the strategy
to AQE. At bench scale every TPC-H dim passes the gate, so the pinned
plans in test_plans.py still assert BroadcastHashJoin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_lake_spark.plans.broadcast import (
    _parse_bytes,
    broadcast_if_small,
    estimated_size_bytes,
)
from pg_lake_spark.session import load_tables

SF = "/root/testdata/sf0.01"


def _is_hinted(df) -> bool:
    return "UnresolvedHint" in str(df._jdf.queryExecution().logical()) or \
        "ResolvedHint" in str(df._jdf.queryExecution().analyzed())


def test_parse_bytes():
    assert _parse_bytes("10485760b") == 10 * 1024 * 1024
    assert _parse_bytes("10MB") == 10 * 1024 * 1024
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("-1") == -1


def test_small_dim_gets_hint(spark):
    t = load_tables(spark, SF)
    assert estimated_size_bytes(t["customer"]) < 10 * 1024 * 1024
    assert _is_hinted(broadcast_if_small(t["customer"]))


def test_large_side_falls_back_to_no_hint(spark):
    """A frame whose Catalyst estimate exceeds the gate passes through
    UNHINTED — the physical plan goes shuffle (sort-merge) join, which
    is what must happen at a scale factor where the dim no longer fits."""
    t = load_tables(spark, SF)
    big = broadcast_if_small(t["lineitem"], max_bytes=1024)
    assert not _is_hinted(big)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # auto-detection off: with no hint and no auto-broadcast, the
        # join MUST plan as a shuffle join (the 100-TB behaviour)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            t["orders"]
            .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_disabled_auto_broadcast_disables_hints(spark):
    t = load_tables(spark, SF)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert not _is_hinted(broadcast_if_small(t["nation"]))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tpch_dims_all_pass_gate_at_bench_scale(spark):
    t = load_tables(spark, "/root/testdata/sf0.01")
    for dim in ("nation", "region", "customer", "supplier", "part"):
        assert _is_hinted(broadcast_if_small(t[dim])), dim


def test_gauge_rescues_join_exploded_estimate(spark):
    """r17: Catalyst's estimate for a join-derived dimension multiplies
    through the join (supplier⋈nation⋈region reads GBs against a KB
    supplier table), so the plain gate declines the hint the site
    exists for. gauge= reads the pre-join base table's estimate
    instead; the same frame gauged by an over-threshold gauge still
    passes through unhinted (scale safety unchanged)."""
    from pyspark.sql import functions as F

    t = load_tables(spark, SF)
    eur_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # (identity check, not _is_hinted: eur_supp already contains the
    # inner nation/region hints, so the string probe is trivially True;
    # broadcast_if_small returns the SAME object when it declines)
    # the exploded self-estimate declines the hint...
    assert estimated_size_bytes(eur_supp) > 10 * 1024 * 1024
    assert broadcast_if_small(eur_supp) is eur_supp
    # ...the gauge rescues it...
    assert broadcast_if_small(eur_supp, gauge=t["supplier"]) is not eur_supp
    # ...and an over-gate gauge still declines (the 100 TB behavior).
    assert (
        broadcast_if_small(eur_supp, gauge=t["lineitem"], max_bytes=1024)
        is eur_supp
    )
