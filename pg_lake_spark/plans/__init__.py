"""Plan observability (EXPLAIN transparency).

Reference parity: pg_lake decorates EXPLAIN with the deparsed
``Vectorized SQL``, the engine plan, and ``Not Vectorized Constructs``
(pg_lake_table/src/planner/explain.c, pg_lake_engine/src/pgduck/
explain.c). Here the single engine is Spark, so the equivalents are the
Catalyst physical plan plus this module's structured summary: which
scans push which filters, which joins broadcast, where the exchanges
(shuffles) are, and which operators run outside whole-stage codegen.
"""

from pg_lake_spark.plans.explain import explain_report, plan_summary

__all__ = ["explain_report", "plan_summary"]
