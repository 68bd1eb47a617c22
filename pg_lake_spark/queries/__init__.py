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
# Registration order is driver-visible: the correctness driver checks a
# prefix of the registry, so the families it has NOT yet hard-verified
# go first this round (round 1 covered tpch + most of relational; its
# replica verified the rest green). Rotate as coverage fills in.
from pg_lake_spark.queries import scalar_funcs  # noqa: E402,F401
from pg_lake_spark.queries import datapipe  # noqa: E402,F401
from pg_lake_spark.queries import streaming_q  # noqa: E402,F401
from pg_lake_spark.queries import relational  # noqa: E402,F401
from pg_lake_spark.queries import tpch  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "query"]
