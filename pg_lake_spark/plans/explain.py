"""Structured physical-plan inspection for DataFrames."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

#: AQE / plumbing nodes that are not user-meaningful operators.
_INFRA = {
    "AdaptiveSparkPlan",
    "ResultQueryStage",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "TableCacheQueryStage",
    "AQEShuffleRead",
    "ReusedExchange",
    "ReusedQueryStage",
    "InMemoryRelation",
    "InMemoryTableScan",
    "ColumnarToRow",
    "Exchange",
    "BroadcastExchange",
}


@dataclass
class ScanInfo:
    format: str
    pushed_filters: list[str]
    read_schema: str


@dataclass
class PlanSummary:
    scans: list[ScanInfo] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    #: shuffle boundaries only (BroadcastExchange is NOT a shuffle —
    #: it is counted separately in ``broadcasts``).
    exchanges: int = 0
    broadcasts: int = 0
    #: None when the plan has not executed yet — AQE only reveals
    #: whole-stage-codegen spans in the finalized plan.
    codegen_stages: int | None = None
    interpreted_ops: list[str] = field(default_factory=list)

    @property
    def broadcast_joins(self) -> int:
        return sum(1 for j in self.joins if "Broadcast" in j)

    @property
    def shuffle_joins(self) -> int:
        return sum(1 for j in self.joins if "SortMerge" in j or "ShuffledHash" in j)


def _finalize_plan(df: DataFrame) -> None:
    """Run the query so AQE finalizes, WITHOUT collecting rows to the
    driver: executing the DataFrame's own QueryExecution as an RDD
    count runs every task and returns one long. ``df.collect()`` here
    would materialize the full result on the driver — an OOM on
    exactly the large frames this module exists to inspect. (A noop
    write would also avoid the collect, but it wraps the plan in its
    own fresh QueryExecution, leaving THIS DataFrame's AQE plan — the
    one ``explainString`` reads — unfinalized.)"""
    df._jdf.queryExecution().toRdd().count()


def plan_summary(df: DataFrame, *, execute: bool = False) -> PlanSummary:
    """Parse the formatted physical plan into a structured summary.

    The interesting properties at scale:
    - every scan should push its filters (non-empty ``pushed_filters``
      when the query filters scan columns) and prune its columns
      (``read_schema`` narrower than the table);
    - dimension joins should be broadcast, fact-fact joins shuffle;
    - ``exchanges`` counts shuffle boundaries — the dominant cost —
      and ``broadcasts`` counts broadcast distributions separately;
    - ``interpreted_ops`` is the "Not Vectorized Constructs" analogue:
      operators running outside whole-stage codegen.

    With ``execute=True`` the DataFrame is executed first (noop write,
    nothing reaches the driver) so the AQE plan finalizes and codegen
    spans become visible. Plans AQE never wraps (no exchange at all)
    expose codegen ids without executing; those are reported as-is.
    """
    if execute:
        _finalize_plan(df)
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    text = df._jdf.queryExecution().explainString(mode)

    # Post-AQE output shows a Final and an Initial tree over one shared
    # operator-id space, then one detail block per id. Scope all counts
    # to the ids reachable from the final (or only) tree.
    if "== Final Plan ==" in text:
        header = text.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
        finalized = True
    else:
        header = text.split("\n\n", 1)[0]
        # No AdaptiveSparkPlan wrapper (e.g. a pure scan-project with
        # no exchange): the single tree IS the final plan and its
        # codegen ids are already visible.
        finalized = "AdaptiveSparkPlan" not in header
    live_ids = set(re.findall(r"\((\d+)\)", header))

    out = PlanSummary()
    codegen_ids: set[str] = set()
    # detail blocks: "(3) OpName [codegen id : 1]\n<properties...>".
    # The op-name class must admit dots/identifiers — catalog-table
    # scans format as "Scan parquet spark_catalog.default.t" and a
    # word-and-space-only class silently drops them (r15 review).
    for m in re.finditer(
        r"^\((\d+)\) ([^\[\n]+?)(?: \[codegen id : (\d+)\])?\s*$([\s\S]*?)(?=^\(\d+\)|\Z)",
        text,
        re.MULTILINE,
    ):
        op_id, op, cg, block = m.groups()
        op = op.strip()
        if op_id not in live_ids:
            continue
        if op.startswith("Scan "):
            pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
            schema = re.search(r"ReadSchema: (\S+)", block)
            out.scans.append(
                ScanInfo(
                    format=op.split()[1],
                    pushed_filters=[
                        p.strip()
                        for p in (pushed.group(1).split(",") if pushed else [])
                        if p.strip()
                    ],
                    read_schema=schema.group(1) if schema else "",
                )
            )
            continue
        if "Join" in op:
            out.joins.append(op.split()[0])
        if op == "Exchange":
            out.exchanges += 1
        elif op == "BroadcastExchange":
            out.broadcasts += 1
        if cg:
            codegen_ids.add(cg)
        elif finalized and op not in _INFRA and not op.startswith("Scan"):
            out.interpreted_ops.append(op.split()[0])
    if finalized:
        out.codegen_stages = len(codegen_ids)
    return out


def explain_report(df: DataFrame, *, execute: bool = False) -> str:
    """Human-readable one-stop report (the reference's EXPLAIN
    ``Vectorized SQL`` / ``Not Vectorized Constructs`` analogue)."""
    s = plan_summary(df, execute=execute)
    lines = ["== pg_lake_spark plan report =="]
    for i, sc in enumerate(s.scans):
        pf = ", ".join(sc.pushed_filters) or "<none>"
        lines.append(f"scan[{i}] {sc.format}: pushed=[{pf}] read={sc.read_schema}")
    lines.append(
        f"joins: {len(s.joins)} ({s.broadcast_joins} broadcast, {s.shuffle_joins} shuffle)"
    )
    lines.append(f"shuffles: {s.exchanges}, broadcasts: {s.broadcasts}")
    if s.codegen_stages is None:
        lines.append("whole-stage-codegen stages: <run with execute=True>")
    else:
        lines.append(f"whole-stage-codegen stages: {s.codegen_stages}")
    if s.interpreted_ops:
        lines.append("outside codegen: " + ", ".join(sorted(set(s.interpreted_ops))))
    return "\n".join(lines)
