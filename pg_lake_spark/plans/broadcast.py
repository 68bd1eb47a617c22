"""Size-gated broadcast hints.

An unconditional ``F.broadcast(dim)`` on an SF-scaled dimension is the
one hint that turns into a scale killer: TPC-H ``customer``/``part``/
``supplier`` grow linearly with scale factor, and at a 100-TB SF the
hint forces Spark to materialize billions of rows on the driver and
every executor — where plain AQE would have picked a shuffle join.

:func:`broadcast_if_small` applies the hint ONLY when Catalyst's own
size estimate for the frame is under the session's
``spark.sql.autoBroadcastJoinThreshold`` scaled by ``factor``.
``factor`` > 1 deliberately WIDENS the gate relative to Spark's
auto-detection: a hint site knows the frame is a dimension, so it
tolerates a build side the planner's cost model would decline
(Spark's own ``/*+ BROADCAST */`` skips the size check entirely; this
gate is the bounded version of that trust). The cap on ``factor`` is
the in-memory expansion — the estimate reflects on-disk/columnar
bytes while the broadcast relation is a row-format hash table that
can run several times larger — so the default stays at 2x, not the
unbounded trust of a raw hint. Above the gate — or when no estimate
is available — the frame passes through unhinted and AQE decides at
runtime from actual shuffle sizes, which is exactly the behaviour we
want on a cluster.

Constant-cardinality frames (``nation`` = 25 rows, ``region`` = 5,
single-row aggregates) keep plain ``F.broadcast`` at their call sites;
the gate is for anything whose size scales with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Spark's default autoBroadcastJoinThreshold (10 MiB).
_DEFAULT_THRESHOLD = 10 * 1024 * 1024

_SUFFIX = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
           "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}


def _parse_bytes(conf_value: str) -> int:
    """'10485760b' / '10MB' / '-1' → bytes (negative disables)."""
    s = conf_value.strip().lower()
    for suffix in sorted(_SUFFIX, key=len, reverse=True):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _SUFFIX[suffix])
    return int(float(s))


def estimated_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for ``df``'s optimized plan —
    the same statistic Spark's own join-strategy selection reads — or
    None when unavailable (e.g. Spark Connect, where the gate then
    declines the hint and leaves the decision to AQE)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(str(stats.sizeInBytes()))  # py4j gives int; str() is belt
        return size if size >= 0 else None
    except Exception:  # noqa: BLE001 — estimation is best-effort
        return None


def broadcast_if_small(
    df: DataFrame,
    *,
    max_bytes: int | None = None,
    factor: float = 2.0,
    gauge: DataFrame | None = None,
) -> DataFrame:
    """``F.broadcast(df)`` iff Catalyst estimates ``df`` under the gate.

    ``max_bytes`` defaults to ``factor`` × the session's
    autoBroadcastJoinThreshold (hint sites tolerate a bigger build side
    than auto-detection because the caller KNOWS it's a dimension, but
    the row-format in-memory relation runs several times the columnar
    estimate, so the widening is bounded — see the module docstring).
    Unestimable or over-gate frames pass through unhinted — AQE picks
    the strategy from runtime sizes.

    ``gauge`` (r17): the frame whose Catalyst estimate the gate reads
    INSTEAD of ``df``'s own. Catalyst's size estimate for a
    join-derived frame multiplies through the join (q2's
    supplier⋈nation⋈region read 34 GB against a 22 KB supplier table),
    so the gate silently declined exactly the dimension hints it
    exists for — and the planner, left to its own inverted estimates,
    then broadcast the FACT side (guide §3.1: estimates are often
    badly wrong after filters/joins; hint when you know better). Pass
    the pre-join base table when the derived frame can only drop its
    rows and add bounded width; the scale-safety contract is
    unchanged because the gauge's estimate grows with the data
    exactly like the derived frame's true size.
    """
    if max_bytes is None:
        try:
            raw = df.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", str(_DEFAULT_THRESHOLD)
            )
            thr = _parse_bytes(raw)
        except Exception:  # noqa: BLE001
            thr = _DEFAULT_THRESHOLD
        if thr <= 0:  # auto-broadcast disabled → respect that for hints too
            return df
        max_bytes = int(thr * factor)
    size = estimated_size_bytes(gauge if gauge is not None else df)
    if size is not None and size <= max_bytes:
        return F.broadcast(df)
    return df


__all__ = ["broadcast_if_small", "estimated_size_bytes"]
