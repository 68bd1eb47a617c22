"""As-of (point-in-time) join — an operator Spark lacks natively.

The reference has none either (SURVEY §2.3: "No as-of/interval/range
join operators exist in the reference"); DuckDB ships ASOF JOIN, which
serves as the differential oracle.

Construction (composition of existing operators, no UDF): tag both
sides, union them on the key, sort each key-partition by (ts, side),
and carry the last-seen right-side payload forward with
``last(..., ignorenulls=True)``. Each left row then holds the most
recent right row with ``right.ts <= left.ts``.

Scale: ONE shuffle of (|L| + |R|) rows on the join key + a window scan —
no per-row subquery, no range cross product; skew on the key is the
only hazard (salt if a key holds a large share of both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts ≤ left_ts per key.

    ``right_cols`` are the right-side payload columns to carry (renamed
    with ``suffix``; ``right_ts`` is carried automatically). Left rows
    with no prior right row keep NULL payloads (LEFT ASOF semantics).
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r = right.withColumn("_side", F.lit(0)).withColumn("_ats", F.col(right_ts))

    carried = [right_ts, *[c for c in right_cols if c != right_ts]]
    l = l.select(
        *[F.col(c) for c in lcols],
        "_side",
        "_ats",
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in carried],
    )
    r = r.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c not in on else F.col(c) for c in lcols],
        "_side",
        "_ats",
        *[F.col(c).alias(f"{c}{suffix}") for c in carried],
    )
    u = l.unionByName(r)
    # side 0 sorts before side 1 at equal timestamps → ties (right.ts ==
    # left.ts) are visible to the left row, matching ASOF's >= bound.
    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the whole right payload as ONE struct, not per-column
    # last(ignorenulls): per-column carry tears rows — a right row whose
    # payload holds a NULL in one column would have that column filled
    # from an OLDER right row while its siblings come from the newer
    # one, which no ASOF engine does. The struct is NULL for left rows
    # (F.when without otherwise) and non-NULL for every right row even
    # when all its fields are NULL, so last(ignorenulls) always picks
    # the single most recent right ROW.
    pay = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"{c}{suffix}").alias(c) for c in carried]),
    )
    u = u.withColumn("_pay", F.last(pay, ignorenulls=True).over(w))
    return (
        u.filter(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in lcols],
            *[F.col("_pay").getField(c).alias(f"{c}{suffix}") for c in carried],
        )
    )
