"""As-of join row integrity (operators/asof.asof_join).

The r14 review finding: per-column last(ignorenulls=True) TORE rows —
a right row with a NULL in one payload column had that column filled
from an older right row while its siblings came from the newer one.
The payload must travel as one struct: the left row sees the single
most recent right ROW, NULLs included.
"""

from __future__ import annotations

from pg_lake_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "L1"), (1, 300, "L2"), (2, 50, "L3")],
        "k int, ts bigint, lv string",
    )
    right = spark.createDataFrame(
        [(1, 90, 10, "x"), (1, 250, None, "y"), (2, 60, 7, "z")],
        "k int, ts bigint, val int, aux string",
    )
    return left, right


def test_null_payload_column_not_torn(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["val", "aux"],
    )
    rows = {r.lv: r for r in out.collect()}
    # L2 (ts=300) sees the ts=250 right row WHOLE: val NULL, aux 'y'.
    # The torn behavior filled val from the ts=90 row (10) instead.
    assert rows["L2"].val_r is None
    assert rows["L2"].aux_r == "y"
    assert rows["L2"].ts_r == 250
    # L1 (ts=100) sees the ts=90 row
    assert rows["L1"].val_r == 10 and rows["L1"].aux_r == "x"
    # L3 (ts=50) has no prior right row: all payloads NULL
    assert rows["L3"].val_r is None and rows["L3"].aux_r is None
    assert rows["L3"].ts_r is None


def test_tie_timestamp_visible_and_columns_stable(spark):
    left, right = _frames(spark)
    out = asof_join(
        left.withColumnRenamed("ts", "lts"),
        right,
        on=["k"], left_ts="lts", right_ts="ts", right_cols=["val"],
    )
    assert out.columns == ["k", "lts", "lv", "ts_r", "val_r"]
    # right.ts == left.ts counts as prior (>= bound)
    eq = asof_join(
        spark.createDataFrame([(1, 90)], "k int, ts bigint"),
        right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["val"],
    ).collect()[0]
    assert eq.val_r == 10 and eq.ts_r == 90
