"""Out-of-range value policy for lakehouse writes.

Reference: per-table option ``out_of_range_values = error | clamp``
(docs/iceberg-tables.md:76-135) enforced by wrapping the write query
with check/clamp expressions (iceberg_query_validation.c:17-45; datum
twin iceberg_datum_validation.c). Bounds are the Iceberg-representable
ranges: DATE in [-4712-01-01, 9999-12-31], TIMESTAMP in
[0001-01-01, 9999-12-31 23:59:59.999999]. NaN and infinity are valid
in double/float columns and are NOT subject to this policy (the
reference's NaN rule covers only bounded decimals, which this engine
does not bound-check).

Same design here: a validation projection inserted before the writer —
``when(col < lo, lo/error)...`` — pure Column expressions, one map
stage, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_MIN = "0001-01-01 00:00:00"
TS_MAX = "9999-12-31 23:59:59.999999"
DATE_MIN = "-4712-01-01"
DATE_MAX = "9999-12-31"

ERROR = "error"
CLAMP = "clamp"


def _bounds(dtype: str) -> tuple[Column, Column] | None:
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.lit(TS_MIN).cast(dtype), F.lit(TS_MAX).cast(dtype)
    if dtype == "date":
        return F.to_date(F.lit(DATE_MIN)), F.to_date(F.lit(DATE_MAX))
    return None


def validate_for_write(df: DataFrame, mode: str = ERROR) -> DataFrame:
    """Apply the out-of-range policy to every temporal column.

    ``error``: any out-of-range value fails the write with a message
    naming the column (the reference's default; write aborts before any
    file is committed). ``clamp``: silently adjust to the boundary.
    NaN/infinity doubles pass through untouched — they are valid values
    per the reference's documented scope.
    """
    if mode not in (ERROR, CLAMP):
        raise ValueError(f"out_of_range_values mode must be error|clamp, got {mode!r}")
    out = df
    for name, dtype in df.dtypes:
        col = F.col(name)
        b = _bounds(dtype)
        if b is not None:
            lo, hi = b
            if mode == CLAMP:
                fixed = F.when(col < lo, lo).when(col > hi, hi).otherwise(col)
            else:
                fixed = F.when(
                    (col < lo) | (col > hi),
                    F.raise_error(
                        F.concat(
                            F.lit(f"value out of range for column {name}: "),
                            col.cast("string"),
                        )
                    ).cast(dtype),
                ).otherwise(col)
            out = out.withColumn(name, fixed)
    return out
