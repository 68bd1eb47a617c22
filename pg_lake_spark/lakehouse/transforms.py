"""Iceberg hidden-partitioning transforms (SURVEY §2.9).

Reference: pg_lake_table/src/fdw/partition_transform.c — transforms
apply on write (one file per partition tuple) and invert on read for
pruning. The only nontrivial one is ``bucket(N)``: per the Iceberg spec
it is ``(murmur3_x86_32(little_endian_8_bytes(v)) & INT32_MAX) % N``
with int2/int4 promoted to int8 before hashing (partition_transform.c:
760-800). Spark's built-in ``hash()`` uses seed 42 and different byte
layout, so murmur3 is implemented here exactly — twice: as a Python
function (metadata-side evaluation) and as a Spark Column expression
(write-path fan-out), with spec test vectors pinning both.

All transforms come in two forms:
- ``*_py(value)``  — driver/metadata side (pruning bound checks)
- ``*_col(col)``   — executor side (Column expression, codegen'd)
"""

from __future__ import annotations

import struct
from datetime import date, datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_TS = datetime(1970, 1, 1)


# ---------------------------------------------------------------------------
# murmur3_x86_32 — Python reference implementation
# ---------------------------------------------------------------------------

def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 over bytes; returns signed int32 (Iceberg spec)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = _rotl32(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    # tail
    k = 0
    tail = data[nblocks * 4 :]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = _rotl32(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    # finalization
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_py(value, n: int) -> int | None:
    """Iceberg bucket transform, Python side (ints/longs and strings)."""
    if value is None:
        return None
    if isinstance(value, bool):
        raise TypeError("bucket transform undefined for booleans")
    if isinstance(value, int):
        data = struct.pack("<q", value)
    elif isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(value, bytes):
        data = value
    elif isinstance(value, datetime):
        micros = int((value - _EPOCH_TS).total_seconds() * 1_000_000)
        data = struct.pack("<q", micros)
    elif isinstance(value, date):
        days = (value - _EPOCH_DATE).days
        data = struct.pack("<q", days)  # promoted to long per spec
    else:
        raise TypeError(f"bucket transform unsupported for {type(value)}")
    return (murmur3_32(data) & 0x7FFFFFFF) % n


# ---------------------------------------------------------------------------
# murmur3_x86_32 — Spark Column expression (for long inputs)
# ---------------------------------------------------------------------------

def _and32(c: Column) -> Column:
    return c.bitwiseAND(F.lit(0xFFFFFFFF))


def _rotl32_col(c: Column, r: int) -> Column:
    return _and32(F.shiftleft(c, r).bitwiseOR(F.shiftrightunsigned(_and32(c), 32 - r)))


def _mul32(c: Column, k: int) -> Column:
    # 32-bit wrap-around multiply in bigint space: (c & 0xFFFFFFFF) * k
    # can reach 2^63-ish for k < 2^32 — split k into 16-bit halves to
    # stay clear of signed-64 overflow (ANSI mode would raise).
    k_lo, k_hi = k & 0xFFFF, (k >> 16) & 0xFFFF
    lo = _and32(c) * F.lit(k_lo)
    hi = _and32(_and32(c) * F.lit(k_hi))
    return _and32(lo + _and32(F.shiftleft(hi, 16)))


def murmur3_32_long_col(col: Column) -> Column:
    """murmur3_x86_32 of the little-endian 8-byte encoding of a BIGINT
    column, as a pure Spark expression (two 4-byte blocks). Returns
    signed int32 to match :func:`murmur3_32`.

    Built from shifts/masks only — stays inside whole-stage codegen; no
    UDF on the write fan-out path.
    """
    v = col.cast("bigint")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    block1 = _and32(v)  # little-endian low word
    block2 = _and32(F.shiftrightunsigned(v, 32))
    h = F.lit(0).cast("bigint")
    for blk in (block1, block2):
        k = _mul32(blk, c1)
        k = _rotl32_col(k, 15)
        k = _mul32(k, c2)
        h = _and32(h.bitwiseXOR(k))
        h = _rotl32_col(h, 13)
        h = _and32(_mul32(h, 5) + F.lit(0xE6546B64))
    h = h.bitwiseXOR(F.lit(8))
    h = h.bitwiseXOR(F.shiftrightunsigned(_and32(h), 16))
    h = _mul32(h, 0x85EBCA6B)
    h = h.bitwiseXOR(F.shiftrightunsigned(_and32(h), 13))
    h = _mul32(h, 0xC2B2AE35)
    h = h.bitwiseXOR(F.shiftrightunsigned(_and32(h), 16))
    # reinterpret as signed int32
    return F.when(h >= F.lit(1 << 31), h - F.lit(1 << 32)).otherwise(h).cast("int")


def bucket_col(col: Column, n: int) -> Column:
    """Iceberg bucket(N) as a Column (integer-typed inputs)."""
    return (murmur3_32_long_col(col).cast("bigint").bitwiseAND(F.lit(0x7FFFFFFF)) % n).cast("int")


# ---------------------------------------------------------------------------
# Temporal + truncate transforms
# ---------------------------------------------------------------------------

def year_col(col: Column) -> Column:
    """Years since 1970 (Iceberg stores offsets, not calendar years)."""
    return (F.year(col) - 1970).cast("int")


def month_col(col: Column) -> Column:
    return ((F.year(col) - 1970) * 12 + F.month(col) - 1).cast("int")


def day_col(col: Column) -> Column:
    return F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")).cast("int")


def hour_col(col: Column) -> Column:
    # hours since epoch; inputs are NTZ timestamps treated as UTC (the
    # session runs UTC, so the cast is value-preserving). Pure integer
    # arithmetic — no per-row string formatting/parsing round-trip.
    return F.floor(F.unix_micros(col.cast("timestamp")) / F.lit(3_600_000_000)).cast("int")


def truncate_col(col: Column, width: int, dtype: str) -> Column:
    """truncate(W): multiple-of-W for ints, prefix for strings/binary
    (partition_transform.c:492)."""
    if dtype in ("int", "bigint", "smallint"):
        return (col - (((col % width) + width) % width)).cast("bigint")
    if dtype == "string":
        return F.substring(col, 1, width)
    if dtype == "binary":
        return F.substring(col, 1, width)  # substring operates on binary natively
    raise TypeError(f"truncate unsupported for {dtype}")


def year_py(v) -> int | None:
    return None if v is None else v.year - 1970


def month_py(v) -> int | None:
    return None if v is None else (v.year - 1970) * 12 + v.month - 1


def day_py(v) -> int | None:
    if v is None:
        return None
    d = v.date() if isinstance(v, datetime) else v
    return (d - _EPOCH_DATE).days


def hour_py(v) -> int | None:
    if v is None:
        return None
    return int((v - _EPOCH_TS).total_seconds() // 3600)


def truncate_py(v, width: int):
    if v is None:
        return None
    if isinstance(v, int):
        return v - (((v % width) + width) % width)
    if isinstance(v, (str, bytes)):
        return v[:width]
    raise TypeError(f"truncate unsupported for {type(v)}")


def identity_py(v):
    return v


#: transform name → (column builder, python evaluator). Column builders
#: take (Column, param, dtype) for uniformity.
TRANSFORMS = {
    "identity": (lambda c, p, t: c, lambda v, p: v),
    "year": (lambda c, p, t: year_col(c), lambda v, p: year_py(v)),
    "month": (lambda c, p, t: month_col(c), lambda v, p: month_py(v)),
    "day": (lambda c, p, t: day_col(c), lambda v, p: day_py(v)),
    "hour": (lambda c, p, t: hour_col(c), lambda v, p: hour_py(v)),
    "bucket": (lambda c, p, t: bucket_col(c, p), lambda v, p: bucket_py(v, p)),
    "truncate": (lambda c, p, t: truncate_col(c, p, t), lambda v, p: truncate_py(v, p)),
}


def parse_transform(spec: str) -> tuple[str, int | None, str]:
    """Parse ``'day(ts)'`` / ``'bucket(8, id)'`` / ``'id'`` →
    (transform_name, param, column)."""
    spec = spec.strip()
    if "(" not in spec:
        return "identity", None, spec
    name, rest = spec.split("(", 1)
    name = name.strip().lower()
    args = [a.strip() for a in rest.rstrip(")").split(",")]
    if name in ("bucket", "truncate"):
        if len(args) != 2:
            raise ValueError(f"{name} needs (N, col): {spec!r}")
        return name, int(args[0]), args[1]
    if len(args) != 1:
        raise ValueError(f"bad transform spec: {spec!r}")
    if name == "years":
        name = "year"
    if name in ("days", "months", "hours"):
        name = name[:-1]
    if name not in TRANSFORMS:
        raise ValueError(f"unknown transform: {name}")
    return name, None, args[0]
