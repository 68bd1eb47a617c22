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
        # Exact integer micros: total_seconds() is a float whose ~2^-52
        # relative error is ±0.5 µs at modern epochs — enough to flip
        # the hashed value (and therefore the bucket) for some
        # microsecond-precision timestamps.
        if value.tzinfo is not None:
            from datetime import timezone as _tz

            value = value.astimezone(_tz.utc).replace(tzinfo=None)
        delta = value - _EPOCH_TS
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
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


_C1, _C2 = 0xCC9E2D51, 0x1B873593


def _block_mix(h: Column, k: Column) -> Column:
    """One murmur3 block round: mix word ``k`` into state ``h``."""
    k = _mul32(k, _C1)
    k = _rotl32_col(k, 15)
    k = _mul32(k, _C2)
    h = _and32(h.bitwiseXOR(k))
    h = _rotl32_col(h, 13)
    return _and32(_mul32(h, 5) + F.lit(0xE6546B64))


def _fmix(h: Column, n: Column) -> Column:
    """murmur3 finalization over state ``h`` for input length ``n``;
    returns signed int32."""
    h = _and32(h.bitwiseXOR(n))
    h = h.bitwiseXOR(F.shiftrightunsigned(_and32(h), 16))
    h = _mul32(h, 0x85EBCA6B)
    h = h.bitwiseXOR(F.shiftrightunsigned(_and32(h), 13))
    h = _mul32(h, 0xC2B2AE35)
    h = h.bitwiseXOR(F.shiftrightunsigned(_and32(h), 16))
    # reinterpret as signed int32
    return F.when(h >= F.lit(1 << 31), h - F.lit(1 << 32)).otherwise(h).cast("int")


def murmur3_32_long_col(col: Column) -> Column:
    """murmur3_x86_32 of the little-endian 8-byte encoding of a BIGINT
    column, as a pure Spark expression (two 4-byte blocks). Returns
    signed int32 to match :func:`murmur3_32`.

    Built from shifts/masks only — stays inside whole-stage codegen; no
    UDF on the write fan-out path.
    """
    v = col.cast("bigint")
    block1 = _and32(v)  # little-endian low word
    block2 = _and32(F.shiftrightunsigned(v, 32))
    h = F.lit(0).cast("bigint")
    for blk in (block1, block2):
        h = _block_mix(h, blk)
    return _fmix(h, F.lit(8).cast("bigint"))


def murmur3_32_binary_col(data: Column) -> Column:
    """murmur3_x86_32 of a variable-length BINARY column as a pure
    Spark expression — byte values come from the hex rendering (two
    chars per byte), 4-byte little-endian words assemble via a
    ``transform`` over the block indices, and the block loop is one
    ``aggregate`` lambda (JVM-side, no Python). Returns signed int32,
    identical to :func:`murmur3_32` over the same bytes — pinned by
    the spec vectors in tests/test_lakehouse.py.
    """
    # Column-algebra helpers (_mul32/_rotl32_col/_fmix) reference their
    # argument several times; Catalyst trees serialize WITHOUT node
    # sharing, so nesting a heavy subtree through them multiplies it
    # ~64× (a first cut shipped a 24 MiB task binary). The cure is a
    # "let binding": transform() over a one-element struct array turns
    # each heavy subtree into a lambda VARIABLE, referenced by name.
    def _let(bindings: dict[str, Column], body) -> Column:
        s = F.struct(*[c.alias(nm) for nm, c in bindings.items()])
        return F.transform(F.array(s), body)[0]

    def mixed(v: Column) -> Column:  # v: struct<hx, sw string, n bigint>
        # sw = hx with every full 4-byte group byte-swapped (one regexp
        # pass), so a little-endian word is ONE substr+conv; the ≤3-byte
        # tail stays unswapped in both and reads from hx.
        hx, sw, n = v["hx"], v["sw"], v["n"]
        nblocks = (n / 4).cast("bigint")  # n >= 0: truncation == floor

        def byte_at(j: Column) -> Column:  # 0-based byte index
            return F.conv(
                F.substr(hx, (j * 2 + 1).cast("int"), F.lit(2)), 16, 10
            ).cast("bigint")

        def word_at(i: Column) -> Column:  # 0-based block, little-endian
            return F.conv(
                F.substr(sw, (i * 8 + 1).cast("int"), F.lit(8)), 16, 10
            ).cast("bigint")

        # sequence(1, 0) would be the DESCENDING [1, 0] — guard empty
        idx = F.when(
            nblocks >= 1, F.sequence(F.lit(1).cast("bigint"), nblocks)
        ).otherwise(F.array().cast("array<bigint>"))
        words = F.transform(idx, lambda i: word_at(i - 1))
        h = F.aggregate(words, F.lit(0).cast("bigint"), _block_mix)

        rem = n % 4
        tb = nblocks * 4  # first tail byte index
        k = (
            F.when(rem >= 1, byte_at(tb)).otherwise(F.lit(0))
            + F.when(rem >= 2, byte_at(tb + 1) * 256).otherwise(F.lit(0))
            + F.when(rem >= 3, byte_at(tb + 2) * 65536).otherwise(F.lit(0))
        )
        k = _mul32(_rotl32_col(_mul32(k, _C1), 15), _C2)
        h = F.when(rem > 0, _and32(h.bitwiseXOR(k))).otherwise(h)
        return F.struct(h.alias("h"), n.alias("n"))

    hx0 = F.hex(data)
    pre = _let(
        {
            "hx": hx0,
            "sw": F.regexp_replace(hx0, r"(..)(..)(..)(..)", r"$4$3$2$1"),
            "n": F.octet_length(data).cast("bigint"),
        },
        mixed,
    )
    # second let: pre is already a struct<h, n> — bind it whole
    return F.transform(F.array(pre), lambda v: _fmix(v["h"], v["n"]))[0]


def bucket_col(col: Column, n: int, dtype: str) -> Column:
    """Iceberg bucket(N) as a Column, spec-exact per input type:
    int/long hash their 8-byte little-endian encoding, date the days
    ordinal and timestamp the MICROS ordinal (both promoted to long),
    string its UTF-8 bytes, binary its raw bytes (spec Appendix B).
    The previous integer-only version silently cast every input to
    bigint — epoch SECONDS for timestamps and NULL for strings/dates —
    so written partition values diverged from bucket_py, which the
    pruner uses: files holding matching rows were pruned away. Types
    the spec leaves out (bool, float) refuse loudly. ``dtype`` is
    REQUIRED (no bigint default) so the old cast-everything failure
    mode is unrepresentable.
    """
    base = dtype.split("(")[0].lower()
    if base in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        hashed = murmur3_32_long_col(col)
    elif base in ("timestamp", "timestamp_ntz", "timestamp_ltz"):
        # session runs UTC: the NTZ→instant cast is value-preserving
        hashed = murmur3_32_long_col(F.unix_micros(col.cast("timestamp")))
    elif base == "date":
        hashed = murmur3_32_long_col(
            F.datediff(col, F.lit("1970-01-01").cast("date"))
        )
    elif base == "string":
        hashed = murmur3_32_binary_col(F.encode(col, "UTF-8"))
    elif base == "binary":
        hashed = murmur3_32_binary_col(col)
    else:
        raise TypeError(f"bucket transform unsupported for column type {dtype!r}")
    return (hashed.cast("bigint").bitwiseAND(F.lit(0x7FFFFFFF)) % n).cast("int")


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
    if dtype in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
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
    # exact integer floor: float total_seconds() can land ~5e-7 s below
    # an exact hour boundary and floor one hour low (timedelta
    # normalizes seconds into [0, 86400), so this is negative-safe)
    delta = v - _EPOCH_TS
    return delta.days * 24 + delta.seconds // 3600


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
    "bucket": (lambda c, p, t: bucket_col(c, p, t), lambda v, p: bucket_py(v, p)),
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
