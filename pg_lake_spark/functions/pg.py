"""PostgreSQL-exact scalar semantics on Spark Columns.

Each function documents the semantic delta it closes and the reference
implementation it mirrors (file:line in /root/reference). These are the
Spark equivalents of pg_lake's rewrite rules — the reference spent
~5 kLoC guaranteeing PG-exact results on top of DuckDB
(pg_lake_engine/src/pgduck/rewrite_query.c:126-191, to_char.c:30-60,
duckdb_pglake/src/duckdb_pglake_extension.cpp:82-157); we apply the same
discipline on top of Spark, with the DuckDB oracle arbitrating in tests.

All functions build JVM-side Column expressions (whole-stage codegen
friendly); none drop to Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Integer division / modulo
# ---------------------------------------------------------------------------

def pg_div(a: Column | str, b: Column | str) -> Column:
    """PG integer division: ``4/10 = 0`` (truncation toward zero).

    Reference: RewriteOpExprIntegerDivision (rewrite_query.c:189) rewrites
    PG ``/`` to DuckDB ``divide``/``fdiv`` because DuckDB ``/`` is float
    division — Spark ``/`` is float division too, so the same rewrite is
    needed. Spark's ``div`` operator is integral division with
    truncation-toward-zero, matching PG exactly.
    """
    a, b = _col(a), _col(b)
    # Spark's integral `div` (exact long arithmetic, truncation toward
    # zero, ANSI error on zero divisor — all matching PG). The previous
    # form ((a - a % b) / b).cast("long") routed through DOUBLE
    # division: exact only below 2^53, it returned 1537228672809129216
    # for div(2^62+3, 3) (true: ...302) and flipped -(2^63-1)/1 to
    # -2^63.
    return F.call_function("div", a, b)


def pg_mod(a: Column | str, b: Column | str) -> Column:
    """PG mod(): sign follows the dividend — same as Spark/DuckDB ``%``.

    Reference: RewriteFuncExprMod (rewrite_query.c:155)."""
    return _col(a) % _col(b)


# ---------------------------------------------------------------------------
# Substring with PG negative-start semantics
# ---------------------------------------------------------------------------

def pg_substring(s: Column | str, start: Column | int, length: Column | int | None = None) -> Column:
    """PG ``substring(str FROM start FOR length)``.

    PG treats the string as an infinite sequence: a non-positive start
    shifts the window left and the characters "before position 1" are
    consumed from the requested length. Reference: ``substring_pg`` in
    duckdb_pglake_extension.cpp:157 (PG-exact reimplementation shipped to
    DuckDB because its builtin differs the same way Spark's does).
    """
    s = _col(s)
    start_c = F.lit(start) if isinstance(start, int) else start
    eff_start = F.greatest(start_c, F.lit(1))
    if length is None:
        return F.substring(s, eff_start, F.lit(2147483647))
    length_c = F.lit(length) if isinstance(length, int) else length
    # chars "consumed" left of position 1: max(1 - start, 0)
    eff_len = F.greatest(length_c - F.greatest(F.lit(1) - start_c, F.lit(0)), F.lit(0))
    return F.substring(s, eff_start, eff_len)


# ---------------------------------------------------------------------------
# date_trunc with PG-only field names
# ---------------------------------------------------------------------------

_SPARK_TRUNC_FIELDS = {
    "microsecond", "millisecond", "second", "minute", "hour", "day", "week",
    "month", "quarter", "year",
}


def pg_date_trunc(field: str, ts: Column | str) -> Column:
    """PG date_trunc incl. ``decade``/``century``/``millennium``.

    PG centuries start at year 1 (the 21st century began 2001-01-01);
    reference corrects DuckDB's 2000-01-01 convention via
    RewriteFuncExprDateTrunc (rewrite_query.c:153) + to_char.c constants.
    Spark's date_trunc lacks these fields entirely, so we compute the
    truncated year arithmetically and rebuild the timestamp.
    """
    ts = _col(ts)
    f = field.lower()
    if f in _SPARK_TRUNC_FIELDS:
        return F.date_trunc(f, ts)
    y = F.year(ts)
    if f == "decade":
        # PG decades are calendar decades starting at year XXX0.
        trunc_year = (F.floor(y / 10) * 10).cast("int")
    elif f == "century":
        trunc_year = ((F.ceil(y / 100) - 1) * 100 + 1).cast("int")
    elif f == "millennium":
        trunc_year = ((F.ceil(y / 1000) - 1) * 1000 + 1).cast("int")
    else:
        raise ValueError(f"unsupported date_trunc field: {field}")
    return F.make_timestamp_ntz(trunc_year, F.lit(1), F.lit(1), F.lit(0), F.lit(0), F.lit(0))


# ---------------------------------------------------------------------------
# to_char: PG format-string → Spark date_format pattern compiler
# ---------------------------------------------------------------------------

# Ordered longest-first so greedy scanning picks the longest specifier,
# exactly like the reference's FormatSpecifierMappings table
# (pg_lake_engine/src/pgduck/to_char.c:30-60) which compiles PG to_char
# patterns to DuckDB strftime. Target here is Java DateTimeFormatter
# (Spark date_format).
_TO_CHAR_MAP: list[tuple[str, str]] = [
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("YYYY", "yyyy"),
    ("YYY", "yyy"),
    ("YY", "yy"),
    ("Y", "y"),
    ("MONTH", "MMMM"),  # PG blank-pads; delta documented
    ("Month", "MMMM"),
    ("month", "MMMM"),
    ("MON", "MMM"),
    ("Mon", "MMM"),
    ("mon", "MMM"),
    ("MM", "MM"),
    ("DDD", "DDD"),
    ("DD", "dd"),
    ("DAY", "EEEE"),
    ("Day", "EEEE"),
    ("day", "EEEE"),
    ("DY", "EEE"),
    ("Dy", "EEE"),
    ("dy", "EEE"),
    ("HH", "hh"),
    ("MI", "mm"),
    ("SSSS", "A"),  # seconds past midnight — approximate, rarely used
    ("SS", "ss"),
    ("MS", "SSS"),
    ("US", "SSSSSS"),
    ("AM", "a"),
    ("PM", "a"),
    ("am", "a"),
    ("pm", "a"),
    ("TZ", "zz"),
    ("Q", "Q"),
    ("WW", "ww"),
    ("J", "g"),  # julian day — approximate
]


def translate_to_char_pattern(pg_fmt: str) -> str:
    """Compile a PG to_char pattern into a Java DateTimeFormatter pattern."""
    out: list[str] = []
    i = 0
    n = len(pg_fmt)
    while i < n:
        ch = pg_fmt[i]
        if ch == '"':  # PG quoted literal: "..." → Java quoted literal '...'
            j = pg_fmt.find('"', i + 1)
            j = n if j < 0 else j
            lit = pg_fmt[i + 1 : j].replace("'", "''")
            out.append(f"'{lit}'")
            i = j + 1
            continue
        matched = False
        for pg_spec, java_spec in _TO_CHAR_MAP:
            if pg_fmt.startswith(pg_spec, i):
                out.append(java_spec)
                i += len(pg_spec)
                matched = True
                break
        if not matched:
            if ch.isalpha():
                out.append(f"'{ch}'")  # bare letters are literals in Java patterns
            else:
                out.append(ch)
            i += 1
    return "".join(out)


def pg_to_char(ts: Column | str, pg_fmt: str) -> Column:
    """PG ``to_char(timestamp, fmt)`` via pattern translation.

    Reference: to_char.c is a 1,378-LoC PG→DuckDB-strftime compiler; this
    is the same idea targeting Java DateTimeFormatter. The translation
    runs at plan-construction time (driver side) — the executed
    expression is a plain ``date_format`` (codegen'd, no UDF).
    """
    out = F.date_format(_col(ts), translate_to_char_pattern(pg_fmt))
    # PG's lowercase am/pm specifiers render lowercase; Java's 'a' is
    # always uppercase — post-lowercase when the pattern asked for it
    # (found by differential fuzz, test_fuzz_pg_semantics.py).
    import re as _re

    if _re.search(r"(?<![A-Za-z\"])(am|pm)(?![A-Za-z])", pg_fmt):
        out = F.regexp_replace(F.regexp_replace(out, "AM", "am"), "PM", "pm")
    return out


def pg_to_date(s: Column | str, pg_fmt: str) -> Column:
    """PG ``to_date(text, fmt)`` — the same pattern compiler as
    :func:`pg_to_char` driving ``to_date`` (reference:
    pg_lake_to_date in the engine's PG-compat function set). Plain
    codegen'd expression, no UDF."""
    return F.to_date(_col(s), translate_to_char_pattern(pg_fmt))


def pg_to_timestamp(s: Column | str, pg_fmt: str) -> Column:
    """PG ``to_timestamp(text, fmt)`` via the shared pattern compiler."""
    return F.to_timestamp(_col(s), translate_to_char_pattern(pg_fmt))


# ---------------------------------------------------------------------------
# INTERVAL persistence encoding (months/days/microseconds struct)
# ---------------------------------------------------------------------------

def interval_struct(
    months: Column | int = 0, days: Column | int = 0, microseconds: Column | int = 0
) -> Column:
    """Build the reference's INTERVAL storage struct.

    Spark's CalendarIntervalType cannot be a Parquet column; the
    reference stores intervals as STRUCT(months BIGINT, days BIGINT,
    microseconds BIGINT) (type.c:519-523; docs/iceberg-tables.md:111).
    Persist this struct and convert at the edges with
    :func:`add_interval` — files stay readable by the reference, DuckDB,
    and pyiceberg.
    """
    def lift(v):
        return F.lit(v).cast("bigint") if isinstance(v, int) else v.cast("bigint")

    return F.struct(
        lift(months).alias("months"),
        lift(days).alias("days"),
        lift(microseconds).alias("microseconds"),
    )


def add_interval(ts: Column | str, ivl: Column) -> Column:
    """``timestamp + interval-struct`` with PG month/day/micros semantics
    (months first, then days, then microseconds — each component applied
    separately so month arithmetic clamps to end-of-month like PG)."""
    ts = _col(ts)
    zero = F.lit(0)
    # month-interval addition clamps to end-of-month (Jan 31 + 1 mon =
    # Feb 29) exactly like PG, and preserves the time of day
    return (
        ts
        + F.make_interval(zero, ivl["months"].cast("int"), zero, zero, zero, zero, F.lit(0))
        + F.make_interval(zero, zero, zero, ivl["days"].cast("int"), zero, zero, F.lit(0))
        + (ivl["microseconds"] * F.expr("INTERVAL 1 MICROSECOND"))
    )


# ---------------------------------------------------------------------------
# TIME / TIMETZ encoding (microseconds since midnight)
# ---------------------------------------------------------------------------

def time_to_micros(ts: Column | str) -> Column:
    """Encode the time-of-day of a timestamp as micros-since-midnight.

    Spark has no TIME type (SURVEY §1.2: TIME → LongType); the reference
    maps PG TIME to DuckDB TIME (type.c:259-264) — here the stored form
    is the int64 the Parquet TIME logical type uses, so files written
    this way read back as TIME in DuckDB/the reference.
    """
    ts = _col(ts).cast("timestamp")  # NTZ → TZ is value-preserving (UTC session)
    return F.unix_micros(ts) - F.unix_micros(F.date_trunc("day", ts))


def micros_to_time_string(micros: Column | str) -> Column:
    """Render micros-since-midnight as ``HH:MM:SS.ffffff`` (PG text form)."""
    m = _col(micros).cast("bigint")
    h = (m / 3600000000).cast("bigint")
    mi = ((m % 3600000000) / 60000000).cast("bigint")
    s = ((m % 60000000) / 1000000).cast("bigint")
    us = m % 1000000
    return F.format_string("%02d:%02d:%02d.%06d", h, mi, s, us)


# ---------------------------------------------------------------------------
# date_bin
# ---------------------------------------------------------------------------

_UNIT_MICROS = {
    "microsecond": 1,
    "millisecond": 1000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def pg_date_bin(stride: str, ts: Column | str, origin: str) -> Column:
    """PG ``date_bin(stride, ts, origin)`` — align timestamps into
    stride-sized bins anchored at ``origin``.

    Shippable in the reference (shippable_builtin_functions.c date_bin
    row); Spark has no built-in, so this is pure micros arithmetic:
    ``origin + floor((ts - origin) / stride) * stride`` — stays in
    whole-stage codegen. ``stride`` is ``"<n> <unit>"`` with units
    microsecond/millisecond/second/minute/hour/day/week (fixed-width
    units only, exactly like PG's date_bin, which rejects months/years).
    """
    n_str, unit = stride.strip().split()
    unit = unit.rstrip("s").lower()
    if unit not in _UNIT_MICROS:
        raise ValueError(f"date_bin stride unit must be fixed-width, got {unit!r}")
    stride_us = int(n_str) * _UNIT_MICROS[unit]
    ts = _col(ts).cast("timestamp")
    origin_us = F.unix_micros(F.lit(origin).cast("timestamp"))
    delta = F.unix_micros(ts) - origin_us
    # floor(delta/stride)*stride == delta - pmod(delta, stride) in exact
    # bigint arithmetic (pmod's non-negative remainder IS the floor
    # convention for negative deltas); the previous floor(double
    # division) could mis-bin by one stride at extreme epochs where
    # delta exceeds 2^53 µs.
    binned = origin_us + (delta - F.pmod(delta, F.lit(stride_us)))
    return F.timestamp_micros(binned).cast("timestamp_ntz")


def _pg_repl_to_java(replacement: str) -> str:
    """PG replacement-string syntax → Java: ``\\1``..``\\9`` become
    ``$1``..``$9``, ``\\\\`` a literal backslash, and a bare ``$`` —
    literal in PG, a group reference in Java — is escaped."""
    out = []
    i, n = 0, len(replacement)
    while i < n:
        c = replacement[i]
        if c == "\\" and i + 1 < n:
            nxt = replacement[i + 1]
            if nxt.isdigit():
                out.append("$" + nxt)
            elif nxt == "\\":
                out.append("\\\\")  # literal backslash, Java-escaped
            else:
                out.append("\\" + nxt)
            i += 2
            continue
        if c == "$":
            out.append("\\$")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def pg_regexp_replace(
    s: Column | str,
    pattern: str,
    replacement: str,
    flags: str = "",
) -> Column:
    """PG ``regexp_replace(source, pattern, replacement [, flags])``.

    The semantic trap: WITHOUT the ``g`` flag PG (and DuckDB) replace
    only the FIRST match, while Spark's ``regexp_replace`` always
    replaces every match. The reference ships the 3- and 4-arg text
    forms (engineering-notes/pgduck_shippability.md regexp_replace
    row); this shim reproduces both:

    - ``g`` in flags → Spark's native replace-all.
    - otherwise → first-match-only, built from regexp_instr/extract
      splitting (prefix + replaced-first-match + untouched rest), all
      JVM expressions. Group backreferences ($1/\\1) are applied by
      re-running the anchored pattern on the extracted match.
    - ``i`` in flags → case-insensitive via an inline ``(?i)``.

    PG backreference spelling ``\\1`` is translated to Spark's ``$1``.
    """
    s = _col(s)
    pat = pattern
    if "i" in flags.replace("g", ""):
        pat = f"(?i:{pat})"
    repl = _pg_repl_to_java(replacement)
    if "g" in flags:
        return F.regexp_replace(s, pat, repl)
    # group 0 = whole match: wrapping the pattern in a new capturing
    # group would shift group numbers and break patterns containing
    # their own backreferences (e.g. '(\\w)\\1')
    matched = F.regexp_extract(s, pat, 0)
    # position of the first match (1-based; 0 = no match)
    pos = F.call_function("regexp_instr", s, F.lit(pat))
    prefix = F.substring(s, F.lit(1), pos - 1)
    rest = F.substring(s, pos + F.length(matched), F.length(s))
    # apply backreferences by replacing within the matched text only,
    # anchored (non-capturing, so internal group numbering is
    # preserved) so the groups bind exactly as they did in context
    replaced = F.regexp_replace(matched, f"^(?:{pat})$", repl)
    return F.when(pos == 0, s).otherwise(F.concat(prefix, replaced, rest))
