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
    # PG propagates NULL arguments to a NULL result; F.greatest SKIPS
    # nulls (greatest(NULL, 1) = 1), so guard explicitly (r15 review).
    if length is None:
        res = F.substring(s, eff_start, F.lit(2147483647))
        return F.when(start_c.isNull(), F.lit(None).cast("string")).otherwise(res)
    length_c = F.lit(length) if isinstance(length, int) else length
    # chars "consumed" left of position 1: max(1 - start, 0)
    eff_len = F.greatest(length_c - F.greatest(F.lit(1) - start_c, F.lit(0)), F.lit(0))
    res = F.substring(s, eff_start, eff_len)
    return F.when(
        start_c.isNull() | length_c.isNull(), F.lit(None).cast("string")
    ).otherwise(res)


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
    # PG decades start at year XXX0; centuries/millennia at XX01. Build
    # the result by subtracting whole years from date_trunc('year') so
    # the output TYPE matches the input (timestamp stays timestamp,
    # ntz stays ntz) — make_timestamp_ntz forced every long field to
    # NTZ while the Spark-native fields kept the input type, and the
    # two branches then wouldn't union/compare (r15 review). pmod keeps
    # the floor convention for BC years.
    if f == "decade":
        years_back = F.pmod(y, 10)
    elif f == "century":
        years_back = F.pmod(y - 1, 100)
    elif f == "millennium":
        years_back = F.pmod(y - 1, 1000)
    else:
        raise ValueError(f"unsupported date_trunc field: {field}")
    zero = F.lit(0)
    return F.date_trunc("year", ts) - F.make_interval(
        years_back.cast("int"), zero, zero, zero, zero, zero, F.lit(0)
    )


# ---------------------------------------------------------------------------
# to_char: PG format-string → Spark date_format pattern compiler
# ---------------------------------------------------------------------------

# Specifier table, ordered longest-first so greedy scanning picks the
# longest match, exactly like the reference's FormatSpecifierMappings
# table (pg_lake_engine/src/pgduck/to_char.c:30-60) which compiles PG
# to_char patterns to DuckDB strftime. Each entry is
# (pg_spec, kind, payload):
#   kind "j"  — Java DateTimeFormatter fragment; payload = (padded,
#               fill-mode variant or None)
#   kind "fn" — not expressible as a Java pattern (Spark refuses the
#               week-based Java fields, and PG's case-variant text
#               fields need post-casing); payload = a builder key in
#               _TO_CHAR_FNS. pg_to_char stitches these as computed
#               Column segments between date_format chunks.
# Numeric fields accept PG's lowercase spellings (PG treats the case of
# numeric templates as irrelevant; only TEXT templates carry case).
_TO_CHAR_SPECS: list[tuple[str, str, object]] = [
    ("HH24", "j", ("HH", "H")),
    ("hh24", "j", ("HH", "H")),
    ("HH12", "j", ("hh", "h")),
    ("hh12", "j", ("hh", "h")),
    ("SSSS", "fn", "ssss"),
    ("ssss", "fn", "ssss"),
    ("YYYY", "j", ("yyyy", "yyyy")),
    ("yyyy", "j", ("yyyy", "yyyy")),
    ("Y,YYY", "fn", "year_comma"),
    ("y,yyy", "fn", "year_comma"),
    ("IYYY", "fn", "iso_year"),
    ("YYY", "j", ("yyy", "yyy")),
    ("yyy", "j", ("yyy", "yyy")),
    ("MONTH", "fn", "month_upper"),
    ("Month", "j", ("MMMM", None)),
    ("month", "fn", "month_lower"),
    ("MON", "fn", "mon_upper"),
    ("Mon", "j", ("MMM", None)),
    ("mon", "fn", "mon_lower"),
    ("DAY", "fn", "day_upper"),
    ("Day", "j", ("EEEE", None)),
    ("day", "fn", "day_lower"),
    ("DDD", "j", ("DDD", "D")),
    ("ddd", "j", ("DDD", "D")),
    ("DY", "fn", "dy_upper"),
    ("Dy", "j", ("EEE", None)),
    ("dy", "fn", "dy_lower"),
    ("YY", "j", ("yy", "yy")),
    ("yy", "j", ("yy", "yy")),
    ("MM", "j", ("MM", "M")),
    ("mm", "j", ("MM", "M")),
    ("DD", "j", ("dd", "d")),
    ("dd", "j", ("dd", "d")),
    ("HH", "j", ("hh", "h")),
    ("hh", "j", ("hh", "h")),
    ("MI", "j", ("mm", "m")),
    ("mi", "j", ("mm", "m")),
    ("SS", "j", ("ss", "s")),
    ("ss", "j", ("ss", "s")),
    ("MS", "j", ("SSS", None)),
    ("ms", "j", ("SSS", None)),
    ("US", "j", ("SSSSSS", None)),
    ("us", "j", ("SSSSSS", None)),
    ("AM", "j", ("a", None)),
    ("PM", "j", ("a", None)),
    ("am", "fn", "ampm_lower"),
    ("pm", "fn", "ampm_lower"),
    ("TZ", "j", ("zz", None)),
    ("tz", "fn", "tz_lower"),
    ("IW", "fn", "iso_week"),
    ("ID", "fn", "iso_dow"),
    ("WW", "fn", "week_of_year"),
    ("ww", "fn", "week_of_year"),
    ("CC", "fn", "century"),
    ("cc", "fn", "century"),
    ("Q", "j", ("Q", None)),
    ("q", "j", ("Q", None)),
    ("W", "fn", "week_of_month"),
    ("w", "fn", "week_of_month"),
    ("J", "fn", "julian_day"),
    ("j", "fn", "julian_day"),
    ("Y", "j", ("y", "y")),
    ("y", "j", ("y", "y")),
    ("D", "fn", "pg_dow"),
    ("d", "fn", "pg_dow"),
]

# PG week-of-year WW = 1 + (doy-1)/7; W = week of month 1 + (dom-1)/7;
# D = Sunday-1 day of week; J = days since the Julian epoch (unix epoch
# = JD 2440588); CC = PG century (2001 → 21). ISO fields use Spark's
# own ISO weekofyear / weekday and the year-of-the-week's-Thursday rule.
_TO_CHAR_FNS = {
    "month_upper": lambda ts: F.upper(F.date_format(ts, "MMMM")),
    "month_lower": lambda ts: F.lower(F.date_format(ts, "MMMM")),
    "mon_upper": lambda ts: F.upper(F.date_format(ts, "MMM")),
    "mon_lower": lambda ts: F.lower(F.date_format(ts, "MMM")),
    "day_upper": lambda ts: F.upper(F.date_format(ts, "EEEE")),
    "day_lower": lambda ts: F.lower(F.date_format(ts, "EEEE")),
    "dy_upper": lambda ts: F.upper(F.date_format(ts, "EEE")),
    "dy_lower": lambda ts: F.lower(F.date_format(ts, "EEE")),
    "ampm_lower": lambda ts: F.lower(F.date_format(ts, "a")),
    "tz_lower": lambda ts: F.lower(F.date_format(ts, "zz")),
    "ssss": lambda ts: (
        (
            F.unix_micros(ts.cast("timestamp"))
            - F.unix_micros(F.date_trunc("day", ts.cast("timestamp")))
        )
        / 1_000_000
    )
    .cast("bigint")
    .cast("string"),
    "week_of_year": lambda ts: F.lpad(
        ((F.dayofyear(ts) - 1) / 7 + 1).cast("int").cast("string"), 2, "0"
    ),
    "week_of_year_fm": lambda ts: ((F.dayofyear(ts) - 1) / 7 + 1)
    .cast("int")
    .cast("string"),
    "week_of_month": lambda ts: ((F.dayofmonth(ts) - 1) / 7 + 1)
    .cast("int")
    .cast("string"),
    "pg_dow": lambda ts: F.dayofweek(ts).cast("string"),
    "julian_day": lambda ts: (
        F.datediff(ts.cast("date"), F.lit("1970-01-01").cast("date")) + 2440588
    ).cast("string"),
    "century": lambda ts: (F.ceil(F.year(ts) / 100)).cast("int").cast("string"),
    "year_comma": lambda ts: F.concat(
        F.floor(F.year(ts) / 1000).cast("string"),
        F.lit(","),
        F.lpad(F.pmod(F.year(ts), 1000).cast("string"), 3, "0"),
    ),
    "iso_week": lambda ts: F.lpad(F.weekofyear(ts).cast("string"), 2, "0"),
    "iso_week_fm": lambda ts: F.weekofyear(ts).cast("string"),
    "iso_dow": lambda ts: (F.weekday(ts) + 1).cast("string"),
    "iso_year": lambda ts: F.year(
        F.date_add(ts.cast("date"), 4 - (F.weekday(ts) + 1))
    ).cast("string"),
}


def _to_char_segments(pg_fmt: str) -> list[tuple[str, str]]:
    """Scan a PG to_char pattern into ('j', java-fragment) and
    ('fn', builder-key) segments; adjacent java fragments merge.
    Unrecognized characters are literals (PG: 'any text not a template
    pattern is simply copied verbatim'); the FM prefix selects the
    fill-mode (unpadded) variant of the following template."""
    segs: list[tuple[str, str]] = []

    def emit_java(fragment: str) -> None:
        if segs and segs[-1][0] == "j":
            segs[-1] = ("j", segs[-1][1] + fragment)
        else:
            segs.append(("j", fragment))

    i, n = 0, len(pg_fmt)
    fm = False
    while i < n:
        ch = pg_fmt[i]
        if ch == '"':  # PG quoted literal: "..." → Java quoted literal '...'
            j = pg_fmt.find('"', i + 1)
            j = n if j < 0 else j
            lit = pg_fmt[i + 1 : j].replace("'", "''")
            emit_java(f"'{lit}'")
            i = j + 1
            continue
        if pg_fmt.startswith(("FM", "fm"), i):
            fm = True
            i += 2
            continue
        matched = False
        for pg_spec, kind, payload in _TO_CHAR_SPECS:
            if pg_fmt.startswith(pg_spec, i):
                if kind == "j":
                    padded, fill = payload
                    emit_java(fill if (fm and fill) else padded)
                else:
                    key = str(payload)
                    if fm and key + "_fm" in _TO_CHAR_FNS:
                        key += "_fm"
                    segs.append(("fn", key))
                fm = False
                i += len(pg_spec)
                matched = True
                break
        if not matched:
            if ch.isalpha():
                emit_java(f"'{ch}'")  # bare letters are literals in Java patterns
            elif ch == "'":
                emit_java("''")  # a bare apostrophe must be doubled for Java
            else:
                emit_java(ch)
            i += 1
    return segs


def translate_to_char_pattern(pg_fmt: str) -> str:
    """Compile a PG to_char pattern into ONE Java DateTimeFormatter
    pattern. Raises for specifiers with no Java equivalent (WW, SSSS,
    Y,YYY, J, the case-variant text fields, …) — callers that can
    stitch computed segments use :func:`_to_char_segments` instead
    (pg_to_char does); parsers (to_date/to_timestamp) cannot."""
    segs = _to_char_segments(pg_fmt)
    bad = [key for kind, key in segs if kind == "fn"]
    if bad:
        raise NotImplementedError(
            f"to_char specifier(s) {bad} have no Java DateTimeFormatter "
            "equivalent usable for parsing"
        )
    return "".join(fragment for _, fragment in segs)


# Case-variant text fields render differently (upper/lower) but PARSE
# identically — Spark's formatter is built parseCaseInsensitive, so
# '15 JAN 2024' and '15 jan 2024' both read through 'MMM' (verified on
# 4.1). Day-of-week fields are absent: Spark >= 3.0 refuses E/EEEE for
# parsing outright, so DAY/DY still raise (r15 self-review — 'MON' et
# al. regressed to plan-time NotImplementedError when to_char became a
# segment compiler, though they had always parsed fine).
_PARSE_FALLBACK = {
    "month_upper": "MMMM",
    "month_lower": "MMMM",
    "mon_upper": "MMM",
    "mon_lower": "MMM",
    "ampm_lower": "a",
    "tz_lower": "zz",
}


def _translate_parse_pattern(pg_fmt: str) -> str:
    """Java pattern for the PARSE direction (to_date/to_timestamp):
    like :func:`translate_to_char_pattern`, but case-variant text
    fields fall back to their Java text pattern."""
    segs = _to_char_segments(pg_fmt)
    out, bad = [], []
    for kind, frag in segs:
        if kind == "j":
            out.append(frag)
        elif frag in _PARSE_FALLBACK:
            out.append(_PARSE_FALLBACK[frag])
        else:
            bad.append(frag)
    if bad:
        raise NotImplementedError(
            f"to_char specifier(s) {bad} have no Java DateTimeFormatter "
            "equivalent usable for parsing"
        )
    return "".join(out)


def pg_to_char(ts: Column | str, pg_fmt: str) -> Column:
    """PG ``to_char(timestamp, fmt)`` via pattern compilation.

    Reference: to_char.c is a 1,378-LoC PG→DuckDB-strftime compiler; this
    is the same idea targeting Java DateTimeFormatter. The compilation
    runs at plan-construction time (driver side); Java-expressible runs
    become plain ``date_format`` calls and the rest (WW/SSSS/Y,YYY/J/
    case-variant text fields/FM) become computed Column segments —
    everything stays codegen'd, no UDF. Remaining documented delta: PG
    blank-pads MONTH/Day/… to 9 chars; this renders them unpadded.
    """
    c = _col(ts)
    segs = _to_char_segments(pg_fmt)
    if not segs:
        return F.lit("")
    cols = [
        F.date_format(c, payload) if kind == "j" else _TO_CHAR_FNS[payload](c)
        for kind, payload in segs
    ]
    return cols[0] if len(cols) == 1 else F.concat(*cols)


def pg_to_date(s: Column | str, pg_fmt: str) -> Column:
    """PG ``to_date(text, fmt)`` — the same pattern compiler as
    :func:`pg_to_char` driving ``to_date`` (reference:
    pg_lake_to_date in the engine's PG-compat function set). Plain
    codegen'd expression, no UDF. Computed-only specifiers (WW, SSSS,
    …) raise: they cannot drive a parser; case-variant text fields
    (MON, month, …) parse fine — Spark's parser is case-insensitive."""
    return F.to_date(_col(s), _translate_parse_pattern(pg_fmt))


def pg_to_timestamp(s: Column | str, pg_fmt: str) -> Column:
    """PG ``to_timestamp(text, fmt)`` via the shared pattern compiler."""
    return F.to_timestamp(_col(s), _translate_parse_pattern(pg_fmt))


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
    """Render micros-since-midnight in the PG text form: ``HH:MM:SS``
    for whole seconds, else ``HH:MM:SS.ffffff`` with trailing zeros
    trimmed (PG prints TIME '12:34:56' without a fraction and
    '12:34:56.120000' as '12:34:56.12' — always emitting six digits
    mismatched every whole-second value, r15 review)."""
    m = _col(micros).cast("bigint")
    h = (m / 3600000000).cast("bigint")
    mi = ((m % 3600000000) / 60000000).cast("bigint")
    s = ((m % 60000000) / 1000000).cast("bigint")
    us = m % 1000000
    base = F.format_string("%02d:%02d:%02d", h, mi, s)
    frac = F.regexp_replace(F.format_string("%06d", us), "0+$", "")
    return F.when(us == 0, base).otherwise(F.concat(base, F.lit("."), frac))


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
    # lower() BEFORE rstrip('s'): 'SECONDS'.rstrip('s') strips nothing,
    # rejecting the valid all-caps PG interval spelling (r15 review)
    unit = unit.lower().rstrip("s")
    if unit not in _UNIT_MICROS:
        raise ValueError(f"date_bin stride unit must be fixed-width, got {unit!r}")
    n = int(n_str)
    if n <= 0:
        # PG: "stride must be greater than zero"; unchecked, 0 hit a
        # mid-query DIVIDE_BY_ZERO and negatives silently mis-binned
        raise ValueError(f"date_bin stride must be greater than zero, got {n}")
    stride_us = n * _UNIT_MICROS[unit]
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


def _has_pg_backref(replacement: str) -> bool:
    """True when the PG replacement text contains a real group
    backreference (``\\1``-``\\9``) or whole-match escape (``\\&``).

    A sequential escape-pair scan, not a lookbehind regex: in
    ``'\\\\\\1'`` (literal backslash, then backref) the lookbehind
    ``(?<!\\\\)`` saw the second backslash of the ESCAPED pair as an
    escape prefix and missed the backref (r15 self-review)."""
    i, n = 0, len(replacement)
    while i < n - 1:
        if replacement[i] == "\\":
            nxt = replacement[i + 1]
            if nxt.isdigit() or nxt == "&":
                return True
            i += 2  # an escape pair (\\, \x, …) consumes both chars
        else:
            i += 1
    return False


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
            elif nxt == "&":
                out.append("$0")  # PG \& = insert the whole match
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
    # First-match-only surgery. Group 0 = whole match: wrapping the
    # pattern in a new capturing group would shift group numbers and
    # break patterns containing their own backreferences ('(\\w)\\1').
    matched = F.regexp_extract(s, pat, 0)
    # position of the first match (1-based; 0 = no match) — computed on
    # the FULL string, so lookbehind/lookahead see their real context
    pos = F.call_function("regexp_instr", s, F.lit(pat))
    prefix = F.substring(s, F.lit(1), pos - 1)
    rest = F.substring(s, pos + F.length(matched), F.length(s))
    has_backref = _has_pg_backref(replacement)
    if not has_backref:
        # literal replacement: splice the text directly — correct for
        # every pattern feature including lookbehind (the r15 review:
        # re-matching the pattern on the EXTRACTED text loses context,
        # so 'a(?=b)' / '(?<=x)y' silently failed to replace)
        literal = re.sub(r"\\(.)", r"\1", replacement)
        return F.when(pos == 0, s).otherwise(F.concat(prefix, F.lit(literal), rest))
    if "(?<=" in pat or "(?<!" in pat:
        raise NotImplementedError(
            "pg_regexp_replace without the 'g' flag cannot combine "
            "lookbehind with group backreferences (the anchored group "
            "re-bind would run without the lookbehind context)"
        )
    # backreferences: re-run the pattern anchored at the start of the
    # TAIL (match + everything after), so lookahead still sees its
    # following context; groups re-bind exactly as they did in place
    tail = F.substring(s, pos, F.lit(2147483647))
    replaced_tail = F.regexp_replace(tail, f"^(?:{pat})", repl)
    return F.when(pos == 0, s).otherwise(F.concat(prefix, replaced_tail))
