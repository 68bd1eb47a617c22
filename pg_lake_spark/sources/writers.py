"""COPY TO/FROM equivalents: query-result export in lake formats.

Reference parity: pg_lake_copy (ProcessPgLakeCopyTo, copy.c:815 →
DuckDB ``COPY (query) TO url``; WriteQueryResultTo, write_data.c:121).
Spark analogue is ``df.write`` with format/compression options; this
module adds the reference's option validation and single-file mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FORMATS = {"parquet", "csv", "json"}
_COMPRESSION = {
    "parquet": {"none", "snappy", "gzip", "zstd", "lz4"},
    "csv": {"none", "gzip", "bzip2", "lz4", "deflate"},
    "json": {"none", "gzip", "bzip2", "lz4", "deflate"},
}

# PG COPY option surface → Spark reader/writer option names, per format
# (copy.c FindCopyToReadOptions:1045, FindCopyFromWriteOptions:737).
# A mapping to None means "accepted, no Spark translation needed":
# null_padding is Spark CSV's PERMISSIVE default (short rows pad with
# NULL), auto_detect is the sniffing default, freeze is a Postgres heap
# hint with no lake meaning. Unknown options raise, mirroring the
# reference's `invalid option "%s" for COPY <verb> with <fmt> format`.
_PG_CSV_COMMON = {
    "header": "header",
    "quote": "quote",
    "escape": "escape",
    "delimiter": "sep",
    "null": "nullValue",
    # DuckDB COPY dateformat/timestampformat (strftime codes) → Spark
    # Java patterns; translated in translate_copy_options
    "date_format": "dateFormat",
    "timestamp_format": "timestampFormat",
}

#: strftime → Java DateTimeFormatter (the subset DuckDB's COPY docs use)
_STRFTIME_TO_JAVA = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd",
    "H": "HH", "I": "hh", "M": "mm", "S": "ss",
    "f": "SSSSSS", "g": "SSS", "p": "a", "j": "DDD",
}


def pg_bool(v, default: bool = False) -> bool:
    """PG ``parse_bool`` semantics (bool.c): unique prefixes of
    true/false/yes/no, exact 'on', 'of'/'off', '1'/'0' — any case,
    surrounding whitespace ignored. Shared by the DDL option coercion
    and direct copy_to callers so header='off' means the same thing on
    both paths (pre-r14, copy_to treated only 'false' as false).
    An unrecognized spelling RAISES like PG's "invalid input syntax
    for type boolean" instead of silently becoming False."""
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("1", "on"):
        return True
    if s == "0" or (s and "off".startswith(s) and s != "o"):
        return False
    for word, val in (("true", True), ("false", False), ("yes", True), ("no", False)):
        if s and word.startswith(s):
            return val
    raise ValueError(f"invalid input syntax for type boolean: {v!r}")


def strftime_to_java(fmt: str) -> str:
    """Left-to-right scan so '%%' is consumed as one token (a literal
    '%', which must be single-quoted for DateTimeFormatter) and never
    half-eaten by a code replacement ('%%S' is literal-% then seconds,
    not '%' + '%S')."""
    out: list[str] = []
    lit: list[str] = []  # pending literal run, flushed as ONE quoted chunk

    def flush() -> None:
        if lit:
            run = "".join(lit)
            # Letters (pattern chars to Java), %, and DateTimeFormatter's
            # reserved punctuation ([ ] start/end an optional section;
            # # { } are reserved and throw) must be quoted; other
            # punctuation can stay bare. Embedded quotes escape as ''.
            if any(c.isalpha() or c in "%'[]#{}" for c in run):
                out.append("'" + run.replace("'", "''") + "'")
            else:
                out.append(run)
            lit.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch != "%":
            lit.append(ch)
            i += 1
            continue
        if i + 1 >= len(fmt):
            raise ValueError(f"trailing '%' in {fmt!r}")
        code = fmt[i + 1]
        if code == "%":
            lit.append("%")
        elif code in _STRFTIME_TO_JAVA:
            flush()
            out.append(_STRFTIME_TO_JAVA[code])
        else:
            raise ValueError(f"unsupported strftime code %{code} in {fmt!r}")
        i += 2
    flush()
    return "".join(out)
_COPY_TO_OPTS: dict[str, dict[str, str | None]] = {
    "csv": {**_PG_CSV_COMMON, "force_quote": "quoteAll"},
    "parquet": {},
    "json": {},
}
_COPY_FROM_OPTS: dict[str, dict[str, str | None]] = {
    "csv": {
        **_PG_CSV_COMMON,
        "null_padding": None,
        "auto_detect": None,
        "freeze": None,
    },
    "parquet": {"freeze": None},
    "json": {"maximum_object_size": None, "freeze": None},
}


def translate_copy_options(
    fmt: str, options: dict, *, verb: str
) -> dict[str, str]:
    """Validate PG COPY options for ``fmt`` and translate to Spark names.

    ``verb`` is ``"TO"`` or ``"FROM"`` (the two sides accept different
    sets, e.g. force_quote is TO-only, null_padding FROM-only)."""
    table = (_COPY_TO_OPTS if verb == "TO" else _COPY_FROM_OPTS)[fmt]
    out: dict[str, str] = {}
    for k, v in options.items():
        if k not in table:
            raise ValueError(
                f"invalid option {k!r} for COPY {verb} with {fmt} format"
            )
        spark_key = table[k]
        if spark_key is None:
            continue
        if k in ("date_format", "timestamp_format"):
            v = strftime_to_java(str(v))
        if k == "header":
            # PG spellings ('on'/'off'/'1'...) must not reach Spark's
            # CSV option parser, which only accepts true/false
            v = pg_bool(v, default=True)
        if k == "force_quote":
            # '*'/True → Spark's quoteAll; a column list is handled by
            # copy_to's manual quoting pass (popped before we get here).
            if v not in ("*", True):
                raise NotImplementedError(
                    "force_quote takes '*' or a column list (list/tuple)"
                )
            v = True
        out[spark_key] = str(v).lower() if isinstance(v, bool) else str(v)
    return out


#: Delimiter handed to the CSV writer on the force-quote path: it never
#: occurs in the (single, pre-formatted) output column, so univocity's
#: own needs-quoting detection can never fire.
_FQ_WRITER_DELIM = "\x01"


def _force_quote_lines(
    df: DataFrame,
    cols: list[str],
    *,
    quote: str = '"',
    sep: str = ",",
    null_marker: str = "",
    escape: str | None = None,
    date_fmt: str | None = None,
    ts_fmt: str | None = None,
) -> DataFrame:
    """PG ``FORCE_QUOTE (col, ...)`` semantics, built JVM-side.

    Spark's CSV writer quotes all-or-nothing (and re-quotes anything
    containing the separator even when told not to), so per-column
    forcing is done in the plan: each column is cast to string; forced
    columns are always wrapped in quotes (embedded quotes doubled per
    CSV), others only when they need it (separator / quote / newline)
    or when equal to the null marker (PG quotes values that would
    otherwise read back as NULL — e.g. empty strings under the default
    marker); NULLs become the marker unquoted (FORCE_QUOTE does not
    apply to NULLs).
    The fields then concatenate into ONE line column whose NAME is the
    CSV header line, and the caller writes it with a delimiter that
    cannot appear — whole-stage-codegen string exprs end to end.
    """
    import re as _re

    from pyspark.sql import functions as F

    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"force_quote columns not in result: {missing}")
    needs = "[" + _re.escape(sep + quote) + "\r\n]"
    dtypes = dict(df.dtypes)
    # PG CopyAttributeOutCSV: inside a quoted field, any char equal to
    # QUOTE or ESCAPE is preceded by ESCAPE; the default ESCAPE is the
    # quote char itself, which degenerates to quote-doubling. Ignoring
    # a declared ESCAPE here wrote doubled quotes a '\\'-configured
    # reader misparses (r15 review).
    esc = escape if escape else quote

    def field(name: str) -> "F.Column":
        # honor the statement's DATE_FORMAT/TIMESTAMP_FORMAT here: the
        # writer's dateFormat option acts on date/timestamp COLUMNS and
        # this path hands it pre-formatted strings
        dt = dtypes.get(name, "")
        if date_fmt and dt == "date":
            c = F.date_format(F.col(name), date_fmt)
        elif ts_fmt and dt.startswith("timestamp"):
            c = F.date_format(F.col(name), ts_fmt)
        else:
            c = F.col(name).cast("string")
        body = c
        if esc != quote:
            body = F.replace(body, F.lit(esc), F.lit(esc + esc))
        body = F.replace(body, F.lit(quote), F.lit(esc + quote))
        quoted = F.concat(F.lit(quote), body, F.lit(quote))
        if name in cols:
            v = quoted
        else:
            v = F.when(c.rlike(needs) | (c == null_marker), quoted).otherwise(c)
        return F.coalesce(v, F.lit(null_marker))

    def header_field(name: str) -> str:
        if _re.search(needs, name):
            body = name.replace(esc, esc + esc) if esc != quote else name
            return quote + body.replace(quote, esc + quote) + quote
        return name

    header = sep.join(header_field(n) for n in df.columns)
    return df.select(F.concat_ws(sep, *[field(n) for n in df.columns]).alias(header))


def copy_to(
    df: DataFrame,
    url: str,
    fmt: str = "parquet",
    *,
    compression: str | None = None,
    single_file: bool = False,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """``COPY (query) TO 'url' (FORMAT fmt, COMPRESSION c)``.

    ``single_file`` coalesces to one output file (the reference's COPY
    always writes one object per URL) — only sensible for small results;
    the scalable default keeps one file per partition.
    ``partition_by`` gives hive-style directory partitioning (the COPY
    PARTITION_BY analogue).
    """
    fmt = fmt.lower()
    if fmt in ("fgb", "flatgeobuf"):
        # geo export: single-object vector file (the reference's GDAL
        # COPY TO writes one file too). Frames are encoded executor-side
        # and streamed to the file — no driver-side collect of raw rows.
        # Options the single-object format cannot honor refuse loudly
        # (the module's raise-on-unsupported rule), never drop silently.
        if partition_by or mode != "overwrite" or single_file is not False:
            raise ValueError(
                "FlatGeobuf COPY TO writes one object: partition_by / "
                "mode / single_file are not supported"
            )
        if compression not in (None, "none"):
            raise ValueError(f"compression {compression!r} unsupported for {fmt}")
        from pg_lake_spark.sources.flatgeobuf import write_flatgeobuf_df

        geom_col = options.pop("geometry", "geometry")
        write_flatgeobuf_df(df, url, geom_col=geom_col, **options)
        return
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported COPY format: {fmt} (use one of {sorted(_FORMATS)})")
    if compression is None:
        # per-format default: PG/DuckDB COPY TO writes text formats
        # uncompressed; parquet keeps its container default
        compression = "snappy" if fmt == "parquet" else "none"
    if compression not in _COMPRESSION[fmt]:
        raise ValueError(f"compression {compression!r} unsupported for {fmt}")

    if fmt == "csv":
        options.setdefault("header", True)
        if not options.get("timestamp_format"):
            # Spark's CSV default writes ISO 'T' at millisecond
            # precision — silently truncating microseconds and
            # diverging from the reference's 'YYYY-MM-DD HH:MM:SS[.ffffff]'
            # (fraction omitted when zero). No Java pattern renders the
            # conditional fraction, but Spark's timestamp→string CAST
            # does exactly PG/DuckDB text form — pre-cast the columns
            # so both the plain and force_quote paths emit it.
            from pyspark.sql import functions as F

            for name, dt in df.dtypes:
                if dt.startswith("timestamp"):
                    df = df.withColumn(name, F.col(name).cast("string"))
    force_cols = None
    if isinstance(options.get("force_quote"), (list, tuple)):
        if fmt != "csv":
            raise ValueError(f"invalid option 'force_quote' for COPY TO with {fmt} format")
        if partition_by:
            raise ValueError("force_quote column list cannot combine with partition_by")
        force_cols = list(options.pop("force_quote"))
    spark_opts = translate_copy_options(fmt, options, verb="TO")
    if force_cols is not None:
        # The pre-formatted lines go through the TEXT writer, not the
        # CSV writer: univocity re-inspects values and NUL-wraps any
        # line containing its delimiter or a newline (a quoted field
        # with an embedded \n is legal CSV and hit this), corrupting
        # the output. text() emits each line verbatim; the header is
        # injected per partition (CSV-writer parity) via an Arrow pass.
        lines = _force_quote_lines(
            df,
            force_cols,
            quote=str(options.get("quote", '"')),
            sep=str(options.get("delimiter", ",")),
            null_marker=str(options.get("null", "")),
            escape=(str(options["escape"]) if options.get("escape") else None),
            date_fmt=spark_opts.get("dateFormat"),
            ts_fmt=spark_opts.get("timestampFormat"),
        )
        header_line = lines.columns[0]
        data = lines.toDF("value")
        if single_file:
            data = data.coalesce(1)
        if pg_bool(options.get("header"), default=True):

            def _with_header(batches):
                import pandas as pd

                first = True
                for pdf in batches:
                    if first:
                        first = False
                        yield pd.DataFrame({"value": [header_line]})
                    yield pdf

            data = data.mapInPandas(_with_header, "value string")
        data.write.mode(mode).option("compression", compression).text(url)
        return
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in spark_opts.items():
        writer = writer.option(k, v)
    getattr(writer, fmt)(url)


def copy_from(
    spark,
    url: str,
    table,
    fmt: str = "csv",
    **options,
):
    """``COPY t FROM 'url'`` — import lake files into a LakeTable.

    Reference parity: ProcessPgLakeCopyFrom (pg_lake_copy/src/copy/
    copy.c:390) — the pushdown path reads the URL in the engine and
    lands Parquet + a snapshot commit in one statement. Here that is a
    ``read_lake`` (schema inference / CSV sniffing included) followed
    by ``LakeTable.append``; column order is aligned to the table
    schema by name.

    Returns the commit snapshot.
    """
    from pg_lake_spark.sources import readers

    fmt = fmt.lower()
    if fmt not in _COPY_FROM_OPTS:
        raise ValueError(
            f"unsupported COPY FROM format: {fmt} "
            f"(use one of {sorted(_COPY_FROM_OPTS)})"
        )
    # Same PG-option surface as COPY TO: validate + translate (e.g.
    # null → nullValue so NULL markers don't load as literal strings;
    # unknown FROM options raise like the reference's copy.c errors).
    spark_opts = translate_copy_options(fmt, options, verb="FROM")
    df = readers.read_lake(spark, url, fmt=fmt, **spark_opts)
    from pyspark.sql import functions as F

    from pg_lake_spark.lakehouse.table import ddl_field_names

    target_cols = ddl_field_names(table.metadata.schema_ddl)
    # case-insensitive like Spark's own resolution (and PG's folding):
    # a CSV header of 'ID,NAME' loads into (id, name)
    by_fold = {c.lower(): c for c in df.columns}
    missing = [c for c in target_cols if c.lower() not in by_fold]
    if missing:
        raise ValueError(f"COPY FROM source lacks table columns: {missing}")
    # PG raises 'extra data after last expected column'; silently
    # dropping a source column loses data without a whisper (r15
    # review) — the asymmetric twin of the missing-columns check above.
    target_fold = {c.lower() for c in target_cols}
    extra = [c for c in df.columns if c.lower() not in target_fold]
    if extra:
        raise ValueError(
            f"COPY FROM source has columns not in the table: {extra} "
            "(project them away in the source query to import anyway)"
        )
    aligned = df.select(
        *[F.col(by_fold[c.lower()]).alias(c) for c in target_cols]
    )
    return table.append(aligned)
