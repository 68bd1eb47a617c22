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


def copy_to(
    df: DataFrame,
    url: str,
    fmt: str = "parquet",
    *,
    compression: str = "snappy",
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
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported COPY format: {fmt} (use one of {sorted(_FORMATS)})")
    if compression not in _COMPRESSION[fmt]:
        raise ValueError(f"compression {compression!r} unsupported for {fmt}")

    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        writer = writer.option(k, str(v))
    getattr(writer, fmt)(url)
