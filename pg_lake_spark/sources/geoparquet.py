"""GeoParquet detection and export (spec v1.1, WKB encoding).

Reference parity:
- detection: pg_lake_table/src/describe/describe.c:225 reads the
  parquet footer's ``geo`` key-value metadata to type geometry columns;
- export: pg_lake_engine/src/parquet/geoparquet.c builds the ``geo``
  document (version/primary_column/columns{encoding,geometry_types,
  bbox}) when COPY TO writes geometry columns.

Spark-side split of labor: the DATA path is plain parquet (geometry is
an opaque WKB ``binary`` column, readable by every ``st_*`` function in
``functions/spatial.py`` with zero conversion — exactly why GeoParquet
chose WKB); only the FOOTER metadata needs special handling, which
parquet-level tooling (pyarrow) does per file. ``attach_geo_metadata``
computes per-column geometry_types + bbox with a distributed Spark agg,
then rewrites each part file with the ``geo`` footer (a parquet footer
trails the data, so a true in-place patch is impossible — the rewrite
is per-file and embarrassingly parallel: driver loop here; move the
same function into ``mapPartitions`` over the file list on a cluster).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_KEY = b"geo"


def _parquet_parts(path: str) -> list[str]:
    """All part files under a dataset root, recursive — hive-partitioned
    layouts keep their parts in key=value subdirectories."""
    out = []
    for root, dirs, names in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for n in sorted(names):
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                out.append(os.path.join(root, n))
    return sorted(out)


def geo_metadata(path: str) -> dict | None:
    """The parquet footer's ``geo`` document, or None (describe.c:225).

    ``path``: a parquet file or a directory of part files (first part
    wins — spec says all files of a dataset carry the same document).
    """
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        parts = _parquet_parts(path)
        if not parts:
            return None
        target = parts[0]
    md = pq.read_schema(target).metadata or {}
    raw = md.get(GEO_KEY)
    return json.loads(raw.decode("utf-8")) if raw else None


def read_geoparquet(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Scan a GeoParquet dataset; returns ``(df, geo)`` where ``geo`` is
    the footer document. Validates the primary column uses WKB encoding
    (the only encoding this engine — and the reference — ships) so a
    native-arrays GeoParquet fails loudly instead of yielding garbage
    bytes to ``st_*`` kernels."""
    geo = geo_metadata(path)
    if geo is None:
        raise ValueError(f"no GeoParquet 'geo' footer metadata under {path}")
    for col, spec in (geo.get("columns") or {}).items():
        enc = spec.get("encoding")
        if enc != "WKB":
            raise NotImplementedError(
                f"GeoParquet column {col!r} uses encoding {enc!r}; only WKB is supported"
            )
    return spark.read.parquet(path), geo


def with_bbox_covering(df: DataFrame, geometry_col: str, covering_col: str | None = None) -> DataFrame:
    """Add the spec v1.1 ``covering`` bbox column for a geometry column.

    The bbox struct (xmin/ymin/xmax/ymax doubles) is a NATIVE parquet
    column, so its per-row-group min/max statistics give bbox predicates
    (``bbox_intersects``/``bbox_contains_point`` over the covering
    column) parquet-level row-group pruning — the reference's GeoParquet
    bbox trick (describe.c:225): spatial filters prune I/O without the
    engine understanding WKB at scan time. Pass the covering name to
    :func:`attach_geo_metadata` so readers discover it from the footer.
    """
    from pg_lake_spark.functions import spatial as S

    return df.withColumn(covering_col or f"{geometry_col}_bbox", S.st_envelope(F.col(geometry_col)))


def attach_geo_metadata(
    spark: SparkSession,
    path: str,
    geometry_cols: list[str],
    *,
    version: str = "1.1.0",
    covering: dict[str, str] | None = None,
) -> dict:
    """Turn a written parquet dataset into GeoParquet: compute each
    geometry column's geometry_types + bbox (one distributed aggregate
    over st_envelope/st_geometrytype) and patch the ``geo`` document
    into every part file's footer. Returns the document."""
    import pyarrow.parquet as pq

    from pg_lake_spark.functions import spatial as S

    if not geometry_cols:
        raise ValueError("geometry_cols must name at least one WKB column")
    df = spark.read.parquet(path)
    aggs = []
    for c in geometry_cols:
        env = S.st_envelope(F.col(c))
        aggs += [
            F.collect_set(S.st_geometrytype(F.col(c))).alias(f"__t_{c}"),
            F.min(env["xmin"]).alias(f"__x0_{c}"),
            F.min(env["ymin"]).alias(f"__y0_{c}"),
            F.max(env["xmax"]).alias(f"__x1_{c}"),
            F.max(env["ymax"]).alias(f"__y1_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]

    # ST_Point → spec name "Point" (geoparquet.c GetGeometryTypeName)
    def spec_name(t: str) -> str:
        return t[3:] if t.startswith("ST_") else t

    columns = {}
    for c in geometry_cols:
        columns[c] = {
            "encoding": "WKB",
            "geometry_types": sorted(spec_name(t) for t in row[f"__t_{c}"]),
            "bbox": [
                row[f"__x0_{c}"],
                row[f"__y0_{c}"],
                row[f"__x1_{c}"],
                row[f"__y1_{c}"],
            ],
        }
        if covering and c in covering:
            # spec v1.1 covering: bbox fields point at [column, field]
            bc = covering[c]
            columns[c]["covering"] = {
                "bbox": {
                    "xmin": [bc, "xmin"],
                    "ymin": [bc, "ymin"],
                    "xmax": [bc, "xmax"],
                    "ymax": [bc, "ymax"],
                }
            }
    geo = {
        "version": version,
        "primary_column": geometry_cols[0],
        "columns": columns,
    }
    payload = json.dumps(geo).encode("utf-8")

    targets = [path] if os.path.isfile(path) else _parquet_parts(path)
    for f in targets:
        # A parquet footer cannot be patched in place (it trails the
        # data), so each part is rewritten whole — keep the file's own
        # codec rather than silently re-compressing with the pyarrow
        # default.
        pf = pq.ParquetFile(f)
        codec = "snappy"
        if pf.metadata.num_row_groups:
            c = pf.metadata.row_group(0).column(0).compression
            codec = c.lower() if c and c != "UNCOMPRESSED" else "none"
        t = pf.read()
        md = dict(t.schema.metadata or {})
        md[GEO_KEY] = payload
        pq.write_table(t.replace_schema_metadata(md), f, compression=codec)
        # drop Hadoop's now-stale local-FS checksum sidecar, or the next
        # Spark read fails with ChecksumException
        crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
        if os.path.exists(crc):
            os.unlink(crc)
    return geo
