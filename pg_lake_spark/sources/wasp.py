"""Dependency-free WAsP ``.map`` reader (terrain line maps).

Reference: GDAL's WAsP driver row in docs/file-formats-reference.md
(`.map | WAsP .map format`). The format is plain text: a 4-line header
(description, projection parameters, extents) followed by line records

    <left_value> <right_value> <n_points>
    x1 y1 x2 y2 ... xn yn          (coordinates may wrap lines)

where the two values are the attribute on either side of the line —
roughness lengths for roughness-change maps, a single repeated value
for elevation contours. Each record becomes one row:
(left double, right double, geometry LINESTRING WKB).

Single-node parse like the other GDAL-funnel formats; WAsP maps are
small vector inputs (the scan result is what joins against big data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_lake_spark.functions.spatial import _pack_linestring


def read_wasp_map(spark: SparkSession, path: str) -> DataFrame:
    with open(path, errors="replace") as fh:
        tokens_by_line = [ln.split() for ln in fh]
    # header: line 1 free-text description, lines 2-4 numeric projection
    # and extent parameters; data starts at the first record line
    rows: list[tuple] = []
    i = 4
    flat: list[str] = [t for line in tokens_by_line[i:] for t in line]
    pos = 0
    while pos + 3 <= len(flat):
        try:
            left, right = float(flat[pos]), float(flat[pos + 1])
            n = int(float(flat[pos + 2]))
        except ValueError as exc:
            raise ValueError(
                f"malformed WAsP record at token {pos} in {path}"
            ) from exc
        pos += 3
        if n < 2 or pos + 2 * n > len(flat):
            raise ValueError(
                f"WAsP record claims {n} points but stream ends in {path}"
            )
        coords = [
            (float(flat[pos + 2 * k]), float(flat[pos + 2 * k + 1]))
            for k in range(n)
        ]
        pos += 2 * n
        rows.append((left, right, _pack_linestring(coords)))
    return spark.createDataFrame(
        rows, "left double, right double, geometry binary"
    )
