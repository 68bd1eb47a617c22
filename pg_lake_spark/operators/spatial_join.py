"""Grid-bucketed spatial joins (the scale path for bbox predicates).

The reference answers spatial joins by shipping ``st_contains``/
``st_intersects`` into DuckDB's spatial extension
(pg_lake_engine/src/pgduck/shippable_spatial_operators.c); on Spark a
naive geometry join is a cross product with a predicate — quadratic
shuffle-free BroadcastNestedLoopJoin at small scale, a scale-killer at
100 TB. This operator turns the bbox predicate into an EQUI-join the
same way every distributed spatial engine does (and the same trick the
repo's LSH/SimHash dedup uses): overlay a fixed grid, explode each box
to the cells it covers, map each point to its single cell, hash-join on
the cell key, then apply the exact predicate to discard grid false
positives.

Scale notes:
- Cell explosion is expression-level (``sequence()`` + two explodes) —
  no UDF, no driver loop.
- Each point lands in exactly ONE cell and a box lists each covered
  cell once, so a (box, point) pair meets at most once — no dedup pass.
- ``cell`` should approximate the typical box size: boxes then explode
  to O(1) cells each and the shuffle carries ~|boxes| + |points| rows.
  Skewed hot cells fall out to AQE skew-join handling like any other
  hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pg_lake_spark.functions.spatial import bbox_contains_point, st_contains_point, st_envelope


def _cell(v: Column, cell: float) -> Column:
    return F.floor(v / F.lit(float(cell))).cast("long")


def bbox_point_join(
    boxes: DataFrame,
    points: DataFrame,
    *,
    box_col: str = "box",
    x_col: str = "x",
    y_col: str = "y",
    cell: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``boxes`` (bbox struct column ``box_col``) with rows
    of ``points`` (coordinate columns ``x_col``/``y_col``) where the
    point lies inside the box (inclusive edges, st_contains-on-envelope
    semantics). Returns boxes-columns + points-columns.

    Only ``how='inner'`` is supported: an outer grid join would emit an
    unmatched box once per exploded cell, and the containment filter
    after the join silently discards every null-extended row anyway —
    outer semantics cannot survive this plan shape, so asking for them
    is refused rather than silently answered as inner."""
    if how != "inner":
        raise ValueError(
            f"bbox_point_join supports how='inner' only (got {how!r}): the "
            "grid explode + post-join containment filter cannot preserve "
            "outer-join semantics"
        )
    b = boxes.withColumn(
        "__cx",
        F.explode(
            F.sequence(
                _cell(F.col(box_col)["xmin"], cell), _cell(F.col(box_col)["xmax"], cell)
            )
        ),
    ).withColumn(
        "__cy",
        F.explode(
            F.sequence(
                _cell(F.col(box_col)["ymin"], cell), _cell(F.col(box_col)["ymax"], cell)
            )
        ),
    )
    p = points.withColumn("__cx", _cell(F.col(x_col), cell)).withColumn(
        "__cy", _cell(F.col(y_col), cell)
    )
    joined = b.join(p, ["__cx", "__cy"], how).filter(
        bbox_contains_point(F.col(box_col), F.col(x_col), F.col(y_col))
    )
    return joined.drop("__cx", "__cy")


def polygon_point_join(
    polygons: DataFrame,
    points: DataFrame,
    *,
    geom_col: str = "geometry",
    x_col: str = "x",
    y_col: str = "y",
    cell: float = 1.0,
) -> DataFrame:
    """Exact polygon⋈point containment at scale: the polygon's envelope
    explodes to grid cells (equi-join pre-filter, identical machinery to
    :func:`bbox_point_join`), then the surviving candidates take the
    exact ray-cast test — the bbox stage discards the quadratic bulk,
    the Arrow kernel only sees candidate pairs. This is the same
    two-phase plan PostGIS executes (index on bbox, exact recheck)."""
    b = polygons.withColumn("__env", st_envelope(F.col(geom_col)))
    b = b.withColumn(
        "__cx",
        F.explode(
            F.sequence(_cell(F.col("__env")["xmin"], cell), _cell(F.col("__env")["xmax"], cell))
        ),
    ).withColumn(
        "__cy",
        F.explode(
            F.sequence(_cell(F.col("__env")["ymin"], cell), _cell(F.col("__env")["ymax"], cell))
        ),
    )
    p = points.withColumn("__cx", _cell(F.col(x_col), cell)).withColumn(
        "__cy", _cell(F.col(y_col), cell)
    )
    joined = (
        b.join(p, ["__cx", "__cy"], "inner")
        .filter(bbox_contains_point(F.col("__env"), F.col(x_col), F.col(y_col)))
        .filter(st_contains_point(F.col(geom_col), F.col(x_col), F.col(y_col)))
    )
    return joined.drop("__cx", "__cy", "__env")


def polygon_polygon_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_geom: str = "geometry",
    right_geom: str = "geometry",
    cell: float = 1.0,
    predicate: str = "intersects",
) -> DataFrame:
    """Exact polygon⋈polygon join at scale (predicate: ``intersects``
    or ``contains`` = left covers right's intersection test refined to
    st_contains).

    Both envelopes explode to covered grid cells and hash-join on the
    cell key. Unlike the point joins, a candidate pair can share MANY
    cells; the **reference-point rule** keeps the join duplicate-free
    without a distinct: a pair is emitted only from the single cell
    that contains the min-corner of the two envelopes' intersection —
    pure Column arithmetic, no dedup shuffle. Survivors take the exact
    orientation-arithmetic predicate kernel. Column names of the two
    inputs must not collide (alias/prefix beforehand), matching
    Spark's own join hygiene."""
    from pg_lake_spark.functions.spatial import (
        bbox_intersects,
        st_contains,
        st_intersects,
    )

    if predicate not in ("intersects", "contains"):
        raise ValueError("predicate must be 'intersects' or 'contains'")

    def cells(df: DataFrame, geom: str, env: str) -> DataFrame:
        df = df.withColumn(env, st_envelope(F.col(geom)))
        return df.withColumn(
            "__cx",
            F.explode(
                F.sequence(
                    _cell(F.col(env)["xmin"], cell), _cell(F.col(env)["xmax"], cell)
                )
            ),
        ).withColumn(
            "__cy",
            F.explode(
                F.sequence(
                    _cell(F.col(env)["ymin"], cell), _cell(F.col(env)["ymax"], cell)
                )
            ),
        )

    a = cells(left, left_geom, "__env_l")
    b = cells(right, right_geom, "__env_r")
    joined = a.join(b, ["__cx", "__cy"], "inner")
    # reference point: the intersection bbox's min corner picks ONE cell
    ref_x = F.greatest(F.col("__env_l")["xmin"], F.col("__env_r")["xmin"])
    ref_y = F.greatest(F.col("__env_l")["ymin"], F.col("__env_r")["ymin"])
    joined = (
        joined.filter(
            (F.col("__cx") == _cell(ref_x, cell))
            & (F.col("__cy") == _cell(ref_y, cell))
        )
        .filter(bbox_intersects(F.col("__env_l"), F.col("__env_r")))
    )
    exact = (
        st_intersects(F.col(left_geom), F.col(right_geom))
        if predicate == "intersects"
        else st_contains(F.col(left_geom), F.col(right_geom))
    )
    return joined.filter(exact).drop("__cx", "__cy", "__env_l", "__env_r")
