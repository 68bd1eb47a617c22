"""DE-9IM-lite relations, geometry processing, Z/M dims, st_transform.

Reference surface: pg_lake_engine/src/pgduck/shippable_spatial_functions.c
(st_contains/within/covers/coveredby/containsproperly/equals/touches/
crosses/overlaps/issimple, st_convexhull/pointonsurface/exteriorring/
numinteriorrings/numpoints/collectionextract/linemerge/normalize/
makevalid/reduceprecision/simplifypreservetopology, st_z/st_m/st_zmflag/
st_force3dz/st_force3dm/st_force4d, st_transform). All cases are
integer-exact so orientation arithmetic is exact.
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from pg_lake_spark.functions import spatial as S


SQ = "POLYGON((0 0,10 0,10 10,0 10,0 0))"
INNER = "POLYGON((2 2,4 2,4 4,2 4,2 2))"
ADJ = "POLYGON((10 0,20 0,20 10,10 10,10 0))"
OVERLAP = "POLYGON((5 5,15 5,15 15,5 15,5 5))"
HOLED = "POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))"


def _rel(spark, fn, a, b):
    df = spark.createDataFrame([(a, b)], "wa string, wb string")
    return df.select(
        fn(S.st_geomfromtext("wa"), S.st_geomfromtext("wb")).alias("r")
    ).collect()[0].r


@pytest.mark.parametrize(
    "fn,a,b,want",
    [
        (S.st_contains, SQ, INNER, True),
        (S.st_contains, SQ, "POINT(5 5)", True),
        (S.st_contains, SQ, "POINT(0 5)", False),  # boundary not contained
        (S.st_covers, SQ, "POINT(0 5)", True),
        (S.st_contains, SQ, "POINT(15 5)", False),
        (S.st_contains, SQ, "LINESTRING(1 1,9 9)", True),
        (S.st_contains, SQ, "LINESTRING(-5 5,15 5)", False),
        (S.st_contains, SQ, "LINESTRING(0 0,0 10)", False),  # on boundary
        (S.st_covers, SQ, "LINESTRING(0 0,0 10)", True),
        (S.st_within, INNER, SQ, True),
        (S.st_within, OVERLAP, SQ, False),
        (S.st_coveredby, "POINT(0 5)", SQ, True),
        (S.st_containsproperly, SQ, INNER, True),
        (S.st_containsproperly, SQ, "LINESTRING(0 0,0 10)", False),
        (S.st_containsproperly, SQ, "POINT(0 5)", False),
        # equality is topological: extra collinear vertex / reversed ring
        (S.st_equals, SQ, "POLYGON((0 0,5 0,10 0,10 10,0 10,0 0))", True),
        (S.st_equals, SQ, "POLYGON((0 0,0 10,10 10,10 0,0 0))", True),
        (S.st_equals, SQ, INNER, False),
        (S.st_touches, SQ, ADJ, True),
        (S.st_touches, SQ, OVERLAP, False),
        (S.st_touches, SQ, INNER, False),
        # line along the boundary ring: touches, not contained
        (S.st_touches, SQ, "LINESTRING(0 0,10 0)", True),
        (S.st_touches, "LINESTRING(0 0,5 5)", "LINESTRING(5 5,10 0)", True),
        (S.st_overlaps, SQ, OVERLAP, True),
        (S.st_overlaps, SQ, ADJ, False),
        (S.st_overlaps, SQ, INNER, False),  # containment is not overlap
        (S.st_overlaps, "LINESTRING(0 0,6 0)", "LINESTRING(4 0,10 0)", True),
        (S.st_overlaps, "LINESTRING(0 0,10 10)", "LINESTRING(0 10,10 0)", False),
        (S.st_crosses, "LINESTRING(-5 5,15 5)", SQ, True),
        (S.st_crosses, "LINESTRING(1 1,9 9)", SQ, False),
        (S.st_crosses, "LINESTRING(0 0,10 10)", "LINESTRING(0 10,10 0)", True),
        (S.st_crosses, "LINESTRING(0 0,6 0)", "LINESTRING(4 0,10 0)", False),
        # hole semantics: point in the hole is not covered
        (S.st_covers, HOLED, "POINT(5 5)", False),
        (S.st_covers, HOLED, "POINT(4 5)", True),  # on hole edge
        (S.st_contains, HOLED, "POINT(4 5)", False),
    ],
)
def test_relation_predicates(spark, fn, a, b, want):
    assert _rel(spark, fn, a, b) is want


def test_issimple(spark):
    cases = [
        ("LINESTRING(0 0,10 10)", True),
        ("LINESTRING(0 0,10 10,0 10,10 0)", False),  # bowtie self-cross
        ("LINESTRING(0 0,10 0,10 10,0 10,0 0)", True),  # closed ring
        ("POINT(1 1)", True),
        ("MULTIPOINT(1 1,2 2)", True),
        ("MULTIPOINT(1 1,1 1)", False),  # repeated point
    ]
    df = spark.createDataFrame(cases, "w string, want boolean")
    rows = df.select("want", S.st_issimple(S.st_geomfromtext("w")).alias("got")).collect()
    assert all(r.got == r.want for r in rows), [(r.want, r.got) for r in rows]


def test_convexhull(spark):
    df = spark.createDataFrame(
        [("MULTIPOINT(0 0,10 0,10 10,0 10,5 5,2 3)",), ("LINESTRING(0 0,5 5,10 10)",)],
        "w string",
    )
    got = [
        r.h
        for r in df.select(
            S.st_astext(S.st_convexhull(S.st_geomfromtext("w"))).alias("h")
        ).collect()
    ]
    assert got[0] == "POLYGON((0 0,10 0,10 10,0 10,0 0))"
    assert got[1] == "LINESTRING(0 0,10 10)"


def test_pointonsurface_always_inside(spark):
    # C-shape and holed polygon: centroid falls outside/in-hole, the
    # scanline fallback must still land strictly inside
    shapes = [
        "POLYGON((0 0,10 0,10 2,2 2,2 8,10 8,10 10,0 10,0 0))",
        HOLED,
        SQ,
        "LINESTRING(0 0,4 4,10 0)",
        "POINT(3 3)",
    ]
    df = spark.createDataFrame([(s,) for s in shapes], "w string")
    g = S.st_geomfromtext("w")
    rows = df.select(
        S.st_covers(g, S.st_pointonsurface(g)).alias("on")
    ).collect()
    assert all(r.on for r in rows)


def test_ring_accessors(spark):
    df = spark.createDataFrame([(HOLED,)], "w string")
    g = S.st_geomfromtext("w")
    row = df.select(
        S.st_astext(S.st_exteriorring(g)).alias("ext"),
        S.st_numinteriorrings(g).alias("n"),
        S.st_astext(S.st_interiorringn(g, 1)).alias("hole"),
        S.st_interiorringn(g, 2).alias("missing"),
        S.st_numpoints(S.st_exteriorring(g)).alias("np_line"),
        S.st_numpoints(g).alias("np_poly"),
    ).collect()[0]
    assert row.ext == "LINESTRING(0 0,10 0,10 10,0 10,0 0)"
    assert row.n == 1
    assert row.hole == "LINESTRING(4 4,6 4,6 6,4 6,4 4)"
    assert row.missing is None
    assert row.np_line == 5
    assert row.np_poly is None  # ST_NumPoints is linestring-only


def test_collectionextract_linemerge(spark):
    df = spark.createDataFrame(
        [("MULTILINESTRING((0 0,5 5),(10 10,5 5),(20 20,30 30))",)], "w string"
    )
    g = S.st_geomfromtext("w")
    row = df.select(
        S.st_astext(S.st_linemerge(g)).alias("merged"),
        S.st_astext(S.st_collectionextract(g, 2)).alias("lines"),
        S.st_collectionextract(g, 1).alias("pts"),
    ).collect()[0]
    assert row.merged == "MULTILINESTRING((0 0,5 5,10 10),(20 20,30 30))"
    assert row.lines.startswith("MULTILINESTRING")
    assert row.pts is None
    # full merge down to a single linestring
    df2 = spark.createDataFrame([("MULTILINESTRING((0 0,5 5),(5 5,9 9))",)], "w string")
    assert (
        df2.select(S.st_astext(S.st_linemerge(S.st_geomfromtext("w")))).collect()[0][0]
        == "LINESTRING(0 0,5 5,9 9)"
    )


def test_makevalid_reduceprecision_simplifypreserve(spark):
    open_ring = S._pack(S.WKB_POLYGON, [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]])
    df = spark.createDataFrame([(open_ring,)], "g binary")
    fixed = df.select(S.st_astext(S.st_makevalid("g"))).collect()[0][0]
    assert fixed == "POLYGON((0 0,4 0,4 4,0 4,0 0))"

    df2 = spark.createDataFrame([("LINESTRING(0 0,1.04 0.97,2.02 2.04)",)], "w string")
    snapped = df2.select(
        S.st_astext(S.st_reduceprecision(S.st_geomfromtext("w"), 1.0))
    ).collect()[0][0]
    assert snapped == "LINESTRING(0 0,1 1,2 2)"

    # preserve-topology: a small ring DP would collapse stays intact
    df3 = spark.createDataFrame([("POLYGON((0 0,1 0,1 1,0 1,0 0))",)], "w string")
    kept = df3.select(
        S.st_astext(S.st_simplifypreservetopology(S.st_geomfromtext("w"), 100.0))
    ).collect()[0][0]
    assert kept == "POLYGON((0 0,1 0,1 1,0 1,0 0))"


def test_normalize_canonical_bytes(spark):
    le = S._from_wkt("LINESTRING(1 2,3 4)")
    be = struct.pack(">BII", 0, 2, 2) + struct.pack(">dddd", 1, 2, 3, 4)
    df = spark.createDataFrame([(le,), (be,)], "g binary")
    got = {bytes(r[0]) for r in df.select(S.st_normalize("g")).collect()}
    assert got == {le}  # both byte orders normalize to the same LE form


def test_zm_roundtrip_and_accessors(spark):
    df = spark.createDataFrame([("POINT(3 4)",)], "w string")
    g = S.st_geomfromtext("w")
    row = df.select(
        S.st_zmflag(g).alias("f2d"),
        S.st_z(g).alias("z_none"),
        S.st_zmflag(S.st_force3dz(g)).alias("fz"),
        S.st_z(S.st_force3dz(g)).alias("z0"),
        S.st_zmflag(S.st_force3dm(g)).alias("fm"),
        S.st_m(S.st_force3dm(g)).alias("m0"),
        S.st_zmflag(S.st_force4d(g)).alias("fzm"),
        S.st_x(S.st_force2d(S.st_force4d(g))).alias("x_back"),
    ).collect()[0]
    assert (row.f2d, row.fz, row.fm, row.fzm) == (0, 2, 1, 3)
    assert row.z_none is None and row.z0 == 0.0 and row.m0 == 0.0
    assert row.x_back == 3.0


def test_2d_codec_reads_iso_and_ewkb_z(spark):
    iso_z = struct.pack("<BIddd", 1, 1001, 3.0, 4.0, 9.0)
    ewkb_z = struct.pack("<BIddd", 1, 0x80000001, 3.0, 4.0, 9.0)
    ewkb_srid_z = struct.pack("<BIIddd", 1, 0xA0000001, 4326, 3.0, 4.0, 9.0)
    df = spark.createDataFrame([(iso_z,), (ewkb_z,), (ewkb_srid_z,)], "g binary")
    rows = df.select(S.st_x("g").alias("x"), S.st_y("g").alias("y")).collect()
    assert all(r.x == 3.0 and r.y == 4.0 for r in rows)
    # and the full-dim accessors see the Z
    rows = df.select(S.st_z("g").alias("z")).collect()
    assert all(r.z == 9.0 for r in rows)


def test_transform_web_mercator(spark):
    df = spark.createDataFrame([(2.3522, 48.8566)], "lon double, lat double")
    g = S.st_point("lon", "lat")
    row = df.select(
        S.st_x(S.st_transform(g, 4326, 3857)).alias("mx"),
        S.st_y(S.st_transform(g, 4326, 3857)).alias("my"),
        S.st_x(S.st_transform(S.st_transform(g, 4326, 3857), 3857, 4326)).alias("lon2"),
    ).collect()[0]
    assert math.isclose(row.mx, 261845.70624393807, rel_tol=1e-12)
    assert math.isclose(row.my, 6250564.349543127, rel_tol=1e-12)
    assert math.isclose(row.lon2, 2.3522, rel_tol=1e-12)


def test_transform_unsupported_pair_raises(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    # 2154/27700 gained support in r8, Swiss 2056 + Krovak 5514 in
    # r10; a grid-shifted TM code (Kandawala / Sri Lanka Grid) stays
    # PROJ territory
    with pytest.raises(Exception, match="4326<->3857"):
        df.select(S.st_transform(S.st_point("x", "y"), 4326, 5234)).collect()


def test_sql_surface_new_functions(spark):
    names = S.register_spatial_sql(spark)
    for n in [
        "st_contains", "st_within", "st_covers", "st_equals", "st_touches",
        "st_crosses", "st_overlaps", "st_issimple", "st_convexhull",
        "st_pointonsurface", "st_linemerge", "st_z", "st_zmflag",
        "st_force3dz", "st_transform", "st_collectionextract",
    ]:
        assert n in names
    got = spark.sql(
        "SELECT st_contains(st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'), "
        "st_geomfromtext('POINT(5 5)')) AS c, "
        "st_z(st_force3dz(st_point(1.0D, 2.0D))) AS z"
    ).collect()[0]
    assert got.c is True and got.z == 0.0


# --- overlay ---------------------------------------------------------------


def _ov(spark, fn, a, b):
    df = spark.createDataFrame([(a, b)], "wa string, wb string")
    r = df.select(fn(S.st_geomfromtext("wa"), S.st_geomfromtext("wb")).alias("g")).collect()[0].g
    return None if r is None else S._to_wkt(bytes(r))


def test_intersection_polygons(spark):
    got = _ov(spark, S.st_intersection, SQ, OVERLAP)
    assert got == "POLYGON((10 5,10 10,5 10,5 5,10 5))"
    assert _ov(spark, S.st_intersection, SQ, "POLYGON((100 0,110 0,110 10,100 10,100 0))") is None


def test_union_difference_polygons(spark):
    # areas are exact for integer coordinates
    df = spark.createDataFrame([(SQ, OVERLAP)], "wa string, wb string")
    row = df.select(
        S.st_area(S.st_union(S.st_geomfromtext("wa"), S.st_geomfromtext("wb"))).alias("u"),
        S.st_area(S.st_difference(S.st_geomfromtext("wa"), S.st_geomfromtext("wb"))).alias("d"),
        S.st_area(S.st_intersection(S.st_geomfromtext("wa"), S.st_geomfromtext("wb"))).alias("i"),
    ).collect()[0]
    assert (row.u, row.d, row.i) == (175.0, 75.0, 25.0)
    # inclusion-exclusion holds
    assert row.u == 100.0 + 100.0 - row.i


def test_difference_punches_hole(spark):
    got = _ov(spark, S.st_difference, SQ, INNER)
    assert got == "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,2 4,4 4,4 2,2 2))"
    # and the hole is respected by containment
    df = spark.createDataFrame([(SQ, INNER)], "wa string, wb string")
    d = S.st_difference(S.st_geomfromtext("wa"), S.st_geomfromtext("wb"))
    row = df.select(
        S.st_contains_point(d, F.lit(3.0), F.lit(3.0)).alias("in_hole"),
        S.st_contains_point(d, F.lit(1.0), F.lit(1.0)).alias("in_body"),
    ).collect()[0]
    assert row.in_hole is False and row.in_body is True


def test_line_polygon_clip(spark):
    assert _ov(spark, S.st_intersection, "LINESTRING(-5 5,15 5)", SQ) == "LINESTRING(0 5,10 5)"
    assert (
        _ov(spark, S.st_difference, "LINESTRING(-5 5,15 5)", SQ)
        == "MULTILINESTRING((-5 5,0 5),(10 5,15 5))"
    )
    # line through the hole of a holed polygon: three inside pieces split out
    got = _ov(spark, S.st_intersection, "LINESTRING(-5 5,15 5)", HOLED)
    assert got == "MULTILINESTRING((0 5,4 5),(6 5,10 5))"


def test_point_line_overlays(spark):
    assert _ov(spark, S.st_intersection, "MULTIPOINT(5 5,50 5)", SQ) == "POINT(5 5)"
    assert _ov(spark, S.st_difference, "MULTIPOINT(5 5,50 5)", SQ) == "POINT(50 5)"
    assert (
        _ov(spark, S.st_intersection, "LINESTRING(0 0,10 10)", "LINESTRING(0 10,10 0)")
        == "POINT(5 5)"
    )
    assert _ov(spark, S.st_union, "POINT(1 1)", "POINT(2 2)") == "MULTIPOINT(1 1,2 2)"
    # diff by a lower-dimension geometry is measure-zero removal
    assert _ov(spark, S.st_difference, SQ, "LINESTRING(-5 5,15 5)") == SQ


def test_union_disjoint_collects(spark):
    got = _ov(spark, S.st_union, SQ, "POLYGON((100 0,110 0,110 10,100 10,100 0))")
    assert got == (
        "MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0)),"
        "((100 0,110 0,110 10,100 10,100 0)))"
    )


def test_overlay_degenerate_resolves_via_snap(spark):
    # shared corner vertex used to raise SpatialDegeneracyError; the
    # snap-rounding fallback now resolves it — corner-touching squares
    # have a measure-zero intersection, which is NULL here
    df = spark.createDataFrame(
        [(SQ, "POLYGON((10 10,20 10,20 20,10 20,10 10))")], "wa string, wb string"
    )
    r = df.select(
        S.st_intersection(S.st_geomfromtext("wa"), S.st_geomfromtext("wb")).alias("g")
    ).collect()[0]
    assert r.g is None


def test_overlay_sql_surface(spark):
    S.register_spatial_sql(spark)
    got = spark.sql(
        "SELECT st_area(st_intersection("
        "st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'), "
        "st_geomfromtext('POLYGON((5 5,15 5,15 15,5 15,5 5))'))) AS a"
    ).collect()[0].a
    assert got == 25.0


# --- GEOMETRYCOLLECTION ----------------------------------------------------


def test_geometrycollection_roundtrip_and_accessors(spark):
    w = (
        "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,5 5),"
        "POLYGON((0 0,4 0,4 4,0 4,0 0)))"
    )
    df = spark.createDataFrame([(w,)], "w string")
    g = S.st_geomfromtext("w")
    row = df.select(
        S.st_astext(g).alias("wkt"),
        S.st_geometrytype(g).alias("t"),
        S.st_numgeometries(g).alias("n"),
        S.st_astext(S.st_geometryn(g, 2)).alias("second"),
        S.st_dimension(g).alias("dim"),
        S.st_npoints(g).alias("np"),
    ).collect()[0]
    assert row.wkt == w
    assert row.t == "ST_GeometryCollection"
    assert row.n == 3
    assert row.second == "LINESTRING(0 0,5 5)"
    assert row.dim == 2  # max over children
    assert row.np == 1 + 2 + 5


def test_collect_mixed_makes_collection(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0), (1, 1.0, 1.0)], "g int, x double, y double")
    pts_and_line = df.groupBy("g").agg(
        S.st_collect(F.collect_list(S.st_point("x", "y"))).alias("mp")
    )
    # collect a point with a linestring → GEOMETRYCOLLECTION
    mixed = pts_and_line.select(
        S.st_collect(
            F.array(
                S.st_geomfromtext(F.lit("POINT(9 9)")),
                S.st_geomfromtext(F.lit("LINESTRING(0 0,2 2)")),
            )
        ).alias("gc")
    )
    row = mixed.select(
        S.st_geometrytype("gc").alias("t"),
        S.st_astext(S.st_collectionextract("gc", 1)).alias("pts"),
        S.st_astext(S.st_collectionextract("gc", 2)).alias("lines"),
    ).collect()[0]
    assert row.t == "ST_GeometryCollection"
    assert row.pts == "MULTIPOINT(9 9)"
    assert row.lines == "MULTILINESTRING((0 0,2 2))"


def test_collection_relations(spark):
    gc = "GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(2 2,3 3))"
    assert _rel(spark, S.st_covers, SQ, gc) is True
    assert _rel(spark, S.st_intersects, gc, SQ) is True
    assert (
        _rel(spark, S.st_covers, INNER, gc) is False
    )  # point (1,1) outside INNER


def test_relation_invariants_fuzz():
    """Cross-relation invariants on random simple geometries (python
    kernel internals, no Spark round-trip): contains ⟹ covers ⟹
    intersects; equals ⟺ mutual covers; touches ⟹ intersects and ¬
    overlaps/¬contains; within/coveredby are the converses; overlay
    areas respect inclusion-exclusion when defined."""
    import math as _math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.integers(min_value=-50, max_value=50).map(float)
    point = st.tuples(coord, coord)

    def _simple_ring(ps):
        cx = sum(p[0] for p in ps) / len(ps)
        cy = sum(p[1] for p in ps) / len(ps)
        ordered = sorted(ps, key=lambda p: _math.atan2(p[1] - cy, p[0] - cx))
        return ordered + [ordered[0]]

    ring = st.lists(point, min_size=3, max_size=6, unique=True).map(_simple_ring)
    geom = st.one_of(
        point.map(lambda p: S._pack_point(*p)),
        st.lists(point, min_size=2, max_size=5, unique=True).map(S._pack_linestring),
        ring.map(lambda r: S._pack_polygon([r])),
    )

    @settings(max_examples=200, deadline=None)
    @given(geom, geom)
    def check(a, b):
        pa, pb = S._parse(a), S._parse(b)
        contains = S._rel_contains(*pa, *pb)
        covers = S._rel_covers(*pa, *pb)
        within = S._rel_contains(*pb, *pa)
        coveredby = S._rel_covers(*pb, *pa)
        equals = S._rel_equals(*pa, *pb)
        touches = S._rel_touches(*pa, *pb)
        overlaps = S._rel_overlaps(*pa, *pb)
        inter = S._geoms_intersect(a, b)
        if contains:
            assert covers and inter
        if equals:
            assert covers and coveredby
        if covers and coveredby:
            assert equals
        if touches:
            assert inter and not overlaps and not contains and not within
        if overlaps:
            assert inter and not covers and not coveredby
        # symmetry of the symmetric relations
        assert equals == S._rel_equals(*pb, *pa)
        assert touches == S._rel_touches(*pb, *pa)
        assert overlaps == S._rel_overlaps(*pb, *pa)

    check()


def test_overlay_area_invariants_fuzz():
    """For random CONVEX polygon pairs in general position:
    area(inter) + area(union) == area(a) + area(b), diff ⊆ a, and
    inter ⊆ both (degenerate configurations are skipped — they raise
    SpatialDegeneracyError by contract)."""
    import math as _math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.integers(min_value=-30, max_value=30).map(float)
    point = st.tuples(coord, coord)

    def hull_ring(ps):
        t, c = S._convex_hull(list(ps))
        return c[0] if t == S.WKB_POLYGON else None

    ring = st.lists(point, min_size=5, max_size=9, unique=True).map(hull_ring)

    @settings(max_examples=150, deadline=None)
    @given(ring, ring)
    def check(ra, rb):
        if ra is None or rb is None:
            return
        try:
            ri = S._gh_overlay(ra, rb, "inter")
            ru = S._gh_overlay(ra, rb, "union")
            rd = S._gh_overlay(ra, rb, "diff")
        except S.SpatialDegeneracyError:
            return
        area = lambda rings: sum(abs(S._ring_area(r)) for r in rings)  # noqa: E731
        aa, ab = abs(S._ring_area(ra)), abs(S._ring_area(rb))
        ai, au, ad = area(ri), area(ru), area(rd)
        # diff of nested case returns shell+hole: subtract hole area
        if rd and len(rd) == 2 and S._ring_pos(*rd[1][0], rd[0]) == 2:
            ad = abs(S._ring_area(rd[0])) - abs(S._ring_area(rd[1]))
        assert _math.isclose(ai + au, aa + ab, rel_tol=1e-9, abs_tol=1e-6)
        assert _math.isclose(ad, aa - ai, rel_tol=1e-9, abs_tol=1e-6)

    check()


def test_polygon_polygon_join_matches_brute_force(spark):
    """Grid + reference-point join == naive cross join with
    st_intersects, on mixed shapes (triangles vs squares) where bbox
    overlap ≠ geometry overlap — proving the exact verify stage."""
    from pg_lake_spark.operators.spatial_join import polygon_polygon_join

    tris = spark.createDataFrame(
        [(i,) for i in range(12)], "tid int"
    ).select(
        "tid",
        S.st_geomfromtext(
            F.concat(
                F.lit("POLYGON(("),
                (F.col("tid") * 5).cast("string"), F.lit(" 0,"),
                (F.col("tid") * 5 + 12).cast("string"), F.lit(" 0,"),
                (F.col("tid") * 5).cast("string"), F.lit(" 12,"),
                (F.col("tid") * 5).cast("string"), F.lit(" 0))"),
            )
        ).alias("tg"),
    )
    sqs = spark.createDataFrame(
        [(j,) for j in range(15)], "sid int"
    ).select(
        "sid",
        S.st_geomfromtext(
            F.concat(
                F.lit("POLYGON(("),
                (F.col("sid") * 4 + 1).cast("string"), F.lit(" 6,"),
                (F.col("sid") * 4 + 7).cast("string"), F.lit(" 6,"),
                (F.col("sid") * 4 + 7).cast("string"), F.lit(" 11,"),
                (F.col("sid") * 4 + 1).cast("string"), F.lit(" 11,"),
                (F.col("sid") * 4 + 1).cast("string"), F.lit(" 6))"),
            )
        ).alias("sg"),
    )
    got = sorted(
        (r.tid, r.sid)
        for r in polygon_polygon_join(
            tris, sqs, left_geom="tg", right_geom="sg", cell=6.0
        ).collect()
    )
    want = sorted(
        (r.tid, r.sid)
        for r in tris.crossJoin(sqs)
        .filter(S.st_intersects("tg", "sg"))
        .collect()
    )
    assert got == want and got  # non-empty and identical
    # bbox-only would overcount: some square overlaps the triangle's
    # bbox but not the triangle
    bbox_pairs = tris.crossJoin(sqs).filter(
        S.bbox_intersects(S.st_envelope("tg"), S.st_envelope("sg"))
    ).count()
    assert bbox_pairs > len(got)
    # contains variant: triangles containing a small square
    small = sqs.select("sid", S.st_geomfromtext(F.lit("POLYGON((1 1,2 1,2 2,1 2,1 1))")).alias("sg"))
    got_c = polygon_polygon_join(
        tris, small.limit(1), left_geom="tg", right_geom="sg",
        cell=6.0, predicate="contains",
    ).count()
    want_c = tris.crossJoin(small.limit(1)).filter(S.st_contains("tg", "sg")).count()
    assert got_c == want_c == 1


def test_geometrycollection_codec_fuzz():
    """Randomized (possibly nested) GEOMETRYCOLLECTIONs: pack→parse
    identity and WKT roundtrip stability."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.integers(min_value=-1000, max_value=1000).map(float)
    point = st.tuples(coord, coord)
    ring = st.lists(point, min_size=3, max_size=5, unique=True).map(
        lambda ps: ps + [ps[0]]
    )
    simple = st.one_of(
        point.map(lambda p: (S.WKB_POINT, [p])),
        st.lists(point, min_size=2, max_size=5).map(lambda ps: (S.WKB_LINESTRING, ps)),
        ring.map(lambda r: (S.WKB_POLYGON, [r])),
    )
    gc = st.recursive(
        simple,
        lambda children: st.lists(children, min_size=1, max_size=3).map(
            lambda kids: (S.WKB_GEOMETRYCOLLECTION, kids)
        ),
        max_leaves=6,
    )

    @settings(max_examples=100, deadline=None)
    @given(gc)
    def check(g):
        gtype, coords = g
        wkb = S._pack(gtype, coords)
        assert S._parse(wkb) == (gtype, coords)
        wkt = S._to_wkt(wkb)
        assert S._to_wkt(S._from_wkt(wkt)) == wkt

    check()


# ---------------------------------------------------------------------------
# snap-rounding overlay fallback (boundary-sharing inputs)
# ---------------------------------------------------------------------------

def test_overlay_shared_edge_parcels():
    """Adjacent parcels sharing a full edge union/difference cleanly via
    the snap-rounding fallback (the common real-world case GEOS handles
    with noding); boundary-only intersection is EMPTY in this
    polygon-dimension overlay."""
    from pg_lake_spark.functions.spatial import (
        _area_of, _from_wkt, _overlay_geoms, _parse,
    )

    A = _from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    B = _from_wkt("POLYGON((1 0,2 0,2 1,1 1,1 0))")
    u = _overlay_geoms(A, B, "union")
    assert abs(_area_of(*_parse(u)) - 2.0) < 1e-6
    assert _overlay_geoms(A, B, "inter") is None
    d = _overlay_geoms(A, B, "diff")
    assert abs(_area_of(*_parse(d)) - 1.0) < 1e-6


def test_overlay_t_joint_partial_edge():
    from pg_lake_spark.functions.spatial import (
        _area_of, _from_wkt, _overlay_geoms, _parse,
    )

    A = _from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    C = _from_wkt("POLYGON((1 0.25,2 0.25,2 0.75,1 0.75,1 0.25))")
    assert abs(_area_of(*_parse(_overlay_geoms(A, C, "union"))) - 1.5) < 1e-6
    assert abs(_area_of(*_parse(_overlay_geoms(A, C, "diff"))) - 1.0) < 1e-6


def test_overlay_shared_corner_vertex_overlap():
    """Overlapping squares whose boundaries meet at a shared vertex —
    the vertex-intersection degeneracy — produce exact overlay areas."""
    from pg_lake_spark.functions.spatial import (
        _area_of, _from_wkt, _overlay_geoms, _parse,
    )

    A = _from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    G = _from_wkt("POLYGON((0.5 0.5,1.5 0.5,1.5 1.5,0.5 1.5,0.5 0.5))")
    assert abs(_area_of(*_parse(_overlay_geoms(A, G, "union"))) - 1.75) < 1e-6
    assert abs(_area_of(*_parse(_overlay_geoms(A, G, "inter"))) - 0.25) < 1e-6
    assert abs(_area_of(*_parse(_overlay_geoms(A, G, "diff"))) - 0.75) < 1e-6


def test_overlay_corner_touch_union_area():
    from pg_lake_spark.functions.spatial import (
        _area_of, _from_wkt, _overlay_geoms, _parse,
    )

    A = _from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    D = _from_wkt("POLYGON((1 1,2 1,2 2,1 2,1 1))")
    assert abs(_area_of(*_parse(_overlay_geoms(A, D, "union"))) - 2.0) < 1e-6
    assert _overlay_geoms(A, D, "inter") is None


def test_sliver_filter_is_width_based_not_area_based():
    """The snap-fallback sliver filter drops one-grid-cell-wide
    artifacts but keeps legitimately thin overlay results regardless
    of their area (advisor r8: an area threshold silently dropped a
    genuinely narrow intersection strip between boundary-sharing
    parcels)."""
    from pg_lake_spark.functions.spatial import _snapped_ring_is_sliver

    grid = 2e-6  # ~1e-6 of a scale-2 extent

    def rect(w, h):
        return [(0.0, 0.0), (w, 0.0), (w, h), (0.0, h), (0.0, 0.0)]

    # one-cell-wide artifact running the FULL extent: large area,
    # still a sliver
    assert _snapped_ring_is_sliver(rect(grid, 2.0), grid)
    # legitimate narrow strip: 10 cells wide, SHORT — its raw area
    # (4e-6) is below the old 2*grid*scale = 8e-6 threshold, but it
    # must be kept
    assert not _snapped_ring_is_sliver(rect(10 * grid, 0.2), grid)
    # macroscopic result ring: kept
    assert not _snapped_ring_is_sliver(rect(1.0, 1.0), grid)
    # degenerate zero-perimeter ring: dropped
    assert _snapped_ring_is_sliver([(0.0, 0.0)] * 4, grid)


def test_contains_xy_vectorized_matches_scalar():
    """The r16 vectorized even-odd kernel must agree with the scalar
    reference on every class of input: interior/exterior, vertex and
    edge boundary points, ray-through-vertex parities, holes (interior,
    hole-interior, hole-edge), MULTIPOLYGONs, and random fuzz."""
    import random

    import numpy as np

    from pg_lake_spark.functions.spatial import (
        _contains_xy,
        _contains_xy_vec,
        _pack_polygon,
        _parse,
    )

    def check(wkb, pts):
        gtype, coords = _parse(wkb)
        X = np.array([p[0] for p in pts], dtype="f8")
        Y = np.array([p[1] for p in pts], dtype="f8")
        vec = _contains_xy_vec(gtype, coords, X, Y)
        for i, (px, py) in enumerate(pts):
            assert bool(vec[i]) == _contains_xy(wkb, px, py), (
                wkb.hex(), px, py, bool(vec[i]))

    sq = _pack_polygon([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]])
    pts = [
        (2, 2), (5, 5), (-1, 2),          # interior / exterior
        (0, 0), (4, 4), (2, 0), (0, 2),   # vertices and edges
        (4, 2), (2, 4),                   # far edges
        (0, 4), (4, 0),                   # corners
        (2, 3.9999999), (2, 4.0000001),
    ]
    check(sq, pts)

    holed = _pack_polygon(
        [
            [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
            [(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)],
        ]
    )
    pts = [
        (1, 1), (5, 5),                   # shell interior / hole interior
        (3, 5), (5, 3), (7, 5),           # hole edges (covered)
        (3, 3), (7, 7),                   # hole vertices
        (2.9999, 5), (3.0001, 5),         # either side of the hole edge
        (0, 0), (10, 5), (5, 10),
    ]
    check(holed, pts)

    tri_a = [[(0.0, 0.0), (2.0, 0.0), (0.0, 2.0), (0.0, 0.0)]]
    tri_b = [[(5.0, 5.0), (8.0, 5.0), (5.0, 9.0), (5.0, 5.0)]]
    multi = (
        struct.pack("<BII", 1, 6, 2)
        + _pack_polygon(tri_a)
        + _pack_polygon(tri_b)
    )
    pts = [(0.5, 0.5), (6, 6), (3, 3), (1.0, 1.0), (5, 5), (2.0, 0.0)]
    check(multi, pts)

    rng = random.Random(42)
    for _ in range(20):
        n = rng.randint(3, 8)
        ring = [(rng.uniform(-5, 5), rng.uniform(-5, 5)) for _ in range(n)]
        ring.append(ring[0])
        wkb = _pack_polygon([ring])
        pts = [(rng.uniform(-6, 6), rng.uniform(-6, 6)) for _ in range(50)]
        # include exact vertices and midpoints of segments
        pts += ring[:-1]
        pts += [((ring[i][0] + ring[i + 1][0]) / 2, (ring[i][1] + ring[i + 1][1]) / 2) for i in range(n)]
        check(wkb, pts)


def test_intersects_vectorized_matches_scalar():
    """The r16 vectorized segment-pair kernel behind st_intersects must
    agree with the scalar reference on every covered pair class:
    proper crossings, collinear touches, vertex touches, disjoint,
    full containment (no edge contact), holed polygons, multis and
    collections, degenerate lines, plus random fuzz; point-bearing
    pairs route scalar by construction."""
    import random

    import numpy as np

    from pg_lake_spark.functions.spatial import (
        _containment_fallback,
        _from_wkt,
        _geoms_intersect,
        _geoms_intersect_t,
        _seg_geom_info,
        _seg_hits_vec,
    )

    def vec_verdict(wa: bytes, wb: bytes) -> bool:
        ia, ib = _seg_geom_info(wa), _seg_geom_info(wb)
        if ia[2] or ib[2]:
            return _geoms_intersect_t(ia[0], ia[1], ib[0], ib[1])
        hit = _seg_hits_vec(ia[3], ib[3], np.zeros(1, dtype=np.int64))
        return bool(hit[0]) or _containment_fallback(ia, ib)

    shapes = [
        "POLYGON((0 0,10 0,10 10,0 10,0 0))",
        "POLYGON((2 2,4 2,4 4,2 4,2 2))",                      # inside
        "POLYGON((10 0,20 0,20 10,10 10,10 0))",               # edge-adjacent
        "POLYGON((10 10,12 10,12 12,10 12,10 10))",            # corner touch
        "POLYGON((5 5,15 5,15 15,5 15,5 5))",                  # overlap
        "POLYGON((20 20,30 20,30 30,20 30,20 20))",            # disjoint
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))",  # holed
        "POLYGON((4.5 4.5,5.5 4.5,5.5 5.5,4.5 5.5,4.5 4.5))",  # in the hole
        "MULTIPOLYGON(((0 0,2 0,0 2,0 0)),((20 20,22 20,20 22,20 20)))",
        "LINESTRING(-5 5,25 5)",                               # crossing line
        "LINESTRING(0 -5,0 -1)",                               # disjoint line
        "LINESTRING(0 0,10 0)",                                # collinear edge
        "LINESTRING(3 3,3 3.5)",                               # inside, no edge contact
        "GEOMETRYCOLLECTION(POLYGON((1 1,2 1,2 2,1 2,1 1)),LINESTRING(8 8,9 9))",
        "POINT(5 5)",                                          # scalar route
        "MULTIPOINT((5 5),(20 20))",                           # scalar route
    ]
    wkbs = [_from_wkt(s) for s in shapes]
    for wa in wkbs:
        for wb in wkbs:
            assert vec_verdict(wa, wb) == _geoms_intersect(wa, wb), (wa.hex(), wb.hex())

    rng = random.Random(7)

    def rand_poly():
        cx, cy = rng.uniform(-10, 10), rng.uniform(-10, 10)
        w, h = rng.uniform(0.5, 8), rng.uniform(0.5, 8)
        return (
            f"POLYGON(({cx} {cy},{cx + w} {cy},{cx + w} {cy + h},"
            f"{cx} {cy + h},{cx} {cy}))"
        )

    def rand_line():
        pts = ",".join(
            f"{rng.uniform(-12, 12)} {rng.uniform(-12, 12)}"
            for _ in range(rng.randint(2, 5))
        )
        return f"LINESTRING({pts})"

    for _ in range(200):
        wa = _from_wkt(rand_poly() if rng.random() < 0.6 else rand_line())
        wb = _from_wkt(rand_poly() if rng.random() < 0.6 else rand_line())
        assert vec_verdict(wa, wb) == _geoms_intersect(wa, wb), (wa.hex(), wb.hex())

    # batched group path: one left geometry against many rights must
    # reduce per-row exactly (exercises the reduceat offsets)
    import numpy as np  # noqa: F811

    ia = _seg_geom_info(wkbs[0])
    rights = [w for w in wkbs if not _seg_geom_info(w)[2]]
    infos = [_seg_geom_info(w) for w in rights]
    counts = np.array([ib[3].shape[0] for ib in infos], dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    b_all = np.concatenate([ib[3] for ib in infos], axis=0)
    hits = _seg_hits_vec(ia[3], b_all, starts)
    for j, w in enumerate(rights):
        got = bool(hits[j]) or _containment_fallback(ia, infos[j])
        assert got == _geoms_intersect(wkbs[0], w), w.hex()


def test_k_intersects_batch_fallback_matches_scalar():
    """r16 differential pin for the batch-wide vectorized containment
    fallback: drive the whole _k_intersects kernel on a mixed batch
    (many groups, repeated geometries, crossing / disjoint / contained
    / holed / multi / scalar-routed pairs) and compare every verdict
    to the scalar reference."""
    import random

    import pandas as pd

    from pg_lake_spark.functions import spatial as S
    from pg_lake_spark.functions.spatial import _from_wkt, _geoms_intersect

    shapes = [
        "POLYGON((0 0,10 0,10 10,0 10,0 0))",
        "POLYGON((2 2,4 2,4 4,2 4,2 2))",                      # contained
        "POLYGON((20 20,30 20,30 30,20 30,20 20))",            # disjoint
        "POLYGON((5 5,15 5,15 15,5 15,5 5))",                  # crossing
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))",
        "POLYGON((4.5 4.5,5.5 4.5,5.5 5.5,4.5 5.5,4.5 4.5))",  # in the hole
        "MULTIPOLYGON(((0 0,2 0,0 2,0 0)),((40 40,42 40,40 42,40 40)))",
        "LINESTRING(3 3,3 3.5)",                               # inside, no edge contact
        "LINESTRING(-5 -5,-1 -1)",                             # disjoint line
        "POINT(5 5)",                                          # scalar route
    ]
    wkbs = [_from_wkt(s) for s in shapes]
    rng = random.Random(11)
    pairs = [(rng.choice(wkbs), rng.choice(wkbs)) for _ in range(500)]
    pairs += [(a, b) for a in wkbs for b in wkbs]
    pairs.append((None, wkbs[0]))
    pairs.append((wkbs[0], None))
    a = pd.Series([p[0] for p in pairs], dtype=object)
    b = pd.Series([p[1] for p in pairs], dtype=object)
    got = S._k_intersects.func(a, b)
    for i, (wa, wb) in enumerate(pairs):
        want = None if wa is None or wb is None else _geoms_intersect(wa, wb)
        assert got[i] == want, (i, wa.hex() if wa else None, wb.hex() if wb else None)
