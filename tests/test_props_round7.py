"""Property-based tests for round-7 numerics (hypothesis).

Pure-Python properties over the kernels' helper functions — no Spark
session needed, so hundreds of examples run in milliseconds.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pg_lake_spark.functions.spatial import (
    _area_of,
    _from_wkt,
    _overlay_geoms,
    _parse,
    _utm_forward,
    _utm_inverse,
)


@settings(max_examples=200, deadline=None)
@given(
    zone=st.integers(1, 60),
    south=st.booleans(),
    # stay within the zone's +/-3 deg band and off the poles, where UTM
    # is defined and the series converges
    dlon=st.floats(-2.9, 2.9, allow_nan=False),
    lat=st.floats(-79.0, 79.0, allow_nan=False),
)
def test_utm_roundtrip_property(zone, south, dlon, lat):
    lon0 = zone * 6 - 183
    x, y = lon0 + dlon, lat
    E, N = _utm_forward(zone, south)(x, y)
    # when the zone's hemisphere matches the latitude, the false
    # northing keeps N in the grid range (a mismatched hemisphere
    # legitimately goes negative / above 10M — real UTM behaves so)
    if south == (lat < 0):
        assert -1 <= N <= 10_000_000 + 1
    xi, yi = _utm_inverse(zone, south)(E, N)
    assert abs(xi - x) < 1e-8 and abs(yi - y) < 1e-8


def _rect(x0, y0, x1, y1):
    return _from_wkt(
        f"POLYGON(({x0} {y0},{x1} {y0},{x1} {y1},{x0} {y1},{x0} {y0}))"
    )


@settings(max_examples=100, deadline=None)
@given(
    # two rectangles sharing the full vertical edge at x=w0 — every
    # example exercises the snap-rounding fallback
    w0=st.floats(0.5, 50.0, allow_nan=False),
    w1=st.floats(0.5, 50.0, allow_nan=False),
    h=st.floats(0.5, 50.0, allow_nan=False),
)
def test_shared_edge_union_area_property(w0, w1, h):
    a = _rect(0, 0, w0, h)
    b = _rect(w0, 0, w0 + w1, h)
    u = _overlay_geoms(a, b, "union")
    want = (w0 + w1) * h
    got = _area_of(*_parse(u))
    assert abs(got - want) <= max(1e-6, want * 1e-4)
    d = _overlay_geoms(a, b, "diff")
    assert abs(_area_of(*_parse(d)) - w0 * h) <= max(1e-6, w0 * h * 1e-4)
    assert _overlay_geoms(a, b, "inter") is None


@settings(max_examples=100, deadline=None)
@given(
    # partial shared edge (T-joint): b's edge is a sub-interval of a's
    h0=st.floats(0.2, 0.45, allow_nan=False),
    h1=st.floats(0.55, 0.8, allow_nan=False),
    w=st.floats(0.5, 20.0, allow_nan=False),
)
def test_t_joint_union_area_property(h0, h1, w):
    a = _rect(0, 0, 10, 1)
    b = _rect(10, h0, 10 + w, h1)
    u = _overlay_geoms(a, b, "union")
    want = 10 * 1 + w * (h1 - h0)
    assert abs(_area_of(*_parse(u)) - want) <= max(1e-6, want * 1e-4)


def test_strftime_translation_end_to_end(spark):
    """strftime_to_java validated at the OUTPUT level: Java's
    DateTimeFormatter with the translated pattern must render the same
    text Python's strftime renders for the original — including
    literal-% and quoted-letter cases."""
    import datetime

    from pyspark.sql import functions as F

    from pg_lake_spark.sources.writers import strftime_to_java

    fmts = [
        "%Y-%m-%d", "%d/%m/%Y %H:%M:%S", "%Y%%", "%%S", "T%HZ",
        "%Y-%m-%dT%H:%M:%S", "%I %p", "%j", "%y.%m",
    ]
    dts = [
        datetime.datetime(2021, 3, 7, 4, 5, 6),
        datetime.datetime(1999, 12, 31, 23, 59, 58),
        datetime.datetime(2024, 1, 1, 12, 0, 0),
    ]
    df = spark.createDataFrame([(d,) for d in dts], "ts timestamp")
    sel = [
        F.date_format("ts", strftime_to_java(f)).alias(f"f{i}")
        for i, f in enumerate(fmts)
    ]
    rows = df.orderBy("ts").collect()
    got = df.orderBy("ts").select(*sel).collect()
    for d, row in zip(sorted(dts), got):
        for i, f in enumerate(fmts):
            want = d.strftime(f)
            # Java uses locale AM/PM capitalization; PG/python lowercase
            # handled by the to_char shim, not here — normalize
            assert row[f"f{i}"].replace("AM", "AM").upper() == want.upper(), (f, row[f"f{i}"], want)
