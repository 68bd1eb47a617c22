"""GML and DXF reader tests over hand-written spec documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_lake_spark.functions import spatial as S

_GML = """<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
    xmlns:gml="http://www.opengis.net/gml" xmlns:app="http://example.com/app">
 <gml:featureMember>
  <app:City>
   <app:name>ams</app:name>
   <app:pop>900</app:pop>
   <app:geom><gml:Point><gml:pos>4.9 52.4</gml:pos></gml:Point></app:geom>
  </app:City>
 </gml:featureMember>
 <gml:featureMember>
  <app:Road>
   <app:name>a10</app:name>
   <app:geom><gml:LineString><gml:posList>0 0 1 1 2 0</gml:posList></gml:LineString></app:geom>
  </app:Road>
 </gml:featureMember>
 <gml:featureMember>
  <app:Zone>
   <app:name>ring</app:name>
   <app:geom>
    <gml:Polygon>
     <gml:exterior><gml:LinearRing><gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList></gml:LinearRing></gml:exterior>
     <gml:interior><gml:LinearRing><gml:posList>1 1 2 1 2 2 1 2 1 1</gml:posList></gml:LinearRing></gml:interior>
    </gml:Polygon>
   </app:geom>
  </app:Zone>
 </gml:featureMember>
 <gml:featureMember>
  <app:Old>
   <app:geom><gml:Point><gml:coordinates>7,8</gml:coordinates></gml:Point></app:geom>
  </app:Old>
 </gml:featureMember>
</wfs:FeatureCollection>
"""


def test_gml_features(spark, tmp_path):
    from pg_lake_spark.sources.gml import read_gml

    p = tmp_path / "doc.gml"
    p.write_text(_GML)
    df = read_gml(spark, str(p))
    rows = {r.feature: r for r in df.select(
        "feature",
        S.st_astext("geometry").alias("wkt"),
        F.get_json_object("properties", "$.name").alias("name"),
        F.get_json_object("properties", "$.pop").alias("pop"),
    ).collect()}
    assert rows["City"].wkt == "POINT(4.9 52.4)"
    assert rows["City"].name == "ams" and rows["City"].pop == "900"
    assert rows["Road"].wkt == "LINESTRING(0 0,1 1,2 0)"
    assert rows["Zone"].wkt == "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))"
    assert rows["Old"].wkt == "POINT(7 8)"  # GML2 coordinates syntax


def _dxf_doc() -> str:
    pairs = [
        (0, "SECTION"), (2, "ENTITIES"),
        (0, "POINT"), (8, "L1"), (10, "1.5"), (20, "2.5"),
        (0, "LINE"), (8, "L1"), (10, "0"), (20, "0"), (11, "3"), (21, "4"),
        (0, "LWPOLYLINE"), (8, "L2"), (70, "1"),
        (10, "0"), (20, "0"), (10, "4"), (20, "0"), (10, "4"), (20, "4"),
        (0, "LWPOLYLINE"), (8, "L2"), (70, "0"),
        (10, "0"), (20, "0"), (10, "1"), (20, "1"),
        (0, "POLYLINE"), (8, "L3"), (70, "0"),
        (0, "VERTEX"), (10, "5"), (20, "5"),
        (0, "VERTEX"), (10, "6"), (20, "7"),
        (0, "SEQEND"),
        (0, "CIRCLE"), (8, "L4"), (10, "0"), (20, "0"), (40, "2"),
        (0, "ENDSEC"), (0, "EOF"),
    ]
    return "\n".join(f"{c}\n{v}" for c, v in pairs) + "\n"


def test_dxf_entities(spark, tmp_path):
    from pg_lake_spark.sources.dxf import read_dxf

    p = tmp_path / "draw.dxf"
    p.write_text(_dxf_doc())
    df = read_dxf(spark, str(p))
    rows = df.select(
        "entity", "layer", S.st_astext("geometry").alias("wkt"),
        S.st_area("geometry").alias("area"),
    ).collect()
    by = {}
    for r in rows:
        by.setdefault(r.entity, []).append(r)
    assert by["POINT"][0].wkt == "POINT(1.5 2.5)"
    assert by["LINE"][0].wkt == "LINESTRING(0 0,3 4)"
    lw = sorted(by["LWPOLYLINE"], key=lambda r: r.wkt)
    assert lw[0].wkt == "LINESTRING(0 0,1 1)"           # open polyline
    assert lw[1].wkt == "POLYGON((0 0,4 0,4 4,0 0))"    # closed → ring
    assert by["POLYLINE"][0].wkt == "LINESTRING(5 5,6 7)"
    import math
    assert 0.98 * math.pi * 4 < by["CIRCLE"][0].area < math.pi * 4
    assert by["CIRCLE"][0].layer == "L4"


_MIF = """Version 300
Charset "Neutral"
Delimiter ","
Columns 3
  name Char(20)
  pop Integer
  ratio Float
Data

POINT 4.9 52.4
LINE 0 0 3 4
PLINE 3
0 0
1 1
2 0
REGION 2
5
0 0
0 4
4 4
4 0
0 0
5
1 1
2 1
2 2
1 2
1 1
NONE
"""

_MID = '"ams",900,1.5\n"road",12,0.5\n"path",7,2.5\n"zone",3,3.5\n"ghost",,\n'


def test_mif_mid(spark, tmp_path):
    from pg_lake_spark.sources.mif import read_mif

    (tmp_path / "m.mif").write_text(_MIF)
    (tmp_path / "m.mid").write_text(_MID)
    df = read_mif(spark, str(tmp_path / "m.mif"))
    assert df.columns == ["name", "pop", "ratio", "geometry"]
    assert dict(df.dtypes)["pop"] == "bigint" and dict(df.dtypes)["ratio"] == "double"
    rows = {r.name: r for r in df.select(
        "name", "pop", S.st_astext("geometry").alias("wkt")
    ).collect()}
    assert rows["ams"].wkt == "POINT(4.9 52.4)" and rows["ams"].pop == 900
    assert rows["road"].wkt == "LINESTRING(0 0,3 4)"
    assert rows["path"].wkt == "LINESTRING(0 0,1 1,2 0)"
    # region: CW outer + CCW hole assemble into a holed polygon
    assert rows["zone"].wkt == "POLYGON((0 0,0 4,4 4,4 0,0 0),(1 1,2 1,2 2,1 2,1 1))"
    assert rows["ghost"].wkt is None and rows["ghost"].pop is None


def test_mit_alias_reads_as_mif(spark, tmp_path):
    """file-formats-reference.md lists `.mif .mit .tab`: .mit is the
    interchange alias, routed through the gdal umbrella."""
    from pg_lake_spark.sources.readers import read_lake

    (tmp_path / "m.mit").write_text(_MIF)
    (tmp_path / "m.mid").write_text(_MID)
    df = read_lake(spark, str(tmp_path / "m.mit"), fmt="gdal")
    assert df.count() == 5 and "geometry" in df.columns


def test_gml_srs_dimension_3(spark, tmp_path):
    """srsDimension=3 posLists interleave x y z — a fixed stride of 2
    silently mispaired every coordinate after the first (r14 review)."""
    gml = tmp_path / "d3.gml"
    gml.write_text(
        '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">'
        "<gml:featureMember><f>"
        "<geom><gml:LineString>"
        '<gml:posList srsDimension="3">0 0 10 1 1 20 2 2 30</gml:posList>'
        "</gml:LineString></geom>"
        "</f></gml:featureMember></gml:FeatureCollection>"
    )
    from pg_lake_spark.functions.spatial import _to_wkt
    from pg_lake_spark.sources.gml import read_gml

    rows = read_gml(spark, str(gml)).collect()
    assert _to_wkt(bytes(rows[0].geometry)) == "LINESTRING(0 0,1 1,2 2)"
