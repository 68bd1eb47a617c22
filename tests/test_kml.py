"""KML/KMZ reader tests over hand-written spec XML."""

from __future__ import annotations

import zipfile

from pyspark.sql import functions as F

from pg_lake_spark.functions import spatial as S
from pg_lake_spark.sources.kml import read_kml

_KML = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
 <Document>
  <Placemark>
   <name>hq</name>
   <ExtendedData><Data name="floor"><value>3</value></Data></ExtendedData>
   <Point><coordinates>4.5,52.0,12.5</coordinates></Point>
  </Placemark>
  <Placemark>
   <name>route</name>
   <LineString><coordinates>
     0,0 1,1 2,0
   </coordinates></LineString>
  </Placemark>
  <Placemark>
   <name>zone</name>
   <Polygon>
    <outerBoundaryIs><LinearRing><coordinates>0,0 4,0 4,4 0,4 0,0</coordinates></LinearRing></outerBoundaryIs>
    <innerBoundaryIs><LinearRing><coordinates>1,1 2,1 2,2 1,2 1,1</coordinates></LinearRing></innerBoundaryIs>
   </Polygon>
  </Placemark>
  <Placemark>
   <name>pair</name>
   <MultiGeometry>
    <Point><coordinates>9,9</coordinates></Point>
    <Point><coordinates>8,8</coordinates></Point>
   </MultiGeometry>
  </Placemark>
 </Document>
</kml>
"""


def test_kml_placemarks(spark, tmp_path):
    p = tmp_path / "doc.kml"
    p.write_text(_KML)
    df = read_kml(spark, str(p))
    rows = {r.name: r for r in df.select(
        "name",
        S.st_astext("geometry").alias("wkt"),
        F.get_json_object("extended", "$.floor").alias("floor"),
    ).collect()}
    assert rows["hq"].wkt == "POINT(4.5 52)"  # altitude dropped
    assert rows["hq"].floor == "3"
    assert rows["route"].wkt == "LINESTRING(0 0,1 1,2 0)"
    assert rows["zone"].wkt == "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))"
    assert rows["pair"].wkt == "MULTIPOINT(9 9,8 8)"


def test_kmz_and_read_lake_fmt(spark, tmp_path):
    from pg_lake_spark.sources.readers import read_lake

    kml = tmp_path / "doc.kml"
    kml.write_text(_KML)
    kmz = str(tmp_path / "doc.kmz")
    with zipfile.ZipFile(kmz, "w") as zf:
        zf.write(str(kml), "doc.kml")
    df = read_lake(spark, kmz, fmt="kmz")
    assert df.count() == 4
