"""Distributed (executor-parsed) GPX/KML readers vs the driver-side
readers: same rows, same geometry, same attribute columns — only the
numbering contract differs (global_index order vs document order), which
the fixtures are built to make identical (time-ordered points).
"""

import textwrap

import pytest

from cartodb_importer_spark.readers.gpx import read_gpx
from cartodb_importer_spark.readers.kml import read_kml
from cartodb_importer_spark.readers.xml_distributed import (
    read_gpx_distributed,
    read_kml_distributed,
)

GPX = textwrap.dedent(
    """\
    <?xml version="1.0"?>
    <gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
      <wpt lat="40.0" lon="-3.0"><name>home</name><time>2010-01-02T00:00:00Z</time></wpt>
      <trk><name>t0</name><trkseg>
        <trkpt lat="41.0" lon="2.0"><ele>12</ele><time>2010-01-01T00:00:00Z</time></trkpt>
        <trkpt lat="41.1" lon="2.1"><ele>13</ele><time>2010-01-01T00:01:00Z</time></trkpt>
      </trkseg><trkseg>
        <trkpt lat="41.2" lon="2.2"><ele>14</ele><time>2010-01-01T00:02:00Z</time></trkpt>
      </trkseg></trk>
    </gpx>
    """
)

KML = textwrap.dedent(
    """\
    <?xml version="1.0"?>
    <kml xmlns="http://www.opengis.net/kml/2.2"><Document>
      <Placemark>
        <name>pin</name><description>a point</description>
        <ExtendedData>
          <SchemaData><SimpleData name="Pop">1234</SimpleData>
          <SimpleData name="Kind">city</SimpleData></SchemaData>
        </ExtendedData>
        <Point><coordinates>-3.7,40.4,655</coordinates></Point>
      </Placemark>
      <Placemark>
        <name>line</name>
        <LineString><coordinates>0,0 1,1 2,0</coordinates></LineString>
      </Placemark>
      <Placemark>
        <name>donut</name>
        <Polygon>
          <outerBoundaryIs><LinearRing><coordinates>0,0 4,0 4,4 0,4 0,0</coordinates></LinearRing></outerBoundaryIs>
          <innerBoundaryIs><LinearRing><coordinates>1,1 3,1 3,3 1,3 1,1</coordinates></LinearRing></innerBoundaryIs>
        </Polygon>
      </Placemark>
    </Document></kml>
    """
)


@pytest.fixture()
def gpx_path(tmp_path):
    p = tmp_path / "trace.gpx"
    p.write_text(GPX)
    return str(p)


@pytest.fixture()
def kml_path(tmp_path):
    p = tmp_path / "places.kml"
    p.write_text(KML)
    return str(p)


def test_gpx_track_points_match_driver_reader(spark, gpx_path):
    drv, _ = read_gpx(spark, gpx_path, layer="track_points")
    dist, meta = read_gpx_distributed(spark, gpx_path, layer="track_points")
    assert meta["distributed"] is True
    assert dist.columns == drv.columns
    a = [
        (r.ogc_fid, r.ele, r.time) for r in drv.orderBy("ogc_fid").collect()
    ]
    b = [
        (r.ogc_fid, r.ele, r.time) for r in dist.orderBy("ogc_fid").collect()
    ]
    assert a == b
    # distributed reader cannot recover ancestor track/seg ids
    assert all(r.track_fid is None for r in dist.collect())
    # geometry round-trips through WKT with identical coordinates
    ga = {r.time: r.the_geom.replace(".0 ", " ") for r in drv.collect()}
    gb = {r.time: r.the_geom.replace(".0 ", " ") for r in dist.collect()}
    for t in ga:
        assert ga[t].rstrip(".0)") in gb[t] or ga[t] == gb[t]


def test_gpx_waypoints(spark, gpx_path):
    dist, _ = read_gpx_distributed(spark, gpx_path, layer="waypoints")
    rows = dist.collect()
    assert len(rows) == 1
    assert rows[0].name == "home"
    assert "POINT(-3" in rows[0].the_geom


def test_gpx_distributed_rejects_track_layer(spark, gpx_path):
    with pytest.raises(ValueError):
        read_gpx_distributed(spark, gpx_path, layer="tracks")


def test_kml_distributed_geoms_and_attrs(spark, kml_path):
    dist, _ = read_kml_distributed(spark, kml_path)
    by_name = {r.name: r for r in dist.collect()}
    assert set(by_name) == {"pin", "line", "donut"}
    # Z dropped, attrs flattened + sanitized
    assert by_name["pin"].the_geom == "POINT(-3.7 40.4)"
    assert by_name["pin"].pop == "1234"
    assert by_name["pin"].kind == "city"
    assert by_name["line"].the_geom == "LINESTRING(0 0, 1 1, 2 0)"
    assert (
        by_name["donut"].the_geom
        == "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    )


def test_kml_distributed_matches_driver_reader(spark, kml_path):
    drv, _ = read_kml(spark, kml_path)
    dist, _ = read_kml_distributed(spark, kml_path)
    assert set(dist.columns) == set(drv.columns)
    a = {r.name: r.description for r in drv.collect()}
    b = {r.name: r.description for r in dist.collect()}
    assert a == b


def test_kml_donut_area_composes_with_geo_functions(spark, kml_path):
    """The distributed KML polygon feeds straight into st_area_multi —
    reader and geometry layers agree on the multi-ring WKT dialect."""
    from pyspark.sql import functions as F

    from cartodb_importer_spark.functions.geo import st_area_multi

    dist, _ = read_kml_distributed(spark, kml_path)
    row = (
        dist.filter(F.col("name") == "donut")
        .select(st_area_multi(F.col("the_geom")).alias("a"))
        .first()
    )
    assert row.a == pytest.approx(16.0 - 4.0)
