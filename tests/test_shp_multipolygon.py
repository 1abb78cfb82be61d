"""SHP multi-outer-ring assembly (VERDICT r3 item 3).

The shapefile spec distinguishes MULTIPOLYGON members purely by ring
winding: outer rings clockwise, holes counterclockwise. The reference
reaches the same semantics through shp2pgsql (importer.rb:367) and pins it
with the `multipoly` golden (spec/import_spec.rb:408-416: 601 rows and an
ST_AsGeoJSON value for the first feature) — ported here as
test_multipoly_golden_import.
"""

import os
import re
import struct
import zipfile

import pytest

from cartodb_importer_spark.readers.shp import (
    _polygon_wkt,
    _signed_area,
    read_shp,
)
from cartodb_importer_spark.sinks.files import _wkt_to_kml, export_shp_zip

# ring coordinates: two clockwise outers, one counterclockwise hole in A
OUTER_A = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
HOLE_A = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)]
OUTER_B = [(20.0, 0.0), (20.0, 5.0), (25.0, 5.0), (25.0, 0.0), (20.0, 0.0)]


def _write_polygon_shp(path, rings):
    """Minimal single-record polygon .shp per the ESRI spec."""
    pts = [p for r in rings for p in r]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    content = struct.pack("<i4d2i", 5, min(xs), min(ys), max(xs), max(ys),
                          len(rings), len(pts))
    start = 0
    for r in rings:
        content += struct.pack("<i", start)
        start += len(r)
    for x, y in pts:
        content += struct.pack("<2d", x, y)
    rec = struct.pack(">2i", 1, len(content) // 2) + content
    file_len_words = (100 + len(rec)) // 2
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    header += struct.pack(">i", file_len_words)
    header += struct.pack("<2i", 1000, 5)
    header += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    header += struct.pack("<4d", 0, 0, 0, 0)
    assert len(header) == 100
    with open(path, "wb") as f:
        f.write(header + rec)


def test_ring_orientation_constants():
    assert _signed_area(OUTER_A) < 0  # clockwise = outer
    assert _signed_area(HOLE_A) > 0  # counterclockwise = hole
    assert _signed_area(OUTER_B) < 0


def test_single_outer_with_hole_stays_polygon():
    wkt = _polygon_wkt([OUTER_A, HOLE_A])
    assert wkt.startswith("POLYGON(")
    assert wkt.count("(") == 3  # shell + hole + wrapper


def test_two_outers_become_multipolygon_with_hole_assigned():
    wkt = _polygon_wkt([OUTER_A, HOLE_A, OUTER_B])
    assert wkt.startswith("MULTIPOLYGON(")
    polys = re.findall(r"\((\([^()]*\)(?:\s*,\s*\([^()]*\))*)\)", wkt)
    assert len(polys) == 2
    # hole rides with outer A (contains its first vertex), not B
    assert "2.0 2.0" in polys[0] and "20.0" not in polys[0]
    assert "20.0 0.0" in polys[1] and polys[1].count("(") == 1  # B: one ring


def test_orphan_hole_promoted_to_polygon():
    # hole-wound ring located outside every outer becomes its own polygon
    orphan = [(40.0, 40.0), (44.0, 40.0), (44.0, 44.0), (40.0, 44.0), (40.0, 40.0)]
    assert _signed_area(orphan) > 0
    wkt = _polygon_wkt([OUTER_A, OUTER_B, orphan])
    polys = re.findall(r"\((\([^()]*\)(?:\s*,\s*\([^()]*\))*)\)", wkt)
    assert len(polys) == 3


def test_nested_hole_assigned_to_smallest_containing_outer():
    # big outer contains small outer; hole inside the small one must attach
    # to the small (smallest-area containment), not the big
    big = [(-50.0, -50.0), (-50.0, 50.0), (50.0, 50.0), (50.0, -50.0), (-50.0, -50.0)]
    assert _signed_area(big) < 0
    wkt = _polygon_wkt([big, OUTER_A, HOLE_A])
    polys = re.findall(r"\((\([^()]*\)(?:\s*,\s*\([^()]*\))*)\)", wkt)
    assert len(polys) == 2
    small_poly = next(p for p in polys if "0.0 10.0" in p)
    assert "2.0 2.0" in small_poly


def test_shp_multipolygon_roundtrip(spark, tmp_path):
    """reader -> MULTIPOLYGON WKT -> export_shp_zip -> reader, byte-equal."""
    shp = str(tmp_path / "multi.shp")
    _write_polygon_shp(shp, [OUTER_A, HOLE_A, OUTER_B])
    df, _ = read_shp(spark, shp)
    rows = df.collect()
    assert len(rows) == 1
    wkt = rows[0]["the_geom"]
    assert wkt.startswith("MULTIPOLYGON(")

    out = export_shp_zip(df, "multi_rt", str(tmp_path / "out"))
    with zipfile.ZipFile(out) as zf:
        zf.extractall(str(tmp_path / "rt"))
    df2, _ = read_shp(spark, str(tmp_path / "rt" / "multi_rt.shp"))
    assert df2.collect()[0]["the_geom"] == wkt


def test_kml_export_multipolygon_multigeometry():
    wkt = _polygon_wkt([OUTER_A, HOLE_A, OUTER_B])
    kml = _wkt_to_kml(wkt)
    assert kml.startswith("<MultiGeometry>") and kml.endswith("</MultiGeometry>")
    assert kml.count("<Polygon>") == 2
    assert kml.count("<outerBoundaryIs>") == 2
    assert kml.count("<innerBoundaryIs>") == 1


REF_FIXTURE = "/root/reference/spec/support/data/CartoDB_csv_multipoly_export.zip"


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="reference fixture absent")
def test_multipoly_golden_import(spark, tmp_path):
    """spec/import_spec.rb:408-416: 601 rows; the spec's
    ST_AsGeoJSON(the_geom, 0) golden is a 1-polygon MultiPolygon whose 5
    vertices all round to (2, 39). Postgres `limit 1` row order isn't
    reproducible here, so the golden is pinned to the matching feature
    (cartodb_id 140) plus an all-rows geometry-kind sweep."""
    from cartodb_importer_spark.importer import Importer
    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    catalog = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, catalog, REF_FIXTURE).run()
    assert res.rows_imported == 601
    df = catalog.read(spark, res.name)
    geoms = {r["cartodb_id"]: r["the_geom"] for r in
             df.select("cartodb_id", "the_geom").collect()}
    assert len(geoms) == 601
    assert all(g.startswith("MULTIPOLYGON(") for g in geoms.values())
    geom = geoms[140]
    polys = re.findall(r"\((\([^()]*\)(?:\s*,\s*\([^()]*\))*)\)", geom)
    assert len(polys) == 1
    pts = re.findall(r"(-?[\d.eE+]+) (-?[\d.eE+]+)", polys[0])
    assert len(pts) == 5
    assert all((round(float(x)), round(float(y))) == (2, 39) for x, y in pts)
