"""End-to-end imports of the reference's REAL spec fixtures, pinned to the
reference's own goldens (spec/import_spec.rb: result.name /
rows_imported / import_type per fixture). The large blobs listed in the
reference checkout's .MISSING_LARGE_BLOBS (GLOBAL_ELEVATION_SIMPLE,
GridPop_2005, cp_vizzuality_export) are skipped automatically."""

import os

import pytest

from cartodb_importer_spark.importer import Importer
from cartodb_importer_spark.sinks.catalog import LocalCatalog

DATA = "/root/reference/spec/support/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures absent"
)

# (fixture, suggested_name, expected_name, expected_rows, expected_type)
# rows=None where the reference spec leaves the count commented out.
GOLDENS = [
    # spec/import_spec.rb:107-126 (#ZIP)
    ("pino.zip", None, "data", 4, ".csv"),
    ("pino.zip", "table123", "table123", 4, ".csv"),
    # :129-187 (#CSV)
    ("clubbing.csv", None, "clubbing", 1998, ".csv"),
    (
        "Food Security Aid Map_projects.csv",
        None,
        "food_security_aid_map_projects",
        827,
        ".csv",
    ),
    ("world_heritage_list.csv", None, "world_heritage_list", 937, ".csv"),
    ("estaciones2.csv", "estaciones2", "estaciones2", 30, ".csv"),
    # :189-198 (#XLSX)
    ("ngos.xlsx", None, "ngos", 76, ".xlsx"),
    # :201-227 (#KML/KMZ)
    ("rmnp.kml", None, "rmnp", 1, ".kml"),
    ("rmnp.zip", None, "rmnp", 1, ".kml"),
    ("rmnp.kmz", None, "rmnp", 1, ".kml"),
    # :230-238 (#GeoJSON)
    ("simple.json", None, "simple", 11, ".json"),
    # :241-280 (#SHP)
    ("EjemploVizzuality.zip", None, "vizzuality", 11, ".shp"),
    (
        "TM_WORLD_BORDERS_SIMPL-0.3.zip",
        None,
        "tm_world_borders_simpl_0_3",
        246,
        ".shp",
    ),
    ("TM_WORLD_BORDERS_SIMPL-0.3.zip", "borders", "borders", 246, ".shp"),
    # :304-312, :341-350 (shp zips, counts commented out in the spec)
    ("110m-glaciated-areas.zip", None, None, None, ".shp"),
    ("simon-search-spain-1297870422647.zip", None, None, None, ".shp"),
    # :328-339 (GPX; count commented out)
    ("route2.gpx", None, "route2", None, ".gpx"),
    # :363-385 (walmart latlon georef; counts commented out)
    ("walmart.csv", "walmart", "walmart", None, ".csv"),
    ("walmart_latlon.csv", "walmart_latlon", "walmart_latlon", None, ".csv"),
    # :387-398, :420-431 (CartoDB round-trip exports)
    ("CartoDB_csv_export.zip", "cartodb_csv_export", "cartodb_csv_export", 155, ".csv"),
    ("CartoDB_shp_export.zip", "cartodb_shp_export", "cartodb_shp_export", 155, ".shp"),
]


def _ids():
    seen: dict[str, int] = {}
    out = []
    for f, sug, *_ in GOLDENS:
        base = f if not sug else f"{f}:{sug}"
        seen[base] = seen.get(base, 0) + 1
        out.append(base if seen[base] == 1 else f"{base}#{seen[base]}")
    return out


@pytest.mark.parametrize(
    "fixture,suggested,name,rows,ftype", GOLDENS, ids=_ids()
)
def test_reference_fixture_import(
    spark, tmp_path, fixture, suggested, name, rows, ftype
):
    path = os.path.join(DATA, fixture)
    if not os.path.exists(path):
        pytest.skip(f"{fixture} not in checkout (.MISSING_LARGE_BLOBS)")
    catalog = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, catalog, path, suggested_name=suggested).run()
    if name is not None:
        assert res.name == name
    if rows is not None:
        assert res.rows_imported == rows
    assert res.import_type == ftype
    assert res.rows_imported >= 1


def test_vizzuality_shp_columns(spark, tmp_path):
    """spec/import_spec.rb:241-259: the vizzuality SHP must expose gid +
    the sanitized attribute columns."""
    catalog = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(
        spark, catalog, os.path.join(DATA, "EjemploVizzuality.zip")
    ).run()
    cols = set(catalog.read(spark, res.name).columns)
    expected = {
        "gid", "subclass", "x", "y", "length", "area", "angle", "name",
        "pid", "lot_navteq", "version_na", "vitesse_sp", "id",
        "nombrerest", "tipocomida",
    }
    assert expected <= cols


def test_export_roundtrip_clubbing_csv_and_kmz(spark, tmp_path):
    """spec/export_spec.rb:9-41: import the real clubbing.csv (multiline
    quoted records), then export as zipped CSV and as KMZ; re-import the
    CSV export and get the same 1998 rows back."""
    catalog = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, catalog, os.path.join(DATA, "clubbing.csv")).run()
    assert res.rows_imported == 1998

    from cartodb_importer_spark.importer import Exporter

    out = Exporter(
        spark, catalog, "clubbing", type="csv", out_dir=str(tmp_path)
    ).run()
    assert out.name == "clubbing" and out.import_type == ".csv"
    res2 = Importer(
        spark, catalog, out.path, suggested_name="clubbing_rt"
    ).run()
    assert res2.rows_imported == 1998

    kmz = Exporter(
        spark, catalog, "clubbing", type="kml", out_dir=str(tmp_path)
    ).run()
    assert kmz.name == "clubbing" and kmz.import_type == ".kml"
    import zipfile

    with zipfile.ZipFile(kmz.path) as zf:
        assert zf.namelist() == ["doc.kml"]
        kml = zf.read("doc.kml").decode()
    assert kml.count("<Placemark>") == 1998


def test_export_roundtrip_vizzuality_shp(spark, tmp_path):
    """spec/export_spec.rb:42-58: import the real vizzuality shapefile and
    re-export it as a SHP zip; the re-imported geometry count matches."""
    catalog = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(
        spark, catalog, os.path.join(DATA, "EjemploVizzuality.zip")
    ).run()
    assert res.rows_imported == 11

    from cartodb_importer_spark.importer import Exporter

    out = Exporter(
        spark, catalog, "vizzuality", type="shp", out_dir=str(tmp_path)
    ).run()
    assert out.name == "vizzuality" and out.import_type == ".shp"
    res2 = Importer(
        spark, catalog, out.path, suggested_name="vizzuality_rt"
    ).run()
    assert res2.rows_imported == 11
