"""Shape-faithful stand-ins for the reference's three missing large blobs
(.MISSING_LARGE_BLOBS: cp_vizzuality_export.csv, GLOBAL_ELEVATION_SIMPLE.zip,
GridPop_2005.zip — VERDICT r08 item 5). The real files aren't in the
checkout, so tests/test_reference_fixtures.py skips their spec rows; these
tests synthesize inputs with the SAME schema/extent/route shape and pin the
spec's own goldens where the spec states them:

* cp_vizzuality_export.csv — a CartoDB CSV export (cartodb_id, attribute
  columns, longitude/latitude, timestamps, the_geom GeoJSON points — the
  exact header family of the in-checkout CartoDB_csv_export.zip), 19,235
  rows; import_spec.rb:156-163 pins name/rows/type.
* GLOBAL_ELEVATION_SIMPLE.zip — a zipped global int16 elevation GeoTIFF
  sized so raster2pgsql-style 180x180 blocking yields exactly 1,500 tiles
  (9000x5400 px = 50x30 tiles); import_spec.rb:282-291 pins
  name/rows/type.
* GridPop_2005.zip — a zipped population-grid GeoTIFF; the spec ships no
  assertion for it (listed in .MISSING_LARGE_BLOBS only), so the pin is
  the generic import contract: sanitized name, .tif route, tile count
  from its own dimensions.
"""

import csv
import os
import zipfile

import numpy as np
import pytest

from cartodb_importer_spark.importer import Importer
from cartodb_importer_spark.readers.tiff import encode_tiff_gray
from cartodb_importer_spark.sinks.catalog import LocalCatalog


@pytest.fixture(scope="module")
def standin_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("missing_blob_standins")


def _write_cp_vizzuality(path: str, n_rows: int = 19235) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            [
                "cartodb_id",
                "mean_lateness",
                "late_count",
                "longitude",
                "latitude",
                "created_at",
                "updated_at",
                "the_geom",
            ]
        )
        for i in range(1, n_rows + 1):
            lon = round(-180 + (i * 7 % 36000) / 100.0, 4)
            lat = round(-90 + (i * 11 % 18000) / 100.0, 4)
            w.writerow(
                [
                    i,
                    round((i % 97) / 10.0, 1),
                    i % 13,
                    lon,
                    lat,
                    "2011-10-04 12:19:57.805327",
                    "2011-10-04 12:19:57.812332",
                    '{"type":"Point","coordinates":[%s,%s]}' % (lon, lat),
                ]
            )


def test_cp_vizzuality_export_standin(spark, standin_dir, tmp_path):
    """import_spec.rb:156-163: name 'cp_vizzuality_export', 19,235 rows,
    '.csv'."""
    src = str(standin_dir / "cp_vizzuality_export.csv")
    if not os.path.exists(src):
        _write_cp_vizzuality(src)
    catalog = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, catalog, src).run()
    assert res.name == "cp_vizzuality_export"
    assert res.rows_imported == 19235
    assert res.import_type == ".csv"
    landed = catalog.read(spark, res.name)
    # the CartoDB-export the_geom column must have fed O11's rebuild
    assert "the_geom" in landed.columns
    assert landed.filter("the_geom IS NOT NULL").count() == 19235


def _elevation_zip(path: str) -> None:
    # 9000x5400 px -> ceil(9000/180) x ceil(5400/180) = 50x30 = 1500 tiles,
    # global extent (0.04 deg/px from (-180, 90)); smooth synthetic relief
    # so deflate keeps the fixture small
    yy, xx = np.mgrid[0:5400, 0:9000]
    band = (
        2000.0 * np.sin(yy / 600.0) * np.cos(xx / 900.0) + 500.0
    ).astype(np.int16)
    tif = encode_tiff_gray(
        band,
        srid=4326,
        pixel_scale=(0.04, 0.04),
        tiepoint=(0.0, 0.0, 0.0, -180.0, 90.0, 0.0),
        compression="deflate",
        predictor=2,
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("global_elevation_simple.tif", tif)


def test_global_elevation_simple_standin(spark, standin_dir, tmp_path):
    """import_spec.rb:282-291: name 'global_elevation_simple', 1,500 tile
    rows (raster2pgsql -k 180x180 over the full extent), '.tif' — routed
    through O4 zip explosion into O18's real pure-python decode path."""
    src = str(standin_dir / "GLOBAL_ELEVATION_SIMPLE.zip")
    if not os.path.exists(src):
        _elevation_zip(src)
    catalog = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, catalog, src).run()
    assert res.name == "global_elevation_simple"
    assert res.rows_imported == 1500
    assert res.import_type == ".tif"
    landed = catalog.read(spark, res.name)
    assert landed.count() == 1500
    # real decode, not the stub: full-size interior tiles carry real pixels
    one = landed.filter("tile_x = 0 AND tile_y = 0").collect()[0]
    assert (one["width"], one["height"], one["srid"]) == (180, 180, 4326)
    got = np.frombuffer(one["block"], dtype=np.int16).reshape(180, 180)
    yy, xx = np.mgrid[0:180, 0:180]
    want = (2000.0 * np.sin(yy / 600.0) * np.cos(xx / 900.0) + 500.0).astype(
        np.int16
    )
    assert np.array_equal(got, want)


def test_gridpop_2005_standin(spark, standin_dir, tmp_path):
    """GridPop_2005.zip has no spec assertion (missing blob only) — pin the
    generic contract: sanitized table name, .tif route, tile count from
    the raster's own 720x360 dimensions (4x2 = 8 tiles)."""
    src = str(standin_dir / "GridPop_2005.zip")
    if not os.path.exists(src):
        rng = np.random.default_rng(2005)
        band = rng.integers(0, 5000, size=(360, 720)).astype(np.uint16)
        tif = encode_tiff_gray(
            band,
            srid=4326,
            pixel_scale=(0.5, 0.5),
            tiepoint=(0.0, 0.0, 0.0, -180.0, 90.0, 0.0),
            compression="deflate",
        )
        with zipfile.ZipFile(src, "w", zipfile.ZIP_STORED) as zf:
            zf.writestr("GridPop_2005.tif", tif)
    catalog = LocalCatalog(str(tmp_path / "wh"))
    res = Importer(spark, catalog, src).run()
    assert res.name == "gridpop_2005"
    assert res.rows_imported == 8
    assert res.import_type == ".tif"
