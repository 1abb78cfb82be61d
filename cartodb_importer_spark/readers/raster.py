"""Raster reader (O18, importer.rb:406-459): GeoTIFF -> rows of 180x180
tile blocks (the reference's raster2pgsql -k 180x180 blocking).

The real decode path needs rasterio/GDAL, which is NOT in this container —
so the decode is gated: with rasterio importable we window-read true tiles;
without it, the Spark-side plumbing (schema, tiling arithmetic, row shape)
still runs against the raw bytes so the pipeline is testable end-to-end.
The fallback marks itself in meta['decoder']='stub'.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TILE = 180  # importer.rb:426-427

RASTER_SCHEMA = (
    "rid int, tile_x int, tile_y int, width int, height int, srid int,"
    " block binary"
)


def read_raster(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    try:
        import rasterio  # noqa: F401

        return _read_rasterio(spark, path)
    except ImportError:
        return _read_stub(spark, path)


def _read_rasterio(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    import rasterio
    from rasterio.windows import Window

    rows = []
    with rasterio.open(path) as src:
        srid = src.crs.to_epsg() or 4326 if src.crs else 4326
        rid = 0
        for ty in range(0, src.height, TILE):
            for tx in range(0, src.width, TILE):
                w = min(TILE, src.width - tx)
                h = min(TILE, src.height - ty)
                block = src.read(1, window=Window(tx, ty, w, h)).tobytes()
                rows.append((rid, tx // TILE, ty // TILE, w, h, srid, block))
                rid += 1
    df = spark.createDataFrame(rows, RASTER_SCHEMA)
    return df, {"import_type": ".tif", "decoder": "rasterio", "rows": len(rows)}


def _read_stub(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Deterministic fake tiling: chunk the raw file bytes into TILE*TILE
    blocks. Keeps schema/partitioning/row-shape real without GDAL."""
    raw = open(path, "rb").read()
    blocksize = TILE * TILE
    rows = []
    n = max((len(raw) + blocksize - 1) // blocksize, 1)
    side = int(n**0.5) + 1
    for rid in range(n):
        block = raw[rid * blocksize : (rid + 1) * blocksize]
        rows.append((rid, rid % side, rid // side, TILE, TILE, 4326, block))
    df = spark.createDataFrame(rows, RASTER_SCHEMA)
    return df, {
        "import_type": ".tif",
        "decoder": "stub",
        "rows": len(rows),
        "note": "rasterio unavailable; blocks are raw byte chunks",
    }


def raster_tile_stats(df: DataFrame) -> DataFrame:
    """Per-tile block sizes — the queryable raster relation (tile tables in
    the reference are rows of blocks, SURVEY §1.1)."""
    from pyspark.sql import functions as F

    return df.select(
        "rid",
        "tile_x",
        "tile_y",
        "srid",
        F.length("block").alias("block_bytes"),
    )
