"""WKT geometry functions over the engine's ``the_geom`` string columns.

The reference delegates geometry math to PostGIS; this module provides the
subset the engine needs as pure Catalyst expressions (regexp + trig —
whole-stage codegen, no UDF, no Sedona dependency): point accessors,
bounding-box predicates, haversine distance.

Not a GIS: polygons/projections beyond point ops stay in PostGIS after the
JDBC sink (the reference's own division of labor).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PT_X_RX = r"^POINT\(\s*(-?[0-9.eE+]+)\s"
_PT_Y_RX = r"\s(-?[0-9.eE+]+)\s*\)$"

EARTH_RADIUS_KM = 6371.0088


def st_x(geom: Column) -> Column:
    """X (longitude) of a WKT POINT; NULL for non-points."""
    x = F.regexp_extract(geom, _PT_X_RX, 1)
    return F.when(x != "", x.cast("double"))


def st_y(geom: Column) -> Column:
    """Y (latitude) of a WKT POINT; NULL for non-points."""
    y = F.regexp_extract(geom, _PT_Y_RX, 1)
    return F.when(y != "", y.cast("double"))


def st_point(x: Column, y: Column) -> Column:
    """Build WKT POINT text (unvalidated; validation = georef.point_wkt)."""
    return F.concat(
        F.lit("POINT("), x.cast("string"), F.lit(" "), y.cast("string"), F.lit(")")
    )


def bbox_contains(
    geom: Column, xmin: float, ymin: float, xmax: float, ymax: float
) -> Column:
    """True when a WKT POINT falls inside the closed box."""
    x, y = st_x(geom), st_y(geom)
    return (
        (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
    )


def haversine_km(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Great-circle distance in km (spherical earth)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cell(
    lon: Column, lat: Column, cell_deg: float = 1.0
) -> Column:
    """Integer grid-cell id for a lon/lat point (floor binning) — the
    write-time spatial partition key: partitionBy(grid_cell) lets bbox
    queries prune the parquet scan to touched cells, the poor-man's
    spatial index that actually scales (SCALE.md geo note)."""
    xi = F.floor((lon + 180.0) / cell_deg).cast("int")
    yi = F.floor((lat + 90.0) / cell_deg).cast("int")
    cells_x = int(360 / cell_deg)
    return (yi * cells_x + xi).cast("int")
