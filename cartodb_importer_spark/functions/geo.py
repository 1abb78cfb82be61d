"""WKT geometry functions over the engine's ``the_geom`` string columns.

The reference delegates geometry math to PostGIS; this module provides the
subset the engine needs as pure Catalyst expressions (regexp + trig —
whole-stage codegen, no UDF, no Sedona dependency): point accessors,
bounding-box predicates, haversine distance.

Polygon support covers single-ring POLYGON text: ring parse to coordinate
arrays, shoelace area, perimeter, and centroid — all array-HOF expressions
(transform/zip_with/aggregate), still JVM-side and UDF-free. Reprojection
and multi-ring/holes stay in PostGIS after the JDBC sink (the reference's
own division of labor).
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


_POLY_RING_RX = r"^POLYGON\s*\(\(\s*(.*?)\s*\)\)$"


def st_polygon(xmin: Column, ymin: Column, xmax: Column, ymax: Column) -> Column:
    """Build a closed axis-aligned bbox POLYGON WKT (counter-clockwise
    ring, first point repeated last per the WKT spec)."""
    p = lambda x, y: F.concat(x.cast("string"), F.lit(" "), y.cast("string"))  # noqa: E731
    return F.concat(
        F.lit("POLYGON(("),
        p(xmin, ymin), F.lit(", "),
        p(xmax, ymin), F.lit(", "),
        p(xmax, ymax), F.lit(", "),
        p(xmin, ymax), F.lit(", "),
        p(xmin, ymin),
        F.lit("))"),
    )


def _ring_points(geom: Column) -> Column:
    """Split a single-ring POLYGON's ring text into 'x y' point strings."""
    ring = F.regexp_extract(geom, _POLY_RING_RX, 1)
    return F.split(ring, r",\s*")


def st_ring_xs(geom: Column) -> Column:
    """X coordinates of a POLYGON's outer ring (closed: last == first)."""
    return F.transform(
        _ring_points(geom),
        lambda pt: F.split(pt, r"\s+").getItem(0).cast("double"),
    )


def st_ring_ys(geom: Column) -> Column:
    """Y coordinates of a POLYGON's outer ring (closed: last == first)."""
    return F.transform(
        _ring_points(geom),
        lambda pt: F.split(pt, r"\s+").getItem(1).cast("double"),
    )


def _fsum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def st_area_xy(xs: Column, ys: Column) -> Column:
    """Planar shoelace area from pre-parsed coordinate arrays.

    sum(x_i*y_{i+1} - x_{i+1}*y_i) over consecutive vertex pairs, halved
    and absolute — signs cancel for either winding order. Taking arrays
    (not WKT) lets a query parse the ring ONCE into projection columns
    and feed all four metrics from them: interpreted HOF expressions get
    no common-subexpression elimination, so each WKT-taking call would
    otherwise re-run the regexp+split+cast parse per row."""
    n1 = F.size(xs) - 1
    cross = _fsum(
        F.zip_with(F.slice(xs, 1, n1), F.slice(ys, 2, n1), lambda x, y: x * y)
    ) - _fsum(
        F.zip_with(F.slice(xs, 2, n1), F.slice(ys, 1, n1), lambda x, y: x * y)
    )
    return F.abs(cross) / 2.0


def st_area(geom: Column) -> Column:
    """Planar shoelace area of a single-ring POLYGON WKT (closed ring)."""
    return st_area_xy(st_ring_xs(geom), st_ring_ys(geom))


def st_perimeter_xy(xs: Column, ys: Column) -> Column:
    """Planar perimeter from pre-parsed coordinate arrays."""
    n1 = F.size(xs) - 1
    dx = F.zip_with(F.slice(xs, 2, n1), F.slice(xs, 1, n1), lambda a, b: a - b)
    dy = F.zip_with(F.slice(ys, 2, n1), F.slice(ys, 1, n1), lambda a, b: a - b)
    return _fsum(F.zip_with(dx, dy, lambda a, b: F.sqrt(a * a + b * b)))


def st_perimeter(geom: Column) -> Column:
    """Planar perimeter of a single-ring POLYGON (sum of edge lengths)."""
    return st_perimeter_xy(st_ring_xs(geom), st_ring_ys(geom))


def _centroid_cross(xs: Column, ys: Column) -> Column:
    n1 = F.size(xs) - 1
    x1, x2 = F.slice(xs, 1, n1), F.slice(xs, 2, n1)
    y1, y2 = F.slice(ys, 1, n1), F.slice(ys, 2, n1)
    return F.zip_with(
        F.zip_with(x1, y2, lambda x, y: x * y),
        F.zip_with(x2, y1, lambda x, y: x * y),
        lambda a, b: a - b,
    )


def st_centroid_x_xy(xs: Column, ys: Column) -> Column:
    """X of the area-weighted centroid from pre-parsed arrays (standard
    shoelace centroid; NULL for degenerate zero-area rings — callers
    filter those, matching PostGIS ST_Centroid's POINT EMPTY behavior)."""
    n1 = F.size(xs) - 1
    x1, x2 = F.slice(xs, 1, n1), F.slice(xs, 2, n1)
    cross = _centroid_cross(xs, ys)
    signed_area = _fsum(cross) / 2.0
    sx = _fsum(
        F.zip_with(
            F.zip_with(x1, x2, lambda a, b: a + b), cross, lambda s, c: s * c
        )
    )
    # try_divide: degenerate zero-area ring -> NULL (ANSI mode would throw
    # before any downstream filter gets the chance to prune the row).
    return F.try_divide(sx, 6.0 * signed_area)


def st_centroid_x(geom: Column) -> Column:
    """X of the area-weighted centroid of a single-ring POLYGON."""
    return st_centroid_x_xy(st_ring_xs(geom), st_ring_ys(geom))


def st_centroid_y_xy(xs: Column, ys: Column) -> Column:
    """Y of the area-weighted centroid from pre-parsed arrays."""
    n1 = F.size(ys) - 1
    y1, y2 = F.slice(ys, 1, n1), F.slice(ys, 2, n1)
    cross = _centroid_cross(xs, ys)
    signed_area = _fsum(cross) / 2.0
    sy = _fsum(
        F.zip_with(
            F.zip_with(y1, y2, lambda a, b: a + b), cross, lambda s, c: s * c
        )
    )
    return F.try_divide(sy, 6.0 * signed_area)


def st_centroid_y(geom: Column) -> Column:
    """Y of the area-weighted centroid of a single-ring POLYGON."""
    return st_centroid_y_xy(st_ring_xs(geom), st_ring_ys(geom))


def st_point_in_polygon(x: Column, y: Column, geom: Column) -> Column:
    """Ray-casting point-in-polygon over a single-ring POLYGON: counts
    edge crossings of the horizontal ray to +inf. Strictly-inside
    semantics for points clear of the boundary (boundary points are
    engine-defined, as in most planar-geometry libraries).

    Implemented as one aggregate over edge structs — no UDF; O(ring
    length) per row, constant memory."""
    xs, ys = st_ring_xs(geom), st_ring_ys(geom)
    n1 = F.size(xs) - 1
    edges = F.zip_with(
        F.zip_with(F.slice(xs, 1, n1), F.slice(ys, 1, n1), lambda a, b: F.struct(a.alias("x"), b.alias("y"))),
        F.zip_with(F.slice(xs, 2, n1), F.slice(ys, 2, n1), lambda a, b: F.struct(a.alias("x"), b.alias("y"))),
        lambda p, q: F.struct(p.alias("p"), q.alias("q")),
    )

    def crosses(e: Column) -> Column:
        py_, qy = e["p"]["y"], e["q"]["y"]
        px, qx = e["p"]["x"], e["q"]["x"]
        straddles = (py_ > y) != (qy > y)
        # try_divide: horizontal edges (qy == py_) never straddle, but the
        # guard must not rely on conjunct evaluation order under ANSI mode.
        x_at_y = px + F.try_divide(y - py_, qy - py_) * (qx - px)
        return straddles & (x < x_at_y)

    n_cross = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc + F.when(crosses(e), 1).otherwise(0),
    )
    return n_cross % 2 == 1


_POLY_BODY_RX = r"^POLYGON\s*\(\s*(.*)\s*\)$"


def st_rings(geom: Column) -> Column:
    """All rings of a (multi-ring) POLYGON as an array of ring-body strings
    — element 1 is the shell, the rest are holes. Pure regexp/split."""
    body = F.regexp_extract(geom, _POLY_BODY_RX, 1)
    return F.transform(
        F.split(body, r"\)\s*,\s*\("),
        lambda r: F.regexp_replace(r, r"^\(|\)$", ""),
    )


def _ring_txt_xs(ring: Column) -> Column:
    return F.transform(
        F.split(ring, r",\s*"),
        lambda pt: F.split(F.trim(pt), r"\s+").getItem(0).cast("double"),
    )


def _ring_txt_ys(ring: Column) -> Column:
    return F.transform(
        F.split(ring, r",\s*"),
        lambda pt: F.split(F.trim(pt), r"\s+").getItem(1).cast("double"),
    )


def _ring_abs_area(ring: Column) -> Column:
    """Unsigned shoelace area of one closed ring-body string."""
    xs, ys = _ring_txt_xs(ring), _ring_txt_ys(ring)
    n1 = F.size(xs) - 1
    cross = _fsum(
        F.zip_with(F.slice(xs, 1, n1), F.slice(ys, 2, n1), lambda x, y: x * y)
    ) - _fsum(
        F.zip_with(F.slice(xs, 2, n1), F.slice(ys, 1, n1), lambda x, y: x * y)
    )
    return F.abs(cross) / 2.0


def st_area_multi(geom: Column) -> Column:
    """Planar area of a POLYGON with optional holes: |shell| − Σ|holes|.
    Winding order is irrelevant (each ring's area is taken unsigned).
    One projection of nested array HOFs — no UDF, no explode; ring count
    and ring length stay O(text length) per row."""
    areas = F.transform(st_rings(geom), _ring_abs_area)
    shell = F.element_at(areas, 1)
    holes = F.aggregate(
        F.slice(areas, 2, F.greatest(F.size(areas) - 1, F.lit(0))),
        F.lit(0.0),
        lambda acc, a: acc + a,
    )
    return shell - holes


def _ring_crossings(ring: Column, x: Column, y: Column) -> Column:
    """Ray-casting crossing count of one ring for point (x, y)."""
    xs, ys = _ring_txt_xs(ring), _ring_txt_ys(ring)
    n1 = F.size(xs) - 1
    edges = F.zip_with(
        F.zip_with(
            F.slice(xs, 1, n1),
            F.slice(ys, 1, n1),
            lambda a, b: F.struct(a.alias("x"), b.alias("y")),
        ),
        F.zip_with(
            F.slice(xs, 2, n1),
            F.slice(ys, 2, n1),
            lambda a, b: F.struct(a.alias("x"), b.alias("y")),
        ),
        lambda p, q: F.struct(p.alias("p"), q.alias("q")),
    )

    def crosses(e: Column) -> Column:
        py_, qy = e["p"]["y"], e["q"]["y"]
        px, qx = e["p"]["x"], e["q"]["x"]
        straddles = (py_ > y) != (qy > y)
        x_at_y = px + F.try_divide(y - py_, qy - py_) * (qx - px)
        return straddles & (x < x_at_y)

    return F.aggregate(
        edges, F.lit(0), lambda acc, e: acc + F.when(crosses(e), 1).otherwise(0)
    )


def st_point_in_polygon_multi(x: Column, y: Column, geom: Column) -> Column:
    """Even-odd point-in-polygon over ALL rings: odd total crossings =
    inside. Holes fall out naturally — a point inside a hole crosses the
    shell once and the hole once (even → outside)."""
    total = F.aggregate(
        F.transform(st_rings(geom), lambda r: _ring_crossings(r, x, y)),
        F.lit(0),
        lambda acc, c: acc + c,
    )
    return total % 2 == 1


def _ring_geodesic_area_km2(ring: Column) -> Column:
    """Unsigned spherical area (km²) of one closed lon/lat ring via the
    Chamberlain–Duquette formula: R²/2 · |Σ (λ₂−λ₁)(2 + sin φ₁ + sin φ₂)|
    (public formula, also used by turf.js; exact for spherical bands)."""
    lam = F.transform(_ring_txt_xs(ring), lambda v: F.radians(v))
    phi = F.transform(_ring_txt_ys(ring), lambda v: F.radians(v))
    n1 = F.size(lam) - 1
    dlam = F.zip_with(
        F.slice(lam, 2, n1), F.slice(lam, 1, n1), lambda a, b: a - b
    )
    sphi = F.zip_with(
        F.slice(phi, 1, n1),
        F.slice(phi, 2, n1),
        lambda a, b: 2.0 + F.sin(a) + F.sin(b),
    )
    total = _fsum(F.zip_with(dlam, sphi, lambda d, s: d * s))
    return F.abs(total) * (EARTH_RADIUS_KM**2) / 2.0


def st_geodesic_area_rad_xy(lam: Column, phi: Column) -> Column:
    """Chamberlain–Duquette spherical area (km²) of ONE closed ring from
    pre-parsed RADIAN coordinate arrays. Callers should materialize lam and
    phi as projection columns first: interpreted HOF trees re-evaluate a
    referenced expression per use, so feeding parse trees directly here
    re-runs the WKT parse ~4x per row (slices of lam/phi each re-evaluate
    their argument); attribute references are free."""
    n1 = F.size(lam) - 1
    dlam = F.zip_with(
        F.slice(lam, 2, n1), F.slice(lam, 1, n1), lambda a, b: a - b
    )
    sphi = F.zip_with(
        F.slice(phi, 1, n1),
        F.slice(phi, 2, n1),
        lambda a, b: 2.0 + F.sin(a) + F.sin(b),
    )
    total = _fsum(F.zip_with(dlam, sphi, lambda d, s: d * s))
    return F.abs(total) * (EARTH_RADIUS_KM**2) / 2.0


def st_geodesic_area_km2(geom: Column) -> Column:
    """Spherical-earth area in km² of a POLYGON in lon/lat degrees, holes
    subtracted — the geodesic counterpart of st_area_multi."""
    areas = F.transform(st_rings(geom), _ring_geodesic_area_km2)
    shell = F.element_at(areas, 1)
    holes = F.aggregate(
        F.slice(areas, 2, F.greatest(F.size(areas) - 1, F.lit(0))),
        F.lit(0.0),
        lambda acc, a: acc + a,
    )
    return shell - holes


def parse_wkt_polygon(wkt: str) -> list[list[tuple[float, float]]]:
    """Driver-side parse of a LITERAL polygon WKT into rings of (x, y)
    vertex tuples (ring 0 = shell, rest = holes)."""
    import re as _re

    m = _re.match(r"^POLYGON\s*\((.*)\)$", wkt.strip(), _re.S)
    if not m:
        raise ValueError(f"not a POLYGON WKT: {wkt[:50]!r}")
    rings = []
    for body in _re.split(r"\)\s*,\s*\(", m.group(1)):
        body = body.strip().lstrip("(").rstrip(")")
        rings.append(
            tuple(
                (float(p.split()[0]), float(p.split()[1]))
                for p in _re.split(r",\s*", body)
            )
        )
    return rings


def st_point_in_polygon_const(x: Column, y: Column, wkt: str) -> Column:
    """Even-odd containment against a CONSTANT polygon (holes supported).

    The WKT parses ONCE on the driver; the per-row test unrolls to plain
    comparisons/arithmetic per edge — whole-stage-codegen friendly, unlike
    the column variants whose regexp+split+HOF tree re-parses the literal
    text for every row (interpreted, no CSE). Use this whenever the
    polygon is a Python-string constant; use st_point_in_polygon_multi
    when the polygon varies per row."""
    crossings = F.lit(0)
    for ring in parse_wkt_polygon(wkt):
        for (px, py), (qx, qy) in zip(ring, ring[1:]):
            if py == qy:
                continue  # horizontal edge never straddles the ray
            x_at_y = px + (y - F.lit(py)) / F.lit(qy - py) * F.lit(qx - px)
            straddles = (F.lit(py) > y) != (F.lit(qy) > y)
            crossings = crossings + F.when(
                straddles & (x < x_at_y), 1
            ).otherwise(0)
    return crossings % 2 == 1


def shoelace_area(ring: list[tuple[float, float]]) -> float:
    """Driver-side unsigned shoelace area of one closed ring."""
    s = sum(px * qy - qx * py for (px, py), (qx, qy) in zip(ring, ring[1:]))
    return abs(s) / 2.0


def polygon_area_const(wkt: str) -> float:
    """Driver-side planar area of a constant polygon, holes subtracted."""
    rings = parse_wkt_polygon(wkt)
    return shoelace_area(rings[0]) - sum(shoelace_area(r) for r in rings[1:])


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
