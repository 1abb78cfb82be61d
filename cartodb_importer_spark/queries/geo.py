"""Geometry-function query surface: WKT point accessors, bbox filtering,
haversine distance — over the_geom columns built the same way the import
pipeline builds them (O13 semantics)."""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf string-annotation resolution
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import bbox_contains, haversine_km, st_point, st_x, st_y
from . import Tables, query


def _spread_polygon_rows(box: DataFrame, key: str = "l_orderkey") -> DataFrame:
    """Re-establish compute parallelism between the bbox aggregate and the
    WKT build/parse/ring math (r13, guide §2.5 — parallelism must follow
    the WORK, not the bytes): the per-order bbox frame is ~40 bytes/row,
    so AQE coalesces the aggregate's output to a couple of partitions
    (measured 2 at sf0.1) and the downstream per-row format+regex+fold
    CPU — ~16us/row, 2.5 of geo_polygon_metrics' 4.4 s — serializes onto
    2 of 32 cores. An explicit hash repartition on the SAME group key
    moves only the five narrow columns and spreads the row-proportional
    CPU across the cluster; 2x defaultParallelism tracks executor width
    (the r12 directed-edges/bucket-spread rule), never a local constant.
    At 100 TB the exchange stays negligible relative to the per-row parse
    it parallelizes (narrow rows in, CPU-dense rows out)."""
    n = 2 * box.sparkSession.sparkContext.defaultParallelism
    return box.repartition(n, F.col(key))


@query(
    "geo_point_accessors",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, l_linenumber,
             'POINT(' || CAST(l_tax AS VARCHAR) || ' ' || CAST(l_discount AS VARCHAR) || ')' AS the_geom
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST(regexp_extract(the_geom, '^POINT\\(\\s*(-?[0-9.eE+]+)\\s', 1) AS DOUBLE) AS x,
           CAST(regexp_extract(the_geom, '\\s(-?[0-9.eE+]+)\\s*\\)$', 1) AS DOUBLE)      AS y
    FROM g
    """,
)
def geo_point_accessors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_x/st_y round-trip through WKT text built by st_point.

    The narrow projection is conditionally spread before the WKT
    round-trip (r13): the sf0.1 lineitem file is one row group -> one
    scan partition, so the 600k-row format+regex work ran on a single
    core; at 100 TB the scan splits naturally and the spread is a no-op
    (the r12 _spread_narrow_scan rule, guide §2.5)."""
    from ..llm.dedup import _spread_narrow_scan

    t = Tables(spark, sf_dir)
    g = _spread_narrow_scan(
        t.lineitem.select("l_orderkey", "l_linenumber", "l_tax", "l_discount"),
        "l_orderkey",
    ).select(
        "l_orderkey",
        "l_linenumber",
        st_point(F.col("l_tax"), F.col("l_discount")).alias("the_geom"),
    )
    return g.select(
        "l_orderkey",
        "l_linenumber",
        st_x(F.col("the_geom")).alias("x"),
        st_y(F.col("the_geom")).alias("y"),
    )


@query(
    "geo_bbox_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_tax AS x, l_discount AS y
    FROM lineitem
    WHERE l_tax >= 0.02 AND l_tax <= 0.06
      AND l_discount >= 0.01 AND l_discount <= 0.05
    """,
)
def geo_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box containment over WKT points (the spatial-index-free
    filter; at scale, pair with write-time partitioning on a geohash)."""
    t = Tables(spark, sf_dir)
    # r13 measured NEGATIVE: the conditional scan spread that wins on
    # geo_point_accessors (1.36 -> 0.66 s) makes THIS query ~10% slower
    # (interleaved A/B: 2.62 vs 2.89 s min) — the filter keeps the
    # exchange from paying for itself. Left on the fused single-stage
    # scan form.
    g = t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_tax").alias("x"),
        F.col("l_discount").alias("y"),
        st_point(F.col("l_tax"), F.col("l_discount")).alias("the_geom"),
    )
    return g.filter(
        bbox_contains(F.col("the_geom"), 0.02, 0.01, 0.06, 0.05)
    ).select("l_orderkey", "l_linenumber", "x", "y")


@query(
    "geo_haversine",
    oracle="""
    SELECT event_id,
           round(2 * 6371.0088 * asin(sqrt(
             pow(sin(radians((40.4 - (CAST(user_id AS DOUBLE) / 2 - 37)) / 2)), 2)
             + cos(radians(CAST(user_id AS DOUBLE) / 2 - 37)) * cos(radians(40.4))
               * pow(sin(radians((-3.7 - (CAST(value AS DOUBLE) / 6 - 30)) / 2)), 2)
           )), 4) AS dist_km
    FROM events
    """,
)
def geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance from synthetic per-event coordinates to Madrid
    (40.4N, -3.7E) — pure JVM trig, codegen-friendly."""
    t = Tables(spark, sf_dir)
    lat = F.col("user_id").cast("double") / 2 - 37  # [-37, 38]ish
    lon = F.col("value").cast("double") / 6 - 30
    return t.events.select(
        "event_id",
        F.round(
            haversine_km(lon, lat, F.lit(-3.7), F.lit(40.4)), 4
        ).alias("dist_km"),
    )


@query(
    "geo_polygon_metrics",
    oracle="""
    WITH box AS (
      SELECT l_orderkey,
             min(l_tax) AS xmin, min(l_discount) AS ymin,
             max(l_tax) AS xmax, max(l_discount) AS ymax
      FROM lineitem GROUP BY 1
    )
    SELECT l_orderkey,
           round((xmax - xmin) * (ymax - ymin), 6)             AS area,
           round(2 * ((xmax - xmin) + (ymax - ymin)), 6)       AS perimeter,
           round((xmin + xmax) / 2, 6)                         AS cx,
           round((ymin + ymax) / 2, 6)                         AS cy
    FROM box
    WHERE xmax > xmin AND ymax > ymin
    """,
)
def geo_polygon_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon area/perimeter/centroid via the WKT ring parser: each
    order's lineitem points collapse to a bbox POLYGON WKT, which is then
    parsed BACK into coordinate arrays and measured with the shoelace
    formula — array HOFs end to end, no UDF. The oracle derives the same
    numbers analytically from min/max, so the WKT round-trip, ring parse,
    and shoelace/centroid algebra are verified against an independent
    formulation. Degenerate (zero-area) rings are filtered, matching
    PostGIS ST_Centroid's refusal to emit a point for empty geometry."""
    from ..functions.geo import (
        st_area_xy,
        st_centroid_x_xy,
        st_centroid_y_xy,
        st_perimeter_xy,
        st_polygon,
        st_ring_xs,
        st_ring_ys,
    )

    t = Tables(spark, sf_dir)
    box = t.lineitem.groupBy("l_orderkey").agg(
        F.min("l_tax").alias("xmin"),
        F.min("l_discount").alias("ymin"),
        F.max("l_tax").alias("xmax"),
        F.max("l_discount").alias("ymax"),
    )
    # Degeneracy is decided on the analytic extents, not the shoelace
    # result: a zero-height ring's shoelace sum is fp noise (~1e-19), not
    # exactly 0, and must not sneak past an `area > 0` filter.
    box = box.filter(
        (F.col("xmax") > F.col("xmin")) & (F.col("ymax") > F.col("ymin"))
    )
    g = _spread_polygon_rows(box).select(
        "l_orderkey",
        st_polygon(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")
        ).alias("the_geom"),
    )
    # Parse the ring ONCE into array columns; the four metrics read the
    # arrays. Interpreted HOF trees get no CSE, so calling the WKT-taking
    # variants here would re-run regexp+split+cast 8× per row.
    parsed = g.select(
        "l_orderkey",
        st_ring_xs(F.col("the_geom")).alias("xs"),
        st_ring_ys(F.col("the_geom")).alias("ys"),
    )
    xs, ys = F.col("xs"), F.col("ys")
    return (
        parsed.select(
            "l_orderkey",
            st_area_xy(xs, ys).alias("area_raw"),
            st_perimeter_xy(xs, ys).alias("perim_raw"),
            st_centroid_x_xy(xs, ys).alias("cx_raw"),
            st_centroid_y_xy(xs, ys).alias("cy_raw"),
        )
        .select(
            "l_orderkey",
            F.round("area_raw", 6).alias("area"),
            F.round("perim_raw", 6).alias("perimeter"),
            F.round("cx_raw", 6).alias("cx"),
            F.round("cy_raw", 6).alias("cy"),
        )
    )


# L-shaped (concave) region in the (l_tax, l_discount) plane. Vertices sit
# on 0.005-offset coordinates while the data lives on the 0.01 grid, so no
# point ever falls on an edge — ray-casting boundary semantics never engage.
_L_POLY = (
    "POLYGON((0.005 0.005, 0.045 0.005, 0.045 0.025, "
    "0.025 0.025, 0.025 0.055, 0.005 0.055, 0.005 0.005))"
)


@query(
    "geo_point_in_polygon",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (
             (l_tax > 0.005 AND l_tax < 0.045 AND l_discount > 0.005 AND l_discount < 0.025)
             OR (l_tax > 0.005 AND l_tax < 0.025 AND l_discount > 0.025 AND l_discount < 0.055)
           ) AS n_inside,
           count(*) AS n_total
    FROM lineitem
    GROUP BY 1
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ray-casting containment against a concave (L-shaped) polygon —
    concavity makes the crossing count genuinely vary (1 or 2 edges hit),
    which a bbox test would never exercise. The oracle states the same
    region as explicit rectangle unions, independently of the ray-cast.
    One aggregate per row over the edge array; at 100 TB this is a
    scan-local projection with no shuffle beyond the final tiny groupBy."""
    from ..functions.geo import st_point_in_polygon_const

    t = Tables(spark, sf_dir)
    # constant polygon -> driver-side parse, per-row work is unrolled
    # comparisons in whole-stage codegen (st_point_in_polygon stays the
    # per-row-polygon path and is exercised by tests/test_geo.py)
    inside = st_point_in_polygon_const(
        F.col("l_tax"), F.col("l_discount"), _L_POLY
    )
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.when(inside, 1)).alias("n_inside"),
        F.count(F.lit(1)).alias("n_total"),
    )


# Donut region in the (l_tax, l_discount) plane: a rectangle shell with a
# rectangular hole. Vertices on 0.005-offsets, data on the 0.01 grid, so
# no point lies on an edge and even-odd boundary semantics never engage.
_DONUT = (
    "POLYGON((0.005 0.005, 0.075 0.005, 0.075 0.095, 0.005 0.095, 0.005 0.005), "
    "(0.025 0.035, 0.055 0.035, 0.055 0.065, 0.025 0.065, 0.025 0.035))"
)


@query(
    "geo_polygon_holes",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (
             l_tax > 0.005 AND l_tax < 0.075
             AND l_discount > 0.005 AND l_discount < 0.095
             AND NOT (l_tax > 0.025 AND l_tax < 0.055
                      AND l_discount > 0.035 AND l_discount < 0.065)
           ) AS n_inside,
           count(*) AS n_total,
           round((0.07 * 0.09) - (0.03 * 0.03), 9) AS donut_area
    FROM lineitem
    GROUP BY 1
    """,
)
def geo_polygon_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-ring polygon support: even-odd containment against a donut
    (shell + hole) and hole-subtracting shoelace area. The oracle states
    the donut as shell-minus-hole rectangle algebra, independent of both
    the ring parser and the crossing count. A point inside the hole
    crosses shell once and hole once (even -> outside) — the semantics
    PostGIS ST_Contains gives for interior rings (reference builds such
    geometries via shp2pgsql multi-ring loads, importer.rb:348-373)."""
    from ..functions.geo import polygon_area_const, st_point_in_polygon_const

    t = Tables(spark, sf_dir)
    # constant donut -> driver-side parse + area fold: the previous
    # F.first(st_area_multi(lit)) formulation re-parsed the donut WKT per
    # INPUT row (HOF trees are interpreted, no CSE); the area is a plain
    # Python number here. st_area_multi/st_point_in_polygon_multi remain
    # the per-row-polygon path, exercised by tests/test_geo.py.
    inside = st_point_in_polygon_const(
        F.col("l_tax"), F.col("l_discount"), _DONUT
    )
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.when(inside, 1)).alias("n_inside"),
        F.count(F.lit(1)).alias("n_total"),
        F.lit(round(polygon_area_const(_DONUT), 9)).alias("donut_area"),
    )


@query(
    "geo_geodesic_area",
    oracle="""
    WITH box AS (
      SELECT l_orderkey,
             min(l_tax) * 1000 - 40    AS xmin, max(l_tax) * 1000 - 40    AS xmax,
             min(l_discount) * 800 - 40 AS ymin, max(l_discount) * 800 - 40 AS ymax
      FROM lineitem GROUP BY 1
    )
    SELECT l_orderkey,
           round(6371.0088 * 6371.0088 * radians(xmax - xmin)
                 * (sin(radians(ymax)) - sin(radians(ymin))), 2) AS area_km2
    FROM box
    WHERE xmax > xmin AND ymax > ymin
    """,
)
def geo_geodesic_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical-earth polygon area: per-order lon/lat bboxes measured by
    the Chamberlain–Duquette ring formula (general, any polygon), checked
    against the closed-form spherical-rectangle band area
    R^2 * dlambda * (sin lat2 - sin lat1) — two genuinely different
    formulations that agree analytically. Scan-local projection; the only
    shuffle is the bbox groupBy, which at 100 TB is the same shuffle the
    planar metrics query already pays (reference reprojects geometry via
    ST_Transform before area math, importer.rb:375-386)."""
    from ..functions.geo import (
        st_geodesic_area_rad_xy,
        st_polygon,
        st_ring_xs,
        st_ring_ys,
    )

    t = Tables(spark, sf_dir)
    box = t.lineitem.groupBy("l_orderkey").agg(
        (F.min("l_tax") * 1000 - 40).alias("xmin"),
        (F.max("l_tax") * 1000 - 40).alias("xmax"),
        (F.min("l_discount") * 800 - 40).alias("ymin"),
        (F.max("l_discount") * 800 - 40).alias("ymax"),
    ).filter((F.col("xmax") > F.col("xmin")) & (F.col("ymax") > F.col("ymin")))
    g = _spread_polygon_rows(box).select(
        "l_orderkey",
        st_polygon(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")
        ).alias("the_geom"),
    )
    # parse once, then convert to radians once, each as projection columns
    # (interpreted HOFs re-evaluate referenced trees per use — see
    # st_geodesic_area_rad_xy docstring)
    parsed = g.select(
        "l_orderkey",
        st_ring_xs(F.col("the_geom")).alias("xs"),
        st_ring_ys(F.col("the_geom")).alias("ys"),
    )
    rad = parsed.select(
        "l_orderkey",
        F.transform("xs", lambda v: F.radians(v)).alias("lam"),
        F.transform("ys", lambda v: F.radians(v)).alias("phi"),
    )
    return rad.select(
        "l_orderkey",
        F.round(
            st_geodesic_area_rad_xy(F.col("lam"), F.col("phi")), 2
        ).alias("area_km2"),
    )


# EPSG:2154 derived projection constants (computed once by
# functions.proj.LCCParams from the public EPSG parameter set; embedded as
# literals so the DuckDB oracle states the same closed form independently)
_L93 = {
    "e": 0.08181919084262149,
    "n": 0.7256077650532538,
    "F": 1.8428979224180042,
    "rho0": 6055612.049823651,
    "a": 6378137.0,
}

_L93_PHI_ITER = "pi()/2 - 2*atan(t * pow((1 - {e}*sin({prev}))/(1 + {e}*sin({prev})), {e}/2))"


def _l93_oracle() -> str:
    e, n, Fc, rho0, a = (_L93[k] for k in ("e", "n", "F", "rho0", "a"))
    # unroll the 8 fixed-point iterations the numpy kernel performs
    phi = "(pi()/2 - 2*atan(t))"
    for _ in range(8):
        phi = "(" + _L93_PHI_ITER.format(e=repr(e), prev=phi) + ")"
    return f"""
    WITH pts AS (
      SELECT l_orderkey, l_linenumber,
             l_tax * 1200000 + 600000      AS x,
             l_discount * 2000000 + 6500000 AS y
      FROM lineitem WHERE l_linenumber <= 2
    ), polar AS (
      SELECT l_orderkey, l_linenumber,
             sqrt((x - 700000)*(x - 700000)
                  + ({rho0!r} - (y - 6600000))*({rho0!r} - (y - 6600000))) AS rho,
             atan2(x - 700000, {rho0!r} - (y - 6600000))                   AS theta
      FROM pts
    ), tval AS (
      SELECT l_orderkey, l_linenumber, theta,
             pow(rho / ({a!r}::DOUBLE * {Fc!r}::DOUBLE), 1.0/{n!r}) AS t
      FROM polar
    )
    SELECT l_orderkey, l_linenumber,
           floor((degrees(theta / {n!r}) + 3.0) * 1e6 + 0.5) / 1e6 AS lon,
           floor(degrees({phi}) * 1e6 + 0.5) / 1e6                 AS lat
    FROM tval
    """


@query("geo_lcc_reproject", oracle=_l93_oracle())
def geo_lcc_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambert-93 (EPSG:2154) -> WGS84 reprojection as a vectorized pandas
    UDF over the numpy LCC kernel (functions/proj.py, Snyder 2SP inverse) —
    the 100 TB reprojection path: Arrow batches in, whole-array numpy trig,
    no per-row Python. The oracle restates the same closed form (8 unrolled
    latitude fixed-point iterations) in pure SQL with the projection
    constants embedded as literals, so the kernel math is value-checked
    cross-engine, not just fixture-tested. Synthetic eastings/northings are
    derived from lineitem columns to land in the CRS's valid extent."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.proj import LCC_EPSG, lcc_inverse

    p = LCC_EPSG[2154]

    @pandas_udf("lon double, lat double")
    def l93_inv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        lon, lat = lcc_inverse(x.to_numpy(), y.to_numpy(), p)
        return pd.DataFrame({"lon": lon, "lat": lat})

    t = Tables(spark, sf_dir)
    pts = t.lineitem.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_tax") * 1200000 + 600000).alias("x"),
        (F.col("l_discount") * 2000000 + 6500000).alias("y"),
    )
    out = pts.select(
        "l_orderkey", "l_linenumber", l93_inv(F.col("x"), F.col("y")).alias("ll")
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("ll.lon") * 1e6 + 0.5) / 1e6).alias("lon"),
        (F.floor(F.col("ll.lat") * 1e6 + 0.5) / 1e6).alias("lat"),
    )


@query(
    "geo_spatial_join_blocked",
    oracle="""
    WITH rects AS (
      SELECT CAST(p AS INTEGER)        AS rect_id,
             p*0.0085 + 0.0002         AS xmin,
             p*0.0115 + 0.0002         AS ymin,
             p*0.0085 + 0.0002 + 0.013 AS xmax,
             p*0.0115 + 0.0002 + 0.0305 AS ymax
      FROM (SELECT unnest(range(8)) AS p)
    )
    SELECT rect_id, count(*) AS n_points
    FROM lineitem l JOIN rects r
      ON l.l_tax >= r.xmin AND l.l_tax <= r.xmax
     AND l.l_discount >= r.ymin AND l.l_discount <= r.ymax
    GROUP BY 1
    """,
)
def geo_spatial_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points-in-regions via the BLOCKED spatial join (operators/spatial.py):
    regions explode to the grid cells their bbox overlaps, points map to
    one cell each, and the join is an equi-join on the cell id with the
    exact containment check post-join — never a cartesian. The oracle
    states plain range-predicate containment (no blocking), verifying the
    blocking is lossless. Rect boundaries sit on 0.0002 offsets while the
    data lives on the 0.01 grid, so no point lies on an edge."""
    from ..operators.spatial import spatial_join_points_rects

    t = Tables(spark, sf_dir)
    rects = spark.createDataFrame(
        [
            (
                p,
                p * 0.0085 + 0.0002,
                p * 0.0115 + 0.0002,
                p * 0.0085 + 0.0002 + 0.013,
                p * 0.0115 + 0.0002 + 0.0305,
            )
            for p in range(8)
        ],
        "rect_id int, xmin double, ymin double, xmax double, ymax double",
    )
    pts = t.lineitem.select(
        F.col("l_tax").alias("x"), F.col("l_discount").alias("y")
    )
    joined = spatial_join_points_rects(pts, rects, cell=0.02)
    return joined.groupBy("rect_id").agg(F.count(F.lit(1)).alias("n_points"))


def _z_terms_sql() -> str:
    """Unrolled 32-term bit-interleave SQL shared by the oracle."""
    terms = []
    for i in range(16):
        terms.append(f"((xq >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((yq >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@query(
    "geo_zorder_key",
    oracle=f"""
    WITH q AS (
      SELECT event_id,
             CAST(least(greatest(floor(((CAST(value AS DOUBLE) / 6 - 30) + 180.0)
                  / 360.0 * 65536), 0), 65535) AS BIGINT) AS xq,
             CAST(least(greatest(floor(((CAST(user_id AS DOUBLE) / 2 - 37) + 90.0)
                  / 180.0 * 65536), 0), 65535) AS BIGINT) AS yq
      FROM events
    )
    SELECT event_id, xq, yq, {_z_terms_sql()} AS zval
    FROM q
    """,
)
def geo_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: 16-bit-quantized lon/lat bit-
    interleaved into one 32-bit value. Sorting/range-partitioning a 100 TB
    table by zval co-locates spatially-near rows in the same files, so a
    2-D bbox predicate prunes to O(few) contiguous z-ranges instead of a
    full scan — the lakehouse Z-ORDER layout primitive, computed here as
    pure codegen bit arithmetic (no UDF, no shuffle; scan-local)."""
    t = Tables(spark, sf_dir)
    lat = F.col("user_id").cast("double") / 2 - 37
    lon = F.col("value").cast("double") / 6 - 30
    xq = (
        F.least(
            F.greatest(F.floor((lon + 180.0) / 360.0 * 65536), F.lit(0)),
            F.lit(65535),
        )
    ).cast("long")
    yq = (
        F.least(
            F.greatest(F.floor((lat + 90.0) / 180.0 * 65536), F.lit(0)),
            F.lit(65535),
        )
    ).cast("long")
    q = t.events.select("event_id", xq.alias("xq"), yq.alias("yq"))
    z = F.lit(0).cast("long")
    for i in range(16):
        z = z + F.shiftright("xq", i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright("yq", i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
    return q.select("event_id", "xq", "yq", z.alias("zval"))


@query(
    "geo_albers_roundtrip",
    oracle="""
    SELECT event_id,
           floor((CAST(value AS DOUBLE) / 6 - 30) * 10000 + 0.5) / 10000
             AS lon,
           floor(((CAST(user_id AS DOUBLE) % 140) / 2 - 35) * 10000 + 0.5)
             / 10000 AS lat
    FROM events
    """,
)
def geo_albers_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Albers Equal-Area (EPSG:5070) forward+inverse round trip on the
    synthetic coordinates: project to easting/northing and back inside
    one Arrow-batched pandas UDF, then compare against the RAW input
    coordinates — the oracle is simply the inputs, so the check proves
    the two Snyder kernels are exact inverses (round-trip error ~1e-11
    deg, five orders below the 1e-4 rounding grid). This is the
    reprojection fidelity contract of shp_normalizer.py:20-40 for the
    Albers family, pyproj-free (functions/proj.py)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.proj import ALBERS_EPSG, albers_forward, albers_inverse

    p = ALBERS_EPSG[5070]

    @pandas_udf("lon double, lat double")
    def rt(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        x, y = albers_forward(lon.to_numpy(), lat.to_numpy(), p)
        lo, la = albers_inverse(x, y, p)
        return pd.DataFrame({"lon": lo, "lat": la})

    t = Tables(spark, sf_dir)
    src = t.events.select(
        "event_id",
        (F.col("value").cast("double") / 6 - 30).alias("lon0"),
        ((F.col("user_id").cast("double") % 140) / 2 - 35).alias("lat0"),
    )
    out = src.select("event_id", rt("lon0", "lat0").alias("ll"))
    return out.select(
        "event_id",
        (F.floor(F.col("ll.lon") * 10000 + 0.5) / 10000).alias("lon"),
        (F.floor(F.col("ll.lat") * 10000 + 0.5) / 10000).alias("lat"),
    )


@query(
    "geo_polar_roundtrip",
    oracle="""
    SELECT event_id,
           floor(((CAST(value AS DOUBLE) % 499) * 0.7 - 175) * 10000 + 0.5)
             / 10000 AS lon,
           floor((-61 - (CAST(user_id AS DOUBLE) % 560) / 20) * 10000 + 0.5)
             / 10000 AS lat
    FROM events
    """,
)
def geo_polar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Antarctic Polar Stereographic (EPSG:3031) forward+inverse round
    trip on synthetic south-polar coordinates, same contract as
    geo_albers_roundtrip: the oracle is the RAW inputs, so the match
    proves the two EPSG-9829 kernels (functions/proj.py, validated
    against the EPSG Guidance Note 7-2 worked example) are exact
    inverses — round-trip error ~1e-11 deg, five orders below the 1e-4
    rounding grid. Completes the pyproj-free CRS coverage of
    shp_normalizer for polar-region shapefiles."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.proj import POLAR_EPSG, polar_forward, polar_inverse

    p = POLAR_EPSG[3031]

    @pandas_udf("lon double, lat double")
    def rt(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        x, y = polar_forward(lon.to_numpy(), lat.to_numpy(), p)
        lo, la = polar_inverse(x, y, p)
        return pd.DataFrame({"lon": lo, "lat": la})

    t = Tables(spark, sf_dir)
    src = t.events.select(
        "event_id",
        ((F.col("value").cast("double") % 499) * 0.7 - 175).alias("lon0"),
        (-61 - (F.col("user_id").cast("double") % 560) / 20).alias("lat0"),
    )
    out = src.select("event_id", rt("lon0", "lat0").alias("ll"))
    return out.select(
        "event_id",
        (F.floor(F.col("ll.lon") * 10000 + 0.5) / 10000).alias("lon"),
        (F.floor(F.col("ll.lat") * 10000 + 0.5) / 10000).alias("lat"),
    )


#: fixed "station" grid for the nearest-neighbor spatial join (lon, lat)
_STATIONS = [
    (-3.7, 40.4), (2.35, 48.85), (-0.13, 51.51), (13.4, 52.52),
    (12.5, 41.9), (-9.14, 38.72), (4.9, 52.37), (16.37, 48.21),
    (18.07, 59.33), (21.01, 52.23),
]


@query(
    "geo_nearest_station",
    oracle=f"""
    WITH stations(sid, slon, slat) AS (
      SELECT * FROM (VALUES
        {", ".join(f"({i}, {lon}, {lat})" for i, (lon, lat) in enumerate(_STATIONS))}
      )
    ), pts AS (
      SELECT event_id,
             (CAST(value AS DOUBLE) % 400) / 8 - 20      AS lon,
             (CAST(user_id AS DOUBLE) % 100) / 2 + 35    AS lat
      FROM events
    ), scored AS (
      SELECT p.event_id, s.sid,
             floor(2 * 6371.0088 * asin(sqrt(
               pow(sin(radians((s.slat - p.lat) / 2)), 2)
               + cos(radians(p.lat)) * cos(radians(s.slat))
                 * pow(sin(radians((s.slon - p.lon) / 2)), 2)
             )) * 1000000 + 0.5) / 1000000 AS d6
      FROM pts p CROSS JOIN stations s
    )
    SELECT event_id, sid AS nearest_station,
           d6 AS dist_km
    FROM (
      SELECT event_id, sid, d6,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY d6, sid) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def geo_nearest_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor spatial join against a small station dimension.
    The 10 station coordinates fold into the projection as literals and
    each event picks its minimum via ONE least() over per-station
    (distance, sid) structs — scan-local, ZERO shuffles and zero row
    expansion (r12: the previous broadcast-cross-join + per-event window
    materialized 10x the events and paid a full (event_id) exchange +
    sort just to take a 10-way min; measured 1.47 -> 0.71 s at sf0.1).
    Distances land on the 1e-6 km grid BEFORE ranking (libm vs
    java.lang.Math trig can differ in the last ulp) and the struct
    comparison ties by station id — the same (d6, sid) order the window
    used, so the chosen station is identical. A dimension too large to
    unroll into the plan goes back to broadcast + min_by aggregation;
    the big-dim variant of this query is llm_ivf_topk's cell-probe
    pattern; the blocked-grid variant is geo_spatial_join_blocked."""
    from ..functions.geo import haversine_km

    t = Tables(spark, sf_dir)
    pts = t.events.select(
        "event_id",
        ((F.col("value").cast("double") % 400) / 8 - 20).alias("lon"),
        ((F.col("user_id").cast("double") % 100) / 2 + 35).alias("lat"),
    )
    structs = []
    for i, (lon, lat) in enumerate(_STATIONS):
        d6 = (
            F.floor(
                haversine_km(
                    F.col("lon"), F.col("lat"), F.lit(lon), F.lit(lat)
                )
                * 1000000
                + 0.5
            )
            / 1000000
        )
        structs.append(F.struct(d6.alias("d6"), F.lit(i).alias("sid")))
    best = F.least(*structs)
    return pts.select(
        "event_id",
        best.getField("sid").alias("nearest_station"),
        best.getField("d6").alias("dist_km"),
    )


@query(
    "geo_hotspot_cells",
    oracle="""
    WITH pts AS (
      SELECT CAST(floor(user_id / 2.0 - 37) AS BIGINT) AS ci,
             CAST(floor(value / 6.0 - 30) AS BIGINT) AS cj
      FROM events
    ), cells AS (
      SELECT ci, cj, count(*) AS cnt FROM pts GROUP BY 1, 2
    ), offs AS (
      SELECT di, dj
      FROM (VALUES (-1),(0),(1)) a(di), (VALUES (-1),(0),(1)) b(dj)
      WHERE NOT (di = 0 AND dj = 0)
    ), nbr AS (
      SELECT c.ci + o.di AS ci, c.cj + o.dj AS cj, sum(c.cnt) AS nbr_sum
      FROM cells c, offs o
      GROUP BY 1, 2
    )
    SELECT c.ci, c.cj, CAST(c.cnt AS BIGINT) AS cnt,
           CAST(coalesce(n.nbr_sum, 0) AS BIGINT) AS nbr_sum
    FROM cells c LEFT JOIN nbr n ON c.ci = n.ci AND c.cj = n.cj
    WHERE c.cnt >= 5 AND c.cnt * 8 >= 2 * coalesce(n.nbr_sum, 0)
    """,
)
def geo_hotspot_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspot detection (Getis-Ord-lite): events binned to a
    1-degree grid; a cell is hot when its count is at least twice the
    mean of its 8 neighbors (missing neighbors count 0) with a minimum
    support of 5. The neighbor aggregation is the scale trick: instead
    of a 9-way spatial self-join per cell, every cell SCATTERS its count
    to its 8 neighbor keys (an 8-row explode — constant fan-out) and one
    keyed groupBy gathers them; the grid key is the same
    partition-friendly integer pair the Z-order layout clusters on. At
    100 TB the cell table is |occupied cells| rows — many orders smaller
    than the point table — and the scatter/gather never touches raw
    points again."""
    t = Tables(spark, sf_dir)
    pts = t.events.select(
        F.floor(F.col("user_id") / 2.0 - 37).alias("ci"),
        F.floor(F.col("value") / 6.0 - 30).alias("cj"),
    )
    cells = pts.groupBy("ci", "cj").agg(F.count(F.lit(1)).alias("cnt"))
    offs = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)
            if (di, dj) != (0, 0)]
    scattered = cells.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("ci") + di).alias("ci"),
                        (F.col("cj") + dj).alias("cj"),
                        F.col("cnt").alias("cnt"),
                    )
                    for di, dj in offs
                ]
            )
        ).alias("s")
    ).select("s.ci", "s.cj", "s.cnt")
    nbr = scattered.groupBy("ci", "cj").agg(F.sum("cnt").alias("nbr_sum"))
    return (
        cells.join(nbr, ["ci", "cj"], "left")
        .select(
            "ci",
            "cj",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.coalesce(F.col("nbr_sum"), F.lit(0))
            .cast("bigint")
            .alias("nbr_sum"),
        )
        .where(
            (F.col("cnt") >= 5) & (F.col("cnt") * 8 >= 2 * F.col("nbr_sum"))
        )
    )
