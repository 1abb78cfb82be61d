"""Geometry-function query surface: WKT point accessors, bbox filtering,
haversine distance — over the_geom columns built the same way the import
pipeline builds them (O13 semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import bbox_contains, haversine_km, st_point, st_x, st_y
from . import Tables, query


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
    """st_x/st_y round-trip through WKT text built by st_point."""
    t = Tables(spark, sf_dir)
    g = t.lineitem.select(
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
