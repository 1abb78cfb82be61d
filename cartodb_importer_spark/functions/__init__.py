"""Scalar function families the engine exposes beyond raw pyspark.sql
functions — currently the WKT geometry accessors (the_geom is a WKT string
column per SURVEY §7 stance 1)."""
