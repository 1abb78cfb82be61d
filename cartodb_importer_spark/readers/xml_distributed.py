"""Distributed XML ingestion via Spark 4's built-in ``xml`` source — the
scale path for GPX/KML files too large to parse on the driver.

The driver-side readers (readers/gpx.py, readers/kml.py) mirror the
reference's ogr2ogr conversion exactly (importer.rb:145-190) and preserve
document order; they top out at files that fit in driver memory. These
variants push the parse to executors: ``spark.read.format("xml")`` splits
the file, each task parses its slice of ``rowTag`` elements, and predicate
pushdown / column pruning apply as with any DataSource-V2 scan. Two
semantic deltas, both documented here:

* Row numbering (``ogc_fid``) is assigned by ``operators.index.global_index``
  over a sort key, not document order — distributed parsers cannot see
  ancestor context or absolute position.
* GPX ``track_fid``/``track_seg_id`` are unavailable (a ``trkpt`` row tag
  has no handle on which ``trk``/``trkseg`` enclosed it); they are emitted
  as NULL so the schema matches the driver-side reader.

DateTime fields stay STRINGS, matching the reference's
``-fieldTypeToString DateTime`` flag (importer.rb:152-154).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.index import global_index


def _coords_text_to_ring(col: Column) -> Column:
    """KML ``coordinates`` text ("lon,lat[,z] lon,lat[,z] …") -> WKT ring
    body "lon lat, lon lat, …". Z is dropped (force-2D, importer.rb:381).
    Pure HOFs: split/transform/array_join — no UDF, executor-side."""
    toks = F.filter(
        F.split(F.trim(col), r"\s+"), lambda t: F.length(t) > 0
    )
    pairs = F.transform(
        toks,
        lambda t: F.concat_ws(
            " ",
            F.element_at(F.split(t, ","), 1),
            F.element_at(F.split(t, ","), 2),
        ),
    )
    return F.array_join(pairs, ", ")


def read_gpx_distributed(
    spark: SparkSession, path: str, layer: str = "track_points"
) -> tuple[DataFrame, dict]:
    """Executor-parsed GPX. Layers: ``track_points`` (default) and
    ``waypoints`` — the per-point layers where row-tag parsing is lossless
    modulo the numbering caveat above. ``tracks``/``routes`` need ancestor
    grouping; use the driver reader for those."""
    if layer == "track_points":
        tag, extra = "trkpt", ["ele", "time"]
    elif layer == "waypoints":
        tag, extra = "wpt", ["name", "time"]
    else:
        raise ValueError(
            f"distributed GPX supports track_points/waypoints, not {layer!r}"
        )
    raw = (
        spark.read.format("xml")
        .option("rowTag", tag)
        .option("attributePrefix", "_")
        # keep every leaf a string: the reference's -fieldTypeToString
        # DateTime contract, and numbers are cast explicitly below
        .option("inferSchema", "false")
        .load(path)
    )
    cols = {f.name for f in raw.schema.fields}
    sel = [
        F.col("_lon").cast("double").alias("lon"),
        F.col("_lat").cast("double").alias("lat"),
    ]
    for name in extra:
        sel.append(
            (F.col(name).cast("string") if name in cols else F.lit(None).cast("string")).alias(name)
        )
    pts = raw.select(*sel)
    pts = pts.withColumn(
        "the_geom", F.format_string("POINT(%s %s)", F.col("lon"), F.col("lat"))
    )
    # Deterministic numbering: order by (time, lon, lat) — time is the
    # natural monotone key in a GPX trace; ties broken by position.
    idx = global_index(pts, "time", "lon", "lat", index_col="ogc_fid")
    if layer == "track_points":
        out = idx.select(
            F.col("ogc_fid").cast("int"),
            F.lit(None).cast("int").alias("track_fid"),
            F.lit(None).cast("int").alias("track_seg_id"),
            "ele",
            "time",
            "the_geom",
        )
    else:
        out = idx.select(
            F.col("ogc_fid").cast("int"), "name", "time", "the_geom"
        )
    return out, {"import_type": ".gpx", "layer": layer, "distributed": True}


def _placemark_geom(raw: DataFrame) -> Column:
    """WKT from whichever KML geometry child the inferred schema carries —
    Point, LineString, or Polygon (outer + inner rings). Fields absent
    from the file are absent from the schema, so build the expression
    against what actually exists."""
    cols = {f.name: f.dataType.simpleString() for f in raw.schema.fields}
    parts: list[Column] = []
    if "Point" in cols:
        body = _coords_text_to_ring(F.col("Point.coordinates"))
        parts.append(
            F.when(
                F.col("Point").isNotNull(),
                F.concat(F.lit("POINT("), body, F.lit(")")),
            )
        )
    if "LineString" in cols:
        body = _coords_text_to_ring(F.col("LineString.coordinates"))
        parts.append(
            F.when(
                F.col("LineString").isNotNull(),
                F.concat(F.lit("LINESTRING("), body, F.lit(")")),
            )
        )
    if "Polygon" in cols:
        outer = _coords_text_to_ring(
            F.col("Polygon.outerBoundaryIs.LinearRing.coordinates")
        )
        shell = F.concat(F.lit("("), outer, F.lit(")"))
        poly_t = raw.schema["Polygon"].dataType
        inner_names = (
            [f.name for f in poly_t.fields]
            if poly_t.typeName() == "struct"
            else []
        )
        if "innerBoundaryIs" in inner_names:
            inner_field = poly_t["innerBoundaryIs"]
            inner_is_array = inner_field.dataType.typeName() == "array"
            inner_src = F.col("Polygon.innerBoundaryIs")
            inners = inner_src if inner_is_array else F.array(inner_src)
            holes = F.transform(
                F.filter(inners, lambda b: b.isNotNull()),
                lambda b: F.concat(
                    F.lit("("),
                    _coords_text_to_ring(b["LinearRing"]["coordinates"]),
                    F.lit(")"),
                ),
            )
            rings = F.concat(F.array(shell), holes)
        else:
            rings = F.array(shell)
        parts.append(
            F.when(
                F.col("Polygon").isNotNull(),
                F.concat(
                    F.lit("POLYGON("), F.array_join(rings, ", "), F.lit(")")
                ),
            )
        )
    if not parts:
        return F.lit(None).cast("string")
    return F.coalesce(*parts)


def read_kml_distributed(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict]:
    """Executor-parsed KML Placemarks -> (name, description, the_geom) plus
    flattened ExtendedData/SimpleData attributes, mirroring the driver
    reader's column set (O7, importer.rb:175-190). KML is WGS84 by spec —
    no reprojection step on this path."""
    from .. import naming

    raw = (
        spark.read.format("xml")
        .option("rowTag", "Placemark")
        .option("attributePrefix", "_")
        .option("inferSchema", "false")
        .load(path)
    )
    cols = {f.name for f in raw.schema.fields}
    sel = [
        (F.col("name").cast("string") if "name" in cols else F.lit(None).cast("string")).alias("name"),
        (
            F.col("description").cast("string")
            if "description" in cols
            else F.lit(None).cast("string")
        ).alias("description"),
    ]
    extras: list[str] = []
    if "ExtendedData" in cols:
        # SimpleData may sit directly under ExtendedData or inside a
        # SchemaData wrapper (the KML <SchemaData schemaUrl=…> form the
        # driver reader reaches via .iter()) — walk the inferred struct
        # for the first field path ending in SimpleData.
        def _find_path(dt, prefix):
            if dt.typeName() != "struct":
                return None
            for f in dt.fields:
                p = prefix + [f.name]
                if f.name == "SimpleData":
                    return p, f.dataType
                hit = _find_path(f.dataType, p)
                if hit:
                    return hit
            return None

        hit = _find_path(raw.schema["ExtendedData"].dataType, ["ExtendedData"])
        if hit:
            path, sd_type = hit
            sd_is_array = sd_type.typeName() == "array"
            src = F.col(".".join(path))
            arr = src if sd_is_array else F.array(src)
            # one map column: attr name -> text value
            # drop entries missing the name attribute (null map keys
            # throw at runtime) and keep the FIRST value per repeated
            # name (duplicate map keys throw too)
            ents = F.filter(
                F.transform(
                    arr,
                    lambda e: F.struct(
                        e["_name"].alias("k"),
                        e["_VALUE"].cast("string").alias("v"),
                    ),
                ),
                lambda s: s["k"].isNotNull(),
            )
            ents = F.filter(
                ents,
                lambda s, i: ~F.exists(
                    F.slice(ents, 1, i),
                    lambda prev: prev["k"] == s["k"],
                ),
            )
            kv = F.map_from_entries(
                ents
            )
            # attribute names must be known to become columns: collect the
            # distinct key set (small — it is a schema, not data)
            keys = sorted(
                {
                    k
                    for row in raw.select(
                        F.explode(F.map_keys(kv)).alias("k")
                    )
                    .distinct()
                    .collect()
                    for k in [row.k]
                }
            )
            for k in keys:
                extras.append(k)
                sel.append(kv.getItem(k).alias(k))
    geom = _placemark_geom(raw)
    out = raw.select(*sel, geom.alias("the_geom"))
    clean = naming.sanitize_columns(["name", "description", *extras]) + [
        "the_geom"
    ]
    out = out.toDF(*clean)
    return out, {"import_type": ".kml", "distributed": True}
