"""GeoJSON / JSON reader (O7): FeatureCollection -> one row per feature,
properties flattened to sanitized columns, geometry -> ``the_geom`` WKT.

The reference converts GeoJSON to a shapefile with ogr2ogr and loads that
(importer.rb:175-190); the Spark-native form reads the JSON directly:
spark.read.json on the feature array (distributed for JSON-lines; the
single-document FeatureCollection case is exploded from one wrapped read).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import naming
from ..georef import geojson_to_wkt


def read_geojson(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    with open(path, encoding="utf-8", errors="replace") as f:
        doc = json.load(f)

    if doc.get("type") == "FeatureCollection":
        features = doc.get("features", [])
    elif doc.get("type") == "Feature":
        features = [doc]
    else:
        # plain JSON (array of records or single record) — no geometry
        records = doc if isinstance(doc, list) else [doc]
        df = spark.read.json(
            spark.sparkContext.parallelize([json.dumps(r) for r in records])
        )
        df = df.toDF(*naming.sanitize_columns(df.columns))
        return df, {"import_type": ".json", "rows": len(records)}

    # feature rows: properties + geometry JSON string
    rows = [
        (
            json.dumps(feat.get("properties") or {}),
            json.dumps(feat.get("geometry")) if feat.get("geometry") else None,
        )
        for feat in features
    ]
    base = spark.createDataFrame(rows, "props string, geom string")
    props_df = spark.read.json(
        base.rdd.map(lambda r: r.props), primitivesAsString=False
    )
    prop_cols = props_df.columns

    parsed = base.withColumn(
        "p", F.from_json(F.col("props"), props_df.schema)
    )
    out = parsed.select(
        *[F.col(f"p.`{c}`").alias(c) for c in prop_cols],
        geojson_to_wkt(F.col("geom")).alias("the_geom"),
    )
    out = out.toDF(*naming.sanitize_columns(out.columns))
    return out, {"import_type": ".json", "rows": len(features)}
