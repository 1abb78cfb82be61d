"""Line-delimited JSON (.jsonl/.ndjson) and ORC table readers.

These are engine extensions past the reference's format list
(importer.rb:13): the reference's .json path materializes the whole
document on the driver (faithful for its FeatureCollection use case —
readers/geojson.py), but line-delimited JSON is the modern bulk-export
interchange format and reads DISTRIBUTED: spark.read.json splits the
file by lines across executors, infers the schema from a sample pass,
and never touches the driver. ORC is Spark-native columnar (predicate
pushdown + column pruning like parquet)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import naming


def read_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Distributed line-delimited JSON read with sanitized column names.

    multiLine stays False — that is what makes the read splittable (each
    executor scans its own byte range to line boundaries); a multiLine
    JSON document cannot be split and would serialize through one task."""
    df = spark.read.json(path)
    if "_corrupt_record" in df.columns:
        df = df.drop("_corrupt_record")
    df = df.toDF(*naming.sanitize_columns(df.columns))
    return df, {"import_type": ".jsonl"}


def read_orc(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """ORC read (columnar; filter pushdown and column pruning apply just
    like parquet) with sanitized column names."""
    df = spark.read.orc(path)
    df = df.toDF(*naming.sanitize_columns(df.columns))
    return df, {"import_type": ".orc"}
