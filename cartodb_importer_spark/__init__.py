"""cartodb_importer_spark — a PySpark-native data engine with the query and
data-processing capabilities of Vizzuality/cartodb-importer.

The reference (/root/reference, cartodb-importer v0.2.18) is a Ruby ETL gem
that imports CSV/SHP/KML/GeoJSON/XLS/GPX/raster files into PostGIS tables and
exports them back out. This package re-expresses that entire pipeline —
format routing, schema inference, name sanitization, georeferencing, staged
atomic publication — as idiomatic PySpark DataFrame transformations, and adds
the full relational query surface (joins, aggregates, windows, set ops,
streaming) plus LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Layout:
  session.py    SparkSession factory (AQE, Arrow, UTC, sane partitioning)
  naming.py     pure-Python ports of the reference's name sanitizers
  infer.py      CSV delimiter/encoding sniffing + distributed type inference
  georef.py     the_geom rebuild + lat/lon point georeferencing
  readers/      csv, json/geojson, excel, zip, gpx, kml, shp/dbf + router
  sinks/        JDBC staging+rename protocol, file sinks (csv/json/parquet)
  importer.py   Importer/Exporter entry points mirroring the reference API
  operators/    joins (incl. as-of), aggregates, windows, set ops
  llm/          dedup (exact/minhash/simhash), similarity, text stats
  streaming/    watermarked windowed aggs + streaming dedup over events
  queries/      the declared query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
