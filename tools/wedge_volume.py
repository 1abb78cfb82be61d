#!/usr/bin/env python
"""Analytic work-volume audit for the triangle family: the oriented wedge
count (sum over apexes of C(outdeg, 2)) IS the row count the wedge
self-join materializes, but it is computable from the degree-ordered
orientation alone — two keyed joins + one aggregation, no quadratic
stage. Run it per stress corpus to separate ALGORITHMIC growth (wedge
rows vs corpus scale) from single-JVM effects (spill once the sort of
those rows exceeds heap) when reading SCALE.md's graph wall-times.

    STRESS_DIR=/tmp/sfgraph30 python tools/wedge_volume.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cartodb_importer_spark.queries import Tables
from cartodb_importer_spark.queries.graph import _copurchase_pairs
from cartodb_importer_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("STRESS_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="wedge-volume")
    pairs = _copurchase_pairs(Tables(spark, sf_dir)).persist()
    deg = (
        pairs.select(F.col("src").alias("node"))
        .union(pairs.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # degree-ordered orientation (same rule as _degree_and_triangle_counts):
    # out-degree of a node = its higher-(deg, id) neighbors
    da = deg.select(F.col("node").alias("src"), F.col("deg").alias("dsrc"))
    db = deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddst"))
    keyed = pairs.join(da, "src").join(db, "dst")
    fwd = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    outdeg = (
        keyed.select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u")
        )
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("od"))
    )
    row = (
        outdeg.agg(
            F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("wedges"),
            F.max("od").alias("max_outdeg"),
            F.count(F.lit(1)).alias("nodes_with_out"),
        ).collect()[0]
    )
    stats = {
        "sf_dir": sf_dir,
        "nodes": deg.count(),
        "edges": pairs.count(),
        "oriented_wedges": int(row.wedges),
        "max_outdeg": int(row.max_outdeg),
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
