"""Sketch query surface: count-min frequency estimation (oracle-checked,
md5-portable) and DataSketches HLL distinct-count merge (rows-only — the
estimator is Apache DataSketches, which DuckDB does not ship).

Declared engine surface for the 100 TB tier (the reference computes only
exact count(*), importer.rb:339): sketches bound shuffle width by sketch
size instead of by distinct-key count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches as SK
from . import Tables, query

_DEPTH = 4
_HEX = 2  # width = 16^2 = 256 buckets per row
_PROBES = [1, 2, 3, 4, 5]  # partkeys present at every scale factor


@query(
    "agg_cms_frequency",
    oracle=f"""
    WITH seeds AS (SELECT unnest([0,1,2,3]) AS seed),
    sketch AS (
      SELECT seed,
             substr(md5(seed::VARCHAR || '|' || l_partkey::VARCHAR), 1, {_HEX})
               AS bucket,
             count(*) AS cnt
      FROM lineitem, seeds
      GROUP BY 1, 2
    ),
    probes AS (SELECT unnest({_PROBES}) AS probe_key),
    fan AS (
      SELECT probe_key, seed,
             substr(md5(seed::VARCHAR || '|' || probe_key::VARCHAR), 1, {_HEX})
               AS bucket
      FROM probes, seeds
    ),
    est AS (
      SELECT probe_key, min(coalesce(cnt, 0)) AS est_freq
      FROM fan LEFT JOIN sketch USING (seed, bucket)
      GROUP BY 1
    ),
    truth AS (
      SELECT l_partkey AS probe_key, count(*) AS true_freq
      FROM lineitem WHERE l_partkey IN (SELECT probe_key FROM probes)
      GROUP BY 1
    )
    SELECT probe_key, est_freq, coalesce(true_freq, 0) AS true_freq
    FROM est LEFT JOIN truth USING (probe_key)
    """,
)
def agg_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries on l_partkey, alongside the exact
    count for the probed keys. est_freq >= true_freq always (collisions
    only add); at 100 TB the sketch build is the only full scan and its
    shuffle is capped at depth*width rows per task regardless of input
    size. The probe keys are literals so the query is self-contained."""
    t = Tables(spark, sf_dir)
    sketch = SK.cms_build(t.lineitem, "l_partkey", depth=_DEPTH, hex_chars=_HEX)
    probes = spark.createDataFrame(
        [(k,) for k in _PROBES], "probe_key bigint"
    )
    est = SK.cms_estimate(
        sketch, probes, "probe_key", depth=_DEPTH, hex_chars=_HEX
    )
    truth = (
        t.lineitem.filter(F.col("l_partkey").isin(_PROBES))
        .groupBy(F.col("l_partkey").alias("probe_key"))
        .agg(F.count(F.lit(1)).alias("true_freq"))
    )
    return est.join(F.broadcast(truth), "probe_key", "left").select(
        "probe_key",
        "est_freq",
        F.coalesce("true_freq", F.lit(0)).alias("true_freq"),
    )


@query("agg_hll_sketch_merge")  # rows-only: DataSketches estimator is Spark-side
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count: per-group Apache DataSketches HLL sketches
    of o_custkey, re-merged into an ALL row WITHOUT rescanning the input —
    `hll_union_agg` over the already-built group sketches. This is the
    100 TB pattern for distinct counts across rollup levels: sketch once,
    merge everywhere (vs approx_count_distinct which cannot reuse partial
    state across grouping sets)."""
    t = Tables(spark, sf_dir)
    per_group = t.orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    groups = per_group.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("approx_distinct_custkeys"),
    )
    merged = per_group.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("o_orderpriority"),
        F.hll_sketch_estimate("sk").alias("approx_distinct_custkeys"),
    )
    return groups.unionByName(merged)
