"""Table maintenance: small-file compaction with range clustering.

The reference imports once and never rewrites (importer.rb's single-shot
publish); a 100 TB lakehouse table instead accretes small files from
streaming micro-batches and incremental appends until scan planning —
footer reads, task scheduling, row-group skipping — dominates query time.
Compaction is the standing maintenance operator that rewrites a table's
files at a target size, clustered on a sort key so per-file min/max
statistics prune scans.

Design for scale:

* File count is derived from the table's actual byte size (Spark's
  in-memory size estimate), never hardcoded — the same call works on a
  60 k-row test table and a 100 TB partition.
* ``repartitionByRange`` on the cluster keys gives globally
  non-overlapping per-file key ranges (vs ``repartition``'s hash spray,
  which makes every file cover the full key domain and defeats min/max
  pruning). The range exchange samples keys (one pass) and is the only
  shuffle.
* ``maxRecordsPerFile`` caps the tail: a skewed range partition splits
  into several files rather than one jumbo file.
* The rewrite goes to a NEW directory; swapping it in atomically is the
  catalog's staging+rename publish (sinks/catalog.py), same as imports.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(
    df: DataFrame, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Number of range partitions for ~target-size output files.

    Uses Catalyst's logical-plan size estimate (parquet footer totals for
    file scans) — a planning statistic, not a data pass. Plans without real
    stats report defaultSizeInBytes (Long.MaxValue) and join estimates
    multiply, so the count is capped at 16x the current partitioning — an
    implausible estimate then degrades to a mild repartition instead of a
    billions-of-partitions hang."""
    est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    est = int(min(est, 2**63 - 1))
    n = max(1, math.ceil(est / target_file_bytes))
    cap = max(64, 16 * df.rdd.getNumPartitions())
    return min(n, cap)


def compact(
    df: DataFrame,
    out_path: str,
    cluster_by: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    max_records_per_file: int | None = 10_000_000,
) -> int:
    """Rewrite ``df`` as range-clustered parquet at ``out_path``.

    Returns the partition count used. Callers publish the new directory
    via the catalog's atomic rename."""
    n = plan_compaction(df, target_file_bytes)
    writer = df.repartitionByRange(n, *cluster_by).write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_path)
    return n


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file row count + min/max of every column — the pruning
    statistics a scan planner would use; exposed for tests/inspection.

    Distributed: reads the parquet with ``_metadata.file_path`` (Spark's
    hidden input-file column) and aggregates per file."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    cols = df.columns
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.min(c).alias(f"min_{c}") for c in cols],
            *[F.max(c).alias(f"max_{c}") for c in cols],
        )
    )
