"""Bucketed table layout — the pre-shuffle that pays for itself.

``write_bucketed`` hash-partitions rows into N buckets on the join/agg key
at WRITE time (and sorts within buckets). Every later equi-join or
aggregation on that key then reads co-located, pre-sorted buckets: zero
Exchange, zero Sort in the plan. At 100 TB this converts the nightly
fact-to-fact join from the cluster's largest shuffle into a streaming merge.

Rules of thumb encoded here:
* bucket count should be stable across tables that join together (equal
  counts -> bucket-to-bucket zip; Spark also handles multiples);
* bucket on the highest-fan-out equi-join key (orderkey for lineitem);
* sortBy the same key so sort-merge-join skips its sort phase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — plans as SortMergeJoin with NO
    Exchange on either side (verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains an Exchange (shuffle) operator."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent backfill: dynamic partition overwrite replaces ONLY the
    partitions present in ``df``, leaving sibling partitions untouched —
    re-running a day's pipeline rewrites that day, never the table. This is
    the batch-correction primitive every long-lived pipeline needs."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~target size (long-lived streaming/append tables accrete small files
    that poison scan parallelism). Returns the new file count."""
    import glob
    import os

    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def zorder_key(x: "Column", y: "Column", bits: int = 16) -> "Column":
    """Z-order (Morton) key: interleave the bits of two bucketized ints so
    rows close in BOTH dimensions land close in sort order — sortWithin-
    Partitions(zorder_key(...)) clusters parquet row groups for 2-D
    predicates (min/max stats prune on both columns). Pure expressions."""
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for b in range(bits):
        xb = F.shiftrightunsigned(x.cast("long"), b).bitwiseAND(F.lit(1))
        yb = F.shiftrightunsigned(y.cast("long"), b).bitwiseAND(F.lit(1))
        key = (
            key
            .bitwiseOR(F.shiftleft(xb, 2 * b))
            .bitwiseOR(F.shiftleft(yb, 2 * b + 1))
        )
    return key
