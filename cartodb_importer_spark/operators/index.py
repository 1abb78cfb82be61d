"""Scale-safe global row numbering.

The naive form — ``row_number() OVER (ORDER BY key)`` — plans a
SinglePartition exchange: 100 TB serialized through ONE task. This operator
produces the identical numbering with an all-parallel plan:

1. ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` — ascending
   partition ids hold ascending disjoint key ranges (one parallel range
   shuffle, the same work a global sort would do).
2. ``monotonically_increasing_id()`` — its public contract packs
   ``partition_id << 33 | row_counter`` (pyspark.sql.functions docs), so
   with the rows physically sorted, ``mid & (2^33 - 1)`` IS the row's rank
   within its partition and ``mid >> 33`` its partition — no window, no
   Python, no extra shuffle.
3. Per-partition counts (tiny: one row per partition after map-side agg)
   cumsum into offsets on the driver-free single-partition window — n_part
   rows, not data rows — then broadcast back.

global index = offset[pid] + local rank. Deterministic for a unique key
regardless of where the range sampler places boundaries. Limits: < 2^33
rows per partition (monotonically_increasing_id counter width) and < 2^31
partitions — both far beyond any sane layout.

Reference parity: cartodb-importer adds a serial ``cartodb_id`` primary key
to every imported table (importer.rb's add_column/set primary key DDL);
this is that operation's distributed equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LOCAL_MASK = (1 << 33) - 1


def global_index(
    df: DataFrame,
    *key_cols: str,
    index_col: str = "global_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense 0-based global index ordered by `key_cols`.

    Ties across partition boundaries are resolved by the range partitioner
    (equal keys land in one partition), within a partition by sort
    stability; pass a unique key for a fully deterministic numbering.
    """
    if not key_cols:
        raise ValueError("global_index needs at least one ordering column")
    parted = (
        df.repartitionByRange(num_partitions, *key_cols)
        if num_partitions is not None
        else df.repartitionByRange(*key_cols)
    ).sortWithinPartitions(*key_cols)

    mid = parted.withColumn("_mid", F.monotonically_increasing_id())
    mid = mid.withColumn("_pid", F.shiftright("_mid", 33)).withColumn(
        "_local", F.col("_mid").bitwiseAND(F.lit(_LOCAL_MASK))
    )

    # offsets: one row per partition — the only window runs over n_part rows
    counts = mid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_offset")
    )

    return (
        mid.join(F.broadcast(offsets), "_pid")
        .withColumn(index_col, F.col("_offset") + F.col("_local"))
        .drop("_mid", "_pid", "_local", "_offset")
    )
