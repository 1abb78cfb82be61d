"""Distributed prefix sum: a global running total WITHOUT a global sort.

A running sum over one global ordering is the textbook anti-pattern at
scale — `Window.orderBy(t)` plans a SinglePartition exchange and one
executor sorts everything. The classic fix is the two-phase scan:

1. bucket rows by a coarse prefix of the ordering (e.g. day);
2. aggregate per-bucket totals (tiny), running-sum THOSE (the only
   single-partition step — O(#buckets) rows);
3. broadcast the per-bucket carry-in offsets back and run the running
   sum WITHIN each bucket (parallel across buckets), adding the offset.

Identical semantics to the global window for any ordering whose bucket
expression is a prefix of it (ties must stay inside one bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_running_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[Column | str],
    bucket_col: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` over the global
    ordering (bucket_col, *order_cols), computed as a parallel two-phase
    prefix scan. ``bucket_col`` MUST be a coarse prefix of the intended
    ordering (all rows of an earlier bucket precede all rows of a later
    one); rows within a bucket order by ``order_cols``.

    Null semantics: NULL ``value_col`` rows contribute nothing (like the
    global window's sum), with ONE documented divergence — a row whose
    entire global prefix is NULL-valued reports 0 here where the global
    window reports NULL. NULL buckets keep their rows (null-safe join)
    and sort first, matching Spark's default null ordering."""
    b = df.withColumn("__bk", bucket_col)
    # coalesce: a bucket whose values are all NULL must carry 0, not NULL,
    # into later buckets (global-window sum() skips nulls)
    totals = b.groupBy("__bk").agg(
        F.coalesce(F.sum(value_col), F.lit(0)).alias("__bt")
    )
    # single-partition window ONLY over the tiny bucket-totals frame
    w_b = (
        Window.orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "__bk",
        (F.sum("__bt").over(w_b) - F.col("__bt")).alias("__carry"),
    )
    w_in = (
        Window.partitionBy("__bk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = offsets.withColumnRenamed("__bk", "__bko")
    return (
        # eqNullSafe: a NULL bucket (e.g. date_trunc of a null ts) must
        # keep its rows — plain equi-join silently drops them; NULLs sort
        # first in both the totals window and Spark's default ordering,
        # so the global-window equivalence holds for them too
        b.join(F.broadcast(off), F.col("__bk").eqNullSafe(F.col("__bko")))
        .withColumn(
            out_col,
            # within-bucket prefix is NULL until the first non-null value;
            # the global-window semantics give carry, not NULL, there
            F.coalesce(F.sum(value_col).over(w_in), F.lit(0))
            + F.col("__carry"),
        )
        .drop("__bk", "__bko", "__carry")
    )
