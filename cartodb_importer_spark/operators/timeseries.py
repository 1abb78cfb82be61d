"""Time-series resampling: regular-grid downsampling with gap filling —
the hypertable-rollup shape (continuous aggregate over a time grid).

Construction: per-key time bounds -> sequence() grid explode -> left join
the bucketed aggregate -> forward-fill via last(ignorenulls) over a
running frame. Two shuffles total (the aggregate and the grid join; the
window reuses the join's partitioning). The grid explode is bounded by
(span / interval) rows per key — at 100 TB pick the interval so grids stay
proportionate; gaps materialize as rows only on the filled output, never
as shuffle inflation of the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    interval: str = "1 hour",
) -> DataFrame:
    """Bucket ``value`` by (key, interval), fill missing buckets on a
    per-key grid from the key's first bucket to its last event, and
    forward-fill the aggregate. Output: (key, slot, v, v_ffill, is_gap)."""
    slot = F.date_trunc("hour", F.col(ts)) if interval == "1 hour" else F.date_trunc(
        "day", F.col(ts)
    )
    bucketed = (
        df.groupBy(F.col(key), slot.alias("slot"))
        .agg(F.round(F.sum(value), 2).alias("v"))
    )
    bounds = df.groupBy(key).agg(
        F.min(F.col(ts)).alias("lo"), F.max(F.col(ts)).alias("hi")
    )
    lo_slot = (
        F.date_trunc("hour", F.col("lo"))
        if interval == "1 hour"
        else F.date_trunc("day", F.col("lo"))
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(lo_slot, F.col("hi"), F.expr(f"INTERVAL {interval}"))
        ).alias("slot"),
    )
    joined = grid.join(bucketed, on=[key, "slot"], how="left")
    w = (
        Window.partitionBy(key)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key,
        "slot",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
        F.col("v").isNull().alias("is_gap"),
    )


def resample_interp(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    interval: str = "1 hour",
) -> DataFrame:
    """Hourly resample with LINEAR INTERPOLATION across gaps (the other
    half of the hypertable gap-fill surface next to :func:`resample_ffill`:
    ``locf`` vs ``interpolate``).

    Same grid construction as ``resample_ffill`` (bounded explode, one
    aggregate shuffle, window reuses the join partitioning); the fill then
    needs BOTH the previous and next observed bucket, so two window passes
    over the same (key, slot) sort — Spark plans them over a single
    exchange+sort. Interpolation weight is epoch-second arithmetic, and
    the final rounding uses the engine-portable ``floor(x*1e4+0.5)/1e4``
    formulation so the DuckDB oracle matches bitwise.

    Leading/trailing gaps cannot occur (the grid spans the key's own
    first..last bucket, both of which contain events), but the fill still
    guards them: a missing previous neighbor back-fills from the next,
    and vice versa.
    """
    slot = F.date_trunc("hour", F.col(ts)) if interval == "1 hour" else F.date_trunc(
        "day", F.col(ts)
    )
    bucketed = (
        df.groupBy(F.col(key), slot.alias("slot"))
        .agg(F.round(F.sum(value), 2).alias("v"))
    )
    bounds = df.groupBy(key).agg(
        F.min(F.col(ts)).alias("lo"), F.max(F.col(ts)).alias("hi")
    )
    lo_slot = (
        F.date_trunc("hour", F.col("lo"))
        if interval == "1 hour"
        else F.date_trunc("day", F.col("lo"))
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(lo_slot, F.col("hi"), F.expr(f"INTERVAL {interval}"))
        ).alias("slot"),
    )
    joined = grid.join(bucketed, on=[key, "slot"], how="left")
    w_back = (
        Window.partitionBy(key)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy("slot")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col("v")
    pv = F.last("v", ignorenulls=True).over(w_back)
    ps = F.last(F.when(v.isNotNull(), F.col("slot")), ignorenulls=True).over(
        w_back
    )
    nv = F.first("v", ignorenulls=True).over(w_fwd)
    ns = F.first(F.when(v.isNotNull(), F.col("slot")), ignorenulls=True).over(
        w_fwd
    )
    frac = (
        (F.unix_timestamp("slot") - F.unix_timestamp(ps)).cast("double")
        / (F.unix_timestamp(ns) - F.unix_timestamp(ps))
    )
    raw = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * frac)
    )
    return joined.select(
        key,
        "slot",
        "v",
        (F.floor(raw * 10000 + 0.5) / 10000).alias("v_interp"),
        v.isNull().alias("is_gap"),
    )


def upsert_latest(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str,
) -> DataFrame:
    """Merge/upsert without a lakehouse format: union existing and update
    rows, keep the highest-version row per key (deterministic tiebreak on
    update-side priority). One shuffle on the key — the CDC-compaction
    shape; with Delta/Iceberg this becomes a real MERGE, same semantics."""
    tagged_e = existing.withColumn("__src", F.lit(0))
    tagged_u = updates.withColumn("__src", F.lit(1))
    unioned = tagged_e.unionByName(tagged_u)
    w = Window.partitionBy(key).orderBy(
        F.desc(version_col), F.desc("__src")
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
