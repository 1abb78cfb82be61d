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


#: intervals the resamplers support, mapped to their date_trunc unit; any
#: other interval would silently bucket at the wrong granularity (the grid
#: steps by the literal interval while truncation snaps to this unit)
_TRUNC_UNIT = {"1 hour": "hour", "1 day": "day"}


def _trunc_unit(interval: str) -> str:
    try:
        return _TRUNC_UNIT[interval]
    except KeyError:
        raise ValueError(
            f"unsupported resample interval {interval!r}: expected one of "
            f"{sorted(_TRUNC_UNIT)} (bucket truncation and grid step must "
            "agree; add the pair to _TRUNC_UNIT to extend)"
        ) from None


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    interval: str = "1 hour",
) -> DataFrame:
    """Bucket ``value`` by (key, interval), fill missing buckets on a
    per-key grid from the key's first bucket to its last event, and
    forward-fill the aggregate. Output: (key, slot, v, v_ffill, is_gap).

    Plan (guide §2.4 — remove shuffles outright): like
    :func:`resample_interp`, the dense grid is never built, joined, or
    windowed. ONE scan buckets the events; ONE window over the SPARSE
    buckets computes both the forward-fill (``last ignorenulls`` — on the
    bucket frame it already carries exactly the value every trailing gap
    slot needs) and the next-bucket boundary (``lead``, same sort, same
    Window node); each bucket then explodes directly into itself plus its
    trailing gap slots. The old form cost a second full scan of ``df``
    (per-key raw-timestamp bounds), a grid-join exchange AND a
    window-only exchange (the join's (key, slot) hash partitioning does
    not satisfy the window's key-only clustering) — 2 scans + 4 shuffles
    down to 1 scan + 2 shuffles, values identical row-for-row (the grid
    from first-bucket to last raw event contains precisely each bucket's
    slot plus the slots strictly between it and the next bucket; a
    null-``v`` bucket forward-fills from the last non-null exactly as
    the grid join + dense window produced)."""
    slot = F.date_trunc(_trunc_unit(interval), F.col(ts))
    bucketed = (
        df.groupBy(F.col(key), slot.alias("slot"))
        .agg(F.round(F.sum(value), 2).alias("v"))
    )
    w = Window.partitionBy(key).orderBy("slot")
    wff = w.rowsBetween(Window.unboundedPreceding, 0)
    seg = bucketed.select(
        key,
        F.col("slot").alias("__s"),
        F.col("v").alias("__vs"),
        F.last("v", ignorenulls=True).over(wff).alias("__f"),
        F.lead("slot").over(w).alias("__e"),
    )
    # each key's LAST bucket has no lead — it contributes exactly its own
    # slot, folded into the same explode so the plan stays one branch
    slots = F.when(F.col("__e").isNull(), F.array(F.col("__s"))).otherwise(
        F.sequence(
            F.col("__s"),
            F.expr(f"__e - INTERVAL {interval}"),
            F.expr(f"INTERVAL {interval}"),
        )
    )
    observed = F.col("slot") == F.col("__s")
    return (
        seg.select(key, "__s", "__vs", "__f", F.explode(slots).alias("slot"))
        .select(
            key,
            "slot",
            F.when(observed, F.col("__vs")).alias("v"),
            F.col("__f").alias("v_ffill"),
            F.when(observed, F.col("__vs")).isNull().alias("is_gap"),
        )
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

    Plan: unlike ffill's grid-join-then-window, interpolation only ever
    needs the two BOUNDING observed buckets, so the dense grid is never
    joined or windowed. One ``lead`` window over the SPARSE bucketed
    aggregate pairs consecutive observations into segments, and each
    segment explodes directly into its dense slots with the
    interpolated value computed inline — the dense rows are produced
    exactly once and never shuffled. At 100 TB the window input is the
    bucket count (span/interval per key), not the filled grid.

    Leading/trailing gaps cannot occur: every gap slot lies strictly
    between two observed buckets because the grid spans the key's own
    first..last bucket, both observed.
    """
    unit = _trunc_unit(interval)
    slot = F.date_trunc(unit, F.col(ts))
    bucketed = (
        df.groupBy(F.col(key), slot.alias("slot"))
        .agg(F.round(F.sum(value), 2).alias("v"))
    )
    w = Window.partitionBy(key).orderBy("slot")
    seg = bucketed.select(
        key,
        F.col("slot").alias("s"),
        F.col("v").alias("vs"),
        F.lead("slot").over(w).alias("e"),
        F.lead("v").over(w).alias("ve"),
    )
    frac = (
        (F.unix_timestamp("slot") - F.unix_timestamp("s")).cast("double")
        / (F.unix_timestamp("e") - F.unix_timestamp("s"))
    )
    observed = F.col("slot") == F.col("s")
    # each key's LAST bucket has no lead segment — it contributes exactly
    # its own slot, folded into the same explode so the plan stays one
    # branch (a union would duplicate the aggregate+window subtree)
    slots = F.when(F.col("e").isNull(), F.array(F.col("s"))).otherwise(
        F.sequence(
            F.col("s"),
            F.expr(f"e - INTERVAL {interval}"),
            F.expr(f"INTERVAL {interval}"),
        )
    )
    return (
        seg.select(key, "s", "vs", "e", "ve", F.explode(slots).alias("slot"))
        .select(
            key,
            "slot",
            F.when(observed, F.col("vs")).alias("v"),
            (
                F.floor(
                    F.when(observed, F.col("vs")).otherwise(
                        F.col("vs") + (F.col("ve") - F.col("vs")) * frac
                    )
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("v_interp"),
            (~observed).alias("is_gap"),
        )
    )


def upsert_latest(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str,
) -> DataFrame:
    """Merge/upsert without a lakehouse format: union existing and update
    rows, keep the highest-version row per key, updates beating existing
    rows at equal versions. One shuffle on the key — the CDC-compaction
    shape; with Delta/Iceberg this becomes a real MERGE, same semantics.

    Determinism contract: (key, version) must be unique WITHIN each input
    frame — two update rows for one key at the same version tie on both
    sort keys and row_number picks one arbitrarily. Pre-dedup the
    changelog (e.g. by a change sequence number) if that can occur."""
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
