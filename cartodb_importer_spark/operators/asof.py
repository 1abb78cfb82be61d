"""As-of (nearest-timestamp) join.

Spark has no ASOF JOIN primitive (DuckDB does; the reference has no joins at
all — this is declared engine surface per SURVEY §2.3). The scalable
formulation is the union+window fill:

1. tag left and right rows and union them on (keys, ts);
2. one window per key ordered by (ts, side) carries the latest right-side
   value forward (``last(..., ignorenulls=True)``);
3. keep only left rows.

Cost: ONE shuffle on the key columns (the window), versus the naive
range-join which explodes to |L|x|R| per key before aggregation. At 100 TB
this is the difference between a linear pass and a quadratic blowup. Skewed
keys are handled by AQE; a per-key salting variant is not needed because the
window is a single pass, not a join.

``direction='nearest'`` runs the backward and forward fills as TWO windows
over the SAME partitioning (the second differs only in sort order, so
Catalyst inserts a re-sort, not a second exchange) and picks the closer
match per row. ``tolerance_us`` bounds the match gap (kdb ``wj``/pandas
``merge_asof(tolerance=…)`` semantics): out-of-range matches become NULL,
exactly as if no right row existed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row's values at the greatest
    ``right_ts <= left_ts`` (direction='backward'), smallest
    ``right_ts >= left_ts`` ('forward'), or whichever of the two is
    closer, backward winning distance ties ('nearest'). ``tolerance_us``
    (microseconds) nulls matches farther than the bound.

    Among right rows sharing the winning timestamp the one with the
    HIGHEST ordering over ``value_cols`` wins in every direction (the
    window takes the last row of the ascending (ts, values) sort; the
    forward direction mirrors the timestamp only, not the value order) —
    deterministic by construction, unlike vendor ASOF implementations
    that pick arbitrarily. The registered oracles pin this exact rule.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]

    # side ordering: for backward, right rows sort before left rows at equal
    # ts so a right row AT the left row's timestamp is visible to it.
    l_tagged = left.withColumn("__ts", _us(F.col(left_ts))).withColumn(
        "__side", F.lit(1)
    )
    r_payload = F.struct(
        *[F.col(right_ts).alias("__rts")] + [F.col(c) for c in value_cols]
    )
    r_tagged = (
        right.select(*on, _us(F.col(right_ts)).alias("__ts"), r_payload.alias("__rv"))
        .withColumn("__side", F.lit(0))
    )
    if direction == "forward":
        # mirror time so 'latest before' becomes 'earliest after'
        l_tagged = l_tagged.withColumn("__ts", -F.col("__ts"))
        r_tagged = r_tagged.withColumn("__ts", -F.col("__ts"))

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # backward fill: last non-null right payload over the running frame.
    # Struct comparison orders by (__rts, value_cols...) — ties break
    # deterministically.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            F.col("__rv").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    if direction == "nearest":
        # forward fill over the same partitioning: right rows at equal ts
        # sort AFTER left rows (side desc) so they land in the following
        # frame; first non-null payload = earliest right >= left ts.
        w_fwd = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("__ts").asc(),
                F.col("__side").desc(),
                F.col("__rv").asc_nulls_last(),
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = unioned.withColumn(
            "__mb", F.last("__rv", ignorenulls=True).over(w_back)
        ).withColumn("__mf", F.first("__rv", ignorenulls=True).over(w_fwd))
        lts = F.col("__ts")
        db = lts - _us(F.col("__mb.__rts"))
        df_ = _us(F.col("__mf.__rts")) - lts
        if tolerance_us is not None:
            mb = F.when(db <= F.lit(tolerance_us), F.col("__mb"))
            mf = F.when(df_ <= F.lit(tolerance_us), F.col("__mf"))
        else:
            mb, mf = F.col("__mb"), F.col("__mf")
        pick = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(db <= df_, mb)
            .otherwise(mf)
        )
        filled = filled.withColumn("__match", pick)
        out = filled.filter(F.col("__side") == 1).drop(
            "__ts", "__side", "__rv", "__mb", "__mf"
        )
    else:
        filled = unioned.withColumn(
            "__match", F.last("__rv", ignorenulls=True).over(w_back)
        )
        if tolerance_us is not None:
            # mirrored axis: both __ts values were negated together, so the
            # difference is sign-flipped but |gap| is unchanged.
            gap = F.abs(F.col("__ts") - (
                -_us(F.col("__match.__rts"))
                if direction == "forward"
                else _us(F.col("__match.__rts"))
            ))
            filled = filled.withColumn(
                "__match",
                F.when(gap <= F.lit(tolerance_us), F.col("__match")),
            )
        out = filled.filter(F.col("__side") == 1).drop("__ts", "__side", "__rv")

    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__match.__rts").alias(right_ts + suffix))
    for c in value_cols:
        sel.append(F.col(f"__match.{c}").alias(c + suffix if c in left.columns else c))
    return out.select(*sel)
