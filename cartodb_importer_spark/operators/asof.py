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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row's values at the greatest
    ``right_ts <= left_ts`` (direction='backward') or smallest
    ``right_ts >= left_ts`` ('forward') within the same ``on`` key group.

    Among right rows sharing the winning timestamp the one with the highest
    (lowest, for 'forward') ordering over ``value_cols`` wins — deterministic
    by construction, unlike vendor ASOF implementations that pick arbitrarily.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]

    ts = F.col("__ts")
    # side ordering: for backward, right rows sort before left rows at equal
    # ts so a right row AT the left row's timestamp is visible to it.
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    r_payload = F.struct(
        *[F.col(right_ts).alias("__rts")] + [F.col(c) for c in value_cols]
    )
    r_tagged = (
        right.select(*on, F.col(right_ts).alias("__ts"), r_payload.alias("__rv"))
        .withColumn("__side", F.lit(0))
    )
    if direction == "forward":
        # mirror time so 'latest before' becomes 'earliest after'
        l_tagged = l_tagged.withColumn("__ts", -F.unix_micros(ts))
        r_tagged = r_tagged.withColumn("__ts", -F.unix_micros(ts))

    unioned = l_tagged.unionByName(
        r_tagged, allowMissingColumns=True
    )
    # max_by over the running frame: last non-null right payload. Struct
    # comparison orders by (__rts, value_cols...) so ties break deterministically.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1).drop("__ts", "__side", "__rv")
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__match.__rts").alias(right_ts + suffix))
    for c in value_cols:
        sel.append(F.col(f"__match.{c}").alias(c + suffix if c in left.columns else c))
    return out.select(*sel)
