"""Skew-handling operators.

AQE's skew-join splitting (enabled in session.py) covers joins at runtime;
this module adds the classic SALTED TWO-PHASE AGGREGATION for skewed
groupBy keys: partial-aggregate on (key, salt) — spreading one hot key over
N reducers — then final-aggregate on key. Same result as a direct groupBy
(verified by oracle), bounded per-task load at any key skew.

When to use: a groupBy where one key holds >~1/shuffle_partitions of all
rows (power-law user ids, null-heavy FKs). Cost: one extra (tiny) shuffle
over the partially-aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salting — all aggregates in ONE pass.

    ``aggs`` is a list of (fn, column) with fn in sum|count|min|max (the
    re-aggregatable functions; avg must be decomposed as sum/count by the
    caller). Output columns are named ``<fn>_<col>``.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for fn, col in aggs:
        name = f"{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(name))
            final_exprs.append(F.sum(name).alias(name))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(name))
            final_exprs.append(F.sum(name).alias(name))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(name))
            final_exprs.append(F.min(name).alias(name))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(name))
            final_exprs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *partial_exprs
    )
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Salted equi-join for a skewed LEFT side: left rows get a random salt,
    the (smaller) right side is exploded across all salt values, and the
    join key becomes (on, salt). Use when AQE's skew splitting isn't enough
    (e.g. first-stage joins with no runtime stats yet). Right-side blowup is
    x salt_buckets — keep the right side the small one.

    Only left-preserving joins are valid: a right/full outer join would
    emit every unmatched right row once PER SALT COPY (salt_buckets
    duplicates) — refused rather than silently wrong."""
    if how.replace("_", "").lower() in (
        "right", "rightouter", "full", "fullouter", "outer",
    ):
        raise ValueError(
            f"salted_join(how={how!r}): right/full outer joins would "
            "duplicate unmatched right rows once per salt copy; use a "
            "plain join (or salt the other side) instead"
        )
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, on=[on, "__salt"], how=how)
    return out.drop("__salt")


#: chunked_running_sum engagement threshold (rows in the hottest window
#: partition). Measured crossover, not a guess (SCALE.md r10 window-
#: crossover table): at a 419k-row head partition the single window wins
#: 1.40x (chunking overhead: extra agg + join); at a 1.15M-row head the
#: chunked form wins by 22%. The default sits conservatively at the
#: break-even side of that bracket — below it the single window is never
#: worse locally, above it one task's serialized history starts to
#: dominate the stage.
HOT_PARTITION_ROWS = 1_000_000


def probe_hot_count(df: DataFrame, key_cols: list[str]) -> int:
    """Row count of the hottest key — one cheap hash-aggregate (map-side
    partial combine, tiny shuffle, no window sort). 0 on an empty frame.

    This is ``running_sum_auto``'s branch probe, exposed so callers who
    run the operator repeatedly over the SAME table can pay it ONCE and
    pass the result as ``hot_count`` (ADVICE r11: the probe eagerly
    evaluates ``df``'s full upstream per call — +15.2% on the registry
    query, measured in a04d2c8 — and a non-deterministic upstream could
    make a fresh probe disagree with the branch's own recomputation;
    probing once and hinting removes both)."""
    hottest = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n"))
        .first()[0]
    )
    return int(hottest) if hottest is not None else 0


def running_sum_auto(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    chunk_col: Column,
    out_col: str = "running_total",
    hot_partition_rows: int = HOT_PARTITION_ROWS,
    hot_count: int | None = None,
) -> DataFrame:
    """Running total that PICKS its physical form from the data (VERDICT
    r10 item 5): probe the hottest key's row count, then

    * below ``hot_partition_rows``: the plain single window — identical
      plan to a hand-written ``F.sum().over(window)``, ZERO added
      exchanges (plan-audit-pinned);
    * at or above it: ``chunked_running_sum`` — per-task work bounded by
      one (key, chunk) instead of one key's whole history.

    ``hot_count`` skips the probe: pass ``probe_hot_count(df, key_cols)``
    computed once when invoking the operator repeatedly over the same
    table, or a known key-distribution bound (ADVICE r11 — the probe is
    an eager driver-side job that re-evaluates ``df``'s upstream each
    call; callers feeding a non-deterministic or expensive uncached
    transform chain should either hint or ``persist()`` first). Both
    branches produce identical values AND an identical schema: ``out_col``
    is DOUBLE in both regimes (the chunked form's offset arithmetic is
    double, so the single window casts to match — a table crossing the
    threshold must never silently change schema; ADVICE r11).
    ``hot_partition_rows`` defaults to the measured local crossover
    (SCALE.md r10 bracket); clusters with different per-task budgets
    tune it."""
    if hot_count is None:
        hot_count = probe_hot_count(df, key_cols)
    if hot_count >= hot_partition_rows:
        out = chunked_running_sum(
            df.withColumn("__rs_val", F.col(value_col).cast("double")),
            key_cols,
            order_cols,
            "__rs_val",
            chunk_col,
            out_col,
        )
        return out.drop("__rs_val")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col, F.sum(F.col(value_col).cast("double")).over(w)
    )


def chunked_running_sum(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    chunk_col: Column,
    out_col: str = "running_total",
) -> DataFrame:
    """Two-phase prefix sum for HOT window partitions — the window-family
    counterpart of salted_agg. A running total's window partition cannot
    be split by AQE: one hot key (power-law user, bot session) serializes
    its entire history through one task. This decomposition bounds the
    per-task work by a CHUNK instead:

    1. intra-chunk prefix sums, window partitioned by (key, chunk) —
       per-task work is the chunk's rows, chosen by the caller (e.g. a
       calendar day of the ordering timestamp);
    2. chunk offsets: each chunk's sum of all EARLIER chunks, a window
       over the per-(key, chunk) totals — one row per (key, chunk),
       orders of magnitude smaller than the input;
    3. a co-partitioned join on (key, chunk) adds offset to intra.

    ``chunk_col`` must be non-decreasing along ``order_cols`` within each
    key (a truncation of the leading order column qualifies). Exact NULL
    semantics match the single-window form: a row whose frame has seen no
    non-null value yet yields NULL, not 0 (tracked via running non-null
    counts, phase 1 + phase 2). NULL keys and NULL chunks are groups too —
    a window partition keeps NULL-key rows as one partition, so the phase-3
    join uses null-safe equality (``<=>``) on every key and the chunk;
    Catalyst extracts ``<=>`` as equi-join keys, so the join still plans as
    a co-partitioned sort-merge, never a NestedLoop (ADVICE r09: a plain
    inner join silently dropped NULL-key/NULL-ts rows the single-window
    form keeps).

    Measured context (r09 skew rehearsal, SCALE.md): the single-window
    form absorbed 50% single-key heat at 10x local scale, so flagship
    queries keep it; this operator is the documented lever for corpora
    where one key's history outgrows a task."""
    k = list(key_cols)
    chunked = df.withColumn("__chunk", chunk_col)
    w_intra = (
        Window.partitionBy(*k, "__chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = chunked.withColumn(
        "__intra", F.sum(value_col).over(w_intra)
    ).withColumn("__intra_n", F.count(value_col).over(w_intra))
    totals = chunked.groupBy(*k, "__chunk").agg(
        F.sum(value_col).alias("__chunk_sum"),
        F.count(value_col).alias("__chunk_n"),
    )
    w_prev = (
        Window.partitionBy(*k)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *k,
        "__chunk",
        F.coalesce(F.sum("__chunk_sum").over(w_prev), F.lit(0.0)).alias(
            "__offset"
        ),
        F.coalesce(F.sum("__chunk_n").over(w_prev), F.lit(0)).alias(
            "__offset_n"
        ),
    )
    # Null-safe co-partitioned join: offsets-side keys are renamed so the
    # <=> condition is unambiguous (both frames share the `chunked` parent).
    renames = {c: f"__off_k{i}" for i, c in enumerate([*k, "__chunk"])}
    off2 = offsets.select(
        *[F.col(c).alias(n) for c, n in renames.items()],
        "__offset",
        "__offset_n",
    )
    cond = None
    for c, n in renames.items():
        term = F.col(c).eqNullSafe(F.col(n))
        cond = term if cond is None else cond & term
    joined = intra.join(off2, cond).drop(*renames.values())
    return (
        joined
        .withColumn(
            out_col,
            F.when(
                F.col("__intra_n") + F.col("__offset_n") > 0,
                F.coalesce(F.col("__intra"), F.lit(0.0)) + F.col("__offset"),
            ),
        )
        .drop("__chunk", "__intra", "__intra_n", "__offset", "__offset_n")
    )
