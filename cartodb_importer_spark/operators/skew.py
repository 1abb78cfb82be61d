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

from pyspark.sql import Column, DataFrame
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
