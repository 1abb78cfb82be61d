"""Custom stateful streaming operators via applyInPandasWithState — the
escape hatch for semantics the built-in windowed aggregations can't express
(SURVEY §2.3-S: 'custom stateful operators').

Implemented operator: per-user RUNNING TOTALS with event-count — state is a
(count, sum) pair per user, updated each micro-batch, emitted as a changelog
row per batch. Bounded state: one tiny tuple per key; a watermark-driven
timeout (GroupStateTimeout) would evict idle keys in a production stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user cumulative (count, sum) maintained in group
    state; each micro-batch emits the updated totals for users seen in that
    batch. On a batch DataFrame, use `batch_user_totals` (same result as
    the stream's final state)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """Batch equivalent of the stream's final state per user."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
