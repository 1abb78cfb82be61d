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


# ---------------------------------------------------------------- sessions

SESSION_OUTPUT = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long, total_value double"
)
# open-session state per user, timestamps in unix micros
SESSION_STATE = "start long, last long, n long, total double"

_GAP_US_DEFAULT = 1800 * 1_000_000


def _make_session_updater(gap_us: int):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def row(start, last, n, total):
            return {
                "user_id": user_id,
                "session_start": pd.Timestamp(start, unit="us"),
                "session_end": pd.Timestamp(last, unit="us"),
                "n_events": n,
                "total_value": round(total, 2),
            }

        if state.hasTimedOut:
            # watermark passed last+gap with no new events: flush the open
            # session and drop the key (bounded state under churn)
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame([row(start, last, n, total)])
            return

        events = pd.concat(list(pdfs), ignore_index=True)
        # datetime64[ns] -> unix micros (integer division, exact)
        ts_us = events["ts"].astype("int64") // 1000
        order = ts_us.argsort(kind="stable")
        ts_us = ts_us.iloc[order].to_numpy()
        vals = events["value"].iloc[order].to_numpy()

        open_s = state.get if state.exists else None
        closed = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if open_s is None:
                open_s = (t, t, 1, float(v))
            else:
                start, last, n, total = open_s
                if t - last > gap_us:
                    closed.append(row(start, last, n, total))
                    open_s = (t, t, 1, float(v))
                else:
                    open_s = (start, max(last, t), n + 1, total + float(v))
        # event-time timeout at last+gap: fires when the watermark passes
        # it. The watermark may ALREADY be past last+gap — any micro-batch
        # spanning more event time than the watermark delay leaves its
        # early users' sessions expired by the time the batch's own max ts
        # advances the watermark (found by the r09 throughput rehearsal:
        # setTimeoutTimestamp raises INVALID_TIMEOUT_TIMESTAMP on a
        # timestamp at-or-before the current watermark). Such a session is
        # closed BY DEFINITION — emit it now instead of asking for an
        # impossible wake-up; Spark would only have delivered the timeout
        # one trigger later.
        timeout_ms = (open_s[1] + gap_us) // 1000
        if timeout_ms <= state.getCurrentWatermarkMs():
            closed.append(row(open_s[0], open_s[1], open_s[2], open_s[3]))
            if state.exists:
                state.remove()
        else:
            state.update(open_s)
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return _update


def sessionize_events(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "30 days",
) -> DataFrame:
    """Event-time sessionization with a custom gap rule on arbitrary state
    (the applyInPandasWithState escape hatch — built-in session_window
    covers plain gaps; this operator is where per-session custom logic
    lives: counts, sums, any session-scoped feature). A session CLOSES
    when a later event arrives more than ``gap_sec`` after it, or when the
    event-time watermark passes ``last + gap`` (GroupStateTimeout
    .EventTimeTimeout flushes idle keys, keeping state bounded). Emitted
    rows are CLOSED sessions only; the trailing open session per user
    flushes on timeout as the watermark advances."""
    src = (
        events.withWatermark("ts", watermark) if events.isStreaming else events
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _make_session_updater(gap_sec * 1_000_000),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def batch_sessions(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Batch twin of sessionize_events (gaps-and-islands over a window):
    ALL sessions, including each user's final one."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = events.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > gap_sec * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return marked.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).drop("sid")


# --------------------------------------------------- transformWithState


def _make_topk_processor(k: int):
    """Per-user top-k tracker on the Spark 4 transformWithState API —
    the successor to applyInPandasWithState: typed state handles
    (Value/List/Map), optional TTL, and timers, backed by the RocksDB
    state store. State here is ONE ValueState holding the current top-k
    array + a cumulative count; emitted rows are per-batch changelog
    entries (n_seen strictly increases, so the max-n_seen row per user is
    the final answer)."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "topk", "vals ARRAY<DOUBLE>, n_seen BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                vals, n_seen = self._state.get()
                current = list(vals)
            else:
                current, n_seen = [], 0
            for pdf in rows:
                batch_vals = pdf["value"].dropna()
                n_seen += int(len(batch_vals))
                current.extend(float(v) for v in batch_vals)
            current = sorted(current, reverse=True)[:k]
            self._state.update((current, n_seen))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_seen": [n_seen], "topk": [current]}
            )

        def close(self) -> None:
            pass

    return TopKProcessor()


def user_topk_values(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming per-user top-k event values via transformWithStateInPandas.
    Requires the RocksDB state store provider (set
    spark.sql.streaming.stateStore.providerClass accordingly) and the
    google.protobuf package (the TWS state-server protocol; absent in this
    container, so the equivalence test skips here and runs on a real
    cluster). State is one bounded array per user regardless of stream
    length."""
    return events.groupBy("user_id").transformWithStateInPandas(
        _make_topk_processor(k),
        outputStructType="user_id BIGINT, n_seen BIGINT, topk ARRAY<DOUBLE>",
        outputMode="Update",
        timeMode="None",
    )


# ------------------------------------------------------------- rate limiter

RATE_OUTPUT_SCHEMA = "event_id long, user_id long, slot_seq long, admitted int"
RATE_STATE_SCHEMA = "hour long, n long"


def _make_rate_limiter(limit: int):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            hour, n = state.get
        else:
            hour, n = -1, 0
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                h = int(pd.Timestamp(ts).value // 3_600_000_000_000)
                if h != hour:
                    hour, n = h, 0
                n += 1
                out.append((int(eid), int(user_id), n, int(n <= limit)))
        state.update((int(hour), int(n)))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "slot_seq", "admitted"]
        )

    return _update


def rate_limit_events(events: DataFrame, limit: int = 3) -> DataFrame:
    """Streaming per-key rate limiter: one (current_hour, count) tuple of
    state per user admits the first `limit` events of each (user, hour)
    and rejects the rest, emitting a per-event verdict row. The batch
    oracle is the events_rate_limit registered query (row_number over the
    (user, hour) window) — equality checked in tests/test_streaming.py.
    Assumes watermark-bounded per-key arrival order, the same contract as
    the sessionizer above; state is O(1) per key regardless of volume."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_rate_limiter(limit),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
