"""Streaming operators checked in batch mode (SURVEY §2.3-S): the window /
session / dedup logic is shared with streaming/streams.py — the oracle
checks the batch relation; pytest checks stream-vs-batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.streams import (
    dedup_events,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from . import Tables, query


@query(
    "stream_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts)                     AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type — identical code path serves
    readStream sources (watermarked) and this batch check."""
    t = Tables(spark, sf_dir)
    return tumbling_counts(t.events)


@query(
    "stream_sliding_hourly",
    oracle="""
    WITH contrib AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS w0 FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
    )
    SELECT w0 AS window_start, w0 + INTERVAL '1 hour' AS window_end, count(*) AS n
    FROM contrib GROUP BY w0
    """,
)
def stream_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows: each event lands in two overlapping windows
    (Catalyst Expand, then a normal aggregate)."""
    t = Tables(spark, sf_dir)
    return sliding_counts(t.events)


@query(
    "stream_session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts)                         AS session_start,
           max(ts) + INTERVAL '10 minutes' AS session_end,
           count(*)                        AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user. Spark's session_window
    end = last event + gap; the oracle reproduces that with a
    gaps-and-islands formulation."""
    t = Tables(spark, sf_dir)
    return session_counts(t.events)


@query(
    "stream_dedup",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    GROUP BY ALL
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-once dedup on event_id over a doubled source (simulating
    at-least-once delivery). Streaming variant bounds state with
    dropDuplicatesWithinWatermark."""
    t = Tables(spark, sf_dir)
    doubled = t.events.union(t.events)
    return dedup_events(doubled).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "stream_late_data_filter",
    oracle="""
    SELECT event_id, ts
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL '1 day' FROM events)
    """,
)
def stream_late_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, batch-checkable: rows older than
    (max event time - delay) are the ones a 1-day watermark would drop."""
    t = Tables(spark, sf_dir)
    max_ts = t.events.agg(F.max("ts").alias("m"))
    return (
        t.events.crossJoin(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("m") - F.expr("INTERVAL 1 DAY"))
        .select("event_id", "ts")
    )


@query(
    "stream_resample_ffill",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
      FROM events GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS slot
      FROM bounds
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS slot, round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id, g.slot, h.v,
           last_value(h.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.slot
             ROWS UNBOUNDED PRECEDING) AS v_ffill,
           h.v IS NULL AS is_gap
    FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.slot = g.slot
    """,
)
def stream_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + gap fill + forward fill per user — the
    hypertable-rollup operator (operators/timeseries.py)."""
    from ..operators.timeseries import resample_ffill

    t = Tables(spark, sf_dir)
    return resample_ffill(t.events, key="user_id", ts="ts", value="value")


@query(
    "stream_resample_interp",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
      FROM events GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS slot
      FROM bounds
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS slot, round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), j AS (
      SELECT g.user_id, g.slot, h.v
      FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.slot = g.slot
    ), w AS (
      SELECT user_id, slot, v,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN slot END IGNORE NULLS)
               OVER wb AS ps,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN slot END IGNORE NULLS)
               OVER wf AS ns
      FROM j
      WINDOW wb AS (PARTITION BY user_id ORDER BY slot ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY slot
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, slot, v,
           floor((CASE WHEN v IS NOT NULL THEN v
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv)
                            * (CAST(epoch(slot) - epoch(ps) AS DOUBLE)
                               / (epoch(ns) - epoch(ps))) END)
                 * 10000 + 0.5) / 10000 AS v_interp,
           v IS NULL AS is_gap
    FROM w
    """,
)
def stream_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with linear interpolation across gaps — the
    hypertable ``interpolate()`` gap-fill next to ffill's ``locf()``
    (operators/timeseries.py:resample_interp)."""
    from ..operators.timeseries import resample_interp

    t = Tables(spark, sf_dir)
    return resample_interp(t.events, key="user_id", ts="ts", value="value")


@query(
    "stream_interval_join",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.event_type = 'error'
     AND e.ts >= p.ts
     AND e.ts <= p.ts + INTERVAL '1 hour'
    WHERE p.event_type = 'purchase'
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join in batch form (purchases x subsequent
    same-user errors within 1h) — on streams the same builder runs with
    watermarked state (tests/test_streaming.py proves equivalence)."""
    from ..streaming.streams import purchase_to_error_join

    t = Tables(spark, sf_dir)
    out = purchase_to_error_join(
        t.events.filter(F.col("event_type") == "purchase"),
        t.events.filter(F.col("event_type") == "error"),
    )
    return out.select("user_id", "purchase_id", "error_id")
