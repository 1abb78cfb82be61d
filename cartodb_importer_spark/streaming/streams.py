"""Streaming pipeline builders over the `events` table shape.

Scale notes: watermarks bound state (without one, windowed aggregation
state grows forever on an unbounded stream); `availableNow` triggers give
deterministic batch-equivalent runs for tests; `dropDuplicatesWithinWatermark`
is the bounded-state streaming dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as st

EVENTS_SCHEMA = st.StructType(
    [
        st.StructField("event_id", st.LongType()),
        st.StructField("ts", st.TimestampType()),
        st.StructField("user_id", st.LongType()),
        st.StructField("event_type", st.StringType()),
        st.StructField("value", st.DoubleType()),
        st.StructField("props", st.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream over a directory of events parquet files (each
    arriving file is a micro-batch)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
    )


def _rate_to_events(raw: DataFrame) -> DataFrame:
    """Map the rate source's (timestamp, value) onto the events shape with
    deterministic synthetic attributes (pure functions of `value`, so a
    replayed batch regenerates identical rows — required for exactly-once
    sinks)."""
    v = F.col("value")
    return raw.select(
        v.alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(v, F.lit(100)).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
            (F.pmod(v, F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64(v), F.lit(10000)) / 100.0).alias("value"),
        F.to_json(F.struct(F.pmod(v, F.lit(7)).alias("k"))).alias("props"),
    )


def read_rate_events(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 2
) -> DataFrame:
    """Synthetic events stream from the built-in `rate` source — the
    in-container stand-in for a Kafka ingest (same downstream pipeline;
    swap read_kafka_events in production). Backpressure-free generator,
    useful for soak-testing watermark state eviction."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )
    return _rate_to_events(raw)


def read_rate_micro_batch_events(
    spark: SparkSession,
    rows_per_batch: int = 50,
    start_timestamp_ms: int = 1_700_000_000_000,
    advance_ms_per_batch: int = 60_000,
) -> DataFrame:
    """Deterministic micro-batch generator (`rate-micro-batch` source):
    batch N always contains the same rows and timestamps, which makes
    streaming tests reproducible — unlike `rate`, which is wall-clock
    driven."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", start_timestamp_ms)
        .option("advanceMillisPerBatch", advance_ms_per_batch)
        .load()
    )
    return _rate_to_events(raw)


def read_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka ingest: JSON message values parsed into the events schema.
    Requires the spark-sql-kafka connector on the cluster classpath (not
    shipped in this container — load() raises there; the pipeline shape
    downstream of this reader is identical to the rate/file sources, which
    is what the streaming tests exercise)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_SCHEMA).alias("e")
    ).select("e.*")


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type. Works on batch
    and streaming frames alike (watermark is a no-op in batch)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.window("ts", window).alias("w"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n",
        "total_value",
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows (gap-based). In streaming mode the watermark closes
    sessions; in batch the result is the gaps-and-islands relation."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming-safe exact dedup on event_id. On a stream, state is
    bounded by the watermark (dropDuplicatesWithinWatermark); in batch it
    degenerates to plain dropDuplicates."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain a stream deterministically (availableNow) into an in-memory
    table for batch-equivalence assertions."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def purchase_to_error_join(
    purchases: DataFrame,
    errors: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to same-user
    errors within ``window`` after it. On streams both sides carry
    watermarks and the time-bound predicate bounds the join state (without
    the interval condition, stream-stream state grows forever). Works
    identically on batch frames for equivalence testing."""
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("e_ts"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if errors.isStreaming:
        e = e.withWatermark("e_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {window}"))
    )
    return p.join(e, cond).select(
        F.col("p_user").alias("user_id"), "purchase_id", "error_id", "p_ts", "e_ts"
    )


def enrich_with_user_dim(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a STATIC user
    dimension (tier lookup). The static side is broadcast into every
    micro-batch — no state store involved, Spark re-plans the static
    side per batch, and the stream side never shuffles on the join key
    (the canonical dimension-enrichment topology; at scale the static
    side is a compact dim table, refreshed by restarting the query or
    via Delta's deletion-vector-aware rescan).

    Works identically on a batch frame, which is what the equivalence
    test asserts."""
    from pyspark.sql.functions import broadcast

    return events.join(broadcast(user_dim), "user_id", "left").select(
        "event_id", "user_id", "event_type", "value", "tier"
    )


def user_tier_dim(events_batch: DataFrame) -> DataFrame:
    """Static user dimension derived from historical totals: tier by
    lifetime value quartile-ish thresholds (deterministic)."""
    return (
        events_batch.groupBy("user_id")
        .agg(F.sum("value").alias("lifetime_value"))
        .select(
            "user_id",
            F.when(F.col("lifetime_value") > 10000, "gold")
            .when(F.col("lifetime_value") > 3000, "silver")
            .otherwise("bronze")
            .alias("tier"),
        )
    )
