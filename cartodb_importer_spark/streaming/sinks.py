"""Streaming sinks: foreachBatch into a Catalog — how a stream lands in
the reference's Postgres world (JDBC has no native streaming sink; the
micro-batch hook is the production pattern).

Exactly-once discipline: Structured Streaming checkpoints the source
offsets per batch_id and replays a failed batch with the SAME batch_id —
so the sink must be idempotent per batch_id. ``stream_to_catalog`` appends
with a __batch_id column and pre-deletes that batch's rows on replay
(insert-overwrite-by-batch), giving effective exactly-once into any
catalog that supports append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_to_catalog(
    stream_df: DataFrame,
    catalog,
    table: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start a foreachBatch query appending micro-batches into
    ``catalog``/``table``. Returns the StreamingQuery (caller awaits)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        tagged = batch_df.withColumn("__batch_id", F.lit(batch_id))
        if catalog.exists(table):
            # idempotent replay: drop any rows this batch_id wrote before
            existing = catalog.read(batch_df.sparkSession, table)
            kept = existing.filter(F.col("__batch_id") != batch_id)
            merged = kept.unionByName(tagged)
            staging = f"{table}__rewrite"
            catalog.write(merged, staging)
            catalog.drop(table)
            catalog.rename(staging, table)
        else:
            catalog.write(tagged, table)

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
