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


def stream_to_catalog(
    stream_df: DataFrame,
    catalog,
    table: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    compact_every: int | None = None,
):
    """Start a foreachBatch query appending micro-batches into
    ``catalog``/``table``. Returns the StreamingQuery (caller awaits).

    ``compact_every=N`` bounds the landing zone in-band: every N batches
    the sink folds batch directories strictly below the checkpoint's
    committed high-water mark into the table's compacted base
    (sinks/maintenance.compact_batches) — without it a long-running
    stream accretes one directory per trigger forever. Replay-safe by
    construction: while batch B is being written, ``commits/`` holds at
    most B-1, so compaction never touches a batch the engine could still
    replay. LocalCatalog-layout only — validated HERE so a
    misconfiguration fails at stream setup, not as a ValueError inside
    the Nth micro-batch killing a running query (ADVICE r10); other
    catalogs run their native maintenance (Delta OPTIMIZE, Iceberg
    rewrite_data_files) out-of-band. A compaction skipped because
    another actor holds the table's advisory lock (e.g. the lock file a
    kill left behind, within its stale window) is retried at the next
    interval — maintenance is never worth killing the stream over."""
    if compact_every is not None:
        from ..sinks.catalog import LocalCatalog

        if compact_every < 1:
            raise ValueError(
                f"compact_every must be >= 1, got {compact_every}"
            )
        if not isinstance(catalog, LocalCatalog):
            raise ValueError(
                "compact_every needs a LocalCatalog partition-dir layout; "
                f"got {type(catalog).__name__} — run that catalog's native "
                "maintenance (Delta OPTIMIZE, Iceberg rewrite_data_files) "
                "out-of-band"
            )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent replay is the CATALOG's primitive: a replayed batch_id
        # replaces exactly its own rows (LocalCatalog: per-batch partition
        # directory, O(batch) per trigger; generic catalogs: documented
        # O(table) rewrite fallback — sinks/catalog.py replace_batch)
        catalog.replace_batch(batch_df, table, batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            from ..sinks.maintenance import (
                CompactionInProgress, committed_high_water_mark,
                compact_batches,
            )

            try:
                compact_batches(
                    batch_df.sparkSession,
                    catalog,
                    table,
                    committed_high_water_mark(checkpoint_dir),
                )
            except CompactionInProgress:
                pass  # retried compact_every batches later

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
