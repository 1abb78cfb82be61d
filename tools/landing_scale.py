#!/usr/bin/env python
"""Landing-zone scale rehearsal: what does compaction buy at real
trigger counts?

The r09 O(batch) sink accretes one ``__batch_id=N`` dir per trigger —
correct, but a week of 1-minute triggers is ~10k directories on every
read's listing path. This runner lands N_BATCHES micro-batches into a
LocalCatalog, times a full read (count + one grouped aggregate) at the
accreted layout, compacts below the frontier, re-times the same reads,
and verifies row/value equality. Prints one JSON line per measurement.

    N_BATCHES=200 python tools/landing_scale.py

r11 additions (VERDICT r10 item 3 — rehearse the extrapolated point):

* ``SYNTH=1`` builds the accreted layout with direct pyarrow writes —
  one ``__batch_id=N/part-0.parquet`` per dir, byte-layout-identical to
  what ``replace_batch`` produces (that path writes plain parquet into
  the partition dir; ``__batch_id`` is recovered as a partition column
  on read) — so a 10k-dir landing zone builds in seconds instead of
  10k Spark write jobs. The READS and the COMPACTION under measurement
  are real Spark either way; only the landing is synthesized.

      SYNTH=1 N_BATCHES=10000 python tools/landing_scale.py

* ``STREAM_TRIGGERS=N`` then runs the in-band wiring live: a real file-
  source stream of N single-file micro-batches with
  ``compact_every=$COMPACT_EVERY`` (default 10), polling the batch-dir
  count the whole run and ASSERTING it stays bounded at
  compact_every + a small constant — the dir count must be O(recent),
  never O(total triggers), while the stream keeps committing.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = int(os.environ.get("N_BATCHES", "200"))
SRC = os.environ.get("STRESS_SRC", "/root/testdata/sf0.01")
SYNTH = os.environ.get("SYNTH") == "1"
STREAM_TRIGGERS = int(os.environ.get("STREAM_TRIGGERS", "0"))
COMPACT_EVERY = int(os.environ.get("COMPACT_EVERY", "10"))
#: MAINT_MODE=oob (VERDICT r11 item 3): the stream carries only the
#: landing_max_dirs listdir check while a concurrent run_maintenance
#: thread compacts under the advisory lock; control = COMPACT_EVERY=0
#: MAINT_MODE=control (no maintenance at all). The stream WALL deltas
#: between control/inband/oob are the trigger-path cost of each mode.
MAINT_MODE = os.environ.get("MAINT_MODE", "")
MAINT_MIN_DIRS = int(os.environ.get("MAINT_MIN_DIRS", "10"))
#: MAINT_RUNNERS=2 exercises the advisory-lock contention path LIVE: two
#: concurrent run_maintenance loops against the same table — exactly one
#: wins each fold, the loser's skip is counted, the table never corrupts
MAINT_RUNNERS = int(os.environ.get("MAINT_RUNNERS", "1"))


def timed_read(spark, cat, table: str) -> tuple[float, int, float]:
    t0 = time.perf_counter()
    df = cat.read(spark, table)
    n = df.count()
    s = df.agg(F.sum("value")).collect()[0][0]
    return round(time.perf_counter() - t0, 2), n, s


def synth_landing(root: str, table: str, n_batches: int) -> tuple[int, float]:
    """Round-robin the source events over n_batches ``__batch_id=N`` dirs
    with direct pyarrow writes (same file layout replace_batch leaves)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SRC}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    total = t.num_rows
    table_dir = os.path.join(root, table)
    os.makedirs(table_dir, exist_ok=True)
    per = max(1, total // n_batches)
    t0 = time.perf_counter()
    for b in range(n_batches):
        lo = b * per
        sl = t.slice(lo, per) if b < n_batches - 1 else t.slice(lo)
        if sl.num_rows == 0:  # keep the dir count honest even on underflow
            sl = pa.table(
                {
                    "event_id": pa.array([-(b + 1)], type=pa.int64()),
                    "user_id": pa.array([0], type=pa.int64()),
                    "value": pa.array([0.0], type=pa.float64()),
                }
            )
            total += 1
        d = os.path.join(table_dir, f"__batch_id={b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sl, os.path.join(d, "part-00000.parquet"))
    return total, round(time.perf_counter() - t0, 2)


def run_accretion_phase(spark, root: str) -> None:
    from cartodb_importer_spark.sinks import maintenance as M
    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    cat = LocalCatalog(root)
    if SYNTH:
        total, land_sec = synth_landing(root, "t", N_BATCHES)
    else:
        events = (
            spark.read.parquet(f"{SRC}/events.parquet")
            .select("event_id", "user_id", "value")
            .cache()
        )
        total = events.count()
        t0 = time.perf_counter()
        for b in range(N_BATCHES):
            batch = events.filter(F.col("event_id") % N_BATCHES == b)
            cat.replace_batch(batch, "t", b)
        land_sec = round(time.perf_counter() - t0, 2)
    print(json.dumps({
        "phase": "land", "batches": N_BATCHES, "rows": total,
        "wall_sec": land_sec, "synthesized": SYNTH,
    }), flush=True)

    pre, n_pre, s_pre = timed_read(spark, cat, "t")
    dirs_pre = len(cat.batch_ids("t"))
    print(json.dumps({
        "phase": "read_accreted", "dirs": dirs_pre, "read_sec": pre,
    }), flush=True)

    t0 = time.perf_counter()
    folded = M.compact_batches(
        spark, cat, "t", keep_after_batch_id=N_BATCHES - 1
    )
    compact_sec = round(time.perf_counter() - t0, 2)
    post, n_post, s_post = timed_read(spark, cat, "t")
    dirs_post = len(cat.batch_ids("t"))
    print(json.dumps({
        "phase": "read_compacted", "folded": folded,
        "compact_sec": compact_sec, "dirs": dirs_post, "read_sec": post,
    }), flush=True)

    assert n_pre == n_post == total, (n_pre, n_post, total)
    assert abs(s_pre - s_post) < 1e-6 * max(abs(s_pre), 1.0)
    print(json.dumps({
        "batches": N_BATCHES,
        "dirs_before": dirs_pre,
        "dirs_after": dirs_post,
        "read_before_sec": pre,
        "read_after_sec": post,
        "read_speedup": round(pre / max(post, 1e-9), 2),
        "rows_equal": True,
    }), flush=True)


def run_stream_phase(spark, workdir: str) -> None:
    """STREAM_TRIGGERS single-file micro-batches through the in-band
    compact_every wiring, polling the dir count the whole run."""
    import pyarrow.parquet as pq

    from cartodb_importer_spark.sinks.catalog import LocalCatalog
    from cartodb_importer_spark.streaming import streams as S
    from cartodb_importer_spark.streaming.sinks import stream_to_catalog

    src_dir = os.path.join(workdir, "incoming")
    ckpt = os.path.join(workdir, "ckpt")
    cat = LocalCatalog(os.path.join(workdir, "wh"))
    os.makedirs(src_dir, exist_ok=True)

    t = pq.read_table(f"{SRC}/events.parquet")
    per = max(1, t.num_rows // STREAM_TRIGGERS)
    now = time.time()
    for i in range(STREAM_TRIGGERS):
        sl = t.slice(i * per, per) if i < STREAM_TRIGGERS - 1 else t.slice(
            (STREAM_TRIGGERS - 1) * per
        )
        p = os.path.join(src_dir, f"f{i:05d}.parquet")
        pq.write_table(sl, p)
        os.utime(p, (now + i, now + i))  # stable arrival order
    expected = t.num_rows

    mode = MAINT_MODE or ("inband" if COMPACT_EVERY else "control")
    maint_threads, maint_stop, maint_stats = [], None, []
    if mode == "oob":
        import threading

        from cartodb_importer_spark.sinks import maintenance as M

        maint_stop = threading.Event()
        for i in range(MAINT_RUNNERS):
            stats_i: dict = {}
            maint_stats.append(stats_i)
            th = threading.Thread(
                target=lambda s=stats_i: s.update(
                    M.run_maintenance(
                        spark, cat, "ev", ckpt, maint_stop,
                        poll_sec=0.5, min_live_dirs=MAINT_MIN_DIRS,
                    )
                )
            )
            th.start()
            maint_threads.append(th)

    t0 = time.perf_counter()
    if mode == "oob":
        q = stream_to_catalog(
            S.read_events_stream(spark, src_dir), cat, "ev", ckpt,
            landing_max_dirs=MAINT_MIN_DIRS * 4,
        )
    else:
        q = stream_to_catalog(
            S.read_events_stream(spark, src_dir), cat, "ev", ckpt,
            # COMPACT_EVERY=0 runs the uncompacted control (accretion allowed)
            compact_every=COMPACT_EVERY or None,
        )
    max_dirs, samples = 0, 0
    while q.isActive:
        max_dirs = max(max_dirs, len(cat.batch_ids("ev")))
        samples += 1
        time.sleep(0.05)
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    # per-batch durations from the engine's own progress events — the
    # honest trigger-path overhead metric (wall also counts source
    # listing + commit gaps; batchDuration is what maintenance
    # contention would inflate)
    durs = sorted(p.batchDuration for p in q.recentProgress)
    batch_stats = {}
    if durs:
        batch_stats = {
            "batches_timed": len(durs),
            "batch_ms_median": durs[len(durs) // 2],
            "batch_ms_p90": durs[int(len(durs) * 0.9)],
            "batch_ms_total": sum(durs),
        }
    if maint_threads:
        # let the loop catch up to the final frontier, then stop it; the
        # catch-up is NOT part of the stream wall (that's the point)
        deadline = time.time() + 120
        while time.time() < deadline and len(cat.batch_ids("ev")) >= MAINT_MIN_DIRS:
            time.sleep(0.2)
        maint_stop.set()
        for th in maint_threads:
            th.join(timeout=60)
    final_dirs = len(cat.batch_ids("ev"))
    got = cat.read(spark, "ev")
    n = got.count()
    distinct = got.select("event_id").distinct().count()

    # the invariant under test: the landing zone is O(recent), never
    # O(total triggers) — between compactions up to compact_every new
    # dirs accrete on top of the couple the last compaction kept live
    # (control mode, COMPACT_EVERY=0: dirs == triggers by construction;
    # oob: the concurrent loop lags by its fold duration, so the bound
    # is the loose landing_max_dirs alarm threshold, and the FINAL count
    # after catch-up must sit back under min_live_dirs)
    if mode == "oob":
        bound = MAINT_MIN_DIRS * 4
        assert final_dirs < MAINT_MIN_DIRS, (final_dirs, MAINT_MIN_DIRS)
    elif mode == "inband":
        bound = COMPACT_EVERY + 4
    else:
        bound = STREAM_TRIGGERS
    assert max_dirs <= bound, (max_dirs, bound)
    assert n == expected and distinct == expected, (n, distinct, expected)
    rec = {
        "phase": f"stream_{mode}",
        **batch_stats,
        "triggers": STREAM_TRIGGERS,
        "compact_every": COMPACT_EVERY if mode == "inband" else 0,
        "wall_sec": wall,
        "max_dirs_observed": max_dirs,
        "dir_bound": bound,
        "final_dirs": final_dirs,
        "poll_samples": samples,
        "rows_exactly_once": True,
    }
    if mode == "oob":
        rec["maint"] = maint_stats[0] if MAINT_RUNNERS == 1 else maint_stats
        rec["sink_stats"] = q.sink_stats
    print(json.dumps(rec), flush=True)


def main() -> int:
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name="landing-scale")
    root = tempfile.mkdtemp(prefix="landing_scale_")
    try:
        if N_BATCHES > 0:
            run_accretion_phase(spark, os.path.join(root, "accrete"))
        if STREAM_TRIGGERS > 0:
            run_stream_phase(spark, os.path.join(root, "stream"))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
