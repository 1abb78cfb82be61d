#!/usr/bin/env python
"""Streaming throughput rehearsal — VERDICT r08 item 3.

The stateful streaming surface (streaming/stateful.py, ingest.py,
streams.py) is batch-equivalence-tested but was never stress-TIMED. This
runner drives the three streaming workload classes at a configurable
events multiple and reports, per component: total rows, wall seconds,
rows/s, per-trigger batch durations (median/max), and the state store's
row count and memory footprint per trigger (from StreamingQuery progress).

Components:

* ``importer`` — the continuous CSV importer (stream_import_csv:
  read -> sniff/infer -> sanitize -> georef -> catalog landing), driven
  availableNow over a generated orders-geo CSV backlog. With the r09
  O(batch) replace_batch sink, per-trigger cost must track BATCH size,
  not table size — the per-batch duration series is the evidence (the old
  rewrite sink showed monotonically growing batch times).
* ``user_totals`` — applyInPandasWithState running per-user aggregates
  (update mode, no timeout): state rows == distinct users, so state must
  stay flat while throughput scales with events.
* ``sessions`` — event-time sessionization with EventTimeTimeout: state is
  open sessions; the watermark must keep it bounded.
* ``tumbling`` — built-in windowed count with watermark: the baseline
  streaming agg the custom operators are judged against.

    STREAM_COPIES=10 STREAM_FILES=32 python tools/stream_scale.py
    STREAM_ONLY=sessions,user_totals python tools/stream_scale.py

One JSON line per component; final line is the summary object.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

SRC = os.environ.get("STRESS_SRC", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("STREAM_COPIES", "10"))
N_FILES = int(os.environ.get("STREAM_FILES", "32"))
IMPORT_FILES = int(os.environ.get("STREAM_IMPORT_FILES", "32"))
#: STREAM_HOT=0.2 — hot-user events corpus (stress_10x STRESS_HOT): one
#: user_id receives pct% of ALL events, so every stateful micro-batch
#: funnels that share through ONE applyInPandasWithState group/task —
#: the per-key serialization wall the batch window rehearsal measured,
#: now on the streaming path.
HOT = float(os.environ.get("STREAM_HOT", "0") or 0)


def _events_landing(spark) -> str:
    """Materialize the COPIES-x events corpus as N_FILES parquet files —
    each file is one micro-batch under read_events_stream's
    maxFilesPerTrigger=1."""
    import stress_10x

    land = f"/tmp/stream_scale_events_{COPIES}x_{N_FILES}f"
    if os.path.exists(f"{land}/_SUCCESS"):
        return land
    corpus_dir = f"/tmp/stream_scale_corpus_{COPIES}x"
    if not os.path.exists(f"{corpus_dir}/.corpus_complete"):
        os.environ["STRESS_TABLES"] = "events"
        try:
            stress_10x.generate(src=SRC, dst=corpus_dir, copies=COPIES, hot=0.0)
        finally:
            os.environ.pop("STRESS_TABLES", None)
        with open(f"{corpus_dir}/.corpus_complete", "w") as f:
            f.write(f"{COPIES} events-only\n")
    from cartodb_importer_spark.queries import read_parquet_normalized

    ev = read_parquet_normalized(spark, f"{corpus_dir}/events.parquet")
    # sort within repartition boundaries so event time advances file-to-
    # file-ish; a fully shuffled order would stall the watermark until the
    # last file and inflate session state unrealistically
    ev.repartitionByRange(N_FILES, "ts").write.mode("overwrite").parquet(land)
    return land


def _progress_stats(query) -> dict:
    durs: list[float] = []
    rows = 0
    state_rows_last = None
    state_mem_max = 0
    batches = 0
    for p in query.recentProgress:
        batches += 1
        rows += int(p.get("numInputRows") or 0)
        dur = (p.get("durationMs") or {}).get("triggerExecution")
        if dur is not None:
            durs.append(dur / 1000.0)
        for so in p.get("stateOperators") or []:
            if so.get("numRowsTotal") is not None:
                state_rows_last = so["numRowsTotal"]
            state_mem_max = max(state_mem_max, so.get("memoryUsedBytes") or 0)
    out = {
        "batches": batches,
        "input_rows": rows,
        "batch_sec_median": round(statistics.median(durs), 2) if durs else None,
        "batch_sec_max": round(max(durs), 2) if durs else None,
        "batch_sec_series": [round(d, 2) for d in durs],
    }
    if state_rows_last is not None:
        out["state_rows_final"] = state_rows_last
        out["state_mem_max_mb"] = round(state_mem_max / 1048576, 1)
    return out


def _run_stream(start_fn) -> dict:
    t0 = time.perf_counter()
    q = start_fn()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    stats = _progress_stats(q)
    stats["wall_sec"] = round(wall, 2)
    stats["rows_per_sec"] = round(stats["input_rows"] / max(wall, 1e-9), 1)
    return stats


def run_importer(spark) -> dict:
    import import_scale

    from cartodb_importer_spark.sinks.catalog import LocalCatalog
    from cartodb_importer_spark.streaming.ingest import stream_import_csv

    paths = import_scale.corpus(sf_dir=SRC, n_files=IMPORT_FILES, copies=COPIES)
    land = os.path.dirname(paths[0])
    wh = tempfile.mkdtemp(prefix="stream_scale_wh_")
    ckpt = tempfile.mkdtemp(prefix="stream_scale_ckpt_")
    try:
        stats = _run_stream(
            lambda: stream_import_csv(
                spark,
                land,
                LocalCatalog(wh),
                "orders_geo",
                ckpt,
                max_files_per_trigger=4,
            )
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return stats


def run_recovery(spark) -> dict:
    """Kill-and-resume exactly-once at volume: start the continuous
    importer over the full backlog, HARD-STOP it mid-run (after ~1/3 of
    the expected triggers), restart from the same checkpoint, and verify
    the landed table holds exactly one copy of every source row — the
    exactly-once contract the toy-scale pytest pins, exercised at
    rehearsal volume with a mid-batch interruption."""
    import time as _time

    import import_scale

    from cartodb_importer_spark.sinks.catalog import LocalCatalog
    from cartodb_importer_spark.streaming.ingest import stream_import_csv

    paths = import_scale.corpus(sf_dir=SRC, n_files=IMPORT_FILES, copies=COPIES)
    land = os.path.dirname(paths[0])
    wh = tempfile.mkdtemp(prefix="stream_recovery_wh_")
    ckpt = tempfile.mkdtemp(prefix="stream_recovery_ckpt_")
    cat = LocalCatalog(wh)
    try:
        def start():
            return stream_import_csv(
                spark, land, cat, "orders_geo", ckpt,
                max_files_per_trigger=4,
            )

        q = start()
        target = max(1, IMPORT_FILES // 4 // 3)
        while len(q.recentProgress) < target and q.isActive:
            _time.sleep(0.5)
        q.stop()  # hard stop, possibly mid-batch
        interrupted_batches = len(q.recentProgress)

        t0 = time.perf_counter()
        q2 = start()
        q2.awaitTermination()
        resume_stats = _progress_stats(q2)
        resume_stats["resume_wall_sec"] = round(time.perf_counter() - t0, 2)

        landed = cat.read(spark, "orders_geo")
        total = landed.count()
        distinct = landed.select("o_orderkey").distinct().count()
        expected = spark.read.option("header", True).csv(land).count()
        return {
            "interrupted_after_batches": interrupted_batches,
            "expected_rows": expected,
            "landed_rows": total,
            "landed_distinct_keys": distinct,
            "exactly_once": total == expected == distinct,
            **resume_stats,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _noop_available_now(df, ckpt: str):
    return (
        df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("update" if not _is_append(df) else "append")
        .trigger(availableNow=True)
        .start()
    )


def _is_append(df) -> bool:
    # sessionize_events/tumbling_counts are append-mode plans; the
    # user-totals state operator requires update mode
    return getattr(df, "_spark_graft_append", False)


def run_stateful(spark, which: str, land: str) -> dict:
    from cartodb_importer_spark.streaming.stateful import (
        running_user_totals,
        sessionize_events,
    )
    from cartodb_importer_spark.streaming.streams import (
        read_events_stream,
        tumbling_counts,
    )

    ckpt = tempfile.mkdtemp(prefix=f"stream_scale_{which}_")
    try:
        src = read_events_stream(spark, land)
        if which == "user_totals":
            out = running_user_totals(src)
        elif which == "sessions":
            out = sessionize_events(src, gap_sec=1800, watermark="1 hour")
            out._spark_graft_append = True
        else:
            out = tumbling_counts(src)
            out._spark_graft_append = True
        return _run_stream(lambda: _noop_available_now(out, ckpt))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> int:
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name="stream-scale")
    only = os.environ.get("STREAM_ONLY")
    names = (
        [n for n in only.split(",") if n]
        if only
        else ["importer", "user_totals", "sessions", "tumbling"]
    )
    land = None
    if any(n not in ("importer", "recovery") for n in names):
        land = _events_landing(spark)

    results: dict[str, dict] = {}
    for name in names:
        try:
            if name == "importer":
                r = run_importer(spark)
            elif name == "recovery":
                r = run_recovery(spark)
            else:
                r = run_stateful(spark, name, land)
        except Exception as e:  # noqa: BLE001 — report and continue
            r = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        results[name] = r
        line = {"component": name, **r}
        line.pop("batch_sec_series", None)
        print(json.dumps(line), flush=True)

    summary = {
        "copies": COPIES,
        "files": N_FILES,
        "errors": sum(1 for r in results.values() if "error" in r),
        "results": results,
    }
    print(json.dumps(summary), flush=True)
    return 1 if summary["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
