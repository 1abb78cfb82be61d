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


def timed_read(spark, cat, table: str) -> tuple[float, int, float]:
    t0 = time.perf_counter()
    df = cat.read(spark, table)
    n = df.count()
    s = df.agg(F.sum("value")).collect()[0][0]
    return round(time.perf_counter() - t0, 2), n, s


def main() -> int:
    from cartodb_importer_spark.session import get_spark
    from cartodb_importer_spark.sinks import maintenance as M
    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    spark = get_spark(app_name="landing-scale")
    events = (
        spark.read.parquet(f"{SRC}/events.parquet")
        .select("event_id", "user_id", "value")
        .cache()
    )
    total = events.count()
    root = tempfile.mkdtemp(prefix="landing_scale_")
    try:
        cat = LocalCatalog(root)
        t0 = time.perf_counter()
        for b in range(N_BATCHES):
            batch = events.filter(F.col("event_id") % N_BATCHES == b)
            cat.replace_batch(batch, "t", b)
        land_sec = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "phase": "land", "batches": N_BATCHES, "rows": total,
            "wall_sec": land_sec,
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
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
