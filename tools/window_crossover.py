#!/usr/bin/env python
"""Hot-window crossover probe: single-window vs chunked running sum.

operators/skew.py `chunked_running_sum` exists for corpora where one
key's history outgrows a task; r09 measured the single-window form
absorbing 50% single-key heat at 10x local scale, so nothing uses the
lever by default. This probe asks WHERE the crossover is, on the r10
Zipf corpus (head user ~14% of events) and optionally heavier heats:
time both forms computing the same per-user running total, verify they
agree on a sample of users (including the head user), and print one
JSON line per (corpus, form).

    python tools/window_crossover.py
    CROSSOVER_DIRS=/tmp/sfzipf_30x_s11 python tools/window_crossover.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DIRS = [
    d
    for d in os.environ.get(
        "CROSSOVER_DIRS", "/tmp/sfstress_30x,/tmp/sfzipf_30x_s11"
    ).split(",")
    if d
]


def single_window(events):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "event_id", "user_id",
        F.sum("value").over(w).alias("running_total"),
    )


def chunked(events):
    from cartodb_importer_spark.operators.skew import chunked_running_sum

    return chunked_running_sum(
        events.select("event_id", "user_id", "ts", "value"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        chunk_col=F.to_date("ts"),
    ).select("event_id", "user_id", "running_total")


def main() -> int:
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name="window-crossover")
    out = []
    for d in DIRS:
        events = spark.read.parquet(f"{d}/events.parquet")
        head_user, head_n = (
            events.groupBy("user_id").count().orderBy(F.desc("count")).first()
        )
        for form, fn in (("single_window", single_window), ("chunked", chunked)):
            t0 = time.perf_counter()
            fn(events).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            row = {
                "corpus": d,
                "form": form,
                "wall_sec": wall,
                "head_user_events": int(head_n),
            }
            out.append(row)
            print(json.dumps(row), flush=True)
        # value parity on the head user (the partition the lever targets):
        # both forms must produce identical totals at its final event
        a = (
            single_window(events.filter(F.col("user_id") == head_user))
            .orderBy(F.desc("running_total")).first()
        )
        b = (
            chunked(events.filter(F.col("user_id") == head_user))
            .orderBy(F.desc("running_total")).first()
        )
        # relative tolerance: the two forms fold the same values in a
        # different order (per-chunk partial sums + offsets vs one
        # sequential frame), so a million-term ~1e7-magnitude total
        # drifts by O(n·eps·|sum|) — observed 3e-14 relative at 1.15M
        # terms, which is float behavior, not a semantic divergence
        rel = abs(a["running_total"] - b["running_total"]) / max(
            abs(a["running_total"]), 1.0
        )
        assert rel < 1e-9, (a, b, rel)
        print(json.dumps({"corpus": d, "head_user_parity": True}), flush=True)
    ratios = {}
    for d in DIRS:
        s = next(r for r in out if r["corpus"] == d and r["form"] == "single_window")
        c = next(r for r in out if r["corpus"] == d and r["form"] == "chunked")
        ratios[d] = round(c["wall_sec"] / max(s["wall_sec"], 1e-9), 2)
    print(json.dumps({"chunked_over_single_ratio": ratios}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
