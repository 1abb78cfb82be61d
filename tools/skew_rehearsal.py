#!/usr/bin/env python
"""Skewed-key (hot-key / Zipf) rehearsal — VERDICT r08 item 1.

Every prior stress corpus replays UNIFORM duplication; real 100 TB corpora
are Zipf-distributed — one orderkey/custkey/user_id/boilerplate family can
hold a double-digit percent of the fact rows. This runner materializes a
matched PAIR of corpora at the same COPIES multiple — uniform (STRESS_HOT=0)
and hot (default 20% of each fact table's rows on one key, see
stress_10x.generate) — runs the skew-sensitive operator families on both,
and reports per-query wall seconds, the hot/uniform ratio, and whether
AQE's skew-join split engaged (counted from the executed adaptive plan's
``skew=true`` markers).

Spark 4.1 AQE behavior this rehearsal encodes (measured in-session, r09):

- OptimizeSkewedJoin fires for a shuffle join whose output feeds another
  join or a bare exchange (multi-join chains), one-sided skew included.
- It is SUPPRESSED — ``forceOptimizeSkewedJoin`` included — when a partial
  aggregate consumes the join inside the same stage (join -> groupBy.agg,
  the flagship q3/q5/q9 shape). The hot key's sort+probe+partial-agg then
  lands on ONE task; the fix, where measurement says it matters, is
  pre-aggregation below the join or operators/skew.py salting, not an AQE
  knob.
- Skew detection compares COMPRESSED shuffle bytes against
  ``skewedPartitionThresholdInBytes`` (256 MB default) AND
  ``skewedPartitionFactor`` x median. Local rehearsal partitions are ~100x
  smaller than a production shuffle, so the runner scales the threshold
  down (SKEW_THRESHOLD, default 16m) the same way a fleet config scales it
  with advisory partition size; the join trio is ALSO run once under stock
  thresholds to record the default behavior honestly.

    SKEW_COPIES=10 SKEW_HOT=0.2 python tools/skew_rehearsal.py
    SKEW_ONLY=q5_nation_revenue,llm_near_dedup python tools/skew_rehearsal.py

One JSON line per (corpus, query); final line is the summary object.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import stress_10x  # noqa: E402

SRC = os.environ.get("STRESS_SRC", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SKEW_COPIES", "10"))
HOT = float(os.environ.get("SKEW_HOT", "0.2"))
THRESH = os.environ.get("SKEW_THRESHOLD", "16m")
ADVISORY = os.environ.get("SKEW_ADVISORY", "8m")
TIMEOUT_S = int(os.environ.get("SKEW_TIMEOUT_S", "900"))

UNIFORM_DIR = "/tmp/sfstress" if COPIES == 10 else f"/tmp/sfstress_{COPIES}x"
HOT_DIR = f"/tmp/sfskew_{COPIES}x_h{int(HOT * 100)}"

#: flagship join->agg shapes: skewed SMJ probe side (20% of lineitem on one
#: orderkey), partial agg in the same stage — the AQE-can't-help shape
JOIN = ["q3_top_revenue_orders", "q5_nation_revenue", "q9_product_profit"]
#: window partitions can't be split at all — single hot task by design
WINDOW = [
    "window_topk_per_group",      # partitionBy o_custkey (hot via orders)
    "window_running_sum",         # partitionBy user_id (hot via events)
    "window_rolling_median",      # bounded frame, hot user_id partition
    "stream_session_windows",     # sessionization lag/gap per user_id
]
EVENTS = ["events_funnel", "events_rfm_segments", "events_retention"]
#: boilerplate contamination: 20% of docs collapse onto 40 near-identical
#: template families — degenerate LSH buckets, the star-guard's real test
DEDUP = [
    "llm_near_dedup",
    "llm_dedup_clusters",
    "llm_dedup_keep_best",
    "llm_cross_source_dups",
]
ALL = JOIN + WINDOW + EVENTS + DEDUP


def ensure_corpora() -> None:
    for d, h in ((UNIFORM_DIR, 0.0), (HOT_DIR, HOT)):
        if not os.path.exists(f"{d}/.corpus_complete"):
            print(f"generating {d} ({COPIES}x {SRC}, hot={h}) ...", flush=True)
            stress_10x.generate(src=SRC, dst=d, copies=COPIES, hot=h)
            with open(f"{d}/.corpus_complete", "w") as f:
                f.write(f"{COPIES} {h}\n")


def run_one(spark, name: str, sf_dir: str, capture_plan: bool) -> dict:
    """Run a registered query to completion; return wall time and, for
    plan-captured (collect-driven) runs, the executed plan's skew-split
    count. A watchdog cancels the job group after TIMEOUT_S so one
    pathological hot-side query can't wedge the whole rehearsal."""
    from cartodb_importer_spark.queries import QUERIES

    out: dict = {"query": name, "sf_dir": sf_dir}
    done = threading.Event()

    def watchdog() -> None:
        if not done.wait(TIMEOUT_S):
            spark.sparkContext.cancelAllJobs()

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    t0 = time.perf_counter()
    try:
        df = QUERIES[name](spark, sf_dir)
        if capture_plan:
            rows = df.collect()
            out["rows"] = len(rows)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out["skew_splits"] = plan.count("skew=true")
        else:
            df.write.format("noop").mode("overwrite").save()
        out["wall_sec"] = round(time.perf_counter() - t0, 2)
    except Exception as e:  # noqa: BLE001 — report and continue
        out["wall_sec"] = round(time.perf_counter() - t0, 2)
        out["error"] = f"{type(e).__name__}: {str(e)[:160]}"
    finally:
        done.set()
    spark.catalog.clearCache()
    return out


def main() -> int:
    ensure_corpora()
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name="skew-rehearsal")
    only = os.environ.get("SKEW_ONLY")
    names = [n for n in only.split(",") if n] if only else ALL

    results: dict[str, dict] = {}
    # joins first under STOCK thresholds on the hot corpus — records the
    # honest default (hot partition ~tens of MB compressed, under the
    # 256 MB default threshold, so no split at local scale)
    stock_splits: dict[str, int] = {}
    for name in [n for n in names if n in JOIN]:
        r = run_one(spark, name, HOT_DIR, capture_plan=True)
        stock_splits[name] = r.get("skew_splits", 0)
        print(json.dumps({"mode": "hot_stock_thresholds", **r}), flush=True)

    # scaled thresholds for everything else (fleet-relative sizing)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", THRESH
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", ADVISORY)

    for name in names:
        capture = name in JOIN
        u = run_one(spark, name, UNIFORM_DIR, capture_plan=capture)
        h = run_one(spark, name, HOT_DIR, capture_plan=capture)
        row = {
            "query": name,
            "uniform_sec": u["wall_sec"],
            "hot_sec": h["wall_sec"],
            "ratio": round(h["wall_sec"] / max(u["wall_sec"], 1e-9), 2),
        }
        if capture:
            row["skew_splits_hot"] = h.get("skew_splits", 0)
            row["skew_splits_hot_stock"] = stock_splits.get(name, 0)
        for side, r in (("uniform", u), ("hot", h)):
            if "error" in r:
                row[f"{side}_error"] = r["error"]
        results[name] = row
        print(json.dumps(row), flush=True)

    summary = {
        "copies": COPIES,
        "hot": HOT,
        "skew_threshold": THRESH,
        "advisory": ADVISORY,
        "worst_ratio": max(
            (r["ratio"] for r in results.values() if "hot_error" not in r),
            default=0.0,
        ),
        "errors": sum(
            1 for r in results.values() if "hot_error" in r or "uniform_error" in r
        ),
        "results": results,
    }
    print(json.dumps(summary), flush=True)
    return 1 if summary["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
