#!/usr/bin/env python
"""Storage-memory stability probe (VERDICT r12 item 2 "done" criterion).

Runs every registered query once (noop sink) in ONE session and records,
after each query, the number of cached RDDs and the total cached bytes
in the block manager. With RELEASE=1 (default) the sweep calls
``release_tracked_caches()`` after each query's action — storage should
stay flat (only the in-flight query's entries alive). With RELEASE=0 it
reproduces the r12 leak: entries accumulate monotonically across the
sweep.

    RELEASE=1 python tools/cache_probe.py        # fixed behavior
    RELEASE=0 python tools/cache_probe.py        # r12 leak reproduction
    ONLY="graph_ llm_dedup" python tools/cache_probe.py   # prefix filter

Prints one JSON line per query: {"q": name, "sec": t, "cached_rdds": n,
"cached_mb": mb, "peak_cached_mb": maxsofar} and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
RELEASE = os.environ.get("RELEASE", "1") == "1"
ONLY = os.environ.get("ONLY", "").split()


def storage_info(spark) -> tuple[int, float]:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    n = len(infos)
    mb = sum(i.memSize() + i.diskSize() for i in infos) / 1e6
    return n, round(mb, 1)


def main() -> int:
    from cartodb_importer_spark.caching import release_tracked_caches
    from cartodb_importer_spark.queries import QUERIES
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name=f"cache-probe-release={RELEASE}")
    spark.range(1000).selectExpr("sum(id)").collect()

    names = [
        n
        for n in QUERIES
        if not ONLY or any(n.startswith(p) for p in ONLY)
    ]
    peak = 0.0
    for name in names:
        spark.sparkContext.setJobDescription(f"probe: {name}")
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            err = None
        except Exception as e:  # keep sweeping; report the failure
            err = f"{type(e).__name__}: {e}"[:120]
        sec = round(time.perf_counter() - t0, 3)
        if RELEASE:
            release_tracked_caches()
        n, mb = storage_info(spark)
        peak = max(peak, mb)
        rec = {
            "q": name,
            "sec": sec,
            "cached_rdds": n,
            "cached_mb": mb,
            "peak_cached_mb": round(peak, 1),
        }
        if err:
            rec["err"] = err
        print(json.dumps(rec), flush=True)
    n, mb = storage_info(spark)
    print(
        json.dumps(
            {
                "summary": True,
                "release": RELEASE,
                "queries": len(names),
                "final_cached_rdds": n,
                "final_cached_mb": mb,
                "peak_cached_mb": round(peak, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
