#!/usr/bin/env python
"""Targeted per-query timing: min/median of N noop-sink runs after one
untimed warm-up — the bench.py methodology (guide §1.4) without the full
headline sweep, for the optimize-measure loop.

Usage: python tools/time_queries.py q5_nation_revenue [llm_near_dedup ...]
       SF_DIR=... RUNS=5 python tools/time_queries.py graph_clustering_coefficient
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))
#: RELEASE=1 unpersists each query's tracked caches after its LAST timed
#: run (r13, VERDICT r12 item 2): a multi-query sweep session then holds
#: only the in-flight query's caches instead of every prior query's.
#: Off by default so single-query A/Bs stay comparable to r12 artifacts.
RELEASE = os.environ.get("RELEASE", "0") == "1"


def main() -> int:
    from cartodb_importer_spark.queries import QUERIES
    from cartodb_importer_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        print("usage: time_queries.py <query> [...]")
        return 1
    spark = get_spark(app_name="time-queries")
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        runs: list[float] = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        if RELEASE:
            from cartodb_importer_spark.caching import release_tracked_caches

            release_tracked_caches()
        print(
            f"{name:35s} min={runs[0]:7.3f} med={statistics.median(runs):7.3f}"
            f" max={runs[-1]:7.3f} cold={cold:7.3f}  (n={RUNS}, {SF_DIR})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
