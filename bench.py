#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is driven to completion with the noop sink (full execution, no
driver-side collect cost). Session startup is excluded from timings.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: covers scan+agg, multi-join, window, as-of, set-op, dedup,
# similarity, text analysis, sessionization — the shapes that dominate real
# pipelines.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "agg_count_distinct",
    "agg_rollup",
    "window_topk_per_group",
    "join_asof",
    "setop_except_all",
    "llm_dedup_exact",
    # end-to-end near-dedup (shingle -> minhash -> LSH bucket join ->
    # size-bound -> exact-Jaccard verify -> survivor election) — dedup is
    # the north-star pipeline workload, so the headline carries the full
    # operator. It REPLACES the old llm_minhash_pairs entry: the pairs
    # stage is near_dedup's first half, so listing both double-counted
    # the same work (llm_minhash_pairs stays registered + oracled).
    "llm_near_dedup",
    "llm_cosine_topk",
    "llm_text_stats",
    "stream_session_windows",
    "stream_resample_ffill",
    "q8_market_share",
    "reshape_pivot",
    # Custom group-map op (per-user min-max normalization). The headline
    # runs the applyInArrow physical form — same semantics and oracle as
    # udf_apply_in_pandas, 3.5x faster because it skips the per-group
    # Arrow<->pandas conversion. Both forms stay registered + oracle-checked.
    "udf_apply_in_arrow",
]


def main() -> None:
    from cartodb_importer_spark.queries import QUERIES
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # one tiny warmup action so JVM startup doesn't land on q1
    spark.range(1000).selectExpr("sum(id)").collect()

    # Steady-state methodology: run each query once untimed (codegen/JIT
    # compile dominates first runs at this data size — measured 2-3.5x),
    # then report the MIN of five timed runs (the least-noise steady-state
    # estimator; single timed runs jitter ±10% on a shared box, and
    # HOST-level noise windows have been observed swinging totals ±35%
    # with no guest-visible load). Per-query median/max across the runs
    # are emitted alongside so a reader can separate a real plan
    # regression (min moved) from machine noise (min stable, max wild).
    # First-run times are recorded separately in "cold_queries".
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    maxes: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - start, 3)
        runs: list[float] = []
        for _ in range(n_runs):
            start = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(statistics.median(runs), 3)
        maxes[name] = round(runs[-1], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    noise_spread_pct = round(
        100.0
        * (sum(maxes.values()) - sum(timings.values()))
        / max(sum(timings.values()), 1e-9),
        1,
    )
    # Per-query distribution detail goes to a SIDECAR file, not stdout: the
    # r06 driver failed to parse the bench line ("parsed": null) because the
    # enriched emission outran its tail-capture buffer. The LAST stdout line
    # must stay compact and machine-parseable (the r01-r05 shape).
    detail = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_val,
        "timed_runs": n_runs,
        "agg": "min",
        "queries_min": timings,
        "queries_median": medians,
        "queries_max": maxes,
        "median_total_sec": round(sum(medians.values()), 3),
        "noise_spread_pct": noise_spread_pct,
        "cold_queries": cold,
        "cold_total_sec": round(sum(cold.values()), 3),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the compact stdout line still carries the headline
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "timed_runs": n_runs,
                "agg": "min",
                "noise_spread_pct": noise_spread_pct,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
