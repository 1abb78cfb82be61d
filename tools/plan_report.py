#!/usr/bin/env python
"""Generate PLANS.md: a condensed physical-plan review of the headline
queries — the artifact of the `.explain("formatted")`-and-iterate loop.

For each query: count of shuffle Exchanges, broadcast exchanges,
WholeStageCodegen spans, Python evals, sort nodes, and scan health
(pushed filters / pruned schema), plus the operator list. Run after any
plan-affecting change:

    python tools/plan_report.py          # writes PLANS.md at repo root
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

# The sweep tail reviews the slowest registry queries from the NEWEST
# sf0.1 local sweep (CORRECTNESS_LOCAL_r*_sf01.json timings_sec), so it
# self-updates as the registry grows. Excluded on purpose: queries that
# return literal contract/verification frames (their distributed paths
# are pinned by dedicated plan-audit tests) — reviewing a
# createDataFrame of 20 rows tells the reader nothing. Iterative BSP
# queries stay IN (their returned plans are localCheckpoint-truncated
# to the final stage; the table footnote says so and their per-round
# topology is pinned by test_plan_audit.py's BSP shuffle-count tests).
SWEEP_TAIL_N = 15
SWEEP_TAIL_EXCLUDE = {
    "llm_bpe_train",
    "llm_ivf_topk",
    "llm_lsh_topk",
    "llm_pq_topk",
    "llm_ann_batch_topk",
}


def sweep_tail_names() -> list[str]:
    import glob
    import json
    import re as _re

    from cartodb_importer_spark.queries import QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = glob.glob(os.path.join(here, "CORRECTNESS_LOCAL_r*_sf01.json"))
    if not files:
        return []

    def round_no(path: str) -> int:
        m = _re.search(r"_r(\d+)_", os.path.basename(path))
        return int(m.group(1)) if m else -1

    # newest by PARSED round number (lexicographic breaks at r10 vs r9)
    newest = max(files, key=round_no)
    timings = json.load(open(newest)).get("timings_sec", {})
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    # a renamed/removed query in an old sweep must not KeyError review()
    return [
        n
        for n, _ in ranked
        if n not in SWEEP_TAIL_EXCLUDE and n in QUERIES
    ][:SWEEP_TAIL_N]


def analyze(plan: str) -> dict:
    """Counts from Spark 4's formatted explain: the tree section names
    each node once as `NodeName (id)`; details follow after a blank line
    (PushedFilters live there). codegen ids appear as `[codegen id : N]`
    in the detail section."""
    tree = plan.split("\n\n", 1)[0]

    def node(name: str) -> int:
        return len(re.findall(rf"\b{name} \(\d+\)", tree))

    return {
        "shuffles": node("Exchange"),
        "broadcasts": node("BroadcastExchange"),
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python": sum(
            node(n)
            for n in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "FlatMapGroupsInPandas",
                "FlatMapGroupsInArrow",
                "MapInPandas",
                "FlatMapGroupsInPandasWithState",
            )
        ),
        "sorts": node("Sort"),
        "topk": node("TakeOrderedAndProject"),
        "pushed": len(
            [
                m
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
                if m.strip()
            ]
        ),
        "nlj": node("BroadcastNestedLoopJoin") + node("CartesianProduct"),
    }


def main() -> int:
    from bench import HEADLINE, HEAVY_TAIL

    from cartodb_importer_spark.queries import QUERIES
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(shuffle_partitions=32, app_name="plan-report")
    # Static-plan review: with AQE off, executedPlan carries the
    # WholeStageCodegen spans (*(id) markers) and the full exchange
    # topology without running anything; AQE only ever coalesces or
    # improves this topology at runtime (skew splits, broadcast demotion).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def review(names):
        out = []
        for name in names:
            df = QUERIES[name](spark, SF_DIR)
            explained = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            a = analyze(explained)
            # formatted mode omits codegen stage markers; the simple
            # string shows them as *(id) prefixes
            a["codegen"] = len(
                set(
                    re.findall(
                        r"\*\((\d+)\)",
                        df._jdf.queryExecution().executedPlan().toString(),
                    )
                )
            )
            out.append((name, a))
        return out

    rows = review(HEADLINE + HEAVY_TAIL)
    tail_rows = review(sweep_tail_names())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    lines = [
        "# PLANS — physical-plan review of the headline queries",
        "",
        f"Auto-generated by `tools/plan_report.py` at {SF_DIR} "
        "(re-run after any plan-affecting change). Counts from the "
        "static physical plan (AQE off for the report; at runtime AQE "
        "only coalesces/improves this topology).",
        "",
        "Review rules this table enforces on sight:",
        "- `shuffles` is the cost driver — every row should be at its",
        "  known minimum (agg: 1; broadcast join: 0 extra; window: 1 per",
        "  distinct partitioning).",
        "- `nlj` must be 0 unless the query is an allowlisted 1-row",
        "  scalar broadcast (see tests/test_plan_audit.py).",
        "- `python` > 0 only for the declared UDF-surface queries.",
        "- `pushed` > 0 wherever the query filters the fact scan.",
        "",
        "| query | shuffles | broadcasts | codegen spans | python | sorts | top-k | pushed filters | NLJ |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    def table_row(name, a):
        return (
            f"| {name} | {a['shuffles']} | {a['broadcasts']} | {a['codegen']} "
            f"| {a['python']} | {a['sorts']} | {a['topk']} | {a['pushed']} | {a['nlj']} |"
        )

    for name, a in rows:
        lines.append(table_row(name, a))
    lines += [
        "",
        "## Sweep tail — the 15 slowest registry queries (sf0.1 local sweep)",
        "",
        "Same review, aimed at the queries most likely to hide a",
        "scale-killer. Iterative BSP queries (pagerank, components-riding",
        "dedup ops) return localCheckpoint-truncated plans — the counts",
        "below are their FINAL stage; per-iteration shuffle topology is",
        "pinned by tests/test_plan_audit.py's BSP tests. Contract queries",
        "(llm_bpe_train, llm_ivf/lsh/pq/ann_batch_topk) return literal",
        "verification frames and are excluded here; their distributed",
        "paths have dedicated plan-audit tests.",
        "",
        "| query | shuffles | broadcasts | codegen spans | python | sorts | top-k | pushed filters | NLJ |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in tail_rows:
        lines.append(table_row(name, a))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    # hand-written evidence (bench A/B controls, noise-window notes) lives
    # under '## Notes' and SURVIVES regeneration — the r06 control
    # paragraph was silently dropped by a regen; don't repeat that.
    notes = ""
    if os.path.exists(out):
        with open(out) as f:
            old = f.read()
        i = old.find("## Notes")
        if i >= 0:
            notes = old[i:].rstrip() + "\n"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
        if notes:
            f.write("\n" + notes)
    print(f"wrote {out}")
    for name, a in rows + tail_rows:
        print(name, a)
    return 0


if __name__ == "__main__":
    sys.exit(main())
