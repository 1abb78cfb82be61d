#!/usr/bin/env python
"""Scale rehearsal: run the heaviest operators at 10x sf0.1 (~sf1).

Materializes /tmp/sfstress once — sf0.1 with every fact table duplicated
10x under shifted keys (orders/lineitem share the orderkey shift so joins
stay consistent; events shift user_id too so per-key parallelism grows;
documents get a per-copy text suffix so near-dup stays non-degenerate-but-
dense: every doc gains 9 true near-duplicates, a worst-realistic-case for
the LSH/cluster path) — then runs the operators most likely to break at
scale (iterative graph, LSH self-joins, connected components, group-map
UDFs, digests) on the standard engine session.

This is the harness that motivated the r03 triangle re-orientation (the
id-oriented wedge join OOM'd) — run it after touching any heavy plan:

    python tools/stress_10x.py            # generates data if absent
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("STRESS_SRC", "/root/testdata/sf0.1")
#: STRESS_HOT=0.2 — hot-key mode (VERDICT r08 item 1): the given fraction
#: of each fact table's rows is redirected onto ONE key (one orderkey for
#: lineitem, one custkey for orders, one user_id for events, one 40-variant
#: boilerplate family for documents). Real 100 TB corpora are Zipf-
#: distributed; every prior rehearsal replayed uniform duplication, so this
#: is the mode that exercises AQE skew-join splits, single-hot-partition
#: windows, and degenerate LSH buckets.
HOT = float(os.environ.get("STRESS_HOT", "0") or 0)
DST = os.environ.get("STRESS_DIR") or (
    "/tmp/sfstress" if HOT <= 0 else f"/tmp/sfskew_h{int(HOT * 100)}"
)
COPIES = int(os.environ.get("STRESS_COPIES", "10"))

HEAVY = [
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "q8_market_share", "join_asof", "window_rolling_median",
    "stream_resample_ffill", "llm_dedup_exact", "llm_minhash_pairs",
    "llm_near_dedup", "llm_dedup_clusters", "graph_pagerank",
    "graph_triangle_count", "events_funnel", "events_kaplan_meier",
    "agg_tdigest_quantiles", "udf_apply_in_arrow", "llm_pq_topk",
    # r06: SemDeDup-style semantic dedup (k-means cell-bounded candidate
    # pairs — the bound is what must hold under duplication pressure) and
    # the flattened per-dimension standardize (posexplode fan-out at 10x)
    "llm_semantic_dedup", "llm_embedding_standardize",
    # r06 curation additions: vocab coverage is the explode-heaviest new
    # op (every token occurrence becomes a row before the keyed count);
    # RFM stacks three single-partition ntile windows whose input must
    # stay the per-customer reduction as the fact table grows
    "llm_vocab_coverage", "events_rfm_segments",
    # r06 late additions: DSIR explodes every token occurrence into the
    # (doc, bucket) count — the persist must keep it one corpus scan as
    # the corpus grows
    "llm_dsir_weights",
    # r06 corpus-audit batch: the vocab-overlap self-join's fan-out bound
    # (sources-per-token^2) is what must hold as the corpus duplicates;
    # winnowing's single per-doc exchange must absorb 10x the windows
    "llm_source_vocab_overlap", "llm_winnowing_fingerprint",
    # r06 graph additions: clustering coefficient rides the shared
    # degree-ordered triangle enumeration — the orientation's hub bound
    # is what must hold as the co-purchase graph densifies
    "graph_clustering_coefficient",
    # cross-source attribution rides the verified near-dup pair frame —
    # under 10x duplication pressure every doc has 9 true near-dups, the
    # worst-realistic-case pair volume for the attribution joins
    "llm_cross_source_dups",
    # r07 additions: the batched ANN cogroup (every vector a query), the
    # LSH-quality audit's bounded-sample all-pairs (its cost IS the
    # sample square — this pins that the square stays affordable), and
    # the cluster histogram riding near-dedup + pointer-jumped components
    "llm_ann_batch_topk", "llm_lsh_quality", "llm_cluster_size_histogram",
]


def generate(
    src: str | None = None,
    dst: str | None = None,
    copies: int | None = None,
    hot: float | None = None,
) -> None:
    import duckdb

    global SRC, DST, COPIES, HOT  # noqa: PLW0603 — CLI module, env-driven
    SRC = src or SRC
    DST = dst or DST
    COPIES = copies if copies is not None else COPIES
    HOT = hot if hot is not None else HOT
    pct = int(round(HOT * 100))

    # STRESS_TABLES=documents,events restricts COPIES-x duplication to the
    # listed fact tables (the rest are copied at 1x) — a 100x documents-only
    # rehearsal shouldn't pay for a 60M-row lineitem it never reads.
    only_tables = {
        t for t in os.environ.get("STRESS_TABLES", "").split(",") if t
    }
    # Coupled fact tables must duplicate TOGETHER or the key shift orphans
    # one side: lineitem.l_orderkey shifts by multiples of max(o_orderkey)+1
    # while a 1x orders keeps its original keys, so 90% of lineitem rows
    # join to nothing (ADVICE r07). orders<->lineitem is hard-coupled;
    # duplicating only one gets the partner pulled in automatically.
    if only_tables and ("orders" in only_tables) != ("lineitem" in only_tables):
        only_tables |= {"orders", "lineitem"}
        print(
            "STRESS_TABLES: orders and lineitem share the orderkey shift — "
            "duplicating both (listing one would orphan the other's keys)",
            flush=True,
        )

    def wanted(t: str) -> bool:
        return not only_tables or t in only_tables

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
        if not wanted(t):
            shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    n = COPIES - 1
    # hot keys are picked so they SURVIVE the flagship filters (q3 keeps
    # BUILDING-segment customers; q5 keeps ASIA customers): a hot key the
    # dimension filter drops would skew only the shuffle sort, not the
    # join output. min() keeps the choice deterministic.
    hot_ok = hot_ck = hot_uid = 0
    if HOT > 0:
        hot_ok = con.sql(f"""
          SELECT min(o.o_orderkey)
          FROM read_parquet('{SRC}/orders.parquet') o
          JOIN read_parquet('{SRC}/customer.parquet') c
            ON o.o_custkey = c.c_custkey
          WHERE c.c_mktsegment = 'BUILDING'""").fetchone()[0]
        hot_ck = con.sql(f"""
          SELECT min(c.c_custkey)
          FROM read_parquet('{SRC}/customer.parquet') c
          JOIN read_parquet('{SRC}/nation.parquet') nt
            ON c.c_nationkey = nt.n_nationkey
          JOIN read_parquet('{SRC}/region.parquet') r
            ON nt.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'ASIA'""").fetchone()[0]
        hot_uid = con.sql(
            f"SELECT min(user_id) FROM read_parquet('{SRC}/events.parquet')"
        ).fetchone()[0]
        print(
            f"STRESS_HOT={HOT}: hot orderkey={hot_ok} custkey={hot_ck} "
            f"user_id={hot_uid} ({pct}% of fact rows each)",
            flush=True,
        )
    if wanted("orders") or wanted("lineitem"):
        mx = con.sql(
            f"SELECT max(o_orderkey) FROM read_parquet('{SRC}/orders.parquet')"
        ).fetchone()[0]
    if wanted("orders"):
        ck = "o_custkey"
        if HOT > 0:
            # hot foreign key: pct% of ALL order rows point at one customer
            ck = (
                f"CASE WHEN hash(o_orderkey*2654435761 + i) % 100 < {pct} "
                f"THEN {hot_ck} ELSE o_custkey END AS o_custkey"
            )
        con.sql(f"""
          COPY (SELECT o_orderkey + i*{mx + 1} AS o_orderkey, {ck},
                       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
                FROM read_parquet('{SRC}/orders.parquet'),
                     generate_series(0,{n}) t(i))
          TO '{DST}/orders.parquet' (FORMAT PARQUET)""")
    if wanted("lineitem"):
        # STRESS_SHIFT_PARTKEY=1: shift l_partkey per copy too — the
        # TPC-H-faithful growth shape for the part co-purchase GRAPH
        # queries (SF grows parts AND orders together, so the graph gains
        # NODES at constant density; shifting only orderkeys instead
        # densifies the same 20k parts toward a clique, which no real
        # corpus does). Graph-rehearsal mode only: part-joining queries
        # would see orphaned partkeys, so don't mix it into general runs.
        pk = "l_partkey"
        if os.environ.get("STRESS_SHIFT_PARTKEY") == "1":
            mp = con.sql(
                f"SELECT max(l_partkey) "
                f"FROM read_parquet('{SRC}/lineitem.parquet')"
            ).fetchone()[0]
            pk = f"l_partkey + i*{mp + 1} AS l_partkey"
            print(
                "STRESS_SHIFT_PARTKEY: graph node-growth mode — "
                "run only lineitem-only (graph_*) queries on this corpus",
                flush=True,
            )
        ok = f"l_orderkey + i*{mx + 1} AS l_orderkey"
        if HOT > 0:
            # hot join key: pct% of ALL lineitem rows carry one orderkey —
            # the probe-side shuffle skew AQE's skew-join split must absorb
            ok = (
                f"CASE WHEN hash(l_orderkey*31 + l_linenumber + i) % 100 "
                f"< {pct} THEN {hot_ok} "
                f"ELSE l_orderkey + i*{mx + 1} END AS l_orderkey"
            )
        con.sql(f"""
          COPY (SELECT {ok}, {pk},
                       l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                       l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
                FROM read_parquet('{SRC}/lineitem.parquet'),
                     generate_series(0,{n}) t(i))
          TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")
    if wanted("events"):
        me, mu = con.sql(
            f"SELECT max(event_id), max(user_id) "
            f"FROM read_parquet('{SRC}/events.parquet')"
        ).fetchone()
        uid = f"user_id + i*{mu + 1} AS user_id"
        if HOT > 0:
            # hot window-partition key: pct% of ALL events land on one
            # user — window/sessionization partitions can't be split by
            # AQE, so this measures the single-hot-task wall directly
            uid = (
                f"CASE WHEN hash(event_id*131 + i) % 100 < {pct} "
                f"THEN {hot_uid} "
                f"ELSE user_id + i*{mu + 1} END AS user_id"
            )
        con.sql(f"""
          COPY (SELECT event_id + i*{me + 1} AS event_id, ts,
                       {uid}, event_type, value, props
                FROM read_parquet('{SRC}/events.parquet'),
                     generate_series(0,{n}) t(i))
          TO '{DST}/events.parquet' (FORMAT PARQUET)""")
    if wanted("documents"):
        md = con.sql(
            f"SELECT max(doc_id) FROM read_parquet('{SRC}/documents.parquet')"
        ).fetchone()[0]
        txt = "text || ' v' || i::VARCHAR AS text"
        if HOT > 0:
            # boilerplate contamination: pct% of ALL docs collapse onto 40
            # near-identical template variants (same long body, tiny
            # per-variant + per-copy suffix) — every variant's members land
            # in the same LSH bucket, the worst-realistic near-dup shape
            # (mirrored ToS/nav chrome pages). Exercises the star-pattern
            # bucket guard and the pair-volume bound under Zipf text.
            txt = (
                f"CASE WHEN hash(doc_id*17 + i) % 100 < {pct} THEN "
                f"'terms of service boilerplate mirrored across corpus "
                f"edition pages with navigation chrome header footer and "
                f"cookie notice text repeated verbatim on every crawled "
                f"snapshot of the site variant ' || (doc_id % 40)::VARCHAR "
                f"|| ' v' || i::VARCHAR "
                f"ELSE text || ' v' || i::VARCHAR END AS text"
            )
        con.sql(f"""
          COPY (SELECT doc_id + i*{md + 1} AS doc_id,
                       {txt}, lang, source,
                       n_chars + 3 AS n_chars
                FROM read_parquet('{SRC}/documents.parquet'),
                     generate_series(0,{n}) t(i))
          TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
    if wanted("embeddings"):
        mv = con.sql(
            f"SELECT max(vec_id) FROM read_parquet('{SRC}/embeddings.parquet')"
        ).fetchone()[0]
        emb = "embedding"
        if HOT > 0:
            # hot embedding: pct% of ALL vectors become ONE identical
            # vector (vec_id 0's) — the mode-collapse / mass-duplication
            # shape that concentrates a single IVF or k-means cell with
            # 20% of the corpus, turning per-cell pairwise stages into a
            # single-task quadratic
            emb = (
                f"CASE WHEN hash(vec_id*41 + i) % 100 < {pct} THEN "
                f"(SELECT embedding FROM read_parquet("
                f"'{SRC}/embeddings.parquet') WHERE vec_id = 0) "
                f"ELSE embedding END AS embedding"
            )
        con.sql(f"""
          COPY (SELECT vec_id + i*{mv + 1} AS vec_id, {emb}, label
                FROM read_parquet('{SRC}/embeddings.parquet'),
                     generate_series(0,{n}) t(i))
          TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")


def main() -> int:
    if not os.path.exists(f"{DST}/lineitem.parquet"):
        print(f"generating {DST} ({COPIES}x {SRC}) ...")
        generate()
    from cartodb_importer_spark.queries import QUERIES
    from cartodb_importer_spark.session import get_spark

    spark = get_spark()
    failures = 0
    # STRESS_ONLY=a,b,c restricts the run (and skips the BPE block) — for
    # rehearsing a new operator at 30x without repaying the full list
    only = os.environ.get("STRESS_ONLY")
    names = [n for n in only.split(",") if n] if only else HEAVY
    for name in names:
        t0 = time.time()
        try:
            QUERIES[name](spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"OK   {name}: {time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(
                f"BOOM {name}: {time.time() - t0:.1f}s "
                f"{type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )
        spark.catalog.clearCache()

    # BPE at a real merge count: the incremental-state trainer (VERDICT r3
    # item 5) must stay O(merges) — 64 merges over the duplicated corpus in
    # bounded time, where the old rederive-from-chars form was O(merges^2)
    # folds and unusable.
    if only:
        print(f"{len(names) - failures}/{len(names)} heavy operators OK "
              f"at {COPIES}x sf0.1 (STRESS_ONLY)")
        return 1 if failures else 0
    n_bpe = int(os.environ.get("STRESS_BPE_MERGES", "64"))
    t0 = time.time()
    try:
        from cartodb_importer_spark.llm.bpe import bpe_train

        docs = spark.read.parquet(f"{DST}/documents.parquet")
        rules = bpe_train(docs, n_merges=n_bpe)
        dt = time.time() - t0
        print(f"OK   bpe_train[{n_bpe} merges]: {dt:.1f}s "
              f"({len(rules)} rules, {dt / max(1, len(rules)):.2f}s/merge)",
              flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue
        failures += 1
        print(f"BOOM bpe_train[{n_bpe} merges]: {time.time() - t0:.1f}s "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    print(f"{len(HEAVY) + 1 - failures}/{len(HEAVY) + 1} heavy operators OK "
          f"at {COPIES}x sf0.1")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
