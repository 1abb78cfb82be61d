"""Plan audit over EVERY registered query: no accidental cartesian
products. Intentional nested-loop plans (crossJoin of dimensions, the
single-row broadcast query-vector pattern) are allowlisted explicitly —
anything else joining without keys is a bug at 100 TB."""

import pytest

from cartodb_importer_spark.queries import QUERIES

# queries whose plans legitimately contain a nested-loop/cartesian join:
# tiny-side cross joins and single-row broadcast scalars
ALLOWED_NLJ = {
    "join_cross",              # dimension cartesian by design
    "llm_cosine_topk",         # 1-row query vector broadcast
    "llm_euclidean_topk",      # 1-row query vector broadcast
    "scalar_fuzzy_match",      # 25-row candidate set broadcast
    "stream_late_data_filter", # 1-row max-ts broadcast
    "q11_important_parts",     # 1-row threshold broadcast
    "q20_excess_suppliers",    # 1-row threshold broadcast
    "q22_idle_customers",      # 1-row threshold broadcast
    "agg_rollup",              # broadcast dims (BNLJ never appears; safety)
    "agg_equidepth_bins",      # 1-row decile-boundary broadcast
    "llm_embedding_standardize",  # 1-row per-dim mean/std broadcast
    "llm_embedding_quantize",  # 1-row per-dim min/max broadcast
    "llm_tfidf_top_terms",     # 1-row doc-count broadcast
    "llm_bigram_lm_score",     # 1-row vocab-size broadcast
    "agg_kmv_setops",          # 1-row sketch-estimate assembly broadcast
    "events_ab_ttest",         # 1-row per-arm moment broadcast
    "llm_bm25_search",         # 1-row (N, avgdl) corpus-scalar broadcast
    "llm_domain_mix_sample",   # 1-row min-source-count floor broadcast
    "llm_knn_classify",        # tiny held-out query block broadcast
    "geo_nearest_station",     # 10-row station dim broadcast
    "agg_decile_lift",         # 1-row totals broadcast
    "agg_hll_sketch_merge",    # 1-row merged-exact broadcast
    "llm_rrf_fusion",          # 1-row query vector + (N, avgdl) broadcasts
    "pipeline_benford_profile",  # 1-row digit-total broadcast
    "events_seasonality_dow",  # 1-row overall-mean broadcast
    "agg_chi2_independence",   # 1-row grand-total broadcast
    "pipeline_skew_diagnostics",  # 1-row key-moment broadcast
    "agg_tdigest_quantiles",   # 4-row quantile list + 1-row N broadcasts
    "events_diff_in_diff",     # 1-row time-cutoff scalar broadcast
    "llm_semantic_dedup",      # 8-row fixed-centroid broadcast
    "llm_perplexity_bucket",   # 1-row tertile-cutoff broadcast
    "events_rfm_segments",     # 1-row reference-date broadcast
    "llm_mixture_weights",     # 1-row (N, denom) totals broadcast
    "llm_dsir_weights",        # 1-row token-total scalar into 128-row lambda
    "llm_dsir_resample",       # same lambda assembly as llm_dsir_weights
    "llm_shard_plan",          # 1-row grand-total broadcast into 32-row frame
    "llm_lsh_quality",         # deliberate bounded-sample all-pairs ground truth
    "llm_dedup_rate_by_threshold",  # 1-row totals broadcast
    "llm_doc_len_mad_outliers",     # 1-row median/MAD scalar broadcasts
}

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_accidental_cartesian(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_nlj = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    if name in ALLOWED_NLJ:
        return  # allowlisted; presence is fine either way
    assert not has_nlj, f"{name} plans a cartesian/nested-loop join"


def _plan(spark, name):
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_column_pruning(spark):
    """The q1 scan must read ONLY the 7 needed lineitem columns — a scan
    materializing all 16 for a 7-column aggregate is wrong at any scale."""
    plan = _plan(spark, "q1_pricing_summary")
    import re

    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans, "no parquet scan found"
    cols = {c.split("#")[0] for s in scans for c in s.split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_q6_filter_pushdown(spark):
    """Range predicates must reach the parquet scan (DataFilters), not
    evaluate post-materialization."""
    plan = _plan(spark, "q6_forecast_revenue")
    scan = next(
        line for line in plan.splitlines()
        if "FileScan parquet" in line and "l_shipdate" in line
    )
    assert "DataFilters: [" in scan
    assert "l_shipdate" in scan.split("DataFilters:")[1]


def test_q5_all_broadcast_join_tree(spark):
    """Every dimension join in q5 must end up broadcast at small SF — but
    only nation/region carry forced hints (bounded relations); supplier
    and customer scale with SF, so their broadcast is AQE's runtime call.
    Assert on the FINAL adaptive plan after execution: all five dimension
    joins broadcast, no dim join shuffles the fact."""
    df = QUERIES["q5_nation_revenue"](spark, SF)
    df.collect()  # materialize so AQE finalizes join strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan"
    # section; judge only the final executed tree above it
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_minhash_band_exchange_reuse(spark):
    """The LSH bucket-cap window and the candidate self-join share the
    (band, val) shuffles: the window's aggregate exchange, plus the ONE
    deliberate parallelism-spread repartition the r12 optimization added
    ahead of the self-join (REPARTITION_BY_NUM over the ~KB-sized bucket
    rows, so the quadratic pair expansion runs at cluster width instead
    of at AQE's byte-sized partition count). Anything beyond those two
    would be an accidental third full shuffle of the stacked frame."""
    from cartodb_importer_spark.llm import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = D.minhash_candidate_pairs(docs, bands=4, n=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    import re

    band_exchanges = {
        re.sub(r"#\d+", "#", m.group(0))
        for m in re.finditer(r"Exchange hashpartitioning\(band#\d+, val#\d+[^)]*\)", plan)
    }
    # window exchange + spread repartition (normalized over expression
    # ids: the two self-join sides print the spread with distinct ids but
    # identical canonical form, which AQE's exchange reuse dedupes at
    # runtime); a third distinct shape would be an accidental shuffle
    assert len(band_exchanges) <= 2, band_exchanges


def test_bloom_prefilter_all_broadcast(spark):
    """The bloom runtime-filter join must be broadcast end to end: three
    position semi-joins + the exact dim join, with the fact side never
    shuffled (a SortMergeJoin would defeat the prefilter's purpose)."""
    plan = _plan(spark, "join_bloom_prefilter")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_scoring_join_broadcast_and_cached(spark):
    """llm_dsir_weights: the 128-row lambda table must broadcast into the
    per-doc scoring join (a SortMergeJoin would shuffle the whole token
    frame on a 7-bit key), and the (doc, bucket) count frame must come
    from the persisted cache — without it every branch re-explodes the
    corpus (measured 6 parquet scans pre-persist)."""
    plan = _plan(spark, "llm_dsir_weights")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "InMemoryTableScan" in plan


def test_dsir_resample_topk_not_global_sort(spark):
    """llm_dsir_resample's selection must plan TakeOrderedAndProject
    (per-partition top-k + k-row driver merge) — a global Sort of the
    scored frame would shuffle everything to rank 100 rows."""
    plan = _plan(spark, "llm_dsir_resample")
    assert "TakeOrderedAndProject" in plan


def test_span_dedup_shuffles_hashes_not_text(spark):
    """Span dedup's winner election must key its exchanges on the 8-byte
    span hash — the span STRING must never be a shuffle key."""
    plan = _plan(spark, "llm_span_dedup")
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "span#" not in m.group(1), m.group(0)


def test_resample_interp_single_window_over_sparse(spark):
    """The interp rewrite must plan exactly one Window (the sparse-bucket
    lead pairing) — a second Window would mean the dense grid is being
    windowed again."""
    plan = _plan(spark, "stream_resample_interp")
    assert plan.count("Window") == 1, plan.count("Window")


def test_concurrency_no_global_sort_of_points(spark):
    """events_concurrency's prefix scan must window the point stream
    partitioned BY BUCKET — a SinglePartition exchange of the full point
    stream would be the global sort the operator exists to avoid. The
    only single-partition window allowed is over the tiny bucket-totals
    frame (detectable: its input is an aggregate, not the raw union)."""
    plan = _plan(spark, "events_concurrency")
    # the within-bucket window must exist
    assert "Window" in plan
    # count SinglePartition exchanges: exactly one (bucket offsets), and
    # the union side must also hash-partition on the bucket key
    assert plan.count("Exchange SinglePartition") <= 1
    assert "Exchange hashpartitioning(__bk" in plan


def test_core_broadcast_hints_are_scale_free(spark):
    """VERDICT r4 item 2: a forced ``F.broadcast`` hint bypasses the size
    threshold unconditionally, so it is only legitimate on relations whose
    size does NOT grow with the data (nation=25, region=5, 1-row scalar
    frames). Build every flagship query at two scale factors with a
    recording broadcast(), then assert each hinted relation has an
    identical row count at both SFs — an SF-scaling relation (customer,
    supplier, part, any per-key aggregate) would OOM a 1000-executor
    cluster at 100x and must be left to AQE instead."""
    import pyspark.sql.functions as _F

    core_queries = {
        name: fn
        for name, fn in QUERIES.items()
        if fn.__module__ == "cartodb_importer_spark.queries.core"
    }
    assert len(core_queries) >= 20

    real_broadcast = _F.broadcast
    recorded = []  # (query_name, sf_dir, row_count)
    current = [None, None]

    def recording_broadcast(df):
        recorded.append((current[0], current[1], df.count()))
        return real_broadcast(df)

    _F.broadcast = recording_broadcast
    try:
        for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            for name, fn in core_queries.items():
                current[0], current[1] = name, sf_dir
                fn(spark, sf_dir)  # build only; hints fire at build time
    finally:
        _F.broadcast = real_broadcast

    by_key = {}
    for name, sf_dir, n_rows in recorded:
        by_key.setdefault((name, sf_dir), []).append(n_rows)
    offenders = []
    for name in core_queries:
        small = sorted(by_key.get((name, "/root/testdata/sf0.001"), []))
        big = sorted(by_key.get((name, "/root/testdata/sf0.01"), []))
        if small != big:
            offenders.append((name, small, big))
        # belt-and-braces: nothing bounded should exceed nation's 25 rows
        assert all(n <= 25 for n in big), (name, big)
    assert not offenders, f"SF-scaling relations under F.broadcast: {offenders}"


def test_events_ts_pushdown_on_micros_parquet(spark, tmp_path):
    """SCALE.md "Scans" caveat, VERDICT r3 item 6: the testdata's
    TIMESTAMP(NANOS) events encoding forces a nanos->timestamp conversion
    expression that blocks parquet predicate pushdown on ts. Production
    tables write micros — prove that on a micros-written events variant
    the normalized read pushes ts range predicates all the way into
    PushedFilters (via NTZ inference + UnwrapCast, no conversion
    expression in the way)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from cartodb_importer_spark.queries import read_parquet_normalized

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    cols = [
        src.column(f.name).cast(pa.timestamp("us"))
        if str(f.type) == "timestamp[ns]"
        else src.column(f.name)
        for f in src.schema
    ]
    dst = str(tmp_path / "events_micros.parquet")
    pq.write_table(pa.table(cols, names=src.schema.names), dst)

    df = read_parquet_normalized(spark, dst)
    assert dict(df.dtypes)["ts"] == "timestamp"
    flt = df.filter(F.col("ts") >= "2024-03-01").select("ts", "user_id")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines() if "FileScan parquet" in line
    )
    pushed = scan.split("PushedFilters:")[1]
    assert "GreaterThanOrEqual(ts" in pushed, scan


def test_vocab_coverage_topk_never_global_sort(spark):
    """The top-256 vocab cut must plan as TakeOrderedAndProject
    (per-partition heaps + a bounded driver merge) — a global Sort over
    the full token-frequency table would be a single-partition
    bottleneck at corpus scale. The 256-row vocab must reach the audit
    join as a broadcast."""
    plan = _plan(spark, "llm_vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_constraint_checks_no_row_shuffle(spark):
    """Every constraint metric is a conditional count folded into ONE
    scalar aggregate per table: no Window, no row-payload exchange —
    only the tiny partial->final agg exchanges (plus the distinct for
    the uniqueness rule) may appear."""
    plan = _plan(spark, "pipeline_constraint_checks")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # shuffle structure is bounded: one partial->final exchange per
    # table aggregate (5 tables) plus the two-phase distinct for the
    # uniqueness rule — a raw-row shuffle would add exchanges beyond
    # this ceiling
    assert plan.count("Exchange") <= 7, plan.count("Exchange")
    # each table is scanned exactly once (all metrics fold into the
    # table's single aggregate pass)
    assert plan.count("FileScan") == 5, plan.count("FileScan")


def test_rfm_ntile_ranks_on_reduced_frame(spark):
    """The three ntile windows rank the 1-row-per-customer frame, so the
    single-partition window input is the pre-reduced aggregate, never
    raw orders: the plan must aggregate (groupBy custkey) BEFORE any
    Window node."""
    df = QUERIES["events_rfm_segments"](spark, SF)
    root = df._jdf.queryExecution().executedPlan()

    def walk(node):
        yield node
        # AQE / reused-subquery wrappers hide the real tree behind
        # accessor methods rather than children()
        if node.nodeName() == "AdaptiveSparkPlan":
            yield from walk(node.executedPlan())
            return
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    windows = [n for n in walk(root) if n.nodeName() == "Window"]
    assert windows, "no Window node planned"
    for w in windows:
        # the per-custkey HashAggregate must be a DESCENDANT of every
        # Window — i.e., each ntile's input subtree contains the
        # grouping on o_custkey, never the raw orders rows. (A
        # window-over-raw refactor moves the aggregate above the
        # windows, emptying this subtree of it; the broadcast ref-date
        # max() aggregate has no o_custkey grouping key and cannot
        # satisfy the match.)
        assert any(
            "HashAggregate" in n.nodeName()
            and "keys=[o_custkey" in n.simpleString(120)
            for n in walk(w)
        ), "ntile Window does not rank the per-customer reduction"


def test_zipf_slope_prunes_scan_and_joins_nothing(spark):
    """llm_zipf_slope is two aggregations and a per-lang window — the scan
    must read only (lang, text), and no join may appear (the regression
    is regr_slope/regr_r2 sums, never a collected series or a join)."""
    plan = _plan(spark, "llm_zipf_slope")
    assert "ReadSchema: struct<text:string,lang:string>" in plan, plan[
        plan.find("ReadSchema") : plan.find("ReadSchema") + 120
    ]
    assert "Join" not in plan


def test_lexical_diversity_stays_document_local(spark):
    """llm_lexical_diversity must never shuffle on anything beyond the
    document boundary: every exchange key starts with doc_id, no join,
    and the scan reads only (doc_id, text)."""
    plan = _plan(spark, "llm_lexical_diversity")
    assert "Join" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert m.group(1).startswith("doc_id#"), m.group(0)


def test_vocab_overlap_caches_distinct_and_broadcasts_sizes(spark):
    """llm_source_vocab_overlap: the distinct (source, token) frame must
    come from the persisted cache (three consumers — unpersisted each
    re-scans the corpus, measured 4 parquet scans), and both 20-row size
    tables must broadcast into the pair frame."""
    plan = _plan(spark, "llm_source_vocab_overlap")
    assert "InMemoryTableScan" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_winnowing_single_per_doc_shuffle(spark):
    """llm_winnowing_fingerprint: leads, the min-over-frame and the final
    per-doc aggregate all run inside ONE doc_id-keyed exchange — the
    window partitioning must be reused by the groupBy (a second corpus
    shuffle would double the operator's cost at 100 TB)."""
    plan = _plan(spark, "llm_winnowing_fingerprint")
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(exchanges) == 1, exchanges
    assert exchanges[0].startswith("doc_id#"), exchanges[0]
    assert "Join" not in plan


def test_split_novelty_no_forced_broadcast_and_hashes_only(spark):
    """llm_split_novelty: the train-gram side is 80% of the corpus, so
    the query must NOT carry a broadcast hint (a forced broadcast OOMs at
    scale — AQE picking one at a tiny local SF is fine and scale-free),
    and gram STRINGS must never be a shuffle key (only the 8-byte
    xxhash64 compression may move)."""
    from cartodb_importer_spark.queries import QUERIES

    df = QUERIES["llm_split_novelty"](spark, SF)
    logical = df._jdf.queryExecution().logical().toString()
    assert "broadcast" not in logical.lower(), "forced broadcast hint found"
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "__g#" not in m.group(1), m.group(0)


def test_shard_plan_no_explode_single_scan(spark):
    """llm_shard_plan counts tokens with regexp_count per row — no
    Generate (explode) may appear, and only (doc_id, text) is read."""
    plan = _plan(spark, "llm_shard_plan")
    assert "Generate" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_ann_batch_topk_no_cartesian_no_driver_loop(spark):
    """The batched ANN approximate path (similarity.ann_batch_topk) is
    ONE distributed plan over all queries at once — VERDICT r06 item 3:
    no cartesian/nested-loop join anywhere, exactly one cell-keyed
    cogroup (FlatMapCoGroupsInPandas) doing the quadratic stage, and the
    probe ranking inlined as a JVM expression (no per-query driver
    collect — the plan below covers EVERY qid)."""
    from cartodb_importer_spark.llm import similarity as S
    from cartodb_importer_spark.queries import Tables

    emb = Tables(spark, SF).embeddings
    # fixed centroids: the audit is about topology, not k-means quality
    centroids = [[float(i == j % 4) for i in range(64)] for j in range(8)]
    df = S.ann_batch_topk(emb, centroids, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("FlatMapCoGroupsInPandas") == 1, plan
    # the per-qid merge window rides the cogroup output
    assert "Window" in plan


def test_pagerank_constant_shuffles_per_iteration(spark):
    """BSP invariant: each extra PageRank superstep adds a CONSTANT
    number of exchanges to the static plan (rank-side join shuffle +
    contribution aggregate and their sorts) — never a growing re-plan of
    the persisted weighted-edge subtree. Superlinear per-round plan
    growth is the classic iterative-DataFrame trap at 100 TB."""
    import re

    from pyspark.sql import functions as F

    from cartodb_importer_spark.queries import Tables
    from cartodb_importer_spark.queries.graph import (
        _copurchase_pairs,
        _pagerank_ranks,
    )

    # earlier tests construct graph_pagerank, whose internal persist()
    # stays in the cache manager and would substitute InMemoryRelations
    # into these plans (changing exchange counts order-dependently)
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t = Tables(spark, SF)
        pairs = _copurchase_pairs(t)
        edges = pairs.union(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        wedges = (
            edges.join(deg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
            .persist()
        )
        counts = {}
        for iters in (2, 3, 4):
            df = _pagerank_ranks(wedges, deg, n=100, iters=iters)
            plan = df._jdf.queryExecution().executedPlan().toString()
            counts[iters] = len(
                re.findall(r"\bExchange hashpartitioning", plan)
            )
        d32 = counts[3] - counts[2]
        d43 = counts[4] - counts[3]
        assert d32 == d43, counts          # constant per-iteration delta
        assert d43 <= 8, counts            # and a small constant
        wedges.unpersist()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_connected_components_round_shuffle_topology(spark):
    """One CC superstep (_cc_round) stays at its shuffle minimum: the
    plain round is neighbor-join (2) + min-aggregate (1) + label step
    left-join (1) = at most 4 exchanges; the jump round's post-checkpoint
    plan (the eager=False localCheckpoint truncates the pre-jump subtree
    — that truncation is itself the ADVICE r06 single-evaluation fix)
    adds at most 2 more for the pointer-jump self-join. No NLJ ever."""
    import re

    from pyspark.sql import functions as F

    from cartodb_importer_spark.llm import dedup as D

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(50)], "id_a bigint, id_b bigint"
        )
        edges = (
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
            .union(
                pairs.select(
                    F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                )
            )
            .distinct()
            .localCheckpoint()
        )
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("component", F.col("id"))
            .localCheckpoint()
        )
        for jump, max_exchanges in ((False, 4), (True, 2)):
            df = D._cc_round(edges, labels, jump=jump)
            plan = df._jdf.queryExecution().executedPlan().toString()
            n_ex = len(re.findall(r"\bExchange hashpartitioning", plan))
            assert n_ex <= max_exchanges, (jump, n_ex, plan)
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_seq_len_histogram_single_scan_no_explode(spark):
    """llm_seq_len_histogram counts tokens with size(split) per row —
    ONE documents scan reading only text, no Generate (explode); the
    share windows run post-aggregation on the tiny bucket frame."""
    plan = _plan(spark, "llm_seq_len_histogram")
    assert "Generate" not in plan
    assert plan.count("ReadSchema") == 1
    assert "ReadSchema: struct<text:string>" in plan


def test_lsh_probe_cost_no_corpus_reshuffle(spark):
    """llm_lsh_probe_cost reduces the corpus to <=256 (bucket, size)
    rows in its FIRST aggregate; the probe fan-out (Generate) and the
    xor self-join must ride that reduced frame — the embedding scan
    feeds exactly one hashpartitioning exchange (the bucket groupBy),
    and no exchange key ever includes the embedding column."""
    import re

    plan = _plan(spark, "llm_lsh_probe_cost")
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in m.group(1), m.group(0)


def test_events_ts_pushdown_on_nanos_parquet_via_ts_range(spark, tmp_path):
    """VERDICT r11 item 2 — the exact complement of the micros test
    above: on a TIMESTAMP(NANOS)-written events variant the normalized
    read's div-1000 conversion blocks pushdown of any filter written
    against the converted column, so read_parquet_ts_range must rewrite
    the bounds onto the RAW int64 (epoch nanos) BEFORE the conversion —
    PushedFilters carries them, row groups outside the range skip on
    min/max stats — while returning value-identical rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from cartodb_importer_spark.queries import (
        read_parquet_normalized,
        read_parquet_ts_range,
    )

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    cols = [
        src.column(f.name).cast(pa.timestamp("ns"))
        if str(f.type).startswith("timestamp")
        else src.column(f.name)
        for f in src.schema
    ]
    dst = str(tmp_path / "events_nanos.parquet")
    pq.write_table(pa.table(cols, names=src.schema.names), dst)
    assert str(pq.read_schema(dst).field("ts").type) == "timestamp[ns]"

    lo, hi = "2024-01-10", "2024-01-20"
    pruned = read_parquet_ts_range(spark, dst, "ts", lo=lo, hi=hi)
    assert dict(pruned.dtypes)["ts"] == "timestamp"  # still normalized
    plan = (
        pruned.select("ts", "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan = next(
        line for line in plan.splitlines() if "FileScan parquet" in line
    )
    pushed = scan.split("PushedFilters:")[1]
    assert "GreaterThanOrEqual(ts" in pushed, scan
    assert "LessThan(ts" in pushed, scan

    # the CONTROL the helper exists to fix: the same predicate written
    # against the converted column pushes NOTHING
    naive = read_parquet_normalized(spark, dst).filter(
        (F.col("ts") >= F.lit(lo).cast("timestamp"))
        & (F.col("ts") < F.lit(hi).cast("timestamp"))
    )
    nplan = (
        naive.select("ts", "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    nscan = next(
        line for line in nplan.splitlines() if "FileScan parquet" in line
    )
    npushed = nscan.split("PushedFilters:")[1]
    assert "GreaterThanOrEqual(ts" not in npushed, nscan

    # value-identical to the unpushed form, boundaries included
    a = sorted(r["event_id"] for r in pruned.select("event_id").collect())
    b = sorted(r["event_id"] for r in naive.select("event_id").collect())
    assert a == b and len(a) > 0

    # one-sided ranges push too
    one = read_parquet_ts_range(spark, dst, "ts", lo=lo)
    oplan = (
        one.select("ts")._jdf.queryExecution().executedPlan().toString()
    )
    oscan = next(
        line for line in oplan.splitlines() if "FileScan parquet" in line
    )
    assert "GreaterThanOrEqual(ts" in oscan.split("PushedFilters:")[1]


def test_ts_range_micros_path_still_pushes(spark):
    """read_parquet_ts_range on the (micros-encoded) testdata events:
    the plain-filter path must keep the pushdown the micros plan-audit
    test pins, and slice exactly [lo, hi)."""
    from cartodb_importer_spark.queries import (
        read_parquet_normalized,
        read_parquet_ts_range,
    )
    from pyspark.sql import functions as F

    path = "/root/testdata/sf0.001/events.parquet"
    lo, hi = "2024-01-05", "2024-01-12"
    df = read_parquet_ts_range(spark, path, "ts", lo=lo, hi=hi)
    plan = df.select("ts")._jdf.queryExecution().executedPlan().toString()
    scan = next(
        line for line in plan.splitlines() if "FileScan parquet" in line
    )
    pushed = scan.split("PushedFilters:")[1]
    assert "GreaterThanOrEqual(ts" in pushed, scan
    want = (
        read_parquet_normalized(spark, path)
        .filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") < F.lit(hi).cast("timestamp"))
        )
        .count()
    )
    assert df.count() == want and want > 0
