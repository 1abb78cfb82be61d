"""Mathematical invariants of the r06-late curation/graph queries —
bounds that must hold on ANY input, independent of the DuckDB oracle
(which pins exact values but would agree with a shared misreading of the
algorithm; these pin the algebra)."""

import math

from pyspark.sql import functions as F

from cartodb_importer_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_winnowing_selection_bounds(spark):
    """Winnowing (w=4): each selected hash covers at most w consecutive
    windows and every window selects something, so for every doc
    ceil(n_windows / w) <= n_fingerprints <= n_windows, with
    n_windows = n_kgrams - w + 1 (Schleimer et al. 2003 §4 density
    bounds)."""
    rows = QUERIES["llm_winnowing_fingerprint"](spark, SF).collect()
    assert rows
    for r in rows:
        n_windows = r.n_kgrams - 4 + 1
        assert 1 <= r.n_fingerprints <= n_windows, r
        assert r.n_fingerprints >= math.ceil(n_windows / 4), r


def test_lexical_diversity_count_algebra(spark):
    """hapax <= types <= tokens, and both ratios land in (0, 1]."""
    rows = QUERIES["llm_lexical_diversity"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax, r
        assert r.n_hapax <= r.n_types <= r.n_tokens, r
        assert 0 < r.ttr <= 1 and 0 <= r.hapax_frac <= 1, r


def test_shard_plan_partitions_the_corpus(spark):
    """Shards partition the corpus exactly: doc and token totals equal
    the corpus totals, and mean load_ratio is 1 (up to 6dp rounding)."""
    df = QUERIES["llm_shard_plan"](spark, SF)
    got = df.agg(
        F.sum("n_docs").alias("d"),
        F.sum("n_tokens").alias("t"),
        F.avg("load_ratio").alias("lr"),
    ).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert got.d == docs.count()
    assert abs(got.lr - 1.0) < 1e-4
    # every doc's tokens are in exactly one shard
    from cartodb_importer_spark.llm import textstats as T

    tot = docs.select(
        F.sum(T.token_count(F.col("text"))).alias("n")
    ).collect()[0].n
    assert got.t == tot


def test_split_novelty_only_test_docs_and_bounded(spark):
    """Novelty rows are exactly the test-split docs that have >= 1
    3-gram, and n_novel <= n_grams with the fraction in [0, 1]."""
    rows = QUERIES["llm_split_novelty"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams, r
        assert 0.0 <= r.novelty_frac <= 1.0, r


def test_clustering_coefficient_in_unit_interval(spark):
    """lcc in [0, 1]; triangle count never exceeds deg-choose-2; and the
    per-node triangle totals agree with graph_triangle_count."""
    rows = QUERIES["graph_clustering_coefficient"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.lcc <= 1.0, r
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2, r
    got = {r.part_node: r.n_triangles for r in rows if r.n_triangles}
    ref = {
        r.part_node: r.n_triangles
        for r in QUERIES["graph_triangle_count"](spark, SF).collect()
    }
    assert got == ref


def test_lang_confusion_shares_sum_to_one(spark):
    """Each declared language's row shares sum to 1 (up to 6dp rounding
    per cell), and cell counts sum to the corpus size."""
    rows = QUERIES["llm_lang_confusion"](spark, SF).collect()
    assert rows
    by_lang: dict[str, float] = {}
    n = 0
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.share
        n += r.n_docs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert n == docs.count()
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-5 * len(rows), (lang, s)


def test_source_vocab_overlap_jaccard_bounds(spark):
    """Pairwise vocab Jaccard is symmetric-by-construction (source_a <
    source_b), in (0, 1], and shared_types never exceeds either side's
    vocabulary."""
    df = QUERIES["llm_source_vocab_overlap"](spark, SF)
    rows = df.collect()
    assert rows
    sizes = (
        QUERIES["llm_source_vocab_overlap"](spark, SF)
        .sparkSession.read.parquet(f"{SF}/documents.parquet")
        .select(
            "source",
            F.explode(
                F.filter(
                    F.split(
                        F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", " "),
                        " ",
                    ),
                    lambda w: w != "",
                )
            ).alias("token"),
        )
        .distinct()
        .groupBy("source")
        .count()
    )
    vs = {r.source: r["count"] for r in sizes.collect()}
    for r in rows:
        assert r.source_a < r.source_b, r
        assert 0 < r.vocab_jaccard <= 1.0, r
        assert r.shared_types <= min(vs[r.source_a], vs[r.source_b]), r
