"""Semantic properties of the r06 curation/planning queries (their value
correctness is oracle-checked by tools/check_oracle.py; these pin the
invariants a refactor must not break)."""

from pyspark.sql import functions as F

from cartodb_importer_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_rfm_segments_partition_customers(spark):
    out = QUERIES["events_rfm_segments"](spark, SF).collect()
    segs = {r["segment"] for r in out}
    assert segs <= {
        "1_champion",
        "2_loyal",
        "3_active",
        "4_at_risk",
        "5_hibernating",
    }
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in out) == n_cust
    assert all(r["total_monetary"] > 0 for r in out)


def test_constraint_checks_shape_and_known_rules(spark):
    rows = {
        r["check_name"]: r
        for r in QUERIES["pipeline_constraint_checks"](spark, SF).collect()
    }
    assert len(rows) == 10
    for r in rows.values():
        assert 0.0 <= r["metric"] <= 1.0
        assert r["passed"] == int(r["metric"] >= r["threshold"])
    # contracts the generator is known to satisfy
    assert rows["orders_orderkey_unique"]["passed"] == 1
    assert rows["lineitem_quantity_in_range"]["passed"] == 1
    assert rows["customer_name_pattern"]["passed"] == 1


def test_mixture_weights_normalize_and_upsample_small(spark):
    out = QUERIES["llm_mixture_weights"](spark, SF).collect()
    assert abs(sum(r["p"] for r in out) - 1.0) < 1e-3
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-3
    smallest = min(out, key=lambda r: r["n_tokens"])
    largest = max(out, key=lambda r: r["n_tokens"])
    # sqrt smoothing upsamples the under-represented source and
    # downsamples the dominant one
    assert smallest["epochs"] > largest["epochs"]
    assert smallest["weight"] > smallest["p"]
    assert largest["weight"] < largest["p"]


def test_vocab_coverage_arithmetic(spark):
    out = QUERIES["llm_vocab_coverage"](spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_in_vocab"] <= r["n_tokens"]
        assert abs(r["coverage"] - r["n_in_vocab"] / r["n_tokens"]) < 1e-5
        assert r["oov_types"] >= 0
    # the frozen vocab covers a real share of every language's stream
    assert all(r["coverage"] > 0 for r in out)
