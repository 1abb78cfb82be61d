"""global_index: correctness vs the window oracle is covered by
check_oracle; here we pin the SCALE property — the data-bearing plan side
never collapses to a single partition (the whole point of the operator) —
plus dense/unique invariants.
"""

import pyspark.sql.functions as F

from cartodb_importer_spark.operators.index import global_index

SF = "/root/testdata/sf0.001"


def test_index_is_dense_and_ordered(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    out = global_index(orders, "o_orderkey", num_partitions=7)
    rows = out.orderBy("global_idx").collect()
    n = len(rows)
    assert [r["global_idx"] for r in rows] == list(range(n))
    keys = [r["o_orderkey"] for r in rows]
    assert keys == sorted(keys)


def test_no_single_partition_exchange_on_data_path(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    out = global_index(orders, "o_orderkey", num_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the offsets side (n_partition rows) legitimately uses one partition;
    # the data side must show rangepartitioning, and the single-partition
    # window must sit above an aggregate (tiny), never above the scan.
    assert "rangepartitioning" in plan.lower()
    naive = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
            "o_orderkey"
        )
    )
    naive_plan = (
        orders.withColumn("global_idx", naive - 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # sanity: the naive formulation DOES collapse to a single partition —
    # the hazard global_index exists to avoid
    assert "SinglePartition" in naive_plan


def test_index_with_nonunique_key_still_dense(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_partkey")
    out = global_index(li, "l_partkey", num_partitions=5)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("global_idx").alias("d"),
        F.min("global_idx").alias("lo"),
        F.max("global_idx").alias("hi"),
    ).collect()[0]
    assert agg["n"] == agg["d"] == agg["hi"] + 1
    assert agg["lo"] == 0
