"""DataFrame stat-function surface: frequent items, bloom filter pruning,
stratified sampling, random splits — the sketch/sampling operators with no
SQL oracle form (rows-only by nature, asserted structurally)."""

from pyspark.sql import functions as F


def test_freq_items(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    fi = orders.freqItems(["o_orderpriority"], support=0.1).first()
    items = fi["o_orderpriority_freqItems"]
    assert len(items) >= 1
    real = {r["o_orderpriority"] for r in orders.select("o_orderpriority").distinct().collect()}
    assert set(items) <= real


def test_broadcast_key_pruning(spark):
    """Key-set pruning: a small key set collected from the selective side
    prunes the big scan via isin (folded into the scan as a pushed IN
    filter) — equivalent rows to the semi join. (PySpark exposes no
    bloomFilter; for key sets too large to collect, the semi join itself
    with a broadcast hint is the scalable form.)"""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    big = orders.filter(F.col("o_totalprice") > 400000)
    keys = [r["o_orderkey"] for r in big.select("o_orderkey").collect()]
    pruned = li.filter(F.col("l_orderkey").isin(keys)).count() if keys else 0
    exact = li.join(
        big.select("o_orderkey"), li.l_orderkey == big.o_orderkey, "semi"
    ).count()
    assert pruned == exact


def test_stratified_sample_by(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fractions = {"en": 0.5, "de": 1.0}
    sample = docs.sampleBy("lang", fractions, seed=42)
    langs = {r["lang"] for r in sample.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}
    n_de = docs.filter("lang = 'de'").count()
    assert sample.filter("lang = 'de'").count() == n_de  # fraction 1.0 keeps all


def test_random_split_partitions(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a, b = docs.randomSplit([0.8, 0.2], seed=42)
    assert a.count() + b.count() == docs.count()
    # no overlap
    assert a.join(b, "doc_id", "semi").count() == 0


def test_distributed_running_sum_equals_global_window(spark):
    """The two-phase prefix scan must equal the naive global window for
    an arbitrary value stream (including negatives and ties)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cartodb_importer_spark.operators.prefix import (
        distributed_running_sum,
    )

    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 37).alias("bucket_src"),
        (F.when(F.col("id") % 3 == 0, -2).otherwise(1)).alias("v"),
    )
    got = distributed_running_sum(
        df,
        value_col="v",
        order_cols=[F.col("id")],
        bucket_col=(F.col("id") / 500).cast("int"),
        out_col="rs",
    )
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("id", F.sum("v").over(w).alias("rs"))
    a = {(r.id, r.rs) for r in got.select("id", "rs").collect()}
    b = {(r.id, r.rs) for r in want.collect()}
    assert a == b
