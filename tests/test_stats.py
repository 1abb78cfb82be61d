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
