"""Count-min sketch properties + HLL merge accuracy.

CMS invariants tested against exact counts (not fixed goldens, so they hold
at any scale factor): estimates never under-count, a wide-enough sketch is
exact, and merging two partition sketches equals sketching the union.
"""

import pyspark.sql.functions as F
import pytest

from cartodb_importer_spark.operators import sketches as SK

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").select("l_partkey")


def _truth(df):
    return {
        r["l_partkey"]: r["cnt"]
        for r in df.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }


def test_cms_never_undercounts(spark, lineitem):
    truth = _truth(lineitem)
    probes = spark.createDataFrame(
        [(k,) for k in list(truth)[:50]], "l_partkey bigint"
    )
    sketch = SK.cms_build(lineitem, "l_partkey", depth=4, hex_chars=2)
    est = {
        r["l_partkey"]: r["est_freq"]
        for r in SK.cms_estimate(sketch, probes, "l_partkey", 4, 2).collect()
    }
    assert len(est) == min(50, len(truth))
    for k, e in est.items():
        assert e >= truth[k], f"CMS under-counted key {k}: {e} < {truth[k]}"


def test_cms_exact_when_wide(spark, lineitem):
    # 16^4 = 65536 buckets vs ~700 distinct partkeys at sf0.001: collisions
    # across all 4 rows are overwhelmingly unlikely, so min() recovers the
    # exact count for every probed key.
    truth = _truth(lineitem)
    probes = spark.createDataFrame([(k,) for k in truth], "l_partkey bigint")
    sketch = SK.cms_build(lineitem, "l_partkey", depth=4, hex_chars=4)
    est = {
        r["l_partkey"]: r["est_freq"]
        for r in SK.cms_estimate(sketch, probes, "l_partkey", 4, 4).collect()
    }
    assert est == truth


def test_cms_merge_equals_sketch_of_union(spark, lineitem):
    # sketch(A) + sketch(B) bucket-wise == sketch(A union B): the property
    # that lets 1000 executors sketch shards independently and combine.
    a = lineitem.filter(F.col("l_partkey") % 2 == 0)
    b = lineitem.filter(F.col("l_partkey") % 2 != 0)
    merged = SK.cms_merge(
        SK.cms_build(a, "l_partkey"), SK.cms_build(b, "l_partkey")
    ).withColumnRenamed("cnt", "cnt_merged")
    whole = SK.cms_build(lineitem, "l_partkey").withColumnRenamed("cnt", "cnt_whole")
    diff = merged.join(whole, ["seed", "bucket"], "full").filter(
        (F.col("cnt_merged") != F.col("cnt_whole"))
        | F.col("cnt_merged").isNull()
        | F.col("cnt_whole").isNull()
    )
    assert diff.count() == 0


def test_hll_merge_close_to_exact(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    exact = orders.select("o_custkey").distinct().count()
    merged = (
        orders.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .collect()[0]["est"]
    )
    assert abs(merged - exact) / exact < 0.05


# ---------------------------------------------------------------- qdigest

class TestQdigest:
    """Quantile-digest invariants vs exact ranks (scale-factor-free)."""

    @pytest.fixture(scope="class")
    def digest(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        groups = SK.qdigest_build(
            orders, "o_orderpriority", "o_totalprice", k=64,
            tiebreak_col="o_orderkey",
        )
        return orders, groups

    def test_centroid_count_and_mass(self, digest):
        orders, groups = digest
        per_group = (
            groups.groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n_centroids"),
                F.sum("weight").alias("mass"),
            )
            .collect()
        )
        truth = {
            r["o_orderpriority"]: r["n"]
            for r in orders.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for r in per_group:
            assert r["n_centroids"] <= 64
            assert r["mass"] == truth[r["g"]]

    def test_merged_mass_and_rank_error(self, digest):
        orders, groups = digest
        merged = SK.qdigest_merge(groups, k=64)
        total = orders.count()
        assert merged.agg(F.sum("weight")).collect()[0][0] == total
        # every quantile read off the MERGED digest lands within 4/k rank
        # of the requested rank against the exact sorted data
        est = {
            r["q_bps"]: r["est"]
            for r in SK.qdigest_quantiles(merged, [2500, 5000, 7500, 9900])
            .collect()
        }
        vals = sorted(
            v[0] for v in orders.select("o_totalprice").collect()
        )
        import bisect

        for q_bps, e in est.items():
            lo = bisect.bisect_left(vals, e) / total
            hi = bisect.bisect_right(vals, e) / total
            q = q_bps / 10000
            tol = 4 / 64
            assert lo - tol <= q <= hi + tol, (q_bps, e, lo, hi)
