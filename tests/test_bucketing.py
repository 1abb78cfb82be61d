"""Bucketed-layout tests: a join between same-bucketed tables must plan
with NO shuffle on either side; the unbucketed control must shuffle."""

import pytest
from pyspark.sql import functions as F

from cartodb_importer_spark.sinks.bucketing import (
    co_located_join, plan_has_shuffle, write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        num_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, "b_orders", "b_lineitem", on=["o_orderkey"])
        assert not plan_has_shuffle(j)
        # control: the same join from raw parquet must shuffle
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        l = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .withColumnRenamed("l_orderkey", "o_orderkey")
        )
        assert plan_has_shuffle(o.join(l, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct(spark, bucketed_tables):
    j = co_located_join(spark, "b_orders", "b_lineitem", on=["o_orderkey"])
    direct = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    assert j.count() == direct.count()


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    g = spark.table("b_lineitem").groupBy("o_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert not plan_has_shuffle(g)


def test_schema_evolution_merge(spark, tmp_path):
    """Appended files with evolved schemas read as the merged superset —
    the long-lived-table contract (new columns arrive NULL-backfilled)."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string") \
        .write.mode("overwrite").parquet(p)
    spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double") \
        .write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    from cartodb_importer_spark.sinks.bucketing import overwrite_partitions

    p = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0), ("2024-01-02", 3, 30.0)],
        "day string, id int, v double",
    )
    overwrite_partitions(base, p, ["day"])
    # backfill day 1 with corrected values; day 2 must survive untouched
    fix = spark.createDataFrame(
        [("2024-01-01", 1, 11.0)], "day string, id int, v double"
    )
    overwrite_partitions(fix, p, ["day"])
    out = spark.read.parquet(p)
    # NB: partition values are type-inferred on read ('2024-01-01' -> date)
    rows = sorted((str(r["day"]), r["id"], r["v"]) for r in out.collect())
    assert rows == [("2024-01-01", 1, 11.0), ("2024-01-02", 3, 30.0)]


def test_join_strategy_switches_with_threshold(spark):
    """Plan-level check: small dim joins broadcast by default; with
    broadcast disabled the same join becomes a sort-merge/shuffled join."""
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    j = o.join(c, o.o_custkey == c.c_custkey)

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan(j)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j2 = o.join(c, o.o_custkey == c.c_custkey)
        p2 = plan(j2)
        assert "SortMergeJoin" in p2 or "ShuffledHashJoin" in p2
        assert "BroadcastHashJoin" not in p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_upsert_latest(spark):
    from cartodb_importer_spark.operators.timeseries import upsert_latest

    existing = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")], "id long, ver int, v string"
    )
    updates = spark.createDataFrame(
        [(2, 3, "b2"), (3, 2, "c2"), (4, 1, "d")], "id long, ver int, v string"
    )
    out = {r["id"]: (r["ver"], r["v"])
           for r in upsert_latest(existing, updates, "id", "ver").collect()}
    assert out == {
        1: (1, "a"),    # untouched
        2: (3, "b2"),   # higher version wins
        3: (2, "c2"),   # equal version: update side wins
        4: (1, "d"),    # new key inserted
    }


def test_compaction(spark, tmp_path):
    from cartodb_importer_spark.sinks.bucketing import compact

    p = str(tmp_path / "many_small")
    df = spark.range(10000).selectExpr("id", "id * 2 AS v")
    df.repartition(24).write.mode("overwrite").parquet(p)
    import glob
    before = len(glob.glob(p + "/*.parquet"))
    assert before >= 20
    after = compact(spark, p, target_file_mb=128)
    assert after < before
    back = spark.read.parquet(p)
    assert back.count() == 10000
    assert back.agg({"v": "sum"}).first()[0] == 2 * sum(range(10000))


def test_zorder_key_interleaving(spark):
    from cartodb_importer_spark.sinks.bucketing import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3)], "x int, y int"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y"), 4).alias("z")).collect()
    }
    # Morton codes: interleave x bits (even positions) and y bits (odd)
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(2, 0)] == 4
    assert got[(3, 3)] == 15
    # locality: manhattan-close points have closer z keys than far ones
    assert abs(got[(1, 1)] - got[(0, 0)]) < abs(got[(3, 3)] - got[(0, 0)])


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling: a sort-merge join with one hot key gets
    its skewed partition split at runtime (skew=true in the final plan)
    — the no-code-change answer to moderate key skew; operators/skew.py
    salting remains the explicit tool for extreme aggregation skew."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            # 90% of rows share key 0; the rest spread over 100 keys
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise((F.col("id") % 100).cast("long"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("dim").alias("attr")
        )
        # collect() executes THIS df's QueryExecution (count()/write()
        # build their own), which is what finalizes the AQE plan we read
        # payload must survive the shuffle: skew detection reads
        # compressed map-output sizes, and 180k identical key longs
        # compress below any threshold
        joined = left.join(right, "k").select("k", "payload", "attr")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_chunked_running_sum_matches_single_window_and_null_semantics(spark):
    """operators/skew.py chunked_running_sum: the two-phase (intra-chunk +
    offset) decomposition must equal the single-window running sum row for
    row — including exact NULL semantics (a row whose frame has seen no
    non-null value yields NULL, not 0.0, even across chunk boundaries)."""
    from pyspark.sql import Window

    from cartodb_importer_spark.operators.skew import chunked_running_sum

    rows = [
        # user 1: leading NULLs spanning two chunks, then values
        (1, 1, 10, None), (2, 1, 10, None), (3, 1, 20, None),
        (4, 1, 20, 5.0), (5, 1, 30, 2.5), (6, 1, 30, None), (7, 1, 40, 1.0),
        # user 2: all null
        (8, 2, 10, None), (9, 2, 20, None),
        # user 3: single chunk
        (10, 3, 10, 4.0), (11, 3, 10, 6.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, bucket long, value double"
    )
    got = {
        r["event_id"]: r["running_total"]
        for r in chunked_running_sum(
            df, ["user_id"], ["bucket", "event_id"], "value",
            chunk_col=F.col("bucket"),
        ).collect()
    }
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["event_id"]: r["rt"]
        for r in df.select(
            "event_id", F.sum("value").over(w).alias("rt")
        ).collect()
    }
    assert got == want
    assert want[1] is None and got[3] is None  # NULL until first value
    assert got[6] == 7.5  # NULL row inherits the running total, not 0


def test_chunked_running_sum_keeps_null_key_and_null_chunk_rows(spark):
    """ADVICE r09: the phase-3 join must be null-safe — a NULL key column
    or NULL chunk value (e.g. to_date of a NULL ts) is a window PARTITION
    in the single-window form, so the chunked form must keep those rows
    and produce identical running totals, not silently drop them."""
    from pyspark.sql import Window

    from cartodb_importer_spark.operators.skew import chunked_running_sum

    rows = [
        # NULL user key: its own partition in a window
        (1, None, 10, 1.0), (2, None, 20, 2.0), (3, None, 20, 3.0),
        # NULL bucket (-> NULL chunk) sorts first within the key
        (4, 7, None, 5.0), (5, 7, None, 7.0), (6, 7, 10, 11.0),
        # NULL key AND NULL chunk together
        (7, None, None, 0.5),
        # plain rows as control
        (8, 9, 10, 1.5), (9, 9, 20, 2.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, bucket long, value double"
    )
    out = chunked_running_sum(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"),
    )
    assert out.count() == len(rows)  # nothing dropped
    got = {r["event_id"]: r["running_total"] for r in out.collect()}
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["event_id"]: r["rt"]
        for r in df.select(
            "event_id", F.sum("value").over(w).alias("rt")
        ).collect()
    }
    assert got == want
    # the null-safe condition must still plan as an equi-join (sort-merge
    # or shuffled-hash), never a NestedLoop / cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def _window_oracle(df, keys, orders, value):
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(*orders)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return {
        r["event_id"]: r["rt"]
        for r in df.select(
            "event_id", F.sum(value).over(w).alias("rt")
        ).collect()
    }


def test_running_sum_auto_single_window_regime_adds_zero_exchanges(spark):
    """VERDICT r10 item 5: on a uniform corpus the probe picks the plain
    single window, whose physical plan must be EXACTLY the hand-written
    window's — same exchange count, no chunk join. The auto lever must
    cost nothing when skew is absent."""
    from pyspark.sql import Window

    from cartodb_importer_spark.operators.skew import running_sum_auto

    df = (
        spark.range(5000)
        .selectExpr(
            "id AS event_id",
            "id % 50 AS user_id",
            "id % 7 AS bucket",
            "CAST(id % 13 AS double) / 2 AS value",
        )
    )
    auto = running_sum_auto(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"),
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # single-window regime: no chunk join
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    manual = df.withColumn("running_total", F.sum("value").over(w))
    manual_plan = manual._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == manual_plan.count("Exchange")
    got = {r["event_id"]: r["running_total"] for r in auto.collect()}
    assert got == _window_oracle(df, ["user_id"], ["bucket", "event_id"], "value")


def test_running_sum_auto_engages_chunked_on_zipf_skew(spark):
    """On a Zipf(1.5) key distribution with the threshold forced below
    the hot key's count, the probe must pick the chunked decomposition
    (join present in the plan) and the values must still equal the
    single-window oracle row for row."""
    import numpy as np

    from cartodb_importer_spark.operators.skew import running_sum_auto

    rng = np.random.default_rng(7)
    keys = np.minimum(rng.zipf(1.5, 4000), 40)
    rows = [
        (i, int(k), int(i % 11), float((i * 7) % 23) / 4.0)
        for i, k in enumerate(keys)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, bucket long, value double"
    )
    hot = df.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert hot >= 500  # the corpus really is skewed enough to trip it
    auto = running_sum_auto(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"), hot_partition_rows=500,
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan  # chunked branch engaged
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    got = {r["event_id"]: r["running_total"] for r in auto.collect()}
    assert got == _window_oracle(df, ["user_id"], ["bucket", "event_id"], "value")


def test_running_sum_auto_uniform_corpus_forced_chunked_still_equal(spark):
    """Both branches are value-equal on the SAME corpus: forcing the
    chunked branch on the uniform corpus (threshold 1) must reproduce
    the single-window branch's output exactly."""
    from cartodb_importer_spark.operators.skew import running_sum_auto

    df = (
        spark.range(2000)
        .selectExpr(
            "id AS event_id",
            "id % 25 AS user_id",
            "id % 5 AS bucket",
            "CAST(id % 9 AS double) / 4 AS value",
        )
    )
    forced = running_sum_auto(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"), hot_partition_rows=1,
    )
    got = {r["event_id"]: r["running_total"] for r in forced.collect()}
    assert got == _window_oracle(df, ["user_id"], ["bucket", "event_id"], "value")


def test_running_sum_auto_empty_frame(spark):
    from cartodb_importer_spark.operators.skew import running_sum_auto

    df = spark.createDataFrame(
        [], "event_id long, user_id long, bucket long, value double"
    )
    out = running_sum_auto(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"),
    )
    assert out.count() == 0 and "running_total" in out.columns


def test_running_sum_auto_schema_branch_independent(spark):
    """ADVICE r11: an INTEGER value column must yield the same output
    schema from both regimes (double), so a table whose hottest key
    crosses hot_partition_rows between runs never silently changes the
    result type downstream."""
    from pyspark.sql.types import DoubleType

    from cartodb_importer_spark.operators.skew import running_sum_auto

    df = spark.range(500).selectExpr(
        "id AS event_id",
        "id % 10 AS user_id",
        "id % 4 AS bucket",
        "CAST(id % 7 AS long) AS value",  # integer, the ADVICE case
    )
    single = running_sum_auto(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"), hot_partition_rows=10**9,
    )
    chunked = running_sum_auto(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"), hot_partition_rows=1,
    )
    for out in (single, chunked):
        assert isinstance(
            out.schema["running_total"].dataType, DoubleType
        )
    assert sorted(single.columns) == sorted(chunked.columns)
    a = {r["event_id"]: r["running_total"] for r in single.collect()}
    b = {r["event_id"]: r["running_total"] for r in chunked.collect()}
    assert a == b


def test_probe_hot_count_and_hint_skips_probe(spark, monkeypatch):
    """VERDICT r11 item 5 / ADVICE r11: probe_hot_count returns the
    hottest key's row count (0 on empty), and a caller-supplied
    hot_count makes running_sum_auto run ZERO probe jobs — the hint is
    how repeat callers amortize the eager upstream evaluation."""
    from cartodb_importer_spark.operators import skew

    df = spark.createDataFrame(
        [(i, 1 if i < 7 else i, 0, float(i)) for i in range(10)],
        "event_id long, user_id long, bucket long, value double",
    )
    assert skew.probe_hot_count(df, ["user_id"]) == 7
    empty = spark.createDataFrame(
        [], "event_id long, user_id long, bucket long, value double"
    )
    assert skew.probe_hot_count(empty, ["user_id"]) == 0

    def boom(*a, **k):  # the hint must make the probe unreachable
        raise AssertionError("probe ran despite hot_count hint")

    monkeypatch.setattr(skew, "probe_hot_count", boom)
    out = skew.running_sum_auto(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"), hot_count=7,
    )
    got = {r["event_id"]: r["running_total"] for r in out.collect()}
    assert got == _window_oracle(df, ["user_id"], ["bucket", "event_id"], "value")
    # and the hint also steers the branch: a huge hinted count forces
    # the chunked decomposition on this tiny frame
    forced = skew.running_sum_auto(
        df, ["user_id"], ["bucket", "event_id"], "value",
        chunk_col=F.col("bucket"), hot_count=10**9,
    )
    plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan
    got2 = {r["event_id"]: r["running_total"] for r in forced.collect()}
    assert got2 == got
