"""Sort / limit / set-operation surface (SURVEY §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Tables, query


@query(
    "setop_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def setop_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k. Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver; no global sort
    materializes even at 100 TB."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT c_custkey AS key, c_name AS name FROM customer
    UNION ALL
    SELECT s_suppkey AS key, s_name AS name FROM supplier
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union() = UNION ALL (positional, keeps duplicates) — a no-shuffle
    concatenation of partitions."""
    t = Tables(spark, sf_dir)
    c = t.customer.select(F.col("c_custkey").alias("key"), F.col("c_name").alias("name"))
    s = t.supplier.select(F.col("s_suppkey").alias("key"), F.col("s_name").alias("name"))
    return c.union(s)


@query(
    "setop_union_by_name",
    oracle="""
    SELECT n_nationkey AS key, n_name AS name FROM nation
    UNION ALL
    SELECT r_regionkey AS key, r_name AS name FROM region
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName — column-name-based alignment (the safe union; positional
    union silently misaligns after a schema change)."""
    t = Tables(spark, sf_dir)
    n = t.nation.select(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("name")
    )
    # build the second branch with columns in reversed order on purpose
    r = t.region.select(
        F.col("r_name").alias("name"), F.col("r_regionkey").alias("key")
    )
    return n.unionByName(r)


@query(
    "setop_intersect",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT DISTINCT user_id AS custkey FROM events
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — customers that also appear as event
    users."""
    t = Tables(spark, sf_dir)
    o = t.orders.select(F.col("o_custkey").alias("custkey"))
    e = t.events.select(F.col("user_id").alias("custkey"))
    return o.intersect(e)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT user_id AS custkey FROM events
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (multiplicity-aware)."""
    t = Tables(spark, sf_dir)
    o = t.orders.select(F.col("o_custkey").alias("custkey"))
    e = t.events.select(F.col("user_id").alias("custkey"))
    return o.exceptAll(e)


@query(
    "setop_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def setop_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct() — partial dedup map-side before the shuffle (Catalyst
    plans it as a grouping aggregate)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()


@query(
    "setop_drop_duplicates_subset",
    oracle="""
    SELECT o_custkey, min(o_orderkey) AS o_orderkey
    FROM orders GROUP BY o_custkey
    """,
)
def setop_drop_duplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset dedup done deterministically: dropDuplicates(subset) keeps an
    arbitrary survivor, so the engine's canonical form is groupBy(keys) +
    min — same cost (one shuffle), reproducible output."""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("o_orderkey")
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_suppkey, l_quantity FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey, l_quantity FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (duplicates kept up to the min multiplicity on
    each side) — Catalyst compiles intersectAll to a count-based aggregate +
    generate, one shuffle per side on the full row as key."""
    t = Tables(spark, sf_dir)
    r = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_suppkey", "l_quantity"
    )
    a = t.lineitem.filter(F.col("l_returnflag") == "A").select(
        "l_suppkey", "l_quantity"
    )
    return r.intersectAll(a)
