"""Flagship analytical queries — the end-to-end slice over the TPC-H-ish
testdata. These exercise scan → filter → join → aggregate → sort paths the
way the 100 TB deployment would: filters pushed to the parquet scan, small
dimensions broadcast, aggregation partial+final via Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Tables, query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Single wide scan, map-side partial
    aggregation, tiny result — the shape Catalyst handles optimally; the
    shipdate filter reaches the parquet scan as a pushed predicate."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(charge), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dimension filter, fact join, top-k.
    ``customer`` is small relative to the facts -> broadcast it so the
    orders/lineitem join is the only shuffle."""
    t = Tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    joined = (
        t.orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_nation_revenue",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join. All dimensions (supplier, nation, region,
    customer) broadcast; the single large shuffle is orders|><|lineitem."""
    t = Tables(spark, sf_dir)
    dims = (
        t.supplier.join(
            F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    joined = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "q_order_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 40
      )
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS subquery as a left-semi join."""
    t = Tables(spark, sf_dir)
    big_items = t.lineitem.filter(F.col("l_quantity") > 40).select("l_orderkey")
    return (
        t.orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        .join(big_items, F.col("o_orderkey") == F.col("l_orderkey"), "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated aggregate: per-part average threshold
    joined back to the fact — the scalar-subquery-per-group pattern as a
    self-join against a pre-aggregated (much smaller, auto-broadcast)
    side."""
    t = Tables(spark, sf_dir)
    thresholds = t.lineitem.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        t.lineitem.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           round(sum(CASE WHEN n.n_name = 'NATION_3'
                     THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: one nation's revenue fraction per year
    — conditional aggregation over a broadcast-dimension join."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                t.supplier.join(
                    F.broadcast(t.nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "n_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(0.0))
            / F.sum(rev),
            6,
        ).alias("mkt_share")
    )


@query(
    "q12_late_shipments",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_late
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL '90 days'
    GROUP BY 1
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: shipping-lateness classification across the fact
    join (interval comparison between tables)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                             THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue percentage (single-month window)."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t.part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#4' AND p.p_size >= 10
    GROUP BY 1, 2
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct suppliers per (brand, type) with negative
    and range predicates on the dimension."""
    t = Tables(spark, sf_dir)
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#4") & (F.col("p_size") >= 10)
    ).select("p_partkey", "p_brand", "p_type")
    return (
        t.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 30)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: OR-of-ANDs predicate spanning both join sides —
    the optimizer must keep the equi-join and evaluate the disjunction as
    a post-join filter."""
    t = Tables(spark, sf_dir)
    j = t.lineitem.join(
        F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey")
    )
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    pred = (
        ((b == "Brand#4") & s.between(1, 15) & q.between(1, 30))
        | ((b == "Brand#19") & s.between(10, 30) & q.between(10, 40))
        | ((b == "Brand#17") & s.between(20, 50) & q.between(20, 50))
    )
    return j.filter(pred).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH cnt AS (
      SELECT c.c_custkey, c.c_acctbal, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT n_orders, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
    FROM cnt
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND n_orders < 8
    GROUP BY 1
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: scalar-subquery threshold + low-activity filter
    (wealthy customers with fewer than 8 orders), grouped by order count."""
    t = Tables(spark, sf_dir)
    avg_bal = (
        t.customer.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("threshold"))
    )
    counts = (
        t.customer.join(
            t.orders.select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        counts.crossJoin(F.broadcast(avg_bal))
        .filter((F.col("c_acctbal") > F.col("threshold")) & (F.col("n_orders") < 8))
        .groupBy("n_orders")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
