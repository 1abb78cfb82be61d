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
    No forced broadcast on ``customer`` — it scales linearly with SF, so a
    hard hint would OOM at 100x; AQE picks broadcast-hash while it is
    small and falls back to shuffle join when it is not."""
    t = Tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    joined = (
        t.orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
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
    """TPC-H Q5-style multi-join. Hints only on the bounded dimensions
    (nation=25, region=5); supplier/customer scale with SF, so their join
    strategy is left to AQE — broadcast while small, shuffle at 100x."""
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
        .join(dims, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t.customer.select("c_custkey", "c_nationkey"),
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
        t.lineitem.join(thresholds, "l_partkey")
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
    — conditional aggregation over dimension joins. Only nation (25 rows)
    carries a broadcast hint; supplier scales with SF so AQE decides."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t.supplier.join(
                F.broadcast(t.nation),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ).select("s_suppkey", "n_name"),
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
            t.part.select("p_partkey", "p_type"),
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
        t.lineitem.join(parts, F.col("l_partkey") == F.col("p_partkey"))
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
        t.part, F.col("l_partkey") == F.col("p_partkey")
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


@query(
    "q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_3')
       OR (cn.n_name = 'NATION_3' AND sn.n_name = 'NATION_2')
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bilateral trade volume: revenue flowing between a
    nation pair, per year, in both directions. The same dimension table
    (nation) joins twice under different roles — nation itself (25 rows)
    is hinted; the customer/supplier maps scale with SF so AQE picks their
    strategy. Semantics origin: engine surface (SURVEY §2.3 joins); no
    reference analogue by construction."""
    t = Tables(spark, sf_dir)
    cust_nation = (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .filter(F.col("n_name").isin("NATION_2", "NATION_3"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp_nation = (
        t.supplier.join(
            F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .filter(F.col("n_name").isin("NATION_2", "NATION_3"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    joined = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_nation, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return joined.groupBy(
        "cust_nation", "supp_nation", F.year("o_orderdate").alias("o_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey  = p.p_partkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-line profit by supplier nation and year,
    restricted to parts whose name matches a substring. The part filter is
    applied BEFORE the join so a broadcast hash table, when AQE picks one,
    only carries matching keys — no forced hint, since part scales with SF
    (testdata has no partsupp/supplycost; revenue stands in for profit).
    Engine surface per SURVEY §2.3."""
    t = Tables(spark, sf_dir)
    parts = t.part.filter(F.col("p_name").contains("red")).select("p_partkey")
    supp = t.supplier.join(
        F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    joined = (
        t.lineitem.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return joined.groupBy("nation", F.year("o_orderdate").alias("o_year")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "profit"
        )
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey, sum(l_extendedprice) AS part_value
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, round(part_value, 2) AS part_value
    FROM pv
    WHERE part_value > (SELECT 1.25 * avg(part_value) FROM pv)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important-stock scan: parts whose total traded value
    exceeds a global threshold (1.25x the mean part value — scale-free, so the
    same query is meaningful at sf0.001 and at 100 TB). One shuffle for the
    per-part aggregate; the scalar threshold is a 1-row broadcast, never a
    driver collect (no partsupp in testdata; lineitem value stands in)."""
    t = Tables(spark, sf_dir)
    pv = t.lineitem.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("part_value")
    )
    threshold = pv.agg((1.25 * F.avg("part_value")).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    GROUP BY 1
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count histogram. The join predicate
    carries an extra non-key conjunct on the RIGHT side of a left join —
    rows failing it keep the customer but contribute no order (count=0
    bucket). Two shuffles (join + final tiny regroup); the first groupBy
    reuses the join partitioning on c_custkey."""
    t = Tables(spark, sf_dir)
    per_cust = (
        t.customer.select("c_custkey")
        .join(
            t.orders.select("o_custkey", "o_orderkey", "o_orderpriority"),
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: quarterly revenue per supplier, keep
    the max. The max is computed as an unpartitioned window over the tiny
    per-supplier aggregate (|suppliers| rows, already shuffled) — never a
    driver-side collect. Ties all surface, matching the reference SQL's
    equality semantics. Revenue is rounded BEFORE the equality compare so
    both engines select on identical values."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_rev"
            )
        )
    )
    best = rev.withColumn(
        "max_rev", F.max("total_rev").over(Window.partitionBy())
    ).filter(F.col("total_rev") == F.col("max_rev"))
    return (
        t.supplier.join(best, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3, 4, 5
    HAVING sum(l.l_quantity) > 300
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: group-then-filter (HAVING) over
    the fact join, top-k by price. The per-order quantity rollup happens on
    lineitem ALONE first (smallest possible shuffle payload: two columns),
    then survivors join back to orders/customer — AQE broadcasts the
    survivor set while small; no forced hint, since it scales with SF."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
    )
    return (
        t.orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t.customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    WITH sq AS (
      SELECT l.l_suppkey, sum(l.l_quantity) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE '%blue%'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM sq WHERE qty > (SELECT 1.1 * avg(qty) FROM sq)
    )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style nested-IN: suppliers who moved an above-average
    (1.1x mean — scale-free, so the predicate stays selective from sf0.001
    to 100 TB) quantity of matching parts. The IN-subquery becomes a
    left-semi join against a pre-aggregated qualifying set (AQE-broadcast
    while small — it scales with supplier count, so no forced hint); the
    scalar mean is a 1-row broadcast, not a driver collect."""
    t = Tables(spark, sf_dir)
    blue_parts = t.part.filter(F.col("p_name").contains("blue")).select("p_partkey")
    per_supp = (
        t.lineitem.join(
            blue_parts, F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    threshold = per_supp.agg((1.1 * F.avg("qty")).alias("threshold"))
    qualifying = (
        per_supp.crossJoin(F.broadcast(threshold))
        .filter(F.col("qty") > F.col("threshold"))
        .select("l_suppkey")
    )
    return t.supplier.join(
        qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "semi"
    ).select("s_suppkey", "s_name")


@query(
    "q21_sole_late_supplier",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL '60 days'
    ),
    multi AS (
      SELECT l_orderkey FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      GROUP BY 1 HAVING count(*) > 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late
    JOIN multi ON late.l_orderkey = multi.l_orderkey
    JOIN supplier s ON late.l_suppkey = s.s_suppkey
    WHERE NOT EXISTS (
      SELECT 1 FROM late l2
      WHERE l2.l_orderkey = late.l_orderkey AND l2.l_suppkey <> late.l_suppkey
    )
    GROUP BY 1
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style waiting-supplier hunt: suppliers who were the ONLY
    late shipper on a multi-supplier order. EXISTS maps to a semi join,
    NOT EXISTS to an anti join — both against derived sets partitioned on
    the same l_orderkey key so AQE can chain the shuffles (testdata has no
    commit/receipt dates; late = shipped >60 days after order date)."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_suppkey")
    late = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        li.distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    sole_late = (
        late.join(multi, "l_orderkey", "semi")
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "anti",
        )
    )
    return (
        sole_late.join(
            t.supplier.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q2_cheapest_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             min(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
      FROM cost
    )
    SELECT p.p_partkey, p.p_brand, r.l_suppkey AS s_suppkey,
           r.unit_cost AS unit_cost
    FROM ranked r JOIN part p ON r.l_partkey = p.p_partkey
    WHERE r.unit_cost = r.best_cost AND p.p_size = 15
    """,
)
def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style correlated-min: for each part (of a given size), the
    supplier(s) quoting the lowest observed unit price. The correlated
    MIN subquery is a window-min over the per-(part,supplier) aggregate —
    one shuffle keyed on l_partkey serves both the groupBy and the window
    (no re-partition between them). unit_cost is emitted UNROUNDED: it is
    a min of single IEEE divisions (no accumulation), bitwise identical
    across engines, whereas round(x, 4) at a half-way boundary is not."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    cost = t.lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = cost.withColumn(
        "best_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("best_cost"))
    return (
        best.join(
            t.part.filter(F.col("p_size") == 15).select(
                "p_partkey", "p_brand"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_brand",
            F.col("l_suppkey").alias("s_suppkey"),
            "unit_cost",
        )
    )
