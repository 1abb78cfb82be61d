"""Aggregation surface (SURVEY §2.3). The reference's only aggregate is
count(*) (O19, importer.rb:339); everything else is declared engine surface.
All aggregation is partial+final (map-side combine) by construction — we
declare groupBy/agg and Catalyst plans the two-phase hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Tables, query


@query(
    "agg_basic",
    oracle="""
    SELECT l_returnflag,
           count(*)                      AS n,
           round(sum(l_quantity), 2)     AS sum_qty,
           round(avg(l_extendedprice),4) AS avg_price,
           round(min(l_extendedprice),2) AS min_price,
           round(max(l_extendedprice),2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)  AS n_suppliers,
           count(DISTINCT l_partkey)  AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts — expands to a two-level aggregate in Catalyst
    (expand + partial dedup before the final count), scale-safe."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct("l_partkey").alias("n_parts"),
    )


@query("agg_approx_count_distinct")
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB substitute for exact
    distinct. No oracle: DuckDB's sketch differs; driver checks rows-only."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx")
    )


@query(
    "agg_first_collect",
    oracle="""
    SELECT n.n_regionkey AS regionkey,
           min(n.n_name)                          AS first_nation,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv,
           count(*)                               AS n_nations
    FROM nation n GROUP BY n.n_regionkey
    """,
)
def agg_first_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set made deterministic: sort, then join to a
    csv string (raw collect order is partition-dependent and would never
    hash-match)."""
    t = Tables(spark, sf_dir)
    return t.nation.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.min("n_name").alias("first_nation"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations_csv"
        ),
        F.count(F.lit(1)).alias("n_nations"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS price_stddev,
           round(var_samp(l_quantity), 3)         AS qty_var,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 3).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 4)      AS p25_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles with linear interpolation (Spark `percentile` ==
    DuckDB `quantile_cont`). The approx variant for 100 TB is
    `percentile_approx` (see agg_percentile_approx, rows-only)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
        F.round(F.percentile("l_quantity", 0.25), 4).alias("p25_qty"),
    )


@query("agg_percentile_approx")
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch for scale; no oracle (sketch-dependent)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias(
            "median_price_approx"
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r.r_name, n.n_name, count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollup(): region, region+nation, and grand-total rows in one pass
    (Catalyst Expand, one shuffle)."""
    t = Tables(spark, sf_dir)
    joined = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (the DataFrame API has no direct
    grouping-sets call; spark.sql is the idiomatic route)."""
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_having",
    oracle="""
    SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) > 30
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .filter(F.col("n") > 30)
    )
