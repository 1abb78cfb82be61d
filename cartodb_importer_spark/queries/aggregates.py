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


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
           CAST(1 AS INT) AS within_bounds
    FROM lineitem GROUP BY 1
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB substitute for exact
    distinct. DuckDB's HLL differs, so the sketch VALUE can't be
    oracled; the error CONTRACT can: the query emits the exact count
    plus a flag asserting the estimate landed within 3x the configured
    rsd of it (P(outside) < 1e-3 per group for a correct HLL++), and the
    oracle pins the flag to 1 — a real cross-engine check that the
    sketch machinery works, not just that rows came back."""
    t = Tables(spark, sf_dir)
    per = t.lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("est"),
        F.count_distinct("l_partkey").alias("n_parts_exact"),
    )
    return per.select(
        "l_returnflag",
        "n_parts_exact",
        (
            (
                F.abs(F.col("est") - F.col("n_parts_exact"))
                / F.col("n_parts_exact")
            )
            <= 0.06
        ).cast("int").alias("within_bounds"),
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


@query(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.45) * 100 + 0.5) / 100
             AS p45_exact,
           floor(quantile_cont(l_extendedprice, 0.55) * 100 + 0.5) / 100
             AS p55_exact,
           CAST(1 AS INT) AS within_bounds
    FROM lineitem GROUP BY 1
    """,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (Greenwald-Khanna) — the sketch value
    is engine-specific, but its rank-error contract is checkable: with
    accuracy=10000 the approximate median must land between the exact
    45th and 55th percentiles (rank error 1/accuracy << 0.05). The
    query emits the exact bracket plus the containment flag; the oracle
    pins the flag."""
    t = Tables(spark, sf_dir)
    per = t.lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("est"),
        F.percentile("l_extendedprice", 0.45).alias("p45"),
        F.percentile("l_extendedprice", 0.55).alias("p55"),
    )
    return per.select(
        "l_returnflag",
        (F.floor(F.col("p45") * 100 + 0.5) / 100).alias("p45_exact"),
        (F.floor(F.col("p55") * 100 + 0.5) / 100).alias("p55_exact"),
        (
            (F.col("est") >= F.col("p45")) & (F.col("est") <= F.col("p55"))
        ).cast("int").alias("within_bounds"),
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


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate <  TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg — every predicate pushes to the parquet
    scan; the canonical scan-bound query."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top customers by returned-item revenue."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "nation")
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT l_returnflag,
           arg_max(l_orderkey, l_extendedprice) AS priciest_order,
           arg_min(l_orderkey, l_extendedprice) AS cheapest_order
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) — pick the id of the extreme row
    without a self-join or window. NB: relies on extendedprice being unique
    per group for determinism (true in this data)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", "l_extendedprice").alias("priciest_order"),
        F.min_by("l_orderkey", "l_extendedprice").alias("cheapest_order"),
    )


@query(
    "agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_totalprice > 400000)  AS any_over_400k,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
    FROM orders GROUP BY 1
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and/bool_or (every/any) + FILTER-style conditional count."""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    SELECT l_returnflag,
           round(skewness(l_extendedprice), 3) AS price_skew,
           round(kurtosis(l_extendedprice), 3) AS price_kurt
    FROM lineitem GROUP BY 1
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates (distribution-shape profiling)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_extendedprice"), 3).alias("price_skew"),
        F.round(F.kurtosis("l_extendedprice"), 3).alias("price_kurt"),
    )


@query(
    "agg_outlier_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 4) AS zscore,
           abs(e.value - s.mu) > 2 * s.sigma    AS is_outlier
    FROM events e JOIN stats s ON e.event_type = s.event_type
    """,
)
def agg_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging — the numeric quality filter.
    Group stats computed once and broadcast back (two-pass; the windowed
    one-pass variant costs a sort, this costs a tiny join)."""
    t = Tables(spark, sf_dir)
    stats = t.events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        t.events.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias(
                "zscore"
            ),
            (F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma")).alias(
                "is_outlier"
            ),
        )
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS INTEGER) AS bin,
           count(*) AS n,
           round(min(o_totalprice), 2) AS bin_min,
           round(max(o_totalprice), 2) AS bin_max
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning (floor division — portable, no
    width_bucket dependency); one aggregate pass."""
    t = Tables(spark, sf_dir)
    bin_col = F.floor(F.col("o_totalprice") / 50000).cast("int")
    return t.orders.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("bin_min"),
        F.round(F.max("o_totalprice"), 2).alias("bin_max"),
    )


@query(
    "agg_mode_median",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_quantity, count(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    m AS (
        SELECT l_returnflag, l_quantity AS mode_qty
        FROM c
        QUALIFY row_number() OVER (
            PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity ASC
        ) = 1
    ),
    med AS (
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 3) AS median_qty
        FROM lineitem GROUP BY 1
    )
    SELECT m.l_returnflag, m.mode_qty, med.median_qty
    FROM m JOIN med USING (l_returnflag)
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode + interpolated median. Built-in ``mode()`` breaks
    ties arbitrarily (engine-dependent), so the mode is computed as
    count-per-value then ``max_by`` over a (count, -value) struct — largest
    count, smallest value on ties — which hash-matches any engine. Two
    aggregates + a 3-row join; both shuffles are on the tiny group key."""
    t = Tables(spark, sf_dir)
    counts = t.lineitem.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    modes = counts.groupBy("l_returnflag").agg(
        F.max_by(
            "l_quantity", F.struct(F.col("cnt"), (-F.col("l_quantity")).alias("neg"))
        ).alias("mode_qty")
    )
    med = t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 3).alias("median_qty")
    )
    return modes.join(med, "l_returnflag")


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 2)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 4)        AS r2,
           regr_count(l_extendedprice, l_quantity)               AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in least-squares aggregates (price ~ quantity per flag) — one
    partial+final hash aggregate, no driver math."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 2).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@query(
    "agg_count_if",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           count(*) FILTER (WHERE l_tax = 0)         AS n_taxfree,
           round(avg(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4)
               AS avg_discounted_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: ``count_if`` and the filtered-avg idiom
    (``avg(when(cond, x))`` — nulls are skipped, exactly SQL's FILTER
    clause). One pass, no pre-filtering subqueries."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_tax") == 0).alias("n_taxfree"),
        F.round(
            F.avg(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 4
        ).alias("avg_discounted_price"),
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_linenumber) AS BIGINT) AS and_ln,
           CAST(bit_or(l_linenumber)  AS BIGINT) AS or_ln,
           CAST(bit_xor(l_linenumber) AS BIGINT) AS xor_ln
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — associative+commutative, so Catalyst
    runs them map-side partial first; cast to long so the schema matches
    DuckDB's width."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").cast("long").alias("and_ln"),
        F.bit_or("l_linenumber").cast("long").alias("or_ln"),
        F.bit_xor("l_linenumber").cast("long").alias("xor_ln"),
    )


@query(
    "agg_incremental_rollup",
    oracle="""
    SELECT date_trunc('month', l_shipdate) AS month,
           round(sum(l_quantity), 2)       AS sum_qty,
           count(*)                        AS n,
           round(sum(l_extendedprice) / count(*), 4) AS avg_price
    FROM lineitem GROUP BY 1
    """,
)
def agg_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup merge: daily PARTIAL aggregates (sum, count
    — the mergeable state, not avg) are re-aggregated to monthly without
    rescanning the base table. At 100 TB the daily partials are a persisted
    rollup table ~1e4× smaller than the source; the monthly merge touches
    only them. avg is derived at the end as sum/count — averaging averages
    would be wrong under unequal day sizes."""
    t = Tables(spark, sf_dir)
    daily = t.lineitem.groupBy(
        F.date_trunc("day", "l_shipdate").alias("day")
    ).agg(
        F.sum("l_quantity").alias("p_qty"),
        F.sum("l_extendedprice").alias("p_price"),
        F.count(F.lit(1)).alias("p_n"),
    )
    return daily.groupBy(F.date_trunc("month", "day").alias("month")).agg(
        F.round(F.sum("p_qty"), 2).alias("sum_qty"),
        F.sum("p_n").alias("n"),
        F.round(F.sum("p_price") / F.sum("p_n"), 4).alias("avg_price"),
    )


@query(
    "agg_equidepth_bins",
    oracle="""
    WITH bounds AS (
      SELECT quantile_cont(l_extendedprice,
                           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           len(list_filter(bs, b -> b <= l_extendedprice)) AS bucket
    FROM lineitem, bounds
    """,
)
def agg_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) feature binning against GLOBAL quantiles — the
    discretization pass before histogram features / monotonic-bucket
    encodings. The nine bounds come from one exact-percentile aggregate
    (single reduce to one row), re-enter as a broadcast, and each row's
    bucket is a count of bounds at-or-below its value — no per-row join,
    no sort of the full table, scales as one scan + one 9-double
    broadcast. Both engines interpolate linearly, and non-integral
    quantile indices interpolate strictly between data values, so the
    <= comparison is stable cross-engine."""
    t = Tables(spark, sf_dir)
    bounds = t.lineitem.agg(
        F.percentile(
            "l_extendedprice",
            F.array(*[F.lit(i / 10.0) for i in range(1, 10)]),
        ).alias("bs")
    )
    return (
        t.lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .crossJoin(F.broadcast(bounds))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.size(
                F.filter("bs", lambda b: b <= F.col("l_extendedprice"))
            ).cast("long").alias("bucket"),
        )
    )


@query(
    "agg_mad",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, median(l_extendedprice) AS med
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           floor(max(m.med) * 100 + 0.5) / 100 AS med_price,
           floor(median(abs(l.l_extendedprice - m.med)) * 100 + 0.5) / 100
             AS mad_price
    FROM lineitem l JOIN med m USING (l_returnflag)
    GROUP BY 1
    """,
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion stat
    (outlier-immune, unlike stddev). Two exact-percentile passes: group
    medians (3 rows) broadcast back onto the fact scan, then the median
    of absolute deviations. At 100 TB swap exact percentile for
    percentile_approx: same two-phase shape, bounded sketch memory."""
    t = Tables(spark, sf_dir)
    med = t.lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med")
    )
    joined = t.lineitem.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(med), "l_returnflag"
    )
    return joined.groupBy("l_returnflag").agg(
        (F.floor(F.max("med") * 100 + 0.5) / 100).alias("med_price"),
        (
            F.floor(
                F.expr("percentile(abs(l_extendedprice - med), 0.5)") * 100
                + 0.5
            )
            / 100
        ).alias("mad_price"),
    )


@query(
    "agg_log_histogram",
    oracle="""
    SELECT CAST(floor(log2(l_extendedprice)) AS INT) AS bucket,
           count(*)             AS n,
           min(l_extendedprice) AS lo,
           max(l_extendedprice) AS hi
    FROM lineitem
    WHERE l_extendedprice > 0
    GROUP BY 1
    """,
)
def agg_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential (log2-bucket) histogram of prices — the
    OpenTelemetry/DDSketch-style value-distribution summary whose bucket
    count is O(log range) regardless of data volume. Pure map-side
    bucketing + one tiny-key aggregate; min/max are exact raw doubles
    (no arithmetic), so the oracle matches bitwise without rounding."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_extendedprice") > 0)
        .groupBy(
            F.floor(F.log2("l_extendedprice")).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


@query(
    "agg_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS p05,
             quantile_cont(l_extendedprice, 0.95) AS p95
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           count(*) AS n,
           floor(b.p05 * 100 + 0.5) / 100 AS p05,
           floor(b.p95 * 100 + 0.5) / 100 AS p95,
           floor(avg(least(greatest(l.l_extendedprice, b.p05), b.p95))
                 * 100 + 0.5) / 100 AS wins_mean,
           floor(stddev_samp(least(greatest(l.l_extendedprice, b.p05), b.p95))
                 * 100 + 0.5) / 100 AS wins_std
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY 1, b.p05, b.p95
    """,
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/stddev per group: values clamped to the group's
    [p05, p95] before the moments — the outlier-robust summary that,
    unlike trimming, keeps row counts intact. Same two-phase broadcast
    shape as agg_mad: tiny per-group bounds (3 rows) broadcast onto the
    fact scan, so the fact table is read twice but shuffled only as
    3-key partial aggregates. At 100 TB swap the exact percentile for
    percentile_approx — identical downstream plan."""
    t = Tables(spark, sf_dir)
    bounds = t.lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("p05"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    clamped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")
    )
    joined = t.lineitem.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(bounds), "l_returnflag"
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.floor(F.max("p05") * 100 + 0.5) / 100).alias("p05"),
        (F.floor(F.max("p95") * 100 + 0.5) / 100).alias("p95"),
        (F.floor(F.avg(clamped) * 100 + 0.5) / 100).alias("wins_mean"),
        (F.floor(F.stddev_samp(clamped) * 100 + 0.5) / 100).alias("wins_std"),
    )


@query(
    "agg_struct_json_collect",
    oracle="""
    SELECT user_id,
           to_json(list_sort(list({'k': event_type, 'n': n})))
             AS type_counts_json
    FROM (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ) GROUP BY user_id
    """,
)
def agg_struct_json_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect a per-group struct list into deterministic JSON — the
    'aggregate to a document' shape (feature maps, API payloads). The
    struct list sorts before serialization so collect order (partition-
    dependent) can never leak into the value; counts go through BIGINT
    on both engines for identical JSON number rendering."""
    t = Tables(spark, sf_dir)
    per_type = t.events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_type.groupBy("user_id").agg(
        F.to_json(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("event_type").alias("k"), F.col("n").alias("n")
                    )
                )
            )
        ).alias("type_counts_json")
    )


@query(
    "agg_decile_lift",
    oracle="""
    WITH scored AS (
      SELECT value AS score,
             CAST(event_type = 'purchase' AS INT) AS label
      FROM events
    ), ranked AS (
      SELECT score, label,
             ntile(10) OVER (ORDER BY score DESC, label) AS decile
      FROM scored
    ), per AS (
      SELECT decile,
             CAST(count(*) AS BIGINT)   AS n,
             CAST(sum(label) AS BIGINT) AS positives
      FROM ranked GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(positives) AS BIGINT) AS all_pos,
             CAST(sum(n) AS BIGINT)         AS all_n
      FROM per
    )
    SELECT decile, n, positives,
           floor(CAST(sum(positives) OVER (ORDER BY decile
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / all_pos * 10000 + 0.5) / 10000 AS cum_capture,
           floor((CAST(positives AS DOUBLE) / n)
                 / (CAST(all_pos AS DOUBLE) / all_n) * 10000 + 0.5) / 10000
             AS lift
    FROM per CROSS JOIN tot
    """,
)
def agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table — the model-evaluation staple: rows
    ranked by score (here: value as a stand-in model score, purchase as
    the positive label), cut into deciles, each decile reporting its
    positive count, cumulative capture rate, and lift over the base
    rate. ntile needs one global sort of (score, label) PAIRS — two
    doubles, not raw rows; the rollup that follows is 10 groups. The
    1-row totals frame broadcasts (allowlisted scalar pattern)."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    scored = t.events.select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    ranked = scored.select(
        "label",
        F.ntile(10)
        .over(W.orderBy(F.col("score").desc(), F.col("label")))
        .alias("decile"),
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("positives")
    )
    tot = per.agg(
        F.sum("positives").alias("all_pos"), F.sum("n").alias("all_n")
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "positives",
            (
                F.floor(
                    F.sum("positives").over(wc).cast("double")
                    / F.col("all_pos")
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("cum_capture"),
            (
                F.floor(
                    (F.col("positives").cast("double") / F.col("n"))
                    / (F.col("all_pos").cast("double") / F.col("all_n"))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("lift"),
        )
    )


@query(
    "agg_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           floor((revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month) * 10000 + 0.5) / 10000
             AS mom_growth
    FROM monthly
    """,
)
def agg_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the period-over-period BI
    staple. The heavy reduction (orders -> months) is one keyed
    aggregate; the lag window then runs over ~#months rows, the
    legitimate post-reduction global window (same rationale as
    window_rolling_corr)."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    monthly = t.orders.groupBy(
        F.date_format(
            F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
        ).alias("month")
    ).agg(
        (F.floor(F.sum("o_totalprice") * 100 + 0.5) / 100).alias("revenue")
    )
    prev = F.lag("revenue").over(W.orderBy("month"))
    return monthly.select(
        "month",
        "revenue",
        (
            F.floor((F.col("revenue") - prev) / prev * 10000 + 0.5) / 10000
        ).alias("mom_growth"),
    )


@query(
    "agg_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS revenue
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT l_partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, l_partkey)
               / sum(revenue) OVER () AS cum_share
      FROM rev
    )
    SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           floor(sum(revenue) * 100 + 0.5) / 100 AS class_revenue
    FROM ranked GROUP BY 1
    """,
)
def agg_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, classified
    by cumulative revenue share (A: first 80%, B: to 95%, C: tail).
    The reduction (lineitem -> per-part revenue) is the heavy keyed
    aggregate; the ranking window then runs over the part dimension
    only. Deterministic ordering (revenue DESC, partkey); the grand
    total via an unbounded window on the reduced frame."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    rev = t.lineitem.groupBy("l_partkey").agg(
        (F.floor(F.sum("l_extendedprice") * 100 + 0.5) / 100).alias(
            "revenue"
        )
    )
    w_cum = (
        W.orderBy(F.col("revenue").desc(), "l_partkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = rev.select(
        "revenue",
        (
            F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_all)
        ).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.floor(F.sum("revenue") * 100 + 0.5) / 100).alias(
            "class_revenue"
        ),
    )


@query(
    "agg_share_of_parent",
    oracle="""
    WITH leaf AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           floor(revenue * 100 + 0.5) / 100 AS revenue,
           floor(revenue / sum(revenue) OVER (PARTITION BY region)
                 * 1e6 + 0.5) / 1e6 AS share_of_region,
           floor(sum(revenue) OVER (PARTITION BY region)
                 / sum(revenue) OVER () * 1e6 + 0.5) / 1e6
             AS region_share_of_total
    FROM leaf
    """,
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical contribution analysis: nation revenue with its share
    of the region subtotal AND the region's share of the grand total —
    the drill-path ratio-to-parent metric OLAP cubes emit next to every
    rollup level. The fact table reduces FIRST (one keyed aggregate to
    region x nation, ~125 rows), then both parent shares are windows
    over the tiny reduced frame — the unbounded-partition windows never
    see raw data, so the 'share of total' global window costs nothing
    at any scale. Dims broadcast onto the orders scan; shares round on
    the 1e-6 grid."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    leaf = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return leaf.select(
        "region",
        "nation",
        (F.floor(F.col("rev") * 100 + F.lit(0.5)) / 100).alias("revenue"),
        (
            F.floor(
                F.col("rev") / F.sum("rev").over(w_region) * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("share_of_region"),
        (
            F.floor(
                F.sum("rev").over(w_region)
                / F.sum("rev").over(w_all)
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("region_share_of_total"),
    )


@query(
    "agg_chi2_independence",
    oracle="""
    WITH o AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c, count(*) AS n
      FROM orders GROUP BY 1, 2
    ), rt AS (SELECT r, sum(n) AS rn FROM o GROUP BY 1),
    ct AS (SELECT c, sum(n) AS cn FROM o GROUP BY 1),
    tot AS (SELECT sum(n) AS total FROM o)
    SELECT floor(sum(power(o.n - rt.rn * ct.cn / tot.total, 2)
                     / (rt.rn * ct.cn / tot.total)) * 1e4 + 0.5) / 1e4
             AS chi2,
           CAST((count(DISTINCT o.r) - 1)
                * (count(DISTINCT o.c) - 1) AS BIGINT) AS dof,
           CAST(max(tot.total) AS BIGINT) AS n_obs
    FROM o JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tot
    """,
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared test of independence between order priority
    and order status — the categorical association screen (the t-test's
    sibling for two discrete columns). The contingency table reduces
    first (one keyed aggregate, rows x cols cells), marginals and the
    grand total derive from the TINY cell table, and the statistic folds
    in one pass over cells — the raw table is scanned exactly once
    regardless of scale. Expected counts stay exact rationals until the
    final grid-round (1e-4); dof = (r-1)(c-1) rides along so a consumer
    can look up the p-value."""
    t = Tables(spark, sf_dir)
    o = t.orders.groupBy(
        F.col("o_orderpriority").alias("r"),
        F.col("o_orderstatus").alias("c"),
    ).agg(F.count(F.lit(1)).alias("n"))
    rt = o.groupBy("r").agg(F.sum("n").alias("rn"))
    ct = o.groupBy("c").agg(F.sum("n").alias("cn"))
    tot = o.agg(F.sum("n").alias("total"))
    e = F.col("rn") * F.col("cn") / F.col("total")
    return (
        o.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(tot))
        .agg(
            (
                F.floor(
                    F.sum(F.pow(F.col("n") - e, F.lit(2.0)) / e) * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("chi2"),
            (
                (F.count_distinct(F.col("r")) - 1)
                * (F.count_distinct(F.col("c")) - 1)
            ).cast("bigint").alias("dof"),
            F.max("total").cast("bigint").alias("n_obs"),
        )
    )


@query(
    "agg_frequent_pairs",
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             a.l_orderkey
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT item_a, item_b,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS support
    FROM pairs
    GROUP BY 1, 2
    HAVING count(DISTINCT l_orderkey) >= 2
    """,
)
def agg_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent item pairs (market-basket co-occurrence, the candidate
    generation step of Apriori/FP-growth): pairs of parts bought together
    in >= 2 distinct orders. The self-join is keyed on l_orderkey, so the
    expansion is sum(k_o^2) over per-order basket sizes k_o — TPC-H
    baskets are <= 7 items, so the blow-up is a bounded constant per
    order, never quadratic in table size; the pair aggregation is one
    keyed shuffle with map-side partial distinct. At 100 TB the same
    plan holds because basket size is a domain constant; degenerate
    mega-baskets (one order with 10^5 items) would be capped or salted
    before the self-join — the LSH bucket-cap guard in llm/dedup.py is
    the template."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    # ONE groupBy + basket-local double explode instead of the keyed
    # self-join (r12, the _copurchase_pairs transformation — guide §2.4):
    # the join shuffled lineitem twice and re-probed it; collect_set
    # shuffles it once and emits each order's unordered pairs in place.
    # Support counts stay identical: the SET dedupes a basket's repeated
    # parts, so one count per (pair, order) — exactly the join form's
    # count(DISTINCT l_orderkey). The per-order expansion bound is
    # unchanged (sum of basket-size^2, a domain constant for TPC-H).
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("items")
    )
    pairs = baskets.select(
        F.explode("items").alias("item_a"), F.col("items")
    ).select(
        "item_a",
        F.explode(
            F.filter("items", lambda x: x > F.col("item_a"))
        ).alias("item_b"),
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
    )
