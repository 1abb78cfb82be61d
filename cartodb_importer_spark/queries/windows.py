"""Window-function surface (SURVEY §2.3). None exist in the reference;
declared engine surface. Every window here partitions before ordering —
an unpartitioned global window would serialize onto one task at scale and
is deliberately absent (global top-k is orderBy+limit in setops.py, which
Spark executes as a distributed TakeOrdered)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import Tables, query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number <= k, the canonical dedup/topk
    window. Tiebreak on o_orderkey keeps it deterministic."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t.orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
    FROM part
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return t.part.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           round(value - COALESCE(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0), 2) AS delta
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event timelines (sessionization building block)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return t.events.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.coalesce(prev, F.lit(0.0)), 2).alias("delta"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id, ts, value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average (rowsBetween frames)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias(
            "moving_avg_3"
        ),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_similar_price
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rangeBetween (value-based frame): how many of the customer's orders
    fall within ±10k of this order's price."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ntile(4) OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice, o_orderkey) AS price_quartile
    FROM orders
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t.orders.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT event_id, user_id, value,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_val,
           last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val
    FROM events
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an explicit unbounded frame (default frames differ
    between engines for last_value — always pin the frame)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t.events.select(
        "event_id",
        "user_id",
        "value",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
    )


@query(
    "window_percent_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist()    OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t.orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "window_cume_dist_nth",
    oracle="""
    SELECT o_orderkey,
           round(cume_dist() OVER w, 6) AS cd,
           round(nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), 2) AS second_lowest_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value. Ordering includes the unique o_orderkey so
    there are no peer rows — cume_dist is then engine-independent. nth_value
    gets an explicit unbounded frame (its default frame stops at the current
    row, which would make rows before the 2nd value NULL)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.round(F.nth_value("o_totalprice", 2).over(wfull), 2).alias(
                "second_lowest_price"
            ),
        )
    )


@query(
    "window_gaps_islands",
    oracle="""
    WITH flagged AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CASE WHEN date_diff('day',
                        lag(o_orderdate) OVER (
                            PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey),
                        o_orderdate) <= 30
                    THEN 0 ELSE 1 END AS new_session
        FROM orders
    ),
    islands AS (
        SELECT o_custkey, o_orderdate,
               sum(new_session) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS island
        FROM flagged
    )
    SELECT o_custkey, CAST(island AS BIGINT) AS island, count(*) AS n_orders,
           min(o_orderdate) AS first_order, max(o_orderdate) AS last_order
    FROM islands GROUP BY o_custkey, island
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization in batch: an order starts a new
    session when >30 days since the customer's previous order; island id =
    running sum of session-start flags. The batch twin of
    session_window(ts, gap) — one shuffle on o_custkey shared by both
    window passes and the final aggregate (same partition key), so Catalyst
    plans a single exchange."""
    t = Tables(spark, sf_dir)
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap_days = F.datediff("o_orderdate", F.lag("o_orderdate").over(wo))
    flagged = t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(gap_days <= 30, F.lit(0)).otherwise(F.lit(1)).alias("new_session"),
    )
    islands = flagged.select(
        "o_custkey",
        "o_orderdate",
        F.sum("new_session").over(wo).alias("island"),
    )
    return islands.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
                 4) AS med10
    FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over the trailing 10 readings per user — the
    robust-smoothing counterpart of a moving average (noise/outlier
    tolerant trend for sensor streams). Spark evaluates percentile() as a
    true window aggregate over the row frame; one shuffle on user_id,
    frames never exceed 10 rows so memory is O(frame), not O(partition).
    Ordering ties broken by event_id for cross-engine determinism."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 4).alias("med10"),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100
             AS revenue,
           floor(l_extendedprice * (1 - l_discount)
                 / sum(l_extendedprice * (1 - l_discount))
                     OVER (PARTITION BY l_orderkey)
                 * 10000 + 0.5) / 10000 AS order_share
    FROM lineitem
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ratio_to_report: each line's share of its order's total revenue —
    the part-to-whole window (Oracle's RATIO_TO_REPORT, one
    whole-partition sum frame). Single shuffle on the partition key;
    the share rounds via the engine-portable floor formulation."""
    t = Tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    w = Window.partitionBy("l_orderkey")
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(rev * 100 + 0.5) / 100).alias("revenue"),
        (F.floor(rev / F.sum(rev).over(w) * 10000 + 0.5) / 10000).alias(
            "order_share"
        ),
    )


@query(
    "window_drawdown",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
      FROM events
    )
    SELECT event_id, user_id, value, peak,
           floor((peak - value) / peak * 10000 + 0.5) / 10000 AS drawdown
    FROM r
    """,
)
def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown per user: each reading against the maximum
    seen so far in its own series — the financial risk metric (and a
    general high-water-mark monitor). One running-max frame over the
    (user_id, time) sort; max() over a growing frame is O(1) per row, so
    the operator streams. peak is an exact max (no fp accumulation);
    only the ratio needs the portable rounding."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max("value").over(w)
    return t.events.select(
        "event_id",
        "user_id",
        "value",
        peak.alias("peak"),
        (F.floor((peak - F.col("value")) / peak * 10000 + 0.5) / 10000).alias(
            "drawdown"
        ),
    )


@query(
    "window_distinct_count",
    oracle="""
    WITH firsts AS (
      SELECT o_orderpriority, o_orderdate,
             CASE WHEN row_number() OVER (
                      PARTITION BY o_orderpriority, o_custkey
                      ORDER BY o_orderdate, o_orderkey) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM orders
    ), daily AS (
      SELECT o_orderpriority, o_orderdate,
             CAST(sum(is_first) AS BIGINT) AS new_customers
      FROM firsts GROUP BY 1, 2
    )
    SELECT o_orderpriority, o_orderdate, new_customers,
           CAST(sum(new_customers) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderdate
           ) AS BIGINT) AS distinct_customers_to_date
    FROM daily
    """,
)
def window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — an operator Spark
    (and most engines) lack natively. Re-expressed as first-occurrence
    flags: row_number()==1 marks each customer's first order within a
    priority, a keyed aggregation collapses flags per day, and a plain
    running SUM over days equals the running distinct count. Two window
    sorts + one keyed shuffle, all on (priority, custkey/date) — no
    per-row distinct state, so it scales like any other window."""
    t = Tables(spark, sf_dir)
    w_first = Window.partitionBy("o_orderpriority", "o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    firsts = t.orders.select(
        "o_orderpriority",
        "o_orderdate",
        (F.row_number().over(w_first) == 1).cast("int").alias("is_first"),
    )
    daily = firsts.groupBy("o_orderpriority", "o_orderdate").agg(
        F.sum("is_first").alias("new_customers")
    )
    w_run = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "o_orderdate",
        "new_customers",
        F.sum("new_customers").over(w_run).alias(
            "distinct_customers_to_date"
        ),
    )


@query(
    "window_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             sum(CASE WHEN event_type = 'view' THEN value END)     AS v_view,
             sum(CASE WHEN event_type = 'purchase' THEN value END) AS v_buy
      FROM events GROUP BY 1
    )
    SELECT day,
           floor(corr(v_view, v_buy) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) * 10000 + 0.5) / 10000 AS corr7
    FROM daily
    """,
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson correlation between daily view value and
    daily purchase value — the co-movement diagnostic over a compact
    pre-aggregated series. The expensive part (events -> daily) is one
    keyed aggregate; the window then runs over ~#days rows, so the
    single-partition ordering is bounded by construction (this is the
    legitimate use of a global window: AFTER the reduction, not over
    raw events)."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", F.col("value"))).alias(
            "v_view"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
        ).alias("v_buy"),
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        (
            F.floor(F.corr("v_view", "v_buy").over(w) * 10000 + 0.5) / 10000
        ).alias("corr7"),
    )


@query(
    "window_longest_streak",
    oracle="""
    WITH presence AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), flagged AS (
      SELECT user_id, day,
             CASE WHEN date_diff('day',
                    lag(day) OVER (PARTITION BY user_id ORDER BY day), day) = 1
                  THEN 0 ELSE 1 END AS new_streak
      FROM presence
    ), islands AS (
      SELECT user_id, day,
             sum(new_streak) OVER (PARTITION BY user_id ORDER BY day)
               AS streak_id
      FROM flagged
    ), lengths AS (
      SELECT user_id, streak_id, count(*) AS len
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak_days
    FROM lengths GROUP BY 1
    """,
)
def window_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user — gaps-and-
    islands applied to the (user, day) presence table: a day starts a
    new streak unless it's exactly 1 after the previous active day, the
    running flag-sum labels streaks, and two keyed aggregates collapse
    to the max length. Everything after the initial distinct runs on
    the reduced presence table."""
    t = Tables(spark, sf_dir)
    presence = t.events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    flagged = presence.select(
        "user_id",
        "day",
        F.when(
            F.datediff(F.col("day"), F.lag("day").over(w)) == 1, 0
        ).otherwise(1).alias("new_streak"),
    )
    islands = flagged.select(
        "user_id",
        F.sum("new_streak")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("streak_id"),
    )
    lengths = islands.groupBy("user_id", "streak_id").agg(
        F.count(F.lit(1)).alias("len")
    )
    return lengths.groupBy("user_id").agg(
        F.max("len").alias("longest_streak_days")
    )


@query(
    "window_running_sum_chunked",
    oracle="""
    SELECT event_id, user_id, ts, value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM events
    """,
)
def window_running_sum_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-partition-safe running total — the SAME semantics as
    window_running_sum's running_total (the oracle IS the plain single
    window), computed with operators/skew.py chunked_running_sum: intra-day
    prefix sums partitioned by (user, day), then per-day offsets over the
    tiny (user, day) totals relation. Per-task work is bounded by one
    user-DAY, not one user's whole history — the decomposition a 100 TB
    corpus needs when a power-law key outgrows a task (r09 skew
    rehearsal; the flagship query keeps the single window because heat up
    to h=0.5 measured benign at local scale)."""
    from ..operators.skew import chunked_running_sum

    t = Tables(spark, sf_dir)
    out = chunked_running_sum(
        t.events,
        ["user_id"],
        ["ts", "event_id"],
        "value",
        chunk_col=F.to_date("ts"),
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round("running_total", 2).alias("running_total"),
    )


#: memoized running_sum_auto probe per (table path, key) — the probe is an
#: eager driver-side job (+15.2% on this query, measured a04d2c8), and a
#: static parquet table's hottest-key count cannot change within a session,
#: so the second invocation over the same table skips it (VERDICT r11
#: item 5). Keyed on the sf_dir path, NOT the DataFrame (object identity
#: is fresh per invocation).
_AUTO_HOT_COUNTS: dict[tuple[str, str], int] = {}


@query(
    "window_running_sum_auto",
    oracle="""
    SELECT event_id, user_id, ts, value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM events
    """,
)
def window_running_sum_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-selecting running total (VERDICT r10 item 5): probes the
    hottest user's row count and picks the single window below the
    measured chunked crossover (operators/skew.HOT_PARTITION_ROWS, from
    the r10 SCALE.md bracket) or the chunked decomposition above it. At
    every test SF the probe picks the single window, so this entry's
    plan is exactly window_running_sum's — the auto lever must cost
    nothing when skew is absent (plan-audit-pinned); the chunked branch
    is oracled under a forced threshold in tests/test_properties.py.
    The probe result is memoized per (sf_dir, key) within the session —
    re-invocations over the same static table pay only the window itself
    (VERDICT r11 item 5; second-invocation overhead re-measured in
    SCALE.md r12)."""
    from ..operators.skew import probe_hot_count, running_sum_auto

    t = Tables(spark, sf_dir)
    memo_key = (sf_dir, "user_id")
    hot = _AUTO_HOT_COUNTS.get(memo_key)
    if hot is None:
        hot = probe_hot_count(t.events, ["user_id"])
        _AUTO_HOT_COUNTS[memo_key] = hot
    out = running_sum_auto(
        t.events,
        ["user_id"],
        ["ts", "event_id"],
        "value",
        chunk_col=F.to_date("ts"),
        hot_count=hot,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round("running_total", 2).alias("running_total"),
    )
