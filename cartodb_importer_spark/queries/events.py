"""Event-analytics operators over the ``events`` table: funnel conversion,
cohort retention, OHLC candlesticks, and time-weighted averages — the
query surface a product-analytics / hypertable deployment of the reference
would run after importing event streams (the reference itself stops at
import; these extend §2.3-S batch analytics).

Scale notes: every query here shuffles once on its natural key
(``user_id`` or the time bucket) and aggregates map-side first; none
collect to the driver. At 100 TB the funnel's three stage-joins reuse the
same ``user_id`` hash partitioning, so AQE coalesces them into one
exchange per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import Tables, query


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    )
    SELECT '1_view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT '2_click', count(*) FROM c
    UNION ALL SELECT '3_purchase', count(*) FROM p
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user advances a stage
    only with an event STRICTLY AFTER their previous-stage entry time.
    Three per-user min-aggregates chained by joins — all keyed on
    user_id, so the plan is one shuffle partitioning reused across
    stages (no cartesian, no window over the full table)."""
    t = Tables(spark, sf_dir)
    e = t.events.select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.lit("1_view").alias("stage"), F.count("*").alias("n_users"))
        .unionAll(
            c.agg(F.lit("2_click").alias("stage"), F.count("*").alias("n_users"))
        )
        .unionAll(
            p.agg(
                F.lit("3_purchase").alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
    )


@query(
    "events_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY 1
    )
    SELECT CAST(f.cohort_date AS VARCHAR) AS cohort_date,
           date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first_day f USING (user_id)
    WHERE date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) IN (0, 1, 7, 14)
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity date, counted
    again at day offsets 0/1/7/14. One user_id shuffle to find cohorts,
    broadcast back (cohort table is |users|, small relative to events),
    then a single groupBy on (cohort, offset)."""
    t = Tables(spark, sf_dir)
    e = t.events.select("user_id", F.to_date("ts").alias("d"))
    first_day = e.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    joined = e.join(first_day, "user_id").withColumn(
        "day_offset", F.datediff("d", "cohort_date").cast("long")
    )
    return (
        joined.filter(F.col("day_offset").isin(0, 1, 7, 14))
        .groupBy(F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"), "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "events_ohlc",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           event_type,
           round(arg_min(value, event_id), 2) AS open,
           round(max(value), 2)               AS high,
           round(min(value), 2)               AS low,
           round(arg_max(value, event_id), 2) AS close,
           round(sum(value), 2)               AS volume,
           count(*)                           AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlesticks per event_type — the hypertable
    ``first/last`` aggregate pattern. Orders by event_id (unique,
    time-monotone in the generator) rather than ts so open/close are
    deterministic under value ties; min_by/max_by are single-pass
    map-side-combinable aggregates, no window, no sort."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        ).agg(
            F.round(F.min_by("value", "event_id"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", "event_id"), 2).alias("close"),
            F.round(F.sum("value"), 2).alias("volume"),
            F.count("*").alias("n"),
        )
    )


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) - ts)
               AS dur
      FROM events
    )
    SELECT user_id,
           round(sum(value * dur) / sum(dur), 4) AS twa
    FROM seg
    WHERE dur IS NOT NULL
    GROUP BY 1
    HAVING sum(dur) > 0
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user: each reading is held
    until the next one (step interpolation), weighted by the hold
    duration — the TimescaleDB ``time_weight('LOCF')`` semantics. One
    window partitioned by user_id (parallel across users) feeding one
    aggregate on the same key: a single shuffle end to end."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = t.events.select(
        "user_id",
        "value",
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            (
                F.sum(F.col("value") * F.col("dur_us"))
                / F.sum("dur_us")
            ).alias("twa_raw"),
            F.sum("dur_us").alias("total_dur"),
        )
        .filter(F.col("total_dur") > 0)
        .select("user_id", F.round("twa_raw", 4).alias("twa"))
    )


@query(
    "events_ewma",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY 1
    )
    SELECT user_id,
           round(list_reduce(vs, (acc, x) -> 0.7 * acc + 0.3 * x), 4) AS ewma
    FROM ordered
    WHERE len(vs) > 0
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.3, recursive
    s_i = 0.7*s_{i-1} + 0.3*x_i seeded with the first reading — pandas
    ewm(adjust=False)) per user, WITHOUT a Python UDF: collect_list +
    array_sort + one aggregate() fold, all JVM-side. The fold is
    inherently sequential per key but keys process in parallel; state per
    key is one array of that key's readings (bounded by per-user event
    count — for unbounded keys, switch to the applyInPandasWithState
    streaming formulation in streaming/stateful.py)."""
    t = Tables(spark, sf_dir)
    pairs = t.events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("ts", "event_id", F.col("value").alias("v"))
            )
        ).alias("ps")
    )
    vs = F.col("ps.v")
    ewma = F.aggregate(
        F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0))),
        F.element_at(vs, 1).cast("double"),
        lambda acc, x: F.lit(0.7) * acc + F.lit(0.3) * x,
    )
    return (
        pairs.filter(F.size(vs) > 0)
        .select("user_id", F.round(ewma, 4).alias("ewma"))
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value,
             avg(value)         OVER win AS mu,
             stddev_samp(value) OVER win AS sigma,
             count(value)       OVER win AS n_prev
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value,
           CASE WHEN n_prev >= 5 AND sigma > 0
                THEN floor((value - mu) / sigma * 100 + 0.5) / 100 END AS z,
           CAST(coalesce(abs(CASE WHEN n_prev >= 5 AND sigma > 0
                THEN floor((value - mu) / sigma * 100 + 0.5) / 100 END) > 2.5,
                false) AS INT) AS is_anomaly
    FROM w
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag: each reading scored against the
    trailing 20 readings of ITS OWN user (frame excludes the current row,
    so an outlier cannot mask itself), flagged at |z| > 2.5 with a 5-
    reading warm-up. One window over the (user_id, ts) sort — a single
    shuffle; per-key state is the bounded 20-row frame, so the same plan
    streams under Structured Streaming's transformWithState at 100 TB.
    The z rounding uses the engine-portable floor(x*100+0.5)/100 form and
    the flag derives from the ROUNDED z, keeping both engines' compare on
    identical doubles."""
    t = Tables(spark, sf_dir)
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(win)
    sigma = F.stddev_samp("value").over(win)
    n_prev = F.count("value").over(win)
    z = F.when(
        (n_prev >= 5) & (sigma > 0),
        F.floor((F.col("value") - mu) / sigma * 100 + 0.5) / 100,
    )
    return t.events.select(
        "event_id",
        "user_id",
        "value",
        z.alias("z"),
        F.coalesce(F.abs(z) > 2.5, F.lit(False)).cast("int").alias(
            "is_anomaly"
        ),
    )


@query(
    "events_rate_limit",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id, ts,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT event_id, user_id, rn AS slot_seq,
           CAST(rn <= 3 AS INT) AS admitted
    FROM r
    """,
)
def events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of a per-key rate limiter: within each (user, hour)
    window the first 3 events (by event time, event_id tie-break) are
    admitted, the rest rejected — the quota/throttling governance op.
    One window over the (user_id, hour) partitioning; in streaming the
    same semantics run as a transformWithState counter keyed the same
    way, so the batch oracle doubles as the replay check."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy(
        "user_id", F.date_trunc("hour", F.col("ts"))
    ).orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    return t.events.select(
        "event_id",
        "user_id",
        rn.alias("slot_seq"),
        (rn <= 3).cast("int").alias("admitted"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n,
           floor(count(*) * 1.0
                 / sum(count(*)) OVER (PARTITION BY prev_type)
                 * 10000 + 0.5) / 10000 AS p
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: per-user
    sequences (event-time order, event_id tie-break) lag-paired, pair
    counts normalized into row-stochastic probabilities. One shuffle on
    user_id for the lag, one tiny-key aggregate, one window over the
    handful of (prev,next) cells — the user-journey/attribution building
    block."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (F.floor(F.col("n") * 1.0 / F.sum("n").over(wp) * 10000 + 0.5) / 10000)
        .alias("p"),
    )


@query(
    "events_ab_ttest",
    oracle="""
    WITH g AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp, value
      FROM events WHERE event_type IN ('view', 'click')
    ), s AS (
      SELECT grp, count(*) AS n, avg(value) AS mean,
             var_samp(value) AS var
      FROM g GROUP BY 1
    )
    SELECT a.n AS n_a, b.n AS n_b,
           floor(a.mean * 10000 + 0.5) / 10000 AS mean_a,
           floor(b.mean * 10000 + 0.5) / 10000 AS mean_b,
           floor((a.mean - b.mean)
                 / sqrt(a.var / a.n + b.var / b.n) * 1000 + 0.5) / 1000
             AS t_stat
    FROM (SELECT * FROM s WHERE grp = 'A') a,
         (SELECT * FROM s WHERE grp = 'B') b
    """,
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic between a deterministic A/B split
    (user_id parity) — the experiment-readout aggregate. Each arm
    reduces map-side to one (n, mean, var) triple; the final statistic
    assembles from two single-row frames (broadcast scalars, allowlisted
    in the plan audit). t rounded at 1e-3: the variance accumulates fp
    noise ~1e-12 relative, six orders below the rounding grid."""
    t = Tables(spark, sf_dir)
    g = t.events.filter(
        F.col("event_type").isin("view", "click")
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"),
        "value",
    )
    s = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    a = s.filter(F.col("grp") == "A").select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = s.filter(F.col("grp") == "B").select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    j = a.crossJoin(F.broadcast(b))
    tstat = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    return j.select(
        "n_a",
        "n_b",
        (F.floor(F.col("mean_a") * 10000 + 0.5) / 10000).alias("mean_a"),
        (F.floor(F.col("mean_b") * 10000 + 0.5) / 10000).alias("mean_b"),
        (F.floor(tstat * 1000 + 0.5) / 1000).alias("t_stat"),
    )


@query(
    "events_path_analysis",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path,
             count(*) AS n_occurrences,
             count(DISTINCT user_id) AS n_users
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n_occurrences, n_users FROM paths
    ORDER BY n_occurrences DESC, path LIMIT 10
    """,
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type paths (3-step sequences) across users — the
    product-analytics 'user journey' mining query. Two leads over one
    per-user window sort build the sequences in place (no self-join on
    position), the path aggregation is one keyed shuffle on the path
    string (bounded: |event_types|^3 distinct keys), and the top-10 is
    TakeOrderedAndProject with a full deterministic ordering
    (n_occurrences DESC, path)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path"),
            "user_id",
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
    return paths.orderBy(F.col("n_occurrences").desc(), "path").limit(10)


@query(
    "events_concurrency",
    oracle="""
    WITH sess AS (
      SELECT user_id, ts AS start_ts,
             ts + INTERVAL '30 minutes' AS end_ts
      FROM events WHERE event_type = 'signup'
    ), pts AS (
      SELECT start_ts AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT end_ts AS t, -1 AS delta FROM sess
    ), sweep AS (
      SELECT t, delta,
             CAST(sum(delta) OVER (ORDER BY t, delta DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS concurrent
      FROM pts
    )
    SELECT strftime(date_trunc('day', t), '%Y-%m-%d') AS day,
           max(concurrent) AS peak_concurrent
    FROM sweep GROUP BY 1
    """,
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the sweep line: each 30-minute signup
    session contributes a +1 at start and a -1 at end; the running sum
    over the merged, time-ordered point stream IS the concurrency curve,
    and a per-day max collapses it. One union (no join of sessions
    against sessions — the naive interval self-join is quadratic). The
    100 TB hazard of a globally-ordered window is handled for real: the
    running sum goes through operators/prefix.py:distributed_running_sum,
    a two-phase prefix scan bucketed by day, so the only
    single-partition work is the ~#days-row bucket-offset window and
    each day's sweep runs parallel. Ties: delta DESC processes arrivals
    before departures at the same instant (back-to-back sessions count
    as overlapping at the boundary, matching the closed-interval
    convention of the oracle); tie ordering stays inside one bucket,
    which is the operator's contract."""
    from ..operators.prefix import distributed_running_sum

    t = Tables(spark, sf_dir)
    sess = t.events.filter(F.col("event_type") == "signup").select(
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    pts = sess.select(
        F.col("start_ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        sess.select(F.col("end_ts").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = distributed_running_sum(
        pts,
        value_col="delta",
        order_cols=[F.col("t"), F.col("delta").desc()],
        bucket_col=F.date_trunc("day", F.col("t")),
        out_col="concurrent",
    )
    return sweep.groupBy(
        F.date_format(F.date_trunc("day", F.col("t")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.max("concurrent").alias("peak_concurrent"))


@query(
    "events_funnel_latency",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END)   AS t_signup,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY 1
    ), conv AS (
      SELECT user_id,
             date_diff('second', t_signup, t_purchase) AS lat_sec
      FROM firsts
      WHERE t_signup IS NOT NULL AND t_purchase > t_signup
    )
    SELECT CAST(count(*) AS BIGINT)                   AS n_converted,
           CAST(min(lat_sec) AS BIGINT)               AS min_sec,
           CAST(max(lat_sec) AS BIGINT)               AS max_sec,
           CAST(floor(avg(lat_sec) + 0.5) AS BIGINT)  AS avg_sec,
           CAST(median(lat_sec) AS BIGINT)            AS median_sec
    FROM conv
    """,
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: time from each user's first signup to their
    first subsequent purchase — min/max/mean/median over converters.
    One conditional-min aggregation per user (map-side combinable, no
    event-sequence join), then a single-row stats collapse. The median
    is exact (percentile on a ~users-sized frame); at extreme user
    counts swap percentile_approx in with the same contract."""
    t = Tables(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    conv = firsts.filter(
        F.col("t_signup").isNotNull()
        & (F.col("t_purchase") > F.col("t_signup"))
    ).select(
        (
            F.unix_timestamp("t_purchase") - F.unix_timestamp("t_signup")
        ).alias("lat_sec")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("lat_sec").alias("min_sec"),
        F.max("lat_sec").alias("max_sec"),
        F.floor(F.avg("lat_sec") + 0.5).cast("long").alias("avg_sec"),
        F.expr("CAST(percentile(lat_sec, 0.5) AS BIGINT)").alias(
            "median_sec"
        ),
    )


@query(
    "events_attribution",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type != 'purchase' THEN event_type END
               AS touch
      FROM events
    ), attributed AS (
      SELECT user_id, event_id, event_type, value,
             last_value(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS src
      FROM tagged
    )
    SELECT coalesce(src, 'organic') AS source_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           floor(sum(value) * 100 + 0.5) / 100 AS attributed_value
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent PRIOR non-purchase event type ('organic' when none). The
    carry-forward is one IGNORE-NULLS last_value window per user — the
    LOCF pattern — with the frame ending at 1 PRECEDING so a purchase
    can never attribute to itself; revenue then rolls up per source.
    One user-keyed window + one tiny groupBy."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = t.events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.col("event_type") != "purchase", F.col("event_type")
        ).alias("touch"),
    )
    attributed = tagged.select(
        "event_type",
        "value",
        F.last("touch", ignorenulls=True).over(w).alias("src"),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("src", F.lit("organic")).alias("source_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.floor(F.sum("value") * 100 + 0.5) / 100).alias(
                "attributed_value"
            ),
        )
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH presence AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM presence
    ), wau_exploded AS (
      SELECT p.user_id, p.day + CAST(x.i AS INT) AS day
      FROM presence p,
           LATERAL (SELECT unnest(range(0, 7)) AS i) x
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST((SELECT count(DISTINCT p.user_id) FROM presence p
                 WHERE p.day = d.day) AS BIGINT) AS dau,
           CAST((SELECT count(DISTINCT w.user_id) FROM wau_exploded w
                 WHERE w.day = d.day) AS BIGINT) AS wau
    FROM days d
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per active day. The scalable WAU shape:
    the (day, user) presence table (tiny — days x users upper bound)
    explodes each presence into the 7 days it keeps the user active,
    then one keyed count-distinct per day. Bounded 7x blowup of the
    REDUCED table, never a range self-join of raw events; extending to
    MAU is the same explode with 30."""
    t = Tables(spark, sf_dir)
    presence = t.events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = presence.groupBy("day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    wau = (
        presence.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            F.date_add(F.col("day"), F.col("i")).alias("wday"),
            "user_id",
        )
        .groupBy(F.col("wday").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau"
        )
    )


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             floor(avg(value) * 1e4 + 0.5) / 1e4 AS x
      FROM events GROUP BY 1, 2
    ), base AS (
      SELECT event_type, avg(x) AS mu, stddev_pop(x) AS sigma
      FROM daily GROUP BY 1
    ), dev AS (
      SELECT d.event_type, d.day, d.x,
             floor((d.x - b.mu) / b.sigma * 1e6 + 0.5) / 1e6 AS dev
      FROM daily d JOIN base b ON d.event_type = b.event_type
    ), pref AS (
      SELECT event_type, day, x,
             sum(dev) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS ps
      FROM dev
    ), ps AS (
      SELECT event_type, day, x, ps,
             least(CAST(0 AS DOUBLE),
                   min(ps) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS lo
      FROM pref
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
           floor((ps - lo) * 1e4 + 0.5) / 1e4 AS cusum,
           CAST(floor((ps - lo) * 1e4 + 0.5) / 1e4 > 4.0 AS INT)
             AS is_change
    FROM ps
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the per-type daily mean series.
    The one-sided CUSUM recurrence S_i = max(0, S_{i-1} + dev_i) has no
    direct window form, but unrolls exactly to
    S_i = prefix_sum_i - min(0, running_min(prefix_sum)) — two stacked
    windows over ONE (event_type, day) sort, so the whole detector is a
    single shuffle per series regardless of length (the classic
    segmented-scan identity; same trick as window_drawdown). Daily means
    are grid-rounded before standardization and deviations before
    accumulation, keeping both engines on identical doubles; the alarm
    threshold (cusum > 4 sigma-units) compares the rounded value. At
    100 TB the daily pre-aggregation is the scale valve: the windowed
    series is days x types, thousands of rows, whatever the raw volume."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg((F.floor(F.avg("value") * 1e4 + F.lit(0.5)) / 1e4).alias("x"))
    base = daily.groupBy("event_type").agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("sigma")
    )
    dev = daily.join(F.broadcast(base), "event_type").select(
        "event_type",
        "day",
        "x",
        (
            F.floor(
                (F.col("x") - F.col("mu")) / F.col("sigma") * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("dev"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ps = F.sum("dev").over(w)
    lo = F.least(F.lit(0.0), F.min(ps).over(w))
    cusum = F.floor((ps - lo) * 1e4 + F.lit(0.5)) / 1e4
    return dev.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        cusum.alias("cusum"),
        (cusum > 4.0).cast("int").alias("is_change"),
    )


@query(
    "events_funnel_windowed",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 3 DAY
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= v.t1 + INTERVAL 3 DAY
      GROUP BY 1
    )
    SELECT '1_view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT '2_click', count(*) FROM c
    UNION ALL SELECT '3_purchase', count(*) FROM p
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel (the Amplitude/Mixpanel semantics the
    plain ordered funnel lacks): a user converts only if every later
    stage lands within 3 days of their FIRST view — the anchor time
    rides along the stage joins, so abandoning users age out instead of
    converting months later. Same scale shape as events_funnel: three
    per-user min-aggregates chained by user_id-keyed joins, one shuffle
    partitioning reused across stages, counts reduced at the end."""
    t = Tables(spark, sf_dir)
    e = t.events.select("user_id", "event_type", "ts")
    deadline = F.col("t1") + F.expr("INTERVAL 3 DAYS")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.lit("1_view").alias("stage"), F.count("*").alias("n_users"))
        .unionAll(
            c.agg(
                F.lit("2_click").alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
        .unionAll(
            p.agg(
                F.lit("3_purchase").alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
    )


@query(
    "events_seasonality_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) + 1 AS dow,
             floor(sum(value) * 1e4 + 0.5) / 1e4 AS x
      FROM events GROUP BY 1, 2
    ), base AS (
      SELECT avg(x) AS mu FROM daily
    ), idx AS (
      SELECT dow, floor(avg(x) / (SELECT mu FROM base) * 1e6 + 0.5) / 1e6
               AS seasonal_index
      FROM daily GROUP BY 1
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dow, d.x,
           i.seasonal_index,
           floor(d.x / i.seasonal_index * 1e4 + 0.5) / 1e4
             AS deseasonalized
    FROM daily d JOIN idx i ON d.dow = i.dow
    """,
)
def events_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week seasonal decomposition of the daily
    value series: per-weekday seasonal index (weekday mean / overall
    mean) and the deseasonalized series x / index — the first pass of
    any retail/traffic forecasting pipeline (the ratio-to-moving-average
    method with a calendar period). The raw stream reduces to one row
    per day FIRST, so the seasonal fit and the rescale both run over
    ~series-length rows; the 7-row index broadcasts back. Weekday
    numbering pinned to Sunday=1 (Spark's convention; the oracle
    shifts DuckDB's Sunday=0 to match).
    All ratios on fixed grids."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        F.to_date("ts").alias("day"),
        F.dayofweek(F.to_date("ts")).alias("dow"),
    ).agg((F.floor(F.sum("value") * 1e4 + F.lit(0.5)) / 1e4).alias("x"))
    base = daily.agg(F.avg("x").alias("mu"))
    idx = (
        daily.crossJoin(F.broadcast(base))
        .groupBy("dow")
        .agg(
            (
                F.floor(
                    F.avg("x") / F.first("mu") * 1e6 + F.lit(0.5)
                )
                / 1e6
            ).alias("seasonal_index")
        )
    )
    return daily.join(F.broadcast(idx), "dow").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow",
        "x",
        "seasonal_index",
        (
            F.floor(
                F.col("x") / F.col("seasonal_index") * 1e4 + F.lit(0.5)
            )
            / 1e4
        ).alias("deseasonalized"),
    )


@query(
    "events_decay_feature",
    oracle="""
    WITH base AS (
      SELECT user_id, value,
             epoch(ts - (SELECT min(ts) FROM events)) / 86400.0 AS td
      FROM events
    ), b2 AS (
      SELECT user_id, value, td,
             (SELECT max(td) FROM base) AS tmax
      FROM base
    )
    SELECT user_id,
           floor(sum(value * exp(0.1 * (td - tmax))) * 1e4 + 0.5) / 1e4
             AS decayed_sum
    FROM b2 GROUP BY user_id
    """,
)
def events_decay_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed activity feature: per user, sum of value weighted by
    exp(-lambda * age), lambda = 0.1/day, age measured against the
    global latest event — the recency-weighted engagement feature every
    ranking/feature-store pipeline materializes. Computed in ONE keyed
    aggregate via the log-domain identity
    sum(v * exp(-l*(T - t))) = sum(v * exp(l*(t - T))): the per-row
    exponent (t - T) <= 0, so the factor is <= 1 and never overflows no
    matter the time span (the naive exp(l*t) factorization overflows in
    weeks). The two scalars (corpus min/max ts) ride along as window
    constants; no self-join, no per-user sort. Output on the 1e-4 grid."""
    t = Tables(spark, sf_dir)
    w_all = Window.partitionBy()
    base = t.events.select(
        "user_id",
        "value",
        (
            (
                F.unix_micros("ts")
                - F.min(F.unix_micros("ts")).over(w_all)
            )
            / 86400.0
            / 1e6
        ).alias("td"),
    ).withColumn("tmax", F.max("td").over(w_all))
    return (
        base.groupBy("user_id")
        .agg(
            F.sum(
                F.col("value")
                * F.exp(0.1 * (F.col("td") - F.col("tmax")))
            ).alias("s_raw")
        )
        .select(
            "user_id",
            (F.floor(F.col("s_raw") * 1e4 + F.lit(0.5)) / 1e4).alias(
                "decayed_sum"
            ),
        )
    )


@query(
    "events_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT user_id, sum(n) AS total FROM c GROUP BY 1
    )
    SELECT c.user_id,
           floor(-sum((CAST(c.n AS DOUBLE) / tot.total)
                      * log2(CAST(c.n AS DOUBLE) / tot.total))
                 * 1e6 + 0.5) / 1e6 AS entropy_bits,
           count(*) AS n_types,
           CAST(max(tot.total) AS BIGINT) AS n_events
    FROM c JOIN tot USING (user_id)
    GROUP BY 1
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral entropy per user: Shannon entropy (bits) of each
    user's event-type distribution — the bot/anomaly screen (scripted
    accounts collapse to near-zero entropy; exploratory humans sit near
    log2(k)). Two keyed aggregates on the same user_id partitioning
    (type counts, then the entropy fold) — Catalyst reuses the exchange,
    so one shuffle end to end. Entropy lands on the 1e-6 grid; the
    per-user type count and event total ride along for calibration."""
    t = Tables(spark, sf_dir)
    c = t.events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            (
                F.floor(
                    -F.sum(p * F.log2(p)) * 1e6 + F.lit(0.5)
                )
                / 1e6
            ).alias("entropy_bits"),
            F.count(F.lit(1)).alias("n_types"),
            F.max("total").alias("n_events"),
        )
    )


@query(
    "events_linear_attribution",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, value, ts,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS epoch_id
      FROM events
    ), touches AS (
      SELECT user_id, epoch_id + 1 AS credit_epoch, event_type
      FROM seq WHERE event_type IN ('view', 'click')
    ), purchases AS (
      SELECT user_id, epoch_id AS credit_epoch, value AS revenue
      FROM seq WHERE event_type = 'purchase'
    ), counts AS (
      SELECT user_id, credit_epoch, count(*) AS n_touches
      FROM touches GROUP BY 1, 2
    )
    SELECT t.event_type,
           floor(sum(p.revenue / c.n_touches) * 1e4 + 0.5) / 1e4
             AS attributed_revenue,
           count(*) AS n_credited_touches
    FROM touches t
    JOIN counts c USING (user_id, credit_epoch)
    JOIN purchases p USING (user_id, credit_epoch)
    GROUP BY 1
    """,
)
def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's revenue splits
    EQUALLY across the user's view/click touches since their previous
    purchase (the conversion epoch) — the fair-share sibling of the
    last-touch model in events_attribution. Epochs come from a running
    purchase count per user (one window, one shuffle on user_id); touches
    credit the NEXT purchase epoch (epoch_id + 1 aligns a touch with the
    purchase that closes its epoch), and the three-way join stays keyed
    on (user_id, epoch) — partitioning reused, no range self-join. Every
    division is exact-rational until the final 1e-4 grid."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = t.events.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w).alias("epoch_id"),
    )
    touches = seq.filter(
        F.col("event_type").isin("view", "click")
    ).select(
        "user_id",
        (F.col("epoch_id") + 1).alias("credit_epoch"),
        "event_type",
    )
    purchases = seq.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("epoch_id").alias("credit_epoch"),
        F.col("value").alias("revenue"),
    )
    counts = touches.groupBy("user_id", "credit_epoch").agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    return (
        touches.join(counts, ["user_id", "credit_epoch"])
        .join(purchases, ["user_id", "credit_epoch"])
        .groupBy("event_type")
        .agg(
            (
                F.floor(
                    F.sum(F.col("revenue") / F.col("n_touches")) * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("attributed_revenue"),
            F.count(F.lit(1)).alias("n_credited_touches"),
        )
    )


@query(
    "events_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS journey,
             count(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(journey, 'v[ce]*p')) AS BIGINT)
             AS n_funnels,
           substr(journey, 1, 1) AS first_step
    FROM seq
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence pattern matching: each user's ordered
    event history is encoded as a one-char-per-event journey string
    (c/e/p/s/v initials are distinct) and scanned for non-overlapping
    view->(clicks|errors)*->purchase funnel completions with one regex.
    This is the row-pattern-recognition operator SQL:2016 defines and
    Spark lacks — journeys ARE strings, so the engine's codegen'd regex
    is the matcher; no per-row Python, no self-joins per step.

    The per-user ordering is made deterministic WITHOUT a window sort:
    collect_list into an array of (ts, event_id, char) structs (one keyed
    shuffle with map-side partial collect), then sort_array + transform +
    concat inside the executor — per-key work bounded by events-per-user.
    At 100 TB the journey key is (user_id, session) after sessionization
    so no single string grows unboundedly; a skew cap (limit per key)
    guards pathological users — same discipline as the LSH bucket cap.
    The regex runs identically on DuckDB (RE2) and the JVM: the pattern
    uses only greedy char-class quantifiers, where leftmost-first and
    leftmost-longest semantics coincide."""
    t = Tables(spark, sf_dir)
    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("c"),
            )
        )
    )
    return (
        t.events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(ordered, lambda x: x["c"]), ""
            ).alias("journey"),
        )
        .select(
            "user_id",
            "n_events",
            F.regexp_count("journey", F.lit("v[ce]*p")).alias("n_funnels"),
            F.substring("journey", 1, 1).alias("first_step"),
        )
    )


@query(
    "events_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ), aged AS (
      SELECT strftime(f.first_ts, '%Y-%m') AS cohort,
             CAST(floor(date_diff('second', f.first_ts, e.ts)
                        / 604800.0) AS BIGINT) AS age_week,
             e.user_id, e.value
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ), wk AS (
      SELECT cohort, age_week,
             floor(sum(value) * 100 + 0.5) / 100 AS week_value,
             count(DISTINCT user_id) AS n_active
      FROM aged GROUP BY 1, 2
    )
    SELECT cohort, age_week,
           CAST(n_active AS BIGINT) AS n_active,
           floor(sum(week_value) OVER (PARTITION BY cohort
                                       ORDER BY age_week) * 100 + 0.5) / 100
             AS cum_value
    FROM wk
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen month,
    their event value summed per cohort-age week, then accumulated into
    the running LTV curve per cohort. The first-touch frame is a keyed
    aggregate re-joined onto events with no broadcast hint: it is one row
    PER USER, so at scale it outgrows the broadcast threshold and a
    forced F.broadcast would OOM the driver — AQE picks broadcast while
    it fits and falls back to a sort-merge join keyed the same as the
    groupBy (at 100 TB the first-touch table is the classic candidate
    for an incremental MIN-merge rather than a rescan); the weekly
    rollup is one keyed shuffle; the cumulative window runs over
    |cohorts| x |weeks| rows only. Money folded on the 1e-2 grid pre-
    and post-accumulation so the float sum order is
    cross-engine-stable."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window as W

    firsts = t.events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    aged = t.events.join(firsts, "user_id").select(
        F.date_format("first_ts", "yyyy-MM").alias("cohort"),
        F.floor(
            (
                F.unix_timestamp("ts") - F.unix_timestamp("first_ts")
            )
            / 604800.0
        ).alias("age_week"),
        "user_id",
        "value",
    )
    wk = aged.groupBy("cohort", "age_week").agg(
        (F.floor(F.sum("value") * 100 + 0.5) / 100).alias("week_value"),
        F.count_distinct("user_id").alias("n_active"),
    )
    cum = F.sum("week_value").over(
        W.partitionBy("cohort").orderBy("age_week")
    )
    return wk.select(
        "cohort",
        "age_week",
        "n_active",
        (F.floor(cum * 100 + 0.5) / 100).alias("cum_value"),
    )


@query(
    "events_holt_winters",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY 1
    ), folded AS (
      SELECT user_id,
             list_reduce(
               list_concat([[vs[1], vs[2] - vs[1]]],
                           list_transform(vs[3:], v -> [v])),
               (acc, x) ->
                 [0.3 * x[1] + 0.7 * (acc[1] + acc[2]),
                  0.4 * (0.3 * x[1] + 0.7 * (acc[1] + acc[2]) - acc[1])
                    + 0.6 * acc[2]]
             ) AS s
      FROM ordered WHERE len(vs) >= 2
    )
    SELECT user_id,
           floor(s[1] * 1e4 + 0.5) / 1e4 AS level,
           floor(s[2] * 1e4 + 0.5) / 1e4 AS trend,
           floor((s[1] + s[2]) * 1e4 + 0.5) / 1e4 AS forecast_next
    FROM folded
    """,
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double exponential smoothing (level + trend, alpha=0.3,
    beta=0.4) per user series, seeded classically (l1 = x1,
    b1 = x2 - x1) and folded with ONE JVM-side aggregate() over the
    sorted readings — the two-component state rides through the fold as
    a 2-element double array, so no Python UDF and no per-step window.
    One-step-ahead forecast = level + trend. Same per-key-sequential /
    cross-key-parallel cost model as events_ewma; the oracle replays the
    identical recursion with DuckDB's list_reduce over a list-encoded
    accumulator, and both engines evaluate the same IEEE expression tree
    so the fold is bitwise-stable before the 1e-4 grid fold."""
    t = Tables(spark, sf_dir)
    pairs = t.events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("ts", "event_id", F.col("value").alias("v"))
            )
        ).alias("ps")
    )
    vs = F.col("ps.v")
    x1 = F.element_at(vs, 1).cast("double")
    x2 = F.element_at(vs, 2).cast("double")
    rest = F.slice(vs, 3, F.greatest(F.size(vs) - 2, F.lit(0)))

    def step(acc, x):
        newl = F.lit(0.3) * x + F.lit(0.7) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        newb = F.lit(0.4) * (newl - F.element_at(acc, 1)) + F.lit(
            0.6
        ) * F.element_at(acc, 2)
        return F.array(newl, newb)

    s = F.aggregate(rest, F.array(x1, x2 - x1), step)
    lvl = F.element_at(s, 1)
    trd = F.element_at(s, 2)
    return (
        pairs.filter(F.size(vs) >= 2)
        .select(
            "user_id",
            (F.floor(lvl * 1e4 + 0.5) / 1e4).alias("level"),
            (F.floor(trd * 1e4 + 0.5) / 1e4).alias("trend"),
            (F.floor((lvl + trd) * 1e4 + 0.5) / 1e4).alias("forecast_next"),
        )
    )


@query(
    "events_ab_mannwhitney",
    oracle="""
    WITH g AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp, value
      FROM events WHERE event_type IN ('view', 'click')
    ), ranked AS (
      SELECT grp,
             rank() OVER (ORDER BY value)
               + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS avg_rank
      FROM g
    ), sums AS (
      SELECT
        sum(CASE WHEN grp = 'A' THEN avg_rank END) AS r_a,
        sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS n_a,
        sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS n_b
      FROM ranked
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           floor((r_a - n_a * (n_a + 1) / 2.0) * 1e4 + 0.5) / 1e4 AS u_stat,
           floor(((r_a - n_a * (n_a + 1) / 2.0) - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0) * 1e4 + 0.5)
             / 1e4 AS z_score
    FROM sums
    """,
)
def events_ab_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the deterministic A/B
    user split — the nonparametric sibling of events_ab_ttest for metric
    distributions where means mislead (heavy tails, outliers). Tied
    values get average ranks via rank() + (tie_count-1)/2 — one global
    sort window (rank requires total order; at 100 TB approximate ranks
    via qdigest or per-shard rank + offset reconstruction), then a
    single-row reduction. z uses the no-tie-correction normal
    approximation — deterministic and identical on both engines; the
    oracle replays the same expression tree so the 1e-4 grid fold is
    stable."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    g = t.events.where(F.col("event_type").isin("view", "click")).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"),
        "value",
    )
    avg_rank = (
        F.rank().over(W.orderBy("value"))
        + (F.count(F.lit(1)).over(W.partitionBy("value")) - 1) / 2.0
    )
    ranked = g.select("grp", avg_rank.alias("avg_rank"))
    sums = ranked.agg(
        F.sum(F.when(F.col("grp") == "A", F.col("avg_rank"))).alias("r_a"),
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).alias("n_b"),
    )
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    z = (u - F.col("n_a") * F.col("n_b") / 2.0) / F.sqrt(
        F.col("n_a") * F.col("n_b") * (F.col("n_a") + F.col("n_b") + 1) / 12.0
    )
    return sums.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (F.floor(u * 1e4 + 0.5) / 1e4).alias("u_stat"),
        (F.floor(z * 1e4 + 0.5) / 1e4).alias("z_score"),
    )


@query(
    "events_diff_in_diff",
    oracle="""
    WITH cutoff AS (
      -- floor each ts to whole seconds BEFORE averaging: Spark's
      -- unix_timestamp() truncates per-row, and averaging sub-second
      -- epochs instead can move floor(avg) across a second boundary
      SELECT to_timestamp(CAST(floor(avg(floor(epoch(ts)))) AS BIGINT)) AS mid
      FROM events
    ), treated AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    ), cls AS (
      SELECT e.user_id,
             CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treated,
             CASE WHEN e.ts >= c.mid THEN 1 ELSE 0 END AS post,
             e.value
      FROM events e
      CROSS JOIN cutoff c
      LEFT JOIN treated t ON e.user_id = t.user_id
      WHERE e.event_type IN ('view', 'click')
    ), m AS (
      SELECT treated, post, avg(value) AS mean_v, count(*) AS n
      FROM cls GROUP BY 1, 2
    )
    SELECT
      CAST(sum(n) AS BIGINT) AS n_obs,
      floor((
          max(CASE WHEN treated = 1 AND post = 1 THEN mean_v END)
        - max(CASE WHEN treated = 1 AND post = 0 THEN mean_v END)
        - max(CASE WHEN treated = 0 AND post = 1 THEN mean_v END)
        + max(CASE WHEN treated = 0 AND post = 0 THEN mean_v END)
      ) * 1e4 + 0.5) / 1e4 AS did_estimate
    FROM m
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: users who ever signed up are the
    treatment group, the time axis splits at the mean event timestamp,
    and the DiD estimate is (treated post - treated pre) - (control post
    - control pre) on view/click values — the workhorse causal estimator
    for launch analyses. The treated set is a distinct-user semi-join
    frame (broadcastable), the cutoff a 1-row broadcast scalar, the four
    cell means one keyed aggregate; nothing rescans events twice. The
    epoch cutoff floors to whole seconds so both engines split identical
    rows (float-epoch comparison at the boundary would be
    engine-sensitive)."""
    t = Tables(spark, sf_dir)
    ev = t.events
    cutoff = ev.agg(
        F.timestamp_seconds(
            F.floor(F.avg(F.unix_timestamp("ts"))).cast("bigint")
        ).alias("mid")
    )
    treated = ev.where(F.col("event_type") == "signup").select(
        "user_id"
    ).distinct().withColumn("treated", F.lit(1))
    cls = (
        ev.where(F.col("event_type").isin("view", "click"))
        .crossJoin(F.broadcast(cutoff))
        # per-user frame: no broadcast hint — AQE broadcasts while it
        # fits and degrades to shuffle join at scale (same class as
        # events_cohort_ltv's first-touch table)
        .join(treated, "user_id", "left")
        .select(
            F.coalesce(F.col("treated"), F.lit(0)).alias("treated"),
            F.when(F.col("ts") >= F.col("mid"), 1).otherwise(0).alias("post"),
            "value",
        )
    )
    m = cls.groupBy("treated", "post").agg(
        F.avg("value").alias("mean_v"), F.count(F.lit(1)).alias("n")
    )

    def cell(tr, po):
        return F.max(
            F.when(
                (F.col("treated") == tr) & (F.col("post") == po),
                F.col("mean_v"),
            )
        )

    did = cell(1, 1) - cell(1, 0) - cell(0, 1) + cell(0, 0)
    return m.agg(
        F.sum("n").cast("bigint").alias("n_obs"),
        (F.floor(did * 1e4 + 0.5) / 1e4).alias("did_estimate"),
    )


@query(
    "events_kaplan_meier",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(ts) AS entry,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS purch,
             max(ts) AS last_ts
      FROM events GROUP BY 1
    ), dur AS (
      SELECT date_diff('day', entry, coalesce(purch, last_ts)) AS duration,
             CASE WHEN purch IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user
    ), km AS (
      SELECT duration, sum(ev) AS d_i, count(*) AS all_i
      FROM dur GROUP BY 1
    ), atrisk AS (
      SELECT duration, d_i,
             sum(all_i) OVER (ORDER BY duration DESC) AS n_i
      FROM km
    ), fac AS (
      SELECT list(struct_pack(d := duration, n := n_i, e := d_i,
                              f := 1 - d_i / CAST(n_i AS DOUBLE))
                  ORDER BY duration) AS fs
      FROM atrisk WHERE d_i > 0
    ), idx AS (
      SELECT unnest(generate_series(1, len(fs))) AS i, fs FROM fac
    )
    SELECT CAST(fs[i].d AS BIGINT) AS duration,
           CAST(fs[i].n AS BIGINT) AS n_risk,
           CAST(fs[i].e AS BIGINT) AS d_events,
           floor(list_reduce(list_transform(fs[1:i], x -> x.f),
                             (a, b) -> a * b) * 1e6 + 0.5) / 1e6 AS surv
    FROM idx
    """,
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase with right
    censoring at each user's last observed event — THE retention/
    conversion-lag estimator that naive conversion rates get wrong when
    observation windows differ per user. Per-user reduction, one keyed
    day-level rollup, a reverse cumulative window for the at-risk counts,
    then the survival product folded per step over the (tiny) step list
    — multiplication is an exact-rounded IEEE op applied in the same
    order on both engines, so S(t) is bitwise-stable before the 1e-6
    grid (exp(sum(log)) would NOT be: libm vs JVM log differ in last
    bits). The step list is |distinct event days| — bounded by the
    observation span, not the user count — so the single-row array fold
    is safe at any scale; everything upstream is keyed shuffles."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    per_user = t.events.groupBy("user_id").agg(
        F.min("ts").alias("entry"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purch"),
        F.max("ts").alias("last_ts"),
    )
    dur = per_user.select(
        F.datediff(
            F.to_date(F.coalesce(F.col("purch"), F.col("last_ts"))),
            F.to_date("entry"),
        ).alias("duration"),
        F.when(F.col("purch").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    km = dur.groupBy("duration").agg(
        F.sum("ev").alias("d_i"), F.count(F.lit(1)).alias("all_i")
    )
    atrisk = km.select(
        "duration",
        "d_i",
        F.sum("all_i").over(W.orderBy(F.col("duration").desc())).alias("n_i"),
    )
    steps = atrisk.where(F.col("d_i") > 0).select(
        F.struct(
            F.col("duration").alias("d"),
            F.col("n_i").alias("n"),
            F.col("d_i").alias("e"),
            (1 - F.col("d_i") / F.col("n_i").cast("double")).alias("f"),
        ).alias("s")
    )
    fac = steps.agg(F.array_sort(F.collect_list("s")).alias("fs"))
    exploded = fac.select(F.posexplode("fs").alias("pos", "s"), "fs")
    surv = F.aggregate(
        F.transform(
            F.slice("fs", 1, F.col("pos") + 1), lambda x: x["f"]
        ),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return exploded.select(
        F.col("s.d").cast("bigint").alias("duration"),
        F.col("s.n").cast("bigint").alias("n_risk"),
        F.col("s.e").cast("bigint").alias("d_events"),
        (F.floor(surv * 1e6 + 0.5) / 1e6).alias("surv"),
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH ref AS (
      SELECT max(o_orderdate) AS ref_ts FROM orders
    ), per_cust AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT ref_ts FROM ref))
               AS recency_days,
             count(*) AS frequency,
             CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT)
               AS monetary_c
      FROM orders GROUP BY 1
    ), scored AS (
      SELECT recency_days, monetary_c,
             ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
               AS r_score,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary_c, o_custkey) AS m_score
      FROM per_cust
    ), labeled AS (
      SELECT recency_days, monetary_c,
             CASE
               WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                 THEN '1_champion'
               WHEN r_score >= 4 AND f_score >= 3 THEN '2_loyal'
               WHEN r_score >= 3 THEN '3_active'
               WHEN r_score = 2 THEN '4_at_risk'
               ELSE '5_hibernating'
             END AS segment
      FROM scored
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor(avg(recency_days) * 10000 + 0.5) / 10000
             AS avg_recency_days,
           floor(sum(monetary_c) / 100.0 * 100 + 0.5) / 100
             AS total_monetary
    FROM labeled GROUP BY 1
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation — the
    classic CRM rollup, run here over ``orders``: per-customer last
    order age, order count, and lifetime spend are quintile-scored and
    mapped to named segments.

    Determinism across engines: the monetary quintile ranks on CENTS
    (``floor(sum*100+0.5)`` as a long), never on the raw double sum —
    two engines summing doubles in different orders may disagree in the
    last bits, and an ntile boundary must not hinge on those; ties
    break on ``o_custkey``.

    Scale: one shuffle groups orders by customer; the three ntiles
    rank 1-row-per-customer tuples (three ints each). Like
    agg_decile_lift, the global sort is over the pre-reduced frame —
    at 100 TB the production variant cuts on approx-quantile
    boundaries instead of a single-partition ntile; the segment
    semantics are unchanged."""
    t = Tables(spark, sf_dir)
    ref = t.orders.agg(F.max("o_orderdate").alias("ref_ts"))
    per_cust = t.orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.floor(F.sum("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("monetary_c"),
    )
    scored = per_cust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        "frequency",
        "monetary_c",
        F.datediff(F.col("ref_ts"), F.col("last_ts")).alias("recency_days"),
    )
    ranked = scored.select(
        "recency_days",
        "monetary_c",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").desc(), "o_custkey"))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy("frequency", "o_custkey"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("monetary_c", "o_custkey"))
        .alias("m_score"),
    )
    labeled = ranked.select(
        "recency_days",
        "monetary_c",
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "1_champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 3), "2_loyal")
        .when(F.col("r_score") >= 3, "3_active")
        .when(F.col("r_score") == 2, "4_at_risk")
        .otherwise("5_hibernating")
        .alias("segment"),
    )
    return labeled.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.floor(F.avg("recency_days") * 10000 + 0.5) / 10000).alias(
            "avg_recency_days"
        ),
        (F.floor(F.sum("monetary_c") / 100.0 * 100 + 0.5) / 100).alias(
            "total_monetary"
        ),
    )


@query(
    "events_ts_range_scan",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           floor(sum(value) * 100 + 0.5) / 100 AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    GROUP BY event_type
    """,
)
def events_ts_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window scan through ``read_parquet_ts_range`` (VERDICT r11
    item 2): the range predicate is placed where the parquet SCAN can
    push it — rewritten onto the raw int64 (epoch nanos, before the
    div-1000 conversion) for a TIMESTAMP(NANOS) encoding, a plain
    pushable filter on micros/NTZ. At 100 TB a ts-window query over an
    events table must row-group-skip on min/max stats, never full-scan;
    both encodings are plan-audit-pinned in tests/test_plan_audit.py.
    One scan, one partial->final aggregate exchange."""
    from . import read_parquet_ts_range

    e = read_parquet_ts_range(
        spark,
        f"{sf_dir}/events.parquet",
        "ts",
        lo="2024-01-10",
        hi="2024-01-20",
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        (F.floor(F.sum("value") * 100 + 0.5) / 100).alias("total_value"),
    )
