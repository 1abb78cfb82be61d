"""Reshape + additional scalar coverage: pivot/unpivot, explode, date
arithmetic, extended string functions, salted skew aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_agg
from . import Tables, query


@query(
    "reshape_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS F,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with EXPLICIT pivot values — at scale, always pass
    the value list (otherwise Spark runs an extra distinct job to discover
    them)."""
    t = Tables(spark, sf_dir)
    out = (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("O"),
    )


@query(
    "reshape_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'custkey_as_double', CAST(c_custkey AS DOUBLE) FROM customer
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide -> long without a shuffle (Catalyst Expand)."""
    t = Tables(spark, sf_dir)
    wide = t.customer.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_custkey").cast("double").alias("custkey_as_double"),
    )
    return wide.unpivot(
        "c_custkey", ["acctbal", "custkey_as_double"], "metric", "value"
    )


@query(
    "reshape_explode",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             unnest(list_transform(embedding,
               (c, i) -> {'pos': i - 1, 'comp': round(CAST(c AS DOUBLE), 4)})) AS u
      FROM embeddings WHERE vec_id < 20
    )
    SELECT vec_id, CAST(u.pos AS INTEGER) AS pos, u.comp AS comp FROM x
    """,
)
def reshape_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding array — array rows to (pos, value)
    pairs (UDTF shape)."""
    t = Tables(spark, sf_dir)
    return (
        t.embeddings.filter(F.col("vec_id") < 20)
        .select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "comp"
            ),
        )
        .select("vec_id", "pos", F.round("comp", 4).alias("comp"))
    )


@query(
    "scalar_date_arith",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           date_diff('day', o.o_orderdate, l.l_shipdate)      AS ship_delay_days,
           l.l_shipdate + INTERVAL '30 days'                  AS ship_plus_30,
           CAST(round(date_diff('day', o.o_orderdate, l.l_shipdate) / 7, 0) AS BIGINT) AS ship_delay_weeks
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: datediff / interval add across a fact join."""
    t = Tables(spark, sf_dir)
    j = t.lineitem.join(
        t.orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        delay.alias("ship_delay_days"),
        (F.col("l_shipdate") + F.expr("INTERVAL 30 DAYS")).alias("ship_plus_30"),
        F.round(delay / 7, 0).cast("long").alias("ship_delay_weeks"),
    )


@query(
    "scalar_string_extended",
    oracle="""
    SELECT s_suppkey,
           lpad(CAST(s_suppkey AS VARCHAR), 8, '0')        AS padded_key,
           concat_ws('|', s_name, CAST(s_nationkey AS VARCHAR)) AS name_nation,
           regexp_extract(s_name, '([0-9]+)', 1)           AS name_digits,
           split_part(s_name, '#', 2)                      AS name_suffix,
           CASE WHEN starts_with(s_name, 'supplier') THEN 1 ELSE 0 END AS is_supplier,
           reverse(s_name)                                 AS name_rev
    FROM supplier
    """,
)
def scalar_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad / concat_ws / regexp_extract / split / startswith / reverse."""
    t = Tables(spark, sf_dir)
    return t.supplier.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat_ws(
            "|", F.col("s_name"), F.col("s_nationkey").cast("string")
        ).alias("name_nation"),
        F.regexp_extract("s_name", r"([0-9]+)", 1).alias("name_digits"),
        F.element_at(F.split("s_name", "#"), 2).alias("name_suffix"),
        F.when(F.col("s_name").startswith("supplier"), 1)
        .otherwise(0)
        .alias("is_supplier"),
        F.reverse("s_name").alias("name_rev"),
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           count(*)             AS count_value,
           round(sum(value), 2) AS sum_value,
           min(value)           AS min_value,
           max(value)           AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (operators/skew.py) over a low-
    cardinality (maximally skewed) key — byte-identical results to a plain
    groupBy, bounded per-task load at any skew."""
    t = Tables(spark, sf_dir)
    out = salted_agg(
        t.events,
        keys=["event_type"],
        aggs=[
            ("count", "value"),
            ("sum", "value"),
            ("min", "value"),
            ("max", "value"),
        ],
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        "count_value",
        F.round("sum_value", 2).alias("sum_value"),
        "min_value",
        "max_value",
    )


@query(
    "reshape_upsert_latest",
    oracle="""
    WITH existing AS (
      SELECT o_orderkey, o_totalprice, 1 AS ver, 0 AS src
      FROM orders WHERE o_orderkey % 2 = 0
    ), updates AS (
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, 2 AS ver, 1 AS src
      FROM orders WHERE o_orderkey % 4 = 0
    ), unioned AS (
      SELECT * FROM existing UNION ALL SELECT * FROM updates
    )
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, ver
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY ver DESC, src DESC) AS rn
      FROM unioned
    ) WHERE rn = 1
    """,
)
def reshape_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert via operators.upsert_latest: half the orders exist at v1,
    a quarter arrive as v2 updates (doubled price); latest version per key
    survives."""
    from ..operators.timeseries import upsert_latest

    t = Tables(spark, sf_dir)
    existing = (
        t.orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .withColumn("ver", F.lit(1))
    )
    updates = (
        t.orders.filter(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice"))
        .withColumn("ver", F.lit(2))
    )
    out = upsert_latest(existing, updates, "o_orderkey", "ver")
    return out.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "ver"
    )


@query(
    "reshape_global_index",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey) - 1 AS global_idx
    FROM orders
    """,
)
def reshape_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global row numbering (the distributed form of the reference's
    serial cartodb_id column) WITHOUT the row_number-over-global-order
    SinglePartition exchange the oracle SQL implies: range-repartition +
    monotonically_increasing_id bit-split + broadcast offsets
    (operators/index.py). Identical output, all-parallel plan — the
    difference between minutes and a dead executor at 100 TB."""
    from ..operators.index import global_index

    t = Tables(spark, sf_dir)
    return global_index(t.orders.select("o_orderkey"), "o_orderkey").select(
        "o_orderkey", "global_idx"
    )


@query(
    "reshape_scd2_build",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), versions AS (
      SELECT user_id, event_type, ts AS valid_from, event_id,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM changes
      WHERE prev_type IS NULL OR event_type != prev_type
    )
    SELECT user_id, event_type AS status, valid_from, valid_to,
           CAST(valid_to IS NULL AS INT) AS is_current
    FROM versions
    """,
)
def reshape_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change stream: each
    user's event_type is treated as a mutating attribute; consecutive
    duplicates collapse (lag filter), surviving rows become versions
    with [valid_from, valid_to) ranges via lead, open version flagged
    current. Two windows over ONE (user_id, ts) sort — Catalyst plans a
    single exchange+sort reused by both — and the result is exactly
    what join_asof consumes for point-in-time lookups."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = t.events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    versions = changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    return versions.select(
        "user_id",
        "status",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().cast("int").alias("is_current"),
    )


@query(
    "reshape_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01'
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 97 = 0
                  THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice != n.o_totalprice
                     OR o.o_orderstatus != n.o_orderstatus THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    GROUP BY 1
    """,
)
def reshape_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the CDC diff between two versions of a
    table (here: two deterministic date-bounded views of orders, with a
    synthetic value perturbation so 'changed' is non-empty): one keyed
    FULL OUTER join classifies every key as added / removed / changed /
    unchanged and only counts leave the join. This is the validation
    pass run after a VersionedLocalCatalog publish_version to quantify
    what the new snapshot changed."""
    t = Tables(spark, sf_dir)
    old = t.orders.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = t.orders.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, on="o_orderkey", how="full_outer")
    change = (
        F.when(F.col("o.o_orderstatus").isNull(), "added")
        .when(F.col("n.o_orderstatus").isNull(), "removed")
        .when(
            (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return joined.groupBy(change.alias("change_type")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "reshape_cdc_apply",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice, 'I' AS op, 0 AS ver
      FROM orders WHERE o_orderkey % 2 = 0
    ), changelog AS (
      SELECT o_orderkey,
             floor(o_totalprice * 1.1 * 100 + 0.5) / 100 AS o_totalprice,
             'U' AS op, 1 AS ver
      FROM orders WHERE o_orderkey % 4 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice, 'D' AS op, 2 AS ver
      FROM orders WHERE o_orderkey % 10 = 6
      UNION ALL
      SELECT o_orderkey + 1, o_totalprice, 'I' AS op, 1 AS ver
      FROM orders WHERE o_orderkey % 6 = 3
    ), unioned AS (
      SELECT * FROM base UNION ALL SELECT * FROM changelog
    ), latest AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY ver DESC, op) AS rn
      FROM unioned
    )
    SELECT o_orderkey, o_totalprice, op AS last_op
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def reshape_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: a base snapshot plus an I/U/D changelog
    merged into the post-image table. Upserts AND deletes in one pass —
    union, one keyed window rank by version (latest wins), filter out
    keys whose final op is a delete. This is the lakehouse MERGE INTO
    executed as a pure shuffle-once DataFrame plan: at 100 TB the window
    rank is the same single exchange a MERGE's join would pay, with
    map-side combine on the (usually tiny) changelog side and no
    driver-side state. The changelog here is synthesized
    deterministically from orders (updates for key%4, deletes for
    key%10=6, fresh inserts at key+1 for key%6=3) so the oracle replays
    the identical merge in SQL."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window as W

    o = t.orders
    base = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.lit("I").alias("op"),
            F.lit(0).alias("ver"),
        )
    )
    updates = (
        o.filter(F.col("o_orderkey") % 4 == 0)
        .select(
            "o_orderkey",
            (F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100).alias(
                "o_totalprice"
            ),
            F.lit("U").alias("op"),
            F.lit(1).alias("ver"),
        )
    )
    deletes = (
        o.filter(F.col("o_orderkey") % 10 == 6)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.lit("D").alias("op"),
            F.lit(2).alias("ver"),
        )
    )
    inserts = (
        o.filter(F.col("o_orderkey") % 6 == 3)
        .select(
            (F.col("o_orderkey") + 1).alias("o_orderkey"),
            "o_totalprice",
            F.lit("I").alias("op"),
            F.lit(1).alias("ver"),
        )
    )
    unioned = base.unionByName(updates).unionByName(deletes).unionByName(
        inserts
    )
    # ver DESC then op: an inserted key+1 can collide with an update of an
    # existing key at the same version — op breaks the tie deterministically
    rn = F.row_number().over(
        W.partitionBy("o_orderkey").orderBy(F.col("ver").desc(), "op")
    )
    return (
        unioned.withColumn("rn", rn)
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("o_orderkey", "o_totalprice", F.col("op").alias("last_op"))
    )
