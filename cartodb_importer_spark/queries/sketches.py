"""Sketch query surface: count-min frequency estimation (oracle-checked,
md5-portable) and DataSketches HLL distinct-count merge (rows-only — the
estimator is Apache DataSketches, which DuckDB does not ship).

Declared engine surface for the 100 TB tier (the reference computes only
exact count(*), importer.rb:339): sketches bound shuffle width by sketch
size instead of by distinct-key count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches as SK
from ..caching import tracked
from . import Tables, query

_DEPTH = 4
_HEX = 2  # width = 16^2 = 256 buckets per row
_PROBES = [1, 2, 3, 4, 5]  # partkeys present at every scale factor


@query(
    "agg_cms_frequency",
    oracle=f"""
    WITH seeds AS (SELECT unnest([0,1,2,3]) AS seed),
    sketch AS (
      SELECT seed,
             substr(md5(l_partkey::VARCHAR), seed * {_HEX} + 1, {_HEX})
               AS bucket,
             count(*) AS cnt
      FROM lineitem, seeds
      GROUP BY 1, 2
    ),
    probes AS (SELECT unnest({_PROBES}) AS probe_key),
    fan AS (
      SELECT probe_key, seed,
             substr(md5(probe_key::VARCHAR), seed * {_HEX} + 1, {_HEX})
               AS bucket
      FROM probes, seeds
    ),
    est AS (
      SELECT probe_key, min(coalesce(cnt, 0)) AS est_freq
      FROM fan LEFT JOIN sketch USING (seed, bucket)
      GROUP BY 1
    ),
    truth AS (
      SELECT l_partkey AS probe_key, count(*) AS true_freq
      FROM lineitem WHERE l_partkey IN (SELECT probe_key FROM probes)
      GROUP BY 1
    )
    SELECT probe_key, est_freq, coalesce(true_freq, 0) AS true_freq
    FROM est LEFT JOIN truth USING (probe_key)
    """,
)
def agg_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries on l_partkey, alongside the exact
    count for the probed keys. est_freq >= true_freq always (collisions
    only add); at 100 TB the sketch build is the only full scan and its
    shuffle is capped at depth*width rows per task regardless of input
    size. The probe keys are literals so the query is self-contained."""
    t = Tables(spark, sf_dir)
    sketch = SK.cms_build(t.lineitem, "l_partkey", depth=_DEPTH, hex_chars=_HEX)
    probes = spark.createDataFrame(
        [(k,) for k in _PROBES], "probe_key bigint"
    )
    est = SK.cms_estimate(
        sketch, probes, "probe_key", depth=_DEPTH, hex_chars=_HEX
    )
    truth = (
        t.lineitem.filter(F.col("l_partkey").isin(_PROBES))
        .groupBy(F.col("l_partkey").alias("probe_key"))
        .agg(F.count(F.lit(1)).alias("true_freq"))
    )
    return est.join(F.broadcast(truth), "probe_key", "left").select(
        "probe_key",
        "est_freq",
        F.coalesce("true_freq", F.lit(0)).alias("true_freq"),
    )


@query(
    "agg_hll_sketch_merge",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           CAST(1 AS INT) AS within_bounds
    FROM orders GROUP BY 1
    UNION ALL
    SELECT 'ALL',
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(1 AS INT)
    FROM orders
    """,
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count: per-group Apache DataSketches HLL sketches
    of o_custkey, re-merged into an ALL row WITHOUT rescanning the input —
    `hll_union_agg` over the already-built group sketches. This is the
    100 TB pattern for distinct counts across rollup levels: sketch once,
    merge everywhere (vs approx_count_distinct which cannot reuse partial
    state across grouping sets).

    The sketch estimate is engine-specific; its error contract is not —
    each row emits the exact distinct plus a flag asserting the estimate
    (including the MERGED one) lands within 5% of it, and the oracle
    pins the flag (default lgK=12 keeps HLL rse ~1.6%; 5% ≈ 3 sigma)."""
    t = Tables(spark, sf_dir)
    per_group = t.orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_distinct"),
    )
    groups = per_group.select(
        "o_orderpriority",
        "exact_distinct",
        F.hll_sketch_estimate("sk").alias("est"),
    )
    merged_exact = t.orders.agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    merged = (
        per_group.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(F.broadcast(merged_exact))
        .select(
            F.lit("ALL").alias("o_orderpriority"),
            "exact_distinct",
            F.hll_sketch_estimate("sk").alias("est"),
        )
    )
    return groups.unionByName(merged).select(
        "o_orderpriority",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).cast("int").alias("within_bounds"),
    )


@query(
    "agg_kmv_distinct",
    oracle="""
    WITH hashes AS (
      SELECT DISTINCT l_returnflag,
             CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS h
      FROM lineitem
    ), survivors AS (
      SELECT l_returnflag, h,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM hashes WHERE h < 0.25
    ), kth AS (
      SELECT l_returnflag, h AS kth_min FROM survivors WHERE rn = 64
    ), truth AS (
      SELECT l_returnflag, count(DISTINCT l_partkey) AS true_distinct
      FROM lineitem GROUP BY 1
    )
    SELECT k.l_returnflag,
           CAST(floor(63.0 / k.kth_min + 0.5) AS BIGINT) AS est_distinct,
           t.true_distinct
    FROM kth k JOIN truth t USING (l_returnflag)
    """,
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimate per group — the
    DETERMINISTIC sketch: est = (k-1)/h_(k) over md5-derived uniform
    hashes, so unlike HLL/approx_count_distinct the estimate itself is
    value-checkable against the oracle (same hashes, same k-th minimum,
    same integer estimate), with the exact count alongside.

    Scale shape: the threshold prefilter (h < t) pushes to the scan and
    bounds what shuffles to t * D distinct hashes per group; the k-th
    minimum then comes from a per-group sort of that small survivor set.
    The static t must satisfy k/D < t (else a group has < k survivors and
    drops out — detectable, not silent); a production variant replaces
    the threshold with a mergeable bounded-heap UDAF so t needs no
    tuning. k = 64 gives ~12% relative error (1/sqrt(k))."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    h = (
        F.conv(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / 4294967296.0
    )
    hashes = (
        t.lineitem.select("l_returnflag", h.alias("h"))
        .filter(F.col("h") < 0.25)
        .distinct()
    )
    w = Window.partitionBy("l_returnflag").orderBy("h")
    kth = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 64)
        .select("l_returnflag", F.col("h").alias("kth_min"))
    )
    truth = t.lineitem.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("true_distinct")
    )
    return kth.join(truth, "l_returnflag").select(
        "l_returnflag",
        F.floor(63.0 / F.col("kth_min") + 0.5).cast("long").alias("est_distinct"),
        "true_distinct",
    )


@query(
    "agg_kmv_setops",
    oracle="""
    WITH m AS (
      SELECT DISTINCT o_orderpriority AS g, o_custkey,
             CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS h
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), s AS (
      SELECT g, h FROM m WHERE h < 0.25
    ), kth_g AS (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        FROM s) WHERE rn = 64
    ), kth_u AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM s)) WHERE rn = 64
    ), est AS (
      SELECT
        (SELECT CAST(floor(63.0 / h + 0.5) AS BIGINT) FROM kth_g WHERE g = '1-URGENT') AS est_urgent,
        (SELECT CAST(floor(63.0 / h + 0.5) AS BIGINT) FROM kth_g WHERE g = '2-HIGH')   AS est_high,
        (SELECT CAST(floor(63.0 / h + 0.5) AS BIGINT) FROM kth_u)                      AS est_union
    ), truth AS (
      SELECT count(*) AS true_intersect FROM (
        SELECT o_custkey FROM m GROUP BY 1 HAVING count(DISTINCT g) = 2)
    )
    SELECT est_urgent, est_high, est_union,
           greatest(est_urgent + est_high - est_union, 0) AS est_intersect,
           true_intersect,
           floor(greatest(est_urgent + est_high - est_union, 0) * 1.0
                 / est_union * 10000 + 0.5) / 10000 AS jaccard_est
    FROM est, truth
    """,
)
def agg_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set-algebra: KMV sketches of two customer populations
    (urgent-order vs high-order customers) merged WITHOUT rescanning the
    raw keys — union estimate from the k-th minimum of the merged hash
    sets, intersection by inclusion-exclusion, Jaccard from the two.
    This is why mergeable sketches matter at 100 TB: per-partition (or
    per-day) sketches of ~k hashes union into global distinct/overlap
    estimates with no second pass over the data. md5-derived hashes keep
    every estimate deterministic, so even the sketch OUTPUTS are
    value-checked (true intersection alongside). The final 1-row
    assembly cross-joins single-row frames — allowlisted broadcast
    scalars, not a data cartesian."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    m = (
        t.orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .select(F.col("o_orderpriority").alias("g"), "o_custkey")
        .distinct()
        .select(
            "g",
            "o_custkey",
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("o_custkey").cast("string")), 1, 8
                    ),
                    16,
                    10,
                ).cast("double")
                / 4294967296.0
            ).alias("h"),
        )
    )
    s = m.filter(F.col("h") < 0.25).select("g", "h")
    wg = Window.partitionBy("g").orderBy("h")
    kth_g = (
        s.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") == 64)
        .select("g", "h")
    )
    # per-group estimates assembled by AGGREGATING the (0..2-row) kth
    # frame: an aggregate over empty input still yields one row of NULLs,
    # matching the oracle's scalar subqueries when a sketch has fewer
    # than k survivors (sf0.001 edge; a filter-then-crossJoin formulation
    # returned 0 rows there)
    est_expr = F.floor(63.0 / F.col("h") + 0.5).cast("long")
    uab = kth_g.agg(
        F.max(F.when(F.col("g") == "1-URGENT", est_expr)).alias("est_urgent"),
        F.max(F.when(F.col("g") == "2-HIGH", est_expr)).alias("est_high"),
    )
    # union k-th minimum via TakeOrdered (per-partition top-k, merged on
    # the driver side of the exchange) — never a single-partition global
    # window, so the merged-sketch rank distributes at any survivor count;
    # the count guards the under-filled case (max of <64 rows is not the
    # k-th minimum)
    kth_u = s.select("h").distinct().orderBy("h").limit(64).agg(
        F.max("h").alias("h"), F.count(F.lit(1)).alias("n")
    )
    est_u = kth_u.select(
        F.when(
            F.col("n") == 64, F.floor(63.0 / F.col("h") + 0.5).cast("long")
        ).alias("est_union")
    )
    truth = (
        m.groupBy("o_custkey")
        .agg(F.count_distinct("g").alias("ng"))
        .filter(F.col("ng") == 2)
        .agg(F.count(F.lit(1)).alias("true_intersect"))
    )
    est_int = F.greatest(
        F.col("est_urgent") + F.col("est_high") - F.col("est_union"),
        F.lit(0).cast("long"),
    )
    return (
        uab.crossJoin(F.broadcast(est_u))
        .crossJoin(F.broadcast(truth))
        .select(
            "est_urgent",
            "est_high",
            "est_union",
            est_int.alias("est_intersect"),
            "true_intersect",
            (
                F.floor(
                    est_int * 1.0 / F.col("est_union") * 10000 + 0.5
                )
                / 10000
            ).alias("jaccard_est"),
        )
    )


_QD_K = 128  # centroids per digest; rank error <= ~1/K per read
_QD_BPS = [2500, 5000, 9000, 9900]  # quantiles checked, in basis points
_QD_TOL = 500  # contract tolerance in bps (0.05 >> 4/K = 0.031)


@query(
    "agg_tdigest_quantiles",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderpriority AS g, o_totalprice AS v,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
      UNION ALL
      SELECT 'ALL', o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey),
             count(*) OVER ()
      FROM orders
    ), qs AS (
      SELECT * FROM (VALUES {','.join(f'({q})' for q in _QD_BPS)}) t(q_bps)
    )
    SELECT r.g, qs.q_bps, r.v AS exact_disc,
           CAST(1 AS INT) AS within_bounds
    FROM ranked r JOIN qs
      ON r.rn = CAST(ceil(qs.q_bps * r.n / 10000.0) AS BIGINT)
    """,
)
def agg_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile digest (t-digest with a uniform scale function):
    per-group equi-depth centroids built once from o_totalprice, then
    (a) group quantiles read off each group's digest and (b) an ALL row
    whose digest is MERGED from the group digests without rescanning
    orders — the 100 TB pattern for percentiles across rollup levels
    (one digest per day/partition, merge everywhere; percentile_approx
    cannot reuse partial state across grouping sets).

    The digest estimate is formulation-specific; its rank-error contract
    is not — each (group, q) row emits the exact lower-discrete quantile
    (a real data value, bitwise identical across engines — no
    interpolation arithmetic) plus a flag asserting the digest estimate
    lands between the exact quantiles at q +/- 5% rank (digest bound:
    max chunk weight ~2/K = 1.6% rank each side), and the oracle pins
    the flag. Exact ranks are computed here only to CHECK the sketch;
    production reads touch the k-row digests alone."""
    from pyspark.sql import Window as W

    from ..operators.sketches import (
        qdigest_build,
        qdigest_merge,
        qdigest_quantiles,
    )

    t = Tables(spark, sf_dir)
    groups = tracked(qdigest_build(
        t.orders, "o_orderpriority", "o_totalprice", k=_QD_K,
        tiebreak_col="o_orderkey",
    ).persist())
    digest = groups.unionByName(qdigest_merge(groups, k=_QD_K))
    est = qdigest_quantiles(digest, _QD_BPS)

    # exact discrete quantiles (value at rank ceil(q*n)) for the contract,
    # over groups and globally; tiebreak on o_orderkey for determinism
    ranked_g = t.orders.select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").alias("v"),
        F.row_number()
        .over(
            W.partitionBy("o_orderpriority").orderBy(
                "o_totalprice", "o_orderkey"
            )
        )
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("o_orderpriority")).alias("n"),
    )
    ranked_all = t.orders.select(
        F.lit("ALL").alias("g"),
        F.col("o_totalprice").alias("v"),
        F.row_number().over(W.orderBy("o_totalprice", "o_orderkey")).alias("rn"),
        F.count(F.lit(1)).over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("n"),
    )
    ranked = ranked_g.unionByName(ranked_all)

    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QD_BPS])).alias("q_bps")
    )
    rq = ranked.crossJoin(F.broadcast(qs))
    bounds = (
        rq.groupBy("g", "q_bps")
        .agg(
            F.min_by(
                "v",
                F.when(
                    F.col("rn")
                    >= F.ceil(
                        F.greatest(F.col("q_bps") - _QD_TOL, F.lit(1))
                        * F.col("n")
                        / 10000.0
                    ),
                    F.col("rn"),
                ),
            ).alias("lo"),
            F.min_by(
                "v",
                F.when(
                    F.col("rn")
                    >= F.least(
                        F.ceil((F.col("q_bps") + _QD_TOL) * F.col("n") / 10000.0),
                        F.col("n"),
                    ),
                    F.col("rn"),
                ),
            ).alias("hi"),
            F.min_by(
                "v",
                F.when(
                    F.col("rn") >= F.ceil(F.col("q_bps") * F.col("n") / 10000.0),
                    F.col("rn"),
                ),
            ).alias("exact_disc"),
        )
    )
    return bounds.join(est, ["g", "q_bps"]).select(
        "g",
        "q_bps",
        "exact_disc",
        (
            (F.col("est") >= F.col("lo")) & (F.col("est") <= F.col("hi"))
        ).cast("int").alias("within_bounds"),
    )
