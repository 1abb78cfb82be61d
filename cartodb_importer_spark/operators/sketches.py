"""Distributed frequency sketches: count-min over DataFrames, HLL wrappers.

Scale rationale (the reference has no sketch surface; this is declared
engine surface for the 100 TB tier): exact per-key frequency over a 100 TB
fact table shuffles every distinct key. A count-min sketch is a fixed-size
(depth x width) counter grid whose rows are INDEPENDENTLY hash-partitioned
counts — in Spark that is just `groupBy(seed, bucket).count()`: map-side
partial aggregation compresses each task's output to at most depth*width
rows, so the shuffle is O(depth*width*tasks) regardless of input size, and
the sketch itself is mergeable by summing buckets (union of datasets =
`groupBy(seed, bucket).sum(cnt)` over the concatenated sketches).

The bucket function is a window of ONE md5 hex digest per value — row s
reads chars [s*hex_chars, (s+1)*hex_chars) — so depth costs substrings,
not extra digests (the same one-hash-many-slices discipline as minhash
banding; at 100 TB the hashes are the compute bill). md5, NOT xxhash64,
because md5 exists verbatim in DuckDB, which makes the whole sketch — and
the estimates read off it — value-for-value oracle-checkable. Width is
therefore always a power of 16 (16^hex_chars), and depth*hex_chars must
fit the 32 hex chars of one digest. A production variant would swap in
xxhash64 exactly like llm/dedup.py's minhash_signature_fast does.

For distinct-count (not frequency) sketches use the Apache DataSketches HLL
surface shipped with Spark (`hll_sketch_agg` / `hll_union_agg`) — see
queries/sketches.py:agg_hll_sketch_merge for the mergeability pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(col: Column, seed: int, hex_chars: int) -> Column:
    """Bucket id for CMS row `seed`: digest window
    ``md5(value)[seed*hex_chars : (seed+1)*hex_chars]``.

    One md5 per value regardless of depth. String-typed on purpose —
    hex->int conversion is not portable to the DuckDB oracle, and the
    bucket id only ever serves as a grouping/join key, so its type is
    irrelevant to the math.
    """
    return F.substring(
        F.md5(col.cast("string")), seed * hex_chars + 1, hex_chars
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 4, hex_chars: int = 2
) -> DataFrame:
    """Build a count-min sketch as a (seed, bucket, cnt) DataFrame.

    depth independent hash rows, width 16^hex_chars buckets per row. One
    explode (rows x depth) + one partially-aggregated shuffle capped at
    depth * 16^hex_chars groups. The result is tiny and broadcastable.
    """
    if depth * hex_chars > 32:
        raise ValueError(
            "depth * hex_chars must fit one md5 digest (32 hex chars)"
        )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("seed"),
                    cms_bucket(F.col(col), s, hex_chars).alias("bucket"),
                )
                for s in range(depth)
            ]
        )
    ).alias("r")
    return (
        df.select(rows)
        .select("r.seed", "r.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union of the sketched datasets == bucket-wise sum of their sketches."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    hex_chars: int = 2,
) -> DataFrame:
    """Point-query the sketch: est(v) = min over seeds of cnt[bucket_s(v)].

    Always an over-estimate (collisions only add). The probe side fans out
    to depth rows per value, broadcast-joins the (tiny) sketch on
    (seed, bucket), and takes the per-value min. Probes missing from every
    bucket would drop out of the inner join; coalesce keeps them at 0 via
    a left join.
    """
    if depth * hex_chars > 32:
        raise ValueError(
            f"depth*hex_chars must fit one md5 digest (32 hex chars); got "
            f"{depth}*{hex_chars} — mirror the parameters the sketch was "
            "built with"
        )
    fan = probes.select(
        F.col(probe_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        cms_bucket(F.col(probe_col), s, hex_chars).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("r"),
    ).select(probe_col, "r.seed", "r.bucket")
    joined = fan.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    return joined.groupBy(probe_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_freq")
    )


# ------------------------------------------------------------- quantile digest

def qdigest_build(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 128,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a per-group mergeable quantile digest (equi-depth centroids).

    The digest is the t-digest idea with a uniform scale function: sort the
    group's values, cut the cumulative weight into at most ``k`` equal
    chunks, and keep one (mean, weight) centroid per chunk. Stored as plain
    rows ``(group, chunk, mean, weight)`` — k rows per group regardless of
    group size, so a 100 TB fact table reduces to |groups| * k rows that can
    be persisted (e.g. one digest per day/partition) and later merged with
    :func:`qdigest_merge` WITHOUT rescanning the raw data. Rank error of any
    quantile read off the digest is bounded by the max chunk weight:
    ceil(n/k)/n ~ 1/k.

    Wholly JVM-side: one shuffle for the per-group sort window, one for the
    centroid aggregation (map-side combinable). The per-group sort is the
    honest cost of digest CONSTRUCTION; reads and merges never re-sort the
    data. (For a one-shot quantile with no reuse, prefer
    ``percentile_approx`` — the point here is mergeable persisted state.)
    """
    from pyspark.sql import Window

    ranked = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("g").orderBy(
                "v", *([tiebreak_col] if tiebreak_col else [])
            )
        ),
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
    return (
        ranked
        .withColumn(
            "chunk",
            # rn is 32-bit; cast before the multiply — (rn-1)*k overflows
            # IntegerType past ~2^31/k rows per group (~16.8M at k=128)
            ((F.col("rn").cast("bigint") - 1) * k / F.col("n")).cast("bigint"),
        )
        .groupBy("g", "chunk")
        .agg(
            F.avg("v").alias("mean"),
            F.count(F.lit(1)).cast("bigint").alias("weight"),
        )
    )


def qdigest_merge(centroids: DataFrame, k: int = 128) -> DataFrame:
    """Merge ALL groups' digests into one digest (group literal 'ALL').

    Concatenated centroids are re-sorted by mean and re-cut into ``k``
    equal-weight chunks keyed on the PRE-chunk cumulative weight (each new
    chunk's weight <= n/k + max input centroid weight, preserving the ~1/k
    rank-error bound). Input is |groups| * k rows — a few thousand — so the
    single-partition window here is a driver-free no-op at any fact-table
    scale; the raw data is never touched.
    """
    from pyspark.sql import Window

    n_total = centroids.groupBy().agg(F.sum("weight").alias("n_total"))
    w = Window.orderBy("mean", "g", "chunk")
    return (
        centroids.crossJoin(F.broadcast(n_total))
        .withColumn(
            "cumw_before",
            F.coalesce(
                F.sum("weight").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("newchunk", (F.col("cumw_before") * k / F.col("n_total")).cast("bigint"))
        .groupBy("newchunk")
        .agg(
            (F.sum(F.col("mean") * F.col("weight")) / F.sum("weight")).alias("mean"),
            F.sum("weight").alias("weight"),
        )
        .select(
            F.lit("ALL").alias("g"),
            F.col("newchunk").alias("chunk"),
            "mean",
            "weight",
        )
    )


def qdigest_quantiles(centroids: DataFrame, q_bps: list[int]) -> DataFrame:
    """Read quantile estimates off a digest: for each q (basis points), the
    mean of the first centroid whose cumulative weight reaches
    ceil(q * n / 10000).

    The digest is tiny (k rows per group), so the per-group window and the
    broadcast fan-out over the q list cost nothing; the raw data is not
    read. Returns ``(g, q_bps, est)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("mean", "chunk")
    cum = (
        centroids
        .withColumn("cumw", F.sum("weight").over(w))
        .withColumn("n", F.sum("weight").over(Window.partitionBy("g")))
    )
    qs = F.explode(F.array(*[F.lit(q) for q in q_bps])).alias("q_bps")
    return (
        cum.select("g", "mean", "cumw", "n", qs)
        .withColumn("target", F.ceil(F.col("q_bps") * F.col("n") / 10000.0))
        .where(F.col("cumw") >= F.col("target"))
        .groupBy("g", "q_bps")
        .agg(F.min_by("mean", "cumw").alias("est"))
    )
