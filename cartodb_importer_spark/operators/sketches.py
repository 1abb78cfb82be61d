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
