"""Deduplication operators: exact, MinHash(+LSH banding), SimHash, and
n-gram Jaccard verification (north-star surface, BASELINE.json).

Design for 100 TB:

* Exact dedup never compares documents pairwise — it is a hash-groupBy
  (one shuffle on a 64-hex-char key, not on the document body).
* Near-dup never goes quadratic — MinHash banding buckets candidates so the
  self-join happens per-bucket; only candidates get the exact Jaccard check.
* All hashing is md5-based and content-deterministic: signatures are stable
  across runs, partitionings, and engines (which is also what makes them
  oracle-checkable in DuckDB — same md5, same mins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import tracked
from .textstats import words


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text. groupBy on sha2(text) — the
    shuffle key is 32 bytes regardless of document size."""
    key = F.sha2(F.col(text_col), 256).alias("__key")
    survivors = (
        df.select(key, F.col(id_col))
        .groupBy("__key")
        .agg(F.min(id_col).alias(id_col))
        .drop("__key")
    )
    return df.join(survivors, on=id_col, how="semi")


def shingle_regex(n: int) -> str:
    """Overlapping word-n-gram extraction pattern: a zero-width lookahead
    capture at every word boundary. ``regexp_extract_all(norm_text, pat,
    1)`` yields the n-gram starting at each word — the engine advances
    past the zero-width match one char, but the leading ``\\b`` only
    fires at word starts, so matches land exactly once per word. This
    stays inside whole-stage codegen; the previous higher-order-function
    construction (transform + per-element gets) evaluated interpreted at
    ~100us/shingle and cost 23s where this costs 1.4s (sf0.1 measured,
    identical output sets)."""
    return r"\b(?=((?:[a-z0-9]+ ){%d}[a-z0-9]+))" % (n - 1)


def norm_text(col: Column) -> Column:
    """Canonical text for shingling: lowercase, non-alnum runs to single
    spaces — exactly ``array_join(words(col), ' ')``."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def shingle_strings(col: Column, n: int) -> Column:
    """NON-distinct overlapping word n-grams of a raw text column, in
    document order. Fully codegen'd (regex, no HOFs)."""
    return F.regexp_extract_all(norm_text(col), F.lit(shingle_regex(n)), 1)


def shingles_of(ws: Column, n: int) -> Column:
    """Word n-gram shingles from a words ARRAY column (legacy HOF path —
    interpreted lambda evaluation; prefer ``shingles``/``shingle_frame``
    on the raw text column, which are ~17x faster via codegen'd regex).

    PERFORMANCE CONTRACT: ``ws`` must be a plain column reference (a
    materialized projection), not an expression tree. Higher-order-function
    lambdas re-evaluate every referenced expression per element (no common
    subexpression elimination in interpreted eval), so passing ``words(col)``
    directly turns this O(len) construction into O(len^2) per document."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0)))

    def shingle_at(i: Column) -> Column:
        return F.concat_ws(" ", *[F.get(ws, i + j) for j in range(n)])

    sh = F.transform(idx, shingle_at)
    return F.array_distinct(F.when(F.size(ws) >= n, sh).otherwise(F.array()))


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a raw text column — one codegen'd
    regex pass (see shingle_regex)."""
    return F.array_distinct(shingle_strings(col, n))


def _spread_narrow_scan(df: DataFrame, id_col: str) -> DataFrame:
    """Restore compute parallelism ahead of per-document hashing work.

    Shingling + per-shingle digests are CPU-bound and proportional to
    text volume, but a small parquet input (one row group) plans as ONE
    scan partition, serializing the whole corpus's regex+md5 work onto a
    single core (measured at sf0.1: the 4-band signature window frame
    4.4s -> 1.0s once spread). When the scan already has >= cluster
    parallelism partitions — the 100 TB case, where thousands of row
    groups split naturally — this is a NO-OP: no exchange is added, so
    the corpus text is never shuffled just to hash it. The spread keys on
    the id column (hash partitioning: deterministic under task retry,
    and no sort-before-repartition pass)."""
    sc = df.sparkSession.sparkContext
    n_par = sc.defaultParallelism
    try:
        if df.rdd.getNumPartitions() >= n_par:
            return df
    except Exception:  # noqa: BLE001 — planning failure: keep the plain scan
        return df
    return df.repartition(n_par, F.col(id_col))


def shingle_frame(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, distinct shingle array) straight off the text column, spread
    to cluster parallelism first (see _spread_narrow_scan) because every
    consumer immediately runs per-shingle digest work over the arrays.
    Projected to (id, text) BEFORE the conditional spread so a firing
    repartition moves only the two columns the shingling reads
    (guide §2.3 — project before the exchange)."""
    narrow = df.select(F.col(id_col), F.col(text_col))
    return _spread_narrow_scan(narrow, id_col).select(
        F.col(id_col), shingles(F.col(text_col), n).alias("__sh")
    )


def band_width(bands: int) -> int:
    """Hex chars of the md5 digest allotted to each band."""
    if not 1 <= bands <= 32:
        raise ValueError(
            f"bands must be in [1, 32] (one md5 digest is 32 hex chars); "
            f"got {bands} — band slices past the digest would read '' and "
            "bucket every document together"
        )
    return max(32 // bands, 1)


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature, one column per band.

    Cost discipline: ONE md5 per shingle, period. Band b's hash is an
    independent slice of that digest (hex chars [b*w, (b+1)*w)), so adding
    bands costs substrings, not digests — at 100 TB the md5s are the compute
    bill. The shingle array materializes once per row and every band's min
    reads the same hashed array.

    (r12-opt negative, measured: sharing ONE persisted shingle frame
    between this signature path and the verify stage's xxhash path was
    A/B'd SLOWER at the min (3.14 -> 3.85 s on the sf0.1 near-dedup
    pipeline) — caching the heavy string arrays costs more than
    re-running the scan-fused shingling once per consumer, so each path
    keeps its own fused evaluation.)"""
    w = band_width(bands)
    hashed = shingle_frame(df, text_col, id_col, n).select(
        F.col(id_col),
        F.transform(F.col("__sh"), lambda s: F.md5(s)).alias("__hs"),
    )
    return hashed.select(
        id_col,
        *[
            F.array_min(
                F.transform(
                    F.col("__hs"),
                    (lambda b_: lambda h: F.substring(h, b_ * w + 1, w))(b),
                )
            ).alias(f"mh_{b}")
            for b in range(bands)
        ],
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 8,
    n: int = 3,
    max_bucket: int = 1000,
    right_min_id: int | None = None,
) -> DataFrame:
    """LSH banding: documents sharing ANY band value become a candidate
    pair. The self-join is per (band, value) bucket — the only rows that
    meet are those already likely similar, so the join never goes
    quadratic in the corpus size.

    Degenerate-bucket guard: a hot band value (empty/boilerplate docs all
    sharing a signature slice) would make its bucket quadratic. Buckets
    larger than ``max_bucket`` switch to a STAR pattern — every member
    pairs with the bucket's min id only — which is linear in the bucket
    size yet still connects the whole bucket for the connected-components
    cluster pass. Recall tradeoff (documented, deliberate): in an
    oversized bucket, two docs similar to each other but NOT to the
    representative won't form a direct candidate pair.

    ``right_min_id`` is the incremental-dedup hook: with it set, only
    pairs whose HIGHER id is >= right_min_id emerge — i.e. pairs that
    involve at least one "new batch" document (ids at or above the
    cutoff). Bucket membership is still computed over the whole corpus
    (an old doc must be joinable as the pair's lower side), but the
    old x old quadratic work inside every bucket is skipped entirely —
    at 100 TB this is what makes per-snapshot dedup cost proportional
    to the BATCH, not the corpus."""
    sig = minhash_signature(df, text_col, id_col, bands, n)
    stacked = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"mh_{b}").alias("val")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select(
        id_col, F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    ).where(
        # docs with fewer than n words have NO shingles: array_min over the
        # empty hash array is NULL. Drop those rows here so short docs
        # consistently form zero candidates at ANY bucket size — otherwise
        # the window groups all NULLs into one mega-bucket (star-pattern
        # junk pairs) while the small-bucket equi-join drops them, a
        # discontinuity on bucket size. Exact dedup still covers them.
        F.col("val").isNotNull()
    )
    # One shuffle on (band, val) computes both the bucket size and the
    # bucket representative; persisted because the branches below read it
    # three times (without persist Spark recomputes shingle+md5 per read).
    w = Window.partitionBy("band", "val")
    annotated = stacked.select(
        id_col,
        "band",
        "val",
        F.count(F.lit(1)).over(w).alias("__bn"),
        F.min(id_col).over(w).alias("__rep"),
    )
    annotated = tracked(annotated.persist())
    # Spread the bucket rows across the cluster before the self-join:
    # the join's OUTPUT is quadratic per bucket (1.2M pairs from 20k
    # bucket rows at sf0.1) while its input is a few hundred KB, so AQE
    # sizes the join at 1 post-shuffle partition and the whole pair
    # expansion runs on one core (guide §2.5 — parallelism must follow
    # the work, not the input bytes). Keying the explicit repartition on
    # (band, val) keeps both self-join sides co-partitioned — the join
    # adds NO further exchange — and the fixed 2x-parallelism count is
    # scale-adaptive, not a local constant.
    n_spread = 2 * df.sparkSession.sparkContext.defaultParallelism
    small = (
        annotated.filter(F.col("__bn") <= max_bucket)
        .select(id_col, "band", "val")
        .repartition(n_spread, "band", "val")
    )
    left = small.alias("a")
    right = (
        small if right_min_id is None
        else small.filter(F.col(id_col) >= right_min_id)
    ).alias("b")
    pairs_small = left.join(
        right,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    big = annotated.filter(
        (F.col("__bn") > max_bucket) & (F.col(id_col) != F.col("__rep"))
    )
    if right_min_id is not None:
        big = big.filter(F.col(id_col) >= right_min_id)
    pairs_big = big.select(
        F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b")
    )
    return pairs_small.unionByName(pairs_big).distinct()


def _hashed_shingle_frame(
    df: DataFrame, text_col: str, id_col: str, n: int, hashed: bool
) -> DataFrame:
    """(id, sh) frame the verify stage joins on, persisted — both join
    sides (and near_dedup's size bound) read it."""
    sh = shingle_frame(df, text_col, id_col, n).withColumnRenamed("__sh", "sh")
    if hashed:
        sh = sh.select(
            id_col,
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("sh"),
        )
    return tracked(sh.persist())


def _candidate_shingle_join(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    hashed: bool,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Shared verify-stage scaffold for the pair scorers: shingle (and
    optionally xxhash64-compress) every doc ONCE (persisted — both join
    sides read it), then attach sh_a/sh_b arrays to each candidate pair.
    jaccard_pairs and containment_pairs differ only in the score
    expression they compute over this frame. ``sh`` lets a caller that
    already built the persisted hashed frame (near_dedup) pass it in —
    those callers (_bounded_jaccard_edges) have already spread their
    pair list, so the spread below is skipped for them."""
    if sh is None:
        sh = _hashed_shingle_frame(df, text_col, id_col, n, hashed)
        # spread the pair list before attaching arrays: the intersect/
        # union work is proportional to pairs x shingles, but AQE sizes
        # the pair frame's exchange by its (tiny) id-list bytes — the
        # all-candidate scorers measured their verify probes running on
        # 8 of 32 cores at sf0.1 (guide §2.5: parallelism must follow
        # the work, not the input bytes)
        pairs = pairs.repartition(
            2 * df.sparkSession.sparkContext.defaultParallelism,
            "id_a",
            "id_b",
        )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return pairs.join(a, "id_a").join(b, "id_b")


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hashed: bool = True,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify step after
    LSH banding).

    With ``hashed`` (default) each shingle string is xxhash64-compressed
    before the candidate join, so the two shingle arrays shuffled to every
    pair are array<long>, not array<string> — a 3-4x lighter payload on
    the hottest shuffle of the dedup pipeline. Set sizes (and therefore
    Jaccard) are preserved absent 64-bit collisions (~2^-64 per shingle
    pair — far below the similarity noise floor)."""
    joined = _candidate_shingle_join(
        df, pairs, text_col, id_col, n, hashed, sh
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "id_a",
        "id_b",
        F.round(F.when(union > 0, inter / union).otherwise(0.0), 4).alias(
            "jaccard"
        ),
    )


def containment_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hashed: bool = True,
) -> DataFrame:
    """Exact shingle-set CONTAINMENT |A∩B| / min(|A|,|B|) for candidate
    pairs — the asymmetric companion to :func:`jaccard_pairs` that
    catches subset duplication (a document wholly embedded in a longer
    one scores ~1.0 here but low on Jaccard, because the union is
    dominated by the longer side). Same join shape and hashed-shingle
    shuffle payload as jaccard_pairs."""
    joined = _candidate_shingle_join(df, pairs, text_col, id_col, n, hashed)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    smaller = F.least(F.size("sh_a"), F.size("sh_b"))
    return joined.select(
        "id_a",
        "id_b",
        F.round(
            F.when(smaller > 0, inter / smaller).otherwise(0.0), 4
        ).alias("containment"),
    )


def near_dedup_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: band -> candidates -> size-ratio prefilter
    -> exact Jaccard -> drop the higher-id member of every >= threshold
    pair.

    The verify stage is the pipeline's hot spot: every candidate pair
    ships two shingle-hash arrays through the join. Two result-identical
    optimizations (4.8s -> 2.9s on the sf0.1 documents bench):

    * ONE hashed shingle frame (persisted) feeds the size bound and both
      verify join sides, instead of re-shingling per consumer;
    * the size-ratio bound J(A,B) <= min(|A|,|B|)/max(|A|,|B|) prunes
      pairs that cannot reach ``threshold`` BEFORE their arrays move:
      only (id, n_shingles) ints join against the thin pair list, and
      the heavy array join runs on the ~1/3 surviving pairs (the classic
      length filter of exact similarity joins). The margin is 5e-5 + eps:
      the drop decision compares the 4-decimal HALF_UP-rounded jaccard,
      which pulls values as low as threshold - 0.00005 up to threshold,
      so the bound must admit that whole window to stay result-identical
      (a bare float epsilon would wrongly prune J in
      [threshold-5e-5, threshold)).

    An in-join variant of the bound (pruning inside the bucket
    self-join) was measured SLOWER here — it forces an extra shingle
    pass + shuffle join ahead of the bucket window — so the bound stays
    on the pair list."""
    cand = minhash_candidate_pairs(df, text_col, id_col, bands, n)
    to_drop = _verified_drop_ids(df, cand, threshold, text_col, id_col, n)
    return df.join(to_drop, on=id_col, how="anti")


def _bounded_jaccard_edges(
    df: DataFrame,
    cand: DataFrame,
    threshold: float,
    text_col: str,
    id_col: str,
    n: int,
) -> DataFrame:
    """Shared verify stage of EVERY near-dedup pipeline (pairwise,
    incremental, and the connected-components family): size-ratio bound
    -> exact Jaccard -> the (id_a, id_b, jaccard) pairs at or above
    ``threshold``. ONE home for the 5e-5 + 1e-9 rounding margin (the
    drop decision compares the 4-decimal HALF_UP-rounded jaccard — see
    near_dedup_minhash's docstring), so a threshold-semantics change
    can't silently diverge between the variants.

    The bound J(A,B) <= min|.|/max|.| prunes pairs that cannot reach the
    threshold BEFORE their shingle arrays move: only (id, n_shingles)
    ints join against the thin pair list, and the heavy array join runs
    on the surviving fraction (~1/3 at sf0.1). Pruned pairs score
    strictly below the rounded threshold, so the >= filter output is
    identical with or without the bound."""
    sh = _hashed_shingle_frame(df, text_col, id_col, n, hashed=True)
    # shingles() is already distinct, so the set size is the array size;
    # sizes read from the SAME persisted frame the verify join uses.
    sizes = sh.select(F.col(id_col), F.size("sh").alias("ns"))
    bounded = (
        cand.join(
            sizes.select(
                F.col(id_col).alias("id_a"), F.col("ns").alias("ns_a")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("id_b"), F.col("ns").alias("ns_b")
            ),
            "id_b",
        )
        .filter(
            F.least("ns_a", "ns_b")
            >= F.greatest("ns_a", "ns_b") * (threshold - 5e-5) - 1e-9
        )
        .select("id_a", "id_b")
        # spread before the verify join: the surviving pair list is a few
        # MB of ids (AQE coalesces it to ~1 partition) but the next stage
        # attaches two shingle arrays per pair and intersects them — the
        # expensive work is proportional to pairs x shingles, so it must
        # run at cluster parallelism, not at the id-list's byte size
        # (guide §2.5; same disease as the LSH bucket self-join above)
        .repartition(
            2 * df.sparkSession.sparkContext.defaultParallelism,
            "id_a",
            "id_b",
        )
    )
    scored = jaccard_pairs(df, bounded, text_col, id_col, n, sh=sh)
    return scored.filter(F.col("jaccard") >= threshold)


def _verified_drop_ids(
    df: DataFrame,
    cand: DataFrame,
    threshold: float,
    text_col: str,
    id_col: str,
    n: int,
) -> DataFrame:
    """Distinct higher-id members of the verified >= threshold pairs —
    the pairwise drop rule over :func:`_bounded_jaccard_edges`."""
    return (
        _bounded_jaccard_edges(df, cand, threshold, text_col, id_col, n)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )


def incremental_near_dedup(
    df: DataFrame,
    cutoff: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Snapshot-ingestion near-dedup: docs with id >= ``cutoff`` are the
    NEW batch; return the batch members that survive dedup against BOTH
    the existing corpus (ids below the cutoff, never themselves dropped)
    and earlier-id batch members. Same LSH band -> size-ratio bound ->
    exact-Jaccard verify chain as :func:`near_dedup_minhash`, but
    candidate generation skips every old x old pair
    (``right_min_id`` in minhash_candidate_pairs), so per-snapshot cost
    scales with the batch, not the corpus — the shape that lets a 100 TB
    corpus absorb daily drops without weekly full re-dedups. (At real
    scale the corpus-side signatures/shingles would be read from a
    persisted table instead of recomputed; the plan shape is
    identical.)"""
    cand = minhash_candidate_pairs(
        df, text_col, id_col, bands, n, right_min_id=cutoff
    )
    to_drop = _verified_drop_ids(df, cand, threshold, text_col, id_col, n)
    return df.filter(F.col(id_col) >= cutoff).join(
        to_drop, on=id_col, how="anti"
    )


def simhash16(col: Column) -> Column:
    """16-bit SimHash over the token set, one bit per md5 nibble MSB.

    For each token, md5 yields 16 leading nibbles; bit b of the signature is
    the sign of sum over tokens of (+1 if nibble_b >= 8 else -1). Near-dup
    docs differ in few bits (compare via Hamming distance). Portable to any
    engine with md5 + substring."""
    ws = F.array_distinct(words(col))
    # hash each token ONCE and let every bit read its nibble from the
    # cached digest string: the previous per-bit transform recomputed
    # F.md5(w) inside all 16 lambdas — interpreted HOFs get no common-
    # subexpression elimination, so each token was md5'd 16x (r12:
    # 3.5 -> ~1.0 s at sf0.1 with the scan spread). Same digests, same
    # votes, same signature.
    hs = F.transform(ws, lambda w: F.md5(w))

    def vote_at(pos: int):
        # single-parameter lambda: pyspark would bind the array index to a
        # second parameter, shadowing a default-arg closure
        return lambda h: F.when(
            F.substring(h, pos, 1).isin(
                "8", "9", "a", "b", "c", "d", "e", "f"
            ),
            1,
        ).otherwise(-1)

    bits = []
    for b in range(16):
        nib = F.transform(hs, vote_at(b + 1))
        vote = F.aggregate(nib, F.lit(0), lambda acc, x: acc + x)
        bits.append(F.when(vote > 0, F.lit(2**b)).otherwise(F.lit(0)))
    total = bits[0]
    for c in bits[1:]:
        total = total + c
    return total


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhashes (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def near_dedup_ml_minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 5,
    threshold: float = 0.6,
    num_features: int = 1 << 18,
    seed: int = 42,
):
    """pyspark.ml MinHashLSH variant (HashingTF shingle features +
    approxSimilarityJoin). Used for scale benchmarking; the md5 formulation
    above is the oracle-checkable one."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(id_col, shingles(F.col(text_col)).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features)
    feats = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, threshold, distCol="jaccard_dist")
    return pairs.filter(
        F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}")
    ).select(
        F.col(f"datasetA.{id_col}").alias("id_a"),
        F.col(f"datasetB.{id_col}").alias("id_b"),
        F.round(1 - F.col("jaccard_dist"), 4).alias("jaccard_sim"),
    )


def _cc_round(edges: DataFrame, labels: DataFrame, jump: bool) -> DataFrame:
    """One connected-components superstep, factored out so the plan-audit
    suite pins its shuffle topology per round (test_plan_audit.py):
    neighbor-min join + aggregate, label step, and (from round 3) the
    pointer jump. Returns (id, __prev, component)."""
    neighbor_min = (
        edges.join(labels, edges.dst == labels.id)
        .groupBy("src")
        .agg(F.min("component").alias("nbr_component"))
    )
    # Carry the previous label alongside the new one so convergence is
    # a filter over this already-persisted frame — not a second join
    # of updated-vs-labels (one fewer shuffle per round).
    stepped = labels.join(
        neighbor_min, labels.id == neighbor_min.src, "left"
    ).select(
        "id",
        F.col("component").alias("__prev"),
        F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_component"), F.col("component")),
        ).alias("component"),
    )
    if jump:
        # pointer jump: component := min(component, label[component]).
        # Labels only ever shrink, and a node's label is always a node
        # id present in `stepped`, so the lookup join is total in
        # practice (left + coalesce guards the own-id case). This is
        # what turns diameter-bound convergence into log-bound.
        # ADAPTIVE: the jump join only joins the game from round 3 —
        # real near-dup graphs are dense and shallow (diameter <= ~3,
        # converged before the jump would fire), so they pay zero
        # overhead; a component still unconverged after two plain
        # rounds is deep, and from here depth halves per round, so
        # max_iterations=20 covers diameter ~2^18.
        # Checkpoint BEFORE self-joining: both sides of the jump join
        # reference `stepped`, so without this the neighbor-min join
        # subtree is evaluated twice per round (ADVICE r06).
        stepped = stepped.localCheckpoint(eager=False)
        lookup = stepped.select(
            F.col("id").alias("__lid"),
            F.col("component").alias("__lcomp"),
        )
        stepped = stepped.join(
            lookup, stepped.component == F.col("__lid"), "left"
        ).select(
            "id",
            "__prev",
            F.least(
                F.col("component"),
                F.coalesce(F.col("__lcomp"), F.col("component")),
            ).alias("component"),
        )
    return stepped


#: Edge count at or below which connected_components solves the graph
#: with a driver-side union-find over the (already materialized) edge
#: list instead of BSP rounds. Like autoBroadcastJoinThreshold this is a
#: DRIVER-MEMORY bound, not a cluster-size tunable: 200k symmetric edges
#: collect to a few MB. The BSP path is byte-for-byte unchanged above
#: the threshold — at 100 TB the edge list never fits and every round
#: still iterates as shuffles.
CC_DRIVER_EDGE_THRESHOLD = int(
    __import__("os").environ.get("SPARK_GRAFT_CC_DRIVER_EDGES", "200000")
)


def _driver_union_find(rows):
    """Min-id union-find over collected (src, dst) rows: component =
    smallest reachable id, exactly the BSP fixpoint. Path-halving +
    union-by-min keeps it near-linear; deterministic for any orderable
    id type."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for src, dst in rows:
        if src not in parent:
            parent[src] = src
        if dst not in parent:
            parent[dst] = dst
        ra, rb = find(src), find(dst)
        if ra != rb:
            # union by MIN id so every root is its component's minimum
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(x, find(x)) for x in parent]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    driver_edge_threshold: int | None = None,
) -> DataFrame:
    """Connected components over a similarity-pair edge list: returns
    (id, component) where component is the smallest id reachable from id.

    Min-label propagation ACCELERATED by pointer jumping: each round every
    node adopts the minimum of (its label, its neighbors' labels, its
    label's label). Plain neighbor propagation needs diameter rounds — a
    length-d near-dup chain (sliding quote chains in web corpora produce
    exactly these) would need d rounds, and a bounded iteration cap would
    silently return WRONG labels past it. The label-of-label jump halves
    the remaining chain depth every round, so convergence is
    O(log diameter): the default 20 rounds cover diameter ~2^18 —
    unreachable by any realistic pair graph. (The jump is adaptive: it
    joins from round 3, so shallow graphs — the common case — never pay
    its extra join.) Each round is two keyed joins + one aggregate;
    no driver-side graph state, so a 100 TB edge list iterates entirely
    as shuffles. (The alternating large-star/small-star rewrite converges
    similarly but re-materializes the edge set per round; with the static
    edge list + jump the heaviest frame never changes.)

    This is the cluster step of full near-dedup: survivors = one doc per
    component (the component id itself, being the min doc id).
    """
    # localCheckpoint (not persist): each round's frame references the
    # previous one, so with plain persist the logical plan GROWS per round
    # and Catalyst re-analyzes the whole history every iteration — the
    # classic iterative-algorithm trap. Checkpointing truncates lineage,
    # keeping per-round planning cost O(1). (On a real cluster prefer
    # reliable checkpoint() to survive executor loss; localCheckpoint is
    # the right latency tradeoff for bounded round counts.)
    # ONE explode pass emits both directions: the previous two-branch
    # union evaluated the whole upstream pair pipeline twice (for the
    # near-dedup family that upstream is the LSH-candidate + Jaccard
    # verify — its exchanges dedupe via reuse but the per-branch join
    # probe and array-intersect work ran again; measured ~2.5s/branch
    # at sf0.1). Guide §2.4 — remove shuffles/passes outright.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # lazy: the labels checkpoint job below is the first (and only)
        # computation of the verify-pipeline subtree, and it persists the
        # edge partitions as a side effect — one job materializes both
        # frames instead of paying a dedicated edges pass first.
        .localCheckpoint(eager=False)
    )
    # Small-graph fast path (r13): the convergence loop's cost at low
    # edge counts is pure per-round JOB overhead (each round = a lazy
    # checkpoint + joins + one aggregate action over a frame of a few
    # hundred rows — measured 1.4 s of llm_dedup_keep_best's 4.2 s at
    # sf0.1 for 2 rounds). One count() materializes the checkpointed
    # edge list (the same single evaluation of the upstream verify
    # pipeline the labels checkpoint used to pay); if the graph fits the
    # driver bound, a union-find over the collected edges produces the
    # IDENTICAL (id, min-reachable-id) labels with zero further jobs.
    # Above the bound nothing changes: same rounds, same plans.
    thresh = (
        CC_DRIVER_EDGE_THRESHOLD
        if driver_edge_threshold is None
        else driver_edge_threshold
    )
    n_edges = edges.count()
    if n_edges <= thresh:
        from pyspark.sql import types as _st

        id_type = edges.schema["src"].dataType
        spark = pairs.sparkSession
        labeled = _driver_union_find(
            (r["src"], r["dst"]) for r in edges.collect()
        )
        schema = _st.StructType(
            [
                _st.StructField("id", id_type),
                _st.StructField("component", id_type),
            ]
        )
        return spark.createDataFrame(labeled, schema)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for i in range(max_iterations):
        # ONE action per round (was two: an eager checkpoint job plus a
        # separate filter/limit convergence count): the lazy checkpoint
        # is materialized by the convergence aggregate itself — the agg
        # computes every partition, so the persisted frame the next
        # round reads is complete — and the same job returns the
        # changed-label count.
        updated = _cc_round(edges, labels, jump=i >= 2).localCheckpoint(
            eager=False
        )
        changed = updated.agg(
            F.sum((F.col("component") < F.col("__prev")).cast("int"))
        ).first()[0]
        labels = updated.select("id", "component")
        if not changed:
            break
    return labels


def dedup_components(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Cluster-aware near-dedup: band -> candidates -> Jaccard filter ->
    connected components -> keep exactly ONE doc per component (the min
    id). Pairwise dropping (near_dedup_minhash) can over-delete on chains
    (a~b, b~c but a!~c drops both b and c); component dedup keeps one
    representative per transitive cluster."""
    comps = _near_dup_components(df, threshold, text_col, id_col, bands, n)
    drop = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, on=id_col, how="anti")


def _near_dup_components(
    df: DataFrame,
    threshold: float,
    text_col: str,
    id_col: str,
    bands: int,
    n: int,
) -> DataFrame:
    """Shared candidate -> Jaccard-edge -> connected-components stage of
    the cluster-aware dedup variants (min-id and keep-best survivor
    rules differ only in what they do with the components). The edge
    verify runs through the same size-ratio-bounded stage as the
    pairwise pipelines (:func:`_bounded_jaccard_edges`) — previously
    this family scored EVERY candidate pair (3x the array-join work at
    sf0.1 for an identical >= threshold edge set)."""
    cand = minhash_candidate_pairs(df, text_col, id_col, bands, n)
    edges = _bounded_jaccard_edges(df, cand, threshold, text_col, id_col, n)
    return connected_components(edges)


def dedup_components_keep_best(
    df: DataFrame,
    score_col: str | Column,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Quality-aware cluster dedup: same near-dup components as
    :func:`dedup_components`, but each component keeps its HIGHEST-
    scoring member (ties broken by min id) instead of the min id.

    This is how production corpus dedup actually picks survivors (keep the
    longest / highest-quality copy of a boilerplate cluster, not an
    arbitrary one). Cost over dedup_components: one extra join of the
    component frame against the per-doc scores plus a per-component
    window — both keyed shuffles on data already bounded by the number of
    CLUSTERED docs (typically a few percent of the corpus), so the added
    work does not scale with corpus size.

    ``score_col`` may be a column NAME already computed on ``df``, or a
    Column EXPRESSION over ``df``'s columns. Pass the expression form when
    the score is expensive per-doc work (regex heuristics): a named column
    is evaluated for EVERY corpus row below the member join (Catalyst
    never lifts a projection above a join), while the expression form is
    computed AFTER the component join restricts the frame to clustered
    members only — the same handful of docs the window actually ranks
    (r12-opt: 477 of 5000 docs at sf0.1). Identical survivor choice by
    construction: only member rows' scores ever reach the window."""
    comps = _near_dup_components(df, threshold, text_col, id_col, bands, n)
    if isinstance(score_col, Column):
        member = comps.join(
            df.withColumnRenamed(id_col, "id"), "id"
        ).select("id", "component", score_col.alias("__s"))
    else:
        member = comps.join(
            df.select(
                F.col(id_col).alias("id"), F.col(score_col).alias("__s")
            ),
            "id",
        )
    w = Window.partitionBy("component").orderBy(
        F.col("__s").desc(), F.col("id").asc()
    )
    drop = (
        member.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(drop, on=id_col, how="anti")


def minhash_signature_fast(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Production-speed MinHash: ONE xxhash64 per shingle (native codegen,
    no hex strings), bands = 16-bit slices of the 64-bit hash. Same API and
    banding semantics as minhash_signature; NOT oracle-portable (DuckDB has
    no xxhash64), so correctness is pinned by tests comparing banding
    behavior, not by the SQL oracle. Use this at 100 TB; use the md5 form
    where cross-engine verification matters."""
    if bands > 4:
        raise ValueError("fast variant packs at most 4 16-bit bands")
    hashed = shingle_frame(df, text_col, id_col, n).select(
        F.col(id_col),
        F.transform(F.col("__sh"), lambda s: F.xxhash64(s)).alias("__hs"),
    )
    cols = []
    for b in range(bands):
        shift = 16 * b
        cols.append(
            F.array_min(
                F.transform(
                    F.col("__hs"),
                    (lambda sh: lambda h: F.shiftrightunsigned(h, sh)
                     .bitwiseAND(F.lit(0xFFFF)))(shift),
                )
            ).alias(f"mh_{b}")
        )
    return hashed.select(id_col, *cols)
