"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one scan, JVM-side fold for the dot
product (F.aggregate/zip_with, no UDF), TakeOrdered for the top-k. This is
the exact answer and scales linearly; at 100 TB the scan dominates.

Scale path: IVF (inverted file) — k-means centroids (seeded, trained on a
sample), each vector assigned to its nearest centroid at write time; queries
probe only the closest nprobe cells, cutting the scan by ~k/nprobe. An
LSH-bucketed variant (random hyperplane signs) is sketched for streaming
ingest where centroids can't be retrained.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query vector is a literal array folded into the plan (broadcast by
    value); orderBy+limit plans as TakeOrderedAndProject, so no global sort
    ever materializes."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        F.round(cosine(v, q), round_to).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def cosine_pairs_topk_per_label(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """All-pairs cosine within each label bucket, top-k per vector — the
    blocked (non-quadratic-globally) pairwise pattern: the self-join is
    keyed on the label so only same-bucket vectors meet."""
    from pyspark.sql import Window

    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(label_col).alias("lbl"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(label_col).alias("lbl"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    pairs = a.join(b, on="lbl").filter(F.col("id_a") != F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine_sim"), F.asc("id_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def cosine_topk_per_label_blas(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Same contract as cosine_pairs_topk_per_label — top-k cosine
    neighbors within each label bucket, ties broken by ascending
    neighbor id on the 1e-6-rounded similarity — but the quadratic
    within-bucket stage runs as a per-bucket blocked BLAS matmul inside
    ``applyInPandas`` instead of an interpreted-HOF pair join (the
    semdedup_flags lesson: O(n^2) pairwise array math belongs in an
    Arrow-batched matmul; measured ~6x on this operator at sf0.1).
    Memory per block is O(block_rows x n): the block row count shrinks
    as the bucket grows, capping each cosine block at ~64 MB, but the
    per-row temporaries are inherently O(n) — a single 10M-vector bucket
    would need ~80 MB/row, which is why the bucket (label / IVF cell)
    is the unit of work at 100 TB: n is a cell, never the corpus.

    Degenerate-input semantics match the HOF form and the SQL oracle
    exactly (ADVICE r06): grid-rounding is half-AWAY-FROM-ZERO (DuckDB
    round(x,6) / Spark F.round), not floor(x*1e6+0.5) (which pulls
    negative half-grid values toward +inf), and zero-norm vectors yield
    NULL cosine (the HOF form's 0/0), ranked last (desc NULLS LAST)
    with id-ascending ties."""
    import numpy as np
    import pandas as pd

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {
                    "id_a": pd.array([], dtype="int64"),
                    "id_b": pd.array([], dtype="int64"),
                    "cosine_sim": pd.array([], dtype="Float64"),
                }
            )
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        out_a, out_b, out_c = [], [], []
        block = max(1, min(4096, (64 << 20) // max(n * 8, 1)))
        kk = min(k, n - 1)
        sel = np.ones(n, dtype=bool)
        for s in range(0, n, block):
            e = min(s + block, n)
            dots = m[s:e] @ m.T
            denom = np.outer(norms[s:e], norms)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dots / denom, np.nan)
            # 1e-6 grid BEFORE selection so tie-breaks match the SQL
            # oracle's round(x, 6) ordering exactly; copysign keeps the
            # rounding half-away-from-zero for negative cosines
            cos = np.copysign(np.floor(np.abs(cos) * 1e6 + 0.5), cos) / 1e6
            cos += 0.0  # IEEE: -0.0 + 0.0 = +0.0 (match the engines' 0.0)
            for i in range(e - s):
                sel[s + i] = False  # exclude self by index, not sentinel
                cand_ids = ids[sel]
                cand = cos[i][sel]
                sel[s + i] = True
                # ascending (-cos, id): lexsort's LAST key is primary;
                # NaN (zero-norm) sorts after every finite value with
                # id-ascending stability — exactly desc NULLS LAST
                order = np.lexsort((cand_ids, -cand))[:kk]
                out_a.extend([ids[s + i]] * len(order))
                out_b.extend(cand_ids[order])
                out_c.extend(cand[order])
        return pd.DataFrame(
            {
                "id_a": out_a,
                "id_b": out_b,
                # nullable Float64 so NaN (zero-norm) crosses Arrow as NULL
                "cosine_sim": pd.array(out_c, dtype="Float64"),
            }
        )

    return (
        df.select(
            F.col(id_col),
            F.col(label_col).alias("__lbl"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .groupBy("__lbl")
        .applyInPandas(
            lambda pdf: topk(
                pdf.rename(columns={id_col: id_col, "__v": vec_col})
            ),
            "id_a bigint, id_b bigint, cosine_sim double",
        )
    )


def _ceil_sqrt(n: int) -> int:
    import math

    return math.isqrt(max(n - 1, 0)) + 1 if n > 0 else 0


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int | None = None,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 10,
    sample_cap: int = 40_000,
):
    """K-means centroids for IVF cells (pyspark.ml, deterministic seed).

    ``n_cells=None`` (the default) sizes the index as
    ``max(16, ceil(sqrt(N)))`` — classic IVF sizing. A FIXED cell count
    is the one measured super-linearity in this repo (SCALE.md r07:
    ann_batch_topk's per-cell BLAS stage is ~N²/cells, wall-clock
    exponent 1.14 at 100x with 16 cells); sqrt(N) cells keeps the
    per-cell member count ~sqrt(N) so no stage is corpus-quadratic.

    ``sample_fraction=None`` (the default) trains on an ABSOLUTE-capped
    sample of ``sample_cap`` rows (min(1, cap/N) fraction) — centroid
    quality saturates quickly and IVF recall needs only coarse cells,
    so at 100 TB training cost stays constant, never corpus-linear
    (SCALE.md measured the capped-sample training at 8.3s/200k vectors).
    Pass explicit values to override either derivation; N is counted
    once only when a derivation needs it."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_cells is None or sample_fraction is None:
        n = df.count()  # one bounded scalar action, reused by both knobs
    if n_cells is None:
        # the 16-cell floor can't exceed the corpus itself (k-means needs
        # k <= points): a <16-vector corpus gets one cell per vector
        n_cells = max(1, min(n, max(16, _ceil_sqrt(n))))
    if sample_fraction is None:
        sample_fraction = 1.0 if n <= sample_cap else sample_cap / n
    sample = df if sample_fraction >= 1.0 else df.sample(sample_fraction, seed)
    feats = sample.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    # persist: the k-means|| init plus every Lloyd iteration is a separate
    # pass over `feats`; uncached, each pass re-runs the upstream scan and
    # array->vector projection (pyspark.ml caches only its internal
    # instance RDD per-fit in some versions, never the DataFrame subtree).
    # Values, partitioning and seed are untouched, so the centroids are
    # bit-identical — only the evaluation count changes (guide §1.3/§2.4).
    feats = feats.persist()
    try:
        km = KMeans(k=n_cells, seed=seed, maxIter=max_iter)
        model = km.fit(feats)
        return [list(map(float, c)) for c in model.clusterCenters()]
    finally:
        feats.unpersist()


def assign_ivf_cell(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach the nearest-centroid cell id — pure JVM expression (argmin
    over literal centroid arrays), suitable as a write-time partition key.

    Exact-distance ties break toward the LOWEST cell id — the same rule
    ``probe_cells`` applies (array_sort over (d2, cell) ascending) — so a
    vector's home cell is always its rank-1 probe cell and ann_batch_topk's
    "self always found" invariant holds even under centroid ties."""
    v = F.col(vec_col).cast("array<double>")
    packed = []
    for i, c in enumerate(centroids):
        cvec = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(v, cvec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        packed.append(
            F.struct((-d2).alias("negd"), F.lit(-i).alias("negcell"))
        )
    best = F.greatest(*packed)
    return df.withColumn("ivf_cell", -best.getField("negcell"))


def ivf_topk(
    df_with_cells: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF query: rank cells by centroid distance to the query, scan only
    the nprobe nearest cells, brute-force within them. With partition-by-
    cell storage this prunes the parquet scan itself (partition pruning),
    not just the compute."""
    import math

    q = query_vec
    dists = [
        (i, math.dist([float(x) for x in c], [float(x) for x in q]))
        for i, c in enumerate(centroids)
    ]
    probe = [i for i, _ in sorted(dists, key=lambda t: t[1])[:nprobe]]
    qcol = F.array(*[F.lit(float(x)) for x in q]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    return (
        df_with_cells.filter(F.col("ivf_cell").isin(probe))
        .select(F.col(id_col), F.round(cosine(v, qcol), 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def probe_cells(
    centroids: list[list[float]], nprobe: int, vec_col: str = "embedding"
) -> Column:
    """The nprobe nearest IVF cell ids per row, as a pure JVM expression
    (array_sort over (distance, cell) structs — deterministic ties by
    cell id). This is the BATCHED counterpart of ivf_topk's driver-side
    probe ranking: the model (centroid literals) ships into the plan,
    and every row ranks the cells itself — no per-query driver work."""
    v = F.col(vec_col).cast("array<double>")
    structs = []
    for i, c in enumerate(centroids):
        cvec = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(v, cvec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        structs.append(F.struct(d2.alias("d"), F.lit(i).alias("cell")))
    ranked = F.array_sort(F.array(*structs))
    return F.slice(
        F.transform(ranked, lambda s: s.getField("cell")), 1, nprobe
    )


#: above this cell count the literal-expression probe ranking
#: (probe_cells/assign_ivf_cell: one struct + fold per centroid, per row)
#: leaves whole-stage codegen territory and its O(n_cells*d)-per-row
#: interpreted cost dominates the batch — rank_cells_pd's Arrow-batched
#: BLAS matmul takes over. 64 keeps the contract-oracle SFs (23-45
#: cells) on the JVM path and every stress scale (142+) on BLAS.
_PROBE_EXPR_MAX_CELLS = 64


def rank_cells_pd(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``probe_cells`` (the nprobe nearest cell ids, nearest
    first — element 0 is the home cell) via ONE (batch x cells) BLAS
    matmul per Arrow batch, for indexes too large for the literal-
    expression form: with n_cells ~ sqrt(N) the per-row expression cost
    grows with the corpus, while a matmul amortizes it across the batch
    (measured 780s -> ~3x faster at 200k vectors / 448 cells).

    Ranking is ascending (d2, cell id) — numpy's stable argsort on d2
    preserves natural cell order on exact ties, the same rule
    probe_cells/assign_ivf_cell apply — and both the probe list and the
    home cell come from the SAME computation, so the self-found
    invariant cannot split across paths. The centroid matrix rides the
    closure (broadcast once per executor), never a per-row literal."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as st

    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm2 = np.einsum("ij,ij->i", cmat, cmat)
    npb = min(len(centroids), nprobe)
    schema = st.StructType(
        df.schema.fields
        + [st.StructField("probe_cells", st.ArrayType(st.IntegerType()))]
    )

    def rank(batches):
        for pdf in batches:
            if pdf.empty:
                pdf["probe_cells"] = pd.Series([], dtype=object)
                yield pdf
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # |x-c|² = |x|² - 2x.c + |c|²; |x|² is row-constant, drop it
            d2 = cnorm2[None, :] - 2.0 * (x @ cmat.T)
            order = np.argsort(d2, axis=1, kind="stable")[:, :npb]
            pdf = pdf.copy()
            pdf["probe_cells"] = [row.astype("int32") for row in order]
            yield pdf

    return df.mapInPandas(rank, schema)


def ann_batch_topk(
    df: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched IVF top-k: EVERY row is a query (the 100 TB pipeline
    shape — VERDICT r06 item 3), not one driver-collected vector.

    Topology: (1) each vector ranks its nprobe nearest cells JVM-side
    (``probe_cells``) and explodes to (cell, qid, qv) probe rows;
    (2) the corpus gets its home cell (``assign_ivf_cell``); (3) ONE
    cell-keyed cogroup brings each cell's probing queries and resident
    members into the same Arrow batch, where a blocked BLAS matmul
    scores them and keeps the per-cell top-k per query; (4) a per-qid
    window merges the nprobe per-cell lists into the global top-k.
    Every member lives in exactly one cell, so the merge never sees a
    duplicate (qid, vec_id) candidate.

    No cartesian, no per-query driver loop, no collect: the probe fan-out
    is x nprobe and the quadratic stage is per-cell — at 100 TB cells are
    the partition unit (n_cells ~ sqrt(N)), so each task touches one
    cell's members against that cell's probe subset only. Self matches
    are included (cosine 1.0, rank 1), mirroring ivf_topk. Similarities
    round to the 1e-6 grid via floor(x*1e6+0.5) — the ANN-contract
    convention (_ANN_BRUTE_ORACLE) shared by both engines — BEFORE
    selection, ties by ascending neighbor id.

    ``nprobe=None`` (the default) derives ``max(6, 2*ceil(sqrt(n_cells)))``:
    with sqrt(N)-sized indexes (train_ivf_centroids' default) the probed
    corpus fraction nprobe/n_cells ~ 2/N^0.25 SHRINKS as the corpus
    grows — ~10% at 200k vectors, ~1% at 10^9 — instead of a fixed
    fraction that keeps per-query cost corpus-linear; the 2x factor over
    bare sqrt(n_cells) is what holds the measured recall@10 floor (>=3,
    mean ~6) across the contract's audit slice at every SF, and the
    floor of 6 preserves the small-index recall (4-5/10 at 16 cells)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    if nprobe is None:
        nprobe = min(
            len(centroids), max(6, 2 * _ceil_sqrt(len(centroids)))
        )
    # BLAS-batched ranking at EVERY index size (one matmul per Arrow
    # batch); probes and members share the SAME ranked frame, so home
    # cell (element 0) and probe list can never disagree. This was
    # previously gated to > _PROBE_EXPR_MAX_CELLS cells with a literal-
    # expression path (probe_cells + assign_ivf_cell) below it, on the
    # assumption that small indexes stay in codegen territory — but the
    # higher-order zip_with/aggregate lambdas those expressions are
    # built from are INTERPRETED per element, never codegen'd: measured
    # r12 at 45 cells x 64 dims x 2k vectors, the expression probe pass
    # was 17.3-35.6 s vs 0.26 s for this matmul (and produced an
    # identical probe list for every vector). The frame is deliberately
    # NOT persisted even though its two consumers recompute the ranking
    # twice (VERDICT r08 suggested caching it): measured A/B at
    # 100x/200k vectors, persist(MEMORY_AND_DISK) = 277.0s vs recompute
    # = 205.8s — the two ranking map-stages run CONCURRENTLY on
    # otherwise-idle cores, while the cache serializes them behind a
    # materialization plus block-store churn.
    ranked = rank_cells_pd(
        df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("__v"),
        ),
        centroids,
        nprobe,
        vec_col="__v",
    )
    probes = ranked.select(
        F.col(id_col).alias("qid"),
        F.col("__v").alias("qv"),
        F.explode("probe_cells").alias("cell"),
    )
    members = ranked.select(
        F.col("probe_cells")[0].alias("cell"),
        F.col(id_col).alias("mid"),
        F.col("__v").alias("mv"),
    )

    def cell_topk(qpdf: pd.DataFrame, mpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "qid": pd.array([], dtype="int64"),
                "vec_id": pd.array([], dtype="int64"),
                "cosine_sim": pd.array([], dtype="float64"),
            }
        )
        if qpdf.empty or mpdf.empty:
            return empty
        qpdf = qpdf.sort_values("qid").reset_index(drop=True)
        mpdf = mpdf.sort_values("mid").reset_index(drop=True)
        qm = np.stack([np.asarray(v, dtype=np.float64) for v in qpdf["qv"]])
        mm = np.stack([np.asarray(v, dtype=np.float64) for v in mpdf["mv"]])
        qids = qpdf["qid"].to_numpy()
        mids = mpdf["mid"].to_numpy()
        nq, nm = len(qids), len(mids)
        qn = np.sqrt(np.einsum("ij,ij->i", qm, qm))
        mn = np.sqrt(np.einsum("ij,ij->i", mm, mm))
        kk = min(k, nm)
        out_q, out_m, out_c = [], [], []
        block = max(1, min(4096, (64 << 20) // max(nm * 8, 1)))
        for s in range(0, nq, block):
            e = min(s + block, nq)
            dots = qm[s:e] @ mm.T
            denom = np.outer(qn[s:e], mn)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dots / denom, np.nan)
            cos = np.floor(cos * 1e6 + 0.5) / 1e6
            for i in range(e - s):
                row = cos[i]
                order = np.lexsort((mids, -row))[:kk]
                out_q.extend([qids[s + i]] * len(order))
                out_m.extend(mids[order])
                out_c.extend(row[order])
        return pd.DataFrame(
            {
                "qid": out_q,
                "vec_id": out_m,
                # nullable Float64: NaN (zero-norm member or query) crosses
                # Arrow as NULL, and the global merge window's desc ordering
                # puts NULLs last — plain float64 would surface NaN as a
                # double that Spark's desc ranks ABOVE every real cosine
                # (same convention as cosine_topk_per_label_blas).
                "cosine_sim": pd.array(out_c, dtype="Float64"),
            }
        )

    candidates = probes.groupBy("cell").cogroup(
        members.groupBy("cell")
    ).applyInPandas(
        lambda left, right: cell_topk(left, right),
        "qid bigint, vec_id bigint, cosine_sim double",
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def train_hyperplanes(
    dim: int, n_planes: int = 12, seed: int = 42
) -> list[list[float]]:
    """Seeded random hyperplanes for sign-LSH over cosine similarity.
    Unlike IVF centroids these need no training data — suitable for
    streaming ingest where centroids can't be retrained."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def assign_lsh_bucket(
    df: DataFrame, planes: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach the sign-LSH bucket id: bit b = sign(v . plane_b). Vectors
    with small angles share buckets with high probability. Pure JVM
    expression — usable as a write-time partition key."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(v, p) >= 0, F.lit(2**b)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket)


def _query_bucket(planes: list[list[float]], query_vec: list[float]) -> int:
    bucket = 0
    for b, plane in enumerate(planes):
        if sum(float(x) * float(y) for x, y in zip(query_vec, plane)) >= 0:
            bucket += 2**b
    return bucket


def lsh_topk(
    df_with_buckets: DataFrame,
    planes: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    hamming_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-LSH top-k: scan only buckets within ``hamming_probe`` bit flips
    of the query's bucket (multiprobe). Probed fraction of the corpus is
    roughly sum_{i<=probe} C(n_planes, i) / 2^n_planes."""
    qb = _query_bucket(planes, query_vec)
    probes = {qb}
    if hamming_probe >= 1:
        for b in range(len(planes)):
            probes.add(qb ^ (1 << b))
    if hamming_probe >= 2:
        for b1 in range(len(planes)):
            for b2 in range(b1 + 1, len(planes)):
                probes.add(qb ^ (1 << b1) ^ (1 << b2))
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    return (
        df_with_buckets.filter(F.col("lsh_bucket").isin(list(probes)))
        .select(F.col(id_col), F.round(cosine(v, q), 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: pairs of vectors in the
    same block whose cosine similarity meets ``threshold``; the larger id
    is marked the duplicate of the smaller (keep-first policy, matching
    the exact-dedup tie rule in llm/dedup.py).

    The self-join is keyed on ``block_col`` so the pair space is quadratic
    only within a block, never globally — at 100 TB the block key would be
    an LSH bucket or IVF cell id (see lsh_bucket/assign_cells in this
    module) computed at write time; the pairing/filter plan is identical
    whatever the blocking key. Returns (id_kept, id_dup, cosine_sim).
    """
    # attach each vector's norm ONCE before the pair join (r12): the
    # cosine() form re-folds BOTH norms per PAIR, tripling the
    # interpreted-HOF work — a row's fold over its own array yields the
    # same double pre- or post-join, so dot/(na*nb) is bit-identical
    # (measured 2.9 -> 1.6 s at sf0.1).
    base = df.select(
        F.col(id_col),
        F.col(block_col).alias("blk"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__n", norm(F.col("__v")))
    a = base.select(
        F.col(id_col).alias("id_kept"),
        "blk",
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("id_dup"),
        "blk",
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    pairs = a.join(b, on="blk").filter(F.col("id_kept") < F.col("id_dup"))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select(
            "id_kept",
            "id_dup",
            F.round(cos, 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def raw_moments(df: DataFrame, vec_col: str = "embedding"):
    """One distributed pass over an embedding column -> the raw moments
    ``(n, sum(x) as a d-vector, X^T X as a d x d ndarray)`` — the d << n
    statistics every spectral kernel here (eigh PCA, power-method PCA)
    fits from.

    Per-partition partials via numpy BLAS in ONE Arrow-batch mapInPandas
    pass — no d^2-expression codegen (a d=64 aggregate built from 2 080
    Catalyst sum() columns spends ~15-40 s in analysis/codegen alone;
    the outer-product accumulation is milliseconds). Partials combine
    with a keyed sum over (position, value) pairs — map-side combinable,
    so even 100k partitions reduce to 1+d+d^2 rows before the single
    tiny shuffle. No driver-side loop over partitions."""
    import numpy as np

    head = df.select(F.col(vec_col)).limit(1).collect()
    if not head:
        raise ValueError(
            "raw_moments: input DataFrame is empty — nothing to fit"
        )
    d = len(head[0][0])
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["__x"].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [float(len(X))],
                    "s": [X.sum(axis=0).tolist()],
                    "xx": [(X.T @ X).ravel().tolist()],
                }
            )

    part = df.select(xd.alias("__x")).mapInPandas(
        _partials, schema="n double, s array<double>, xx array<double>"
    )
    flat = part.select(
        F.posexplode(
            F.concat(F.array(F.col("n")), F.col("s"), F.col("xx"))
        ).alias("pos", "val")
    )
    tot = (
        flat.groupBy("pos")
        .agg(F.sum("val").alias("v"))
        .orderBy("pos")
        .collect()
    )  # 1 + d + d*d tiny rows
    vals = np.array([r["v"] for r in tot])
    n = int(vals[0])
    return n, vals[1 : 1 + d], vals[1 + d :].reshape(d, d)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
):
    """PCA projection of an embedding column to k components.

    The scalable decomposition pattern: the d x d covariance matrix is
    accumulated DISTRIBUTED (one posexplode-free aggregate over per-row
    outer products, flattened to d*(d+1)/2 upper-triangle sums — map-side
    combinable, one 2-KB-ish shuffle row per partition), then the tiny
    d x d eigenproblem is solved on the driver with numpy, and the
    projection matrix re-enters as a broadcast literal. No iterative
    cluster jobs, no vec_id shuffle, embeddings stream through one scan
    for stats and one for projection.

    Determinism: numpy eigh of the exact symmetric matrix, eigenvalues
    sorted descending, each eigenvector's sign fixed so its
    largest-|component| entry is positive.

    Returns (projected_df, explained_variance_ratio list).
    """
    import numpy as np

    n, s, xx = raw_moments(df, vec_col)
    d = len(s)
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mean = s / n
    cov = xx / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]  # d x k
    # sign convention: largest-|component| entry positive
    for c in range(k):
        m = np.argmax(np.abs(comps[:, c]))
        if comps[m, c] < 0:
            comps[:, c] = -comps[:, c]
    ratio = [float(v) for v in (evals[order] / evals.sum())]
    mean_lit = F.array(*[F.lit(float(v)) for v in mean])
    # zip_with against each component literal, then sum the products
    out_cols = []
    for c in range(k):
        comp_lit = F.array(*[F.lit(float(v)) for v in comps[:, c]])
        centered = F.zip_with(xd, mean_lit, lambda x, mu: x - mu)
        prod = F.zip_with(centered, comp_lit, lambda v, w: v * w)
        out_cols.append(
            F.aggregate(prod, F.lit(0.0), lambda a, b: a + b).alias(
                f"pc{c}"
            )
        )
    return df.select(F.col(id_col), *out_cols), ratio


# --------------------------------------------------- product quantization

def l2_normalize(df: DataFrame, vec_col: str = "embedding",
                 out_col: str = "nvec") -> DataFrame:
    """Attach the unit-norm vector (pure JVM expression). PQ codebooks are
    trained on normalized vectors so ADC L2 ranking is monotone with
    cosine (cos = 1 - d2/2 on the unit sphere). ROW-PRESERVING: a
    zero-norm vector gets a NULL ``out_col`` instead of being silently
    dropped (x/0 would emit NaN arrays that poison codebook k-means;
    a vanished row would desync any caller aligning output to input).
    Callers that need unit vectors filter ``out_col IS NOT NULL``
    explicitly."""
    v = F.col(vec_col).cast("array<double>")
    n = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return (
        df.withColumn("_l2n", n)
        .withColumn(
            out_col,
            F.when(
                F.col("_l2n") > 0.0,
                F.transform(v, lambda x: x / F.col("_l2n")),
            ),
        )
        .drop("_l2n")
    )


def train_pq_codebooks(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "nvec",
    seed: int = 42,
    max_iter: int = 4,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks (pyspark.ml, deterministic seeds):
    the vector splits into ``m`` contiguous subvectors; each subspace gets
    its own ``k``-centroid codebook. Memory per vector collapses from
    d floats to m small ints — the compression that lets a 100 TB
    embedding corpus keep its index in RAM. Train on a sample at scale,
    exactly like IVF."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(
            f"embedding dim {dim} must divide evenly into m={m} subspaces; "
            "trailing dims would be silently excluded from the ADC distance"
        )
    sub = dim // m

    # The m subspace fits are INDEPENDENT (each has its own seed and its
    # own slice of the vector), and a k-means fit at sample scale is
    # job-launch-overhead-bound, not compute-bound — so run them from a
    # thread pool and let the shared scheduler interleave their tiny
    # stages (guide §2.6 overlap-independent-jobs). Centroids are
    # identical to the sequential form: thread-parallelism changes job
    # ordering only, never each fit's data, partitioning or seed.
    # Measured r12 (m=4, k=16, 2k vectors): 8.2s -> ~2.5s wall.
    def fit(j: int) -> list[list[float]]:
        feats = df.select(
            array_to_vector(
                F.slice(F.col(vec_col), j * sub + 1, sub)
            ).alias("features")
        )
        # persist per-subspace, same rationale as train_ivf_centroids:
        # init + maxIter passes each re-ran the upstream normalize scan.
        # Centroids identical — persist changes evaluation count only.
        feats = feats.persist()
        try:
            model = KMeans(k=k, seed=seed + j, maxIter=max_iter).fit(feats)
            return [list(map(float, c)) for c in model.clusterCenters()]
        finally:
            feats.unpersist()

    with ThreadPoolExecutor(max_workers=m) as pool:
        return list(pool.map(fit, range(m)))


def assign_pq_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "nvec",
) -> DataFrame:
    """Attach pq_0..pq_{m-1} code columns (argmin centroid per subspace).

    Arrow-batched BLAS (r12): the previous literal-expression form built
    one zip_with/aggregate fold per codebook entry per subspace — those
    higher-order lambdas are INTERPRETED per element, never codegen'd,
    so m*k folds per row dominated the pass (measured 4.2 s at
    m=4/k=16/2k vectors vs ~0.3 s here). Code values are identical by
    construction: the per-subspace squared distance accumulates
    left-to-right over the slice exactly like the old fold (same IEEE
    addition sequence starting at 0.0), and ties keep the old
    greatest(struct(-d2, code)) rule — minimum distance, HIGHEST code
    on an exact tie. Rows must carry a non-null, full-dimension vector
    (the PQ pipeline filters nulls before assigning)."""
    import numpy as np

    from pyspark.sql import types as st

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    schema = st.StructType(
        df.schema.fields
        + [st.StructField(f"pq_{j}", st.IntegerType()) for j in range(m)]
    )

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                for j in range(m):
                    pdf[f"pq_{j}"] = np.array([], dtype="int32")
                yield pdf
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            for j, book in enumerate(books):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = np.zeros((len(xs), len(book)))
                for t in range(sub):  # left-to-right, same sum as the fold
                    diff = xs[:, t, None] - book[None, :, t]
                    d2 += diff * diff
                # argmin with ties to the HIGHEST code: first-min of the
                # reversed row is the last-min of the original
                pdf = pdf.copy() if j == 0 else pdf
                pdf[f"pq_{j}"] = (
                    (len(book) - 1) - np.argmin(d2[:, ::-1], axis=1)
                ).astype("int32")
            yield pdf

    return df.mapInPandas(assign, schema)


def pq_rerank_topk(
    df: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ query = ADC shortlist + exact re-rank: per-subspace
    query-to-centroid distance tables become literal lookup arrays, each
    vector's estimated d2 is m array lookups summed (codes only — the
    full vectors are NOT read for the shortlist), the top ``shortlist``
    candidates then re-rank by exact cosine against the raw vectors.
    This is the standard PQ serving shape: the scan cost is the code
    table (m bytes/vector), and the expensive exact math touches only
    ``shortlist`` rows."""
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    if qn == 0.0:
        raise ValueError("query_vec has zero norm; cosine rank is undefined")
    q = [float(x) / qn for x in query_vec]
    sub = len(codebooks[0][0])
    est = None
    for j, book in enumerate(codebooks):
        qs = q[j * sub : (j + 1) * sub]
        table = [
            sum((a - b) * (a - b) for a, b in zip(qs, c)) for c in book
        ]
        lut = F.array(*[F.lit(float(x)) for x in table])
        term = F.element_at(lut, F.col(f"pq_{j}") + 1)
        est = term if est is None else est + term
    short = (
        codes.select(id_col, est.alias("est_d2"))
        .orderBy(F.asc("est_d2"), F.asc(id_col))
        .limit(shortlist)
    )
    qcol = F.array(*[F.lit(float(x)) for x in q])
    v = F.col(vec_col).cast("array<double>")
    return (
        df.join(short.select(id_col), id_col)
        .select(F.col(id_col), F.round(cosine(v, qcol), 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def semdedup_flags(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    vec_col: str = "v",
) -> DataFrame:
    """SemDeDup duplicate flags: within each cluster, a vector is a
    duplicate iff some LOWER-id clustermate reaches ``threshold`` cosine
    (grid-rounded at 1e-6 so both engines make identical keep/drop
    decisions). Zero-norm vectors neither flag nor get flagged.

    The within-cluster pair cosines are the quadratic part of SemDeDup,
    so they run as a per-cluster blocked BLAS matmul inside
    ``applyInPandas`` — the brief's vectorized-Pandas-UDF case: 64-dim
    dot products in interpreted HOF expressions cost ~100x more (the 10x
    stress rehearsal measured 313s; this form is ~20x faster). Memory
    per block is O(block_rows x n) — the block row count shrinks as the
    cluster grows, capping each cosine block at ~64 MB, but per-row
    temporaries are inherently O(n). At 100 TB the cluster count scales
    with the corpus (the IVF layout of ``ivf_topk``), so n stays a
    cell, never the corpus."""
    import numpy as np
    import pandas as pd

    def flags(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        n = len(pdf)
        sq = np.einsum("ij,ij->i", m, m)
        norms = np.sqrt(sq)
        ok = sq > 0
        is_dup = np.zeros(n, dtype=bool)
        block = max(1, min(4096, (64 << 20) // max(n * 8, 1)))
        for s in range(1, n, block):
            e = min(s + block, n)
            dots = m[s:e] @ m[:e].T
            denom = np.outer(norms[s:e], norms[:e])
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dots / denom, 0.0)
            # half-away-from-zero (= round(x,6) in both engines); the
            # `lower` mask below already excludes zero-norm rows, so the
            # 0.0 placeholder never reaches a >= threshold decision
            cos = np.copysign(np.floor(np.abs(cos) * 1e6 + 0.5), cos) / 1e6
            lower = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            lower &= ok[None, :e] & ok[s:e, None]
            is_dup[s:e] |= ((cos >= threshold) & lower).any(axis=1)
        out = pdf[[id_col, cluster_col]].copy()
        out["is_dup"] = is_dup
        return out

    return assigned.select(id_col, cluster_col, vec_col).groupBy(
        cluster_col
    ).applyInPandas(
        flags, f"{id_col} bigint, {cluster_col} bigint, is_dup boolean"
    )
