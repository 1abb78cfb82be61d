"""LLM-pipeline query surface: dedup (exact / MinHash / SimHash / Jaccard),
similarity search, text analysis — over the `documents` and `embeddings`
testdata tables.

The md5-based MinHash/SimHash constructions are deliberately engine-portable
(md5 + array ops exist in both Spark and DuckDB), which is what makes these
probabilistic operators oracle-checkable value-for-value rather than
rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked
from ..llm import dedup as D
from ..llm import similarity as S
from ..llm import textstats as T
from . import Tables, query

# ---------------------------------------------------------------- helpers
# DuckDB SQL fragments mirroring textstats.words / dedup.shingles exactly.

_DUCK_WORDS = (
    "list_filter(string_split(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'),"
    " ' '), w -> w != '')"
)


def _duck_shingles(words_expr: str, n: int) -> str:
    return (
        f"CASE WHEN len({words_expr}) >= {n} THEN "
        f"list_distinct([array_to_string(({words_expr})[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, len({words_expr}) - {n - 2})]) "
        f"ELSE []::VARCHAR[] END"
    )


def _duck_minhash(shingle_expr: str, band: int, bands: int) -> str:
    # mirrors dedup.minhash_signature: one md5 per shingle, band = hex slice
    w = max(32 // bands, 1)
    return (
        f"list_min(list_transform({shingle_expr}, "
        f"s -> substr(md5(s), {band * w + 1}, {w})))"
    )


# ---------------------------------------------------------------- exact dedup


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: lowest doc_id survives per identical text; shuffle key
    is sha2(text), never the document body."""
    t = Tables(spark, sf_dir)
    return D.exact_dedup(t.documents).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------- minhash

_MH_BANDS = 4
_sig_cols = ",\n           ".join(
    _duck_minhash(_duck_shingles("w", 3), b, _MH_BANDS) + f" AS mh_{b}"
    for b in range(_MH_BANDS)
)


@query(
    "llm_minhash_signature",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    )
    SELECT doc_id,
           {_sig_cols}
    FROM ws
    """,
)
def llm_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature ({} bands, word-3-gram shingles,
    md5-min construction).""".format(_MH_BANDS)
    t = Tables(spark, sf_dir)
    return D.minhash_signature(t.documents, bands=_MH_BANDS, n=3)


_P_BANDS = 4
_pair_stack = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {b} AS band, "
    + _duck_minhash(_duck_shingles("w", 2), b, _P_BANDS)
    + " AS val FROM ws"
    for b in range(_P_BANDS)
)


@query(
    "llm_minhash_pairs",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), stacked AS (
{_pair_stack}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM stacked a JOIN stacked b
      ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    """,
)
def llm_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding candidate pairs (word-2-gram shingles so buckets are
    non-trivial on the synthetic corpus). The per-bucket self-join is the
    non-quadratic near-dup pattern."""
    t = Tables(spark, sf_dir)
    return D.minhash_candidate_pairs(t.documents, bands=_P_BANDS, n=2)


_jc_sh = _duck_shingles("w", 2)


@query(
    "llm_jaccard_pairs",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack.replace("{_P_BANDS}", str(_P_BANDS))}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT p.id_a, p.id_b,
           round(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
                 THEN len(list_intersect(sa.s, sb.s))
                      / len(list_distinct(list_concat(sa.s, sb.s)))
                 ELSE 0.0 END, 4) AS jaccard
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.id_a
    JOIN sh sb ON sb.doc_id = p.id_b
    """,
)
def llm_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification over the LSH candidate pairs —
    the verify half of near-dedup (band -> candidates -> exact check)."""
    t = Tables(spark, sf_dir)
    cand = D.minhash_candidate_pairs(t.documents, bands=_P_BANDS, n=2)
    return D.jaccard_pairs(t.documents, cand, n=2)


# ---------------------------------------------------------------- simhash

_simhash_bits_sql = " + ".join(
    f"CASE WHEN list_aggregate(list_transform(ws, t -> CASE WHEN "
    f"substr(md5(t), {b + 1}, 1) >= '8' THEN 1 ELSE -1 END), 'sum') > 0 "
    f"THEN {2**b} ELSE 0 END"
    for b in range(16)
)


@query(
    "llm_simhash",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_distinct({_DUCK_WORDS.format(col="text")}) AS ws
      FROM documents
    )
    SELECT doc_id, {_simhash_bits_sql} AS simhash
    FROM w
    """,
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint (md5-nibble majority vote); near-dups are
    fingerprints within small Hamming distance."""
    t = Tables(spark, sf_dir)
    return D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select("doc_id", D.simhash16(F.col("text")).alias("simhash"))


# ---------------------------------------------------------------- text stats

_DUCK_TOKEN_COUNT = "len(regexp_extract_all(lower({col}), '[a-z0-9]+'))"


def _duck_quality_ctes(
    base: str = "qbase", parts: str = "qparts", ws: str = "ws2"
) -> str:
    """CTE chain computing the llm_quality_score heuristic per doc_id:
    ``{parts}`` exposes len_score/punct_score/stop_score; callers SELECT
    ``round((len_score + punct_score + stop_score) / 3, 4)``. ONE home
    for the quality heuristic so the llm_quality_score and
    llm_dedup_keep_best oracles cannot silently diverge."""
    return f"""{base} AS (
      SELECT doc_id, text, {_DUCK_WORDS.format(col="text")} AS {ws},
             {_DUCK_TOKEN_COUNT.format(col="text")} AS n_tok
      FROM documents
    ), {parts} AS (
      SELECT doc_id,
             least(n_tok / 50.0, 1.0) AS len_score,
             1 - least(CASE WHEN length(text) > 0
                       THEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / length(text)
                       ELSE 0.0 END * 5, 1.0) AS punct_score,
             least(CASE WHEN len({ws}) > 0
                   THEN len(list_filter({ws}, w -> list_contains(['the','and','of','is','to'], w))) * 1.0 / len({ws})
                   ELSE 0.0 END * 10, 1.0) AS stop_score
      FROM {base}
    )"""


#: shared band -> candidate-pair -> Jaccard-edge -> recursive-closure CTE
#: chain of the component-dedup oracles (llm_dedup_clusters and
#: llm_dedup_keep_best differ only in the survivor rule applied to
#: ``comp``). Must follow a WITH RECURSIVE keyword.
_COMPONENT_CLOSURE_CTES = f"""ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    ), scored AS (
      SELECT p.id_a, p.id_b,
             CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
                  THEN len(list_intersect(sa.s, sb.s)) * 1.0
                       / len(list_distinct(list_concat(sa.s, sb.s)))
                  ELSE 0.0 END AS j
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.id_a
      JOIN sh sb ON sb.doc_id = p.id_b
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM scored WHERE j >= 0.8
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM scored WHERE j >= 0.8
    ), reach(id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
    ), comp AS (
      SELECT id, min(r) AS component FROM reach GROUP BY id
    )"""


@query(
    "llm_text_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             {_DUCK_WORDS.format(col="text")} AS ws,
             {_DUCK_TOKEN_COUNT.format(col="text")} AS n_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
             length(text) AS n_chars_computed
      FROM documents
    )
    SELECT doc_id, n_chars_computed, n_tokens, n_tokens_bpe,
           round(CASE WHEN length(text) > 0
                 THEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / length(text)
                 ELSE 0.0 END, 4) AS punct_ratio,
           round(CASE WHEN len(ws) > 0
                 THEN len(list_filter(ws, w -> list_contains(['the','and','of','is','to'], w))) * 1.0 / len(ws)
                 ELSE 0.0 END, 4) AS stopword_ratio
    FROM base
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char/token counts + punctuation and stopword ratios — the quality-
    filter building blocks, all as single-scan built-ins. The regex
    ratios are CPU-bound per document, so the scan is spread to cluster
    parallelism first when the input is a single row group
    (D._spread_narrow_scan: no-op at scale, 1.8x at sf0.1)."""
    t = Tables(spark, sf_dir)
    c = F.col("text")
    return D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        F.length(c).alias("n_chars_computed"),
        T.token_count(c).alias("n_tokens"),
        T.bpe_ish_token_count(c).alias("n_tokens_bpe"),
        F.round(T.punct_ratio(c), 4).alias("punct_ratio"),
        F.round(T.stopword_ratio(c), 4).alias("stopword_ratio"),
    )


_LANG_HITS = {
    lang: (
        "len(list_filter(ws, w -> list_contains(["
        + ",".join(f"'{w}'" for w in markers)
        + "], w)))"
    )
    for lang, markers in T.LANG_MARKERS.items()
}


@query(
    "llm_lang_id",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, text, {_DUCK_WORDS.format(col="text")} AS ws
      FROM documents
    ), hits AS (
      SELECT doc_id, lang,
             regexp_matches(text, '[一-鿿]') AS has_cjk,
             {_LANG_HITS["de"]} AS h_de,
             {_LANG_HITS["en"]} AS h_en,
             {_LANG_HITS["es"]} AS h_es,
             {_LANG_HITS["fr"]} AS h_fr
      FROM w
    )
    SELECT doc_id, lang,
           CASE WHEN has_cjk THEN 'zh'
                WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM hits
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic): argmax of marker
    hits, CJK short-circuit, deterministic alphabetical tie-break."""
    t = Tables(spark, sf_dir)
    return D._spread_narrow_scan(
        t.documents.select("doc_id", "lang", "text"), "doc_id"
    ).select("doc_id", "lang", T.lang_id(F.col("text")).alias("lang_pred"))


@query(
    "llm_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             {_DUCK_WORDS.format(col="text")})), ' ')) AS fingerprint
    FROM documents
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-collision document fingerprint: md5 over the sorted distinct
    token set (word-order / duplication insensitive)."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id", T.fingerprint(F.col("text")).alias("fingerprint")
    )


# ---------------------------------------------------------------- similarity


@query(
    "llm_cosine_topk",
    oracle="""
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 6) AS cosine_sim
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against vec_id=0's embedding. The single-
    row query side broadcasts; orderBy+limit plans as TakeOrdered (no global
    sort)."""
    t = Tables(spark, sf_dir)
    qdf = t.embeddings.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    v = F.col("embedding").cast("array<double>")
    return (
        t.embeddings.crossJoin(F.broadcast(qdf))
        .select(
            "vec_id", F.round(S.cosine(v, F.col("qv")), 6).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "llm_cosine_topk_per_label",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id != b.vec_id
    )
    SELECT id_a, id_b, cosine_sim FROM (
      SELECT *, row_number() OVER (PARTITION BY id_a
                                   ORDER BY cosine_sim DESC, id_b) AS rn
      FROM pairs
    ) WHERE rn <= 3
    """,
)
def llm_cosine_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked all-pairs similarity: top-3 cosine neighbors per vector
    within its label bucket (never globally quadratic). The quadratic
    within-bucket stage runs as a per-bucket blocked BLAS matmul
    (similarity.cosine_topk_per_label_blas, applyInPandas) — the
    interpreted-HOF pair-join form (cosine_pairs_topk_per_label, kept as
    the reference implementation) costs ~6x more at sf0.1 and the gap
    widens with bucket size. Similarities are 1e-6-grid-rounded BEFORE
    the top-k cut so tie-breaks match the SQL oracle exactly."""
    t = Tables(spark, sf_dir)
    return S.cosine_topk_per_label_blas(t.embeddings, k=3)


_ANN_BRUTE_ORACLE = """
    WITH qv AS (
      SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0
    ), scored AS (
      SELECT vec_id,
             floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv.q)
                   * 1000000 + 0.5) / 1000000 AS c6
      FROM embeddings CROSS JOIN qv
      WHERE vec_id != 0
    ), top AS (
      SELECT vec_id FROM scored ORDER BY c6 DESC, vec_id LIMIT 10
    )
    SELECT 0 AS qid,
           array_to_string(list_sort(list(vec_id)), ',') AS brute_top10,
           1 AS self_found,
           1 AS recall_ok
    FROM top
"""


def _ann_contract(spark, sf_dir, approx_ids: set, min_recall: int):
    """One-row ANN verification frame: the exact top-10 (computed Spark-
    side with the same 1e-6-grid ordering the oracle uses — a genuine
    cross-engine check of exact search) plus pinned flags derived from
    the approximate result: the query vector found itself, and overlap
    with the exact top-10 met the recall floor."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    )
    xd = F.transform("embedding", lambda x: x.cast("double"))
    c6 = F.floor(S.cosine(xd, F.col("q")) * 1000000 + 0.5) / 1000000
    brute = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", c6.alias("c6"))
        .orderBy(F.col("c6").desc(), "vec_id")
        .limit(10)
    )
    brute_ids = [r.vec_id for r in brute.collect()]
    recall = len(set(brute_ids) & approx_ids)
    return spark.createDataFrame(
        [
            (
                0,
                ",".join(str(i) for i in sorted(brute_ids)),
                int(0 in approx_ids),
                int(recall >= min_recall),
            )
        ],
        "qid int, brute_top10 string, self_found int, recall_ok int",
    )


@query("llm_ivf_topk", oracle=_ANN_BRUTE_ORACLE)
def llm_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: k-means cells (seeded), probe the 4 nearest
    cells only. K-means is not SQL-expressible, so the ORACLE checks the
    contract instead: the exact top-10 neighbor set must match DuckDB's
    brute force value-for-value (grid-rounded ordering), the query
    vector must find itself (it lives in the nearest probed cell by
    construction), and IVF recall@10 must meet the >=5/10 floor the
    pytest suite pins at nprobe=4 of 8 cells."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    centroids = S.train_ivf_centroids(emb, n_cells=8)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    with_cells = S.assign_ivf_cell(emb, centroids)
    approx = {
        r.vec_id
        for r in S.ivf_topk(with_cells, centroids, q, k=10, nprobe=4)
        .select("vec_id")
        .collect()
    }
    return _ann_contract(spark, sf_dir, approx, min_recall=5)


# ------------------------------------------------- quality / sampling ops


@query(
    "llm_quality_score",
    oracle=f"""
    WITH {_duck_quality_ctes(base="base", parts="parts", ws="ws")}
    SELECT doc_id,
           round((len_score + punct_score + stop_score) / 3, 4) AS quality
    FROM parts
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score (length / punctuation / stopword
    components) — the pre-training corpus filter, one scan, no UDF."""
    t = Tables(spark, sf_dir)
    return D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select("doc_id", T.quality_score(F.col("text")).alias("quality"))


@query(
    "llm_near_dedup",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    ), scored AS (
      SELECT p.id_a, p.id_b,
             CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
                  THEN len(list_intersect(sa.s, sb.s)) * 1.0
                       / len(list_distinct(list_concat(sa.s, sb.s)))
                  ELSE 0.0 END AS j
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.id_a
      JOIN sh sb ON sb.doc_id = p.id_b
    )
    SELECT doc_id, lang FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM scored WHERE j >= 0.8)
    """,
)
def llm_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dedup pipeline end-to-end: LSH banding -> candidate pairs
    -> exact Jaccard -> drop higher-id members of >=0.8 pairs."""
    t = Tables(spark, sf_dir)
    return D.near_dedup_minhash(
        t.documents, threshold=0.8, bands=_P_BANDS, n=2
    ).select("doc_id", "lang")


@query(
    "llm_hash_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER) % 10 = 0
    """,
)
def llm_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (reproducible 10% sample across
    runs/engines/partitionings — what seeded random sampling can't give a
    training pipeline)."""
    t = Tables(spark, sf_dir)
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
    return t.documents.filter(bucket.cast("long") % 10 == 0).select(
        "doc_id", "lang"
    )


@query(
    "llm_train_test_split",
    oracle="""
    SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER) % 100 < 80
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def llm_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train/test split by content hash; the split
    column doubles as a write-time partition key."""
    t = Tables(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    return (
        t.documents.withColumn(
            "split", F.when(bucket < 80, "train").otherwise("test")
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "llm_euclidean_topk",
    oracle="""
    SELECT e.vec_id,
           round(list_distance(CAST(e.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[])), 6) AS euclidean_dist
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY euclidean_dist, e.vec_id
    LIMIT 10
    """,
)
def llm_euclidean_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean nearest-neighbor top-10 (JVM-side zip_with fold)."""
    t = Tables(spark, sf_dir)
    qdf = t.embeddings.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    v = F.col("embedding").cast("array<double>")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(v, F.col("qv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
    )
    return (
        t.embeddings.crossJoin(F.broadcast(qdf))
        .select("vec_id", F.round(dist, 6).alias("euclidean_dist"))
        .orderBy(F.asc("euclidean_dist"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "llm_vector_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) AS l2_norm,
           round(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'sum'), 6) AS l1_norm
    FROM embeddings
    """,
)
def llm_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector norms — the normalize-at-write-time building block (cosine on
    pre-normalized vectors degrades to a dot product at query time)."""
    t = Tables(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    l2 = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    l1 = F.aggregate(v, F.lit(0.0), lambda a, x: a + F.abs(x))
    return t.embeddings.select(
        "vec_id",
        F.round(l2, 6).alias("l2_norm"),
        F.round(l1, 6).alias("l1_norm"),
    )


@query(
    "llm_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_COMPONENT_CLOSURE_CTES}
    SELECT doc_id, lang FROM documents
    WHERE doc_id NOT IN (SELECT id FROM comp WHERE component <> id)
    """,
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware near-dedup: connected components over the >=0.8
    Jaccard pair graph, one survivor (the min id) per component.

    Oracle: the same banding+Jaccard pipeline as llm_near_dedup, with the
    component step as a DuckDB recursive-CTE transitive closure
    (min reachable id == the label-propagation fixpoint) — so the
    iterative Spark implementation is value-checked, not just row-counted.
    Component goldens also pinned by tests/test_llm.py."""
    t = Tables(spark, sf_dir)
    return D.dedup_components(
        t.documents, threshold=0.8, bands=_P_BANDS, n=2
    ).select("doc_id", "lang")


@query("llm_lsh_topk", oracle=_ANN_BRUTE_ORACLE)
def llm_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH (random hyperplane) approximate cosine top-k with
    2-bit multiprobe. Same contract oracle as llm_ivf_topk: exact top-10
    cross-engine-matched, self-retrieval pinned, recall floor >=3/10
    (the pytest bound for 8-plane multiprobe)."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    planes = S.train_hyperplanes(dim=len(q), n_planes=8)
    bucketed = S.assign_lsh_bucket(emb, planes)
    approx = {
        r.vec_id
        for r in S.lsh_topk(bucketed, planes, q, k=10, hamming_probe=2)
        .select("vec_id")
        .collect()
    }
    return _ann_contract(spark, sf_dir, approx, min_recall=3)


_ANN_BATCH_ORACLE = """
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 20
    ), scored AS (
      SELECT q.qid, e.vec_id,
             floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
                   * 1000000 + 0.5) / 1000000 AS c6
      FROM embeddings e JOIN q ON e.vec_id != q.qid
    ), top AS (
      SELECT qid, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY c6 DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 10
    )
    SELECT CAST(qid AS INT) AS qid,
           array_to_string(list_sort(list(vec_id)), ',') AS brute_top10,
           1 AS self_found,
           1 AS recall_ok
    FROM top GROUP BY qid
"""


@query("llm_ann_batch_topk", oracle=_ANN_BATCH_ORACLE)
def llm_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF similarity search: EVERY embedding probes its 4
    nearest of 16 k-means cells at once (similarity.ann_batch_topk —
    probe ranking as a JVM expression, one cell-keyed cogroup, per-cell
    blocked BLAS, per-qid window merge). This is the corpus-scale
    pipeline shape (VERDICT r06 item 3): no per-query driver loop, no
    collect in the approximate path, no cartesian — vs ivf_topk/lsh_topk
    whose probe is single-query by contract.

    Index sizing is the library's scale-safe DEFAULT (VERDICT r07 item
    1): n_cells = max(16, ceil(sqrt(N))) trained on an absolute-capped
    sample, nprobe = max(6, 2*ceil(sqrt(n_cells))) — a FIXED cell count
    was the repo's one measured super-linearity (~N²/cells, exponent
    1.14 at 100x), while sqrt(N) cells keep every stage sub-quadratic
    and the probed fraction shrinking (~2/N^0.25).

    K-means is not SQL-expressible, so the ORACLE checks the contract on
    a 20-query audit slice: the exact top-10 neighbor sets (computed
    Spark-side with the same floor(x*1e6+0.5) grid ordering) must match
    DuckDB's brute force value-for-value, every audited query must find
    itself in its own top-10 (its home cell is its nearest cell, always
    probed — assign_ivf_cell and probe_cells share the lowest-id tie
    rule), and per-query recall@10 must meet the >=3/10 floor (measured
    min 5-8/10 across the three SFs under the auto config: 23-45 cells,
    nprobe 10-14). The batch itself runs over ALL queries; only the
    bounded 20x10 audit rows reach the driver."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    centroids = S.train_ivf_centroids(emb)
    batch = S.ann_batch_topk(emb, centroids, k=10)
    approx: dict[int, set[int]] = {}
    audit = batch.filter(F.col("qid") < 20).select("qid", "vec_id")
    for r in audit.collect():  # bounded: 20 queries x k=10
        approx.setdefault(r.qid, set()).add(r.vec_id)

    q20 = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    from pyspark.sql import Window

    xd = F.transform("embedding", lambda x: x.cast("double"))
    c6 = F.floor(S.cosine(xd, F.col("qv")) * 1000000 + 0.5) / 1000000
    w = Window.partitionBy("qid").orderBy(F.desc("c6"), F.asc("vec_id"))
    brute = (
        emb.crossJoin(F.broadcast(q20))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", c6.alias("c6"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
    )
    brute_ids: dict[int, list[int]] = {}
    for r in brute.select("qid", "vec_id").collect():  # bounded: 20 x 10
        brute_ids.setdefault(r.qid, []).append(r.vec_id)
    rows = [
        (
            int(qid),
            ",".join(str(i) for i in sorted(ids)),
            int(qid in approx.get(qid, set())),
            int(len(set(ids) & approx.get(qid, set())) >= 3),
        )
        for qid, ids in sorted(brute_ids.items())
    ]
    return spark.createDataFrame(
        rows, "qid int, brute_top10 string, self_found int, recall_ok int"
    )


@query(
    "llm_pattern_stats",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, 'https?://[^\s]+'))                                 AS n_urls,
           len(regexp_extract_all(text, '\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b'))          AS n_phoneish,
           len(regexp_extract_all(text, '[0-9]'))                                           AS n_digits
    FROM documents
    """,
)
def llm_pattern_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-ish pattern counts (emails / URLs / phone-shaped / digits) —
    the corpus-scrubbing stats pass, single scan, regexp_count built-ins."""
    t = Tables(spark, sf_dir)
    c = F.col("text")
    return D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        F.regexp_count(
            c, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        ).alias("n_emails"),
        F.regexp_count(c, F.lit(r"https?://[^\s]+")).alias("n_urls"),
        F.regexp_count(
            c, F.lit(r"\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b")
        ).alias("n_phoneish"),
        F.regexp_count(c, F.lit(r"[0-9]")).alias("n_digits"),
    )


@query(
    "llm_repetition_ratio",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                         x -> x != '') AS ws
      FROM documents
    )
    SELECT doc_id,
           len(ws)                                   AS n_words,
           len(list_distinct(ws))                    AS n_unique,
           round(CASE WHEN len(ws) > 0
                 THEN 1.0 - len(list_distinct(ws)) * 1.0 / len(ws)
                 ELSE 0.0 END, 4)                    AS repetition_ratio
    FROM w
    """,
)
def llm_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token repetition ratio (1 - unique/total) — the boilerplate/spam
    quality signal used by corpus filters."""
    t = Tables(spark, sf_dir)
    ws_df = t.documents.select("doc_id", T.words(F.col("text")).alias("ws"))
    n = F.size("ws")
    u = F.size(F.array_distinct("ws"))
    return ws_df.select(
        "doc_id",
        n.alias("n_words"),
        u.alias("n_unique"),
        F.round(
            F.when(n > 0, 1.0 - u.cast("double") / n).otherwise(0.0), 4
        ).alias("repetition_ratio"),
    )


@query(
    "llm_simhash_hamming",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_distinct({_DUCK_WORDS.format(col="text")}) AS ws
      FROM documents
    ), sig AS (
      SELECT doc_id, {_simhash_bits_sql} AS simhash FROM w
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(CAST(a.simhash AS BIGINT), CAST(b.simhash AS BIGINT))) AS hamming
    FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
    """,
)
def llm_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming distance between consecutive documents — the
    near-dup comparison primitive (popcount of XOR), value-checked.
    The signature frame persists because both join sides read it: the
    16-bit simhash costs 16 md5-per-token array passes, the dominant
    term — without persist it's computed twice (2x wall at 10x scale)."""
    t = Tables(spark, sf_dir)
    sig = D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id", D.simhash16(F.col("text")).alias("simhash")
    ).persist()
    sig = tracked(sig)
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            D.simhash_hamming(
                F.col("sa").cast("long"), F.col("sb").cast("long")
            ).alias("hamming"),
        )
    )


# ------------------------------------------------- chunking / packing ops

_CHUNK, _STRIDE = 30, 20


@query(
    "llm_chunk_documents",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS ws FROM documents
    ), idx AS (
      SELECT doc_id, ws,
             unnest(range(0, greatest(len(ws) - {_CHUNK} + {_STRIDE}, 1), {_STRIDE})) AS start
      FROM w
    )
    SELECT doc_id, CAST(start / {_STRIDE} AS INTEGER) AS chunk_idx,
           array_to_string(ws[start + 1 : start + {_CHUNK}], ' ') AS chunk_text,
           least(len(ws) - start, {_CHUNK}) AS n_tokens
    FROM idx
    WHERE start < len(ws)
    """,
)
def llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({c}-token chunks, {s}-token
    stride) — the context-window preprocessing op. Chunk construction is
    an index explode + array slice, all JVM-side.""".format(
        c=_CHUNK, s=_STRIDE
    )
    t = Tables(spark, sf_dir)
    ws_df = t.documents.select("doc_id", T.words(F.col("text")).alias("ws"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("ws") - _CHUNK + _STRIDE - 1, F.lit(0)),
        F.lit(_STRIDE),
    )
    exploded = ws_df.select(
        "doc_id", "ws", F.explode(starts).alias("start")
    ).filter(F.col("start") < F.size("ws"))
    return exploded.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("int").alias("chunk_idx"),
        F.array_join(
            F.slice(F.col("ws"), F.col("start") + 1, _CHUNK), " "
        ).alias("chunk_text"),
        F.least(F.size("ws") - F.col("start"), F.lit(_CHUNK)).alias("n_tokens"),
    )


@query(
    "llm_sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tokens) / 512) AS INTEGER) AS bin_id
      FROM toks
    )
    SELECT lang, bin_id, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY 1, 2
    """,
)
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to ~512-token training bins per
    language via running-sum binning (the deterministic, single-window
    approximation of first-fit packing; bins can overflow by at most one
    document, which padding absorbs)."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", "lang", T.token_count(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 512).cast(
            "int"
        ),
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


@query(
    "llm_embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS id_kept, b.vec_id AS id_dup,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.30
    """,
)
def llm_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup family next
    to exact/MinHash/SimHash/Jaccard): same-block vectors with cosine >=
    threshold, larger id marked duplicate. Threshold 0.30 sits at this
    synthetic corpus's p99 (its vectors are near-random; real corpora use
    ~0.95) so the filter path is genuinely exercised. Blocked on `label`
    — at production scale the block key is an LSH bucket / IVF cell, same
    plan shape."""
    t = Tables(spark, sf_dir)
    return S.embedding_near_dup(t.embeddings, threshold=0.30)


# ---------------------------------------------------------------- PII scrub

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_NUM_RE = r"[0-9]{3,}"


@query(
    "llm_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact u' || doc_id::VARCHAR ||
             '@mail.example.com id ' || (doc_id * 7919)::VARCHAR AS text
      FROM documents
    ),
    pass1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS text
      FROM aug
    )
    SELECT doc_id, n_emails,
           len(regexp_extract_all(text, '{_NUM_RE}')) AS n_nums,
           regexp_replace(text, '{_NUM_RE}', '<NUM>', 'g') AS redacted
    FROM pass1
    """,
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction stage of a training-data pipeline:
    emails then standalone digit runs replaced by typed placeholders, with
    per-document match counts for audit. The synthetic corpus contains no
    PII, so the query plants a deterministic email + numeric id per row
    (identically in the oracle) to keep the redaction path genuinely
    exercised at every scale factor. Pure regexp_replace/regexp_count —
    JVM codegen, no Python, embarrassingly parallel (no shuffle at all)."""
    t = Tables(spark, sf_dir)
    aug = D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com id "),
            (F.col("doc_id") * 7919).cast("string"),
        ).alias("text"),
    )
    pass1 = aug.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>").alias("text"),
    )
    return pass1.select(
        "doc_id",
        "n_emails",
        F.regexp_count("text", F.lit(_NUM_RE)).alias("n_nums"),
        F.regexp_replace("text", _NUM_RE, "<NUM>").alias("redacted"),
    )


@query(
    "llm_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
               AS n_word_tokens,
           CAST(len(list_distinct(
               regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')
           )) AS BIGINT) AS n_distinct_tokens
    FROM documents
    """,
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization count: letter runs, digit runs, and single
    punctuation marks (the GPT-2 pre-tokenizer's ASCII skeleton). All
    JVM-side regexp — the per-document token budget underlying packing and
    pricing, with no Python in the loop."""
    t = Tables(spark, sf_dir)
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    toks = F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
    words = F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+"), F.lit(0))
    return t.documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(words).cast("long").alias("n_word_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )


@query(
    "llm_tokenizer_fertility",
    oracle="""
    WITH c AS (
      SELECT lang,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS n_tok,
             len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CASE WHEN sum(n_tok) > 0 THEN
             floor(CAST(sum(n_chars) AS DOUBLE) / sum(n_tok) * 1e6 + 0.5) / 1e6
           END AS chars_per_token,
           CASE WHEN sum(n_words) > 0 THEN
             floor(CAST(sum(n_tok) AS DOUBLE) / sum(n_words) * 1e6 + 0.5) / 1e6
           END AS tokens_per_word
    FROM c GROUP BY lang
    """,
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: corpus-level chars-per-token
    and tokens-per-word under the BPE-ish pre-tokenizer — the standard
    multilingual check for languages a vocab tokenizes inefficiently
    (fertility ~2x means 2x the training cost per word). One scan, one
    tiny per-lang aggregate, all JVM-side regexp counting; ratios are
    divisions of exact integer sums, so both engines compute identical
    doubles before the shared HALF_UP rounding."""
    t = Tables(spark, sf_dir)
    c = F.col("text")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    per_doc = t.documents.select(
        "lang",
        F.length(c).alias("n_chars"),
        F.regexp_count(c, F.lit(pat)).alias("n_tok"),
        F.regexp_count(c, F.lit("[A-Za-z]+")).alias("n_words"),
    )
    g = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_tok").alias("sum_tok"),
        F.sum("n_words").alias("sum_words"),
    )
    return g.select(
        "lang",
        "n_docs",
        F.col("sum_tok").cast("long").alias("total_tokens"),
        F.when(
            F.col("sum_tok") > 0,
            F.floor(
                F.col("sum_chars").cast("double") / F.col("sum_tok") * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        ).alias("chars_per_token"),
        F.when(
            F.col("sum_words") > 0,
            F.floor(
                F.col("sum_tok").cast("double") / F.col("sum_words") * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        ).alias("tokens_per_word"),
    )


@query(
    "llm_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER)
              % 100
          < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (50% en / 10% rest),
    deterministic by content hash — reproducible across engines, runs, and
    repartitionings, unlike sampleBy(seed). A pure filter: no shuffle, fully
    pushdown-friendly."""
    t = Tables(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.when(F.col("lang") == "en", F.lit(50)).otherwise(F.lit(10))
    return t.documents.filter(bucket < rate).select("doc_id", "lang")


@query(
    "llm_gopher_filter",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, {_DUCK_WORDS.format(col="text")} AS ws
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(ws)                                             AS n_words,
             CASE WHEN len(ws) > 0 THEN
               list_sum(list_transform(ws, w -> length(w))) * 1.0 / len(ws)
             ELSE 0.0 END                                        AS mean_wl,
             CASE WHEN len(ws) > 0 THEN
               len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) * 1.0 / len(ws)
             ELSE 0.0 END                                        AS frac_alpha,
             len(list_filter(ws, w ->
               list_contains(['the','and','of','is','to'], w))) AS n_stop
      FROM base
    )
    SELECT doc_id,
           n_words,
           round(mean_wl, 4)    AS mean_word_len,
           round(frac_alpha, 4) AS frac_alpha_words,
           n_stop,
           CAST(
             n_words BETWEEN 10 AND 10000
             AND mean_wl BETWEEN 2 AND 10
             AND frac_alpha > 0.8
             AND n_stop >= 2
           AS INT) AS passes
    FROM m
    """,
)
def llm_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus quality gate (Rae et al. 2021, public): word
    count bounds, mean word length window, alphabetic-word fraction, and a
    minimum stop-word count — each rule a column, plus the conjunction.
    All array HOFs over one tokenization; a 100 TB corpus filters in a
    single scan with zero shuffle (thresholds adapted to the synthetic
    docs' scale; the rule SHAPE is what the operator provides)."""
    t = Tables(spark, sf_dir)
    ws = T.words(F.col("text"))
    base = D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select("doc_id", ws.alias("ws"))
    n = F.size("ws")
    mean_wl = F.when(
        n > 0,
        F.aggregate("ws", F.lit(0), lambda a, w: a + F.length(w))
        .cast("double")
        / n,
    ).otherwise(F.lit(0.0))
    frac_alpha = F.when(
        n > 0,
        F.size(F.filter("ws", lambda w: w.rlike("[a-z]"))).cast("double") / n,
    ).otherwise(F.lit(0.0))
    n_stop = F.size(
        F.filter("ws", lambda w: w.isin(T.LANG_MARKERS["en"]))
    )
    m = base.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_wl.alias("mean_wl"),
        frac_alpha.alias("frac_alpha"),
        n_stop.cast("long").alias("n_stop"),
    )
    passes = (
        F.col("n_words").between(10, 10000)
        & F.col("mean_wl").between(2, 10)
        & (F.col("frac_alpha") > 0.8)
        & (F.col("n_stop") >= 2)
    )
    return m.select(
        "doc_id",
        "n_words",
        F.round("mean_wl", 4).alias("mean_word_len"),
        F.round("frac_alpha", 4).alias("frac_alpha_words"),
        "n_stop",
        passes.cast("int").alias("passes"),
    )


@query(
    "llm_top_bigrams",
    oracle=f"""
    WITH ws AS (
      SELECT {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), bg AS (
      SELECT unnest(list_transform(w[1:len(w)-1], (x, i) -> x || ' ' || w[i+1]))
               AS bigram
      FROM ws
    )
    SELECT bigram, count(*) AS n
    FROM bg GROUP BY 1
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def llm_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy hitters: top-20 word bigrams by exact count —
    the boilerplate-detection primitive (C4/RefinedWeb strip documents
    dominated by high-frequency spans). zip_with over the token array
    builds bigrams without a self-join; the count is one shuffle on the
    bigram key with map-side partial aggregation, then a 20-row driver
    result. Ties break on the bigram string, so top-20 is deterministic."""
    t = Tables(spark, sf_dir)
    ws = T.words(F.col("text"))
    base = D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select(ws.alias("w"))
    n1 = F.size("w") - 1
    bigrams = F.zip_with(
        F.slice("w", 1, n1),
        F.slice("w", 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        base.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@query(
    "llm_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_WORDS.format(col="text")}) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
    ), dfq AS (
      SELECT word, count(*) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT count(*) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.word,
             (tf.tf * 1.0 / dl.dl) * ln(n.n * 1.0 / dfq.df) AS tfidf
      FROM tf JOIN dl USING (doc_id) JOIN dfq USING (word) CROSS JOIN n
    ), rk AS (
      SELECT doc_id, word, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rk
      FROM scored
    )
    SELECT doc_id, word, round(tfidf, 6) AS tfidf, rk
    FROM rk WHERE rk <= 5
    """,
)
def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — the classic keyword extractor.
    Term frequencies and document frequencies are two aggregates over one
    exploded scan; N arrives by broadcasting a single-row count (no
    driver collect), idf joins back on the word key (skew-safe: word
    cardinality is large), and the per-doc top-5 is a bounded window.
    Deterministic under ties via the (tfidf DESC, word) sort."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    tok = t.documents.select(
        "doc_id", F.explode(T.words(F.col("text"))).alias("word")
    )
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = t.documents.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dl, "doc_id")
        .join(dfq, "word")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            (
                (F.col("tf") / F.col("dl"))
                * F.log(F.col("n") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "word", F.round("tfidf", 6).alias("tfidf"), "rk")
    )


@query(
    "llm_embedding_standardize",
    oracle="""
    WITH idx AS (
      SELECT unnest(list_transform(embedding, (x, i) -> {'i': i, 'x': x})) AS u
      FROM embeddings
    ), stats AS (
      SELECT u.i AS i, avg(u.x) AS m, stddev_pop(u.x) AS s
      FROM idx GROUP BY 1
    ), arrs AS (
      SELECT list(m ORDER BY i) AS ms, list(s ORDER BY i) AS ss FROM stats
    ), zs AS (
      SELECT vec_id,
             unnest(list_transform(embedding, (x, i) ->
               {'i': i, 'z': round((x - ms[i]) / ss[i], 4) + 0.0})) AS u
      FROM embeddings, arrs
    )
    SELECT vec_id, u.i - 1 AS dim, u.z AS z FROM zs
    """,
)
def llm_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding column — the
    feature-scaling pass before clustering / ANN training. Dimension
    stats come from ONE posexplode aggregate (map-side combine collapses
    each partition to 64 partials before the 64-key shuffle), re-enter as
    a single broadcast row of (means[], stds[]), and the normalization is
    a transform() with the index lambda — no join back on vec_id, no
    second shuffle, scales to any row count. Output is flattened to
    (vec_id, dim, z) scalar rows: the correctness driver canonicalizes
    results via pandas sort_values, which cannot hash array cells — the
    flat form is value-checkable AND the shape downstream per-dimension
    consumers (feature stores, columnar trainers) want anyway."""
    t = Tables(spark, sf_dir)
    e = t.embeddings
    stats = (
        e.select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("m"), F.stddev_pop("x").alias("s"))
    )
    arrs = stats.agg(
        F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pm"),
        F.array_sort(F.collect_list(F.struct("i", "s"))).alias("ps"),
    ).select(
        F.col("pm.m").alias("ms"),
        F.col("ps.s").alias("ss"),
    )
    z = F.transform(
        "embedding",
        lambda x, i: F.round(
            (x - F.element_at(F.col("ms"), i + 1))
            / F.element_at(F.col("ss"), i + 1),
            4,
        )
        + F.lit(0.0),
    )
    return (
        e.crossJoin(F.broadcast(arrs))
        .select("vec_id", z.alias("zs"))
        .select("vec_id", F.posexplode("zs").alias("dim", "z"))
    )


@query(
    "llm_label_centroids",
    oracle="""
    WITH idx AS (
      SELECT label,
             unnest(list_transform(embedding, (x, i) -> {'i': i, 'x': x})) AS u
      FROM embeddings
    )
    SELECT label, u.i - 1 AS dim,
           round(avg(u.x), 4)        AS centroid,
           round(stddev_pop(u.x), 4) AS spread,
           count(*)                  AS n
    FROM idx GROUP BY 1, 2
    """,
)
def llm_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid and spread for every embedding dimension — the
    cluster-quality / class-separation diagnostic (and the M-step of a
    k-means iteration if fed back to llm_ivf_topk's assignment). Flat
    (label, dim) output keeps the aggregate fully map-side-combinable:
    10 labels x 64 dims = 640 groups regardless of corpus size."""
    t = Tables(spark, sf_dir)
    return (
        t.embeddings.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg("x"), 4).alias("centroid"),
            F.round(F.stddev_pop("x"), 4).alias("spread"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_DUCK_WS_5 = _DUCK_WORDS.format(col="text")


@query(
    "llm_decontaminate",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, source, {_DUCK_WS_5} AS w FROM documents
    ), sh AS (
      SELECT doc_id, source, unnest({_duck_shingles("w", 5)}) AS s FROM ws
    ), bench AS (
      SELECT DISTINCT s FROM sh WHERE source = 'src0'
    ), hits AS (
      SELECT sh.doc_id, count(DISTINCT sh.s) AS n_shared
      FROM sh JOIN bench USING (s)
      WHERE sh.source != 'src0'
      GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(h.n_shared, 0)                    AS n_shared,
           CAST(coalesce(h.n_shared, 0) > 0 AS INT)   AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.source != 'src0'
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word-5-gram with a held-out benchmark set (here: source='src0'),
    counting the distinct shared shingles — the standard eval-leak scrub
    (GPT-3 appendix C / Dolma). The benchmark shingle set is DISTINCT and
    small relative to the corpus, so Spark broadcasts it; the training
    side streams through a map-side hash semi-join with NO shuffle of the
    full shingle explosion, then aggregates per doc. At 100 TB the
    explode never materializes corpus-wide — it pipelines scan-local into
    the broadcast probe."""
    t = Tables(spark, sf_dir)
    # shingles come from ONE codegen'd regex pass (D.shingles — the HOF
    # construction cost 23s vs 1.4s at sf0.1) and are xxhash64-compressed
    # immediately after the explode: the broadcast set, the probe, and the
    # per-doc count-distinct all move 8-byte longs instead of 5-gram
    # strings (collision odds ~2^-64 per pair — the standard contamination
    # -scrub tradeoff; the DuckDB oracle counts raw shingles, identical
    # absent collisions).
    sh = (
        t.documents.select(
            "doc_id", "source", D.shingles(F.col("text"), 5).alias("__sh")
        )
        .select("doc_id", "source", F.explode("__sh").alias("__s"))
        .select("doc_id", "source", F.xxhash64("__s").alias("s"))
    )
    bench = (
        sh.filter(F.col("source") == "src0").select("s").distinct()
    )
    train = sh.filter(F.col("source") != "src0")
    hits = (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_shared"))
    )
    return (
        t.documents.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).cast("int").alias(
                "contaminated"
            ),
        )
    )


@query(
    "llm_bigram_lm_score",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), bg AS (
      SELECT doc_id, u.w1 AS w1, u.w2 AS w2
      FROM ws, unnest(list_transform(w[1:len(w)-1],
                      (x, i) -> {{'w1': x, 'w2': w[i+1]}})) AS t(u)
    ), c2 AS (
      SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, count(*) AS n1 FROM bg GROUP BY 1
    ), v AS (
      SELECT count(DISTINCT t.tok) AS vocab
      FROM ws, unnest(w) AS t(tok)
    )
    SELECT bg.doc_id,
           floor(avg(ln((c2.n2 + 1.0) / (c1.n1 + v.vocab))) * 1e4 + 0.5) / 1e4
             AS lm_score,
           count(*) AS n_bigrams
    FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY 1
    """,
)
def llm_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM quality score — the perplexity-proxy filter of
    training-data pipelines (CCNet/Gopher use a real KenLM; this is the
    same shape self-trained on the corpus): score(doc) = mean over its
    bigrams of ln P(w2|w1) with add-one smoothing over the corpus vocab.
    Boilerplate scores high (frequent bigrams), lorem-gibberish low.

    Scale shape: bigrams explode once (zip_with over the materialized word
    array — no positional self-join); the count joins are keyed shuffles
    on (w1, w2)/(w1); the vocab size is a 1-row broadcast. Word-frequency
    skew is the watch item — the same head-word mass TF-IDF already
    handles (docstring there)."""
    return _bigram_lm_frame(Tables(spark, sf_dir))


def _bigram_lm_frame(t: Tables) -> DataFrame:
    """(doc_id, lm_score, n_bigrams) per document — the add-one-smoothed
    corpus bigram LM shared by llm_bigram_lm_score and
    llm_perplexity_bucket."""
    d = D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select("doc_id", T.words(F.col("text")).alias("ws"))
    n1 = F.size("ws") - 1
    bg = (
        d.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("ws", 1, n1),
                    F.slice("ws", 2, n1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    # c1 derives from c2 (count per w1 = sum of its bigram counts): one
    # aggregate over the DISTINCT-bigram frame instead of a second full
    # pass + shuffle over every bigram occurrence (guide §2.3 —
    # aggregate before you shuffle). Result-identical by construction.
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    vocab = (
        d.select(F.explode("ws").alias("tok"))
        .agg(F.count_distinct("tok").alias("vocab"))
    )
    scored = (
        bg.join(c2, ["w1", "w2"]).join(c1, ["w1"]).crossJoin(F.broadcast(vocab))
    )
    lp = F.log((F.col("n2") + 1.0) / (F.col("n1") + F.col("vocab")))
    return scored.groupBy("doc_id").agg(
        (F.floor(F.avg(lp) * 1e4 + 0.5) / 1e4).alias("lm_score"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


@query(
    "llm_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             pow(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   / 4294967296.0,
                 1.0 / CAST(n_chars AS DOUBLE)) AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, n_chars
    FROM keyed ORDER BY k DESC, doc_id LIMIT 20
    """,
)
def llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    key = u^(1/w) with u an md5-derived uniform — deterministic, so the
    SAME sample comes out on any engine/partitioning/run, unlike seeded
    rand(). Longer documents (weight = n_chars) are proportionally more
    likely. Top-k by key is TakeOrderedAndProject — no global sort."""
    t = Tables(spark, sf_dir)
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / 4294967296.0
    )
    key = F.pow(u, 1.0 / F.col("n_chars").cast("double"))
    return (
        t.documents.filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(20)
        .drop("k")
    )


# ------------------------------------------------- round-2b: span dedup,
# Gopher dup-ngram fraction, Bloom decontamination, containment verify.


@query(
    "llm_containment_pairs",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT p.id_a, p.id_b,
           round(CASE WHEN least(len(sa.s), len(sb.s)) > 0
                 THEN len(list_intersect(sa.s, sb.s)) * 1.0
                      / least(len(sa.s), len(sb.s))
                 ELSE 0.0 END, 4) AS containment
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.id_a
    JOIN sh sb ON sb.doc_id = p.id_b
    """,
)
def llm_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment |A∩B|/min(|A|,|B|) over the LSH candidate pairs — the
    subset-duplication detector Jaccard misses (a short doc pasted inside
    a long one)."""
    t = Tables(spark, sf_dir)
    cand = D.minhash_candidate_pairs(t.documents, bands=_P_BANDS, n=2)
    return D.containment_pairs(t.documents, cand, n=2)


_DUCK_SPAN = 10  # words per dedup span


@query(
    "llm_span_dedup",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), chunks AS (
      SELECT doc_id,
             [array_to_string(w[i * {_DUCK_SPAN} + 1 : (i + 1) * {_DUCK_SPAN}], ' ')
              FOR i IN range(0, CAST(ceil(len(w) / {_DUCK_SPAN}.0) AS INT))] AS cs
      FROM ws WHERE len(w) > 0
    ), spans AS (
      SELECT doc_id, unnest(list_transform(cs, (x, i) -> {{'idx': i - 1, 'span': x}})) AS u
      FROM chunks
    ), keyed AS (
      SELECT doc_id, u.span AS span,
             doc_id * 1000000 + u.idx AS k
      FROM spans
    ), win AS (
      SELECT span, min(k) AS wk FROM keyed GROUP BY 1
    )
    SELECT k.doc_id,
           count(*)                                        AS n_spans,
           CAST(sum(CASE WHEN k.k = w.wk THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN k.k = w.wk THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4)                            AS kept_frac
    FROM keyed k JOIN win w USING (span)
    GROUP BY 1
    """,
)
def llm_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global span-level dedup: documents are cut into
    consecutive 10-word spans; a span survives only at its FIRST corpus
    occurrence (lexicographic (doc_id, position)), and every later
    occurrence — across documents or repeated inside one — is dropped.
    Output is the per-document retention profile (n_spans, n_kept,
    kept_frac), i.e. what fraction of the doc survives span dedup.

    Scale shape: one explode bounded by corpus_words/10, one shuffle on
    the span's xxhash64 (8-byte key, never the span text) for the global
    min-key winner, one join back on the same key, then a per-doc
    aggregate. No all-pairs, no driver state — the exact shape of C4's
    three-sentence-span dedup at 100 TB. Winner choice is the portable
    integer key doc_id*1e6+idx (idx < 1e6 always: docs are bounded), so
    the DuckDB oracle reproduces the tie-break exactly."""
    t = Tables(spark, sf_dir)
    spans = (
        t.documents.select(
            "doc_id", T.words(F.col("text")).alias("__ws")
        )
        .filter(F.size("__ws") > 0)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, cast(ceil(size(__ws) / {_DUCK_SPAN}.0) as int) - 1), "
                f"i -> array_join(slice(__ws, i * {_DUCK_SPAN} + 1, {_DUCK_SPAN}), ' '))"
            ).alias("__cs"),
        )
        .select("doc_id", F.posexplode("__cs").alias("idx", "span"))
    )
    keyed = spans.select(
        "doc_id",
        F.xxhash64("span").alias("h"),
        (F.col("doc_id") * 1000000 + F.col("idx")).alias("k"),
    )
    # winner election as a whole-partition window min, NOT groupBy+join:
    # the join formulation evaluates the span-building subtree twice (the
    # aggregate side broadcasts, so no exchange reuse links them) — the
    # window keeps it one pass over one exchange on h
    from pyspark.sql import Window as W

    kept = (F.col("k") == F.min("k").over(W.partitionBy("h"))).cast("long")
    return (
        keyed.select("doc_id", kept.alias("kept"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("kept").alias("n_kept"),
            F.round(F.sum("kept") / F.count(F.lit(1)), 4).alias("kept_frac"),
        )
    )


@query(
    "llm_dup_ngram_fraction",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                    ELSE [w[i] || ' ' || w[i + 1] FOR i IN range(1, len(w))]
                    END) AS gram
      FROM ws
    ), c AS (
      SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_grams,
           floor(CASE WHEN sum(cnt * length(gram)) > 0
                 THEN sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END)
                      * 1.0 / sum(cnt * length(gram))
                 ELSE 0.0 END * 10000 + 0.5) / 10000 AS dup_char_frac
    FROM c GROUP BY 1
    """,
)
def llm_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's duplicate-n-gram character fraction (n=2): the share of
    characters sitting inside word-2-grams that occur more than once in
    the SAME document — the repetition signal that catches looped
    boilerplate which unigram repetition_ratio under-weights. NON-distinct
    grams, unlike the shingle dedup family: multiplicity is the signal.

    Per-doc groupBy on (doc_id, gram) keeps the aggregation map-side
    partial; nothing leaves the document boundary, so the operator scales
    embarrassingly (no corpus-wide key)."""
    t = Tables(spark, sf_dir)
    # NON-distinct bigrams from one codegen'd lookahead-regex pass
    # (D.shingle_strings — the prior packed-HOF construction evaluated
    # interpreted and cost 45s vs ~2s at sf0.1), hash-packed to single
    # longs BEFORE leaving the row: (48-bit xxhash64 | 16-bit length) so
    # the duplicate accounting runs as a codegen'd groupBy over 8-byte
    # keys and exact gram strings never shuffle. Within-doc
    # packed-collision odds ~g^2*2^-49.
    packed = (
        D._spread_narrow_scan(
            t.documents.select("doc_id", "text"), "doc_id"
        )
        .select(
            "doc_id", F.explode(D.shingle_strings(F.col("text"), 2)).alias("__g")
        )
        .select(
            "doc_id",
            (
                F.shiftleft(F.xxhash64("__g"), 16)
                .bitwiseOR(F.length("__g").cast("long"))
            ).alias("g"),
        )
    )
    counted = packed.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    chars = F.col("cnt") * (F.col("g").bitwiseAND(F.lit(65535)))
    dup_chars = F.when(F.col("cnt") > 1, chars).otherwise(F.lit(0))
    return counted.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        (
            F.floor(
                F.when(
                    F.sum(chars) > 0, F.sum(dup_chars) * 1.0 / F.sum(chars)
                ).otherwise(0.0)
                * 10000
                + 0.5
            )
            / 10000
        ).alias("dup_char_frac"),
    )


_BLOOM_M = 1 << 20  # bits
_BLOOM_K = 3  # hash functions = disjoint md5 hex slices


@query(
    "llm_bloom_decontaminate",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, source, {_DUCK_WS_5} AS w FROM documents
    ), sh AS (
      SELECT doc_id, source, unnest({_duck_shingles("w", 5)}) AS s FROM ws
    ), bench AS (
      SELECT DISTINCT s FROM sh WHERE source = 'src0'
    ), bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(s), j * 8 + 1, 6)) AS BIGINT) % {_BLOOM_M} AS pos
      FROM bench, (SELECT unnest([0, 1, 2]) AS j)
    ), pp AS (
      SELECT doc_id, s, j,
             CAST(('0x' || substr(md5(s), j * 8 + 1, 6)) AS BIGINT) % {_BLOOM_M} AS pos
      FROM sh, (SELECT unnest([0, 1, 2]) AS j)
      WHERE source != 'src0'
    ), m AS (
      SELECT doc_id, s FROM pp JOIN bits USING (pos)
      GROUP BY doc_id, s HAVING count(*) = {_BLOOM_K}
    ), h AS (
      SELECT doc_id, count(*) AS n_bloom_hits FROM m GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(h.n_bloom_hits, 0)                  AS n_bloom_hits,
           CAST(coalesce(h.n_bloom_hits, 0) > 0 AS INT) AS contaminated
    FROM documents d LEFT JOIN h USING (doc_id)
    WHERE d.source != 'src0'
    """,
)
def llm_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination: the benchmark's 5-gram
    shingles are folded into an m=2^20-bit / k=3 Bloom filter (positions
    = disjoint md5 hex slices mod m, portable to the oracle), and a
    training doc is flagged when ANY of its shingles has all k bits set.
    Deterministic false positives included — that is Bloom semantics, and
    both engines compute the identical filter, so the result is still
    value-checkable.

    This is the scale path where the exact broadcast set of
    llm_decontaminate stops fitting: the filter is O(m) bits regardless
    of benchmark size. Declaratively the bit array is the distinct
    position set (small: ≤ m rows of one long), broadcast into a map-side
    equi-join probe; the corpus side streams scan-local, per-shingle
    verdicts aggregate per doc, nothing corpus-wide shuffles. A real
    deployment swaps the position-set join for a bitmask broadcast
    variable with identical semantics."""
    t = Tables(spark, sf_dir)
    sh = (
        t.documents.select(
            "doc_id", "source", D.shingles(F.col("text"), 5).alias("__sh")
        )
        .select("doc_id", "source", F.explode("__sh").alias("s"))
        # one md5 per shingle, materialized as a projection column so the
        # three position slices share it (interpreted exprs get no CSE)
        .select("doc_id", "source", "s", F.md5("s").alias("__m"))
    )

    def pos(j: int):
        return (
            F.conv(F.substring(F.col("__m"), j * 8 + 1, 6), 16, 10).cast(
                "long"
            )
            % _BLOOM_M
        )

    jp = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), pos(j).alias("pos"))
                for j in range(_BLOOM_K)
            ]
        )
    )
    bits = (
        sh.filter(F.col("source") == "src0")
        .select(jp.alias("jp"))
        .select(F.col("jp.pos").alias("pos"))
        .distinct()
    )
    probe = (
        sh.filter(F.col("source") != "src0")
        .select("doc_id", F.xxhash64("s").alias("sh64"), jp.alias("jp"))
        .select("doc_id", "sh64", F.col("jp.pos").alias("pos"))
    )
    hits = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "sh64")
        .agg(F.count(F.lit(1)).alias("nj"))
        .filter(F.col("nj") == _BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
    )
    return (
        t.documents.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) > 0).cast("int").alias(
                "contaminated"
            ),
        )
    )


@query(
    "llm_embedding_quantize",
    oracle="""
    WITH idx AS (
      SELECT unnest(list_transform(embedding,
                    (x, i) -> {'i': i, 'x': CAST(x AS DOUBLE)})) AS u
      FROM embeddings
    ), stats AS (
      SELECT u.i AS i, min(u.x) AS lo, max(u.x) AS hi FROM idx GROUP BY 1
    ), arrs AS (
      SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his
      FROM stats
    ), coded AS (
      SELECT vec_id,
             list_transform(embedding, (x, i) ->
               CASE WHEN his[i] = los[i] THEN 0
                    ELSE CAST(floor((CAST(x AS DOUBLE) - los[i])
                              / (his[i] - los[i]) * 255 + 0.5) AS INT)
               END) AS codes,
             list_transform(embedding, (x, i) ->
               pow(CAST(x AS DOUBLE)
                   - (los[i] + (CASE WHEN his[i] = los[i] THEN 0
                        ELSE floor((CAST(x AS DOUBLE) - los[i])
                             / (his[i] - los[i]) * 255 + 0.5) END)
                      / 255.0 * (his[i] - los[i])), 2)) AS errs
      FROM embeddings, arrs
    ), flat AS (
      SELECT vec_id,
             unnest(list_transform(codes, (c, i) -> {'i': i, 'c': c})) AS u,
             floor(list_aggregate(errs, 'sum') / len(errs) * 10000000 + 0.5)
               / 10000000 AS mse
      FROM coded
    )
    SELECT vec_id, u.i - 1 AS dim, u.c AS code, mse FROM flat
    """,
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8-style quantization of the embedding column: per-
    dimension [min, max] from one posexplode aggregate, values mapped to
    0..255 codes, plus the per-vector reconstruction MSE. The 4x storage
    cut (and the 4x shuffle cut for every downstream similarity op) is
    the standard embedding-at-scale lever; codes stay value-checkable
    because quantization is pure deterministic arithmetic — all math is
    explicitly double on both engines so float-promotion rules cannot
    diverge. Same 1-row broadcast shape as llm_embedding_standardize
    (no join back on vec_id, no second shuffle). Output is flattened to
    (vec_id, dim, code, mse) scalar rows — the driver's pandas
    canonicalizer cannot hash array cells, and the flat form is what an
    int8 column store ingests anyway."""
    t = Tables(spark, sf_dir)
    e = t.embeddings
    stats = (
        e.select(F.posexplode("embedding").alias("i", "x"))
        .select("i", F.col("x").cast("double").alias("x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )
    arrs = stats.agg(
        F.array_sort(F.collect_list(F.struct("i", "lo"))).alias("pl"),
        F.array_sort(F.collect_list(F.struct("i", "hi"))).alias("ph"),
    ).select(F.col("pl.lo").alias("los"), F.col("ph.hi").alias("his"))

    def lo(i):
        return F.element_at(F.col("los"), i + 1)

    def hi(i):
        return F.element_at(F.col("his"), i + 1)

    def code(x, i):
        xd = x.cast("double")
        return (
            F.when(hi(i) == lo(i), F.lit(0))
            .otherwise(
                F.floor((xd - lo(i)) / (hi(i) - lo(i)) * 255 + 0.5).cast(
                    "int"
                )
            )
        )

    codes = F.transform("embedding", lambda x, i: code(x, i))
    errs = F.transform(
        "embedding",
        lambda x, i: F.pow(
            x.cast("double")
            - (lo(i) + code(x, i).cast("double") / 255.0 * (hi(i) - lo(i))),
            F.lit(2),
        ),
    )
    mse = (
        F.floor(
            F.aggregate(errs, F.lit(0.0), lambda a, b: a + b)
            / F.size(errs)
            * 10000000
            + 0.5
        )
        / 10000000
    )
    return (
        e.crossJoin(F.broadcast(arrs))
        .select("vec_id", codes.alias("codes"), mse.alias("mse"))
        .select(
            "vec_id",
            F.posexplode("codes").alias("dim", "code"),
            "mse",
        )
        .select("vec_id", "dim", "code", "mse")
    )


# ---------------------------------------------------------------- search

@query(
    "llm_inverted_index",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({_DUCK_WORDS.format(col='text')}) AS term
      FROM documents
    ), tf AS (
      SELECT term, doc_id, count(*) AS tf FROM w GROUP BY 1, 2
    )
    SELECT term,
           count(*)                    AS n_docs,
           CAST(sum(tf) AS BIGINT)     AS total_tf,
           min(doc_id)                 AS first_doc
    FROM tf GROUP BY term HAVING count(*) >= 50
    """,
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting-list statistics: term -> document frequency,
    total term frequency, lowest posting. The build is one explode + two
    keyed aggregations (term is the shuffle key — high cardinality, no
    skew beyond natural Zipf); the posting lists themselves never leave
    the executors. HAVING >= 50 keeps the checked surface to head terms."""
    t = Tables(spark, sf_dir)
    w = t.documents.select(
        "doc_id", F.explode(T.words(F.col("text"))).alias("term")
    )
    tf = w.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tf").alias("total_tf"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 50)
    )


#: fixed search query for llm_bm25_search (terms from the corpus vocab)
_BM25_TERMS = ("spark", "vector", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "llm_bm25_search",
    oracle=f"""
    WITH wl AS (
      SELECT doc_id, {_DUCK_WORDS.format(col='text')} AS ws FROM documents
    ), w AS (
      SELECT doc_id, unnest(ws) AS term FROM wl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM w
      WHERE term IN {tuple(_BM25_TERMS)} GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), dl AS (
      SELECT doc_id, len(ws) AS dl FROM wl
    ), scal AS (
      SELECT count(*) AS n, avg(len(ws)) AS avgdl FROM wl
    )
    SELECT tf.doc_id,
           floor(sum(
             ln(1 + (scal.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * ({_BM25_K1} + 1)
             / (tf.tf + {_BM25_K1}
                * (1 - {_BM25_B} + {_BM25_B} * dl.dl / scal.avgdl))
           ) * 10000 + 0.5) / 10000 AS bm25
    FROM tf
    JOIN dfreq USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN scal
    GROUP BY tf.doc_id
    """,
)
def llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring of the corpus against a fixed term query —
    the classic sparse-retrieval ranker (Robertson-Sparck Jones weights,
    k1=1.2 b=0.75).

    Scale shape: the only full-corpus work is one scan computing word
    lists; term frequencies exist ONLY for the 3 query terms (filter
    pushed before the tf aggregation), document frequency and the
    (N, avgdl) scalars are tiny broadcasts, and the final join keys on
    doc_id. Nothing corpus-wide shuffles except the matched-docs tf/dl
    join. Scores round through floor(x*1e4+0.5)/1e4 so a last-ulp ln()
    divergence between engines can't flip the hash."""
    t = Tables(spark, sf_dir)
    wl = t.documents.select(
        "doc_id", T.words(F.col("text")).alias("ws")
    )
    w = wl.select("doc_id", F.explode("ws").alias("term"))
    tf = (
        w.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = wl.select("doc_id", F.size("ws").alias("dl"))
    scal = wl.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("ws")).alias("avgdl")
    )
    k1, b = _BM25_K1, _BM25_B
    contrib = (
        F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf") * (k1 + 1)
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg(
            (F.floor(F.sum(contrib) * 10000 + 0.5) / 10000).alias("bm25")
        )
    )


# ------------------------------------------------- normalization-aware dedup

@query(
    "llm_normalized_dedup",
    oracle=f"""
    WITH canon AS (
      SELECT doc_id, lang,
             md5(array_to_string({_DUCK_WORDS.format(col='text')}, ' ')) AS h
      FROM documents
    )
    SELECT doc_id, lang FROM canon
    WHERE doc_id IN (SELECT min(doc_id) FROM canon GROUP BY h)
    """,
)
def llm_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style normalized dedup: case-fold, strip punctuation,
    collapse whitespace, THEN hash — catches near-identical docs that
    differ only in formatting, which exact sha2-of-raw-text dedup
    (llm_dedup_exact) misses. Shuffle key is the 32-byte md5 of the
    canonical form, never the text."""
    t = Tables(spark, sf_dir)
    canon = t.documents.select(
        "doc_id",
        "lang",
        F.md5(F.array_join(T.words(F.col("text")), " ")).alias("__h"),
    )
    survivors = canon.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    return canon.join(survivors, "doc_id", "left_semi").select(
        "doc_id", "lang"
    )


# ------------------------------------------------------------- domain mixing

@query(
    "llm_domain_mix_sample",
    oracle="""
    WITH counts AS (
      SELECT source, count(*) AS n FROM documents GROUP BY 1
    ), target AS (
      SELECT min(n) AS floor_n FROM counts
    ), scored AS (
      SELECT d.doc_id, d.source,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))
                  AS INTEGER) % 10000 AS u,
             CAST(t.floor_n AS DOUBLE) / c.n AS rate
      FROM documents d
      JOIN counts c USING (source) CROSS JOIN target t
    )
    SELECT source,
           count(*) FILTER (WHERE u < rate * 10000) AS n_kept,
           count(*)                                 AS n_total
    FROM scored GROUP BY source
    """,
)
def llm_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced domain mixing: deterministically downsample every source
    to (approximately) the smallest source's size — the training-mix
    rebalancing step. The keep decision is a pure function of doc_id
    (md5 slice mod 10^4 vs the per-source rate), so the sample is
    reproducible across engines, runs, and cluster sizes; per-source
    counts are a tiny broadcast and the floor is a 1-row broadcast
    scalar. No RAND(), no driver-side sampling state."""
    t = Tables(spark, sf_dir)
    counts = t.documents.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    target = counts.agg(F.min("n").alias("floor_n"))
    scored = (
        t.documents.select("doc_id", "source")
        .join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(target))
        .select(
            "source",
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
                    16,
                    10,
                ).cast("long")
                % 10000
            ).alias("u"),
            (F.col("floor_n").cast("double") / F.col("n")).alias("rate"),
        )
    )
    return scored.groupBy("source").agg(
        F.count(F.when(F.col("u") < F.col("rate") * 10000, 1)).alias(
            "n_kept"
        ),
        F.count(F.lit(1)).alias("n_total"),
    )


_DSIR_BUCKETS = 128  # hashed-unigram feature space (DSIR, Xie et al. 2023)


@query(
    "llm_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, is_tgt,
             CAST(('0x' || substr(md5(w), 1, 6)) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket
      FROM (
        SELECT doc_id, source = 'src0' AS is_tgt,
               unnest({_DUCK_WORDS.format(col="text")}) AS w
        FROM documents
      )
    ), doc_b AS (
      SELECT doc_id, is_tgt, bucket, count(*) AS n
      FROM toks GROUP BY ALL
    ), gb AS (
      SELECT bucket,
             sum(CASE WHEN is_tgt THEN n ELSE 0 END) AS tn,
             sum(CASE WHEN NOT is_tgt THEN n ELSE 0 END) AS rn
      FROM doc_b GROUP BY bucket
    ), tot AS (
      SELECT sum(tn) AS tt, sum(rn) AS rt FROM gb
    ), lam AS (
      SELECT bucket,
             CAST(floor((ln((tn + 1.0) / (tt + {_DSIR_BUCKETS}.0))
                  - ln((rn + 1.0) / (rt + {_DSIR_BUCKETS}.0))) * 1e8 + 0.5)
               AS BIGINT) AS lam_i
      FROM gb CROSS JOIN tot
    )
    SELECT d.doc_id,
           CAST(sum(d.n) AS BIGINT) AS n_tokens,
           floor(sum(d.n * l.lam_i) / 100.0 + 0.5) / 1e6 AS dsir_logw
    FROM doc_b d JOIN lam l USING (bucket)
    WHERE NOT d.is_tgt
    GROUP BY d.doc_id
    """,
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw-pool
    document (source != 'src0') by how target-like (source = 'src0') its
    hashed-unigram bag is — the log-likelihood ratio of two smoothed
    bucket-multinomials, sum_b n_b * ln(p_tgt(b)/p_raw(b)). High-weight
    docs are the ones importance resampling would pull into the training
    mix.

    Scale shape: one token explode (bounded by corpus words), one
    map-side-combinable groupBy(doc_id, bucket) whose output feeds BOTH
    the 128-row global bucket table (second tiny agg — the raw token
    stream is never re-scanned) and the per-doc scoring join against the
    broadcast lambda table. Nothing driver-side, no all-pairs; the only
    cross join is the 1-row token-total scalar folded into the 128-row
    lambda frame BEFORE it broadcasts. The hash is md5-slice mod 128 on
    the word — engine-portable, so the oracle checks values, not just
    shape. Lambdas are quantized to int64 1e-8 units on both engines so
    the per-doc weight is an exact integer sum — no float-accumulation
    order can flip the rounded output (stricter than pre-rounded
    doubles, which measurably flipped one row at sf0.1)."""
    scored = _dsir_scored(Tables(spark, sf_dir))
    return scored.select(
        "doc_id",
        "n_tokens",
        (F.floor(F.col("w_i") / F.lit(100.0) + F.lit(0.5)) / 1e6).alias(
            "dsir_logw"
        ),
    )


def _dsir_scored(t: Tables) -> DataFrame:
    """Shared DSIR scoring frame: (doc_id, n_tokens, w_i) for every
    raw-pool doc, where w_i is the EXACT int64 importance weight in 1e-8
    log units (sum of per-bucket counts x quantized lambdas)."""
    toks = t.documents.select(
        "doc_id",
        (F.col("source") == "src0").alias("is_tgt"),
        F.explode(T.words(F.col("text"))).alias("w"),
    ).select(
        "doc_id",
        "is_tgt",
        (
            F.conv(F.substring(F.md5("w"), 1, 6), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("bucket"),
    )
    # Persisted: three consumers (global bucket table, token totals via it,
    # and the scoring join) — without persist each branch re-scans and
    # re-explodes the full corpus (measured 6 scans at sf0.001).
    doc_b = tracked(toks.groupBy("doc_id", "is_tgt", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    ).persist())
    glob = doc_b.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_tgt"), F.col("n")).otherwise(0)).alias("tn"),
        F.sum(F.when(~F.col("is_tgt"), F.col("n")).otherwise(0)).alias("rn"),
    )
    tot = glob.agg(F.sum("tn").alias("tt"), F.sum("rn").alias("rt"))
    lam = (
        glob.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                (
                    F.log((F.col("tn") + 1.0) / (F.col("tt") + float(_DSIR_BUCKETS)))
                    - F.log((F.col("rn") + 1.0) / (F.col("rt") + float(_DSIR_BUCKETS)))
                )
                * 1e8
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lam_i"),
        )
    )
    return (
        doc_b.filter(~F.col("is_tgt"))
        .join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("n") * F.col("lam_i")).alias("w_i"),
        )
    )


_DSIR_TOPK = 100  # selection budget for the resample step


@query(
    "llm_dsir_resample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, is_tgt,
             CAST(('0x' || substr(md5(w), 1, 6)) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket
      FROM (
        SELECT doc_id, source = 'src0' AS is_tgt,
               unnest({_DUCK_WORDS.format(col="text")}) AS w
        FROM documents
      )
    ), doc_b AS (
      SELECT doc_id, is_tgt, bucket, count(*) AS n
      FROM toks GROUP BY ALL
    ), gb AS (
      SELECT bucket,
             sum(CASE WHEN is_tgt THEN n ELSE 0 END) AS tn,
             sum(CASE WHEN NOT is_tgt THEN n ELSE 0 END) AS rn
      FROM doc_b GROUP BY bucket
    ), tot AS (
      SELECT sum(tn) AS tt, sum(rn) AS rt FROM gb
    ), lam AS (
      SELECT bucket,
             CAST(floor((ln((tn + 1.0) / (tt + {_DSIR_BUCKETS}.0))
                  - ln((rn + 1.0) / (rt + {_DSIR_BUCKETS}.0))) * 1e8 + 0.5)
               AS BIGINT) AS lam_i
      FROM gb CROSS JOIN tot
    ), scored AS (
      SELECT d.doc_id,
             CAST(sum(d.n) AS BIGINT) AS n_tokens,
             sum(d.n * l.lam_i) AS w_i
      FROM doc_b d JOIN lam l USING (bucket)
      WHERE NOT d.is_tgt
      GROUP BY d.doc_id
    )
    SELECT doc_id, n_tokens,
           floor(w_i / 100.0 + 0.5) / 1e6 AS dsir_logw
    FROM scored
    ORDER BY w_i DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """,
)
def llm_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection step: the 100 highest-importance raw-pool docs —
    the slice importance resampling promotes into the training mix.
    Ranking is on the EXACT int64 micro-weight with doc_id as the tie
    break, so the LIMIT boundary is deterministic across engines and
    partitionings (ranking the rounded double would not be); the plan is
    a TakeOrderedAndProject over the scored frame — per-partition top-k
    then a k-row driver merge, never a global sort."""
    scored = _dsir_scored(Tables(spark, sf_dir))
    return (
        scored.orderBy(F.col("w_i").desc(), "doc_id")
        .limit(_DSIR_TOPK)
        .select(
            "doc_id",
            "n_tokens",
            (F.floor(F.col("w_i") / F.lit(100.0) + F.lit(0.5)) / 1e6).alias(
                "dsir_logw"
            ),
        )
    )


# ----------------------------------------------------------- embedding PCA

_PCA_DIM = 64
#: the synthetic embeddings' spectrum is FLAT (l2/l1 = 0.987 at sf0.01 —
#: near-isotropic random vectors), so the power method needs K=128 to
#: reach |cos| > 0.99 vs the true top eigenvector (measured: K=8 -> 0.51,
#: K=64 -> 0.96, K=128 -> 0.995). Cross-engine equality holds at ANY K
#: (both engines run the same fixed iteration); K only buys PCA fidelity.
#: Each oracle step is a 64-row aggregate over the 4096-entry cov — 2*K
#: unrolled MATERIALIZED CTEs stay trivially cheap.
_PCA_ITERS = 128


def _power_pca_oracle(d: int, iters: int) -> str:
    """Unrolled fixed-iteration power-method PCA as DuckDB CTEs (VERDICT
    r11 item 4 — the same programmatically-unrolled pattern as
    graph_pagerank's oracle). Covariance forms from one pass of raw
    second moments (C = M2/n - mu mu^T, the identical formula the Spark
    side uses), then exactly ``iters`` power steps from the all-ones
    start vector give the top component, Rayleigh deflation
    (C2 = C - lam v v^T) and ``iters`` more steps the second. Fixed
    iteration count means cross-engine equality does NOT depend on
    eigengap convergence — both engines compute the same arithmetic."""

    def steps(prefix: str, cov: str) -> str:
        # every step is MATERIALIZED: DuckDB inlines plain CTEs, and a
        # step that references its predecessor twice (w and its norm)
        # would otherwise expand 2^iters-fold — the first run exhausted
        # file descriptors re-scanning the parquet through the blowup
        out = [
            f"{prefix}0 AS MATERIALIZED (SELECT pos, 1.0 / sqrt({d}.0) AS val"
            f" FROM (SELECT DISTINCT p1 AS pos FROM cov))"
        ]
        for k in range(1, iters + 1):
            out.append(
                f"""{prefix}w{k} AS MATERIALIZED (
      SELECT c.p1 AS pos, sum(c.c * v.val) AS w
      FROM {cov} c JOIN {prefix}{k - 1} v ON c.p2 = v.pos GROUP BY c.p1
    ), {prefix}{k} AS MATERIALIZED (
      SELECT pos, w / (SELECT sqrt(sum(w * w)) FROM {prefix}w{k}) AS val
      FROM {prefix}w{k}
    )"""
            )
        return ",\n    ".join(out)

    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x
      FROM e
    ),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM e),
    mu AS MATERIALIZED (SELECT pos, sum(x) / (SELECT n FROM nn) AS mu
           FROM dims GROUP BY pos),
    m2 AS MATERIALIZED (
      SELECT a.pos AS p1, b.pos AS p2,
             sum(a.x * b.x) / (SELECT n FROM nn) AS m2
      FROM dims a JOIN dims b USING (vec_id)
      GROUP BY 1, 2
    ),
    cov AS MATERIALIZED (
      SELECT m2.p1, m2.p2, m2.m2 - ma.mu * mb.mu AS c
      FROM m2 JOIN mu ma ON m2.p1 = ma.pos JOIN mu mb ON m2.p2 = mb.pos
    ),
    {steps('v', 'cov')},
    lam1 AS MATERIALIZED (
      SELECT sum(a.val * c.c * b.val) AS lam
      FROM cov c JOIN v{iters} a ON c.p1 = a.pos
                 JOIN v{iters} b ON c.p2 = b.pos
    ),
    cov2 AS MATERIALIZED (
      SELECT c.p1, c.p2,
             c.c - (SELECT lam FROM lam1) * a.val * b.val AS c
      FROM cov c JOIN v{iters} a ON c.p1 = a.pos
                 JOIN v{iters} b ON c.p2 = b.pos
    ),
    {steps('u', 'cov2')},
    proj AS (
      SELECT d.vec_id,
             sum(d.x * v.val) AS raw0,
             sum(d.x * u.val) AS raw1
      FROM dims d
      JOIN v{iters} v ON d.pos = v.pos
      JOIN u{iters} u ON d.pos = u.pos
      GROUP BY d.vec_id
    ),
    mudot AS (
      SELECT sum(m.mu * v.val) AS d0, sum(m.mu * u.val) AS d1
      FROM mu m JOIN v{iters} v ON m.pos = v.pos
                JOIN u{iters} u ON m.pos = u.pos
    )
    SELECT p.vec_id,
           floor((p.raw0 - (SELECT d0 FROM mudot)) * 1e6 + 0.5) / 1e6 AS pc0,
           floor((p.raw1 - (SELECT d1 FROM mudot)) * 1e6 + 0.5) / 1e6 AS pc1
    FROM proj p
    """


@query(
    "llm_embedding_power_pca",
    oracle=_power_pca_oracle(_PCA_DIM, _PCA_ITERS),
)
def llm_embedding_power_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 PCA projection by FIXED-ITERATION power method (VERDICT r11
    item 4 — the value-oracled successor of the rows-only
    llm_embedding_pca entry; the full-rank eigh kernel remains engine
    API as llm/similarity.py:pca_project, numpy-pinned in
    tests/test_llm.py::test_pca_project_matches_numpy).

    Scale split is the standard d << n factorization: ONE distributed
    BLAS pass accumulates the raw moments (n, sum x, X^T X) via
    llm/similarity.raw_moments — the same Arrow-batched mapInPandas +
    keyed combine pca_project fits from, never a d^2-expression
    Catalyst agg — the 64 x 64 eigen work runs on the driver (K=8
    power steps from the all-ones vector, Rayleigh deflation, K more
    for the second component, arithmetic identical to the oracle's
    unrolled MATERIALIZED CTEs), and the two loading vectors re-enter
    as broadcast array literals in ONE zip_with projection scan.
    Fixed K means equality never depends on eigengap convergence."""
    import math

    t = Tables(spark, sf_dir)
    d, K = _PCA_DIM, _PCA_ITERS
    n, s, xx = S.raw_moments(t.embeddings)
    mu = [float(v) / n for v in s]
    cov = [
        [float(xx[i][j]) / n - mu[i] * mu[j] for j in range(d)]
        for i in range(d)
    ]

    def _power(mat: list[list[float]]) -> list[float]:
        v = [1.0 / math.sqrt(d)] * d
        for _ in range(K):
            w = [sum(mat[i][j] * v[j] for j in range(d)) for i in range(d)]
            nrm = math.sqrt(sum(x * x for x in w))
            v = [x / nrm for x in w]
        return v

    v1 = _power(cov)
    lam1 = sum(
        v1[i] * cov[i][j] * v1[j] for i in range(d) for j in range(d)
    )
    cov2 = [
        [cov[i][j] - lam1 * v1[i] * v1[j] for j in range(d)]
        for i in range(d)
    ]
    v2 = _power(cov2)
    d0 = sum(mu[j] * v1[j] for j in range(d))
    d1 = sum(mu[j] * v2[j] for j in range(d))
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v1_lit = F.array(*[F.lit(x) for x in v1])
    v2_lit = F.array(*[F.lit(x) for x in v2])

    def _proj(vec_lit, mudot):
        prod = F.zip_with(xd, vec_lit, lambda x, w: x * w)
        raw = F.aggregate(prod, F.lit(0.0), lambda a, b: a + b)
        return F.floor((raw - F.lit(mudot)) * 1e6 + 0.5) / 1e6

    return t.embeddings.select(
        "vec_id",
        _proj(v1_lit, d0).alias("pc0"),
        _proj(v2_lit, d1).alias("pc1"),
    )


# ------------------------------------------------------------ kNN classify

@query(
    "llm_knn_classify",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id % 50 = 0
    ), c AS (
      SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 50 != 0
    ), scored AS (
      SELECT q.qid, c.vec_id, c.label,
             floor(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(q.qv AS DOUBLE[])) * 1000000
                   + 0.5) / 1000000 AS cos6
      FROM c CROSS JOIN q
    ), top AS (
      SELECT qid, vec_id, label, cos6,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos6 DESC, vec_id) AS rn
      FROM scored
    ), votes AS (
      SELECT qid, label, count(*) AS n_votes, max(cos6) AS best_cos
      FROM top WHERE rn <= 5 GROUP BY 1, 2
    )
    SELECT qid, label AS pred_label, n_votes, best_cos
    FROM (
      SELECT qid, label, n_votes, best_cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY n_votes DESC, label) AS vr
      FROM votes
    ) WHERE vr = 1
    """,
)
def llm_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label classification: every 50th vector is held out as a query
    and labeled by majority vote of its 5 nearest corpus neighbors
    (cosine). The query side is a tiny broadcast; the corpus streams
    through the scored crossJoin scan-local (never shuffled on a pair
    key), top-5 selection is a per-query window, and the vote is a keyed
    aggregate. Cosines are rounded to the 1e-6 grid BEFORE ranking so
    engine-specific float summation order cannot flip neighbor ranks;
    ties break on vec_id, votes on (count desc, label). At 100 TB the
    broadcast query block is the batch-inference unit — queries chunk
    into broadcast-sized groups, corpus side unchanged (same plan as
    llm_cosine_topk)."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    e = t.embeddings
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = e.filter(F.col("vec_id") % 50 != 0)
    # cast to double BEFORE the dot: float32 per-term rounding reaches
    # the 1e-6 grid (one rank flip at sf0.001 without this)
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qd = F.transform(F.col("qv"), lambda x: x.cast("double"))
    cos6 = F.floor(S.cosine(xd, qd) * 1000000 + 0.5) / 1000000
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "vec_id", "label", cos6.alias("cos6")
    )
    top = scored.select(
        "qid",
        "label",
        "cos6",
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.col("cos6").desc(), "vec_id"))
        .alias("rn"),
    ).filter(F.col("rn") <= 5)
    votes = top.groupBy("qid", "label").agg(
        F.count(F.lit(1)).alias("n_votes"), F.max("cos6").alias("best_cos")
    )
    return (
        votes.select(
            "qid",
            "label",
            "n_votes",
            "best_cos",
            F.row_number()
            .over(
                W.partitionBy("qid").orderBy(F.col("n_votes").desc(), "label")
            )
            .alias("vr"),
        )
        .filter(F.col("vr") == 1)
        .select(
            "qid",
            F.col("label").alias("pred_label"),
            "n_votes",
            "best_cos",
        )
    )


# ------------------------------------------------- sketch calibration

_est_sig_cols = ",\n           ".join(
    _duck_minhash(_duck_shingles("w", 2), b, _P_BANDS) + f" AS mh_{b}"
    for b in range(_P_BANDS)
)


@query(
    "llm_minhash_jaccard_est",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sig AS (
      SELECT doc_id,
           {_est_sig_cols}
      FROM ws
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT p.id_a, p.id_b,
           ({" + ".join(f"CAST(ga.mh_{b} = gb.mh_{b} AS INT)" for b in range(_P_BANDS))})
             / {_P_BANDS}.0 AS est_jaccard,
           round(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
                 THEN len(list_intersect(sa.s, sb.s))
                      / len(list_distinct(list_concat(sa.s, sb.s)))
                 ELSE 0.0 END, 4) AS jaccard
    FROM pairs p
    JOIN sig ga ON ga.doc_id = p.id_a
    JOIN sig gb ON gb.doc_id = p.id_b
    JOIN sh sa ON sa.doc_id = p.id_a
    JOIN sh sb ON sb.doc_id = p.id_b
    """,
)
def llm_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch calibration: the MinHash band-agreement Jaccard ESTIMATE
    next to the exact n-gram Jaccard for every LSH candidate pair —
    the quality gauge that tells you whether the configured band count
    is adequate before trusting the sketch at full scale (est is
    quantized to 1/bands; agreement fraction is an unbiased estimator
    of true Jaccard). Signature join keys on doc_id, exact check only
    on candidates — no new pair enumeration."""
    t = Tables(spark, sf_dir)
    cand = D.minhash_candidate_pairs(t.documents, bands=_P_BANDS, n=2)
    # persisted: BOTH attach joins (id_a and id_b sides) read the
    # signature frame — unpersisted, the shingle+md5 signature pipeline
    # evaluates once per side
    sig = tracked(
        D.minhash_signature(t.documents, bands=_P_BANDS, n=2).persist()
    )
    ga = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh_{b}").alias(f"a_{b}") for b in range(_P_BANDS)],
    )
    gb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh_{b}").alias(f"b_{b}") for b in range(_P_BANDS)],
    )
    agree = sum(
        (F.col(f"a_{b}") == F.col(f"b_{b}")).cast("int")
        for b in range(_P_BANDS)
    ) / float(_P_BANDS)
    exact = D.jaccard_pairs(t.documents, cand, n=2)
    return (
        exact.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a", "id_b", agree.alias("est_jaccard"), "jaccard"
        )
    )


# --------------------------------------------------- composite pipeline

@query(
    "llm_corpus_pipeline",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, lang, source, n_chars,
             {_DUCK_WORDS.format(col="text")} AS w, text
      FROM documents
    ), survivors AS (
      SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM ws) WHERE doc_id = keep
    ), sh AS (
      SELECT doc_id, source, unnest({_duck_shingles("w", 5)}) AS s FROM ws
    ), bench AS (
      SELECT DISTINCT s FROM sh WHERE source = 'src0'
    ), contaminated AS (
      SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)
      WHERE sh.source != 'src0'
    ), verdicts AS (
      SELECT ws.doc_id, ws.lang, ws.n_chars,
             (len(ws.w) >= 30)                            AS long_enough,
             (sv.doc_id IS NOT NULL)                      AS is_canonical,
             (ct.doc_id IS NULL)                          AS is_clean,
             (ws.source != 'src0')                        AS is_train
      FROM ws
      LEFT JOIN survivors sv ON sv.doc_id = ws.doc_id
      LEFT JOIN contaminated ct ON ct.doc_id = ws.doc_id
    )
    SELECT lang,
           CAST(count(*) FILTER (WHERE is_train) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE is_train AND long_enough
                                 AND is_canonical AND is_clean) AS BIGINT)
             AS n_kept,
           CAST(coalesce(sum(n_chars) FILTER (WHERE is_train AND long_enough
                                 AND is_canonical AND is_clean), 0) AS BIGINT)
             AS kept_chars
    FROM verdicts GROUP BY lang
    """,
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus filter chain, end to end in ONE
    Spark job: length gate (>=30 words) AND exact-dedup canonical
    survivor AND benchmark decontamination (no shared 5-gram with the
    held-out source), reported as per-lang kept/total/char-mass — the
    'what survived the pipeline' accounting every data team publishes.

    Composition is where the engine shape matters: the three verdicts
    come from (a) a row-local expression, (b) a window min over the
    md5(text) key, (c) the broadcast shingle semi-probe of
    llm_decontaminate — all stitched by keyed joins on doc_id, nothing
    quadratic, the corpus scanned twice (once for verdicts, once inside
    the shingle probe) regardless of filter count."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window as W

    docs = t.documents.select(
        "doc_id", "lang", "source", "n_chars", "text"
    )
    canonical = docs.select(
        "doc_id",
        (
            F.col("doc_id")
            == F.min("doc_id").over(W.partitionBy(F.md5("text")))
        ).alias("is_canonical"),
    )
    sh = (
        docs.select(
            "doc_id", "source", D.shingles(F.col("text"), 5).alias("__sh")
        )
        .select("doc_id", "source", F.explode("__sh").alias("__s"))
        .select("doc_id", "source", F.xxhash64("__s").alias("s"))
    )
    bench = sh.filter(F.col("source") == "src0").select("s").distinct()
    contaminated = (
        sh.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "s")
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    verdicts = (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            (F.size(T.words(F.col("text"))) >= 30).alias("long_enough"),
            (F.col("source") != "src0").alias("is_train"),
        )
        .join(canonical, "doc_id")
        .join(contaminated, "doc_id", "left")
    )
    kept = (
        F.col("is_train")
        & F.col("long_enough")
        & F.col("is_canonical")
        & F.col("is_contaminated").isNull()
    )
    return verdicts.groupBy("lang").agg(
        F.count(F.when(F.col("is_train"), 1)).alias("n_docs"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.coalesce(
            F.sum(F.when(kept, F.col("n_chars"))), F.lit(0)
        ).alias("kept_chars"),
    )


# ------------------------------------------------------ hybrid retrieval RRF

@query(
    "llm_rrf_fusion",
    oracle=f"""
    WITH wl AS (
      SELECT doc_id, {_DUCK_WORDS.format(col='text')} AS ws FROM documents
    ), w AS (
      SELECT doc_id, unnest(ws) AS term FROM wl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM w
      WHERE term IN {tuple(_BM25_TERMS)} GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), dl AS (
      SELECT doc_id, len(ws) AS dl FROM wl
    ), scal AS (
      SELECT count(*) AS n, avg(len(ws)) AS avgdl FROM wl
    ), bm AS (
      SELECT tf.doc_id,
             floor(sum(
               ln(1 + (scal.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1)
               / (tf.tf + {_BM25_K1}
                  * (1 - {_BM25_B} + {_BM25_B} * dl.dl / scal.avgdl))
             ) * 10000 + 0.5) / 10000 AS bm25
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN scal
      GROUP BY tf.doc_id
    ), sparse AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
      FROM bm QUALIFY rnk <= 20
    ), dense AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY cos6 DESC, vec_id) AS rnk
      FROM (
        SELECT e.vec_id,
               floor(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]),
                 CAST(q.embedding AS DOUBLE[])) * 1000000 + 0.5)
               / 1000000 AS cos6
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      ) QUALIFY rnk <= 20
    )
    SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
           floor((COALESCE(1.0 / (60 + s.rnk), 0)
                  + COALESCE(1.0 / (60 + d.rnk), 0)) * 1000000 + 0.5)
             / 1000000 AS rrf,
           COALESCE(s.rnk, 0) AS sparse_rank,
           COALESCE(d.rnk, 0) AS dense_rank
    FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the sparse BM25
    ranking (fixed term query) and the dense cosine ranking (query vector
    = vec_id 0), the standard two-tower merge for RAG / training-data
    retrieval stacks. Both candidate lists are top-20 with grid-rounded
    scores and id tiebreaks so ranks are engine-stable; the fusion is a
    20v20 full-outer join (driver-free, broadcast-sized by construction
    since both lists are bounded top-k), rrf = sum 1/(60+rank) over the
    lists containing the doc. At 100 TB each ranking keeps its own scale
    shape (BM25: term-filtered tf join; cosine: one corpus scan into
    TakeOrdered) — fusion cost never grows past k rows."""
    from pyspark.sql import Window as W

    from ..llm import similarity as S

    t = Tables(spark, sf_dir)
    # sparse arm: the llm_bm25_search scoring verbatim
    wl = t.documents.select("doc_id", T.words(F.col("text")).alias("ws"))
    w = wl.select("doc_id", F.explode("ws").alias("term"))
    tf = (
        w.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = wl.select("doc_id", F.size("ws").alias("dl"))
    scal = wl.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("ws")).alias("avgdl")
    )
    k1, b = _BM25_K1, _BM25_B
    contrib = (
        F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    bm = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg((F.floor(F.sum(contrib) * 10000 + 0.5) / 10000).alias("bm25"))
    )
    sparse = (
        bm.withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("rnk") <= 20)
        .select("doc_id", "rnk")
    )
    # dense arm: cosine vs the vec_id-0 query vector, 1e-6 grid
    e = t.embeddings
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qd = F.transform(F.col("qv"), lambda x: x.cast("double"))
    cos6 = (
        F.floor(S.cosine(xd, qd) * 1e6 + F.lit(0.5)) / 1e6
    )
    dense = (
        e.crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cos6.alias("cos6"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.desc("cos6"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("rnk") <= 20)
        .select("doc_id", "rnk")
    )
    s = sparse.alias("s")
    d = dense.alias("d")
    fused = s.join(d, F.col("s.doc_id") == F.col("d.doc_id"), "full_outer")
    rrf = (
        F.floor(
            (
                F.coalesce(1.0 / (60 + F.col("s.rnk")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("d.rnk")), F.lit(0.0))
            )
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        fused.select(
            F.coalesce(F.col("s.doc_id"), F.col("d.doc_id")).alias(
                "doc_id"
            ),
            rrf.alias("rrf"),
            F.coalesce(F.col("s.rnk"), F.lit(0)).alias("sparse_rank"),
            F.coalesce(F.col("d.rnk"), F.lit(0)).alias("dense_rank"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
    )


# ------------------------------------------------- embedding-space outliers

@query(
    "llm_semantic_outliers",
    oracle="""
    WITH idx AS (
      SELECT vec_id, label,
             unnest(list_transform(embedding,
                                   (x, i) -> {'i': i, 'x': x})) AS u
      FROM embeddings
    ), x AS (
      SELECT vec_id, label, u.i AS dim, CAST(u.x AS DOUBLE) AS x FROM idx
    ), cent AS (
      SELECT label, dim, floor(avg(x) * 1e6 + 0.5) / 1e6 AS c
      FROM x GROUP BY 1, 2
    ), dist AS (
      SELECT x.vec_id, x.label,
             floor(sqrt(sum((x.x - cent.c) * (x.x - cent.c)))
                   * 1e4 + 0.5) / 1e4 AS dist
      FROM x JOIN cent ON x.label = cent.label AND x.dim = cent.dim
      GROUP BY 1, 2
    ), stats AS (
      SELECT label, avg(dist) AS m, stddev_pop(dist) AS s
      FROM dist GROUP BY 1
    )
    SELECT d.vec_id, d.label, d.dist,
           floor((d.dist - st.m) / st.s * 1e3 + 0.5) / 1e3 AS z
    FROM dist d JOIN stats st ON d.label = st.label
    WHERE floor((d.dist - st.m) / st.s * 1e3 + 0.5) / 1e3 >= 1.5
    """,
)
def llm_semantic_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality filtering (the SemDeDup/SSL-prototype quality
    gate): flag vectors whose distance to their label centroid is an
    intra-label z-score outlier (z >= 1.5) — far-from-centroid docs are
    the mislabeled/noise candidates a curation pipeline reviews or drops.

    One posexplode scan feeds both passes: per-(label,dim) centroid means
    (map-side combinable, labels x dims rows — broadcast-sized), then a
    broadcast join back computes each vector's Euclidean distance, and a
    per-label moment pass converts distances to z-scores. Centroids are
    grid-rounded BEFORE the distance (and distances before the moments)
    so float fold order can't leak through powers into the hash; the
    z >= 1.5 gate compares the already-rounded z on both engines, making
    the threshold boundary exact. No pairwise work anywhere — cost is
    O(n*d) scan + tiny keyed joins, the same at 100 TB."""
    t = Tables(spark, sf_dir)
    x = t.embeddings.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform(F.col("embedding"), lambda v: v.cast("double"))
        ).alias("dim", "x"),
    )
    cent = x.groupBy("label", "dim").agg(
        (F.floor(F.avg("x") * 1e6 + F.lit(0.5)) / 1e6).alias("c")
    )
    dist = (
        x.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            (
                F.floor(
                    F.sqrt(
                        F.sum(
                            (F.col("x") - F.col("c"))
                            * (F.col("x") - F.col("c"))
                        )
                    )
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("dist")
        )
    )
    stats = dist.groupBy("label").agg(
        F.avg("dist").alias("m"), F.stddev_pop("dist").alias("s")
    )
    z = F.floor(
        (F.col("dist") - F.col("m")) / F.col("s") * 1e3 + F.lit(0.5)
    ) / 1e3
    return (
        dist.join(F.broadcast(stats), "label")
        .select("vec_id", "label", "dist", z.alias("z"))
        .filter(F.col("z") >= 1.5)
    )


# ---------------------------------------------------- fixed-iteration k-means

_KM_K = 4          # clusters, seeded from vec_id 0..3
_KM_ITERS = 3      # fixed Lloyd iterations (deterministic, oracle-able)


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs. State per iteration is
    the exploded centroid relation c{i}(cluster, dim, c) with grid-rounded
    coordinates; assignment a{i}(vec_id, cluster) breaks distance ties on
    cluster id over 1e-6-rounded distances."""
    parts = [
        f"""x AS (
      SELECT vec_id,
             u.i AS dim, CAST(u.x AS DOUBLE) AS x
      FROM (SELECT vec_id,
                   unnest(list_transform(embedding,
                                         (x, i) -> {{'i': i, 'x': x}})) AS u
            FROM embeddings)
    ),
    c0 AS (
      SELECT vec_id AS cluster, dim,
             floor(x * 1e6 + 0.5) / 1e6 AS c
      FROM x WHERE vec_id < {k}
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""d{i} AS (
      SELECT x.vec_id, c.cluster,
             floor(sum((x.x - c.c) * (x.x - c.c)) * 1e6 + 0.5) / 1e6
               AS dist2
      FROM x JOIN c{i - 1} c ON x.dim = c.dim
      GROUP BY 1, 2
    ),
    a{i} AS (
      SELECT vec_id,
             arg_min(cluster, dist2 * 10 + cluster) AS cluster,
             min(dist2) AS dist2
      FROM d{i} GROUP BY 1
    ),
    c{i} AS (
      SELECT a.cluster, x.dim,
             floor(avg(x.x) * 1e6 + 0.5) / 1e6 AS c
      FROM x JOIN a{i} a ON x.vec_id = a.vec_id
      GROUP BY 1, 2
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT vec_id, cluster, dist2 FROM a{iters}
    """
    )


@query("llm_kmeans_fixed", oracle=_kmeans_oracle(_KM_K, _KM_ITERS))
def llm_kmeans_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (Lloyd) with FIXED iteration count and deterministic
    seeding (initial centroids = the vectors of vec_id 0..k-1) — the
    IVF-training loop exposed as an oracle-checked query, assignments
    value-matched cross-engine after 3 full iterations.

    Determinism is engineered at every float boundary: centroid
    coordinates are grid-rounded (1e-6) after each mean, distances after
    each sum, and the argmin packs (distance, cluster) into one ordering
    key so equidistant vectors break ties on cluster id identically in
    both engines — the same discipline as llm_knn_classify.

    Scale shape: per iteration, the exploded vectors join the k*d
    centroid relation (broadcast — kilobytes) and reduce by
    (vec_id, cluster) then (cluster, dim): two map-side-combinable keyed
    aggregates, no pairwise vector work, no driver state besides the
    plan itself. At 100 TB this is exactly Spark MLlib's dataflow, but
    with the deterministic contract MLlib doesn't make; iterations
    being fixed keeps the lineage bounded (no convergence loop)."""
    t = Tables(spark, sf_dir)
    x = t.embeddings.select(
        "vec_id",
        F.posexplode(
            F.transform(F.col("embedding"), lambda v: v.cast("double"))
        ).alias("dim", "x"),
    ).persist()
    x = tracked(x)
    cent = x.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster"),
        "dim",
        (F.floor(F.col("x") * 1e6 + F.lit(0.5)) / 1e6).alias("c"),
    )
    assign = None
    for _ in range(_KM_ITERS):
        d = (
            x.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cluster")
            .agg(
                (
                    F.floor(
                        F.sum(
                            (F.col("x") - F.col("c"))
                            * (F.col("x") - F.col("c"))
                        )
                        * 1e6
                        + F.lit(0.5)
                    )
                    / 1e6
                ).alias("dist2")
            )
        )
        assign = d.groupBy("vec_id").agg(
            F.min_by(
                F.col("cluster"),
                F.col("dist2") * 10 + F.col("cluster"),
            ).alias("cluster"),
            F.min("dist2").alias("dist2"),
        )
        cent = (
            x.join(assign.select("vec_id", "cluster"), "vec_id")
            .groupBy("cluster", "dim")
            .agg(
                (F.floor(F.avg("x") * 1e6 + F.lit(0.5)) / 1e6).alias("c")
            )
        )
    return assign.select("vec_id", "cluster", "dist2")


@query("llm_pq_topk", oracle=_ANN_BRUTE_ORACLE)
def llm_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: vectors L2-normalize, split into 4
    subspaces with 16-centroid codebooks each (64 doubles -> 4 small
    ints per vector), queries run ADC (asymmetric distance: literal
    lookup tables over the code columns, raw vectors untouched) to build
    a 150-candidate shortlist, then re-rank the shortlist by exact
    cosine. K-means codebooks are not SQL-expressible, so the oracle
    checks the same contract as IVF/LSH: exact top-10 matched
    cross-engine, self-retrieval pinned, recall@10 floor >=4 (observed
    5-7 across sf0.001/0.01/0.1 with near-random synthetic vectors;
    real embedding manifolds quantize far better)."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    # zero-norm vectors get NULL nvec (row-preserving contract) — they
    # cannot be quantized, so exclude them from codebook training here
    normed = tracked(
        S.l2_normalize(emb).filter(F.col("nvec").isNotNull()).persist()
    )
    books = S.train_pq_codebooks(normed, m=4, k=16)
    codes = S.assign_pq_codes(normed, books).select(
        "vec_id", *[f"pq_{j}" for j in range(4)]
    )
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    approx = {
        r.vec_id
        for r in S.pq_rerank_topk(
            emb, codes, books, q, k=11, shortlist=150
        )
        .select("vec_id")
        .collect()
    }
    # k=11 over the FULL corpus: the query vector must retrieve itself
    # through the real ADC shortlist + rerank path (contract flag), and
    # 10 genuine neighbor slots remain for the recall floor.
    return _ann_contract(spark, sf_dir, approx, min_recall=4)


# ---------------------------------------------------------------- BPE

#: fixed merge table for the value-checked APPLY query (rank order
#: matters: 'th'+'e' depends on 't'+'h' having fired first)
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("_", "t"), ("i", "n"),
    ("a", "n"), ("e", "r"), ("o", "n"), ("r", "e"),
]


def _bpe_apply_oracle() -> str:
    ctes = [
        "s0 AS (SELECT doc_id, regexp_extract_all("
        "regexp_replace(lower(substr(text, 1, 80)), '\\s+', '_', 'g'),"
        " '.') AS toks FROM documents)"
    ]
    for i, (l, r) in enumerate(_BPE_MERGES):
        ctes.append(f"""s{i + 1} AS (
      SELECT doc_id,
             CASE WHEN len(toks) = 0 THEN toks ELSE
               list_reduce(list_transform(toks, t -> [t]),
                 (acc, x) -> CASE WHEN len(acc) > 0
                                   AND acc[len(acc)] = '{l}'
                                   AND x[1] = '{r}'
                             THEN list_slice(acc, 1, len(acc) - 1)
                                  || ['{l + r}']
                             ELSE acc || x END) END AS toks
      FROM s{i})""")
    n = len(_BPE_MERGES)
    return f"""
    WITH {','.join(ctes)}
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(toks, 1, 8), '|') AS preview
    FROM s{n}
    """


@query("llm_bpe_apply", oracle=_bpe_apply_oracle())
def llm_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a BPE merge table (the tokenizer-runtime half of BPE): each
    document's char-level state folds through the 8 fixed merge rules in
    rank order — one JVM array fold per rule, left-to-right
    non-overlapping, exactly the sequential tokenizer semantics.
    Embarrassingly parallel (no shuffle at all: scan -> fold -> project);
    at 100 TB this is a map-only job whose model ships as 8 literals.
    The oracle replays the identical fold chain via DuckDB list_reduce,
    so token counts AND the token strings value-match."""
    from ..llm import bpe as B

    t = Tables(spark, sf_dir)
    toks = B.apply_merges_scan(
        B.char_tokens(F.col("text")), [(l, r) for l, r in _BPE_MERGES]
    )
    return D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_join(F.slice(toks, 1, 8), "|").alias("preview"),
    )


@query("llm_bpe_train")
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8 BPE merges on the corpus (rows-only by design: the
    training loop — argmax pair per round — is not SQL-expressible as a
    fixed query; tests/test_bpe.py pins the merge table exactly against
    a pure-python reference at sf0.001). Output: one row per learned
    merge (rank, left, right, pair_count)."""
    from ..llm import bpe as B

    t = Tables(spark, sf_dir)
    learned = B.bpe_train(t.documents, n_merges=8)
    return spark.createDataFrame(
        [(i, l, r, int(c)) for i, (l, r, c) in enumerate(learned)],
        "rank int, left string, right string, pair_count bigint",
    )


@query(
    "llm_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END                         AS kind,
           sha256(text)                                  AS sha256,
           CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) AS b0,
           CAST(('0x' || substr(sha256(text), 3, 2)) AS INT) AS b1,
           CAST(('0x' || substr(sha256(text), 5, 2)) AS INT) AS b2
    FROM documents
    """,
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction through the REAL Arrow-batched
    mapInPandas path (llm/multimodal.py): documents' bytes stand in as
    media payloads; text payloads route to the deterministic
    sha256-seeded stub decoder, which the oracle reproduces exactly
    (byte k of sha256 = feature[k] * 255). Value-checks the full
    pipeline — payload construction, kind assignment, batch iteration,
    digest, and feature layout — not just row counts. Scale: one
    mapInPandas pass, no shuffle; constant memory per task via the
    batch iterator."""
    from ..llm import multimodal as M

    t = Tables(spark, sf_dir)
    feats = M.extract_features(M.media_from_documents(t.documents))
    return feats.select(
        "media_id",
        "kind",
        "sha256",
        F.round(F.element_at("feature", 1) * 255).cast("int").alias("b0"),
        F.round(F.element_at("feature", 2) * 255).cast("int").alias("b1"),
        F.round(F.element_at("feature", 3) * 255).cast("int").alias("b2"),
    )


_SEMDEDUP_SQL = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (SELECT vec_id AS cluster, v AS c FROM e WHERE vec_id < 8),
    d AS (
      SELECT e.vec_id, cent.cluster,
             floor((list_inner_product(e.v, e.v)
                    - 2 * list_inner_product(e.v, cent.c)
                    + list_inner_product(cent.c, cent.c)) * 1e6 + 0.5)
               / 1e6 AS d2
      FROM e CROSS JOIN cent
    ),
    a AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cluster) AS rn
        FROM d
      ) WHERE rn = 1
    ),
    av AS (SELECT a.vec_id, a.cluster, e.v FROM a JOIN e USING (vec_id)),
    pairs AS (
      SELECT y.vec_id AS idb,
             floor(list_inner_product(x.v, y.v)
                   / (sqrt(list_inner_product(x.v, x.v))
                      * sqrt(list_inner_product(y.v, y.v)))
                   * 1e6 + 0.5) / 1e6 AS cos
      FROM av x JOIN av y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE list_inner_product(x.v, x.v) > 0
        AND list_inner_product(y.v, y.v) > 0
    ),
    dups AS (SELECT DISTINCT idb AS vec_id FROM pairs WHERE cos >= 0.25)
    SELECT a.vec_id, a.cluster,
           (dups.vec_id IS NOT NULL) AS is_dup
    FROM a LEFT JOIN dups ON a.vec_id = dups.vec_id
"""


@query("llm_semantic_dedup", oracle=_SEMDEDUP_SQL)
def llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: embeddings cluster to the
    nearest of k=8 FIXED centroids (the vectors of vec_id 0..7 — same
    deterministic-seed discipline as llm_kmeans_fixed), then WITHIN each
    cluster any vector whose cosine to a lower-id clustermate reaches
    the threshold is flagged a duplicate. Never all-pairs: candidate
    generation is bounded by the cluster partition, which at 100 TB is
    the IVF cell layout (llm_ivf_topk) — pairs stay |cluster|^2, not
    |corpus|^2. The quadratic within-cluster cosine stage runs as a
    per-cluster blocked BLAS matmul (similarity.semdedup_flags,
    applyInPandas) — the 10x stress rehearsal measured the interpreted
    HOF pair join at 313s vs 7.5s for this form, identical output.
    Distances and cosines are grid-rounded (1e-6) before comparisons so
    both engines make identical keep/drop decisions."""
    from ..llm.similarity import semdedup_flags

    t = Tables(spark, sf_dir)

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def r6(c):
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    emb = t.embeddings.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("v"),
    )
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("c")
    )
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn(
            "d2",
            r6(dot(F.col("v"), F.col("v"))
               - 2 * dot(F.col("v"), F.col("c"))
               + dot(F.col("c"), F.col("c"))),
        )
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "cluster")).alias("best"),
            F.first("v").alias("v"),
        )
        .select("vec_id", F.col("best.cluster").alias("cluster"), "v")
    )
    return semdedup_flags(assigned, threshold=0.25).select(
        "vec_id", "cluster", "is_dup"
    )


# --------------------------------------------- r06: curation additions
# Quality-aware survivor selection, CCNet-style perplexity bucketing, and
# token-entropy gibberish scoring — the three corpus-curation steps the
# registry still lacked (everything else in the CCNet/Gopher/C4 recipe
# already has an entry above).


@query(
    "llm_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_COMPONENT_CLOSURE_CTES}, {_duck_quality_ctes()}, q AS (
      SELECT doc_id,
             round((len_score + punct_score + stop_score) / 3, 4) AS quality
      FROM qparts
    ), ranked AS (
      SELECT comp.id AS id, row_number() OVER (
               PARTITION BY comp.component
               ORDER BY q.quality DESC, comp.id ASC) AS rn
      FROM comp JOIN q ON q.doc_id = comp.id
    )
    SELECT doc_id, lang FROM documents
    WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rn > 1)
    """,
)
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster dedup: the near-dup components of
    llm_dedup_clusters, but each cluster keeps its highest-quality member
    (llm_quality_score heuristic; ties -> min doc_id) instead of the min
    id — the survivor rule real corpus pipelines use (keep the cleanest
    copy of a boilerplate cluster, not an arbitrary one).

    Oracle: the recursive-CTE component closure of llm_dedup_clusters plus
    a per-component ``row_number() OVER (ORDER BY quality DESC, id)``
    argmax — so the survivor CHOICE (not just the count) is value-checked
    cross-engine. The quality tie-break is exact: both engines rank the
    4-decimal-rounded score."""
    t = Tables(spark, sf_dir)
    # NOT spread at the query level: an r12-opt A/B measured the
    # whole-frame repartition net-NEGATIVE here (~+0.7s) — every docs
    # consumer (candidate path, member-score join, final anti-join)
    # re-evaluates the extra exchange, outweighing the parallel-regex
    # win. The shingle/digest path is already spread inside
    # shingle_frame, which is where the per-doc CPU actually burns.
    # The quality score is passed as an EXPRESSION so keep_best computes
    # the regex heuristic only for clustered members (after the component
    # join restricts the frame), not for every corpus row.
    return D.dedup_components_keep_best(
        t.documents,
        T.quality_score(F.col("text")),
        threshold=0.8,
        bands=_P_BANDS,
        n=2,
    ).select("doc_id", "lang")


@query(
    "llm_perplexity_bucket",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), bg AS (
      SELECT doc_id, u.w1 AS w1, u.w2 AS w2
      FROM ws, unnest(list_transform(w[1:len(w)-1],
                      (x, i) -> {{'w1': x, 'w2': w[i+1]}})) AS t(u)
    ), c2 AS (
      SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, count(*) AS n1 FROM bg GROUP BY 1
    ), v AS (
      SELECT count(DISTINCT t.tok) AS vocab
      FROM ws, unnest(w) AS t(tok)
    ), lm AS (
      SELECT bg.doc_id,
             floor(avg(ln((c2.n2 + 1.0) / (c1.n1 + v.vocab))) * 1e4 + 0.5) / 1e4
               AS lm
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY 1
    ), cut AS (
      SELECT quantile_cont(lm, CAST(2 AS DOUBLE) / 3) AS c_head,
             quantile_cont(lm, CAST(1 AS DOUBLE) / 3) AS c_mid
      FROM lm
    )
    SELECT doc_id,
           round(exp(-lm), 4) AS perplexity,
           CASE WHEN lm >= c_head THEN 'head'
                WHEN lm >= c_mid THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM lm CROSS JOIN cut
    """,
)
def llm_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: per-doc perplexity from the
    corpus-trained add-one bigram LM (exp of the negated
    llm_bigram_lm_score), split head/middle/tail at the exact lm-score
    tertiles. Head = lowest perplexity = the slice CCNet keeps.

    Scale shape: the cutoffs are ONE exact-percentile aggregate broadcast
    back over the scores — no global sort, no single-partition ntile
    window (the classic trap for corpus-wide ranking). At 100 TB the same
    two-phase shape holds; CCNet itself uses fixed cutoffs from a sample,
    which this degrades to by swapping the agg input for a sampled frame.

    Cross-engine determinism: both engines interpolate the same R-7
    quantile on identical 4-decimal-rounded doubles; interpolated cutoffs
    either equal a data value exactly (frac 0 / equal neighbors) or fall
    strictly between two distinct score values, so the >= bucket
    comparisons cannot diverge."""
    t = Tables(spark, sf_dir)
    # persisted: the tertile-cutoff aggregate AND the final bucket
    # projection both consume the LM frame — unpersisted, the whole
    # bigram-LM pipeline (tokenize, bigram aggregates, scoring joins)
    # evaluates twice per run
    lm = tracked(
        _bigram_lm_frame(t)
        .select("doc_id", F.col("lm_score").alias("lm"))
        .persist()
    )
    cut = lm.agg(
        F.percentile("lm", F.lit(2 / 3)).alias("c_head"),
        F.percentile("lm", F.lit(1 / 3)).alias("c_mid"),
    )
    return lm.crossJoin(F.broadcast(cut)).select(
        "doc_id",
        F.round(F.exp(-F.col("lm")), 4).alias("perplexity"),
        F.when(F.col("lm") >= F.col("c_head"), F.lit("head"))
        .when(F.col("lm") >= F.col("c_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


@query(
    "llm_token_entropy",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), cs AS (
      SELECT doc_id, len(w) AS n,
             list_sort(list_transform(list_distinct(w),
                       x -> len(list_filter(w, t -> t = x)))) AS c
      FROM ws
    ), h AS (
      SELECT doc_id, n, len(c) AS k,
             CASE WHEN n > 0 THEN
               ln(n) - list_reduce(list_transform(c, x -> x * ln(x)),
                                   (a, b) -> a + b) / n
             ELSE 0.0 END AS ent
      FROM cs
    )
    SELECT doc_id,
           round(ent, 4) + 0.0 AS token_entropy,
           round(CASE WHEN k > 1 THEN ent / ln(k) ELSE 0.0 END, 4) + 0.0
             AS norm_entropy
    FROM h
    """,
)
def llm_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document (and its ln(k)-
    normalized [0,1] form) — the gibberish/repetitiveness filter:
    keyboard-mash and boilerplate score low, natural prose high.

    Shuffle-free: counts come from array ops on the in-row token array
    (O(distinct x n_tokens) per doc — right for web-doc sizes; for
    book-length docs swap in the explode + two-groupBy form and keep the
    sorted fold below). Cross-engine float discipline: the entropy sum
    folds over the SORTED count list with a left fold in both engines
    (F.aggregate / list_reduce), so the double additions happen in an
    identical order — unordered SUM() would let last-ulp reassociation
    flip a 4-decimal rounding. The trailing ``+ 0.0`` normalizes IEEE
    -0.0 (an all-identical-token doc computes ln(n) - n*ln(n)/n, which
    can land at minus zero) to +0.0 in both engines' byte-level hash."""
    t = Tables(spark, sf_dir)
    d = D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select("doc_id", T.words(F.col("text")).alias("ws"))
    counts = F.array_sort(
        F.transform(
            F.array_distinct("ws"),
            lambda x: F.size(F.filter(F.col("ws"), lambda w: w == x)),
        )
    )
    d2 = d.select("doc_id", F.size("ws").alias("n"), counts.alias("cs"))
    s = F.aggregate(
        "cs",
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
    )
    h = F.when(
        F.col("n") > 0, F.log(F.col("n").cast("double")) - s / F.col("n")
    ).otherwise(F.lit(0.0))
    return d2.select(
        "doc_id",
        (F.round(h, 4) + F.lit(0.0)).alias("token_entropy"),
        (
            F.round(
                F.when(
                    F.size("cs") > 1,
                    h / F.log(F.size("cs").cast("double")),
                ).otherwise(F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("norm_entropy"),
    )


@query(
    "llm_incremental_dedup",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack}
    ), cut AS (
      SELECT (4 * max(doc_id)) // 5 AS c FROM documents
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
      WHERE b.doc_id >= (SELECT c FROM cut)
    ), scored AS (
      SELECT p.id_a, p.id_b,
             CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
                  THEN len(list_intersect(sa.s, sb.s)) * 1.0
                       / len(list_distinct(list_concat(sa.s, sb.s)))
                  ELSE 0.0 END AS j
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.id_a
      JOIN sh sb ON sb.doc_id = p.id_b
    )
    SELECT doc_id, lang FROM documents
    WHERE doc_id >= (SELECT c FROM cut)
      AND doc_id NOT IN (SELECT id_b FROM scored WHERE j >= 0.8)
    """,
)
def llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (snapshot-ingestion) near-dedup: the top-fifth id range
    plays the NEW batch; survivors are batch docs with no >=0.8-Jaccard
    match against the existing corpus or an earlier batch member. The
    point vs llm_near_dedup: candidate generation NEVER forms an
    old x old pair, so per-snapshot cost follows the batch size — the
    ingestion pattern a continuously-growing corpus needs at 100 TB.

    The 1-row max-id aggregate fixing the cutoff is a bounded driver
    collect (the batch boundary is an input in production, not
    computed)."""
    t = Tables(spark, sf_dir)
    mx = t.documents.agg(F.max("doc_id")).first()[0]
    cutoff = (4 * mx) // 5
    return D.incremental_near_dedup(
        t.documents, cutoff, threshold=0.8, bands=_P_BANDS, n=2
    ).select("doc_id", "lang")


# -------------------------------------------------- mixture & vocab planning

@query(
    "llm_mixture_weights",
    oracle=f"""
    WITH counts AS (
      SELECT source,
             CAST(sum({_DUCK_TOKEN_COUNT.format(col="text")})
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS DOUBLE) AS big_n,
             sum(sqrt(CAST(n_tokens AS DOUBLE))) AS denom
      FROM counts
    )
    SELECT source, n_tokens,
           floor(n_tokens / big_n * 1000000 + 0.5) / 1000000 AS p,
           floor(sqrt(CAST(n_tokens AS DOUBLE)) / denom * 1000000 + 0.5)
             / 1000000 AS weight,
           floor(sqrt(CAST(n_tokens AS DOUBLE)) / denom * big_n / n_tokens
                 * 1000000 + 0.5) / 1000000 AS epochs
    FROM counts CROSS JOIN tot
    """,
)
def llm_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture weight planning: per-source token counts are
    temperature-smoothed (alpha = 0.5, the multilingual-sampling
    exponent of XLM-R / mT5) into sampling weights, and each source's
    expected epoch count under a one-corpus-size token budget falls out
    as ``weight * N / n`` — >1 means the source is upsampled (seen more
    than once per budget), <1 downsampled. This is the planning step
    that turns a raw corpus census into a data-loading schedule.

    Determinism across engines: the smoothed numerator is
    ``sqrt(bigint)`` — IEEE-exact in both engines — and every emitted
    ratio is HALF_UP-floored at 6 decimals, far above the last-bit noise
    of the tiny (n_sources-term) denominator sum. Scale: one map-side
    combinable token-count agg over documents (a long per source); the
    totals frame is 1 row, broadcast."""
    t = Tables(spark, sf_dir)
    counts = t.documents.groupBy("source").agg(
        F.sum(T.token_count(F.col("text"))).alias("n_tokens")
    )
    tot = counts.agg(
        F.sum("n_tokens").cast("double").alias("big_n"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("denom"),
    )
    smoothed = F.sqrt(F.col("n_tokens").cast("double")) / F.col("denom")
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    return counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        r6(F.col("n_tokens") / F.col("big_n")).alias("p"),
        r6(smoothed).alias("weight"),
        r6(smoothed * F.col("big_n") / F.col("n_tokens")).alias("epochs"),
    )


@query(
    "llm_vocab_coverage",
    oracle=f"""
    WITH occ AS (
      SELECT lang, unnest({_DUCK_WORDS.format(col="text")}) AS token
      FROM documents
    ), counts AS (
      SELECT token, count(*) AS n FROM occ GROUP BY 1
    ), vocab AS (
      SELECT token FROM counts ORDER BY n DESC, token LIMIT 256
    )
    SELECT o.lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.token IS NOT NULL) AS BIGINT)
             AS n_in_vocab,
           floor(CAST(count(*) FILTER (WHERE v.token IS NOT NULL)
                      AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
             AS coverage,
           CAST(count(DISTINCT CASE WHEN v.token IS NULL THEN o.token END)
                AS BIGINT) AS oov_types
    FROM occ o LEFT JOIN vocab v ON o.token = v.token
    GROUP BY 1
    """,
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary planning: freeze the top-256 corpus tokens
    (by global frequency, ties broken lexically) as the vocab, then audit
    per-language coverage — occurrence-weighted in-vocab rate and the
    count of distinct out-of-vocab types. The low-coverage languages are
    the ones a shared vocab would shortchange; this is the audit run
    before sizing a real tokenizer.

    Scale: token occurrences groupBy token (one keyed shuffle with
    map-side partial counts); the top-256 cut is ``ORDER BY .. LIMIT``
    — Spark plans TakeOrderedAndProject (per-partition heaps + a 256-row
    driver merge), never a global sort — and the 256-row vocab broadcasts
    to the per-language audit join. The OOV-type distinct is the second
    keyed shuffle; nothing wider than (lang, token) ever moves."""
    t = Tables(spark, sf_dir)
    occ = D._spread_narrow_scan(
        t.documents.select("doc_id", "lang", "text"), "doc_id"
    ).select("lang", F.explode(T.words(F.col("text"))).alias("token"))
    counts = occ.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        counts.orderBy(F.col("n").desc(), "token")
        .limit(256)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    flagged = occ.join(F.broadcast(vocab), "token", "left")
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("__in_vocab").isNotNull(), 1)).alias(
            "n_in_vocab"
        ),
        (
            F.floor(
                F.count(F.when(F.col("__in_vocab").isNotNull(), 1)).cast(
                    "double"
                )
                / F.count(F.lit(1))
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("coverage"),
        F.countDistinct(
            F.when(F.col("__in_vocab").isNull(), F.col("token"))
        ).alias("oov_types"),
    )


# ------------------------------------------------- corpus-law / lexical audit

_ZIPF_TOP = 100  # terms per language entering the log-log fit


@query(
    "llm_zipf_slope",
    oracle=f"""
    WITH counts AS (
      SELECT lang, token, count(*) AS n
      FROM (
        SELECT lang, unnest({_DUCK_WORDS.format(col="text")}) AS token
        FROM documents
      ) GROUP BY ALL
    ), ranked AS (
      SELECT lang, n,
             row_number() OVER (
               PARTITION BY lang ORDER BY n DESC, token
             ) AS rnk
      FROM counts
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_terms,
           floor(regr_slope(ln(n), ln(rnk)) * 1e6 + 0.5) / 1e6 AS zipf_slope,
           floor(regr_r2(ln(n), ln(rnk)) * 1e6 + 0.5) / 1e6 AS zipf_r2
    FROM ranked WHERE rnk <= {_ZIPF_TOP}
    GROUP BY lang
    """,
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-law audit: fit Zipf's law per language — the least-squares
    slope (and R^2) of ln(frequency) against ln(rank) over each
    language's top-100 terms. A healthy natural-language crawl sits near
    slope -1; word-soup, boilerplate or template floods bend the curve,
    so this is the cheap per-shard sanity gauge a curation pipeline runs
    before mixing a new source in.

    Scale: one (lang, token) groupBy with map-side partial counts — the
    only corpus-sized shuffle; ranking runs per-language over the
    vocab-sized count table (bounded by distinct types, not tokens), and
    the regression itself is regr_slope/regr_r2 — six map-side-combinable
    sums over <=100 rows per language, never a collected series. Rank
    ties break lexically so the top-100 cut is engine-deterministic."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    counts = (
        t.documents.select(
            "lang", F.explode(T.words(F.col("text"))).alias("token")
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = counts.select(
        "lang",
        "n",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(F.col("n").desc(), "token")
        )
        .alias("rnk"),
    ).filter(F.col("rnk") <= _ZIPF_TOP)
    lnn, lnr = F.log(F.col("n")), F.log(F.col("rnk"))
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.floor(F.regr_slope(lnn, lnr) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "zipf_slope"
        ),
        (F.floor(F.regr_r2(lnn, lnr) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "zipf_r2"
        ),
    )


@query(
    "llm_lexical_diversity",
    oracle=f"""
    WITH per AS (
      SELECT doc_id, token, count(*) AS cnt
      FROM (
        SELECT doc_id, unnest({_DUCK_WORDS.format(col="text")}) AS token
        FROM documents
      ) GROUP BY ALL
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(count(*) FILTER (cnt = 1) AS BIGINT) AS n_hapax,
           floor(count(*) * 1e6 / sum(cnt) + 0.5) / 1e6 AS ttr,
           floor(count(*) FILTER (cnt = 1) * 1e6 / count(*) + 0.5) / 1e6
             AS hapax_frac
    FROM per GROUP BY doc_id
    """,
)
def llm_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical-diversity profile: type-token ratio and the
    hapax-legomenon fraction (types occurring once in the doc / types).
    Low TTR with low hapax share flags looped boilerplate; abnormally
    high TTR on long docs flags gibberish/ID dumps — both standard
    pre-training quality signals alongside gopher/repetition filters.

    Scale: the aggregation key is (doc_id, token) — document-local, so
    the corpus-sized shuffle combines map-side and nothing ever crosses a
    document boundary (embarrassingly parallel at 100 TB); the second
    groupBy runs over the already-collapsed per-doc type table. Ratios
    are HALF_UP-rounded to 6dp on exact integer counts, so both engines
    round identical rationals."""
    t = Tables(spark, sf_dir)
    per = (
        D._spread_narrow_scan(
            t.documents.select("doc_id", "text"), "doc_id"
        )
        .select("doc_id", F.explode(T.words(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_types = F.count(F.lit(1))
    n_hapax = F.count(F.when(F.col("cnt") == 1, 1))
    return per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        n_types.alias("n_types"),
        n_hapax.alias("n_hapax"),
        (F.floor(n_types * 1e6 / F.sum("cnt") + F.lit(0.5)) / 1e6).alias(
            "ttr"
        ),
        (F.floor(n_hapax * 1e6 / n_types + F.lit(0.5)) / 1e6).alias(
            "hapax_frac"
        ),
    )


@query(
    "llm_source_vocab_overlap",
    oracle=f"""
    WITH sv AS (
      SELECT DISTINCT source, token
      FROM (
        SELECT source, unnest({_DUCK_WORDS.format(col="text")}) AS token
        FROM documents
      )
    ), sizes AS (
      SELECT source, count(*) AS vsize FROM sv GROUP BY source
    ), shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS shared_types
      FROM sv a JOIN sv b ON a.token = b.token AND a.source < b.source
      GROUP BY ALL
    )
    SELECT source_a, source_b, CAST(shared_types AS BIGINT) AS shared_types,
           floor(shared_types * 1e6
                 / (sa.vsize + sb.vsize - shared_types) + 0.5) / 1e6
             AS vocab_jaccard
    FROM shared
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)
def llm_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard: how much of each pair of
    sources' distinct-token vocabularies overlap. Near-1 overlap between
    two crawl sources means they are the same corpus under two names
    (mirror detection before mixture weighting); near-0 flags a source
    whose tokens a shared tokenizer won't cover.

    Scale: the corpus collapses to DISTINCT (source, token) first — the
    self-join runs on the vocab-sized frame, keyed on token, so the
    fan-out per token is bounded by (#sources carrying it)^2, never by
    occurrences; total work is O(vocab x S^2) with S = #sources (tens
    here). For thousands of sources the same contract would switch to
    per-source KMV/HLL sketches (agg_kmv_setops is that operator); this
    query is the exact form. The two 20-row size tables broadcast.

    The distinct (source, token) frame persists: three consumers (both
    self-join sides and the size table) would otherwise each re-scan and
    re-explode the full corpus — measured 4 scans unpersisted."""
    t = Tables(spark, sf_dir)
    sv = tracked(
        t.documents.select(
            "source", F.explode(T.words(F.col("text"))).alias("token")
        )
        .distinct()
        .persist()
    )
    sizes = sv.groupBy("source").agg(F.count(F.lit(1)).alias("vsize"))
    a = sv.alias("a")
    b = sv.select(
        F.col("source").alias("source_b"), F.col("token").alias("token_b")
    )
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("token_b"))
            & (F.col("a.source") < F.col("source_b")),
        )
        .groupBy(F.col("a.source").alias("source_a"), "source_b")
        .agg(F.count(F.lit(1)).alias("shared_types"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("vsize").alias("va")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("vsize").alias("vb")
    )
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_types",
            (
                F.floor(
                    F.col("shared_types")
                    * 1e6
                    / (F.col("va") + F.col("vb") - F.col("shared_types"))
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("vocab_jaccard"),
        )
    )


_WINNOW_K = 3  # k-gram length (words)
_WINNOW_W = 4  # winnowing window (k-grams per window)


@query(
    "llm_winnowing_fingerprint",
    oracle=f"""
    WITH hs AS (
      SELECT doc_id,
             list_transform(
               CASE WHEN len(ws) >= {_WINNOW_K} THEN
                 [array_to_string(ws[i:i+{_WINNOW_K - 1}], ' ')
                  FOR i IN range(1, len(ws) - {_WINNOW_K - 2})]
               ELSE []::VARCHAR[] END,
               g -> CAST(('0x' || substr(md5(g), 1, 12)) AS BIGINT)
             ) AS h
      FROM (
        SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS ws
        FROM documents
      )
    )
    SELECT doc_id,
           CAST(len(h) AS BIGINT) AS n_kgrams,
           CAST(len(list_distinct(
             [list_min(h[i:i+{_WINNOW_W - 1}])
              FOR i IN range(1, len(h) - {_WINNOW_W - 2})]
           )) AS BIGINT) AS n_fingerprints,
           floor(len(list_distinct(
             [list_min(h[i:i+{_WINNOW_W - 1}])
              FOR i IN range(1, len(h) - {_WINNOW_W - 2})]
           )) * 1e6 / (len(h) - {_WINNOW_W - 1}) + 0.5) / 1e6 AS fp_density
    FROM hs WHERE len(h) >= {_WINNOW_W}
    """,
)
def llm_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
    algorithm): hash every word-3-gram, slide a 4-gram window over the
    hash sequence, keep each window's minimum — the distinct selected
    hashes are the document's fingerprints, guaranteed to catch any
    shared run of >= k+w-1 words between documents. The per-doc density
    (fingerprints / windows) is the dedup-planning statistic: it bounds
    the posting-list volume a fingerprint index will carry at corpus
    scale.

    Scale: positions never leave their document — posexplode, two leads
    and a min-over-frame all run inside one per-doc window sort (one
    shuffle keyed on doc_id, bounded by the longest document, NOT corpus
    size), and the distinct-count collapses per doc. Unlike MinHash this
    is position-sensitive, so it complements llm_minhash_* (bag
    similarity) and llm_span_dedup (exact spans). Hashes are 48-bit
    md5 slices — exact in int64 on both engines."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    # spread keyed on doc_id: the per-doc window below clusters on the
    # same key, so the (conditional) repartition is the plan's ONE
    # per-doc exchange — the window reuses it instead of adding its own
    pos = D._spread_narrow_scan(
        t.documents.select("doc_id", "text"), "doc_id"
    ).select("doc_id", F.posexplode(T.words(F.col("text"))).alias("pos", "w"))
    bypos = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        pos.select(
            "doc_id",
            "pos",
            F.concat_ws(
                " ",
                "w",
                F.lead("w", 1).over(bypos),
                F.lead("w", 2).over(bypos),
            ).alias("g"),
            (F.lead("w", _WINNOW_K - 1).over(bypos)).alias("__full"),
        )
        .filter(F.col("__full").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("g"), 1, 12), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    fp = grams.select(
        "doc_id",
        F.min("h")
        .over(bypos.rowsBetween(0, _WINNOW_W - 1))
        .alias("fp"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n_kg"),
        F.row_number().over(bypos).alias("rn"),
    ).filter(
        (F.col("n_kg") >= _WINNOW_W) & (F.col("rn") <= F.col("n_kg") - _WINNOW_W + 1)
    )
    return fp.groupBy("doc_id").agg(
        F.first("n_kg").alias("n_kgrams"),
        F.countDistinct("fp").alias("n_fingerprints"),
        (
            F.floor(
                F.countDistinct("fp")
                * 1e6
                / (F.first("n_kg") - _WINNOW_W + 1)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("fp_density"),
    )


# -------------------------------------------------- split / shard planning

_SPLIT_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100"
)


@query(
    "llm_split_novelty",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, text,
             CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train' ELSE 'test' END
               AS split
      FROM documents
    ), grams AS (
      SELECT doc_id, split, unnest(
        {{sh}}
      ) AS g
      FROM (SELECT doc_id, split, {{ws}} AS ws FROM tagged)
    ), train_g AS (
      SELECT DISTINCT g FROM grams WHERE split = 'train'
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (tr.g IS NULL) AS BIGINT) AS n_novel,
           floor(count(*) FILTER (tr.g IS NULL) * 1e6 / count(*) + 0.5) / 1e6
             AS novelty_frac
    FROM grams t LEFT JOIN train_g tr ON t.g = tr.g
    WHERE t.split = 'test'
    GROUP BY t.doc_id
    """.format(
        sh=_duck_shingles("ws", 3),
        ws=_DUCK_WORDS.format(col="text"),
    ),
)
def llm_split_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out novelty audit: for every TEST-split document (the same
    deterministic md5-bucket 80/20 split as llm_train_test_split), the
    fraction of its distinct word-3-grams never seen anywhere in the
    TRAIN split. Low novelty means the held-out set leaks training
    phrasing (memorization masquerading as generalization in eval
    numbers); this is the audit run after cutting a split and before
    trusting a loss curve.

    Scale contract — the inverse of llm_decontaminate's: there the
    benchmark side is small and BROADCASTS; here BOTH sides are
    corpus-scale (train grams are 80% of the corpus), so the plan must
    shuffle-join on the 8-byte xxhash64 gram key — test grams left-join
    the distinct train-gram set with fan-out exactly 1, and gram STRINGS
    never shuffle (hash-compressed at the explode, collision odds
    ~2^-64; the oracle joins raw strings — identical absent collisions).
    Everything downstream re-collapses per doc_id."""
    t = Tables(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100
    )
    grams = t.documents.select(
        "doc_id",
        (bucket < 80).alias("is_train"),
        F.explode(D.shingles(F.col("text"), 3)).alias("__g"),
    ).select("doc_id", "is_train", F.xxhash64("__g").alias("g"))
    train_g = (
        grams.filter(F.col("is_train")).select("g").distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        grams.filter(~F.col("is_train"))
        .join(train_g, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("__hit").isNull(), 1)).alias("n_novel"),
            (
                F.floor(
                    F.count(F.when(F.col("__hit").isNull(), 1))
                    * 1e6
                    / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("novelty_frac"),
        )
    )


_N_SHARDS = 32


@query(
    "llm_shard_plan",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 7, 6))
               AS BIGINT) % {_N_SHARDS} AS shard,
             len({_DUCK_WORDS.format(col="text")}) AS n_tok
      FROM documents
    ), per AS (
      SELECT shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(max(n_tok) AS BIGINT) AS max_doc_tokens
      FROM toks GROUP BY shard
    )
    SELECT shard, n_docs, n_tokens, max_doc_tokens,
           floor(n_tokens * {_N_SHARDS}.0 * 1e6
                 / (SELECT sum(n_tokens) FROM per) + 0.5) / 1e6
             AS load_ratio
    FROM per
    """,
)
def llm_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export planner: assign every document to one of 32
    output shards by a content-independent doc_id hash (md5 slice — NOT
    xxhash64, whose seed differs across engines) and audit the resulting
    token load per shard: doc count, token total, largest document, and
    load_ratio = shard tokens / ideal even share. A ratio far from 1.0
    means the shard writer needs a different key (or salting) before the
    100 TB export job runs — this is the check that catches it at plan
    time instead of at the straggler.

    Scale: one scan, token counts computed per row (regexp_count — no
    explode, no array), one 32-key groupBy with map-side partials; the
    1-row grand total broadcasts back into the 32-row frame (the
    allowlisted scalar cross-join pattern)."""
    t = Tables(spark, sf_dir)
    per = (
        t.documents.select(
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 7, 6),
                    16,
                    10,
                ).cast("long")
                % _N_SHARDS
            ).alias("shard"),
            T.token_count(F.col("text")).alias("n_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.max("n_tok").alias("max_doc_tokens"),
        )
    )
    tot = per.agg(F.sum("n_tokens").alias("__tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_tokens",
        "max_doc_tokens",
        (
            F.floor(
                F.col("n_tokens") * float(_N_SHARDS) * 1e6 / F.col("__tot")
                + F.lit(0.5)
            )
            / 1e6
        ).alias("load_ratio"),
    )


@query(
    "llm_lang_confusion",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, text, {_DUCK_WORDS.format(col="text")} AS ws
      FROM documents
    ), hits AS (
      SELECT doc_id, lang,
             regexp_matches(text, '[一-鿿]') AS has_cjk,
             {_LANG_HITS["de"]} AS h_de,
             {_LANG_HITS["en"]} AS h_en,
             {_LANG_HITS["es"]} AS h_es,
             {_LANG_HITS["fr"]} AS h_fr
      FROM w
    ), pred AS (
      SELECT lang,
             CASE WHEN has_cjk THEN 'zh'
                  WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                  WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                  WHEN h_es >= h_fr THEN 'es'
                  ELSE 'fr' END AS lang_pred
      FROM hits
    ), cm AS (
      SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY ALL
    )
    SELECT lang, lang_pred, n_docs,
           floor(n_docs * 1e6 / sum(n_docs) OVER (PARTITION BY lang) + 0.5)
             / 1e6 AS share
    FROM cm
    """,
)
def llm_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID audit: the confusion matrix between the DECLARED lang
    column and the marker-heuristic prediction (same construction as
    llm_lang_id), with each cell's share of its declared-language row.
    Off-diagonal mass localizes where the classifier (or the upstream
    metadata) is lying — the check run before trusting either side for
    per-language mixture weighting.

    Scale: the per-doc prediction is one codegen'd pass (no explode
    survives the projection), the matrix collapses to |langs| x |preds|
    rows in one map-side-combinable groupBy, and the row-share window
    runs on that ~25-row frame — nothing corpus-sized ever re-shuffles."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    cm = (
        D._spread_narrow_scan(
            t.documents.select("doc_id", "lang", "text"), "doc_id"
        )
        .select("lang", T.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return cm.select(
        "lang",
        "lang_pred",
        "n_docs",
        (
            F.floor(
                F.col("n_docs")
                * 1e6
                / F.sum("n_docs").over(Window.partitionBy("lang"))
                + F.lit(0.5)
            )
            / 1e6
        ).alias("share"),
    )


@query(
    "llm_cross_source_dups",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    ), scored AS (
      SELECT p.id_a, p.id_b,
             CAST(floor(
               CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
                    THEN len(list_intersect(sa.s, sb.s)) * 1.0
                         / len(list_distinct(list_concat(sa.s, sb.s)))
                    ELSE 0.0 END * 10000 + 0.5) AS BIGINT) AS j_bp
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.id_a
      JOIN sh sb ON sb.doc_id = p.id_b
    ), dup AS (
      SELECT s.id_a, s.id_b, s.j_bp FROM scored s WHERE s.j_bp >= 8000
    )
    SELECT least(da.source, db.source) AS source_lo,
           greatest(da.source, db.source) AS source_hi,
           CAST(count(*) AS BIGINT) AS n_dup_pairs,
           floor(sum(j_bp) * 1.0 / count(*) + 0.5) / 10000 AS avg_jaccard
    FROM dup
    JOIN documents da ON da.doc_id = dup.id_a
    JOIN documents db ON db.doc_id = dup.id_b
    GROUP BY ALL
    """,
)
def llm_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source duplicate attribution: verified near-dup pairs (the
    same LSH band -> exact-Jaccard >= 0.8 chain as llm_near_dedup)
    grouped by the UNORDERED source pair of their members. A heavy
    off-diagonal cell means two "different" sources are substantially
    the same corpus — the mirror/re-crawl detector run before mixture
    weighting double-counts them; the diagonal is each source's internal
    boilerplate load.

    The per-group mean jaccard aggregates EXACT integer basis points
    (floor(j*1e4+0.5) per pair, summed as int64, one final integer
    division) so no float-accumulation order can flip the rounded
    output. Scale shape: candidate generation is the bucket-capped LSH
    self-join (never corpus-quadratic), the verify join ships
    xxhash64-compressed shingle arrays, and the attribution joins key on
    doc_id against the pruned (doc_id, source) projection; output is
    |sources|^2 rows at most."""
    t = Tables(spark, sf_dir)
    cand = D.minhash_candidate_pairs(t.documents, bands=_P_BANDS, n=2)
    # verified >= 0.8 edge set through the shared size-ratio-bounded
    # stage (identical pair set: jaccard is 4-decimal HALF_UP-rounded in
    # both forms, so the bp floor compare and the >= 0.8 filter agree)
    dup = D._bounded_jaccard_edges(
        t.documents, cand, 0.8, "text", "doc_id", 2
    ).select(
        "id_a",
        "id_b",
        F.floor(F.col("jaccard") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("j_bp"),
    )
    src = t.documents.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")
    )
    sb = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")
    )
    return (
        dup.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            (
                F.floor(
                    F.sum("j_bp") * 1.0 / F.count(F.lit(1)) + F.lit(0.5)
                )
                / 10000
            ).alias("avg_jaccard"),
        )
    )


# ------------------------------------------- r07: dedup/ANN evaluation ops
# The round-7 additions audit the pipeline itself: packing inputs,
# dedup-stage quality (precision/recall, threshold sweeps, cluster
# shapes), outlier gates, and the LSH layout's balance/probe cost —
# the measurements a curation run reads before committing 100 TB of
# compute to a configuration.


@query(
    "llm_seq_len_histogram",
    oracle=f"""
    WITH ws AS (
      SELECT len({_DUCK_WORDS.format(col="text")}) AS n FROM documents
    ), docs AS (
      SELECT CASE WHEN n <= 0 THEN -1
                  ELSE CAST(floor(log2(n)) AS BIGINT) END AS k, n
      FROM ws
    ), b AS (
      SELECT k, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
      FROM docs GROUP BY k
    )
    SELECT CASE WHEN k < 0 THEN 0
                ELSE CAST(power(2, k) AS BIGINT) END AS bucket_lo,
           n_docs, n_tokens,
           CAST(floor(n_tokens * 10000.0 / (sum(n_tokens) OVER ()) + 0.5)
                AS BIGINT) AS token_share_bp,
           CAST(floor((sum(n_tokens) OVER (ORDER BY k)) * 10000.0
                      / (sum(n_tokens) OVER ()) + 0.5)
                AS BIGINT) AS cum_share_bp
    FROM b
    """,
)
def llm_seq_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram on power-of-two buckets — the input a
    packing planner (context length, padding waste) reads. One scan to
    per-doc token counts, one tiny groupBy; the share windows run over
    the reduced <=64-row bucket frame (agg_abc_pareto precedent), never
    the corpus."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    n = F.size(T.words(F.col("text")))
    docs = t.documents.select(
        F.when(n <= 0, F.lit(-1))
        .otherwise(F.floor(F.log2(n)))
        .cast("bigint")
        .alias("k"),
        n.alias("n"),
    )
    b = docs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens"),
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_cum = W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    return b.select(
        F.when(F.col("k") < 0, F.lit(0))
        .otherwise(F.pow(2, F.col("k")))
        .cast("bigint")
        .alias("bucket_lo"),
        "n_docs",
        "n_tokens",
        F.floor(
            F.col("n_tokens") * 10000.0 / F.sum("n_tokens").over(w_all)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("token_share_bp"),
        F.floor(
            F.sum("n_tokens").over(w_cum)
            * 10000.0
            / F.sum("n_tokens").over(w_all)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("cum_share_bp"),
    )


@query(
    "llm_doc_len_mad_outliers",
    oracle=f"""
    WITH ws AS (
      SELECT len({_DUCK_WORDS.format(col="text")}) AS n FROM documents
    ), med AS (
      SELECT median(n) AS m FROM ws
    ), mad AS (
      SELECT median(abs(n - m)) AS d FROM ws, med
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(floor(any_value(m) * 100 + 0.5) AS BIGINT) AS median_tokens_c,
           CAST(floor(any_value(d) * 100 + 0.5) AS BIGINT) AS mad_tokens_c,
           CAST(count(*) FILTER (WHERE abs(n - m) > 3 * d) AS BIGINT)
             AS n_outliers,
           CAST(floor(count(*) FILTER (WHERE abs(n - m) > 3 * d)
                      * 10000.0 / count(*) + 0.5) AS BIGINT) AS outlier_bp
    FROM ws, med, mad
    """,
)
def llm_doc_len_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length-outlier gate: docs whose token count deviates more
    than 3 MAD from the corpus median (the filter that survives skew
    where mean/std gates don't). Two exact medians over the per-doc
    count frame; the scalars broadcast back as 1-row frames (the
    allowlisted scalar NLJ pattern). At 100 TB swap exact median for
    percentile_approx — the gate is a heuristic, the sketch error is
    noise."""
    t = Tables(spark, sf_dir)
    ws = t.documents.select(
        F.size(T.words(F.col("text"))).alias("n")
    )
    med = ws.agg(F.expr("percentile(n, 0.5)").alias("m"))
    with_m = ws.crossJoin(F.broadcast(med))
    mad = with_m.agg(F.expr("percentile(abs(n - m), 0.5)").alias("d"))
    return (
        with_m.crossJoin(F.broadcast(mad))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.floor(F.first("m") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("median_tokens_c"),
            F.floor(F.first("d") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("mad_tokens_c"),
            F.sum(
                F.when(
                    F.abs(F.col("n") - F.col("m")) > 3 * F.col("d"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "n_docs",
            "median_tokens_c",
            "mad_tokens_c",
            "n_outliers",
            F.floor(
                F.col("n_outliers") * 10000.0 / F.col("n_docs") + F.lit(0.5)
            )
            .cast("bigint")
            .alias("outlier_bp"),
        )
    )


@query(
    "llm_dedup_rate_by_threshold",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    ), scored AS (
      SELECT p.id_a, p.id_b,
             CAST(floor(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
                  THEN len(list_intersect(sa.s, sb.s)) * 1.0
                       / len(list_distinct(list_concat(sa.s, sb.s)))
                  ELSE 0.0 END * 10000 + 0.5) AS BIGINT) AS j_bp
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.id_a
      JOIN sh sb ON sb.doc_id = p.id_b
    ), agg AS (
      SELECT count(*) FILTER (WHERE j_bp >= 5000) AS p50,
             count(*) FILTER (WHERE j_bp >= 7000) AS p70,
             count(*) FILTER (WHERE j_bp >= 9000) AS p90,
             count(DISTINCT id_b) FILTER (WHERE j_bp >= 5000) AS f50,
             count(DISTINCT id_b) FILTER (WHERE j_bp >= 7000) AS f70,
             count(DISTINCT id_b) FILTER (WHERE j_bp >= 9000) AS f90
      FROM scored
    ), tot AS (SELECT count(*) AS total FROM documents)
    SELECT threshold_pct,
           CAST(n_dup_pairs AS BIGINT) AS n_dup_pairs,
           CAST(n_docs_flagged AS BIGINT) AS n_docs_flagged,
           CAST(total - n_docs_flagged AS BIGINT) AS n_survivors
    FROM (
      SELECT 50 AS threshold_pct, p50 AS n_dup_pairs, f50 AS n_docs_flagged FROM agg
      UNION ALL SELECT 70, p70, f70 FROM agg
      UNION ALL SELECT 90, p90, f90 FROM agg
    ), tot
    """,
)
def llm_dedup_rate_by_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup threshold sweep: how many verified duplicate pairs,
    flagged docs, and survivors each Jaccard threshold (0.5 / 0.7 / 0.9)
    would produce — the report a curation run reads before committing a
    threshold. ONE pass over the verified candidate frame (conditional
    aggregates per threshold, integer-bp compares so both engines make
    identical keep/drop calls), stacked to one row per threshold; never
    three pipeline re-runs."""
    t = Tables(spark, sf_dir)
    cand = D.minhash_candidate_pairs(t.documents, bands=_P_BANDS, n=2)
    # verify through the shared size-ratio-bounded stage at the LOWEST
    # reported threshold: pairs whose size ratio caps Jaccard below 0.5
    # contribute zero to every conditional aggregate (their when() is
    # false for all three thresholds), so pruning them before the array
    # join is result-identical — and the bounded path also spreads the
    # verify join to cluster parallelism
    jp = D._bounded_jaccard_edges(
        t.documents, cand, 0.5, "text", "doc_id", 2
    )
    j_bp = (
        F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("bigint")
    )
    scored = jp.select("id_a", "id_b", j_bp.alias("j_bp"))
    agg = scored.agg(
        *[
            F.sum(F.when(F.col("j_bp") >= bp, 1).otherwise(0))
            .cast("bigint")
            .alias(f"p{bp}")
            for bp in (5000, 7000, 9000)
        ],
        *[
            F.count_distinct(
                F.when(F.col("j_bp") >= bp, F.col("id_b"))
            )
            .cast("bigint")
            .alias(f"f{bp}")
            for bp in (5000, 7000, 9000)
        ],
    )
    tot = t.documents.agg(F.count(F.lit(1)).alias("total"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .selectExpr(
            "stack(3, 50, p5000, f5000, 70, p7000, f7000, 90, p9000, f9000)"
            " AS (threshold_pct, n_dup_pairs, n_docs_flagged)",
            "total",
        )
        .select(
            "threshold_pct",
            "n_dup_pairs",
            "n_docs_flagged",
            (F.col("total") - F.col("n_docs_flagged"))
            .cast("bigint")
            .alias("n_survivors"),
        )
    )


def _audit_sample_modulus(n_docs: int, cap: int = 2000) -> int:
    """Sampling modulus for the LSH-quality audit: doc_id % m == 0 with
    m = max(10, ceil(N/cap)) bounds the ground-truth sample at an
    ABSOLUTE <= cap docs at any corpus size (for N <= 10*cap the 1/10
    fraction already lands under cap). A fractional sample squares with
    the corpus — at 10^9 docs a 10% sample is a 10^8 x 10^8 cartesian
    (VERDICT r07 item 2); this keeps the audit's square O(cap²) forever
    while preserving the historic m=10 at every test SF."""
    return max(10, -(-n_docs // cap))


@query(
    "llm_lsh_quality",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), m AS (
      SELECT GREATEST(10, CAST(ceil(count(*) / 2000.0) AS BIGINT)) AS m
      FROM documents
    ), smp AS (
      SELECT sh.* FROM sh, m WHERE sh.doc_id % m.m = 0
    ), truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(floor(CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
                  THEN len(list_intersect(a.s, b.s)) * 1.0
                       / len(list_distinct(list_concat(a.s, b.s)))
                  ELSE 0.0 END * 10000 + 0.5) AS BIGINT) AS j_bp
      FROM smp a JOIN smp b ON a.doc_id < b.doc_id
    ), stacked AS (
{_pair_stack}
    ), cand_s AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
      WHERE a.doc_id % (SELECT m FROM m) = 0
        AND b.doc_id % (SELECT m FROM m) = 0
    ), tp AS (
      SELECT c.id_a FROM cand_s c
      JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b
      WHERE t.j_bp >= 5000
    )
    SELECT CAST((SELECT count(*) FROM smp) AS BIGINT) AS n_sample_docs,
           CAST((SELECT count(*) FROM truth WHERE j_bp >= 5000) AS BIGINT)
             AS n_true_pairs,
           CAST((SELECT count(*) FROM cand_s) AS BIGINT) AS n_candidate_pairs,
           CAST((SELECT count(*) FROM tp) AS BIGINT) AS n_true_positive,
           CAST(CASE WHEN (SELECT count(*) FROM cand_s) = 0 THEN 10000
                ELSE floor((SELECT count(*) FROM tp) * 10000.0
                           / (SELECT count(*) FROM cand_s) + 0.5) END
                AS BIGINT) AS precision_bp,
           CAST(CASE WHEN (SELECT count(*) FROM truth WHERE j_bp >= 5000) = 0
                THEN 10000
                ELSE floor((SELECT count(*) FROM tp) * 10000.0
                           / (SELECT count(*) FROM truth WHERE j_bp >= 5000)
                           + 0.5) END
                AS BIGINT) AS recall_bp
    """,
)
def llm_lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate-stage quality audit: precision/recall of the
    banding stage against EXACT all-pairs Jaccard (>= 0.5) on a
    deterministic ABSOLUTE-capped sample (doc_id % m == 0 with
    m = max(10, ceil(N/2000)) — see _audit_sample_modulus; the oracle
    computes the same m in SQL) — the measurement that justifies a
    band/shingle configuration before a corpus-scale run. The all-pairs
    ground truth is the deliberate, bounded cartesian (allowlisted in
    tests/test_plan_audit.py): it exists ONLY on the sample, and both
    cartesian sides are capped at <= 2000 docs at ANY corpus size — the
    audit's cost is the cap's square, never the corpus's. The square
    additionally rides near_dedup's size-ratio bound:
    J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs that cannot reach the
    0.5 truth threshold are pruned while only (id, n_shingles) ints
    have moved — the heavy shingle-array join runs on the surviving
    ~60% (10x-measured), and the pruned pairs are by construction
    non-true, leaving every output count identical (the margin admits
    the 4-decimal HALF_UP window, same as near_dedup)."""
    t = Tables(spark, sf_dir)
    docs = t.documents
    mod = _audit_sample_modulus(docs.count())  # one bounded scalar
    sample = docs.filter(F.col("doc_id") % mod == 0)
    shf = D._hashed_shingle_frame(sample, "text", "doc_id", 2, True)
    sizes = shf.select("doc_id", F.size("sh").alias("ns"))
    allpairs = (
        sizes.select(F.col("doc_id").alias("id_a"), F.col("ns").alias("na"))
        .crossJoin(
            sizes.select(
                F.col("doc_id").alias("id_b"), F.col("ns").alias("nb")
            )
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("na", "nb")
            >= F.greatest("na", "nb") * F.lit(0.5 - 5e-5 - 1e-9)
        )
        .select("id_a", "id_b")
    )
    truth = D.jaccard_pairs(sample, allpairs, n=2, sh=shf).select(
        "id_a",
        "id_b",
        F.floor(F.col("jaccard") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("j_bp"),
    )
    true_pairs = truth.filter(F.col("j_bp") >= 5000)
    cand_s = D.minhash_candidate_pairs(docs, bands=_P_BANDS, n=2).filter(
        (F.col("id_a") % mod == 0) & (F.col("id_b") % mod == 0)
    )
    tp = cand_s.join(true_pairs, ["id_a", "id_b"])
    ns = sample.agg(F.count(F.lit(1)).cast("bigint").alias("n_sample_docs"))
    nt = true_pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs")
    )
    nc = cand_s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs")
    )
    ntp = tp.agg(F.count(F.lit(1)).cast("bigint").alias("n_true_positive"))
    bp = lambda num, den: (  # noqa: E731 — tiny scalar-ratio helper
        F.when(F.col(den) == 0, F.lit(10000))
        .otherwise(
            F.floor(F.col(num) * 10000.0 / F.col(den) + F.lit(0.5))
        )
        .cast("bigint")
    )
    return (
        ns.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(ntp))
        .select(
            "n_sample_docs",
            "n_true_pairs",
            "n_candidate_pairs",
            "n_true_positive",
            bp("n_true_positive", "n_candidate_pairs").alias("precision_bp"),
            bp("n_true_positive", "n_true_pairs").alias("recall_bp"),
        )
    )


@query(
    "llm_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE ws AS (
      SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_jc_sh} AS s FROM ws
    ), stacked AS (
{_pair_stack}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    ), scored AS (
      SELECT p.id_a, p.id_b,
             CAST(floor(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
                  THEN len(list_intersect(sa.s, sb.s)) * 1.0
                       / len(list_distinct(list_concat(sa.s, sb.s)))
                  ELSE 0.0 END * 10000 + 0.5) AS BIGINT) AS j_bp
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.id_a
      JOIN sh sb ON sb.doc_id = p.id_b
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM scored WHERE j_bp >= 8000
      UNION ALL
      SELECT id_b, id_a FROM scored WHERE j_bp >= 8000
    ), nodes AS (
      SELECT DISTINCT src AS id FROM edges
    ), reach(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ), comp AS (
      SELECT id, min(lab) AS component FROM reach GROUP BY id
    ), sizes AS (
      SELECT component, count(*) AS sz FROM comp GROUP BY component
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
)
def llm_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-shape report: the size distribution of >= 0.8
    Jaccard components (how much of the corpus sits in pairwise dups vs
    boilerplate mega-clusters — the number that decides keep-best vs
    drop-all policy). Rides the pointer-jumped connected_components;
    singleton docs (no >= 0.8 pair) are deliberately absent. The oracle
    replays the clustering as a recursive min-label CTE — a genuinely
    independent cross-engine check of the component labels themselves."""
    t = Tables(spark, sf_dir)
    cand = D.minhash_candidate_pairs(t.documents, bands=_P_BANDS, n=2)
    # same >= 0.8 edge set through the shared size-ratio-bounded verify
    # (jaccard is 4-decimal HALF_UP-rounded in both forms, so the
    # rounded-bp floor compare and the >= 0.8 filter select identical
    # pairs); the bound prunes the array join to the reachable fraction
    verified = D._bounded_jaccard_edges(
        t.documents, cand, 0.8, "text", "doc_id", 2
    ).select("id_a", "id_b")
    comp = D.connected_components(verified)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return sizes.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("sz") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
    ).select(
        F.col("sz").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "n_docs",
    )


# Quantized sign-LSH layout audits: hyperplanes are seeded and quantized
# to integers (floor(x*1000)) so the sign of every dot product is EXACT
# integer arithmetic — cross-engine-deterministic with no float-sign
# risk at the decision boundary (the reason llm_lsh_topk's oracle is a
# contract, not a bucket replay). All products stay < 2^53, so DuckDB's
# double list_dot_product is exact too.
_QLSH_PLANES = [
    [int(__import__("math").floor(x * 1000)) for x in p]
    for p in S.train_hyperplanes(dim=64, n_planes=8, seed=42)
]


def _duck_qlsh_bucket() -> str:
    """DuckDB expression for the quantized sign-LSH bucket id of one
    embedding row (column `embedding`)."""
    qe = (
        "list_transform(CAST(embedding AS DOUBLE[]), "
        "x -> floor(x * 1000))"
    )
    bits = " + ".join(
        f"CASE WHEN list_dot_product({qe}, "
        f"[{', '.join(f'{c}.0' for c in plane)}]) >= 0 "
        f"THEN {2**b} ELSE 0 END"
        for b, plane in enumerate(_QLSH_PLANES)
    )
    return f"({bits})"


def _qlsh_bucket_col() -> F.Column:
    """Spark expression mirroring :func:`_duck_qlsh_bucket` (int64 dots)."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000).cast("long"),
    )
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(_QLSH_PLANES):
        p = F.array(*[F.lit(int(c)).cast("long") for c in plane])
        dot = F.aggregate(
            F.zip_with(q, p, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**b)).otherwise(F.lit(0))
    return bucket


@query(
    "llm_lsh_bucket_balance",
    oracle=f"""
    WITH sizes AS (
      SELECT {_duck_qlsh_bucket()} AS bucket, count(*) AS sz
      FROM embeddings GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(sz) AS BIGINT) AS max_bucket,
           CAST(sum(sz) AS BIGINT) AS n_vectors,
           CAST(floor(sum(sz) * 100.0 / count(*) + 0.5) AS BIGINT)
             AS mean_bucket_c,
           CAST(floor(max(sz) * count(*) * 10000.0 / sum(sz) + 0.5)
                AS BIGINT) AS imbalance_bp,
           CAST(floor(max(sz) * 10000.0 / sum(sz) + 0.5) AS BIGINT)
             AS top_share_bp
    FROM sizes
    """,
)
def llm_lsh_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH layout balance audit: bucket count, max/mean bucket size,
    imbalance (max/mean, bp) and the hottest bucket's corpus share — the
    skew report that predicts whether an LSH-bucketed join (write-time
    partition key, ANN probe) will straggle at 100 TB. One scan, one
    8-bit-keyed aggregate; the stats aggregate runs on the <=256-row
    bucket frame."""
    t = Tables(spark, sf_dir)
    sizes = t.embeddings.groupBy(
        _qlsh_bucket_col().alias("bucket")
    ).agg(F.count(F.lit(1)).alias("sz"))
    return sizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("sz").cast("bigint").alias("max_bucket"),
        F.sum("sz").cast("bigint").alias("n_vectors"),
        F.floor(
            F.sum("sz") * 100.0 / F.count(F.lit(1)) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("mean_bucket_c"),
        F.floor(
            F.max("sz") * F.count(F.lit(1)) * 10000.0 / F.sum("sz")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("imbalance_bp"),
        F.floor(F.max("sz") * 10000.0 / F.sum("sz") + F.lit(0.5))
        .cast("bigint")
        .alias("top_share_bp"),
    )


@query(
    "llm_lsh_probe_cost",
    oracle=f"""
    WITH sizes AS (
      SELECT {_duck_qlsh_bucket()} AS bucket, count(*) AS sz
      FROM embeddings GROUP BY 1
    ), probes AS (
      SELECT s.bucket, s.sz,
             CASE WHEN m.m = 0 THEN s.bucket ELSE xor(s.bucket, m.m) END AS pb
      FROM sizes s, (SELECT unnest([0,1,2,4,8,16,32,64,128]) AS m) m
    ), probed AS (
      SELECT p.bucket, any_value(p.sz) AS sz,
             sum(COALESCE(s2.sz, 0)) AS pr
      FROM probes p LEFT JOIN sizes s2 ON s2.bucket = p.pb
      GROUP BY p.bucket
    )
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(floor(sum(sz * pr) * 10000.0
                      / (sum(sz) * sum(sz)) + 0.5) AS BIGINT)
             AS mean_probe_bp,
           CAST(floor(max(pr) * 10000.0 / sum(sz) + 0.5) AS BIGINT)
             AS max_probe_bp
    FROM probed
    """,
)
def llm_lsh_probe_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe cost audit: the corpus fraction a Hamming<=1 probe
    (own bucket + 8 one-bit flips) scans, query-weighted mean and worst
    bucket — mean_probe_bp IS the expected per-query scan cost of
    llm_lsh_topk's layout, computed from bucket sizes alone (no vector
    math). The probe fan-out joins the <=256-row bucket-size frame to
    itself on XOR keys — constant work regardless of corpus size."""
    t = Tables(spark, sf_dir)
    sizes = t.embeddings.groupBy(
        _qlsh_bucket_col().alias("bucket")
    ).agg(F.count(F.lit(1)).alias("sz"))
    masks = F.array(*[F.lit(m) for m in (0, 1, 2, 4, 8, 16, 32, 64, 128)])
    probes = sizes.select(
        "bucket",
        "sz",
        F.explode(
            F.transform(
                masks,
                lambda m: F.when(m == 0, F.col("bucket")).otherwise(
                    F.col("bucket").bitwiseXOR(m)
                ),
            )
        ).alias("pb"),
    )
    s2 = sizes.select(
        F.col("bucket").alias("pb"), F.col("sz").alias("sz2")
    )
    probed = (
        probes.join(s2, "pb", "left")
        .groupBy("bucket")
        .agg(
            F.first("sz").alias("sz"),
            F.sum(F.coalesce(F.col("sz2"), F.lit(0))).alias("pr"),
        )
    )
    return probed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.floor(
            F.sum(F.col("sz") * F.col("pr"))
            * 10000.0
            / (F.sum("sz") * F.sum("sz"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("mean_probe_bp"),
        F.floor(F.max("pr") * 10000.0 / F.sum("sz") + F.lit(0.5))
        .cast("bigint")
        .alias("max_probe_bp"),
    )
