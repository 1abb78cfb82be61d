"""Graph analytics over the part co-purchase graph (SURVEY §2.3 extension).

Nodes are parts; an undirected edge connects two parts that co-occur in at
least one order (built from a lineitem self-join on l_orderkey, oriented
src < dst, deduplicated). This is the classic market-basket projection of
a bipartite order-part graph, and the three queries below are the three
canonical whole-graph computations a 100 TB pipeline runs over it:

* fixed-iteration PageRank (iterative join+agg, the BSP pattern),
* triangle counting over oriented edges (the clustering-coefficient core),
* common-neighbor / Jaccard link prediction (recommendation candidates).

Scale notes (local[32] correctness, 1000-executor design):

* Edge building groups by l_orderkey — per-order item lists are tiny and
  bounded (max ~7 lineitems per order in TPC-H), so the self-join expands
  at most k^2 per order and never quadratically in table size.
* All iterations are keyed shuffles (join on src / groupBy dst) with
  map-side partial aggregation; ranks and edges co-partition on the same
  key so AQE reuses the exchange. No driver-side graph state — the only
  driver scalar is the node count N (an aggregate, not a collect).
* Triangle counting orients edges by (id) so each triangle is counted
  exactly once; the production variant orients by (degree, id) to bound
  the join fan-out of hub nodes — same result set, noted where relevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked
from . import Tables, query

#: Giant-basket guard (r09 skew rehearsal): pair generation is QUADRATIC
#: per order, so one pathological basket with k items emits k^2/2 edges —
#: the hot-key corpus's 1.2M-row order would project a ~20k-part clique
#: (~2x10^8 edges, ~10^12 triangles) and wedge every graph query. Real
#: co-occurrence pipelines cap the basket: an order with more than this
#: many line rows is bot/aggregation noise, not a co-purchase signal, and
#: is dropped from the projection. Line count (not distinct parts) keeps
#: the guard a plain count on the same key the self-join shuffles on;
#: TPC-H orders have <= 7 lines, so the cap never binds on real testdata
#: and every graph oracle mirrors it exactly.
MAX_BASKET_LINES = 1000

# Shared oracle CTE: distinct oriented co-purchase edges over capped
# baskets (mirror of _copurchase_pairs, including MAX_BASKET_LINES).
_PAIRS_CTE = f"""
    sane_orders AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(*) <= {MAX_BASKET_LINES}
    ),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_orderkey IN (SELECT l_orderkey FROM sane_orders)
    )
"""


def _copurchase_pairs(t: Tables) -> DataFrame:
    """Distinct oriented (src < dst) part co-purchase pairs over capped
    baskets (MAX_BASKET_LINES — see the guard note above).

    ONE aggregation does everything the old three-step form (guard
    aggregate -> semi-join -> keyed self-join) needed: the line count IS
    the guard and collect_set gives the basket's distinct parts, so pair
    expansion becomes a basket-local double explode — no second shuffle
    of lineitem, no join. Guide §2.4 (remove shuffles outright): the
    rewrite drops one full lineitem exchange plus the self-join; the
    per-basket expansion stays bounded by the same k^2 cap. Result set
    identical (the final distinct dedupes across baskets exactly as the
    self-join form did; within a basket collect_set already dedupes)."""
    li = t.lineitem.select("l_orderkey", "l_partkey")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("__n_lines"),
            F.collect_set("l_partkey").alias("__parts"),
        )
        .filter(F.col("__n_lines") <= MAX_BASKET_LINES)
        .select("__parts")
    )
    return (
        baskets.select(F.explode("__parts").alias("src"), "__parts")
        .select("src", F.explode("__parts").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )


def _symmetric_edges(pairs: DataFrame) -> DataFrame:
    """Both directions of the oriented pair list as (src, dst), via ONE
    explode pass instead of a two-branch union — the union form evaluates
    the pairs subtree twice when it is not cached (exchange reuse dedupes
    the shuffles but not the per-branch probe work); explode emits both
    directions in a single pass (guide §2.4)."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def _pagerank_oracle(iters: int) -> str:
    """Unrolled fixed-iteration PageRank as DuckDB CTEs (r0..r{iters})."""
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""r{k} AS (
      SELECT e.dst AS src,
             0.15 / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.outdeg) AS rank
      FROM edges e
      JOIN r{k - 1} r ON e.src = r.src
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    )"""
        )
    return f"""
    WITH {_PAIRS_CTE.strip()},
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT src, 1.0 / (SELECT n FROM nn) AS rank FROM deg),
    {','.join(steps)}
    SELECT r.src AS part_node,
           floor(r.rank * (SELECT n FROM nn) * 1e6 + 0.5) / 1e6
             AS rank_scaled,
           d.outdeg AS degree
    FROM r{iters} r JOIN deg d ON r.src = d.src
    """


def _pagerank_ranks(
    wedges: DataFrame, deg: DataFrame, n: int, iters: int
) -> DataFrame:
    """The BSP superstep loop, factored out so the plan-audit suite can
    pin the PER-ITERATION shuffle delta (test_plan_audit.py): each extra
    iteration must add a constant number of exchanges (the rank-side
    join shuffle + the contribution aggregate), never grow the reused
    weighted-edge subtree."""
    ranks = deg.select("src", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        ranks = (
            wedges.join(ranks, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
            .select(
                F.col("dst").alias("src"),
                (F.lit(0.15 / n) + F.lit(0.85) * F.col("contrib")).alias(
                    "rank"
                ),
            )
        )
    return ranks


@query("graph_pagerank", oracle=_pagerank_oracle(5))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 5-iteration PageRank (damping 0.85) over the co-purchase
    graph. The symmetric edge set guarantees no dangling nodes (every
    node has out-degree >= 1 and receives >= 1 in-edge), so mass is
    conserved without a dangling-redistribution term and the node set is
    stable across iterations.

    Each iteration is one keyed join (rank onto edges by src) plus one
    keyed aggregate (contributions by dst) — the standard BSP/Pregel
    superstep expressed as DataFrame ops, so Catalyst plans map-side
    partial sums and AQE coalesces the contribution shuffle. The
    weighted edge list (1/outdeg precomputed) is persisted once and
    reused by all iterations; at 100 TB you would also localCheckpoint
    the rank vector every few supersteps to truncate lineage. Ranks are
    reported scaled by N (so a uniform graph scores 1.0) on the 1e-6
    grid, making the float fold order cross-engine-stable."""
    t = Tables(spark, sf_dir)
    # persisted (r12-opt, guide §2.4): pairs feeds the degree aggregate
    # (materialized by the n count below) AND the weighted-edge build —
    # without the persist the basket aggregate + double explode + distinct
    # pipeline runs once per consumer; deg is read three times (the wedge
    # join, the rank-vector init, the final degree join) plus the count.
    pairs = tracked(_copurchase_pairs(t).persist())
    edges = _symmetric_edges(pairs)
    deg = tracked(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    )
    # contribution weight folded into the edge list once: src -> dst with
    # weight 1/outdeg(src); 5 iterations reuse this one persisted relation
    wedges = tracked(
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .persist()
    )
    n = deg.count()  # driver scalar (aggregate action, not a row collect)
    ranks = _pagerank_ranks(wedges, deg, n, iters=5)
    return ranks.join(deg, "src").select(
        F.col("src").alias("part_node"),
        (F.floor(F.col("rank") * n * 1e6 + F.lit(0.5)) / 1e6).alias(
            "rank_scaled"
        ),
        F.col("outdeg").alias("degree"),
    )


_TRIANGLE_SQL_CTES = f"""
    WITH {_PAIRS_CTE.strip()},
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.src = e1.dst
      JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    member AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    tcnt AS (SELECT node, count(*) AS n_triangles FROM member GROUP BY 1)
"""


def _degree_and_triangle_counts(t: Tables):
    """Shared construction for the triangle family: undirected per-node
    degree and per-node triangle counts via DEGREE-ordered adjacency
    intersection: every undirected edge points from its lower-(deg, id)
    endpoint to the higher one (the Schank-Wagner / Cohen orientation),
    and for each directed edge (u, v) the triangles it bases are exactly
    N+(u) ∩ N+(v) (w completes {u,v,w} iff u→w and v→w exist). The
    orientation is a total order, so a triangle a<b<c is found exactly
    once — on its (a, b) edge, with c in both forward lists; the forward
    adjacency list is O(sqrt(|E|)) long under this orientation (the
    id-ordered variant (r02) put every hub's full neighborhood on one
    node and OOM'd a 1 GB bare session at sf0.1).

    r12-opt: this replaces the wedge-enumeration form (self-join on the
    apex emitting every out-neighbor pair, then a closure join on the
    (b, c) edge key). Both do Θ(Σ out-deg²) element work, but the wedge
    form MATERIALIZED it — 41M wedge rows at sf0.1 flowing through a
    join probe — where the intersection keeps the frame at |E| rows
    (1.2M) with bounded arrays and does the per-edge work inside one
    codegen'd `array_intersect`. Measured on the isolated tcounts
    stage at sf0.1: min 3.67 → 1.46 s (−60%), identical counts for all
    20k nodes. Per-edge credit: u and v each base |ws| triangles, each
    w completes one — summed per node in a single explode pass (no
    per-corner union branches, guide §2.4).

    Returns (deg: (node, deg), tcounts: (node, n_triangles) for every
    node in >= 1 triangle). Per-node counts are orientation-invariant,
    so the id-ordered SQL oracle enumeration matches."""
    # persisted: read three times (degree count, then the orientation
    # join's two sides) and expensive to rebuild
    pairs = tracked(_copurchase_pairs(t).persist())
    # undirected degree per node: ONE cached-pairs scan via explode
    # instead of a two-branch union (guide §2.4 — same aggregate, half
    # the input traffic), and persisted because three consumers read it
    # (the orientation join's src and dst sides plus the caller's final
    # degree join) — each would otherwise repay the aggregation shuffle.
    deg = tracked(
        pairs.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # re-orient: lower (deg, id) -> higher (deg, id)
    da = deg.select(F.col("node").alias("src"), F.col("deg").alias("dsrc"))
    db = deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddst"))
    keyed = pairs.join(da, "src").join(db, "dst")
    fwd = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    # Repartition by u BEFORE caching: AQE coalesces the orientation
    # join's output to match its ~tens-of-MB size (10 partitions at
    # sf0.1), but the downstream per-edge intersection work is
    # proportional to Σ out-deg², not to the edge-list bytes, so a
    # byte-sized partition count serializes it onto a few cores (guide
    # §2.5 input-skew note: fix parallelism where the work is, not where
    # the bytes are). Keying by ``u`` also makes the adjacency groupBy
    # exchange-free. 2x defaultParallelism is scale-adaptive (tracks
    # executor count on a cluster), never a local constant.
    n_part = 2 * t.lineitem.sparkSession.sparkContext.defaultParallelism
    directed = keyed.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
    ).repartition(n_part, "u")
    directed = tracked(directed.persist())
    # forward adjacency rides directed's (u) partitioning — no exchange;
    # list not set: directed pairs are already distinct
    adj = directed.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    # attach N+(v) then N+(u); the second join is co-partitioned on u
    withv = directed.join(
        adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv")), "v"
    )
    both = withv.join(adj.select("u", F.col("nbrs").alias("nu")), "u")
    tri_w = both.select(
        "u", "v", F.array_intersect("nu", "nv").alias("ws")
    ).where(F.size("ws") > 0)
    # one explode pass credits all corners (no per-corner union
    # branches, guide §2.4): the base edge's endpoints each get |ws|,
    # every completing w gets 1
    contrib = tri_w.select(
        F.explode(
            F.concat(
                F.transform(
                    "ws",
                    lambda w: F.struct(
                        w.alias("node"), F.lit(1).cast("long").alias("c")
                    ),
                ),
                F.array(
                    F.struct(
                        F.col("u").alias("node"),
                        F.size("ws").cast("long").alias("c"),
                    ),
                    F.struct(
                        F.col("v").alias("node"),
                        F.size("ws").cast("long").alias("c"),
                    ),
                ),
            )
        ).alias("m")
    ).select("m.node", "m.c")
    tcounts = contrib.groupBy("node").agg(F.sum("c").alias("n_triangles"))
    return deg, tcounts


@query(
    "graph_triangle_count",
    oracle=_TRIANGLE_SQL_CTES
    + """
    SELECT node AS part_node, n_triangles FROM tcnt
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (see _degree_and_triangle_counts for the
    degree-ordered wedge construction and its scale bound). Output:
    every node in >= 1 triangle with its count."""
    _deg, tcounts = _degree_and_triangle_counts(Tables(spark, sf_dir))
    return tcounts.select(F.col("node").alias("part_node"), "n_triangles")


@query(
    "graph_clustering_coefficient",
    oracle=_TRIANGLE_SQL_CTES
    + """,
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1)
    SELECT d.node AS part_node,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
           floor(2.0 * coalesce(tc.n_triangles, 0) * 1e6
                 / (d.deg * (d.deg - 1)) + 0.5) / 1e6 AS lcc
    FROM deg d LEFT JOIN tcnt tc ON tc.node = d.node
    WHERE d.deg >= 2
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node: 2*triangles / deg*(deg-1)
    for every node of degree >= 2 (zero-triangle nodes INCLUDED via the
    left join — their lcc=0 is the signal that a hub's neighborhood is
    a star, the market-basket "catalog item bought with everything"
    shape). The canonical triangle-family statistic on top of the shared
    degree-ordered wedge enumeration; same scale bound as
    graph_triangle_count, plus one broadcast-sized left join of the
    per-node counts back onto the degree table."""
    deg, tcounts = _degree_and_triangle_counts(Tables(spark, sf_dir))
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tcounts, "node", "left")
        .select(
            F.col("node").alias("part_node"),
            F.col("deg").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            (
                F.floor(
                    2.0
                    * F.coalesce(F.col("n_triangles"), F.lit(0))
                    * 1e6
                    / (F.col("deg") * (F.col("deg") - 1))
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("lcc"),
        )
    )


@query(
    "graph_degree_stats",
    oracle=f"""
    WITH {_PAIRS_CTE.strip()},
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1)
    SELECT CAST(deg AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY deg
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph: node count per exact
    degree — the first diagnostic run on any new graph (a heavy tail
    here is what forces the degree-ordered triangle orientation and the
    hub caps in the link-prediction query). Two keyed aggregations over
    the persisted distinct edge list; output is bounded by the max
    degree, never by graph size."""
    t = Tables(spark, sf_dir)
    pairs = _copurchase_pairs(t)
    deg = (
        pairs.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return deg.groupBy(F.col("deg").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH {_PAIRS_CTE.strip()},
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
    mid AS (
      SELECT e.src, e.dst FROM edges e
      JOIN deg d ON d.src = e.src
      WHERE d.outdeg <= 60
    ),
    wedge AS (
      SELECT e1.dst AS a, e2.dst AS c, count(*) AS n_common
      FROM mid e1 JOIN mid e2
        ON e1.src = e2.src AND e1.dst < e2.dst
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT w.a, w.c, w.n_common
      FROM wedge w
      LEFT JOIN pairs p ON p.src = w.a AND p.dst = w.c
      WHERE p.src IS NULL
    )
    SELECT cand.a AS part_a, cand.c AS part_b, cand.n_common,
           floor(CAST(cand.n_common AS DOUBLE)
                 / (da.outdeg + dc.outdeg - cand.n_common) * 1e6 + 0.5)
             / 1e6 AS jaccard
    FROM cand
    JOIN deg da ON da.src = cand.a
    JOIN deg dc ON dc.src = cand.c
    ORDER BY cand.n_common DESC, jaccard DESC, part_a, part_b
    LIMIT 50
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction: the 50 strongest NON-adjacent part pairs by
    common-neighbor count, with the neighborhood-Jaccard score
    |N(a)∩N(b)| / |N(a)∪N(b)| (degrees from the full graph). Wedges
    enumerate through the shared middle node (keyed self-join on src,
    a < c ordering halves the output), existing edges are removed with a
    LEFT ANTI join against the oriented edge list, and the top 50 is a
    TakeOrdered with a total order (count desc, score desc, ids) so ties
    are deterministic. The wedge join is the hub-fan-out hot spot — a
    middle node of degree d contributes d(d-1)/2 pairs — so middles are
    capped at degree 60 (the WTF/Cassovary guard: hub middles contribute
    noise pairs anyway; the cap makes the join linear in edges instead
    of quadratic in hub degree, and the oracle applies the same cap)."""
    t = Tables(spark, sf_dir)
    pairs = tracked(_copurchase_pairs(t).persist())
    edges = _symmetric_edges(pairs)
    # persisted (r12-opt): three consumers (the hub cap filter plus the
    # da/dc scoring joins) each re-ran the explode+aggregate otherwise
    deg = tracked(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    )
    mid = (
        edges.join(deg, "src")
        .where(F.col("outdeg") <= 60)
        .select("src", "dst")
    )
    e1 = mid.alias("e1")
    e2 = mid.alias("e2")
    wedge = (
        e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst") < F.col("e2.dst")),
        )
        .groupBy(
            F.col("e1.dst").alias("a"), F.col("e2.dst").alias("c")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = wedge.join(
        pairs,
        (F.col("a") == F.col("src")) & (F.col("c") == F.col("dst")),
        "left_anti",
    )
    da = deg.alias("da")
    dc = deg.alias("dc")
    scored = (
        cand.join(da, F.col("a") == F.col("da.src"))
        .join(dc, F.col("c") == F.col("dc.src"))
        .select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            "n_common",
            (
                F.floor(
                    F.col("n_common").cast("double")
                    / (
                        F.col("da.outdeg")
                        + F.col("dc.outdeg")
                        - F.col("n_common")
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("n_common"), F.desc("jaccard"), "part_a", "part_b"
    ).limit(50)


@query(
    "graph_khop_reach",
    oracle=f"""
    WITH {_PAIRS_CTE.strip()},
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    seed AS (SELECT min(src) AS node FROM edges),
    h0 AS (SELECT node FROM seed),
    h1 AS (
      SELECT DISTINCT e.dst AS node FROM edges e
      JOIN h0 ON e.src = h0.node
      WHERE e.dst NOT IN (SELECT node FROM h0)
    ),
    h2 AS (
      SELECT DISTINCT e.dst AS node FROM edges e
      JOIN h1 ON e.src = h1.node
      WHERE e.dst NOT IN (SELECT node FROM h0)
        AND e.dst NOT IN (SELECT node FROM h1)
    ),
    h3 AS (
      SELECT DISTINCT e.dst AS node FROM edges e
      JOIN h2 ON e.src = h2.node
      WHERE e.dst NOT IN (SELECT node FROM h0)
        AND e.dst NOT IN (SELECT node FROM h1)
        AND e.dst NOT IN (SELECT node FROM h2)
    )
    SELECT node AS part_node, 0 AS hop FROM h0
    UNION ALL SELECT node, 1 FROM h1
    UNION ALL SELECT node, 2 FROM h2
    UNION ALL SELECT node, 3 FROM h3
    """,
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS from a deterministic seed (the minimum part id in the
    edge set): each node reachable within 3 hops labeled with its exact
    hop distance. Each hop is one keyed join (frontier onto edges by
    src) followed by a distinct and an anti-join against the visited
    set — the frontier-expansion BSP step; visited stays a DataFrame
    (re-unioned per hop), never driver state. Hop count is fixed, so
    the plan is static and AQE sizes each frontier exchange at runtime;
    at 100 TB the visited anti-join keys on node id and the frontier is
    the only growing relation (bounded by the k-hop ball size — the
    reason production BFS caps k rather than iterating to fixpoint)."""
    t = Tables(spark, sf_dir)
    pairs = _copurchase_pairs(t)
    edges = tracked(_symmetric_edges(pairs).persist())
    # seed: one-row aggregate, persisted because hop 1's expansion join,
    # the visited anti-joins AND the output layer all read it (ADVICE
    # r12: the frontier rationale lives on nxt below, where it applies)
    seed = tracked(edges.agg(F.min("src").alias("node")).persist())
    layers = [seed.select("node", F.lit(0).alias("hop"))]
    visited = seed.select("node")
    frontier = seed.select("node")
    for hop in (1, 2, 3):
        # persisted (r12-opt, guide §2.4): each hop's frontier has THREE
        # downstream consumers (its output layer in the final union, the
        # growing visited set feeding every later hop's anti-join, and
        # the next hop's expansion join) — without the persist hop 1's
        # whole join+distinct+anti pipeline re-evaluates ~4x inside the
        # one final job. The frames are frontier-sized (bounded by the
        # k-hop ball), so caching them is the textbook BSP frontier
        # pattern; tracked() lets sweep callers release them after the
        # consuming action (they must outlive this function — the hop
        # union is only evaluated by the caller's action).
        nxt = tracked(
            edges.join(
                frontier.withColumnRenamed("node", "src"), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .persist()
        )
        layers.append(nxt.select("node", F.lit(hop).alias("hop")))
        visited = visited.union(nxt)
        frontier = nxt
    out = layers[0]
    for lyr in layers[1:]:
        out = out.union(lyr)
    return out.select(F.col("node").alias("part_node"), "hop")
