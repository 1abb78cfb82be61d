"""Invariant checks for the graph-analytics family (queries/graph.py),
independent of the DuckDB oracles: PageRank mass conservation, triangle
counts vs a brute-force reference, BFS hop distances vs a pure-Python BFS.
"""

import itertools
from collections import deque

import pytest

from cartodb_importer_spark.queries import QUERIES
from cartodb_importer_spark.queries.graph import _copurchase_pairs
from cartodb_importer_spark.queries import Tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_set(spark):
    rows = _copurchase_pairs(Tables(spark, SF)).collect()
    return {(r["src"], r["dst"]) for r in rows}


def _adj(edge_set):
    adj = {}
    for a, b in edge_set:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_pagerank_mass_conserved(spark):
    pdf = QUERIES["graph_pagerank"](spark, SF).toPandas()
    n = len(pdf)
    # ranks sum to 1 => N-scaled ranks sum to N (within grid rounding)
    assert abs(pdf["rank_scaled"].sum() - n) < n * 1e-5
    assert (pdf["rank_scaled"] > 0).all()
    # high-degree nodes should never rank below the (1-d)/N floor
    assert (pdf["rank_scaled"] >= 0.15 - 1e-6).all()


def test_triangle_count_matches_bruteforce(spark, edge_set):
    adj = _adj(edge_set)
    expect = {}
    for a, b in edge_set:
        # triangles through edge (a,b): common neighbors c > b keeps each
        # triangle counted once (a < b < c by construction below)
        for c in adj[a] & adj[b]:
            if c > b and a < b:
                for node in (a, b, c):
                    expect[node] = expect.get(node, 0) + 1
    got = {
        r["part_node"]: r["n_triangles"]
        for r in QUERIES["graph_triangle_count"](spark, SF).collect()
    }
    assert got == expect


def test_khop_matches_python_bfs(spark, edge_set):
    adj = _adj(edge_set)
    seed = min(adj)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= 3:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = {
        r["part_node"]: r["hop"]
        for r in QUERIES["graph_khop_reach"](spark, SF).collect()
    }
    assert got == dist


def test_common_neighbors_are_nonadjacent_and_correct(spark, edge_set):
    adj = _adj(edge_set)
    deg = {v: len(ns) for v, ns in adj.items()}
    rows = QUERIES["graph_common_neighbors"](spark, SF).collect()
    assert len(rows) <= 50
    for r in rows:
        a, b = r["part_a"], r["part_b"]
        assert (a, b) not in edge_set and (b, a) not in edge_set
        # capped reference: common neighbors counted only through middles
        # of degree <= 60, mirroring the production guard
        common = {
            m for m in adj[a] & adj[b] if deg[m] <= 60
        }
        assert r["n_common"] == len(common)


def test_triangle_counts_shared_edge_fixture(spark, tmp_path):
    """r12-opt pin for the adjacency-intersection triangle count: two
    triangles SHARING an edge — the base edge of both must credit its
    endpoints once per completed triangle (|ws| each), every completing
    node once. Graph: {1,2,3} and {1,2,4} share edge (1,2); node 5
    attaches to 1 only (degree 1 -> in no triangle, absent from output).
    Expected: 1 -> 2, 2 -> 2, 3 -> 1, 4 -> 1."""
    import os

    # one order per desired co-purchase edge
    edges = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (1, 5)]
    rows = [
        (oid, part)
        for oid, (a, b) in enumerate(edges)
        for part in (a, b)
    ]
    df = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.write.parquet(os.path.join(sf, "lineitem.parquet"))
    got = {
        (r["part_node"], r["n_triangles"])
        for r in QUERIES["graph_triangle_count"](spark, sf).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 1), (4, 1)}


def test_giant_basket_guard_drops_pathological_orders(spark, tmp_path):
    """r09 skew finding: one k-item basket emits k^2/2 edges, so a hot-key
    corpus's million-line order projects a corpus-wide clique. Orders with
    more than MAX_BASKET_LINES line rows must be dropped from the
    co-purchase projection; sane orders must be unaffected."""
    from cartodb_importer_spark.queries.graph import MAX_BASKET_LINES

    giant = [(1, 100 + i % 500) for i in range(MAX_BASKET_LINES + 1)]
    sane = [(2, 10), (2, 11), (3, 10), (3, 12)]
    df = spark.createDataFrame(
        giant + sane, "l_orderkey bigint, l_partkey bigint"
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    df.write.parquet(os.path.join(sf, "lineitem.parquet"))
    got = {
        (r["src"], r["dst"])
        for r in _copurchase_pairs(Tables(spark, sf)).collect()
    }
    # only the sane orders' pairs survive; nothing from the giant basket
    assert got == {(10, 11), (10, 12)}
