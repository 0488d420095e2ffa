"""Full core decomposition (h-index fixpoint): sequential-peel twin,
k-core cross-consistency, structural invariants, determinism."""

from __future__ import annotations

from collections import defaultdict

from paralleltrianglecounting_spark.operators.degrees import degrees
from paralleltrianglecounting_spark.operators.kcore import core_numbers, k_core
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph


def py_coreness(pairs):
    """Sequential min-degree peeling — the textbook definition."""
    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    live = {v: set(n) for v, n in adj.items()}
    core = {}
    k = 1
    while live:
        changed = True
        while changed:
            drop = [v for v, n in live.items() if len(n) < k]
            changed = bool(drop)
            for v in drop:
                core[v] = k - 1
                for u in live[v]:
                    live[u].discard(v)
                del live[v]
        k += 1
    return core


def _collect(df):
    return {r.vertex: r.coreness for r in df.collect()}


def test_coreness_matches_peel_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    assert _collect(core_numbers(edges)) == py_coreness(pairs)


def test_coreness_matches_peel_planted(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=120, num_triangles=90, seed=11)
    )
    pairs = [(r.src, r.dst) for r in edges.collect()]
    assert _collect(core_numbers(edges)) == py_coreness(pairs)


def test_coreness_consistent_with_k_core(spark):
    # coreness(v) >= k  <=>  v in k-core(k)
    edges = read_g_file(spark, reference_graph("graph_100"))
    cn = _collect(core_numbers(edges))
    for k in (1, 2, 4, 8):
        kc = {r.vertex for r in k_core(edges, k=k).collect()}
        assert kc == {v for v, c in cn.items() if c >= k}


def test_coreness_bounded_by_degree_and_known_shapes(spark):
    # path: all coreness 1; triangle with a pendant: 2,2,2,1
    pairs = [(0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    assert _collect(core_numbers(df)) == {0: 1, 1: 1, 2: 1, 3: 1}
    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 9)], "src long, dst long"
    )
    assert _collect(core_numbers(tri)) == {0: 2, 1: 2, 2: 2, 9: 1}
    edges = read_g_file(spark, reference_graph("graph_100"))
    cn = _collect(core_numbers(edges))
    deg = {r.vertex: r.degree for r in degrees(edges).collect()}
    assert all(cn[v] <= deg[v] for v in cn)


def test_coreness_deterministic_across_parallelism(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=80, num_triangles=50, seed=4)
    )
    a = _collect(core_numbers(edges.repartition(1)))
    b = _collect(core_numbers(edges.repartition(16)))
    assert a == b
