"""Full truss decomposition (local h-index support iteration):
sequential support-peel twin, k-truss cross-consistency, known shapes,
triangle-free edges, determinism."""

from __future__ import annotations

from collections import defaultdict

from paralleltrianglecounting_spark.operators.ktruss import k_truss, truss_numbers
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph


def py_trussness(pairs):
    """Sequential min-support peeling — trussness(e) = round at which
    the edge's in-subgraph support first drops below the threshold."""
    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    ladj = {v: set(n) for v, n in adj.items()}
    edges = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    live = set(edges)
    out = {}
    k = 1
    while live:
        changed = True
        while changed:
            drop = [e for e in live if len(ladj[e[0]] & ladj[e[1]]) < k]
            changed = bool(drop)
            for e in drop:
                out[e] = k + 1  # support threshold k-1 -> trussness k+1
                live.discard(e)
                ladj[e[0]].discard(e[1])
                ladj[e[1]].discard(e[0])
        k += 1
    return out


def _collect(df):
    return {(r.src, r.dst): r.trussness for r in df.collect()}


def test_truss_numbers_matches_peel_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    assert _collect(truss_numbers(edges)) == py_trussness(pairs)


def test_truss_numbers_matches_peel_planted(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=100, num_triangles=80, seed=9)
    )
    pairs = [(r.src, r.dst) for r in edges.collect()]
    assert _collect(truss_numbers(edges)) == py_trussness(pairs)


def test_truss_numbers_consistent_with_k_truss(spark):
    # trussness(e) >= k  <=>  e in k-truss(k)
    edges = read_g_file(spark, reference_graph("graph_100"))
    tn = _collect(truss_numbers(edges))
    for k in (3, 4):
        kt = {(r.src, r.dst) for r in k_truss(edges, k=k).collect()}
        assert kt == {e for e, t in tn.items() if t >= k}


def test_truss_known_shapes(spark):
    # K4: every edge in 2 triangles -> trussness 4; a pendant edge and
    # a triangle-free path get the trivial 2; one triangle -> 3
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    extra = [(3, 10), (10, 11)]
    tri = [(20, 21), (21, 22), (20, 22)]
    df = spark.createDataFrame(k4 + extra + tri, "src long, dst long")
    got = _collect(truss_numbers(df))
    assert all(got[e] == 4 for e in k4)
    assert got[(3, 10)] == 2 and got[(10, 11)] == 2
    assert all(got[e] == 3 for e in tri)


def test_truss_broadcast_and_shuffle_regimes_agree(spark):
    # the theta-broadcast plan (under THETA_BROADCAST_MAX_EDGES) and
    # the over-gate shuffle plan must return identical decompositions
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=90, num_triangles=60, seed=5)
    )
    bcast = _collect(truss_numbers(edges, broadcast_theta=True))
    shuf = _collect(truss_numbers(edges, broadcast_theta=False))
    assert bcast == shuf
    assert bcast == py_trussness(list(bcast))


def test_truss_deterministic_across_parallelism(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=70, num_triangles=40, seed=2)
    )
    a = _collect(truss_numbers(edges.repartition(1)))
    b = _collect(truss_numbers(edges.repartition(16)))
    assert a == b
