"""Densest subgraph (synchronous (1+ε) greedy peel): sequential-twin
agreement, the planted-clique best-round>0 case, the approximation
guarantee against an exact oracle on small graphs, determinism across
parallelism, and edge cases (empty graph, single edge)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.densest import (
    densest_subgraph,
    densest_subgraph_run,
)
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph


def py_densest(pairs, epsilon):
    """Sequential twin of the synchronous peel: same rounds, same
    double arithmetic, ties to the earliest round."""
    edges = {(u, v) for u, v in pairs if u != v}
    best_d, best_round, best_verts = -1.0, -1, set()
    r = 0
    while edges:
        verts = {u for e in edges for u in e}
        d = len(edges) / len(verts)
        if d > best_d:
            best_d, best_round, best_verts = d, r, set(verts)
        thr = 2.0 * (1.0 + epsilon) * d
        deg: dict[int, int] = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {v for v, k in deg.items() if k > thr}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
        r += 1
    return best_verts, best_d, best_round


def exact_densest_density(pairs):
    """Exact max density by brute force over all vertex subsets —
    exponential, tiny graphs only."""
    verts = sorted({u for e in pairs for u in e})
    best = 0.0
    for k in range(1, len(verts) + 1):
        for sub in itertools.combinations(verts, k):
            s = set(sub)
            e = sum(1 for u, v in pairs if u in s and v in s)
            if k and e / k > best:
                best = e / k
    return best


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "src long, dst long"
    )


def test_densest_matches_twin_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    for eps in (0.1, 0.5):
        verts, d, rnd = densest_subgraph_run(edges, epsilon=eps)
        tverts, td, trnd = py_densest(pairs, eps)
        assert {r.vertex for r in verts.collect()} == tverts
        assert d == td and rnd == trnd


def test_densest_planted_clique_best_round_positive(spark):
    # A 12-clique (density 5.5) hidden in a long path (density → 1/2):
    # round 0 is the full sparse graph, so the argmax MUST land on a
    # later round whose survivor set is exactly the clique.
    clique = list(range(1000, 1012))
    pairs = [(u, v) for i, u in enumerate(clique) for v in clique[i + 1 :]]
    pairs += [(i, i + 1) for i in range(400)]
    verts, d, rnd = densest_subgraph_run(_df(spark, pairs), epsilon=0.1)
    assert rnd > 0
    assert {r.vertex for r in verts.collect()} == set(clique)
    assert d == pytest.approx(len(clique) - 1, abs=1e-12) or d == 5.5
    tverts, td, trnd = py_densest(pairs, 0.1)
    assert (d, rnd) == (td, trnd) and {r.vertex for r in verts.collect()} == tverts


def test_densest_approximation_guarantee_planted(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=40, num_triangles=25, seed=3)
    )
    pairs = [(r.src, r.dst) for r in edges.collect()]
    opt = exact_densest_density(pairs) if len(pairs) <= 60 else None
    for eps in (0.1, 0.5):
        _, d, _ = densest_subgraph_run(edges, epsilon=eps)
        _, td, _ = py_densest(pairs, eps)
        assert d == td
        if opt is not None:
            assert d >= opt / (2.0 * (1.0 + eps)) - 1e-12


def test_densest_deterministic_across_parallelism(spark):
    pairs = [(i, i + 1) for i in range(60)] + [
        (u, v) for i, u in enumerate(range(500, 508)) for v in range(501 + i, 508)
    ]
    base = _df(spark, pairs)
    got = []
    for nparts in (1, 16):
        verts, d, rnd = densest_subgraph_run(base.repartition(nparts), epsilon=0.1)
        got.append((frozenset(r.vertex for r in verts.collect()), d, rnd))
    assert got[0] == got[1]


def test_densest_empty_and_single_edge(spark):
    empty = _df(spark, []).filter(F.col("src") < 0)
    verts, d, rnd = densest_subgraph_run(empty)
    assert verts.count() == 0 and d == 0.0 and rnd == 0
    one = _df(spark, [(7, 9)])
    verts, d, rnd = densest_subgraph_run(one, epsilon=0.1)
    assert {r.vertex for r in verts.collect()} == {7, 9}
    assert d == 0.5 and rnd == 0
