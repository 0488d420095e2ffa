"""K4 (4-clique) counting: golden small graphs, brute-force oracle
agreement on the reference corpus and planted graphs, and degeneracy
edge cases."""

from __future__ import annotations

import itertools

from paralleltrianglecounting_spark.operators.cliques import k4_count
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph
from tests.oracles import k4_count_brute


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _run(spark, edges):
    return k4_count(_df(spark, edges)).collect()[0]["k4_count"]


def test_k4_golden_small(spark):
    k4 = list(itertools.combinations(range(4), 2))
    k5 = list(itertools.combinations(range(5), 2))
    k6 = list(itertools.combinations(range(6), 2))
    assert _run(spark, k4) == 1
    assert _run(spark, k5) == 5          # C(5,4)
    assert _run(spark, k6) == 15         # C(6,4)
    # K4 + pendant vertex, + a triangle sharing an edge: still 1
    assert _run(spark, k4 + [(3, 9), (0, 7), (1, 7)]) == 1
    # triangle only / empty: 0
    assert _run(spark, [(0, 1), (1, 2), (0, 2)]) == 0
    assert k4_count(
        spark.createDataFrame([], "src long, dst long")
    ).collect()[0]["k4_count"] == 0


def test_k4_brute_oracle_reference_graph(spark):
    path = reference_graph("graph_100")
    edges = read_g_file(spark, path)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    assert k4_count(edges).collect()[0]["k4_count"] == k4_count_brute(pairs)


def test_k4_brute_oracle_planted(spark):
    edges = canonicalize_edges(planted_triangles(spark, num_nodes=80, num_triangles=60, seed=7))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = k4_count(edges).collect()[0]["k4_count"]
    assert got == k4_count_brute(pairs)


def test_k4_relabel_invariance(spark):
    k5 = list(itertools.combinations(range(5), 2))
    shifted = [(u * 1_000_003 + 17, v * 1_000_003 + 17) for u, v in k5]
    assert _run(spark, [(min(u, v), max(u, v)) for u, v in shifted]) == 5


def test_kclique_general(spark):
    from paralleltrianglecounting_spark.operators.cliques import kclique_count
    from paralleltrianglecounting_spark.operators.triangles import triangle_count

    k6 = list(itertools.combinations(range(6), 2))
    # K6 has C(6,k) k-cliques
    for k, want in [(3, 20), (4, 15), (5, 6), (6, 1)]:
        got = kclique_count(_df(spark, k6), k).collect()[0][f"k{k}_count"]
        assert got == want, (k, got)
    # k=3 agrees with the triangle kernel on a nontrivial graph
    path = reference_graph("graph_100")
    edges = read_g_file(spark, path)
    assert (
        kclique_count(edges, 3).collect()[0]["k3_count"]
        == triangle_count(edges).collect()[0]["triangles"]
        == 373
    )


def test_kclique_k5_brute_oracle(spark):
    from paralleltrianglecounting_spark.operators.cliques import kclique_count
    from tests.oracles import kclique_count_brute

    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=60, num_triangles=80, seed=11)
    )
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got5 = kclique_count(edges, 5).collect()[0]["k5_count"]
    assert got5 == kclique_count_brute(pairs, 5)
    got6 = kclique_count(edges, 6).collect()[0]["k6_count"]
    assert got6 == kclique_count_brute(pairs, 6)


def test_kclique_rejects_small_k(spark):
    import pytest

    from paralleltrianglecounting_spark.operators.cliques import kclique_count

    with pytest.raises(ValueError):
        kclique_count(_df(spark, [(0, 1)]), 2)
