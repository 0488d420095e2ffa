"""Jones–Plassmann greedy coloring: exact agreement with a sequential
twin, proper-coloring invariant on the dense co-occurrence graph (where
the SQL gate can't go — round count ≈ Δ), determinism across
parallelism, and gate-unroll sufficiency on the chain graph."""

from __future__ import annotations

import hashlib

import pytest

from paralleltrianglecounting_spark.operators.coloring import (
    coloring_run,
    greedy_coloring,
)
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph


def _h(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:14], 16)


def py_jp(pairs):
    """Sequential twin of the deterministic Jones–Plassmann rounds."""
    adj: dict[int, set] = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    color: dict[int, int] = {}
    live = set(adj)
    while live:
        winners = {
            v for v in live if all((_h(v), v) < (_h(u), u) for u in adj[v] & live)
        }
        assert winners
        for v in winners:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        live -= winners
    return color


def test_coloring_equals_sequential_twin_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = {r.vertex: r.color for r in greedy_coloring(edges).collect()}
    assert got == py_jp(pairs)


def test_coloring_proper_on_dense_planted(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=120, num_triangles=150, seed=31)
    )
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = {r.vertex: r.color for r in greedy_coloring(edges).collect()}
    verts = {v for e in pairs for v in e}
    assert set(got) == verts
    assert all(c >= 0 for c in got.values())
    for u, v in pairs:
        assert got[u] != got[v], f"edge ({u},{v}) monochromatic"


def test_coloring_deterministic_across_parallelism(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=80, num_triangles=60, seed=37)
    )
    one = {(r.vertex, r.color)
           for r in greedy_coloring(edges.repartition(1)).collect()}
    many = {(r.vertex, r.color)
            for r in greedy_coloring(edges.repartition(16)).collect()}
    assert one == many


def test_coloring_max_rounds_raises(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(RuntimeError):
        greedy_coloring(edges, max_rounds=0)


def test_coloring_gate_unroll_sufficient(spark, sf_tiny):
    import __spark_entry__ as entry
    from paralleltrianglecounting_spark.sources.edges import order_chain_graph

    res = coloring_run(order_chain_graph(spark, sf_tiny))
    assert res.converged
    assert res.iterations <= entry.COLORING_UNROLL
