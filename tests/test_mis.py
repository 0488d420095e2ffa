"""Luby maximal independent set: exact agreement with a sequential
twin, independence/maximality invariants, determinism across
parallelism, checkpoint/resume, and gate-unroll sufficiency."""

from __future__ import annotations

import hashlib

import pytest

from paralleltrianglecounting_spark.operators.mis import (
    maximal_independent_set,
    mis_run,
)
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph


def _h(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:14], 16)


def py_mis(pairs):
    """Sequential twin of the deterministic Luby rounds."""
    adj: dict[int, set] = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    live = set(adj)
    out: dict[int, int] = {}
    rnd = 0
    while live:
        rnd += 1
        new = {
            v
            for v in live
            if all((_h(v), v) < (_h(u), u) for u in adj[v] & live)
        }
        assert new, "the min-ranked live vertex always joins"
        for v in new:
            out[v] = rnd
        excl = {u for v in new for u in adj[v] & live}
        live -= new | excl
    return out


def test_mis_equals_sequential_twin_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = {(r.vertex, r.mround) for r in maximal_independent_set(edges).collect()}
    assert got == set(py_mis(pairs).items())


def test_mis_invariants_planted(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=150, num_triangles=120, seed=17)
    )
    pairs = [(r.src, r.dst) for r in edges.collect()]
    mis = {r.vertex for r in maximal_independent_set(edges).collect()}
    adj: dict[int, set] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # independence: no two members adjacent
    for u, v in pairs:
        assert not (u in mis and v in mis)
    # maximality: every non-member has a member neighbor
    for v in adj:
        if v not in mis:
            assert adj[v] & mis, f"{v} could be added — not maximal"


def test_mis_deterministic_across_parallelism(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=90, num_triangles=70, seed=23)
    )
    one = {(r.vertex, r.mround)
           for r in maximal_independent_set(edges.repartition(1)).collect()}
    many = {(r.vertex, r.mround)
            for r in maximal_independent_set(edges.repartition(16)).collect()}
    assert one == many


def test_mis_max_rounds_raises(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(RuntimeError):
        maximal_independent_set(edges, max_rounds=0)


def test_mis_checkpoint_resume(spark, tmp_path):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=60, num_triangles=40, seed=29)
    )
    ck = str(tmp_path / "mis")
    full = mis_run(edges, checkpoint_dir=ck)
    assert full.converged
    want = sorted((r.v, r.mround) for r in full.state.collect())
    again = mis_run(edges, checkpoint_dir=ck)
    assert sorted((r.v, r.mround) for r in again.state.collect()) == want


def test_mis_gate_unroll_sufficient(spark, sf_tiny):
    import __spark_entry__ as entry
    from paralleltrianglecounting_spark.sources.edges import part_graph

    res = mis_run(part_graph(spark, sf_tiny))
    assert res.converged
    assert res.iterations <= entry.MIS_UNROLL
