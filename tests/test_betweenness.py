"""k-source depth-bounded Brandes betweenness vs a sequential oracle.

The contract gate proves value-exactness vs the unrolled DuckDB twin;
these tests pin the semantics against an independent pure-Python
Brandes (level-synchronous, same source set and depth bound), including
the cases the dense gate graph can't exercise: a path graph where the
depth bound *binds*, and the undirected double-count convention.
"""

from __future__ import annotations

import pytest

from paralleltrianglecounting_spark.operators.betweenness import betweenness
from paralleltrianglecounting_spark.sources.edges import part_graph


def py_betweenness(edges, n_sources: int, max_depth: int) -> dict[int, float]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    bc = {v: 0.0 for v in verts}
    for s in verts[:n_sources]:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for d in range(1, max_depth + 1):
            nxt: dict[int, int] = {}
            for v in levels[-1]:
                for w in adj[v]:
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[v]
            for w, c in nxt.items():
                dist[w] = d
                sigma[w] = c
            levels.append(sorted(nxt))
        delta = {v: 0.0 for v in dist}
        for d in range(len(levels) - 1, 0, -1):
            for v in levels[d - 1]:
                for w in adj[v]:
                    if dist.get(w) == d:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        for v, dl in delta.items():
            if v != s:
                bc[v] += dl
    return bc


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _check(spark, pairs, n_sources, max_depth):
    got = {
        r.vertex: r.bc_r
        for r in betweenness(
            _edges_df(spark, pairs), n_sources=n_sources, max_depth=max_depth
        ).collect()
    }
    want = py_betweenness(pairs, n_sources, max_depth)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-7), v
    return got


def test_betweenness_path_graph_depth_bound_binds(spark):
    # path 0-1-2-3-4-5: from source 0 with depth 3, vertices 4,5 are
    # outside the DAG, so 3 gets no downstream dependency from them
    pairs = [(i, i + 1) for i in range(5)]
    bounded = _check(spark, pairs, n_sources=1, max_depth=3)
    full = _check(spark, pairs, n_sources=1, max_depth=5)
    assert bounded[1] < full[1]  # the bound visibly truncates
    # full single-source path: delta(v) = #descendants below v
    assert full[1] == pytest.approx(4.0)
    assert full[4] == pytest.approx(1.0)
    assert bounded[5] == 0.0


def test_betweenness_diamond_splits_dependency(spark):
    # 0-1, 0-2, 1-3, 2-3: two shortest paths 0->3; 1 and 2 each carry
    # sigma ratio 1/2
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _check(spark, pairs, n_sources=1, max_depth=3)
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.5)
    assert got[3] == 0.0


def test_betweenness_matches_oracle_on_cooccurrence_graph(spark, sf_tiny):
    edges = part_graph(spark, sf_tiny)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = {
        r.vertex: r.bc_r
        for r in betweenness(edges, n_sources=6, max_depth=3).collect()
    }
    want = py_betweenness(pairs, n_sources=6, max_depth=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-7), v
    assert max(want.values()) > 0  # non-degenerate


def test_betweenness_rejects_bad_depth(spark):
    with pytest.raises(ValueError, match=">= 1"):
        betweenness(_edges_df(spark, [(0, 1)]), max_depth=0)
