"""Clique-percolation (CPM k=3): brute union-find twin, overlap
semantics, portable community ids, star-reduction equivalence."""

from __future__ import annotations

import hashlib
import itertools
import random

from paralleltrianglecounting_spark.operators.percolation import clique_percolation


def _hash56_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _cpm_py(edges: set[tuple[int, int]]) -> dict[int, set[frozenset[int]]]:
    """Brute CPM twin: triangles via itertools, union-find over
    edge-sharing, returns {community_id(min tri-hash): vertex set}."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = [
        (x, y, z)
        for x, y, z in itertools.combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    ]
    parent = {t: t for t in tris}

    def find(t):
        while parent[t] != t:
            parent[t] = parent[parent[t]]
            t = parent[t]
        return t

    by_edge: dict[tuple[int, int], list] = {}
    for t in tris:
        x, y, z = t
        for e in ((x, y), (x, z), (y, z)):
            by_edge.setdefault(e, []).append(t)
    for group in by_edge.values():
        for t in group[1:]:
            ra, rb = find(group[0]), find(t)
            if ra != rb:
                parent[rb] = ra
    comms: dict = {}
    for t in tris:
        comms.setdefault(find(t), []).append(t)
    out = {}
    for members in comms.values():
        cid = min(_hash56_py(f"{x}:{y}:{z}") for x, y, z in members)
        out[cid] = {v for t in members for v in t}
    return out


def _run(spark, edges):
    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "src long, dst long"
    )
    rows = clique_percolation(df).collect()
    got: dict[int, set[int]] = {}
    sizes: dict[int, int] = {}
    for r in rows:
        got.setdefault(r["community"], set()).add(r["vertex"])
        sizes[r["community"]] = r["n_members"]
    for cid, vs in got.items():
        assert sizes[cid] == len(vs)
    return got


def test_two_triangles_sharing_edge_merge(spark):
    got = _run(spark, {(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)})
    assert len(got) == 1
    assert set(got.values().__iter__().__next__()) == {1, 2, 3, 4}


def test_two_triangles_sharing_vertex_stay_apart(spark):
    got = _run(spark, {(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)})
    assert len(got) == 2
    assert sorted(sorted(v) for v in got.values()) == [[1, 2, 3], [3, 4, 5]]
    # vertex 3 overlaps: one membership row per community
    memberships = [vs for vs in got.values() if 3 in vs]
    assert len(memberships) == 2


def test_isolated_triangle_and_triangle_free_vertices(spark):
    # path 10-11-12 has no triangle: contributes nothing
    got = _run(spark, {(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)})
    assert len(got) == 1
    assert list(got.values()) == [{1, 2, 3}]
    cid = next(iter(got))
    assert cid == _hash56_py("1:2:3")


def test_community_id_is_min_triangle_hash(spark):
    got = _run(spark, {(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)})
    cid = next(iter(got))
    assert cid == min(_hash56_py("1:2:3"), _hash56_py("2:3:4"))


def test_fuzz_vs_union_find_twin(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = 20
        edges = {
            (a, b)
            for a, b in itertools.combinations(range(1, n + 1), 2)
            if rng.random() < 0.22
        }
        want = _cpm_py(edges)
        got = _run(spark, edges)
        assert {k: frozenset(v) for k, v in got.items()} == {
            k: frozenset(v) for k, v in want.items()
        }, f"trial {trial}"


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert clique_percolation(df).count() == 0
