"""transitivity (global clustering) and local_bridges: brute twins."""

from __future__ import annotations

import itertools
import random

from paralleltrianglecounting_spark.operators.triangles import (
    local_bridges,
    transitivity,
)


def _brute(edges):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = sum(
        1
        for x, y, z in itertools.combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    bridges = {
        (a, b, len(adj[a]), len(adj[b]))
        for a, b in es
        if not (adj[a] & adj[b])
    }
    return wedges, tris, bridges


def _df(spark, edges):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "src long, dst long"
    )


def test_transitivity_triangle_plus_pendant(spark):
    # triangle 1-2-3 with pendant 4 on vertex 3: W = 1+1+3 = 5, T = 1
    row = transitivity(_df(spark, {(1, 2), (2, 3), (1, 3), (3, 4)})).collect()[0]
    assert (row["wedges"], row["triangles"]) == (5, 1)
    assert row["transitivity_r"] == round(3.0 * 1 / 5, 6)


def test_transitivity_complete_graph_is_one(spark):
    k5 = set(itertools.combinations(range(1, 6), 2))
    row = transitivity(_df(spark, k5)).collect()[0]
    assert row["transitivity_r"] == 1.0


def test_transitivity_triangle_free(spark):
    row = transitivity(_df(spark, {(1, 2), (2, 3), (3, 4)})).collect()[0]
    assert row["triangles"] == 0 and row["transitivity_r"] == 0.0


def test_local_bridges_fixture(spark):
    # 1-2-3 triangle (no bridges inside), bridge 3-4, bridge 4-5
    got = {
        (r["u"], r["v"], r["deg_u"], r["deg_v"])
        for r in local_bridges(
            _df(spark, {(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)})
        ).collect()
    }
    assert got == {(3, 4, 3, 2), (4, 5, 2, 1)}


def test_fuzz_vs_brute(spark):
    rng = random.Random(11)
    for trial in range(4):
        edges = {
            (a, b)
            for a, b in itertools.combinations(range(1, 19), 2)
            if rng.random() < 0.2
        }
        if not edges:
            continue
        wedges, tris, bridges = _brute(edges)
        row = transitivity(_df(spark, edges)).collect()[0]
        assert (row["wedges"], row["triangles"]) == (wedges, tris), f"trial {trial}"
        want_r = round(3.0 * tris / wedges, 6) if wedges else 0.0
        assert row["transitivity_r"] == want_r
        got = {
            (r["u"], r["v"], r["deg_u"], r["deg_v"])
            for r in local_bridges(_df(spark, edges)).collect()
        }
        assert got == bridges, f"trial {trial}"
