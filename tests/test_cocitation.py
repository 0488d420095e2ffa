"""Co-citation / bibliographic coupling: brute-force twin, direction
semantics, validation."""

from __future__ import annotations

from collections import Counter

import pytest

from paralleltrianglecounting_spark.operators.linkpred import co_citation_topk


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _twin(edges, mode):
    cnt: Counter = Counter()
    key = (lambda e: (e[0], e[1])) if mode == "cocitation" else (
        lambda e: (e[1], e[0])
    )
    groups: dict[int, list[int]] = {}
    for e in edges:
        z, n = key(e)
        groups.setdefault(z, []).append(n)
    for ns in groups.values():
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                cnt[(ns[i], ns[j])] += 1
    return cnt


def test_cocitation_hand_case(spark):
    # 1 cites {2,3}; 4 cites {2,3}; 5 cites {3}
    edges = [(1, 2), (1, 3), (4, 2), (4, 3), (5, 3)]
    got = {(r.u, r.v): r.strength for r in co_citation_topk(_df(spark, edges), k=10).collect()}
    assert got == {(2, 3): 2}
    # coupling: pairs of CITING pages sharing a target
    got = {
        (r.u, r.v): r.strength
        for r in co_citation_topk(_df(spark, edges), k=10, mode="coupling").collect()
    }
    assert got == {(1, 4): 2, (1, 5): 1, (4, 5): 1}


def test_cocitation_twin_random(spark):
    import random

    rng = random.Random(11)
    edges = [
        (u, v)
        for u, v in {(rng.randrange(25), rng.randrange(25)) for _ in range(120)}
        if u != v
    ]
    for mode in ("cocitation", "coupling"):
        twin = _twin(edges, mode)
        want = sorted(
            ((c, u, v) for (u, v), c in twin.items()),
            key=lambda t: (-t[0], t[1], t[2]),
        )[:30]
        got = [
            (r.strength, r.u, r.v)
            for r in co_citation_topk(_df(spark, edges), k=30, mode=mode).collect()
        ]
        assert sorted(got, key=lambda t: (-t[0], t[1], t[2])) == want
    with pytest.raises(ValueError):
        co_citation_topk(_df(spark, edges), mode="nope")
