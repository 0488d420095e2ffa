"""Item–item cosine over the bipartite incidence: brute twin + cap."""

from __future__ import annotations

import math
import random
from itertools import combinations

from paralleltrianglecounting_spark.operators.bipartite import item_cosine_topk


def _brute(rows, k, cap=None):
    pairs = set(rows)
    if cap is not None:
        from collections import Counter

        sz = Counter(c for c, _ in pairs)
        pairs = {(c, e) for c, e in pairs if sz[c] <= cap}
    cont: dict[int, set[int]] = {}
    for c, e in pairs:
        cont.setdefault(e, set()).add(c)
    out = []
    for u, v in combinations(sorted(cont), 2):
        s = len(cont[u] & cont[v])
        if s:
            out.append(
                (u, v, s, round(s / math.sqrt(len(cont[u]) * len(cont[v])), 6))
            )
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:k]


def _run(spark, rows, k, cap=None):
    df = spark.createDataFrame(rows, "c long, e long")
    return [
        (r["u"], r["v"], r["strength"], r["cosine_r"])
        for r in item_cosine_topk(
            df, "c", "e", k=k, max_container_size=cap
        ).collect()
    ]


def test_matches_brute_force(spark):
    rng = random.Random(0xCE)
    rows = [
        (rng.randint(1, 12), rng.randint(1, 20)) for _ in range(150)
    ]
    assert _run(spark, rows, 30) == _brute(rows, 30)


def test_hub_cap_engages_before_the_join(spark):
    rng = random.Random(5)
    rows = [(99, e) for e in range(1, 15)]  # one hub container
    rows += [(rng.randint(1, 6), rng.randint(1, 10)) for _ in range(40)]
    assert _run(spark, rows, 20, cap=8) == _brute(rows, 20, cap=8)
    # and the capped answer differs from the uncapped one (the cap binds)
    assert _run(spark, rows, 20, cap=8) != _brute(rows, 20)


def test_perfect_overlap_scores_one(spark):
    rows = [(1, 7), (1, 8), (2, 7), (2, 8)]
    got = _run(spark, rows, 5)
    assert got == [(7, 8, 2, 1.0)]
