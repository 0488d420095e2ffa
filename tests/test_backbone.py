"""Backbone (weight-threshold percolation) profile: union-find twin."""

from __future__ import annotations

import random

from paralleltrianglecounting_spark.operators.components import backbone_profile


def _twin(wedges, thresholds):
    out = []
    for t in thresholds:
        kept = {(u, v) for (u, v), w in wedges.items() if w >= t}
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        verts = {x for e in kept for x in e}
        for x in verts:
            parent[x] = x
        for u, v in kept:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        from collections import Counter

        sizes = Counter(find(x) for x in verts)
        out.append(
            (
                t,
                len(kept),
                len(verts),
                len(sizes),
                max(sizes.values()) if sizes else 0,
            )
        )
    return out


def test_matches_union_find_twin(spark):
    rng = random.Random(0xBB)
    wedges = {}
    for _ in range(120):
        u, v = rng.randint(1, 30), rng.randint(1, 30)
        if u == v:
            continue
        u, v = min(u, v), max(u, v)
        wedges[(u, v)] = rng.randint(1, 4)
    df = spark.createDataFrame(
        [(u, v, w) for (u, v), w in wedges.items()],
        "src long, dst long, weight long",
    )
    got = [
        (r["threshold"], r["kept_edges"], r["n_vertices"], r["components"], r["largest_cc"])
        for r in backbone_profile(df, thresholds=(1, 2, 3, 4)).collect()
    ]
    assert got == _twin(wedges, (1, 2, 3, 4))


def test_monotone_dissolution(spark):
    # raising the bar can only shrink everything
    rng = random.Random(2)
    rows = [
        (rng.randint(1, 20), rng.randint(21, 40), rng.randint(1, 3))
        for _ in range(80)
    ]
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    prof = backbone_profile(df, thresholds=(1, 2, 3)).collect()
    for a, b in zip(prof, prof[1:]):
        assert b["kept_edges"] <= a["kept_edges"]
        assert b["n_vertices"] <= a["n_vertices"]
        assert b["largest_cc"] <= a["largest_cc"]


def test_empty_level_keeps_row(spark):
    df = spark.createDataFrame([(1, 2, 1)], "src long, dst long, weight long")
    prof = {
        r["threshold"]: (r["kept_edges"], r["n_vertices"], r["components"], r["largest_cc"])
        for r in backbone_profile(df, thresholds=(1, 5)).collect()
    }
    assert prof[1] == (1, 2, 1, 2)
    assert prof[5] == (0, 0, 0, 0)
