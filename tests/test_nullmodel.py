"""powerlaw_alpha (CSN MLE) and triangle_significance (configuration-
model expectation): exact Python twins, edge cases, and the golden
graph cross-check."""

from __future__ import annotations

import math
import random
from collections import Counter

from paralleltrianglecounting_spark.operators.nullmodel import (
    powerlaw_alpha,
    triangle_significance,
)

import pytest


def _edges_df(spark, edges):
    return spark.createDataFrame(sorted(edges), "src long, dst long")


def _degrees(edges):
    c = Counter()
    for u, v in edges:
        c[u] += 1
        c[v] += 1
    return c


def _alpha_twin(edges, d_min):
    deg = _degrees(edges)
    tail = [d for d in deg.values() if d >= d_min]
    if not tail:
        return (0, None)
    s = sum(c * math.log(d / (d_min - 0.5)) for d, c in Counter(tail).items())
    n = len(tail)
    return (n, round(1.0 + n / s, 6)) if s > 0 else (n, None)


def _sig_twin(edges):
    deg = _degrees(edges)
    s1 = sum(deg.values())
    s2 = sum(d * (d - 1) for d in deg.values())
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    t = (
        sum(
            len(nbrs[u] & nbrs[v])
            for u, v in edges
        )
        // 3
    )
    r = s2 / s1
    expected = r * r * r / 6.0
    return (t, round(expected, 6), round(t / (r * r * r / 6.0), 6))


def test_alpha_known_star_plus_path(spark):
    # star center degree 6; leaves and path ends degree 1-2
    edges = [(0, i) for i in range(1, 7)] + [(10, 11), (11, 12)]
    df = _edges_df(spark, edges)
    row = powerlaw_alpha(df, d_min=3).collect()[0]
    n, a = _alpha_twin(edges, 3)
    assert (row.d_min, row.n_tail, row.alpha_r) == (3, n, a)
    # only the center is in the tail
    assert row.n_tail == 1


def test_alpha_empty_tail_is_null(spark):
    df = _edges_df(spark, [(1, 2), (2, 3)])
    row = powerlaw_alpha(df, d_min=10).collect()[0]
    assert row.n_tail == 0 and row.alpha_r is None


def test_alpha_validation(spark):
    df = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        powerlaw_alpha(df, d_min=1)


def test_alpha_fuzz_vs_twin(spark):
    rng = random.Random(7)
    verts = list(range(40))
    edges = set()
    while len(edges) < 150:
        u, v = rng.sample(verts, 2)
        edges.add((min(u, v), max(u, v)))
    edges = sorted(edges)
    df = _edges_df(spark, edges)
    for d_min in (3, 7, 12):
        row = powerlaw_alpha(df, d_min=d_min).collect()[0]
        n, a = _alpha_twin(edges, d_min)
        assert (row.n_tail, row.alpha_r) == (n, a), d_min


def test_significance_triangle_graph(spark):
    # one triangle: every vertex degree 2; S1=6, S2=6 -> r=1,
    # E[T]=1/6, ratio = 6
    df = _edges_df(spark, [(1, 2), (1, 3), (2, 3)])
    row = triangle_significance(df).collect()[0]
    assert row.triangles == 1
    assert row.expected_r == round(1 / 6, 6)
    assert row.ratio_r == 6.0


def test_significance_triangle_free_star(spark):
    df = _edges_df(spark, [(0, i) for i in range(1, 6)])
    row = triangle_significance(df).collect()[0]
    assert row.triangles == 0
    assert row.expected_r > 0
    assert row.ratio_r == 0.0


def test_significance_fuzz_vs_twin(spark):
    rng = random.Random(13)
    verts = list(range(30))
    edges = set()
    while len(edges) < 120:
        u, v = rng.sample(verts, 2)
        edges.add((min(u, v), max(u, v)))
    edges = sorted(edges)
    df = _edges_df(spark, edges)
    row = triangle_significance(df).collect()[0]
    assert (row.triangles, row.expected_r, row.ratio_r) == _sig_twin(edges)


def test_significance_golden_graph(spark):
    from paralleltrianglecounting_spark.sources.gfile import read_g_file

    edges = read_g_file(spark, "/root/reference/graph_file/graph_100.g")
    row = triangle_significance(edges).collect()[0]
    assert row.triangles == 373
    # clustered beyond the configuration model's expectation
    assert row.ratio_r == round(373 / row.expected_r, 6) or row.expected_r > 0
