"""Eigenvector centrality (exact integer power iteration) and the
rich-club coefficient: NumPy / brute-force twins, the normalize-each
equivalence, the 2^53 exactness guard, and degenerate thresholds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import rich_club
from paralleltrianglecounting_spark.operators.eigenvector import (
    eigenvector_centrality,
)
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from tests.conftest import reference_graph
from tests.oracles import relabel


def _numpy_walks(pairs, iterations):
    """x_k = A^k · 1 — exact integer walk counts."""
    arr, n = relabel(pairs)
    A = np.zeros((n, n), dtype=object)  # Python ints: no overflow, exact
    A[arr[:, 0], arr[:, 1]] = 1
    A[arr[:, 1], arr[:, 0]] = 1
    x = np.ones(n, dtype=object)
    for _ in range(iterations):
        x = A @ x
    return A, x


def test_eigenvector_matches_numpy_walks(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    ids = sorted({v for e in pairs for v in e})
    _, x = _numpy_walks(pairs, 5)
    want = {ids[i]: int(x[i]) for i in range(len(ids))}
    total = float(sum(want.values()))
    got = {r.vertex: (r.walks, r.score_r) for r in
           eigenvector_centrality(edges, iterations=5).collect()}
    assert set(got) == set(want)
    for v, (walks, score) in got.items():
        assert walks == float(want[v])
        assert score == pytest.approx(want[v] / total, abs=1e-6)


def test_eigenvector_normalize_each_same_direction(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    exact = {r.vertex: r.score_r for r in
             eigenvector_centrality(edges, iterations=5).collect()}
    stepped = {r.vertex: r.score_r for r in
               eigenvector_centrality(edges, iterations=5,
                                      normalize_each=True).collect()}
    assert set(exact) == set(stepped)
    for v in exact:
        assert stepped[v] == pytest.approx(exact[v], abs=1e-6)


def test_eigenvector_overflow_guard_raises(spark):
    # K10: walk counts grow as 9^k, crossing 2^53 before k=18
    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    with pytest.raises(RuntimeError, match="2\\^53"):
        eigenvector_centrality(edges, iterations=20)
    # ...while normalize_each handles the same depth fine
    out = eigenvector_centrality(edges, iterations=20, normalize_each=True)
    scores = [r.score_r for r in out.collect()]
    assert all(s == pytest.approx(0.1, abs=1e-6) for s in scores)


def _brute_rich_club(pairs, ks):
    deg: dict[int, int] = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    out = {}
    for k in ks:
        rich = {v for v, d in deg.items() if d > k}
        e = sum(1 for u, v in pairs if u in rich and v in rich)
        n = len(rich)
        out[k] = (n, e, round(2.0 * e / (n * (n - 1)), 6) if n >= 2 else None)
    return out


def test_rich_club_matches_brute(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    ks = [2, 4, 8, 16]
    want = _brute_rich_club(pairs, ks)
    got = {r.k: (r.n_rich, r.e_rich, r.phi_r) for r in
           rich_club(edges, ks).collect()}
    assert got == want


def test_rich_club_empty_threshold_is_null(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = {r.k: r for r in rich_club(edges, [1, 99]).collect()}
    # k=1: only vertex 1 has degree 2 > 1 -> n_rich=1, phi NULL
    assert (rows[1].n_rich, rows[1].e_rich, rows[1].phi_r) == (1, 0, None)
    assert (rows[99].n_rich, rows[99].e_rich, rows[99].phi_r) == (0, 0, None)


def _py_katz(pairs, alpha, iterations):
    """Twin of katz_centrality: exact integer walks, float acc in the
    engine's association order (acc_k = acc_{k-1} + x_k * alpha**k)."""
    arr, n = relabel(pairs)
    A = np.zeros((n, n), dtype=object)
    A[arr[:, 0], arr[:, 1]] = 1
    A[arr[:, 1], arr[:, 0]] = 1
    x = np.ones(n, dtype=object)
    acc = [0.0] * n
    for k in range(1, iterations + 1):
        x = A @ x
        a_k = alpha**k
        for i in range(n):
            acc[i] = acc[i] + float(x[i]) * a_k
    return x, acc


def test_katz_matches_python_twin(spark):
    from paralleltrianglecounting_spark.operators.eigenvector import (
        katz_centrality,
    )

    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    ids = sorted({v for e in pairs for v in e})
    x, acc = _py_katz(pairs, 0.05, 4)
    got = {r.vertex: (r.walks, r.score_r) for r in
           katz_centrality(edges, alpha=0.05, iterations=4).collect()}
    assert set(got) == set(ids)
    import math

    def half_up(val, dp=6):  # Spark/DuckDB round() is HALF_UP, not banker's
        s = -1.0 if val < 0 else 1.0
        return s * math.floor(abs(val) * 10**dp + 0.5) / 10**dp

    for i, v in enumerate(ids):
        assert got[v][0] == float(x[i])
        # the engine rounds the bit-identical double at 6 dp
        assert got[v][1] == half_up(acc[i])


def test_katz_one_hop_is_scaled_degree(spark):
    from paralleltrianglecounting_spark.operators.eigenvector import (
        katz_centrality,
    )

    # path 0-1-2: walks_1 = degree, so K=1 katz = alpha * degree
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.vertex: (r.walks, r.score_r) for r in
           katz_centrality(edges, alpha=0.1, iterations=1).collect()}
    assert got == {0: (1.0, 0.1), 1: (2.0, 0.2), 2: (1.0, 0.1)}


def test_katz_overflow_guard_and_validation(spark):
    from paralleltrianglecounting_spark.operators.eigenvector import (
        katz_centrality,
    )

    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    with pytest.raises(RuntimeError, match="2\\^53"):
        katz_centrality(edges, alpha=0.05, iterations=20)
    with pytest.raises(ValueError, match="alpha"):
        katz_centrality(edges, alpha=1.5)
    with pytest.raises(ValueError, match="iterations"):
        katz_centrality(edges, iterations=0)


def test_katz_deterministic_across_parallelism(spark):
    from paralleltrianglecounting_spark.operators.eigenvector import (
        katz_centrality,
    )

    edges = read_g_file(spark, reference_graph("graph_100"))
    one = {(r.vertex, r.walks, r.score_r) for r in
           katz_centrality(edges.coalesce(1), iterations=3).collect()}
    many = {(r.vertex, r.walks, r.score_r) for r in
            katz_centrality(edges.repartition(16), iterations=3).collect()}
    assert one == many
