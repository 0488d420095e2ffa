"""SimRank (operators/simrank.py) vs a dense NumPy twin.

The twin implements the identical induced-core iteration: S₀ = I,
S' = C · D⁻¹ A S Aᵀ D⁻¹ with the diagonal re-pinned to 1 — so equality
at 6 dp pins core selection, degree normalization, and the synchronous
update in one check.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from paralleltrianglecounting_spark.operators.simrank import simrank
from paralleltrianglecounting_spark.sources import read_g_file
from tests.conftest import reference_graph


def _numpy_simrank(edges, c, iters, n_core):
    und = set()
    for u, v in edges:
        if u != v:
            und.add((min(u, v), max(u, v)))
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    core = sorted(deg, key=lambda v: (-deg[v], v))[:n_core]
    cset = set(core)
    idx = {v: i for i, v in enumerate(sorted(cset))}
    n = len(idx)
    A = np.zeros((n, n))
    for u, v in und:
        if u in cset and v in cset:
            A[idx[u], idx[v]] = A[idx[v], idx[u]] = 1.0
    d = A.sum(axis=1)
    # vertices with no in-core neighbor never produce contributions
    dinv = np.where(d > 0, 1.0 / np.maximum(d, 1), 0.0)
    S = np.eye(n)
    for _ in range(iters):
        S = c * (dinv[:, None] * (A @ S @ A.T) * dinv[None, :])
        np.fill_diagonal(S, 1.0)
    rid = {i: v for v, i in idx.items()}
    out = {}
    for i in range(n):
        for j in range(n):
            a, b = rid[i], rid[j]
            if a < b and round(S[i, j], 6) >= 1e-6:
                out[(a, b)] = round(S[i, j], 6)
    return out


def test_simrank_matches_numpy_twin(spark):
    path = reference_graph("graph_100")
    e = read_g_file(spark, path)
    got = {
        (r["a"], r["b"]): r["sim_r"]
        for r in simrank(e, c=0.8, iterations=3, n_core=25).collect()
    }
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    want = _numpy_simrank(pairs, c=0.8, iters=3, n_core=25)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) <= 1e-6, (k, got[k], v)


def test_simrank_clique_uniform(spark):
    # K5: by symmetry every off-diagonal pair has the same score, and
    # after one round s = C * (d-1+s_prev_offdiag*(...)) — just pin the
    # uniformity and range
    rows = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = simrank(e, c=0.8, iterations=3, n_core=5).collect()
    assert len(got) == 10
    vals = {r["sim_r"] for r in got}
    assert len(vals) == 1
    v = vals.pop()
    assert 0.0 < v < 1.0


def test_simrank_core_excludes_low_degree(spark):
    # star with 6 leaves plus an isolated edge far from the core:
    # n_core=7 keeps hub+leaves, drops the isolated pair entirely
    rows = [(0, i) for i in range(1, 7)] + [(100, 101)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = simrank(e, c=0.8, iterations=2, n_core=7).collect()
    verts = {r["a"] for r in got} | {r["b"] for r in got}
    assert verts <= set(range(7))
    # all leaf pairs share the hub: identical positive similarity
    leaf_pairs = [r for r in got if r["a"] >= 1 and r["b"] >= 1]
    assert len(leaf_pairs) == 15
    assert len({r["sim_r"] for r in leaf_pairs}) == 1
