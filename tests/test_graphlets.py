"""graphlet_census (operators/graphlets.py) vs exhaustive brute force.

The brute twin enumerates every 3-/4-vertex subset and classifies its
induced graph directly, then derives subgraph (non-induced) counts from
the induced ones via the forward containment matrix — so BOTH output
columns and every Möbius-inversion constant in the operator are pinned
against ground truth on graphs dense enough to exercise all 8 classes.
"""

from __future__ import annotations

from itertools import combinations

import pytest

from paralleltrianglecounting_spark.operators.graphlets import graphlet_census
from paralleltrianglecounting_spark.sources import read_g_file
from tests.conftest import reference_graph


def _brute(n_verts: int, edge_set: set[tuple[int, int]]):
    adj = {v: set() for v in range(n_verts)}
    for u, v in edge_set:
        adj[u].add(v)
        adj[v].add(u)
    verts = [v for v in range(n_verts) if adj[v]] or list(range(n_verts))

    def has(a, b):
        return b in adj[a]

    ind = dict.fromkeys(
        ["wedge", "triangle", "claw", "p4", "paw", "c4", "diamond", "k4"], 0
    )
    for a, b, c in combinations(verts, 3):
        m = has(a, b) + has(a, c) + has(b, c)
        if m == 2:
            ind["wedge"] += 1
        elif m == 3:
            ind["triangle"] += 1
    for quad in combinations(verts, 4):
        es = [(x, y) for x, y in combinations(quad, 2) if has(x, y)]
        m = len(es)
        if m < 3:
            continue
        degs = sorted(
            sum(1 for e in es for x in e if x == v) for v in quad
        )
        if m == 3:
            if degs == [1, 1, 2, 2]:
                ind["p4"] += 1
            elif degs == [1, 1, 1, 3]:
                ind["claw"] += 1
            # [0,2,2,2] = triangle + isolate: not a connected 4-class
        elif m == 4:
            if degs == [2, 2, 2, 2]:
                ind["c4"] += 1
            elif degs == [1, 2, 2, 3]:
                ind["paw"] += 1
        elif m == 5:
            ind["diamond"] += 1
        elif m == 6:
            ind["k4"] += 1
    # forward containment matrix: subgraph counts from induced counts
    sub = {
        "wedge": ind["wedge"] + 3 * ind["triangle"],
        "triangle": ind["triangle"],
        "claw": ind["claw"] + ind["paw"] + 2 * ind["diamond"] + 4 * ind["k4"],
        "p4": ind["p4"]
        + 2 * ind["paw"]
        + 4 * ind["c4"]
        + 6 * ind["diamond"]
        + 12 * ind["k4"],
        "paw": ind["paw"] + 4 * ind["diamond"] + 12 * ind["k4"],
        "c4": ind["c4"] + ind["diamond"] + 3 * ind["k4"],
        "diamond": ind["diamond"] + 6 * ind["k4"],
        "k4": ind["k4"],
    }
    return sub, ind


def _check(spark, n_verts, edge_set):
    e = spark.createDataFrame(sorted(edge_set), "src long, dst long")
    got = {
        r["graphlet"]: (r["n_subgraphs"], r["n_induced"])
        for r in graphlet_census(e).collect()
    }
    sub, ind = _brute(n_verts, edge_set)
    for g in sub:
        assert got[g] == (sub[g], ind[g]), (g, got[g], (sub[g], ind[g]))


def test_hand_fixtures(spark):
    # K4 alone: every class derivable from it
    k4 = {(a, b) for a, b in combinations(range(4), 2)}
    _check(spark, 4, k4)
    # diamond
    _check(spark, 4, {(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)})
    # paw
    _check(spark, 4, {(0, 1), (0, 2), (1, 2), (0, 3)})
    # c4
    _check(spark, 4, {(0, 1), (1, 2), (2, 3), (0, 3)})
    # claw + path
    _check(spark, 5, {(0, 1), (0, 2), (0, 3), (3, 4)})


def test_pseudorandom_graph_matches_brute_force(spark):
    # deterministic dense-ish 40-vertex graph: all 8 classes populated
    n = 40
    edge_set = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if (i * j + i + j) % 9 < 2
    }
    sub, ind = _brute(n, edge_set)
    assert all(v > 0 for v in ind.values()), ind  # every class exercised
    _check(spark, n, edge_set)


def test_reference_graph_100(spark):
    path = reference_graph("graph_100")
    e = read_g_file(spark, path)
    pairs = {(r["src"], r["dst"]) for r in e.collect()}
    n = max(max(p) for p in pairs) + 1
    got = {
        r["graphlet"]: (r["n_subgraphs"], r["n_induced"])
        for r in graphlet_census(e).collect()
    }
    sub, ind = _brute(n, pairs)
    assert got["triangle"] == (373, 373)
    for g in sub:
        assert got[g] == (sub[g], ind[g]), g


# --- quantized_recall (operators/similarity.py) -----------------------------


def test_quantized_recall_high_and_bounded(spark):
    import pyspark.sql.functions as F

    from paralleltrianglecounting_spark.operators.similarity import (
        dequantized_embeddings,
        quantized_recall,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = quantized_recall(emb, k=5, n_queries=20).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_q_hits"] <= 5
    # int8 symmetric quantization barely perturbs cosine: recall@5
    # should be near-perfect on 64-dim vectors (quantization SNR ~48dB)
    total = sum(r["n_q_hits"] for r in rows) / sum(r["n_exact"] for r in rows)
    assert total >= 0.9, total
    # reconstruction sanity: dequantized vectors are within scale/2
    # of the original per component
    d = dequantized_embeddings(emb).withColumnRenamed("embedding", "dq")
    j = emb.select("vec_id", "embedding").join(d, "vec_id")
    bad = j.where(
        F.exists(
            F.zip_with(
                F.col("embedding"),
                F.col("dq"),
                lambda a, b: F.abs(a.cast("double") - b)
                > F.array_max(
                    F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
                )
                / 254.0 + F.lit(1e-12),
            ),
            lambda x: x,
        )
    ).count()
    assert bad == 0
