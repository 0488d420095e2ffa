"""BM25 retrieval and directed PageRank: hand-computed/sequential
twins, mass conservation, dangling handling, ranking invariants."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.pagerank import (
    directed_pagerank,
    pagerank,
)
from paralleltrianglecounting_spark.operators.text import bm25_search
from paralleltrianglecounting_spark.sources.edges import bidirected


# --- BM25 ------------------------------------------------------------------


def py_bm25(texts, queries, k1=1.2, b=0.75):
    """Sequential twin: same formula, same association order."""
    toks = [t.split() for t in texts]
    n = len(texts)
    dls = [len(t) for t in toks]
    avgdl = sum(dls) / n
    df: dict[str, int] = defaultdict(int)
    for t in toks:
        for term in set(t):
            df[term] += 1
    out = {}
    for qi, q in enumerate(queries):
        for di, t in enumerate(toks):
            s = 0.0
            for term in sorted(set(q.split())):
                tf = t.count(term)
                if tf == 0 or term not in df:
                    continue
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dls[di] / avgdl)
                )
            if s > 0:
                out[(qi, di)] = round(s, 6)
    return out


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_matches_twin(spark):
    texts = [
        "fast join fast hash",
        "slow scan table table scan",
        "hash join window agg",
        "the quick brown fox",
        "fast",
    ]
    queries = ["fast hash join", "table scan"]
    got = {
        (r.query_id, r.doc_id): r.score_r
        for r in bm25_search(_docs_df(spark, texts), queries, k=10).collect()
    }
    assert got == pytest.approx(py_bm25(texts, queries), abs=2e-6)


def test_bm25_ranking_and_tiebreak(spark):
    # docs 0 and 1 identical -> identical scores, tie broken by doc_id
    texts = ["alpha beta", "alpha beta", "alpha alpha alpha gamma delta"]
    rows = sorted(
        bm25_search(_docs_df(spark, texts), ["alpha"], k=3).collect(),
        key=lambda r: r.rank,
    )
    # doc 2 (tf=3) outranks despite its length penalty; the identical
    # docs 0/1 tie and break by doc_id
    assert [r.doc_id for r in rows] == [2, 0, 1]
    assert rows[1].score_r == rows[2].score_r


def test_bm25_no_match_and_topk(spark):
    texts = [f"w{i} common" for i in range(6)]
    rows = bm25_search(_docs_df(spark, texts), ["zzz", "common"], k=3).collect()
    assert {r.query_id for r in rows} == {1}
    assert len(rows) == 3 and all(r.rank <= 3 for r in rows)


def test_bm25_empty_queries_raise(spark):
    with pytest.raises(ValueError):
        bm25_search(_docs_df(spark, ["a"]), [])


# --- directed PageRank -----------------------------------------------------


def py_dpr(pairs, d=0.85, iters=8):
    verts = sorted({u for e in pairs for u in e})
    n = len(verts)
    out = defaultdict(list)
    for u, v in sorted(set(pairs)):
        out[u].append(v)
    rank = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        dm = sum(rank[v] for v in verts if v not in out)
        inflow = {v: 0.0 for v in verts}
        for u, vs in out.items():
            for v in vs:
                inflow[v] += rank[u] / len(vs)
        rank = {v: (1.0 - d) / n + d * (inflow[v] + dm / n) for v in verts}
    return rank


def _dg(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "src long, dst long"
    )


def test_dpr_matches_twin_with_dangling(spark):
    # two chains + a fork; 3 dangling sinks
    pairs = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (1, 20)]
    got = {
        r.vertex: r.rank
        for r in directed_pagerank(_dg(spark, pairs), iterations=8).collect()
    }
    want = py_dpr(pairs)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_dpr_mass_conserved(spark):
    import random

    rng = random.Random(5)
    pairs = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    pairs = [(u, v) for u, v in pairs if u != v]
    ranks = directed_pagerank(_dg(spark, pairs), iterations=6).collect()
    assert sum(r.rank for r in ranks) == pytest.approx(1.0, abs=1e-9)
    want = py_dpr(pairs, iters=6)
    for r in ranks:
        assert r.rank == pytest.approx(want[r.vertex], abs=1e-9)


def test_dpr_on_symmetric_digraph_equals_undirected_pagerank(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    und = _dg(spark, pairs)
    sym = bidirected(und)
    dp = {
        r.vertex: r.rank
        for r in directed_pagerank(sym, iterations=6).collect()
    }
    up = {r.vertex: r.rank for r in pagerank(und, iterations=6).collect()}
    assert set(dp) == set(up)
    for v in up:
        assert dp[v] == pytest.approx(up[v], abs=1e-12)


def test_dpr_empty_graph(spark):
    empty = _dg(spark, []).filter(F.col("src") < 0)
    assert directed_pagerank(empty, iterations=3).count() == 0
