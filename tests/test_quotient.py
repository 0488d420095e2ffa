"""Quotient graph (operators/quotient.py): hand case, brute twin,
unmapped semantics, weighted collapse."""

from __future__ import annotations

import random

from paralleltrianglecounting_spark.operators.quotient import quotient_graph


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_quotient_hand_case(spark):
    edges = _df(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "src long, dst long")
    mapping = _df(
        spark,
        [(1, 10), (2, 10), (3, 20), (4, 20), (5, 30)],
        "vertex long, group long",
    )
    got = {
        (r.src_group, r.dst_group): r.weight
        for r in quotient_graph(edges, mapping).collect()
    }
    # 1-2 intra(10); 1-3, 2-3 cross(10,20); 3-4 intra(20); 4-5 cross(20,30)
    assert got == {(10, 10): 1, (10, 20): 2, (20, 20): 1, (20, 30): 1}


def test_quotient_unmapped_drop_vs_keep(spark):
    edges = _df(spark, [(1, 2), (2, 99)], "src long, dst long")
    mapping = _df(spark, [(1, 10), (2, 10)], "vertex long, group long")
    dropped = quotient_graph(edges, mapping).collect()
    assert {(r.src_group, r.dst_group): r.weight for r in dropped} == {(10, 10): 1}
    kept = {
        (r.src_group, r.dst_group): r.weight
        for r in quotient_graph(edges, mapping, keep_unmapped=True).collect()
    }
    assert kept == {(10, 10): 1, (10, 99): 1}


def test_quotient_weighted_brute_twin(spark):
    rng = random.Random(17)
    edges = [
        (rng.randint(0, 30), rng.randint(0, 30), rng.randint(1, 5))
        for _ in range(200)
    ]
    mapping = [(v, v % 4) for v in range(31)]
    e_df = _df(spark, edges, "src long, dst long, w long")
    m_df = _df(spark, mapping, "vertex long, group long")
    got = {
        (r.src_group, r.dst_group): r.weight
        for r in quotient_graph(e_df, m_df, weight_col="w").collect()
    }
    want: dict = {}
    g = dict(mapping)
    for s, d, w in edges:
        k = (min(g[s], g[d]), max(g[s], g[d]))
        want[k] = want.get(k, 0) + w
    assert got == want
