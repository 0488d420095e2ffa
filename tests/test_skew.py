"""Skew mitigation: salted joins must be row-identical to plain joins,
and salted PageRank must match unsalted PageRank on a hub-heavy graph.

The hub fixture is the graph shape that motivates salting (north_star:
"salted joins for high-degree skew vertices"): one vertex adjacent to
every other — the co-occurrence analog of a README-like path shared by
every repo. The reference's OpenMP flat-scaling result
(test/parallel_edge_it_openmp_test/graph_10k/*.png) is the cautionary
baseline for unbalanced skewed work.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import degrees
from paralleltrianglecounting_spark.operators.pagerank import pagerank
from paralleltrianglecounting_spark.operators.skew import (
    hot_keys_by_count,
    hot_vertices_by_degree,
    salted_join,
)

N_LEAVES = 200


@pytest.fixture(scope="module")
def hub_edges(spark):
    """Hub 0 — leaves 1..N, plus a leaf ring so leaves have degree 3 and
    the graph carries triangles (hub-leaf-leaf via ring edges)."""
    hub = [(0, i) for i in range(1, N_LEAVES + 1)]
    ring = [
        (min(i, i % N_LEAVES + 1), max(i, i % N_LEAVES + 1))
        for i in range(1, N_LEAVES + 1)
    ]
    df = spark.createDataFrame(sorted(set(hub + ring)), "src long, dst long")
    return df.persist()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hot_key_detection(spark, hub_edges):
    from paralleltrianglecounting_spark.sources.edges import bidirected

    bidir = bidirected(hub_edges)
    hot = hot_keys_by_count(bidir, "src", threshold=10)
    assert _rows(hot) == [(0,)]

    deg = degrees(hub_edges)
    hot_d = hot_vertices_by_degree(deg, threshold=10)
    assert _rows(hot_d) == [(0,)]
    # threshold above the hub's degree -> empty hot set
    assert hot_vertices_by_degree(deg, threshold=N_LEAVES + 1).count() == 0


def test_salted_join_equals_plain_join(spark, hub_edges):
    from paralleltrianglecounting_spark.sources.edges import bidirected

    large = bidirected(hub_edges)
    small = degrees(hub_edges).withColumnRenamed("vertex", "src")
    hot = hot_keys_by_count(large, "src", threshold=10)

    plain = large.join(small, "src")
    salted = salted_join(large, small, "src", hot, n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_join_multirow_small_side(spark):
    """Correctness must hold when the build side has several rows per
    key (general inner-join semantics, not just dimension lookup)."""
    large = spark.createDataFrame(
        [(k, i) for k in (1, 1, 1, 1, 1, 2, 3) for i in range(3)], "k long, a long"
    )
    small = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k long, b string")
    hot = spark.createDataFrame([(1,)], "k long")
    plain = large.join(small, "k")
    salted = salted_join(large, small, "k", hot, n_salts=4)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_join_empty_hot_set(spark, hub_edges):
    from paralleltrianglecounting_spark.sources.edges import bidirected

    large = bidirected(hub_edges)
    small = degrees(hub_edges).withColumnRenamed("vertex", "src")
    hot = spark.createDataFrame([], "src long")
    plain = large.join(small, "src")
    salted = salted_join(large, small, "src", hot, n_salts=8)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_pagerank_salted_matches_unsalted(spark, hub_edges):
    plain = {r["vertex"]: r["rank"] for r in pagerank(hub_edges, iterations=5).collect()}
    salted = {
        r["vertex"]: r["rank"]
        for r in pagerank(hub_edges, iterations=5, hub_threshold=10, n_salts=8).collect()
    }
    assert set(plain) == set(salted)
    for v, r in plain.items():
        assert salted[v] == pytest.approx(r, abs=1e-12)
    # hub holds the dominant rank
    assert plain[0] == max(plain.values())


def test_salted_plan_has_no_python_eval(spark, hub_edges):
    """The salt path is pure DataFrame ops — the no-per-row-Python ban
    (BASELINE.json input_hint) must hold through the salted plan."""
    from paralleltrianglecounting_spark.plans.lint import assert_no_scalar_python

    pr = pagerank(hub_edges, iterations=2, hub_threshold=10, n_salts=8)
    assert_no_scalar_python(pr)


def test_personalized_pagerank_salted_matches_unsalted(spark, hub_edges):
    """VERDICT r03 #4: PPR with the hub-salted message join must be
    value-identical to the plain join (same contract as pagerank's
    salted twin — the gate rounds to 6 dp, the test holds 1e-12)."""
    from paralleltrianglecounting_spark.operators.pagerank import (
        personalized_pagerank,
    )

    seeds = [0, 1]
    plain = {
        r["vertex"]: r["rank"]
        for r in personalized_pagerank(hub_edges, seeds, iterations=5).collect()
    }
    salted = {
        r["vertex"]: r["rank"]
        for r in personalized_pagerank(
            hub_edges, seeds, iterations=5, hub_threshold=10, n_salts=8
        ).collect()
    }
    assert set(plain) == set(salted)
    for v, r in plain.items():
        assert salted[v] == pytest.approx(r, abs=1e-12)
    # the hub seed dominates a personalized walk
    assert plain[0] == max(plain.values())
