"""Incremental triangle maintenance: exact agreement with full-recount
difference on golden and planted graphs, all three inclusion–exclusion
categories exercised."""

from __future__ import annotations

from paralleltrianglecounting_spark.operators.delta import triangle_count_delta
from paralleltrianglecounting_spark.operators.triangles import triangle_count
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _delta(spark, base, delta):
    return triangle_count_delta(_df(spark, base), _df(spark, delta)).collect()[
        0
    ]["new_triangles"]


def test_delta_categories_golden(spark):
    # k=1: base path 0-1-2, delta closes it
    assert _delta(spark, [(0, 1), (1, 2)], [(0, 2)]) == 1
    # k=2: base edge 0-1, delta edges 1-2 and 0-2
    assert _delta(spark, [(0, 1)], [(1, 2), (0, 2)]) == 1
    # k=3: all-delta triangle on an empty-ish base
    assert _delta(spark, [(7, 8)], [(0, 1), (1, 2), (0, 2)]) == 1
    # mixed: K4 completed from a base path — new triangles = C(4,3)=4,
    # base had none
    base = [(0, 1), (1, 2), (2, 3)]
    delta = [(0, 2), (0, 3), (1, 3)]
    assert _delta(spark, base, delta) == 4
    # existing delta edges are dropped: re-adding base edges adds nothing
    assert _delta(spark, [(0, 1), (1, 2), (0, 2)], [(0, 1)]) == 0
    # empty delta
    assert _delta(spark, [(0, 1), (1, 2), (0, 2)], []) == 0


def test_delta_equals_full_recount_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    # deterministic ~10% split on (src + 3*dst) % 10
    from pyspark.sql import functions as F

    cond = (F.col("src") + 3 * F.col("dst")) % 10 == 0
    base, delta = edges.where(~cond), edges.where(cond)
    want = (
        triangle_count(edges).collect()[0]["triangles"]
        - triangle_count(base).collect()[0]["triangles"]
    )
    got = triangle_count_delta(base, delta).collect()[0]["new_triangles"]
    assert got == want and want > 0


def test_delta_equals_full_recount_planted(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=90, num_triangles=120, seed=13)
    )
    from pyspark.sql import functions as F

    for mod in (3, 7):
        cond = (F.col("src") * 7 + F.col("dst")) % mod == 0
        base, delta = edges.where(~cond), edges.where(cond)
        want = (
            triangle_count(edges).collect()[0]["triangles"]
            - triangle_count(base).collect()[0]["triangles"]
        )
        got = triangle_count_delta(base, delta).collect()[0]["new_triangles"]
        assert got == want, mod
