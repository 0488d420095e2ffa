"""Bipartite connected components: projection equivalence, the
singleton-container case the projection cannot see, multi-component
structure, and the id-collision guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.components import (
    bipartite_components,
    connected_components,
)
from paralleltrianglecounting_spark.sources.edges import cooccurrence_edges


def _inc(spark, rows):
    return spark.createDataFrame(
        [(int(c), int(e)) for c, e in rows], "c long, e long"
    )


def test_bipartite_matches_projection_components(spark):
    # containers chain entities into two components:
    #   {1,2,3,4} via c10/c11, {7,8} via c20; c30 holds entity 9 alone
    rows = [(10, 1), (10, 2), (11, 2), (11, 3), (11, 4), (20, 7), (20, 8), (30, 9)]
    inc = _inc(spark, rows)
    got = {
        (r.entity, r.component)
        for r in bipartite_components(inc, "c", "e").collect()
    }
    proj = cooccurrence_edges(inc, "c", "e")
    proj_cc = {
        (r.vertex, r.component) for r in connected_components(proj).collect()
    }
    # every projection-visible entity agrees ...
    assert proj_cc <= got
    # ... and the singleton-container entity 9 appears ONLY here, as
    # its own component labeled by itself
    assert (9, 9) in got
    assert got - proj_cc == {(9, 9)}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (8, 7), (9, 9)}


def test_bipartite_labels_are_min_entity(spark):
    rows = [(100, 5), (100, 3), (200, 3), (200, 11)]
    got = {
        (r.entity, r.component)
        for r in bipartite_components(_inc(spark, rows), "c", "e").collect()
    }
    assert got == {(3, 3), (5, 3), (11, 3)}


def test_bipartite_duplicate_incidence_rows_ignored(spark):
    rows = [(1, 0), (1, 0), (1, 2), (2, 2)]
    got = {
        (r.entity, r.component)
        for r in bipartite_components(_inc(spark, rows), "c", "e").collect()
    }
    assert got == {(0, 0), (2, 0)}


def test_bipartite_offset_collision_guard(spark):
    rows = [(1, (1 << 40) + 5)]
    with pytest.raises(ValueError, match="container_offset"):
        bipartite_components(_inc(spark, rows), "c", "e")
    # a larger offset makes the same input legal
    got = bipartite_components(
        _inc(spark, rows), "c", "e", container_offset=1 << 50
    ).collect()
    assert [(r.entity, r.component) for r in got] == [((1 << 40) + 5, (1 << 40) + 5)]


def test_bipartite_never_materializes_projection(spark):
    # a hub container with h entities: the bipartite edge set is h rows
    # where the projection would be h*(h-1)/2 — assert the operator's
    # input row count stays linear (plan-level, via the edge DataFrame
    # it feeds to CC being the shifted incidence itself)
    h = 200
    rows = [(42, e) for e in range(h)] + [(43, 0)]
    inc = _inc(spark, rows)
    got = bipartite_components(inc, "c", "e")
    assert got.count() == h
    labels = {r.component for r in got.collect()}
    assert labels == {0}
