"""Triad census: brute-force twin, per-class fixtures, triangle-sum tie."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.motifs import (
    TRIAD_CLASSES,
    coded_edges,
    triad_census,
)
from paralleltrianglecounting_spark.operators.triangles import triangle_count


def _classify_py(a: int, b: int, c: int) -> str:
    m = (a == 3) + (b == 3) + (c == 3)
    if m == 3:
        return "300"
    if m == 2:
        return "210"
    if m == 1:
        if a == 3:
            z_out = (b == 2) + (c == 2)
        elif b == 3:
            z_out = (a == 1) + (c == 1)
        else:
            z_out = (a == 2) + (b == 1)
        return {2: "120D", 0: "120U", 1: "120C"}[z_out]
    if (a, b, c) in ((1, 1, 2), (2, 2, 1)):
        return "030C"
    return "030T"


def _census_py(arcs: set[tuple[int, int]]) -> dict[str, int]:
    verts = sorted({x for e in arcs for x in e})
    code: dict[tuple[int, int], int] = {}
    for s, d in arcs:
        if s == d:
            continue
        lo, hi = min(s, d), max(s, d)
        code[(lo, hi)] = code.get((lo, hi), 0) | (1 if s < d else 2)
    out = {t: 0 for t in TRIAD_CLASSES}
    for u, v, w in itertools.combinations(verts, 3):
        if (u, v) in code and (v, w) in code and (u, w) in code:
            out[_classify_py(code[(u, v)], code[(v, w)], code[(u, w)])] += 1
    return out


def _run(spark, arcs):
    de = spark.createDataFrame(list(arcs), "src long, dst long")
    got = {r["triad_class"]: r["triads"] for r in triad_census(de).collect()}
    return got


FIXTURES = {
    # pure-asymmetric transitive: 1→2, 2→3, 1→3
    "030T": {(1, 2), (2, 3), (1, 3)},
    # pure-asymmetric cycle: 1→2, 2→3, 3→1
    "030C": {(1, 2), (2, 3), (3, 1)},
    # mutual {1,2}; z=3 sends into both
    "120D": {(1, 2), (2, 1), (3, 1), (3, 2)},
    # mutual {1,2}; z=3 receives from both
    "120U": {(1, 2), (2, 1), (1, 3), (2, 3)},
    # mutual {1,2}; 3→1 and 2→3 (through-flow)
    "120C": {(1, 2), (2, 1), (3, 1), (2, 3)},
    "210": {(1, 2), (2, 1), (2, 3), (3, 2), (1, 3)},
    "300": {(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)},
}


@pytest.mark.parametrize("cls", sorted(FIXTURES))
def test_single_class_fixtures(spark, cls):
    got = _run(spark, FIXTURES[cls])
    want = {t: 0 for t in TRIAD_CLASSES}
    want[cls] = 1
    assert got == want, (cls, got)
    # the hand fixture agrees with the brute twin too
    assert _census_py(FIXTURES[cls]) == want


def test_random_digraphs_match_brute(spark):
    rng = random.Random(0xC3)
    for trial in range(4):
        n = rng.randint(6, 12)
        arcs = {
            (s, d)
            for s in range(1, n + 1)
            for d in range(1, n + 1)
            if s != d and rng.random() < 0.35
        }
        assert _run(spark, arcs) == _census_py(arcs), trial


def test_census_sums_to_triangle_count(spark):
    rng = random.Random(7)
    arcs = {
        (s, d)
        for s in range(1, 15)
        for d in range(1, 15)
        if s != d and rng.random() < 0.3
    }
    de = spark.createDataFrame(list(arcs), "src long, dst long")
    total = sum(r["triads"] for r in triad_census(de).collect())
    und = coded_edges(de).select(
        F.col("lo").alias("src"), F.col("hi").alias("dst")
    )
    assert total == triangle_count(und).collect()[0]["triangles"]


def test_multiplicity_and_self_loops_ignored(spark):
    # duplicate arcs and self-loops must not perturb the direction codes
    arcs = [(1, 2), (1, 2), (2, 3), (3, 1), (2, 2)]
    de = spark.createDataFrame(arcs, "src long, dst long")
    got = {r["triad_class"]: r["triads"] for r in triad_census(de).collect()}
    want = {t: 0 for t in TRIAD_CLASSES}
    want["030C"] = 1
    assert got == want


def test_empty_digraph_keeps_universe(spark):
    de = spark.createDataFrame([], "src long, dst long")
    rows = triad_census(de).collect()
    assert {r["triad_class"] for r in rows} == set(TRIAD_CLASSES)
    assert all(r["triads"] == 0 for r in rows)


def test_weighted_intensity_matches_brute(spark):
    import itertools as it

    from paralleltrianglecounting_spark.operators.motifs import (
        weighted_triangle_intensity,
    )

    rng = random.Random(0x77)
    verts = list(range(1, 14))
    wedges = {}
    for u, v in it.combinations(verts, 2):
        if rng.random() < 0.4:
            wedges[(u, v)] = rng.randint(1, 9)
    tri_n = 0
    inten = 0
    for u, v, w in it.combinations(verts, 3):
        if (u, v) in wedges and (v, w) in wedges and (u, w) in wedges:
            tri_n += 1
            inten += wedges[(u, v)] * wedges[(v, w)] * wedges[(u, w)]
    df = spark.createDataFrame(
        [(u, v, w) for (u, v), w in wedges.items()],
        "src long, dst long, weight long",
    )
    row = weighted_triangle_intensity(df).collect()[0]
    assert (row["triangles"], row["intensity"]) == (tri_n, inten)


def test_weighted_intensity_unit_weights_equal_count(spark):
    from paralleltrianglecounting_spark.operators.motifs import (
        weighted_triangle_intensity,
    )

    df = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 1), (3, 4, 1)],
        "src long, dst long, weight long",
    )
    row = weighted_triangle_intensity(df).collect()[0]
    assert (row["triangles"], row["intensity"]) == (1, 1)


def test_weighted_intensity_empty(spark):
    from paralleltrianglecounting_spark.operators.motifs import (
        weighted_triangle_intensity,
    )

    df = spark.createDataFrame([], "src long, dst long, weight long")
    row = weighted_triangle_intensity(df).collect()[0]
    assert (row["triangles"], row["intensity"]) == (0, 0)
