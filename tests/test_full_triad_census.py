"""full_triad_census / dyad_census: an INDEPENDENT brute twin — every
triple classified by its permutation-canonical 6-bit arc code, with
the code→class map seeded from the textbook representative of each of
the 16 Holland–Leinhardt classes — plus per-class fixtures and the
census identities (Σ = C(n,3); closed classes == triad_census)."""

from __future__ import annotations

import itertools
import random
from math import comb

from paralleltrianglecounting_spark.operators.motifs import (
    FULL_TRIAD_CLASSES,
    dyad_census,
    full_triad_census,
    triad_census,
)

# textbook representatives on vertices (0, 1, 2) — statnet/Wikipedia
# convention
_REPRESENTATIVES = {
    "003": [],
    "012": [(0, 1)],
    "102": [(0, 1), (1, 0)],
    "021D": [(0, 1), (0, 2)],  # out-star 1 <- 0 -> 2
    "021U": [(1, 0), (2, 0)],  # in-star
    "021C": [(0, 1), (1, 2)],  # chain
    "111D": [(0, 1), (1, 0), (2, 1)],  # 0 <-> 1 <- 2
    "111U": [(0, 1), (1, 0), (1, 2)],  # 0 <-> 1 -> 2
    "030T": [(0, 1), (0, 2), (1, 2)],
    "030C": [(0, 1), (1, 2), (2, 0)],
    "201": [(0, 1), (1, 0), (1, 2), (2, 1)],
    "120D": [(0, 1), (1, 0), (2, 0), (2, 1)],  # 0 <-> 1, 2 -> both
    "120U": [(0, 1), (1, 0), (0, 2), (1, 2)],  # 0 <-> 1, both -> 2
    "120C": [(0, 1), (1, 0), (0, 2), (2, 1)],  # 0 <-> 1, 0 -> 2 -> 1
    "210": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2)],
    "300": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)],
}

_PAIR_BITS = {(0, 1): 0, (1, 0): 1, (0, 2): 2, (2, 0): 3, (1, 2): 4, (2, 1): 5}


def _canon(arcs: set[tuple[int, int]]) -> int:
    """Permutation-canonical code of a 3-vertex digraph."""
    best = None
    for perm in itertools.permutations(range(3)):
        code = 0
        for (a, b), bit in _PAIR_BITS.items():
            if (perm[a], perm[b]) in arcs:
                code |= 1 << bit
        best = code if best is None else min(best, code)
    return best


_CANON_TO_CLASS = {
    _canon({(a, b) for a, b in arcs}): cls
    for cls, arcs in _REPRESENTATIVES.items()
}
assert len(_CANON_TO_CLASS) == 16  # the 16 reps are pairwise non-isomorphic


def _census_twin(arcs: list[tuple[int, int]], verts=None) -> dict[str, int]:
    arcset = {(a, b) for a, b in arcs if a != b}
    vs = sorted(verts if verts is not None else {x for e in arcset for x in e})
    out = {c: 0 for c in FULL_TRIAD_CLASSES}
    for u, v, w in itertools.combinations(vs, 3):
        tri = {
            (i, j)
            for i, j in itertools.permutations((u, v, w), 2)
            if (i, j) in arcset
        }
        relab = {u: 0, v: 1, w: 2}
        out[_CANON_TO_CLASS[_canon({(relab[a], relab[b]) for a, b in tri})]] += 1
    return out


def _run(spark, arcs):
    df = spark.createDataFrame(arcs, "src long, dst long")
    return {
        r.triad_class: r.triads for r in full_triad_census(df).collect()
    }


def test_each_class_representative(spark):
    # each representative shifted to (10, 11, 12), plus two disjoint
    # far-away arcs so every class — including the sub-3-vertex 012 /
    # 102 reps and the all-null 003 — has at least one realizing
    # triple; the twin recomputes the full expected census
    pad = [(50, 51), (60, 61), (70, 71)]  # 3 components: a null triple exists
    for cls, arcs in _REPRESENTATIVES.items():
        if not arcs and cls != "003":
            continue
        shifted = [(a + 10, b + 10) for a, b in arcs] + pad
        got = _run(spark, shifted)
        want = _census_twin(shifted)
        assert got == want, cls
        assert got[cls] >= 1, cls


def test_fuzz_vs_brute_twin(spark):
    rng = random.Random(23)
    for trial in range(4):
        n = rng.randint(6, 12)
        arcs = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randint(5, 40))
            }
        )
        arcs = [(a, b) for a, b in arcs if a != b]
        if not arcs:
            continue
        verts = sorted({x for e in arcs for x in e})
        got = _run(spark, arcs)
        want = _census_twin(arcs, verts)
        assert got == want, (trial, arcs)
        assert sum(got.values()) == comb(len(verts), 3)


def test_closed_classes_match_triad_census(spark):
    rng = random.Random(5)
    arcs = sorted(
        {(rng.randrange(15), rng.randrange(15)) for _ in range(70)}
    )
    arcs = [(a, b) for a, b in arcs if a != b]
    df = spark.createDataFrame(arcs, "src long, dst long")
    full = {r.triad_class: r.triads for r in full_triad_census(df).collect()}
    closed = {r.triad_class: r.triads for r in triad_census(df).collect()}
    assert {k: full[k] for k in closed} == closed


def test_dyad_census_identities(spark):
    arcs = [(1, 2), (2, 1), (2, 3), (4, 1), (4, 4)]  # self-loop dropped
    df = spark.createDataFrame(arcs, "src long, dst long")
    row = dyad_census(df).collect()[0]
    assert row.n_vertices == 4
    assert row.mutual == 1 and row.asym == 2
    assert row.null_dyads == comb(4, 2) - 3
