"""Property tests for the vectorized CSR intersection kernel — pure
NumPy/Arrow, no SparkSession (the Spark-side path is covered by the
strategy-agreement tests in test_triangles.py).

Covers both kernel paths: the sort-free key path (non-negative ids with
``n * K`` in int64 range) and the ``np.unique`` densify fallback
(negative or huge ids), against a per-row set-intersection brute force —
the reference's ``std::set_intersection`` semantics
(``sequential_edge_it/seq_edge_it_v1.cpp:156-160``).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from paralleltrianglecounting_spark.operators.csr import batch_intersections


def _rand_lists(rng, n, maxv, shift=0):
    return [
        sorted(v + shift for v in rng.sample(range(maxv), rng.randrange(0, 8)))
        for _ in range(n)
    ]


@pytest.mark.parametrize(
    "maxv,shift",
    [
        (50, 0),  # dense small ids -> sort-free path
        (2**40, 0),  # sparse huge ids -> still sort-free (fits int64)
        (100, -50),  # negative ids -> unique fallback
        (2**62, 0),  # near-overflow ids -> unique fallback
        (2**62, 2**62),  # ids in [2^62, 2^63): bit_length 63, the case
        # where np.int64(1) << 63 used to wrap negative and pass the
        # fast-path guard (ADVICE r01) -> must take the unique fallback
    ],
)
def test_kernel_matches_bruteforce(maxv, shift):
    rng = random.Random(7)
    A = _rand_lists(rng, 257, maxv, shift)
    B = _rand_lists(rng, 257, maxv, shift)
    a = pa.array(A, pa.list_(pa.int64()))
    b = pa.array(B, pa.list_(pa.int64()))
    sizes, rows, vals = batch_intersections(a, b, want_values=True)
    assert sizes.tolist() == [len(set(x) & set(y)) for x, y in zip(A, B)]
    got: dict[int, set] = {}
    for r, v in zip(rows.tolist(), vals.tolist()):
        got.setdefault(r, set()).add(v)
    for i, (x, y) in enumerate(zip(A, B)):
        assert got.get(i, set()) == set(x) & set(y)


def test_kernel_high_bit_ids_exact():
    """Direct ADVICE-r01 repro: one id in [2^62, 2^63) used to flip the
    guard and return sizes [2, 0] with a negative stride."""
    a = pa.array([[5, 9, (1 << 62) + 1], [2, 6]], pa.list_(pa.int64()))
    b = pa.array([[5, 9, 11], [6, 7]], pa.list_(pa.int64()))
    sizes, rows, vals = batch_intersections(a, b, want_values=True)
    assert sizes.tolist() == [2, 1]
    assert sorted(vals.tolist()) == [5, 6, 9]


def test_kernel_empty_inputs():
    e = pa.array([[], []], pa.list_(pa.int64()))
    sizes, _, _ = batch_intersections(e, e)
    assert sizes.tolist() == [0, 0]
    one = pa.array([[1, 2], []], pa.list_(pa.int64()))
    sizes, _, _ = batch_intersections(one, e)
    assert sizes.tolist() == [0, 0]


# ---------------------------------------------------------------------------
# Broadcast-CSR slab machinery (pure NumPy; the Spark route is covered
# by the forced-route tests in test_triangles.py)
# ---------------------------------------------------------------------------

import numpy as np

from paralleltrianglecounting_spark.operators.csr import (
    DEFAULT_SLAB_BUDGET,
    _slab_chunks,
    _slab_pairs,
    balance_slabs,
    build_global_csr,
    cumulative_row_cost,
)


def _rand_oriented(rng, n_v, n_e, id_map=None):
    """Random canonical (src<dst) dedup'd edge arrays; ids optionally
    remapped through id_map to exercise sparse/huge-id densify."""
    seen = set()
    while len(seen) < n_e:
        u, v = rng.randrange(n_v), rng.randrange(n_v)
        if u != v:
            seen.add((min(u, v), max(u, v)))
    src, dst = map(np.array, zip(*sorted(seen)))
    if id_map is not None:
        src, dst = id_map(src), id_map(dst)
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        src, dst = lo, hi
    return src.astype(np.int64), dst.astype(np.int64)


def _brute_slab_counts(src, dst):
    """Per-oriented-edge |N+(s) ∩ N+(d)| via Python sets."""
    adj: dict[int, set] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, set()).add(v)
    return {
        (u, v): len(adj.get(u, set()) & adj.get(v, set()))
        for u, v in zip(src.tolist(), dst.tolist())
    }


@pytest.mark.parametrize(
    "id_map",
    [None, lambda a: a * 977 + (1 << 40), lambda a: a * 13 - 600],
    ids=["dense", "huge", "negative"],
)
def test_slab_pairs_match_bruteforce(id_map):
    rng = random.Random(11)
    src, dst = _rand_oriented(rng, 60, 400, id_map)
    uniq, row_ptr, col = build_global_csr(src, dst)
    cum = cumulative_row_cost(row_ptr, col)
    bounds = balance_slabs(cum, 7)
    expected = _brute_slab_counts(src, dst)
    got = {}
    closings = {}
    for a, b in zip(bounds[:-1], bounds[1:]):
        # tiny budget to force multi-chunk slabs
        for c, d in _slab_chunks(cum, int(a), int(b), 64):
            ps, pd, sizes, vals = _slab_pairs(row_ptr, col, c, d, want_values=True)
            off = 0
            for s, t, sz in zip(ps.tolist(), pd.tolist(), sizes.tolist()):
                key = (int(uniq[s]), int(uniq[t]))
                got[key] = sz
                closings[key] = {int(uniq[v]) for v in vals[off : off + sz]}
                off += sz
    assert got == expected
    # closing vertices are exactly the set intersection itself
    adj: dict[int, set] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(int(u), set()).add(int(v))
    for (u, v), cs in closings.items():
        assert cs == adj.get(u, set()) & adj.get(v, set())


def test_balance_slabs_work_bounded():
    """Slab boundaries cut on cumulative merge cost: no slab exceeds
    ~total/n + the largest single row's cost (contiguity limit)."""
    rng = random.Random(3)
    src, dst = _rand_oriented(rng, 200, 2000)
    _, row_ptr, col = build_global_csr(src, dst)
    cum = cumulative_row_cost(row_ptr, col)
    n_slabs = 8
    bounds = balance_slabs(cum, n_slabs)
    assert bounds[0] == 0 and bounds[-1] == row_ptr.size - 1
    total = int(cum[-1])
    per_row = np.diff(cum)
    limit = total / n_slabs + int(per_row.max())
    for a, b in zip(bounds[:-1], bounds[1:]):
        assert int(cum[b] - cum[a]) <= limit


def test_slab_chunks_budget_and_cover():
    rng = random.Random(5)
    src, dst = _rand_oriented(rng, 100, 800)
    _, row_ptr, col = build_global_csr(src, dst)
    cum = cumulative_row_cost(row_ptr, col)
    n_v = row_ptr.size - 1
    budget = 500
    per_row = np.diff(cum)
    covered = []
    for a, b in _slab_chunks(cum, 0, n_v, budget):
        covered.extend(range(a, b))
        # chunk work stays under budget unless a single row exceeds it
        assert (cum[b] - cum[a] <= budget) or (b == a + 1)
    assert covered == list(range(n_v))


def test_empty_and_single_edge_csr():
    z = np.zeros(0, dtype=np.int64)
    uniq, row_ptr, col = build_global_csr(z, z)
    assert uniq.size == 0 and row_ptr.tolist() == [0] and col.size == 0
    assert cumulative_row_cost(row_ptr, col).tolist() == [0]
    src, dst = np.array([7], np.int64), np.array([9], np.int64)
    uniq, row_ptr, col = build_global_csr(src, dst)
    cum = cumulative_row_cost(row_ptr, col)
    bounds = balance_slabs(cum, 4)
    total = 0
    for a, b in zip(bounds[:-1], bounds[1:]):
        for c, d in _slab_chunks(cum, int(a), int(b), DEFAULT_SLAB_BUDGET):
            _, _, sizes, _ = _slab_pairs(row_ptr, col, c, d, False)
            total += int(sizes.sum())
    assert total == 0


def test_build_oriented_csr_equals_two_step():
    """The fused orient+pack equals orient_arrays -> build_global_csr
    array-for-array on dense, huge, and negative id regimes."""
    from paralleltrianglecounting_spark.operators.csr import (
        build_oriented_csr,
        orient_arrays,
    )

    rng = random.Random(23)
    for id_map in (None, lambda a: a * 977 + (1 << 40), lambda a: a * 13 - 600):
        src, dst = _rand_oriented(rng, 80, 600, id_map)
        u1, r1, c1 = build_oriented_csr(src, dst)
        os_, od_ = orient_arrays(src, dst)
        u2, r2, c2 = build_global_csr(os_, od_)
        assert np.array_equal(u1, u2)
        assert np.array_equal(r1, r2)
        assert np.array_equal(c1, c2)
    # empty graph
    z = np.zeros(0, dtype=np.int64)
    u, r, c = build_oriented_csr(z, z)
    assert u.size == 0 and r.tolist() == [0] and c.size == 0


def test_build_oriented_csr_lexsort_fallback_identical(monkeypatch):
    """When n_v * K would overflow the packed sort key (Python-int
    guard, ADVICE r03 #4), build_oriented_csr falls back to a lexsort —
    forced here by shrinking the pack ceiling — and must produce the
    byte-identical CSR."""
    import paralleltrianglecounting_spark.operators.csr as csr_mod

    rng = np.random.default_rng(11)
    src = rng.integers(0, 500, 3000).astype(np.int64)
    dst = rng.integers(0, 500, 3000).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    want = csr_mod.build_oriented_csr(src, dst)
    monkeypatch.setattr(csr_mod, "_PACK_MAX", 4)  # force fallback
    got = csr_mod.build_oriented_csr(src, dst)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def test_slab_pairs_segmented_merge_identical(monkeypatch):
    """The slab kernel's owner-key merge segments the owner range when
    n_pairs * K would overflow int64 (ADVICE r03 #4); forced
    segmentation must return identical intersections."""
    import paralleltrianglecounting_spark.operators.csr as csr_mod

    rng = np.random.default_rng(13)
    src = rng.integers(0, 200, 2000).astype(np.int64)
    dst = rng.integers(0, 200, 2000).astype(np.int64)
    keep = src != dst
    uniq, row_ptr, col = csr_mod.build_oriented_csr(src[keep], dst[keep])
    n_v = row_ptr.size - 1
    want = csr_mod._slab_pairs(row_ptr, col, 0, n_v, want_values=True)
    # ceiling low enough that every segment holds only a few owners
    k_int = 1 << max(int(n_v).bit_length(), 1)
    monkeypatch.setattr(csr_mod, "_PACK_MAX", 7 * k_int)
    got = csr_mod._slab_pairs(row_ptr, col, 0, n_v, want_values=True)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def test_driver_local_regime_equals_distributed(spark, monkeypatch):
    """Under CSR_DRIVER_LOCAL_MAX_COST the broadcast-CSR route runs the
    slab kernel in-process (no fan-out job); forcing the distributed
    kernel on the same input must give identical results in all three
    modes. Also pins that the local gate actually engages (the local
    path returns a LocalRelation-backed plan, no mapInArrow)."""
    import paralleltrianglecounting_spark.operators.triangles as tri_mod
    from paralleltrianglecounting_spark.sources.gfile import read_g_file

    edges = read_g_file(spark, "/root/reference/graph_file/graph_100.g")

    def counts(df, keycols):
        return sorted(tuple(r) for r in df.collect())

    # local regime (default gate: graph_100 cost is far under 2^24)
    local_cnt = tri_mod.triangle_count(edges, strategy="csr").collect()[0]
    local_edges = counts(
        tri_mod.edge_triangle_counts(edges, strategy="csr"), ["src", "dst"]
    )
    local_triples = counts(
        tri_mod.triangle_triples(edges, strategy="csr"), ["a", "b", "c"]
    )
    def has_arrow_stage(df):
        return "MapInArrow" in df._jdf.queryExecution().analyzed().toString()

    assert not has_arrow_stage(tri_mod.edge_triangle_counts(edges, strategy="csr"))
    # forced distributed kernel
    monkeypatch.setattr(tri_mod, "CSR_DRIVER_LOCAL_MAX_COST", -1)
    assert has_arrow_stage(tri_mod.edge_triangle_counts(edges, strategy="csr"))
    dist_cnt = tri_mod.triangle_count(edges, strategy="csr").collect()[0]
    dist_edges = counts(
        tri_mod.edge_triangle_counts(edges, strategy="csr"), ["src", "dst"]
    )
    dist_triples = counts(
        tri_mod.triangle_triples(edges, strategy="csr"), ["a", "b", "c"]
    )
    assert local_cnt.triangles == dist_cnt.triangles == 373
    assert local_edges == dist_edges
    assert local_triples == dist_triples


def test_run_slabs_local_empty_graph(spark):
    import pyarrow as pa

    import paralleltrianglecounting_spark.operators.csr as csr_mod

    uniq = np.zeros(0, dtype=np.int64)
    row_ptr = np.zeros(1, dtype=np.int64)
    col = np.zeros(0, dtype=np.int32)
    cum = csr_mod.cumulative_row_cost(row_ptr, col)
    assert csr_mod.run_slabs_local(uniq, row_ptr, col, cum, "count")[
        "tri_cnt"
    ].to_pylist() == [0]
    for mode in ("edges", "triples"):
        t = csr_mod.run_slabs_local(uniq, row_ptr, col, cum, mode)
        assert t.num_rows == 0 and t.num_columns == 3
