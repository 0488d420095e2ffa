"""Sorted-CSR blocks inside DataFrame partitions + the vectorized
Arrow intersection kernel (the north-star fast path).

Key observation: Spark ships list columns to Python as Arrow
``ListArray``s, and a ListArray *is* CSR — ``offsets`` = ``row_ptr``,
flattened ``values`` = ``col_idx`` (the reference builds the same pair
by hand in ``convertToCRS``, ``utils/utils.cpp:68-102``). So "CSR blocks
inside partitions" costs nothing to materialize: each Arrow batch of
``(src, dst, n_src, n_dst)`` rows carries two CSR blocks, and the
intersection kernel below runs on the packed arrays directly.

The kernel is fully vectorized — zero per-row Python (BASELINE.json
``input_hint`` bans it). Per Arrow batch:

1. tag every neighbor with its row: ``key = row * K + value`` — both key
   arrays are then *globally sorted with no sorting done* (rows arrive
   ascending, values are sorted within each row by construction,
   ``operators/adjacency.py``), picking K = a power of two above the
   batch max value;
2. one vectorized ``np.searchsorted`` of the a-keys into the b-keys plus
   an equality probe computes ALL per-row intersections of the batch at
   once — the batched form of the reference's two-pointer merge
   (``cuda_edge_it/cuda_edge_it_v2.cu:79-109`` /
   ``std::set_intersection``, ``sequential_edge_it/seq_edge_it_v1.cpp:156-160``),
   at O((|a|+|b|)·log) with zero allocations beyond the key arrays;
3. ``np.bincount(row[hit])`` recovers per-row counts; ``key & (K-1)``
   recovers the closing vertices when triples are requested.

When ``row_max * K`` would overflow int64 (possible with raw xxhash64
vertex ids near 2^63), the kernel falls back to densifying ids first
with ``np.unique`` (codes are order-isomorphic, so sortedness survives)
— same key construction, one extra sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa


# rank-key packing headroom: every `row * K + value` key built in this
# module must stay under 2^62 (verified in PYTHON-int space — np.int64
# shifts wrap silently, the bug batch_intersections' k_int guard fixed).
# Paths that would exceed it fall back (lexsort build / segmented merge)
# instead of wrapping (ADVICE r03 #4: the broadcast gate is env-tunable,
# so "checked upstream" was not a guarantee).
_PACK_MAX = 1 << 62


def _csr(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(row_ptr, col_idx) view of an Arrow list column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = arr.flatten().to_numpy(zero_copy_only=False)
    offsets = np.asarray(arr.offsets)
    row_ptr = (offsets - offsets[0]).astype(np.int64)
    # keep the values at their wire width (int32 when compact ids are
    # active upstream): the key build below upcasts on the fly, and an
    # eager astype(int64) here was a 2x-width copy of the whole payload
    # that defeated the compact-id work (VERDICT r01)
    return row_ptr, values


def batch_intersections(
    a: pa.Array, b: pa.Array, want_values: bool = False
) -> tuple[np.ndarray, np.ndarray | None, np.ndarray | None]:
    """Intersection sizes (and optionally members) for every row of two
    sorted list columns. Returns (sizes, member_rows, member_values).
    """
    a_ptr, a_val = _csr(a)
    b_ptr, b_val = _csr(b)
    n = len(a_ptr) - 1
    if a_val.size == 0 or b_val.size == 0:
        empty = np.zeros(0, dtype=np.int64)
        return np.zeros(n, dtype=np.int64), (empty if want_values else None), (
            empty if want_values else None
        )

    a_row = np.repeat(np.arange(n, dtype=np.int64), np.diff(a_ptr))
    b_row = np.repeat(np.arange(n, dtype=np.int64), np.diff(b_ptr))

    max_val = max(int(a_val.max()), int(b_val.max()))
    min_val = min(int(a_val.min()), int(b_val.min()))
    # compute k in Python-int space BEFORE any np.int64 cast: for ids in
    # [2^62, 2^63) bit_length()==63 and np.int64(1)<<63 wraps negative,
    # which made the old guard (n * k < 2^62 on the wrapped value) pass
    # and run the fast path with a negative stride — silently wrong
    # counts. Python ints never wrap, so the guard below is exact; the
    # np.int64 cast happens only once the guard proves it fits.
    k_int = 1 << max(max_val.bit_length(), 1)
    if min_val >= 0 and n * k_int < (1 << 62):
        k = np.int64(k_int)
        # fast path: keys sorted for free (rows ascending, values sorted
        # within rows by construction) — no sort anywhere
        a_key = a_row * k + a_val
        b_key = b_row * k + b_val
        decode = lambda key: key & (k - 1)  # noqa: E731
    else:
        # fallback: densify ids (order-isomorphic codes keep sortedness)
        uniq, inv = np.unique(np.concatenate([a_val, b_val]), return_inverse=True)
        k = np.int64(uniq.size + 1)
        a_key = a_row * k + inv[: a_val.size]
        b_key = b_row * k + inv[a_val.size :]
        decode = lambda key: uniq[key % k]  # noqa: E731

    idx = np.searchsorted(b_key, a_key)
    idx_c = np.minimum(idx, b_key.size - 1)
    hit = b_key[idx_c] == a_key
    common = a_key[hit]
    rows = a_row[hit]
    sizes = np.bincount(rows, minlength=n).astype(np.int64)
    if want_values:
        return sizes, rows, decode(common)
    return sizes, None, None


# ---------------------------------------------------------------------------
# Broadcast-CSR regime
#
# The join-based kernel above ships every vertex's N⁺ array once per
# incident oriented edge — Σ d⁺(v)·deg(v) elements through shuffle +
# Arrow (132 M at sf0.1) for an adjacency that is only |E| elements
# (1.2 M). When the whole oriented adjacency fits in worker memory —
# the same smallness test a broadcast hash join applies to its build
# side — the right plan is to ship it ONCE: collect the oriented edge
# list via Arrow, pack a dense-coded global CSR driver-side, broadcast
# it, and run the intersection kernel over contiguous work-balanced row
# slabs fed by a ``spark.range(n_slabs)`` input (one slab per task, a
# few bytes of Arrow traffic in, partial sums out). This is the direct
# distributed analog of the reference's OpenMP parallel-for over its
# in-memory CSR (``parallel_edge_it_CPP/parallel_edge_it_v1.cpp``) —
# Spark schedules the slabs, NumPy does the merges, no join anywhere.
# Beyond the size gate (``triangles.CSR_BROADCAST_MAX_EDGES``) the
# join-based kernel remains the 100 TB path.
# ---------------------------------------------------------------------------


def orient_arrays(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side degree-rank orientation of canonical edge arrays —
    the NumPy twin of ``operators.orientation.orient_edges`` (same
    ``(degree, id)`` lexicographic total order, so the two routes agree
    per-edge, not just in aggregate). Exists so the broadcast-CSR
    regime, which has already collected the edge list, need not run the
    degree-agg + two-join orientation plan on the cluster: under the
    size gate the whole path is one scan-collect job + one kernel job,
    which is what the small-graph latency floor is made of."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    ids = np.concatenate([src, dst])
    uniq, inv = np.unique(ids, return_inverse=True)
    inv = inv.astype(np.int64, copy=False)
    s, d = inv[: src.size], inv[src.size :]
    deg = np.bincount(inv, minlength=uniq.size)
    # codes are order-isomorphic to ids, so (deg, code) lexicographic
    # equals orient_edges' struct(degree, vertex_id) comparison exactly
    swap = (deg[s] > deg[d]) | ((deg[s] == deg[d]) & (s > d))
    return np.where(swap, dst, src), np.where(swap, src, dst)


def build_oriented_csr(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused ``orient_arrays`` + ``build_global_csr`` over CANONICAL
    edge arrays: one ``np.unique`` (the dominant serial cost — the
    two-step path pays it twice) and one flat int64 key sort instead of
    a lexsort. This is the serial driver-side fraction of the
    broadcast-CSR regime, i.e. its Amdahl floor — keep it lean.
    Equivalence to the two-step path is pinned by pytest."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    ids = np.concatenate([src, dst])
    uniq, inv = np.unique(ids, return_inverse=True)
    inv = inv.astype(np.int64, copy=False)
    s, d = inv[: src.size], inv[src.size :]
    n_v = int(uniq.size)
    deg = np.bincount(inv, minlength=n_v)
    # (deg, code) lexicographic == orient_edges' struct(degree, id)
    swap = (deg[s] > deg[d]) | ((deg[s] == deg[d]) & (s > d))
    s_code = np.where(swap, d, s)
    d_code = np.where(swap, s, d)
    # codes < n_v, so s*K+d is collision-free and one flat sort orders
    # rows and sorts neighbors within each row simultaneously. Guard the
    # pack in Python-int space; past ~2^31 vertices (only reachable by
    # raising the env-tunable broadcast gate) fall back to a lexsort —
    # same ordering, no packed key to wrap
    k_int = 1 << max(n_v.bit_length(), 1)
    if n_v * k_int < _PACK_MAX:
        k = np.int64(k_int)
        key = np.sort(s_code * k + d_code)
        s_code, d_code = key // k, key % k
    else:
        order = np.lexsort((d_code, s_code))
        s_code, d_code = s_code[order], d_code[order]
    row_ptr = np.zeros(n_v + 1, dtype=np.int64)
    np.cumsum(np.bincount(s_code, minlength=n_v), out=row_ptr[1:])
    col_dtype = np.int32 if n_v <= np.iinfo(np.int32).max else np.int64
    return uniq, row_ptr, d_code.astype(col_dtype, copy=False)


def build_global_csr(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense-coded CSR from oriented edge arrays (driver-side).

    Returns ``(uniq_ids, row_ptr, col)``: vertex ids sorted ascending,
    ``row_ptr`` over dense codes 0..n_v, and ``col`` holding the dense
    code of each out-neighbor, sorted within every row. Codes are
    order-isomorphic to ids (``np.unique`` sorts), so intersection
    sizes over codes equal intersection sizes over ids — the same
    invariant the fallback path of ``batch_intersections`` relies on.
    Immune to id width: raw xxhash64 ids densify like any others.
    """
    ids = np.concatenate([np.asarray(src, np.int64), np.asarray(dst, np.int64)])
    uniq, inv = np.unique(ids, return_inverse=True)
    inv = inv.astype(np.int64, copy=False)
    s_code, d_code = inv[: src.size], inv[src.size :]
    order = np.lexsort((d_code, s_code))
    s_code, d_code = s_code[order], d_code[order]
    n_v = int(uniq.size)
    row_ptr = np.zeros(n_v + 1, dtype=np.int64)
    np.cumsum(np.bincount(s_code, minlength=n_v), out=row_ptr[1:])
    col_dtype = np.int32 if n_v <= np.iinfo(np.int32).max else np.int64
    return uniq, row_ptr, d_code.astype(col_dtype, copy=False)


def _row_merge_cost(row_ptr: np.ndarray, col: np.ndarray) -> np.ndarray:
    """Per-row merge work w(r) = Σ_{v∈N⁺(r)} (d⁺(r) + d⁺(v)) — the exact
    element count the slab kernel gathers for row r."""
    d = np.diff(row_ptr)
    if col.size == 0:
        return np.zeros(d.size, dtype=np.int64)
    edge_cost = np.repeat(d, d) + d[col]
    cum = np.concatenate([[0], np.cumsum(edge_cost)])
    return cum[row_ptr[1:]] - cum[row_ptr[:-1]]


def cumulative_row_cost(row_ptr: np.ndarray, col: np.ndarray) -> np.ndarray:
    """cum[i] = total merge work of rows < i (length n_v+1). Computed
    once driver-side; slab balancing and in-kernel chunking both cut on
    it, so the skew model is shared and never recomputed per task."""
    return np.concatenate([[0], np.cumsum(_row_merge_cost(row_ptr, col))]).astype(
        np.int64
    )


def balance_slabs(cum_cost: np.ndarray, n_slabs: int) -> np.ndarray:
    """Cut rows 0..n_v into ≤ ``n_slabs`` contiguous ranges of ~equal
    merge work (not equal row count — degree skew would otherwise pile
    the hub rows into one straggler task). Returns the sorted boundary
    array ``b`` with slab i = rows [b[i], b[i+1])."""
    n_v = cum_cost.size - 1
    if n_v == 0 or n_slabs <= 1:
        return np.array([0, max(n_v, 0)], dtype=np.int64)
    total = int(cum_cost[-1])
    if total == 0:
        cuts = np.linspace(0, n_v, n_slabs + 1).astype(np.int64)
    else:
        targets = (np.arange(1, n_slabs) * total) // n_slabs
        cuts = np.concatenate(
            [[0], np.searchsorted(cum_cost[1:], targets, side="left") + 1, [n_v]]
        )
    return np.unique(np.clip(cuts, 0, n_v))


def _gather_rows(
    row_ptr: np.ndarray, col: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate ``col[row_ptr[i]:row_ptr[i+1]]`` for every i in idx
    (vectorized multi-slice gather). Returns (owner_pos, values) where
    owner_pos[j] is the position within ``idx`` owning values[j]."""
    lens = row_ptr[idx + 1] - row_ptr[idx]
    total = int(lens.sum())
    owner = np.repeat(np.arange(idx.size, dtype=np.int64), lens)
    out_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.arange(total, dtype=np.int64) - out_starts[owner] + row_ptr[idx][owner]
    return owner, col[pos]


def _slab_chunks(
    cum_cost: np.ndarray, lo: int, hi: int, budget: int
) -> Iterator[tuple[int, int]]:
    """Split slab rows [lo,hi) into sub-ranges whose gathered-element
    count stays under ``budget`` (bounds kernel peak memory). Cuts on
    the shared driver-computed cumulative cost."""
    a = lo
    while a < hi:
        # largest b with cum[b] - cum[a] <= budget; a single row costlier
        # than the budget still advances (b = a+1) and is simply a big chunk
        b = int(np.searchsorted(cum_cost, cum_cost[a] + budget, side="right")) - 1
        b = max(a + 1, min(b, hi))
        yield a, b
        a = b


def _owner_key_hits(
    a_owner: np.ndarray,
    a_val: np.ndarray,
    b_owner: np.ndarray,
    b_val: np.ndarray,
    n_owners: int,
    k_int: int,
) -> np.ndarray:
    """Boolean mask over the a-side: a_val[j] present in the b-values of
    the same owner. Both sides sorted by (owner, value); keys are
    ``owner * K + value``. When ``n_owners * K`` would overflow int64
    (Python-int guard — ADVICE r03 #4), the merge runs over owner
    SEGMENTS with rebased keys: owners are ascending, so each segment is
    a contiguous slice and the per-segment key ``(owner - seg_start) * K
    + value`` always fits. The no-overflow case is one segment — the
    exact same single searchsorted as before."""
    hit = np.zeros(a_val.size, dtype=bool)
    if n_owners == 0:
        return hit
    seg = n_owners if n_owners * k_int < _PACK_MAX else max(_PACK_MAX // k_int, 1)
    k = np.int64(k_int)
    for s in range(0, n_owners, seg):
        e = min(s + seg, n_owners)
        a_lo, a_hi = np.searchsorted(a_owner, [s, e])
        b_lo, b_hi = np.searchsorted(b_owner, [s, e])
        if a_lo == a_hi or b_lo == b_hi:
            continue
        a_key = (a_owner[a_lo:a_hi] - s) * k + a_val[a_lo:a_hi]
        b_key = (b_owner[b_lo:b_hi] - s) * k + b_val[b_lo:b_hi]
        idx = np.minimum(np.searchsorted(b_key, a_key), b_key.size - 1)
        hit[a_lo:a_hi] = b_key[idx] == a_key
    return hit


def _slab_pairs(
    row_ptr: np.ndarray, col: np.ndarray, a: int, b: int, want_values: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray | None]:
    """All per-edge intersections for oriented edges with src row in
    [a,b). Returns (pair_src_rows, pair_dst_codes, sizes, closing_codes)
    — the broadcast-CSR analog of ``batch_intersections``, with the
    a-side arrays gathered by repeat and the b-side by multi-slice
    gather, then the same rank-key searchsorted merge."""
    rows = np.arange(a, b, dtype=np.int64)
    d = row_ptr[rows + 1] - row_ptr[rows]
    pair_src = np.repeat(rows, d)
    pair_dst = col[row_ptr[a] : row_ptr[b]].astype(np.int64, copy=False)
    n_pairs = pair_src.size
    if n_pairs == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, (z if want_values else None)
    # a-side: N⁺(src) repeated per out-edge of src — owner = pair index
    a_lens = d[pair_src - a]
    a_owner = np.repeat(np.arange(n_pairs, dtype=np.int64), a_lens)
    a_starts = np.concatenate([[0], np.cumsum(a_lens)[:-1]])
    a_pos = (
        np.arange(int(a_lens.sum()), dtype=np.int64)
        - a_starts[a_owner]
        + row_ptr[pair_src][a_owner]
    )
    a_val = col[a_pos].astype(np.int64, copy=False)
    b_owner, b_val = _gather_rows(row_ptr, col, pair_dst)
    b_val = b_val.astype(np.int64, copy=False)
    k_int = 1 << max(int(row_ptr.size - 1).bit_length(), 1)
    hit = _owner_key_hits(a_owner, a_val, b_owner, b_val, n_pairs, k_int)
    sizes = np.bincount(a_owner[hit], minlength=n_pairs).astype(np.int64)
    if want_values:
        return pair_src, pair_dst, sizes, a_val[hit]
    return pair_src, pair_dst, sizes, None


# Gathered elements per side per chunk. Deliberately small: the chunk
# temporaries (~10 arrays of `budget` int64s) must stay under glibc's
# mmap threshold so freed chunks are REUSED from the arena across
# iterations instead of returned to the OS — at 2^23 every chunk
# mmap-faults ~1 GB of fresh pages per worker and 32 workers faulting
# simultaneously collapse into kernel page-allocator contention
# (measured: 20.5 s wall vs 0.8 s at 2^21 for the identical kernel on
# the identical input; single-process is unaffected). 2^20 keeps each
# temp at ~8 MB with per-chunk NumPy calls still fully amortized.
DEFAULT_SLAB_BUDGET = 1 << 20


def make_slab_kernel(bc, mode: str, budget: int = DEFAULT_SLAB_BUDGET):
    """mapInArrow kernel factory over a broadcast ``(uniq, row_ptr, col,
    boundaries, cum_cost)``. Input: ``spark.range(n_slabs)`` rows
    (column ``id`` = slab index). ``mode``:

    - ``'count'``   → one partial-sum row per slab  [tri_cnt]
    - ``'edges'``   → per-oriented-edge counts      [src, dst, tri_cnt]
    - ``'triples'`` → one row per closed triangle   [a, b, c]
    """
    if mode not in ("count", "edges", "triples"):
        raise ValueError(f"unknown slab kernel mode {mode!r}")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        uniq, row_ptr, col, bounds, cum_cost = bc.value
        for batch in batches:
            for sid in batch.column("id").to_numpy(zero_copy_only=False):
                lo, hi = int(bounds[sid]), int(bounds[sid + 1])
                partial = 0
                for a, b in _slab_chunks(cum_cost, lo, hi, budget):
                    ps, pd, sizes, closing = _slab_pairs(
                        row_ptr, col, a, b, want_values=(mode == "triples")
                    )
                    if mode == "count":
                        partial += int(sizes.sum())
                    elif mode == "edges":
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(uniq[ps], pa.int64()),
                                pa.array(uniq[pd], pa.int64()),
                                pa.array(sizes, pa.int64()),
                            ],
                            names=["src", "dst", "tri_cnt"],
                        )
                    else:
                        owner = np.repeat(np.arange(ps.size, dtype=np.int64), sizes)
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(uniq[ps[owner]], pa.int64()),
                                pa.array(uniq[pd[owner]], pa.int64()),
                                pa.array(uniq[closing], pa.int64()),
                            ],
                            names=["a", "b", "c"],
                        )
                if mode == "count":
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([partial], pa.int64())], names=["tri_cnt"]
                    )

    return kernel


def run_slabs_local(
    uniq: np.ndarray,
    row_ptr: np.ndarray,
    col: np.ndarray,
    cum_cost: np.ndarray,
    mode: str,
    budget: int = DEFAULT_SLAB_BUDGET,
) -> pa.Table:
    """Run the slab kernel in-process over the full row range — the
    driver-local regime for graphs whose TOTAL merge work is tiny (the
    caller gates on ``cum_cost[-1]``). Once the edge table has already
    been collected for the broadcast-CSR build, a few million merge
    elements cost ~10-100 ms of vectorized NumPy on the driver, while
    shipping them back out through a ``spark.range``+``mapInArrow`` job
    costs a fixed ~0.2 s of scheduling regardless of size. Identical
    chunking (mmap-cliff budget) and pair logic as ``make_slab_kernel``
    — same answer by construction, only the executor fan-out is elided.
    """
    if mode not in ("count", "edges", "triples"):
        raise ValueError(f"unknown slab kernel mode {mode!r}")
    n_rows = max(row_ptr.size - 1, 0)
    if mode == "count":
        total = 0
        for a, b in _slab_chunks(cum_cost, 0, n_rows, budget):
            _, _, sizes, _ = _slab_pairs(row_ptr, col, a, b, want_values=False)
            total += int(sizes.sum())
        return pa.table({"tri_cnt": pa.array([total], pa.int64())})
    batches = []
    for a, b in _slab_chunks(cum_cost, 0, n_rows, budget):
        ps, pd, sizes, closing = _slab_pairs(
            row_ptr, col, a, b, want_values=(mode == "triples")
        )
        if mode == "edges":
            batches.append(
                pa.record_batch(
                    [
                        pa.array(uniq[ps], pa.int64()),
                        pa.array(uniq[pd], pa.int64()),
                        pa.array(sizes, pa.int64()),
                    ],
                    names=["src", "dst", "tri_cnt"],
                )
            )
        else:
            owner = np.repeat(np.arange(ps.size, dtype=np.int64), sizes)
            batches.append(
                pa.record_batch(
                    [
                        pa.array(uniq[ps[owner]], pa.int64()),
                        pa.array(uniq[pd[owner]], pa.int64()),
                        pa.array(uniq[closing], pa.int64()),
                    ],
                    names=["a", "b", "c"],
                )
            )
    names = (
        ["src", "dst", "tri_cnt"] if mode == "edges" else ["a", "b", "c"]
    )
    schema = pa.schema([(n, pa.int64()) for n in names])
    if not batches:
        return schema.empty_table()
    return pa.Table.from_batches(batches, schema=schema)


def intersect_count_kernel(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """mapInArrow kernel: (src, dst, n_src, n_dst) → (src, dst, tri_cnt).

    Emits one row per input edge with the size of N⁺(src) ∩ N⁺(dst).
    """
    for batch in batches:
        sizes, _, _ = batch_intersections(batch.column("n_src"), batch.column("n_dst"))
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("src").cast(pa.int64()),
                batch.column("dst").cast(pa.int64()),
                pa.array(sizes, pa.int64()),
            ],
            names=["src", "dst", "tri_cnt"],
        )


def intersect_triples_kernel(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """mapInArrow kernel: (src, dst, n_src, n_dst) → (a, b, c) triangle
    triples, one row per closed triangle (a=src, b=dst, c=closing vertex).
    """
    for batch in batches:
        _, rows, vals = batch_intersections(
            batch.column("n_src"), batch.column("n_dst"), want_values=True
        )
        src = (
            batch.column("src")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)[rows]
        )
        dst = (
            batch.column("dst")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)[rows]
        )
        yield pa.RecordBatch.from_arrays(
            [pa.array(src, pa.int64()), pa.array(dst, pa.int64()), pa.array(vals, pa.int64())],
            names=["a", "b", "c"],
        )
