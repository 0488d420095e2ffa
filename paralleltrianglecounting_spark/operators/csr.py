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
