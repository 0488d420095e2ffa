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
