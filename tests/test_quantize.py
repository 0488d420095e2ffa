"""quantize_embeddings: NumPy twin, max-element saturation, zero
vector, validation."""

from __future__ import annotations

import math
import random

import pytest

from paralleltrianglecounting_spark.operators.similarity import quantize_embeddings


def _twin(vecs: dict[int, list[float]], levels: int = 127):
    out = {}
    for vid, xs in vecs.items():
        xs = [float(x) for x in xs]
        scale = max(abs(v) for v in xs) / levels
        if scale == 0:
            out[vid] = (0.0, 0, 0, 0.0)
            continue
        # round-half-away-from-zero, the Spark/DuckDB round()
        codes = [
            int(math.floor(v / scale + 0.5))
            if v >= 0
            else -int(math.floor(-v / scale + 0.5))
            for v in xs
        ]
        err = sum(abs(v - c * scale) for v, c in zip(xs, codes)) / len(xs)
        out[vid] = (
            round(scale, 6),
            sum(codes),
            sum(c * c for c in codes),
            round(err, 6),
        )
    return out


def _run(spark, vecs, levels=127):
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    return {
        r.vec_id: (r.scale_r, r.code_sum, r.code_sumsq, r.mean_abs_err_r)
        for r in quantize_embeddings(df, levels=levels).collect()
    }


def test_twin_and_saturation(spark):
    rng = random.Random(3)
    # float32 round-trip: build values that ARE float32-exact so the
    # Python twin (double math) matches the engine's float->double cast
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    vecs = {
        i: [f32(rng.uniform(-2, 2)) for _ in range(16)] for i in range(1, 9)
    }
    vecs[9] = [f32(0.5)] * 8  # constant vector: every code = levels
    got = _run(spark, vecs)
    want = _twin({k: [f32(x) for x in v] for k, v in vecs.items()})
    assert got == want
    # constant vector saturates at exactly +levels per dim
    assert got[9][1] == 127 * 8 and got[9][2] == 127 * 127 * 8


def test_zero_vector(spark):
    got = _run(spark, {1: [0.0, 0.0, 0.0]})
    assert got[1] == (0.0, 0, 0, 0.0)


def test_levels_validation(spark):
    with pytest.raises(ValueError):
        quantize_embeddings(None, levels=0)


def test_error_shrinks_with_levels(spark):
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    rng = random.Random(11)
    vecs = {i: [f32(rng.uniform(-1, 1)) for _ in range(32)] for i in range(4)}
    coarse = _run(spark, vecs, levels=7)
    fine = _run(spark, vecs, levels=127)
    for k in vecs:
        assert fine[k][3] <= coarse[k][3]


# ---------------- product quantization ----------------

import numpy as np

from paralleltrianglecounting_spark.operators.similarity import (
    PQ_M,
    PQ_STRIDE,
    cosine_topk,
    pq_codes,
    pq_reconstructed,
    pq_recall,
)


def _mkemb(spark, mat):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


def _pq_twin(mat, m=PQ_M, stride=PQ_STRIDE):
    """NumPy twin of pq_codes: sample-seeded codebooks, 6-dp-rounded
    L2^2 in the engine's association order, ties to smallest code."""
    mat = np.asarray(mat, dtype=np.float64)
    n, dim = mat.shape
    sub = dim // m
    seeds = [i for i in range(n) if i % stride == 0]
    codes = {}
    for vid in range(n):
        for j in range(m):
            x = mat[vid, j * sub : (j + 1) * sub]
            best = None
            for code, sid in enumerate(seeds):
                c = mat[sid, j * sub : (j + 1) * sub]
                d = round((x @ x - 2 * (x @ c)) + c @ c, 6)
                if best is None or (d, code) < best:
                    best = (d, code)
            codes[(vid, j)] = best[1]
    return codes


def test_pq_codes_match_numpy_twin(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(70, 64))
    got = {
        (r.vec_id, r.sub_id): r.code
        for r in pq_codes(_mkemb(spark, mat), stride=16).collect()
    }
    assert got == _pq_twin(mat, stride=16)


def test_pq_reconstruction_is_codebook_concat(spark):
    rng = np.random.default_rng(4)
    mat = rng.normal(size=(40, 64))
    codes = _pq_twin(mat, stride=8)
    seeds = [i for i in range(40) if i % 8 == 0]
    rec = {
        r.vec_id: np.array(r.embedding)
        for r in pq_reconstructed(_mkemb(spark, mat), stride=8).collect()
    }
    for vid in range(40):
        expect = np.concatenate(
            [mat[seeds[codes[(vid, j)]], j * 8 : (j + 1) * 8] for j in range(8)]
        )
        assert np.array_equal(rec[vid], expect)


def test_pq_recall_perfect_when_every_vector_is_a_seed(spark):
    # stride=1: every vector is its own nearest codebook entry
    # (d = 0), reconstruction is exact, so recall@k must be 1.0
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(30, 64))
    rows = pq_recall(_mkemb(spark, mat), k=3, n_queries=8, stride=1).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.n_exact == 3 and r.n_pq_hits == 3


def test_pq_recall_bounded_and_panel_complete(spark):
    rng = np.random.default_rng(6)
    mat = rng.normal(size=(64, 64))
    rows = pq_recall(_mkemb(spark, mat), k=4, n_queries=10, stride=16).collect()
    assert len(rows) == 10
    assert all(0 <= r.n_pq_hits <= r.n_exact == 4 for r in rows)


# ---------------- RRF fusion ----------------

from paralleltrianglecounting_spark.operators.similarity import (
    RRF_K,
    ivf_ann_topk,
    lsh_ann_topk,
    rrf_fusion,
)


def test_rrf_fusion_matches_python_combination(spark):
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(80, 64))
    emb = _mkemb(spark, mat)
    lsh = {(r.query_id, r.neighbor_id): r.rank
           for r in lsh_ann_topk(emb, k=4, n_queries=6).collect()}
    ivf = {(r.query_id, r.neighbor_id): r.rank
           for r in ivf_ann_topk(emb, k=4, n_queries=6).collect()}
    scores = {}
    for key, rank in lsh.items():
        scores[key] = scores.get(key, 0.0) + 1.0 / (RRF_K + rank)
    for key, rank in ivf.items():
        scores[key] = scores.get(key, 0.0) + 1.0 / (RRF_K + rank)
    expect = {}
    by_q = {}
    for (q, n), s in scores.items():
        by_q.setdefault(q, []).append((round(s, 6), n))
    for q, lst in by_q.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, n) in enumerate(lst[:4], start=1):
            expect[(q, n)] = (s, rank)
    got = {(r.query_id, r.neighbor_id): (r.rrf_r, r.rank)
           for r in rrf_fusion(emb, k=4, n_queries=6).collect()}
    assert got == pytest.approx(expect)


def test_rrf_both_lists_beat_single_list(spark):
    # direct property of the formula on any fixture where some neighbor
    # appears in both lists and another in exactly one
    rng = np.random.default_rng(10)
    emb = _mkemb(spark, rng.normal(size=(60, 64)))
    rows = rrf_fusion(emb, k=5, n_queries=10).collect()
    both = [r for r in rows if abs(r.rrf_r - round(2 / (RRF_K + 1), 6)) < 1e-9]
    # a doc ranked 1 by BOTH retrievers exists and always tops its query
    for r in both:
        assert r.rank == 1


# ---------------- graph summary ----------------


def test_graph_summary_hand_graph(spark):
    from paralleltrianglecounting_spark.operators.degrees import graph_summary

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "src long, dst long"
    )
    r = graph_summary(edges).collect()[0]
    assert (r.n_vertices, r.n_edges, r.min_degree, r.max_degree) == (4, 4, 1, 3)
    assert r.avg_degree_r == pytest.approx(2.0)
    assert r.density_r == pytest.approx(round(8 / (4 * 3), 6))
