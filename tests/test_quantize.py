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
