"""Suffix ranking by prefix doubling (operators/suffix.py): brute
Python twins for truncated and full suffix order, cross-doc tie
semantics, prefix-sorts-first, and parallelism determinism."""

from __future__ import annotations

import random

import pytest

from paralleltrianglecounting_spark.operators.suffix import (
    suffix_ranks,
    token_positions,
)


def _twin(toks: dict[int, list[str]], depth: int | None):
    sufs = [
        ((d, p), tuple(t[p:] if depth is None else t[p : p + depth]))
        for d, t in toks.items()
        for p in range(len(t))
    ]
    order = sorted(set(s for _, s in sufs))
    rk = {s: i for i, s in enumerate(order)}
    return {(d, p): rk[s] for (d, p), s in sufs}


def _run(spark, toks, **kw):
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks.items()],
        "doc_id long, text string",
    )
    return {
        (r.doc_id, r.pos): r.rank
        for r in suffix_ranks(docs, **kw).collect()
    }


def test_suffix_ranks_banana_hand_case(spark):
    toks = {0: list("banana"), 1: list("anab"), 2: []}
    assert _run(spark, toks, rounds=4) == _twin(toks, 16)


def test_suffix_ranks_random_corpus_twin(spark):
    rng = random.Random(5)
    toks = {
        d: [rng.choice("ab") for _ in range(rng.randint(0, 30))]
        for d in range(8)
    }
    # binary alphabet maximizes deep ties: truncation genuinely binds
    for rounds in (2, 4):
        assert _run(spark, toks, rounds=rounds) == _twin(toks, 1 << rounds)


def test_suffix_ranks_until_unique_is_true_suffix_order(spark):
    rng = random.Random(9)
    toks = {
        d: [rng.choice("abc") for _ in range(rng.randint(1, 16))]
        for d in range(6)
    }
    got = _run(spark, toks, rounds=0, until_unique=True)
    # full suffix order still has CROSS-DOC ties when two suffixes are
    # token-identical; the twin with depth=None models exactly that
    assert got == _twin(toks, None)


def test_suffix_ranks_cross_doc_equal_suffixes_share_rank(spark):
    toks = {0: ["x", "y", "z"], 1: ["y", "z"]}
    got = _run(spark, toks, rounds=3)
    assert got[(0, 1)] == got[(1, 0)]  # "y z" == "y z"
    assert got[(0, 2)] == got[(1, 1)]  # "z" == "z"


def test_suffix_ranks_prefix_sorts_first(spark):
    # suffix "a" is a proper prefix of "a a": it must rank strictly lower
    toks = {0: ["a", "a"]}
    got = _run(spark, toks, rounds=2)
    assert got[(0, 1)] < got[(0, 0)]


def test_suffix_ranks_parallelism_determinism(spark):
    rng = random.Random(3)
    toks = {
        d: [rng.choice("ab") for _ in range(24)] for d in range(6)
    }
    a = _run(spark, toks, rounds=3, n_parts=1)
    b = _run(spark, toks, rounds=3, n_parts=16)
    assert a == b


def test_suffix_ranks_validation(spark):
    with pytest.raises(ValueError):
        _run(spark, {0: ["a"]}, rounds=-1)


def test_token_positions_shape(spark, sf_tiny):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    tp = token_positions(docs)
    row = tp.where("pos = 0").limit(1).collect()[0]
    assert row.token != ""


def _dup_twin(toks: dict[int, list[str]], rounds: int):
    want = {}
    depths = [1 << j for j in range(rounds + 1)]
    all_pos = [(d, p) for d, t in toks.items() for p in range(len(t))]
    for d, p in all_pos:
        best = 0
        for depth in depths:
            span = tuple(toks[d][p : p + depth])
            n = sum(
                1
                for d2, p2 in all_pos
                if tuple(toks[d2][p2 : p2 + depth]) == span
            )
            if n >= 2:
                best = depth
        want[(d, p)] = best
    return want


def test_dup_prefix_depths_hand_case(spark):
    from paralleltrianglecounting_spark.operators.suffix import (
        dup_prefix_depths,
    )

    # docs 0 and 1 share the 4-token run "a b c d"; "q" is unique
    toks = {0: ["a", "b", "c", "d", "q"], 1: ["x", "a", "b", "c", "d"]}
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks.items()],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.pos): r.dup_len
        for r in dup_prefix_depths(docs, rounds=3).collect()
    }
    assert got == _dup_twin(toks, 3)
    assert got[(0, 0)] == 4  # "a b c d" occurs in doc 1 — but not 8 long
    assert got[(0, 4)] == 0  # "q" unique corpus-wide


def test_dup_prefix_depths_random_twin(spark):
    from paralleltrianglecounting_spark.operators.suffix import (
        dup_prefix_depths,
    )

    rng = random.Random(13)
    toks = {
        d: [rng.choice("ab") for _ in range(rng.randint(0, 24))]
        for d in range(7)
    }
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks.items()],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.pos): r.dup_len
        for r in dup_prefix_depths(docs, rounds=4).collect()
    }
    assert got == _dup_twin(toks, 4)
