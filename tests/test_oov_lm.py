"""OOV rate and bigram-LM scoring: Python twins + edge cases."""

from __future__ import annotations

import math
import random
import re
from collections import Counter

from paralleltrianglecounting_spark.operators.text import bigram_lm_scores, oov_rate


def _toks(t: str) -> list[str]:
    return [x for x in re.split(r"[ \t\n\x0b\f\r]+", t) if x]


def _oov_py(texts, vocab_size):
    cnt = Counter()
    for t in texts:
        cnt.update(_toks(t))
    vocab = {
        w
        for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    }
    out = {}
    for i, t in enumerate(texts):
        tk = _toks(t)
        frac = sum(1 for w in tk if w not in vocab) / len(tk) if tk else 0.0
        out[i] = (len(tk), round(frac, 6))
    return out


def _lm_py(texts, add_k=0.5):
    cb: Counter = Counter()
    vocab = set()
    for t in texts:
        tk = _toks(t)
        vocab.update(tk)
        cb.update(zip(tk, tk[1:]))
    cu = Counter()
    for (w1, _), c in cb.items():
        cu[w1] += c
    v = len(vocab)
    out = {}
    for i, t in enumerate(texts):
        tk = _toks(t)
        if len(tk) < 2:
            continue
        lps = [
            math.log((cb[(a, b)] + add_k) / (cu[a] + add_k * v))
            for a, b in zip(tk, tk[1:])
        ]
        out[i] = (len(lps), round(sum(lps) / len(lps), 6))
    return out


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cat dog cat dog cat",
    "zzz unique singleton tokens here",
    "",  # empty doc
    "one",  # single token: no bigrams
    "the the the the the the",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_oov_matches_twin(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["oov_frac_r"])
        for r in oov_rate(_df(spark), vocab_size=5).collect()
    }
    assert got == _oov_py(TEXTS, 5)


def test_oov_vocab_tie_break_is_total(spark):
    texts = ["b a", "a b"]  # a and b tie on count; vocab of 1 keeps 'a'
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["oov_frac_r"]
        for r in oov_rate(df, vocab_size=1).collect()
    }
    assert got == {0: 0.5, 1: 0.5}


def test_lm_matches_twin(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp_r"])
        for r in bigram_lm_scores(_df(spark)).collect()
    }
    want = _lm_py(TEXTS)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) <= 1e-6, (d, got[d], want[d])


def test_lm_repetitive_doc_scores_higher(spark):
    got = {
        r["doc_id"]: r["avg_logp_r"]
        for r in bigram_lm_scores(_df(spark)).collect()
    }
    # "the the ..." bigram dominates its context -> highest avg log-prob;
    # the alternating cat/dog doc beats the mixed-context sentences
    assert got[6] == max(got.values())
    assert got[2] > got[0]


def test_lm_random_matches_twin(spark):
    rng = random.Random(0xA7)
    vocab = ["w%d" % j for j in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(10)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp_r"])
        for r in bigram_lm_scores(df).collect()
    }
    want = _lm_py(texts)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) <= 1e-6
