"""dup_ngram_spans: hand cases + Python twin (Lee et al. exact
duplicated-window semantics: cross-doc duplication, intra-doc
multiplicity counted, short docs keep a zero row)."""

from __future__ import annotations

import random

from paralleltrianglecounting_spark.operators.text import dup_ngram_spans

N = 3


def _twin(docs: dict[int, str], n: int = N) -> dict[int, tuple[int, int, float]]:
    grams: dict[int, list[tuple]] = {}
    for d, text in docs.items():
        toks = [t for t in text.split() if t]
        grams[d] = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    by_gram: dict[tuple, set[int]] = {}
    for d, gs in grams.items():
        for g in gs:
            by_gram.setdefault(g, set()).add(d)
    out = {}
    for d, gs in grams.items():
        nw = len(gs)
        nd = sum(1 for g in gs if len(by_gram[g]) >= 2)
        out[d] = (nw, nd, round(nd / nw, 6) if nw else 0.0)
    return out


def _run(spark, docs: dict[int, str], n: int = N):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_fraction_r"])
        for r in dup_ngram_spans(df, n=n).collect()
    }


def test_shared_run_flags_both_docs(spark):
    docs = {
        1: "a b c d e unique tail one",
        2: "prefix two a b c d e",
        3: "completely different text here now",
        4: "x y",  # < n tokens: zero row
    }
    got = _run(spark, docs)
    want = _twin(docs)
    want[4] = (0, 0, 0.0)
    assert got == want
    # the shared 5-token run 'a b c d e' yields 3 shared 3-grams
    assert got[1][1] == 3 and got[2][1] == 3
    assert got[3] == (3, 0, 0.0)


def test_intra_doc_multiplicity_counts(spark):
    # doc 1 contains the shared gram twice: both windows are duplicated
    docs = {1: "a b c z a b c", 2: "a b c"}
    got = _run(spark, docs)
    assert got[1][0] == 5 and got[1][1] == 2
    assert got[2] == (1, 1, 1.0)


def test_within_doc_repeat_alone_is_not_duplication(spark):
    # gram repeats inside ONE doc only: cross-doc rule says not duplicated
    docs = {1: "a b c z a b c", 2: "q r s"}
    got = _run(spark, docs)
    assert got[1][1] == 0 and got[2][1] == 0


def test_fuzz_vs_twin(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        docs = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18)))
            for d in range(1, 11)
        }
        want = _twin(docs)
        for d, text in docs.items():
            if len([t for t in text.split() if t]) < N:
                want[d] = (0, 0, 0.0)
        assert _run(spark, docs) == want, f"trial {trial}"


# ---- dup_span_runs: the span structure (gaps-and-islands) ----

from paralleltrianglecounting_spark.operators.text import dup_span_runs


def _runs_twin(docs: dict[int, str], n: int = N) -> dict[int, tuple[int, int]]:
    grams: dict[int, list[tuple]] = {}
    for d, text in docs.items():
        toks = [t for t in text.split() if t]
        grams[d] = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    by_gram: dict[tuple, set[int]] = {}
    for d, gs in grams.items():
        for g in gs:
            by_gram.setdefault(g, set()).add(d)
    out = {}
    for d, gs in grams.items():
        flags = [len(by_gram[g]) >= 2 for g in gs]
        runs = []
        cur = 0
        for f in flags:
            if f:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        out[d] = (len(runs), max(runs) + n - 1 if runs else 0)
    return out


def _run_spans(spark, docs: dict[int, str], n: int = N):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_runs"], r["max_dup_span_tokens"])
        for r in dup_span_runs(df, n=n).collect()
    }


def test_two_separated_runs(spark):
    # doc 1 shares 'a b c d' (2 dup windows -> 4-token span) and
    # 'x y z' (1 window -> 3-token span), separated by unique text
    docs = {
        1: "a b c d q1 q2 q3 x y z",
        2: "a b c d",
        3: "x y z",
    }
    got = _run_spans(spark, docs)
    assert got[1] == (2, 4)
    assert got[2] == (1, 4)
    assert got[3] == (1, 3)


def test_full_doc_duplicated_and_clean_doc(spark):
    docs = {1: "a b c d e", 2: "a b c d e", 3: "u v w p q"}
    got = _run_spans(spark, docs)
    # every window duplicated: one run covering the whole doc
    assert got[1] == (1, 5) and got[2] == (1, 5)
    assert got[3] == (0, 0)


def test_short_doc_zero_row(spark):
    docs = {1: "a b", 2: "a b c x y"}
    got = _run_spans(spark, docs)
    assert got[1] == (0, 0)
    assert 2 in got


def test_runs_fuzz_vs_twin(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        for d in range(1, 21)
    }
    got = _run_spans(spark, docs)
    want = _runs_twin(docs)
    for d, text in docs.items():
        if len([t for t in text.split() if t]) < N:
            want[d] = (0, 0)
    assert got == want
