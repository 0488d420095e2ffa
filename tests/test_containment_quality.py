"""ngram_containment (anchor-vs-posting blocking), lsh_dedup_recall
(LSH-vs-exact audit), quality_filtered_docs (per-lang quantile filter):
brute-force twins, the containment recall guarantee, cap regimes."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from paralleltrianglecounting_spark.operators.dedup import (
    lsh_dedup_recall,
    minhash_lsh_candidates,
    ngram_containment,
)
from paralleltrianglecounting_spark.operators.text import (
    quality_filtered_docs,
    quality_scores,
)
from paralleltrianglecounting_spark.plans.lint import assert_no_scalar_python


def _mkdocs(spark, rows, langs=None):
    langs = langs or ["en"] * len(rows)
    return spark.createDataFrame(
        [(i, t, langs[i], "s", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _grams(text, n=3):
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))
            if len(toks) >= n}


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def test_containment_full_is_guaranteed_and_asymmetric(spark):
    # A embedded verbatim inside a much longer B: grams(A) ⊆ grams(B),
    # so the anchor-vs-posting blocking MUST recall (A, B) — A's
    # smallest gram hash is one of B's postings by construction.
    # (Bottom-k anchors on both sides have no such guarantee: B's
    # bottom-k drifts to ever-smaller hashes as B grows.)
    rng = np.random.default_rng(7)
    a_text = "quick brown fox jumps over lazy dog"
    filler = " ".join(rng.choice(WORDS, size=120))
    b_text = filler + " " + a_text + " " + " ".join(rng.choice(WORDS, size=80))
    others = [" ".join(rng.choice(WORDS, size=30)) for _ in range(6)]
    docs = _mkdocs(spark, [a_text, b_text] + others)
    got = {(r.doc_a, r.doc_b): r.containment_r
           for r in ngram_containment(docs, threshold=0.5).collect()}
    assert got.get((0, 1)) == pytest.approx(1.0)

    # emitted scores all equal the brute-force containment, and the
    # reverse direction (B in A) is nowhere near threshold
    texts = [a_text, b_text] + others
    g = [_grams(t) for t in texts]
    for (x, y), c in got.items():
        assert c == pytest.approx(
            round(len(g[x] & g[y]) / max(len(g[x]), 1), 6), abs=1e-9
        )
    assert len(g[1] & g[0]) / len(g[1]) < 0.5
    assert (1, 0) not in got


def test_containment_posting_cap_engages(spark):
    # every doc shares every gram -> every posting list has 4 docs;
    # max_posting=3 drops them all -> no candidates at all
    same = "one two three four five six"
    docs = _mkdocs(spark, [same] * 4)
    assert ngram_containment(docs, threshold=0.1, max_posting=3).count() == 0
    # with the cap lifted the 4 exact-dup docs pair up fully (12 ordered)
    assert ngram_containment(docs, threshold=0.1, max_posting=10).count() == 12


def test_lsh_dedup_recall_single_row_math(spark):
    # three BASE variants with pairwise token-set Jaccard >= 0.7 (LSH
    # at 8 bands x 2 rows finds these with near-certainty and the
    # deterministic hash family makes "near-certainty" reproducible),
    # plus unrelated docs far below 0.5
    base = ("quick brown fox jumps over lazy dog near old stone bridge "
            "while rain falls on quiet village roofs tonight")
    variants = [base, base.replace("fox", "cat"), base.replace("dog", "owl")]
    noise = ["spark shuffle partition codegen exchange plan catalyst tungsten",
             "duck oracle quantile checksum parquet arrow batch column"]
    texts = variants + noise
    docs = _mkdocs(spark, texts)

    toks = [set(t.split()) for t in texts]
    true_pairs = {
        (a, b)
        for a, b in combinations(range(len(texts)), 2)
        # same (lang, len//10) block is required for the truth universe
        if len(texts[a].split()) // 10 == len(texts[b].split()) // 10
        and round(len(toks[a] & toks[b]) / len(toks[a] | toks[b]), 6) >= 0.5
    }
    lsh_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(docs, threshold=0.5).collect()
    }
    rows = lsh_dedup_recall(docs, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_true == len(true_pairs)
    assert r.n_lsh == len(lsh_pairs)
    assert r.n_hit == len(true_pairs & lsh_pairs)
    assert r.recall_r == pytest.approx(
        round(r.n_hit / max(r.n_true, 1), 6), abs=1e-9
    )
    # the high-similarity fixture: every labelable pair is found
    assert r.n_true >= 3 and r.recall_r == pytest.approx(1.0)


def test_quality_filtered_matches_numpy_quantile(spark):
    # per-lang cutoffs with a non-integral quantile index so the
    # linear interpolation path is exercised in both engines
    rng = np.random.default_rng(11)
    texts, langs = [], []
    for lang, lo, hi in [("en", 5, 60), ("de", 3, 25)]:
        for _ in range(7):
            nw = int(rng.integers(lo, hi))
            texts.append(" ".join(rng.choice(WORDS + ["the", "of"], size=nw)))
            langs.append(lang)
    docs = _mkdocs(spark, texts, langs)
    scores = {r.doc_id: r.quality_r for r in quality_scores(docs).collect()}
    kept = {(r.doc_id, r.lang, r.quality_r)
            for r in quality_filtered_docs(docs, q=0.4).collect()}
    expect = set()
    for lang in ("en", "de"):
        ids = [i for i in range(len(texts)) if langs[i] == lang]
        vals = np.array([scores[i] for i in ids])
        cut = np.quantile(vals, 0.4, method="linear")
        expect |= {(i, lang, scores[i]) for i in ids if scores[i] >= cut}
    assert kept == expect
    # the filter keeps roughly the top 60% per language, never everything
    assert 0 < len(kept) < len(texts)


def test_new_doc_plans_are_python_free(spark):
    docs = _mkdocs(spark, ["alpha beta gamma delta epsilon zeta"] * 3)
    for df in (
        ngram_containment(docs),
        lsh_dedup_recall(docs),
        quality_filtered_docs(docs),
    ):
        assert_no_scalar_python(df)
