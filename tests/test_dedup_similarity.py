"""Dedup + similarity: MinHash-LSH recall vs exact Jaccard, SimHash
sanity, ANN recall vs brute force, plan linting."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from paralleltrianglecounting_spark.operators.similarity import (
    cosine_topk,
    lsh_ann_topk,
)
from paralleltrianglecounting_spark.plans.lint import assert_no_scalar_python


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


BASE = "the quick brown fox jumps over the lazy dog near the old stone bridge today"


def test_exact_duplicates(spark):
    docs = _mkdocs(spark, [BASE, BASE, "something else entirely", BASE + " extra"])
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2 and groups[0].min_doc_id == 0


def test_minhash_finds_high_jaccard_pairs(spark):
    """LSH with 4 bands × 4 rows: pairs with Jaccard ≥ ~0.7 are found
    with near-certainty; verified pairs must carry exact Jaccard."""
    variants = [BASE] + [BASE.replace("fox", w) for w in ["cat", "owl"]] + [
        "completely different text about spark query engines and shuffles",
        BASE.replace("the", "a"),
    ]
    docs = _mkdocs(spark, variants)
    got = {
        (r.doc_a, r.doc_b): r.jaccard_r
        for r in minhash_lsh_candidates(docs, threshold=0.5).collect()
    }
    # exact jaccard oracle
    toks = [set(t.split()) for t in variants]
    exact = {
        (a, b): len(toks[a] & toks[b]) / len(toks[a] | toks[b])
        for a, b in combinations(range(len(variants)), 2)
    }
    high = {p for p, j in exact.items() if j >= 0.7}
    assert high <= set(got)  # recall on high-sim pairs
    for p, j in got.items():
        assert j == pytest.approx(exact[p], abs=1e-6)  # exact verify step
        assert j >= 0.5


def test_simhash_similar_docs_close(spark):
    docs = _mkdocs(spark, [BASE, BASE.replace("fox", "cat"),
                           "unrelated words entirely distinct vocabulary zone"])
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sh[0], sh[1]) < ham(sh[0], sh[2])
    # pigeonhole recall guarantee: radius >= actual distance must find it
    radius = max(ham(sh[0], sh[1]), 1)
    pairs = simhash_near_duplicates(docs, max_hamming=radius).collect()
    assert any((p.doc_a, p.doc_b) == (0, 1) for p in pairs)
    for p in pairs:
        assert p.hamming <= radius


def test_ngram_jaccard(spark):
    docs = _mkdocs(spark, [BASE, BASE, "tiny"])
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    assert [(p.doc_a, p.doc_b, p.jaccard_r) for p in pairs] == [(0, 1, 1.0)]


def test_ann_recall_vs_brute_force(spark, sf_tiny):
    emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
    exact = cosine_topk(emb, k=5, n_queries=10).collect()
    approx = lsh_ann_topk(emb, k=5, n_queries=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # recall over queries: LSH on near-random vectors won't be perfect,
    # but must beat random-bucket chance by a wide margin
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.2
    # every approx hit must carry the exact cosine of the true pair
    exact_all = {(r.query_id, r.neighbor_id): r.cos_r for r in
                 cosine_topk(emb, k=10**6, n_queries=10).collect()}
    for r in approx:
        assert r.cos_r == pytest.approx(exact_all[(r.query_id, r.neighbor_id)], abs=1e-9)


def test_contract_queries_have_no_scalar_python(spark, sf_tiny):
    import __spark_entry__ as m

    for name, fn in m.queries().items():
        assert_no_scalar_python(fn(spark, sf_tiny), context=name)


def test_lint_catches_scalar_udf(spark):
    bad_udf = F.udf(lambda x: x + 1, "long")
    df = spark.range(5).select(bad_udf(F.col("id")).alias("y"))
    with pytest.raises(AssertionError, match="BatchEvalPython"):
        assert_no_scalar_python(df, context="negative-case")


def test_simhash_bucket_cap_engages_on_degenerate_corpus(spark):
    """VERDICT r03 item: a corpus collapsing to one chunk fingerprint
    must not go quadratic — buckets over max_bucket are dropped from
    candidate generation (and the DuckDB oracle applies the same cap,
    so the gate stays exact either way)."""
    # 12 identical docs: every chunk bucket has 12 members
    docs = _mkdocs(spark, [BASE] * 12)
    # cap below the bucket size -> zero candidates survive
    assert simhash_near_duplicates(docs, max_hamming=3, max_bucket=4).count() == 0
    # cap above -> all C(12,2)=66 identical pairs found at hamming 0
    pairs = simhash_near_duplicates(docs, max_hamming=3, max_bucket=100).collect()
    assert len(pairs) == 66 and all(p.hamming == 0 for p in pairs)


def test_simhash_is_56_bit_and_matches_brute_force_recall(spark):
    """56-bit width: hashes use high bits beyond 32, and chunk blocking
    at max_hamming=3 (14-bit chunk keys) still finds exactly the pairs
    a brute-force hamming scan finds (pigeonhole recall)."""
    from paralleltrianglecounting_spark.operators.dedup import SIMHASH_BITS

    assert SIMHASH_BITS == 56
    texts = [BASE] + [BASE.replace("fox", w) for w in ["cat", "owl", "elk"]] + [
        "completely different text about spark query engines and shuffles",
        "another unrelated document concerning parquet column pruning",
    ]
    docs = _mkdocs(spark, texts)
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert any(v > (1 << 32) for v in sh.values())  # high bits in use
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    for radius in (3, 10):
        want = {
            (a, b)
            for a, b in combinations(sorted(sh), 2)
            if ham(sh[a], sh[b]) <= radius
        }
        got = {
            (p.doc_a, p.doc_b)
            for p in simhash_near_duplicates(docs, max_hamming=radius).collect()
        }
        assert got == want, (radius, got, want)


def test_ngram_block_cap_engages_on_degenerate_corpus(spark):
    """VERDICT r03 item: a same-length same-lang corpus all lands in one
    (lang, bucket) block; over max_block the block is dropped (reported
    by ngram_oversized_blocks) instead of going quadratic."""
    from paralleltrianglecounting_spark.operators.dedup import ngram_oversized_blocks

    docs = _mkdocs(spark, [BASE] * 10)  # identical -> one block of 10
    assert ngram_jaccard_pairs(docs, threshold=0.3, max_block=4).count() == 0
    audit = ngram_oversized_blocks(docs, max_block=4).collect()
    assert len(audit) == 1 and audit[0].n_docs == 10
    # over-the-size cap: all 45 identical pairs at jaccard 1.0
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, max_block=100).collect()
    assert len(pairs) == 45 and all(p.jaccard_r == 1.0 for p in pairs)
    assert ngram_oversized_blocks(docs, max_block=100).count() == 0
