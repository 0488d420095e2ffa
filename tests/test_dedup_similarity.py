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


def _left_fold_cos(a, b):
    """Cosine with strict left-to-right accumulation — the order Spark's
    F.aggregate fold uses, so the twin reproduces the engine's doubles
    bit-for-bit (NumPy dot's pairwise summation would differ in the last
    ulp and could flip a 6-dp rounding boundary)."""
    dot = nrm_a = nrm_b = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        nrm_a += x * x
    for y in b:
        nrm_b += y * y
    return dot / (nrm_a ** 0.5 * nrm_b ** 0.5)


def _round_half_up(x, dp=6):
    import math

    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 10**dp + 0.5) / 10**dp


def test_ivf_assignment_matches_python_twin(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.similarity import (
        _as_double,
        _ivf_assign,
        _ivf_centroids,
    )

    emb_df = _as_double(
        spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
    ).select("vec_id", "embedding")
    cent_df = _ivf_centroids(emb_df, stride=32, lloyd_rounds=0, dim=64)
    got = {
        r.vec_id: r.cell_id for r in _ivf_assign(emb_df, cent_df).collect()
    }
    emb = {r.vec_id: r.embedding for r in emb_df.collect()}
    cents = {v: e for v, e in emb.items() if v % 32 == 0}
    for vid, e in emb.items():
        scored = sorted(
            ((-_round_half_up(_left_fold_cos(e, ce)), cid)
             for cid, ce in cents.items())
        )
        assert got[vid] == scored[0][1], vid


def test_ivf_recall_and_exact_scores(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.similarity import ivf_ann_topk

    emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
    exact = cosine_topk(emb, k=5, n_queries=10).collect()
    approx = ivf_ann_topk(emb, k=5, n_queries=10).collect()
    # assignment is unique + probed cells distinct => pairs unique
    pairs = [(r.query_id, r.neighbor_id) for r in approx]
    assert len(pairs) == len(set(pairs))
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # 4 of 16 cells probed: must beat the 25% random-scan floor's chance
    assert sum(recalls) / len(recalls) >= 0.2
    exact_all = {
        (r.query_id, r.neighbor_id): r.cos_r
        for r in cosine_topk(emb, k=10**6, n_queries=10).collect()
    }
    for r in approx:
        assert r.cos_r == pytest.approx(
            exact_all[(r.query_id, r.neighbor_id)], abs=1e-9
        )


def test_ivf_lloyd_refinement_converges_on_planted_clusters(spark):
    """Two planted clusters around orthogonal axes, one seed in each:
    a single Lloyd round must move each centroid to its cluster's mean
    and the refined assignment must equal the planted membership."""
    import numpy as np

    from paralleltrianglecounting_spark.operators.similarity import (
        _as_double,
        _ivf_assign,
        _ivf_centroids,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(62):  # stride=31 seeds exactly {0, 31}: one per cluster
        base = np.zeros(4)
        base[0 if i % 2 == 0 else 1] = 1.0  # even ids -> e1, odd -> e2
        v = base + 0.05 * rng.standard_normal(4)
        rows.append((i, [float(x) for x in v]))
    emb = _as_double(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    cent = _ivf_centroids(emb, stride=31, lloyd_rounds=1, dim=4)
    got_c = {r.cell_id: np.array(r.c_emb) for r in cent.collect()}
    data = {i: np.array(v) for i, v in rows}
    # expected: after assigning to the raw seeds (0 -> e1-ish, 31 -> e2-ish),
    # each refined centroid is the mean of its members
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    members = {0: [], 31: []}
    for i, v in data.items():
        best = max(
            sorted(members),
            key=lambda c: (_round_half_up(cos(v, data[c])), -c),
        )
        members[best].append(i)
    for cid, mids in members.items():
        want = np.mean([data[i] for i in mids], axis=0)
        assert np.allclose(got_c[cid], want, atol=1e-9), cid
    asg = {r.vec_id: r.cell_id for r in _ivf_assign(emb, cent).collect()}
    assert all(asg[i] == (0 if i % 2 == 0 else 31) for i in data)


def test_dedup_clusters_transitive_and_singletons(spark):
    """A~B and B~C near-dups with A~C below threshold: pair-level dedup
    keeps both A and C, but the cluster pass must put all three in one
    cluster (transitivity via connected components). Exact duplicates
    cluster too; untouched docs are singletons with their own id."""
    from paralleltrianglecounting_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_candidates,
    )

    g = [f"g{i}" for i in range(6)]   # shared by all three
    p = [f"p{i}" for i in range(4)]   # d0∩d1 only
    q = [f"q{i}" for i in range(4)]   # d1∩d2 only
    texts = [
        " ".join(g + p),              # d0: j(0,1) = 10/14 = 0.714
        " ".join(g + p + q),          # d1: j(1,2) = 10/14 = 0.714
        " ".join(g + q),              # d2: j(0,2) = 6/14 = 0.429 < 0.5
        "completely different content about bridges",  # d3
        "completely different content about bridges",  # d4 = exact dup of d3
        "another lonely unique document",              # d5
    ]
    docs = _mkdocs(spark, texts)
    pairs = {
        (p.doc_a, p.doc_b)
        for p in minhash_lsh_candidates(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and (1, 2) in pairs, pairs
    assert (0, 2) not in pairs  # transitivity is NOT a direct pair
    got = {
        r.doc_id: (r.cluster_id, r.n_members)
        for r in dedup_clusters(docs, threshold=0.5).collect()
    }
    assert got == {
        0: (0, 3), 1: (0, 3), 2: (0, 3),
        3: (3, 2), 4: (3, 2),
        5: (5, 1),
    }, got


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from paralleltrianglecounting_spark.operators.text import tfidf_top_terms

    docs = _mkdocs(
        spark,
        [
            "apple apple banana shared",
            "banana cherry shared",
            "cherry cherry cherry shared",
        ],
    )
    got = {
        (r.doc_id, r.rank): (r.term, r.tfidf_r)
        for r in tfidf_top_terms(docs, k=2).collect()
    }

    def tfidf(tf, df, n=3):
        v = tf * math.log((n + 1.0) / (df + 1.0))
        return math.floor(abs(v) * 1e6 + 0.5) / 1e6 * (1 if v >= 0 else -1)

    # d0: apple tf=2 df=1 -> top; banana tf=1 df=2 second
    assert got[(0, 1)] == ("apple", tfidf(2, 1))
    assert got[(0, 2)] == ("banana", tfidf(1, 2))
    # d2: cherry tf=3 df=2 dominates; 'shared' df=3 -> idf=0 -> score 0
    assert got[(2, 1)] == ("cherry", tfidf(3, 2))
    assert got[(2, 2)] == ("shared", 0.0)
    # d1: banana and cherry tie (tf=1, df=2) -> term asc breaks the tie
    assert got[(1, 1)] == ("banana", tfidf(1, 2))
    assert got[(1, 2)] == ("cherry", tfidf(1, 2))


def test_contamination_check_flags_planted_eval_leak(spark):
    from paralleltrianglecounting_spark.operators.dedup import contamination_check

    bench = _mkdocs(spark, ["alpha beta gamma delta epsilon zeta"])
    corpus_rows = [
        # quotes a 5-token benchmark span: trigrams "alpha beta gamma",
        # "beta gamma delta", "gamma delta epsilon" -> 3 shared
        "intro words then alpha beta gamma delta epsilon closing",
        # one shared trigram only -> below min_overlap=2
        "alpha beta gamma but nothing else matches here at all",
        # nothing shared
        "completely unrelated text with no overlap whatsoever",
    ]
    corpus = spark.createDataFrame(
        [(100 + i, t, "en", "s", len(t)) for i, t in enumerate(corpus_rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    hits = contamination_check(corpus, bench, n=3, min_overlap=2).collect()
    assert [(h.doc_id, h.bench_id, h.shared_grams) for h in hits] == [(100, 0, 3)]
    # min_overlap=1 also surfaces the single-trigram doc
    hits1 = {
        h.doc_id
        for h in contamination_check(corpus, bench, n=3, min_overlap=1).collect()
    }
    assert hits1 == {100, 101}
    # repeated n-grams in the corpus doc count once (distinct semantics)
    rep = spark.createDataFrame(
        [(200, "alpha beta gamma alpha beta gamma", "en", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = contamination_check(rep, bench, n=3, min_overlap=1).collect()
    assert len(r) == 1 and r[0].shared_grams == 1


def test_pmi_collocations_hand_computed(spark):
    import math

    from paralleltrianglecounting_spark.operators.text import pmi_collocations

    # "x y" always adjacent (3x), tokens a/b fill independently;
    # min_count=2 keeps {x y (3), a b (2)} and drops singletons
    docs = _mkdocs(
        spark,
        [
            "x y a b",      # pairs: (x,y) (y,a) (a,b)
            "x y b a",      # pairs: (x,y) (y,b) (b,a)
            "a x y b a b",  # pairs: (a,x) (x,y) (y,b) (b,a) (a,b)
        ],
    )
    got = [
        (r.gram_x, r.gram_y, r.pair_cnt, r.pmi_r)
        for r in pmi_collocations(docs, k=10, min_count=2).collect()
    ]
    t1, t2 = 14.0, 11.0  # tokens, bigram slots
    c = {"x": 3, "y": 3, "a": 4, "b": 4}

    def pmi(cxy, cx, cy):
        v = math.log((cxy * t1 * t1) / (t2 * cx * cy))
        return math.floor(abs(v) * 1e6 + 0.5) / 1e6 * (1 if v >= 0 else -1)

    want = sorted(
        [
            ("x", "y", 3, pmi(3, c["x"], c["y"])),
            ("a", "b", 2, pmi(2, c["a"], c["b"])),
            ("b", "a", 2, pmi(2, c["b"], c["a"])),
            ("y", "b", 2, pmi(2, c["y"], c["b"])),
        ],
        key=lambda r: (-r[3], r[0], r[1]),
    )
    assert got == want, (got, want)


def test_pmi_min_count_and_k_bind(spark):
    from paralleltrianglecounting_spark.operators.text import pmi_collocations

    # "p q p q p q" -> pairs p q:3, q p:2; "r s" -> r s:1
    docs = _mkdocs(spark, ["p q p q p q", "r s", ""])
    assert pmi_collocations(docs, k=5, min_count=4).count() == 0
    only = pmi_collocations(docs, k=5, min_count=3).collect()
    assert [(r.gram_x, r.gram_y, r.pair_cnt) for r in only] == [("p", "q", 3)]
    # k binds: 3 surviving pairs at min_count=1, keep the top 2;
    # r s (count 1 but rare unigrams) outranks the p/q pairs on PMI
    top2 = pmi_collocations(docs, k=2, min_count=1).collect()
    assert len(top2) == 2
    assert (top2[0].gram_x, top2[0].gram_y) == ("r", "s")
    assert top2[0].pmi_r >= top2[1].pmi_r
