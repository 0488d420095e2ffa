"""Sketch operators (operators/sketches.py): HyperLogLog registers /
estimate and the Count-Min frequency sketch.

Properties pinned:
- HLL registers match a driver-side stdlib twin exactly (same
  md5-derived hash56, same trailing-zeros observable);
- the HLL estimate is within the sketch's theoretical error band of
  the exact distinct count on the real fixture (and exactly equal to
  the NumPy twin's float);
- registers are duplicate-insensitive (sketching the doubled corpus
  changes nothing) and mergeable (register-wise max of shard sketches
  == sketch of the union);
- CMS estimates dominate exact counts (est >= exact, the one-sided
  guarantee) and equal them for every token when width >> vocabulary;
- CMS registers are mergeable by register-wise sum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from paralleltrianglecounting_spark.operators.sketches import (
    HLL_P,
    cms_heavy_hitters,
    cms_registers,
    hll_estimate,
    hll_estimate_numpy,
    hll_registers,
)
from paralleltrianglecounting_spark.operators.text import tokens


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hll_registers_match_stdlib_twin(spark, sf_tiny):
    docs = _docs(spark, sf_tiny)
    got = {
        (r["lang"], r["register"]): r["max_rho"]
        for r in hll_registers(docs).collect()
    }
    rows = docs.select("lang", tokens(F.col("text")).alias("t")).collect()
    by_lang: dict[str, list[str]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).extend(r["t"])
    import hashlib

    m = 1 << HLL_P
    want: dict[tuple[str, int], int] = {}
    for lang, toks in by_lang.items():
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:14], 16)
            idx, w = h % m, h >> HLL_P
            rho = (56 - HLL_P + 1) if w == 0 else (w & -w).bit_length()
            key = (lang, idx)
            want[key] = max(want.get(key, 0), rho)
    assert got == want


def test_hll_estimate_within_error_band(spark, sf_tiny):
    docs = _docs(spark, sf_tiny)
    est = {
        r["lang"]: r["n_distinct_est"]
        for r in hll_estimate(hll_registers(docs)).collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in docs.select(
            "lang", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    # 256 registers -> sigma ~ 6.5%; allow 4 sigma
    for lang, n in exact.items():
        assert est[lang] == pytest.approx(n, rel=0.26), (lang, est[lang], n)
    # and the Spark float equals the stdlib twin's float (same formula,
    # both summing 256 doubles of the form 2^-k — order-insensitive
    # within double precision at these magnitudes)
    rows = docs.select("lang", tokens(F.col("text")).alias("t")).collect()
    by_lang: dict[str, list[str]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).extend(r["t"])
    twin = hll_estimate_numpy(by_lang)
    for lang in exact:
        assert est[lang] == pytest.approx(twin[lang], rel=1e-9)


def test_hll_duplicate_insensitive_and_mergeable(spark, sf_tiny):
    docs = _docs(spark, sf_tiny)
    one = hll_registers(docs)
    doubled = hll_registers(docs.unionAll(docs))
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, doubled.collect())
    )
    # merge = register-wise max across shard sketches
    a = hll_registers(docs.where(F.col("doc_id") % 2 == 0))
    b = hll_registers(docs.where(F.col("doc_id") % 2 == 1))
    merged = (
        a.unionAll(b)
        .groupBy("lang", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_cms_overestimates_and_exact_when_wide(spark, sf_tiny):
    docs = _docs(spark, sf_tiny)
    hh = cms_heavy_hitters(docs, k=20).collect()
    assert len(hh) == 20  # the sf0.001 vocabulary has 31 tokens
    assert all(r["cms_est"] >= r["exact_cnt"] for r in hh)
    # 31 tokens over 4x512 counters: no row collides on this fixture,
    # so min-of-rows recovers the exact count (deterministic hash)
    assert all(r["cms_est"] == r["exact_cnt"] for r in hh)
    # ranks are 1..k and ordered by exact count desc
    ranked = sorted(hh, key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == list(range(1, 21))
    cnts = [r["exact_cnt"] for r in ranked]
    assert cnts == sorted(cnts, reverse=True)


def test_cms_registers_mergeable_and_mass_preserving(spark, sf_tiny):
    docs = _docs(spark, sf_tiny)
    full = cms_registers(docs)
    # every depth row carries the whole stream: per-r mass == N tokens
    n_tokens = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t")).count()
    )
    per_r = {
        r["r"]: r["s"]
        for r in full.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(per_r) == {0, 1, 2, 3}
    assert all(v == n_tokens for v in per_r.values())
    # merge = register-wise sum of shard sketches
    a = cms_registers(docs.where(F.col("doc_id") % 2 == 0))
    b = cms_registers(docs.where(F.col("doc_id") % 2 == 1))
    merged = (
        a.unionAll(b).groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )


# --- ann_recall (operators/similarity.py) ---------------------------------


def test_ann_recall_bounds_and_consistency(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        lsh_ann_topk,
    )

    emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
    rows = ann_recall(emb, k=5, n_queries=20).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_lsh_hits"] <= r["n_exact"]
        assert 0 <= r["n_ivf_hits"] <= r["n_exact"]
    # on near-random synthetic embeddings both indexes still recover a
    # meaningful fraction (measured ~0.5 at sf0.001) — pin a floor so a
    # broken candidate path (recall ~ n_probe/|cells|) fails loudly
    total = sum(r["n_exact"] for r in rows)
    assert sum(r["n_lsh_hits"] for r in rows) / total >= 0.3
    assert sum(r["n_ivf_hits"] for r in rows) / total >= 0.3
    # cross-check one leg by hand: hits == |exact ∩ approx| per query
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, k=5, n_queries=20).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_ann_topk(emb, k=5, n_queries=20).collect()
    }
    want = {}
    for q, n in exact & lsh:
        want[q] = want.get(q, 0) + 1
    got = {r["query_id"]: r["n_lsh_hits"] for r in rows}
    assert {q: c for q, c in got.items() if c} == want


# --- bloom_contamination (operators/sketches.py) ---------------------------


def test_bloom_contamination_superset_of_exact(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.sampling import dataset_split
    from paralleltrianglecounting_spark.operators.sketches import (
        BLOOM_N,
        _doc_grams,
        bloom_contamination,
    )

    docs = _docs(spark, sf_tiny)
    rows = bloom_contamination(docs).collect()
    assert rows
    for r in rows:
        # one-sided guarantee: no false negatives, FPs allowed
        assert r["n_bloom_hits"] >= r["n_exact_hits"]
        assert r["n_grams"] >= r["n_bloom_hits"]
    # exact side cross-checked against a direct semi-join recomputation
    split = dataset_split(docs).select("doc_id", "split")
    labeled = docs.join(split, "doc_id")
    test_g = (
        _doc_grams(labeled.where(F.col("split") == "test"), BLOOM_N)
        .select("gram")
        .distinct()
    )
    train_g = _doc_grams(labeled.where(F.col("split") == "train"), BLOOM_N)
    want = {
        r["doc_id"]: r["n"]
        for r in train_g.join(test_g, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["doc_id"]: r["n_exact_hits"] for r in rows}
    assert {d: n for d, n in got.items() if n} == want
