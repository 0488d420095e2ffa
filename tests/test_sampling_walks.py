"""Deterministic corpus sampling (dataset_split / balanced_sample),
repetition signals, and hash-driven random walks — engine-side
semantics pinned against hand-computed and pure-Python oracles.

The value-exactness of each vs the DuckDB oracle is the contract
gate's job (driver_sim / correctness_sf); these tests pin the
*semantics* (determinism, partition-invariance, exact fractions,
walk-edge validity) that the SQL twin alone can't distinguish from a
shared bug.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.sampling import (
    balanced_sample,
    dataset_split,
)
from paralleltrianglecounting_spark.operators.text import repetition_scores
from paralleltrianglecounting_spark.operators.walks import random_walks
from paralleltrianglecounting_spark.sources.edges import part_graph


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------- split


def _hash56_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def test_dataset_split_matches_pure_python_hash(spark):
    docs = _docs(spark, [(i, "x", "en") for i in range(200)])
    got = {r.doc_id: (r.bucket, r.split) for r in dataset_split(docs).collect()}
    for i in range(200):
        b = _hash56_py(f"split:{i}") % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert got[i] == (b, want)


def test_dataset_split_stable_under_appends_and_partitioning(spark):
    base = _docs(spark, [(i, "x", "en") for i in range(100)])
    grown = _docs(spark, [(i, "x", "en") for i in range(300)]).repartition(7)
    a = {r.doc_id: r.split for r in dataset_split(base).collect()}
    b = {r.doc_id: r.split for r in dataset_split(grown).collect()}
    assert all(b[k] == v for k, v in a.items())  # no reassignment


def test_dataset_split_rejects_bad_weights(spark):
    docs = _docs(spark, [(1, "x", "en")])
    with pytest.raises(ValueError, match="sum to 100"):
        dataset_split(docs, weights=(50, 30, 10))


# ------------------------------------------------------- balanced sample


def test_balanced_sample_exact_min_stratum_size(spark):
    rows = [(i, "x", "en") for i in range(50)]
    rows += [(100 + i, "x", "de") for i in range(7)]
    rows += [(200 + i, "x", "fr") for i in range(20)]
    out = balanced_sample(_docs(spark, rows)).collect()
    by_lang: dict[str, set[int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert {k: len(v) for k, v in by_lang.items()} == {
        "en": 7, "de": 7, "fr": 7
    }
    # deterministic: same survivors on a different partitioning
    out2 = balanced_sample(_docs(spark, rows).repartition(5)).collect()
    assert {(r.doc_id, r.lang) for r in out2} == {
        (r.doc_id, r.lang) for r in out
    }


# --------------------------------------------------------- repetition


def test_repetition_scores_hand_computed(spark):
    docs = _docs(
        spark,
        [
            # tokens: a b a b a -> 2 distinct of 5; bigrams: "a b"x2,
            # "b a"x2 -> total 4, mx 2, dup 4
            (1, "a b a b a", "en"),
            # all tokens unique, all bigrams unique
            (2, "p q r", "en"),
            # single token: no bigrams -> fractions 0
            (3, "solo", "en"),
            # empty text -> 0 tokens, all fractions 0
            (4, "", "en"),
        ],
    )
    got = {r.doc_id: r for r in repetition_scores(docs).collect()}
    assert got[1].n_tokens == 5
    assert got[1].dup_token_frac_r == pytest.approx(1 - 2 / 5, abs=1e-6)
    assert got[1].top_bigram_frac_r == pytest.approx(2 / 4, abs=1e-6)
    assert got[1].dup_bigram_frac_r == pytest.approx(1.0, abs=1e-6)
    assert got[2].dup_token_frac_r == 0.0
    assert got[2].top_bigram_frac_r == pytest.approx(1 / 2, abs=1e-6)
    assert got[2].dup_bigram_frac_r == 0.0
    assert (got[3].n_tokens, got[3].top_bigram_frac_r) == (1, 0.0)
    assert (got[4].n_tokens, got[4].dup_token_frac_r) == (0, 0.0)
    assert got[4].dup_bigram_frac_r == 0.0


# ------------------------------------------------------------- walks


def _py_walks(edges: list[tuple[int, int]], walk_len: int, seed_mod: int):
    """Sequential oracle: same hash-argmin walk in pure Python."""
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
    out = []
    for seed in sorted(adj):
        if seed % seed_mod != 0:
            continue
        v = seed
        out.append((seed, 0, seed))
        for k in range(1, walk_len + 1):
            v = min(adj[v], key=lambda u: (_hash56_py(f"walk:{seed}:{k}:{u}"), u))
            out.append((seed, k, v))
    return sorted(out)


def test_random_walks_match_sequential_oracle(spark, sf_tiny):
    edges = part_graph(spark, sf_tiny)
    got = sorted(
        (r.walk_id, r.step, r.v)
        for r in random_walks(edges, walk_len=5, seed_mod=8).collect()
    )
    elist = [(r.src, r.dst) for r in edges.collect()]
    assert got == _py_walks(elist, walk_len=5, seed_mod=8)


def test_random_walks_steps_traverse_real_edges(spark, sf_tiny):
    edges = part_graph(spark, sf_tiny)
    w = random_walks(edges, walk_len=3, seed_mod=16)
    eset = {(r.src, r.dst) for r in edges.collect()}
    walks: dict[int, dict[int, int]] = {}
    for r in w.collect():
        walks.setdefault(r.walk_id, {})[r.step] = r.v
    assert walks, "no walks emitted"
    for wid, steps in walks.items():
        assert sorted(steps) == [0, 1, 2, 3]
        assert steps[0] == wid
        for k in range(3):
            a, b = steps[k], steps[k + 1]
            assert (min(a, b), max(a, b)) in eset


def test_random_walks_zero_len_is_seeds_only(spark, sf_tiny):
    edges = part_graph(spark, sf_tiny)
    rows = random_walks(edges, walk_len=0, seed_mod=16).collect()
    assert all(r.step == 0 and r.v == r.walk_id for r in rows)
    with pytest.raises(ValueError, match=">= 0"):
        random_walks(edges, walk_len=-1)


# ----------------------------------------------------------- stats


def test_group_quantiles_exact_and_approx(spark):
    from paralleltrianglecounting_spark.operators.stats import group_quantiles

    rows = [("a", float(x)) for x in range(1, 101)] + [("b", 5.0), ("b", 15.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    exact = {r.g: r for r in group_quantiles(df, "g", "value").collect()}
    # group a: 1..100 -> q25 = 1 + 99*.25 = 25.75, median 50.5
    assert exact["a"].q25_r == pytest.approx(25.75)
    assert exact["a"].q5_r == pytest.approx(50.5)
    assert exact["a"].q75_r == pytest.approx(75.25)
    assert exact["b"].q5_r == pytest.approx(10.0)  # interpolated midpoint
    # sketch path: bounded error vs exact on the big group
    approx = {
        r.g: r
        for r in group_quantiles(df, "g", "value", approx=True).collect()
    }
    assert abs(approx["a"].q5_r - 50.5) <= 2.0


def test_rollup_totals_subtotal_consistency(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.stats import rollup_totals

    orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
    rows = rollup_totals(orders).collect()
    grand = [r for r in rows if r.o_orderstatus is None]
    assert len(grand) == 1 and grand[0].n_orders == orders.count()
    # per-status subtotals sum to the grand total (DECIMAL-exact path)
    lvl1 = [r for r in rows
            if r.o_orderstatus is not None and r.o_orderpriority is None]
    assert sum(r.n_orders for r in lvl1) == grand[0].n_orders
    assert sum(r.total_r for r in lvl1) == pytest.approx(grand[0].total_r, abs=0.02)


def test_sessionize_gap_semantics(spark):
    from datetime import datetime

    from paralleltrianglecounting_spark.operators.stats import sessionize

    t = lambda m: datetime(2026, 1, 1, 12, m)
    rows = [
        (1, t(0)), (1, t(10)), (1, t(41)),   # 31-min gap -> new session
        (1, t(55)),
        (2, t(0)),                            # single-event session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got[(1, 1)] == (t(0), t(10), 2)
    assert got[(1, 2)] == (t(41), t(55), 2)
    assert got[(2, 1)] == (t(0), t(0), 1)
    # exactly 30-min gap does NOT split (strict > semantics)
    df2 = spark.createDataFrame([(3, t(0)), (3, t(30))], "user_id long, ts timestamp")
    r2 = sessionize(df2, gap_minutes=30).collect()
    assert len(r2) == 1 and r2[0].n_events == 2


def test_sliding_window_counts_cover_each_event_twice(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.stats import (
        sliding_window_counts,
    )

    ev = spark.read.parquet(f"{sf_tiny}/events.parquet")
    out = sliding_window_counts(ev).collect()
    # 1h windows sliding by 30min -> every event lands in exactly 2
    assert sum(r.n_events for r in out) == 2 * ev.count()
    # window starts are 30-min aligned
    assert all(r.window_start.minute in (0, 30) and r.window_start.second == 0
               for r in out)


def test_triangle_list_matches_count_and_edges(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.triangles import (
        triangle_count,
        triangle_triples,
    )

    edges = part_graph(spark, sf_tiny)
    triples = [
        tuple(sorted((r.a, r.b, r.c))) for r in triangle_triples(edges).collect()
    ]
    assert len(triples) == len(set(triples))  # each triangle listed once
    assert len(triples) == triangle_count(edges).collect()[0]["triangles"]
    eset = {(r.src, r.dst) for r in edges.collect()}
    for x, y, z in triples[:500]:
        assert (x, y) in eset and (y, z) in eset and (x, z) in eset


# ------------------------------------------------------ biased walks


def _py_biased_walks(edges, walk_len, seed_mod, ret, io, base):
    adj: dict[int, list[int]] = {}
    aset: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
        aset.setdefault(s, set()).add(d)
        aset.setdefault(d, set()).add(s)
    out = []
    for seed in sorted(adj):
        if seed % seed_mod != 0:
            continue
        prev, v = None, seed
        out.append((seed, 0, seed))
        for k in range(1, walk_len + 1):
            best = None
            for u in adj[v]:
                if prev is None:
                    w = 1
                elif u == prev:
                    w = ret
                elif u in aset[prev]:
                    w = base
                else:
                    w = io
                h = min(
                    _hash56_py(f"n2v:{seed}:{k}:{u}:{j}")
                    for j in range(1, w + 1)
                )
                if best is None or (h, u) < best:
                    best = (h, u)
            prev, v = v, best[1]
            out.append((seed, k, v))
    return sorted(out)


def test_biased_walks_match_sequential_oracle(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.walks import biased_walks

    edges = part_graph(spark, sf_tiny)
    got = sorted(
        (r.walk_id, r.step, r.v)
        for r in biased_walks(
            edges, walk_len=4, seed_mod=8,
            return_copies=2, inout_copies=1, base_copies=3,
        ).collect()
    )
    elist = [(r.src, r.dst) for r in edges.collect()]
    want = _py_biased_walks(elist, 4, 8, ret=2, io=1, base=3)
    assert got == want


def test_biased_walks_copy_weights_shift_the_distribution(spark):
    from paralleltrianglecounting_spark.operators.walks import biased_walks

    # star of leaf pairs: hub 0 joined to 1..40, and each odd leaf
    # joined to its even twin (1-2, 3-4, ...). A walk at leaf L with
    # prev=0 chooses between the hub (weight inout=1) and the twin
    # (in N(0) -> weight base). With base=64 the twin must win for
    # almost every walk; with base=1 the choice is ~uniform.
    pairs = [(0, i) for i in range(1, 41)]
    pairs += [(i, i + 1) for i in range(1, 40, 2)]
    df = spark.createDataFrame(pairs, "src long, dst long")

    def twin_rate(base):
        rows = biased_walks(df, walk_len=2, seed_mod=1,
                            return_copies=1, inout_copies=1,
                            base_copies=base).collect()
        by_walk: dict[int, dict[int, int]] = {}
        for r in rows:
            by_walk.setdefault(r.walk_id, {})[r.step] = r.v
        hits = total = 0
        for wid, steps in by_walk.items():
            if steps[0] != 0 and steps[1] == 0:
                # at the hub with prev = a leaf: that leaf's twin is
                # NOT in N(prev)... skip; we want leaf-with-prev=hub
                continue
            if steps[0] == 0 and steps[1] != 0:
                total += 1
                leaf = steps[1]
                twin = leaf + 1 if leaf % 2 == 1 else leaf - 1
                hits += steps[2] == twin
        return hits, total

    hits_heavy, total = twin_rate(64)
    assert total == 1  # only the hub-seeded walk starts at 0
    assert hits_heavy == 1  # 64:1 weight -> the twin wins
    # determinism: identical output on a re-run
    a = sorted(map(tuple, biased_walks(df, walk_len=2, seed_mod=1,
                                       base_copies=64).collect()))
    b = sorted(map(tuple, biased_walks(df, walk_len=2, seed_mod=1,
                                       base_copies=64).collect()))
    assert a == b


# ---------------- mixture weights + sequence packing ----------------

from paralleltrianglecounting_spark.operators.sampling import (
    mixture_weights,
    sequence_packing,
)


def _mk_src_docs(spark, per_source):
    rows, i = [], 0
    for src_name, texts in per_source.items():
        for t in texts:
            rows.append((i, t, "en", src_name, len(t)))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_mixture_weights_temperature_family(spark):
    docs = _mk_src_docs(spark, {
        "big": ["a b c d e f g h", "i j k l m n o p"],   # 16 tokens
        "small": ["q r"],                                 # 2 tokens
    })
    got = {r.source: (r.n_docs, r.n_tokens, r.weight_r)
           for r in mixture_weights(docs, alpha=0.7).collect()}
    z = 16 ** 0.7 + 2 ** 0.7
    assert got["big"] == (2, 16, round(16 ** 0.7 / z, 6))
    assert got["small"] == (1, 2, round(2 ** 0.7 / z, 6))
    # alpha=1 -> proportional; alpha=0 -> uniform
    prop = {r.source: r.weight_r for r in mixture_weights(docs, alpha=1.0).collect()}
    assert prop["big"] == pytest.approx(16 / 18, abs=1e-6)
    unif = {r.source: r.weight_r for r in mixture_weights(docs, alpha=0.0).collect()}
    assert unif["big"] == unif["small"] == 0.5
    # alpha < 1 upsamples the small source vs proportional
    assert got["small"][2] > prop["small"]


def test_sequence_packing_single_shard_blocks(spark):
    # one shard, context 5: token counts 3,4,2,7 -> cum 3,7,9,16
    texts = ["a b c", "d e f g", "h i", "j k l m n o p"]
    docs = spark.createDataFrame(
        [(i * 1, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: (r.shard, r.n_tokens, r.start_block, r.end_block)
           for r in sequence_packing(docs, context_len=5, n_shards=1).collect()}
    # doc0: toks [0,3) -> block 0; doc1: [3,7) -> blocks 0-1;
    # doc2: [7,9) -> block 1; doc3: [9,16) -> blocks 1-3
    assert got == {
        0: (0, 3, 0, 0),
        1: (0, 4, 0, 1),
        2: (0, 2, 1, 1),
        3: (0, 7, 1, 3),
    }


def test_sequence_packing_shards_pack_independently(spark):
    import random

    rng = random.Random(23)
    texts = [" ".join("w" * 1 for _ in range(rng.randrange(1, 40)))
             for _ in range(60)]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = sequence_packing(docs, context_len=16, n_shards=4).collect()
    by_shard = {}
    for r in rows:
        assert r.shard == r.doc_id % 4
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.start_block == cum // 16
            cum += r.n_tokens
            assert r.end_block == (cum - 1) // 16


def _pps_twin(rows, target_n, salt="pps"):
    import re as _re

    ws = _re.compile(r"[ \t\n\x0B\f\r]+")
    w = {
        d: len([t for t in ws.split(text) if t != ""]) for d, text in rows
    }
    tot = sum(w.values())
    out = {}
    for d, n in w.items():
        h56 = int(
            hashlib.md5(f"{salt}:{d}".encode()).hexdigest()[:14], 16
        )
        if h56 % 2**32 < (target_n * n * 2**32) // tot:
            out[d] = n
    return out


def test_pps_sample_matches_pure_python_twin(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.sampling import pps_sample

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    for target in (10, 40):
        got = {
            r["doc_id"]: r["n_tokens"]
            for r in pps_sample(docs, target_n=target).collect()
        }
        assert got == _pps_twin(rows, target)


def test_pps_sample_expected_size_and_proportionality(spark, sf_tiny):
    """E[|sample|] = target_n; a doc with twice the tokens has twice
    the inclusion probability (checked via the threshold itself)."""
    from paralleltrianglecounting_spark.operators.sampling import pps_sample

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    n = pps_sample(docs, target_n=60).count()
    # Poisson-binomial sd ~ sqrt(60) ≈ 8; 4 sd tolerance
    assert 28 <= n <= 92
    # determinism across parallelism
    n2 = pps_sample(docs.repartition(16), target_n=60).count()
    assert n == n2


def test_pps_sample_rejects_bad_target(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.sampling import pps_sample

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    with pytest.raises(ValueError):
        pps_sample(docs, target_n=0)
