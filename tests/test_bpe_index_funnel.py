"""BPE training, blocked inverted index, skip-gram pairs, event funnel
— pure-Python twins, hand cases, and parallelism determinism."""

from __future__ import annotations

import datetime
from collections import Counter

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.bpe import (
    END_MARK,
    bpe_pair_counts,
    bpe_train,
    word_frequencies,
)
from paralleltrianglecounting_spark.operators.stats import event_funnel
from paralleltrianglecounting_spark.operators.text import (
    inverted_index,
    skipgram_pairs,
)

CORPUS = [
    "low low low lower lower newest newest newest newest widest",
    "newest widest widest low",
    "   ",
    "a",
    "aaa aaa aaa baa",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _syms(w: str) -> list[str]:
    return list(w) + [END_MARK]


def _py_pair_counts(texts) -> dict:
    wf: Counter = Counter()
    for t in texts:
        wf.update(t.split())
    pairs: Counter = Counter()
    for w, c in wf.items():
        s = _syms(w)
        for i in range(len(s) - 1):
            pairs[(s[i], s[i + 1])] += c
    return dict(pairs)


def _py_bpe(texts, n_merges: int):
    """Sennrich reference: greedy left-to-right non-overlapping merge,
    argmax by (count DESC, left ASC, right ASC), stop under count 2."""
    wf: Counter = Counter()
    for t in texts:
        wf.update(t.split())
    vocab: dict[tuple, int] = {}
    for w, c in wf.items():
        k = tuple(_syms(w))
        vocab[k] = vocab.get(k, 0) + c
    ledger = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for s, c in vocab.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        ledger.append((rank, left, right, cnt))
        nv: dict[tuple, int] = {}
        for s, c in vocab.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            k = tuple(out)
            nv[k] = nv.get(k, 0) + c
        vocab = nv
    return ledger


def test_word_frequencies(spark):
    got = {
        (r["word"], r["wcount"])
        for r in word_frequencies(_docs(spark)).collect()
    }
    wf = Counter()
    for t in CORPUS:
        wf.update(t.split())
    assert got == {(w, c) for w, c in wf.items()}


def test_bpe_pair_counts_twin(spark):
    got = {
        (r["left"], r["right"]): r["pair_cnt"]
        for r in bpe_pair_counts(_docs(spark)).collect()
    }
    assert got == _py_pair_counts(CORPUS)


def test_bpe_train_matches_sennrich_twin(spark):
    got = [tuple(r) for r in bpe_train(_docs(spark), 12).collect()]
    assert got == _py_bpe(CORPUS, 12)
    # merged symbols compound: some late merge must have a multi-char side
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got[3:])


def test_bpe_train_run_semantics(spark):
    """'aaaa' + pair (a, a) pairs up left-to-right: ["aa","aa",END] —
    never overlapping; ledger counts reflect the fold, not naive pair
    frequency."""
    texts = ["aaaa aaaa aaaa"]
    got = [tuple(r) for r in bpe_train(_docs(spark, texts), 4).collect()]
    assert got == _py_bpe(texts, 4)
    assert got[0][1:3] == ("a", "a")


def test_bpe_train_stops_on_hapax(spark):
    # every pair occurs once -> no merge with count >= 2 survives
    got = bpe_train(_docs(spark, ["xy"]), 5).collect()
    assert got == []


def test_bpe_train_validation(spark):
    with pytest.raises(ValueError):
        bpe_train(_docs(spark), 0)


def test_bpe_sf_tiny_twin_and_determinism(spark, sf_tiny):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    twin = _py_bpe(texts, 15)
    got1 = [tuple(r) for r in bpe_train(docs, 15).collect()]
    got16 = [
        tuple(r) for r in bpe_train(docs.repartition(16), 15).collect()
    ]
    assert got1 == twin
    assert got16 == twin


def test_inverted_index_blocks_and_df(spark):
    docs = _docs(
        spark,
        ["w x", "w y", "w z", "w w w", "x q"],
    )
    ii = {
        (r["term"], r["block_id"]): (r["df"], r["block_len"], r["doc_ids"])
        for r in inverted_index(docs, block_size=2).collect()
    }
    # 'w' in docs 1-4 (duplicates within doc 4 collapse) -> two blocks
    assert ii[("w", 0)] == (4, 2, "1,2")
    assert ii[("w", 1)] == (4, 2, "3,4")
    assert ii[("x", 0)] == (2, 2, "1,5")
    assert ii[("q", 0)] == (1, 1, "5")
    with pytest.raises(ValueError):
        inverted_index(docs, block_size=0)


def test_inverted_index_python_twin(spark, sf_tiny):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    postings: dict[str, list[int]] = {}
    for r in rows:
        for t in set(r["text"].split()):
            postings.setdefault(t, []).append(r["doc_id"])
    B = 16
    want = set()
    for t, ids in postings.items():
        ids.sort()
        for b in range(0, len(ids), B):
            blk = ids[b : b + B]
            want.add(
                (t, len(ids), b // B, len(blk), ",".join(map(str, blk)))
            )
    got = {tuple(r) for r in inverted_index(docs, block_size=B).collect()}
    assert got == want


def test_skipgram_pairs_hand_case(spark):
    got = {
        (r["center"], r["context"]): r["pair_cnt"]
        for r in skipgram_pairs(_docs(spark, ["p q r p"]), window=1, k=100).collect()
    }
    # adjacent pairs, both directions, with multiplicity
    twin = Counter()
    toks = "p q r p".split()
    w = 1
    for i in range(len(toks)):
        for j in range(max(0, i - w), min(len(toks), i + w + 1)):
            if j != i:
                twin[(toks[i], toks[j])] += 1
    assert got == dict(twin)


def test_skipgram_pairs_python_twin(spark, sf_tiny):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    twin: Counter = Counter()
    w = 2
    for t in texts:
        toks = t.split()
        for i in range(len(toks)):
            for j in range(max(0, i - w), min(len(toks), i + w + 1)):
                if j != i:
                    twin[(toks[i], toks[j])] += 1
    want = sorted(
        ((c, x, y) for (x, y), c in twin.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:40]
    got = [
        (r["pair_cnt"], r["center"], r["context"])
        for r in skipgram_pairs(docs, window=2, k=40).collect()
    ]
    assert sorted(got, key=lambda t: (-t[0], t[1], t[2])) == want
    with pytest.raises(ValueError):
        skipgram_pairs(docs, window=0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), u, t)
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_event_funnel_ordering_and_window(spark):
    rows = [
        # user 1: full ordered conversion
        (1, "view", 0),
        (1, "click", 10),
        (1, "purchase", 20),
        # user 2: purchase BEFORE click -> reaches click only
        (2, "view", 0),
        (2, "purchase", 5),
        (2, "click", 10),
        # user 3: click at the SAME ts as view -> strictly-after fails
        (3, "view", 0),
        (3, "click", 0),
        # user 4: click outside the conversion window
        (4, "view", 0),
        (4, "click", 5000),
    ]
    got = {
        r["step_type"]: r["users_reached"]
        for r in event_funnel(
            _ev(spark, rows),
            steps=("view", "click", "purchase"),
            within_seconds=1000,
        ).collect()
    }
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_event_funnel_earliest_completion_semantics(spark):
    """The clock for step k runs from the EARLIEST completion of step
    k-1 — a later re-view does not reopen the conversion window."""
    rows = [
        (1, "view", 0),
        (1, "view", 2000),  # second view must not reset the window
        (1, "click", 2500),
    ]
    got = {
        r["step_type"]: r["users_reached"]
        for r in event_funnel(
            _ev(spark, rows), steps=("view", "click"), within_seconds=1000
        ).collect()
    }
    assert got == {"view": 1, "click": 0}


def test_event_funnel_monotone_and_no_window(spark, sf_tiny):
    ev = spark.read.parquet(f"{sf_tiny}/events.parquet")
    got = [
        r["users_reached"]
        for r in event_funnel(ev, steps=("view", "click", "purchase"))
        .orderBy("step_idx")
        .collect()
    ]
    assert got == sorted(got, reverse=True)
    with pytest.raises(ValueError):
        event_funnel(ev, steps=())


def test_ngram_topk_hand_and_twin(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.text import ngram_topk

    got = {
        (r["gram"], r["gram_cnt"])
        for r in ngram_topk(
            _docs(spark, ["a b c a b c", "a b"]), n=2, k=10, min_count=2
        ).collect()
    }
    # bigrams: "a b" x3 (two in doc1, one in doc2), "b c" x2, "c a" x1 (cut)
    assert got == {("a b", 3), ("b c", 2)}

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    twin: Counter = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks) - 2):
            twin[" ".join(toks[i : i + 3])] += 1
    want = sorted(
        ((c, g) for g, c in twin.items() if c >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    got = [
        (r["gram_cnt"], r["gram"])
        for r in ngram_topk(docs, n=3, k=25, min_count=2).collect()
    ]
    assert sorted(got, key=lambda t: (-t[0], t[1])) == want
    with pytest.raises(ValueError):
        ngram_topk(docs, n=0)


def test_link_prediction_jaccard_twin(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.linkpred import (
        link_prediction_jaccard,
    )
    from paralleltrianglecounting_spark.sources.edges import part_graph

    edges = part_graph(spark, sf_tiny)
    erows = [(r.src, r.dst) for r in edges.collect()]
    adj: dict[int, set[int]] = {}
    for u, v in erows:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    eset = {(u, v) for u, v in erows}
    cand: Counter = Counter()
    for z, ns in adj.items():
        nl = sorted(ns)
        for i in range(len(nl)):
            for j in range(i + 1, len(nl)):
                cand[(nl[i], nl[j])] += 1
    want = []
    for (u, v), cn in cand.items():
        if (u, v) in eset:
            continue
        jac = round(cn / (len(adj[u]) + len(adj[v]) - cn), 6)
        want.append((u, v, cn, jac))
    want.sort(key=lambda t: (-t[3], t[0], t[1]))
    want = want[:30]
    got = [tuple(r) for r in link_prediction_jaccard(edges, k=30).collect()]
    assert got == want
    # jaccard is a probability: every score in (0, 1]
    assert all(0 < j <= 1 for _, _, _, j in got)
