"""Winnowing fingerprints: Python twin, detection guarantee, density."""

from __future__ import annotations

import hashlib
import random
import re

from paralleltrianglecounting_spark.operators.text import winnow_fingerprints

K, W = 4, 5


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16) >> 24


def _winnow_py(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    toks = [t for t in re.split(r"[ \t\n\x0b\f\r]+", text) if t]
    if len(toks) < k:
        return set()
    hs = [_h32(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    n = len(hs)
    out: set[tuple[int, int]] = set()
    ends = [n - 1] if n < w else range(w - 1, n)
    for q in ends:
        lo = max(0, q - w + 1)
        best = min(range(lo, q + 1), key=lambda i: (hs[i], -i))
        out.add((best + 1, hs[best]))
    return out


def _run(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set[tuple[int, int]]] = {}
    for r in winnow_fingerprints(docs, k=K, w=W).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fingerprint"]))
    return got


def test_matches_python_twin(spark):
    rng = random.Random(0x51)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(12)
    ]
    texts += [
        "a b c d",  # exactly k tokens: one gram, short-doc path
        "x x x x x x x x x x",  # tie-heavy: rightmost-min must win
        "one two three",  # < k tokens: no grams at all
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_py(t), (i, t)


def test_shared_run_shares_a_fingerprint(spark):
    # the winnowing guarantee: a token run spanning >= w + k - 1 tokens
    # shared by two documents yields at least one common fingerprint
    rng = random.Random(3)
    vocab = [f"t{j}" for j in range(50)]
    shared = " ".join(rng.choice(vocab) for _ in range(K + W + 6))
    a = " ".join(rng.choice(vocab) for _ in range(15)) + " " + shared
    b = shared + " " + " ".join(rng.choice(vocab) for _ in range(11))
    got = _run(spark, [a, b])
    common = {f for _, f in got[0]} & {f for _, f in got[1]}
    assert common, "shared run must share a fingerprint"


def test_density_and_positions_valid(spark):
    rng = random.Random(9)
    text = " ".join(str(rng.randint(0, 10**6)) for _ in range(400))
    got = _run(spark, [text])[0]
    n_grams = 400 - K + 1
    # selected positions are valid gram positions and density is sane:
    # between 1/w (periodic minimum) and 1 of the gram count
    assert all(1 <= p <= n_grams for p, _ in got)
    assert n_grams // W <= len(got) <= n_grams


def _clusters_py(texts, min_shared=2, max_postings=200):
    from collections import Counter, defaultdict

    fps = {i: {f for _, f in _winnow_py(t)} for i, t in enumerate(texts)}
    post = Counter(f for s in fps.values() for f in s)
    kept = {f for f, n in post.items() if n <= max_postings}
    parent = {i: i for i in fps}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(fps)
    for i in ids:
        for j in ids:
            if i < j and len(fps[i] & fps[j] & kept) >= min_shared:
                parent[find(i)] = find(j)
    comp = defaultdict(list)
    for i in ids:
        comp[find(i)].append(i)
    out = {}
    for members in comp.values():
        cid = min(members)
        for m in members:
            out[m] = (cid, len(members))
    return out


def test_dup_clusters_match_twin(spark):
    import random

    from paralleltrianglecounting_spark.operators.text import (
        winnow_dup_clusters,
    )

    rng = random.Random(0xD0)
    vocab = [f"v{j}" for j in range(30)]
    base = " ".join(rng.choice(vocab) for _ in range(30))
    texts = [
        base,  # 0, 1, 2: near-identical family
        base + " tail one",
        "head bit " + base,
        " ".join(rng.choice(vocab) for _ in range(25)),  # 3: unrelated
        " ".join(rng.choice(vocab) for _ in range(25)),  # 4: unrelated
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["n_members"])
        for r in winnow_dup_clusters(docs, k=K, w=W).collect()
    }
    assert got == _clusters_py(texts)
    # the copy family actually clusters together
    assert got[0] == got[1] == got[2] == (0, 3)


def test_dup_clusters_postings_cap_engages(spark):
    from paralleltrianglecounting_spark.operators.text import (
        winnow_dup_clusters,
    )

    # one boilerplate sentence shared by everyone; cap = 2 kills its
    # fingerprints so nothing links
    boiler = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau"
    )  # long enough for 5 distinct fingerprints (min_shared=2 can bind)
    texts = [boiler, boiler, boiler, boiler]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    capped = {
        r["doc_id"]: r["n_members"]
        for r in winnow_dup_clusters(docs, k=K, w=W, max_postings=2).collect()
    }
    assert all(n == 1 for n in capped.values())
    uncapped = {
        r["doc_id"]: r["n_members"]
        for r in winnow_dup_clusters(docs, k=K, w=W).collect()
    }
    assert all(n == 4 for n in uncapped.values())
