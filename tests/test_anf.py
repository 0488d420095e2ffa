"""ANF / effective diameter (FM bitmask OR-propagation): bit-exact
pure-Python twin on random graphs, path-graph closed forms, directed
out-reach, estimate sanity vs exact BFS, stable-tail semantics, and
parallelism determinism."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

from paralleltrianglecounting_spark.operators.anf import (
    ANF_PHI,
    effective_diameter,
    neighborhood_bits,
    neighborhood_function,
)


def h56(s: str) -> int:
    """The engine's portable hash56: first 14 hex chars of md5."""
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def tz(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def lzb(x: int) -> int:
    """Lowest zero bit position."""
    b = 0
    while x & 1:
        x >>= 1
        b += 1
    return b


def py_anf_bits(pairs, max_hops, n_trials, directed=False):
    """Twin of neighborhood_bits: {(hop, trial): total_bits}."""
    adj = defaultdict(set)
    verts = set()
    for u, v in pairs:
        if u == v:
            continue
        verts.add(u)
        verts.add(v)
        if directed:
            adj[u].add(v)  # v's sketch flows INTO u (out-reach)
        else:
            adj[u].add(v)
            adj[v].add(u)
    masks = {
        v: [1 << min(tz(h56(f"{v}:{r}")), 55) for r in range(n_trials)]
        for v in verts
    }
    out = {}

    def record(hop):
        for r in range(n_trials):
            out[(hop, r)] = sum(lzb(masks[v][r]) for v in verts)

    record(0)
    for hop in range(1, max_hops + 1):
        nxt = {}
        for v in verts:
            m = list(masks[v])
            for u in adj[v]:
                for r in range(n_trials):
                    m[r] |= masks[u][r]
            nxt[v] = m
        masks = nxt
        record(hop)
    return out


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _collect_bits(df):
    return {(r.hop, r.trial): r.total_bits for r in df.collect()}


def test_anf_bits_matches_twin_random(spark):
    rng = random.Random(0)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(70)]
    got = _collect_bits(neighborhood_bits(_df(spark, pairs), max_hops=5, n_trials=8))
    assert got == py_anf_bits(pairs, 5, 8)


def test_anf_bits_directed_matches_twin(spark):
    rng = random.Random(4)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(50)]
    got = _collect_bits(
        neighborhood_bits(_df(spark, pairs), max_hops=4, n_trials=8, directed=True)
    )
    assert got == py_anf_bits(pairs, 4, 8, directed=True)
    # and it differs from the undirected sketch on this digraph
    und = _collect_bits(
        neighborhood_bits(_df(spark, pairs), max_hops=4, n_trials=8)
    )
    assert got != und


def test_anf_stable_tail_and_monotonicity(spark):
    # path P6 (diameter 5): totals grow until hop 5, then the tail
    # repeats the fixpoint totals for the remaining requested hops
    pairs = [(i, i + 1) for i in range(5)]
    got = _collect_bits(neighborhood_bits(_df(spark, pairs), max_hops=9, n_trials=8))
    per_hop = [
        [got[(h, r)] for r in range(8)] for h in range(10)
    ]
    for a, b in zip(per_hop, per_hop[1:]):
        assert all(x <= y for x, y in zip(a, b))
    assert per_hop[5] == per_hop[6] == per_hop[9]
    assert per_hop[4] != per_hop[5] or per_hop[3] != per_hop[4]
    assert got == py_anf_bits(pairs, 9, 8)


def test_effective_diameter_path(spark):
    # P11: diameter 10; exact NF(k) = sum_v |N_k(v)| has its 90% point
    # at k=7 (NF(10)=121, NF(7)=109 >= 108.9, NF(6)=101); the estimator
    # must stop exactly at the OR fixpoint and land within ±1 of the
    # exact effective diameter on 16 trials
    pairs = [(i, i + 1) for i in range(10)]
    row = effective_diameter(_df(spark, pairs), max_hops=20, n_trials=16).collect()[0]
    assert row.hops_run == 10
    assert abs(row.effective_diameter - 7) <= 1
    assert row.nf_at_diameter <= row.nf_total


def test_nf_estimate_sanity_clique_plus_path(spark):
    # K12 (NF(1) = 144 exact) + a disjoint P3: the hop-1 estimate from
    # 16 deterministic trials must land within 2x of the exact count
    k12 = [(i, j) for i in range(12) for j in range(i + 1, 12)]
    p3 = [(100, 101), (101, 102)]
    nf = {
        r.hop: r.nf_estimate
        for r in neighborhood_function(
            _df(spark, k12 + p3), max_hops=3, n_trials=16
        ).collect()
    }
    exact_nf1 = 12 * 12 + (2 + 3 + 2)
    assert 0.5 * exact_nf1 <= nf[1] <= 2.0 * exact_nf1
    assert nf[0] <= nf[1] <= nf[2] + 1e-9


def test_anf_deterministic_across_parallelism(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(90)]
    df = _df(spark, pairs)
    a = _collect_bits(neighborhood_bits(df.repartition(1), max_hops=4, n_trials=8))
    b = _collect_bits(neighborhood_bits(df.repartition(16), max_hops=4, n_trials=8))
    assert a == b


def test_anf_duplicate_edges_and_self_loops_ignored(spark):
    base = [(0, 1), (1, 2)]
    noisy = base + [(1, 0), (0, 1), (2, 2)]
    a = _collect_bits(neighborhood_bits(_df(spark, base), max_hops=3, n_trials=8))
    b = _collect_bits(neighborhood_bits(_df(spark, noisy), max_hops=3, n_trials=8))
    assert a == b


def test_sketch_state_consistent_with_bits(spark):
    """sketch_state's per-vertex masks at hop k total to exactly the
    neighborhood_bits row for hop k (same FM iteration, per-vertex
    face), and the masks only ever gain bits hop over hop."""
    from paralleltrianglecounting_spark.operators.anf import sketch_state

    rng = random.Random(7)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(50)]
    bits = _collect_bits(neighborhood_bits(_df(spark, pairs), max_hops=2, n_trials=4))
    s1 = {r["vertex"]: [r[f"m{t}"] for t in range(4)]
          for r in sketch_state(_df(spark, pairs), hops=1, n_trials=4).collect()}
    s2 = {r["vertex"]: [r[f"m{t}"] for t in range(4)]
          for r in sketch_state(_df(spark, pairs), hops=2, n_trials=4).collect()}
    assert set(s1) == set(s2)
    for t in range(4):
        assert sum(lzb(m[t]) for m in s1.values()) == bits[(1, t)]
        assert sum(lzb(m[t]) for m in s2.values()) == bits[(2, t)]
    for v in s1:
        for t in range(4):
            # OR-monotone: hop-1 bits are a subset of hop-2 bits
            assert s1[v][t] & s2[v][t] == s1[v][t]
