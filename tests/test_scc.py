"""Strongly connected components (FW-BW coloring with trim):
iterative-Tarjan twin on random digraphs, known shapes, multi-outer-
round cascades, symmetrized-digraph == undirected CC, the order-cycle
closed form, and parallelism determinism."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from paralleltrianglecounting_spark.operators.components import (
    connected_components,
)
from paralleltrianglecounting_spark.operators.scc import (
    condensation,
    reciprocity,
    scc_run,
    strongly_connected_components,
)
from paralleltrianglecounting_spark.operators.stats import event_transitions
from paralleltrianglecounting_spark.sources.edges import order_cycle_digraph


def py_scc(pairs):
    """Sequential iterative Tarjan — {vertex: min member id of its SCC}
    over the self-loop-free digraph (matching the operator's vertex
    universe: endpoints of non-self-loop edges)."""
    adj = defaultdict(list)
    verts = set()
    for u, v in pairs:
        if u != v:
            adj[u].append(v)
            verts.add(u)
            verts.add(v)
    index: dict = {}
    low: dict = {}
    onstack: set = set()
    stack: list = []
    out: dict = {}
    counter = 0
    for s in sorted(verts):
        if s in index:
            continue
        index[s] = low[s] = counter
        counter += 1
        stack.append(s)
        onstack.add(s)
        work = [(s, iter(adj[s]))]
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    onstack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
    return out


def _collect(df):
    return {(r.vertex): r.scc for r in df.collect()}


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scc_matches_tarjan_random(spark, seed):
    rng = random.Random(seed)
    n, m = 60, 150
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    got = _collect(strongly_connected_components(_df(spark, pairs)))
    assert got == py_scc(pairs)


def test_scc_known_shapes(spark):
    # one 5-cycle, a DAG diamond, a 2-cycle, a pendant tail off the cycle
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    diamond = [(10, 11), (10, 12), (11, 13), (12, 13)]
    two = [(20, 21), (21, 20)]
    tail = [(2, 30), (30, 31)]
    pairs = cyc + diamond + two + tail
    got = _collect(strongly_connected_components(_df(spark, pairs)))
    assert got == py_scc(pairs)
    assert all(got[v] == 0 for v in range(5))  # the cycle is one SCC
    assert got[20] == got[21] == 20
    assert got[13] == 13 and got[30] == 30  # DAG + tail are singletons


def test_scc_chained_cycles_need_multiple_outer_rounds(spark):
    # cycle A (min id 0) feeds cycle B (ids 10..14): round 1 colors
    # EVERYTHING 0 (0 reaches all), so only A settles; B settles in
    # round 2 once A's edges are gone — the multi-round outer loop is
    # doing real work, not just detecting stability
    a = [(i, (i + 1) % 5) for i in range(5)]
    b = [(10 + i, 10 + (i + 1) % 5) for i in range(5)]
    pairs = a + b + [(4, 10)]
    res = scc_run(_df(spark, pairs))
    assert res.converged
    assert res.iterations >= 3  # 2 working rounds + stability round
    got = {
        r.a: r.b for r in res.state.where("tag = 1").collect()
    }
    assert got == py_scc(pairs)


def test_scc_symmetrized_equals_undirected_cc(spark):
    rng = random.Random(7)
    und = [(rng.randrange(40), rng.randrange(40)) for _ in range(70)]
    both = und + [(v, u) for u, v in und]
    got = _collect(strongly_connected_components(_df(spark, both)))
    cc = {
        r.vertex: r.component
        for r in connected_components(_df(spark, und)).collect()
    }
    assert got == cc


def test_scc_self_loops_ignored(spark):
    # a self-loop never changes membership; a vertex with ONLY a
    # self-loop has no non-self edge and is outside the vertex universe
    pairs = [(0, 1), (1, 0), (0, 0), (5, 5)]
    got = _collect(strongly_connected_components(_df(spark, pairs)))
    assert got == {0: 0, 1: 0}


def test_scc_deterministic_across_parallelism(spark):
    rng = random.Random(3)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(120)]
    df = _df(spark, pairs)
    a = _collect(strongly_connected_components(df.repartition(1)))
    b = _collect(strongly_connected_components(df.repartition(16)))
    assert a == b == py_scc(pairs)


def py_condensation(pairs):
    scc = py_scc(pairs)
    return {
        (scc[u], scc[v])
        for u, v in pairs
        if u != v and scc[u] != scc[v]
    }


def test_condensation_matches_twin(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(100)]
    got = {
        (r.src_scc, r.dst_scc)
        for r in condensation(_df(spark, pairs)).collect()
    }
    assert got == py_condensation(pairs)


def test_condensation_chained_cycles(spark):
    # two cycles joined by one edge condense to a single quotient edge
    a = [(i, (i + 1) % 5) for i in range(5)]
    b = [(10 + i, 10 + (i + 1) % 5) for i in range(5)]
    pairs = a + b + [(4, 10)]
    got = [
        (r.src_scc, r.dst_scc)
        for r in condensation(_df(spark, pairs)).collect()
    ]
    assert got == [(0, 10)]


def test_reciprocity_hand_cases(spark):
    # 2-cycle (both edges reciprocal) + 2 one-way edges + self-loop +
    # a duplicate row that the distinct must fold
    pairs = [(0, 1), (1, 0), (2, 3), (3, 4), (5, 5), (2, 3)]
    row = reciprocity(_df(spark, pairs)).collect()[0]
    assert (row.n_edges, row.n_reciprocal) == (4, 2)
    assert row.reciprocity_r == 0.5


def test_reciprocity_empty_and_symmetric(spark):
    row = reciprocity(_df(spark, [(7, 7)])).collect()[0]
    assert (row.n_edges, row.n_reciprocal) == (0, 0)
    assert row.reciprocity_r is None
    sym = [(0, 1), (1, 0), (1, 2), (2, 1)]
    row = reciprocity(_df(spark, sym)).collect()[0]
    assert row.reciprocity_r == 1.0


def test_event_transitions_hand_case(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: a -> b -> a   (ties broken by event_id: 2 before 3)
        (1, t0, 1, "a"),
        (2, t0 + dt.timedelta(seconds=1), 1, "b"),
        (3, t0 + dt.timedelta(seconds=1), 1, "a"),
        # user 2: b -> b
        (4, t0, 2, "b"),
        (5, t0 + dt.timedelta(seconds=9), 2, "b"),
        # user 3: single event, no transition
        (6, t0, 3, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.src_type, r.dst_type): r.n
        for r in event_transitions(ev).collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_order_cycle_digraph_closed_form(spark, sf_tiny):
    # the gate construction: customers with >= min_cycle orders close
    # into one cycle-SCC (id = min orderkey), shorter chains are pure
    # paths (all singletons). The closed form is the gate oracle.
    import pandas as pd

    g = order_cycle_digraph(spark, sf_tiny)
    got = _collect(strongly_connected_components(g))
    o = pd.read_parquet(f"{sf_tiny}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    grp = o.groupby("o_custkey")["o_orderkey"].agg(["count", "min"])
    o = o.merge(grp, left_on="o_custkey", right_index=True)
    o = o[o["count"] >= 2]
    want = {
        int(k): int(mn) if n >= 12 else int(k)
        for k, n, mn in zip(o["o_orderkey"], o["count"], o["min"])
    }
    assert got == want
    # gate power: both regimes are populated
    n_cycle = sum(1 for v, s in want.items() if s != v)
    assert n_cycle > 0 and n_cycle < len(want)
