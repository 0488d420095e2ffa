"""Bowtie decomposition (Broder census) and directed BFS: hand-built
shape fixtures covering every region incl. tendrils/tubes, a
brute-force twin on random digraphs, the largest-SCC tie-break, and
directed-vs-undirected BFS semantics."""

from __future__ import annotations

import random
from collections import defaultdict, deque

from paralleltrianglecounting_spark.operators.bfs import bfs_distances
from paralleltrianglecounting_spark.operators.bowtie import bowtie_structure


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "src long, dst long"
    )


def _py_sccs(pairs):
    """Kosaraju on the vertex set of the edge list."""
    fwd, rev = defaultdict(list), defaultdict(list)
    verts = set()
    for u, v in pairs:
        fwd[u].append(v)
        rev[v].append(u)
        verts.update((u, v))
    order, seen = [], set()
    for s in sorted(verts):
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            node, it = stack[-1]
            advanced = False
            for nxt in it:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append((nxt, iter(fwd[nxt])))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    comp = {}
    for s in reversed(order):
        if s in comp:
            continue
        members = []
        dq = deque([s])
        comp[s] = None
        while dq:
            x = dq.popleft()
            members.append(x)
            for y in rev[x]:
                if y not in comp:
                    comp[y] = None
                    dq.append(y)
        cid = min(members)
        for m in members:
            comp[m] = cid
    return comp


def _py_bowtie(pairs):
    comp = _py_sccs(pairs)
    sizes = defaultdict(int)
    for v, c in comp.items():
        sizes[c] += 1
    core_id = min(sizes, key=lambda c: (-sizes[c], c))
    core = {v for v, c in comp.items() if c == core_id}
    fwd, rev, und = defaultdict(set), defaultdict(set), defaultdict(set)
    for u, v in pairs:
        fwd[u].add(v)
        rev[v].add(u)
        und[u].add(v)
        und[v].add(u)

    def reach(seeds, adj):
        seen = set(seeds)
        dq = deque(seeds)
        while dq:
            x = dq.popleft()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    dq.append(y)
        return seen

    out_r = reach(core, fwd)
    in_r = reach(core, rev)
    wcc = reach(core, und)
    res = {}
    for v in comp:
        if v in core:
            res[v] = "CORE"
        elif v in in_r:
            res[v] = "IN"
        elif v in out_r:
            res[v] = "OUT"
        elif v in wcc:
            res[v] = "TENDRIL"
        else:
            res[v] = "DISCONNECTED"
    return res


def _collect(df):
    return {r.vertex: r.region for r in df.collect()}


def test_bowtie_hand_shape_all_regions(spark):
    # core 1-2-3 cycle; 0 -> IN; 4 <- OUT; 5 tendril off IN;
    # 6 a tube (IN-side vertex reaching OUT, bypassing core);
    # 10-11 disconnected
    pairs = [
        (1, 2), (2, 3), (3, 1),   # CORE
        (0, 1),                   # IN
        (3, 4),                   # OUT
        (0, 5),                   # TENDRIL off IN
        (0, 6), (6, 4),           # tube: classified TENDRIL
        (10, 11),                 # DISCONNECTED
    ]
    got = _collect(bowtie_structure(_df(spark, pairs)))
    assert got == {
        1: "CORE", 2: "CORE", 3: "CORE",
        0: "IN", 4: "OUT",
        5: "TENDRIL", 6: "TENDRIL",
        10: "DISCONNECTED", 11: "DISCONNECTED",
    }
    assert got == _py_bowtie(pairs)


def test_bowtie_largest_scc_tiebreak_and_out_cycle(spark):
    # two 3-cycles tied on size: the smaller-id one is CORE; linking
    # core -> other cycle makes the whole other cycle OUT
    pairs = [(1, 2), (2, 3), (3, 1), (7, 8), (8, 9), (9, 7), (3, 7)]
    got = _collect(bowtie_structure(_df(spark, pairs)))
    assert got == {
        1: "CORE", 2: "CORE", 3: "CORE",
        7: "OUT", 8: "OUT", 9: "OUT",
    }
    assert got == _py_bowtie(pairs)


def test_bowtie_matches_twin_random(spark):
    rng = random.Random(13)
    pairs = list(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(60)}
    )
    pairs = [(u, v) for u, v in pairs if u != v]
    got = _collect(bowtie_structure(_df(spark, pairs)))
    assert got == _py_bowtie(pairs)


def test_bowtie_no_cycle_singleton_core(spark):
    # pure path: every SCC is a singleton; core = vertex 0 (size ties
    # -> smallest id); rest of the path is OUT
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = _collect(bowtie_structure(_df(spark, pairs)))
    assert got == {0: "CORE", 1: "OUT", 2: "OUT", 3: "OUT"}
    assert got == _py_bowtie(pairs)


def test_bfs_directed_vs_undirected(spark):
    pairs = [(0, 1), (1, 2)]
    fwd = {r.vertex: r.dist for r in
           bfs_distances(_df(spark, pairs), [0], directed=True).collect()}
    assert fwd == {0: 0, 1: 1, 2: 2}
    # from the sink, forward reach is just the seed
    sink = {r.vertex: r.dist for r in
            bfs_distances(_df(spark, pairs), [2], directed=True).collect()}
    assert sink == {2: 0}
    und = {r.vertex: r.dist for r in
           bfs_distances(_df(spark, pairs), [2]).collect()}
    assert und == {2: 0, 1: 1, 0: 2}


def test_bowtie_deterministic_across_parallelism(spark):
    rng = random.Random(5)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(40)]
    pairs = [(u, v) for u, v in pairs if u != v]
    one = _collect(bowtie_structure(_df(spark, pairs).coalesce(1)))
    many = _collect(bowtie_structure(_df(spark, pairs).repartition(16)))
    assert one == many
