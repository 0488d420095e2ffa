"""Property-based fuzz: on arbitrary small graphs, every physical
strategy (intersect / csr / wedge, compact ids on and off) must agree
with the brute-force oracle — the engine's three-way-agreement
methodology (SURVEY.md §5) driven by hypothesis instead of fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from paralleltrianglecounting_spark.operators.triangles import triangle_count
from tests.oracles import triangle_count_brute

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=edge_lists)
def test_strategies_agree_with_bruteforce(spark, pairs):
    canon = sorted({(min(u, v), max(u, v)) for u, v in pairs if u != v})
    want = triangle_count_brute(canon)
    if canon:
        df = spark.createDataFrame(canon, "src long, dst long")
    else:
        df = spark.createDataFrame([], "src long, dst long")
    for strategy in ("intersect", "csr", "wedge"):
        got = triangle_count(df, strategy=strategy).collect()[0]["triangles"]
        assert got == want, (strategy, canon)
    for compact in (True, False):
        got = triangle_count(df, compact_ids=compact).collect()[0]["triangles"]
        assert got == want, (compact, canon)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=edge_lists)
def test_cc_and_lpa_agree_with_oracles(spark, pairs):
    """Arbitrary small graphs: connected components must match
    union-find, synchronous LPA must match the Counter-based oracle —
    including edge cases hypothesis likes (empty graph, self-loops
    only, stars, disconnected singleton edges)."""
    from paralleltrianglecounting_spark.operators.components import (
        connected_components,
    )
    from paralleltrianglecounting_spark.operators.labelprop import label_propagation
    from tests.oracles import components_oracle, label_propagation_oracle

    canon = sorted({(min(u, v), max(u, v)) for u, v in pairs if u != v})
    if not canon:
        return
    df = spark.createDataFrame(canon, "src long, dst long")
    got_cc = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got_cc == components_oracle(canon)
    got_lpa = {
        r.vertex: r.label
        for r in label_propagation(df, iterations=3, detect_stability=False).collect()
    }
    assert got_lpa == label_propagation_oracle(canon, iterations=3)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=edge_lists, k=st.integers(3, 6), max_hops=st.integers(0, 4))
def test_ktruss_and_bfs_agree_with_oracles(spark, pairs, k, max_hops):
    """Arbitrary small graphs: synchronous k-truss must match
    sequential support peeling, multi-source BFS must match a queue
    BFS (cap included), on every hypothesis-generated topology."""
    from collections import defaultdict, deque

    from paralleltrianglecounting_spark.operators.bfs import bfs_distances
    from paralleltrianglecounting_spark.operators.ktruss import k_truss

    canon = sorted({(min(u, v), max(u, v)) for u, v in pairs if u != v})
    if canon:
        df = spark.createDataFrame(canon, "src long, dst long")
    else:
        df = spark.createDataFrame([], "src long, dst long")

    # k-truss vs sequential peeling
    E = set(canon)
    while True:
        adj = defaultdict(set)
        for u, v in E:
            adj[u].add(v)
            adj[v].add(u)
        keep = {(u, v) for u, v in E if len(adj[u] & adj[v]) >= k - 2}
        if keep == E:
            break
        E = keep
    got = {(r["src"], r["dst"]) for r in k_truss(df, k=k).collect()}
    assert got == E, (k, canon)

    # BFS from the two smallest vertices present (plus a ghost seed)
    verts = sorted({x for e in canon for x in e})
    seeds = verts[:2] + [10**6]
    dist = {s: 0 for s in seeds}
    adj = defaultdict(set)
    for u, v in canon:
        adj[u].add(v)
        adj[v].add(u)
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got_d = {
        r["vertex"]: r["dist"]
        for r in bfs_distances(df, seeds, max_hops=max_hops).collect()
    }
    assert got_d == dist, (max_hops, seeds, canon)
