"""Multi-source BFS, degree histogram, and edge-Jaccard link scoring —
Python-oracle agreement on the reference's bundled graph_100 plus the
cap/edge cases the gates cannot see."""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.bfs import bfs_distances
from paralleltrianglecounting_spark.operators.degrees import degree_histogram, degrees
from paralleltrianglecounting_spark.operators.triangles import edge_jaccard
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from tests.conftest import reference_graph


def _adj(rows):
    adj = defaultdict(set)
    for r in rows:
        adj[r["src"]].add(r["dst"])
        adj[r["dst"]].add(r["src"])
    return adj


def _bfs_oracle(adj, seeds, max_hops):
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_matches_oracle_and_cap_binds(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    adj = _adj(edges.collect())
    seeds = [0, 1, 2]
    for max_hops in (0, 1, 2, 10):
        got = {
            r["vertex"]: r["dist"]
            for r in bfs_distances(edges, seeds, max_hops=max_hops).collect()
        }
        assert got == _bfs_oracle(adj, seeds, max_hops), f"max_hops={max_hops}"
    # the graph is connected from these seeds: uncapped settles everything
    assert len(_bfs_oracle(adj, seeds, 10)) == 100
    # ...and a 1-hop cap genuinely excludes vertices
    assert len(_bfs_oracle(adj, seeds, 1)) < 100


def test_bfs_seed_df_and_unknown_seed(spark):
    """Seeds may arrive as a DataFrame; a seed id absent from the edge
    table appears at dist 0 and expands to nothing."""
    edges = read_g_file(spark, reference_graph("graph_11"))
    seed_df = spark.createDataFrame([(0,), (999,)], "vertex long")
    got = {
        r["vertex"]: r["dist"]
        for r in bfs_distances(edges, seed_df, max_hops=1).collect()
    }
    assert got[999] == 0 and got[0] == 0
    adj = _adj(edges.collect())
    assert got == {**{v: 1 for v in adj[0]}, 0: 0, 999: 0}


def test_degree_histogram_matches_degrees(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    want = defaultdict(int)
    for r in degrees(edges).collect():
        want[r["degree"]] += 1
    got = {r["degree"]: r["n_vertices"] for r in degree_histogram(edges).collect()}
    assert got == dict(want)
    # histogram mass = vertex count; first moment = 2|E|
    assert sum(got.values()) == 100
    assert sum(d * n for d, n in got.items()) == 2 * 600


def test_edge_jaccard_matches_bruteforce(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    rows = edges.collect()
    adj = _adj(rows)
    got = {
        (r["src"], r["dst"]): (r["common_neighbors"], r["jaccard_r"])
        for r in edge_jaccard(edges).collect()
    }
    assert set(got) == {(r["src"], r["dst"]) for r in rows}
    for (u, v), (cn, jac) in got.items():
        common = len(adj[u] & adj[v])
        assert cn == common
        denom = len(adj[u]) + len(adj[v]) - common - 2
        want = round(common / denom, 6) if denom > 0 else 0.0
        assert abs(jac - want) < 1e-9, (u, v)
    # sanity: total common-neighbor mass = 3 * triangle count
    assert sum(cn for cn, _ in got.values()) == 3 * 373


def test_edge_jaccard_triangle_free_and_degree_one(spark):
    """A path graph: every edge has 0 common neighbors, and the
    two-leaf edge case (denominator 0) scores 0.0, not NULL/NaN."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    got = {
        (r["src"], r["dst"]): (r["common_neighbors"], r["jaccard_r"])
        for r in edge_jaccard(edges).collect()
    }
    assert got == {(1, 2): (0, 0.0), (2, 3): (0, 0.0), (3, 4): (0, 0.0)}
    lone = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert edge_jaccard(lone).collect()[0]["jaccard_r"] == 0.0


def test_degree_assortativity_matches_numpy(spark):
    import numpy as np

    from paralleltrianglecounting_spark.operators.degrees import (
        degree_assortativity,
    )

    edges = read_g_file(spark, reference_graph("graph_100"))
    rows = edges.collect()
    deg = defaultdict(int)
    for r in rows:
        deg[r["src"]] += 1
        deg[r["dst"]] += 1
    xs, ys = [], []
    for r in rows:
        xs += [deg[r["src"]], deg[r["dst"]]]
        ys += [deg[r["dst"]], deg[r["src"]]]
    want = round(float(np.corrcoef(xs, ys)[0, 1]), 6)
    got = degree_assortativity(edges).collect()[0]["assortativity_r"]
    assert abs(got - want) < 2e-6
    # a star is maximally disassortative (r -> -1 as leaves grow)
    star = spark.createDataFrame([(0, i) for i in range(1, 20)], "src long, dst long")
    assert degree_assortativity(star).collect()[0]["assortativity_r"] == -1.0


def test_community_modularity_matches_bruteforce(spark):
    from paralleltrianglecounting_spark.operators.labelprop import (
        community_modularity,
        label_propagation,
    )

    edges = read_g_file(spark, reference_graph("graph_100"))
    labels_df = label_propagation(edges, iterations=3, detect_stability=False)
    labels = {r["vertex"]: r["label"] for r in labels_df.collect()}
    rows = edges.collect()
    m = len(rows)
    e_c, d_c = defaultdict(int), defaultdict(int)
    for r in rows:
        if labels[r["src"]] == labels[r["dst"]]:
            e_c[labels[r["src"]]] += 1
        d_c[labels[r["src"]]] += 1
        d_c[labels[r["dst"]]] += 1
    want = round(
        sum(e_c[c] / m - (d_c[c] / (2 * m)) ** 2 for c in d_c), 6
    )
    got = community_modularity(edges, labels_df).collect()[0]["modularity_r"]
    assert abs(got - want) < 2e-6

    # two disjoint triangles labeled by component: Q = 2*(1/2 - 1/4) = 0.5
    two = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (11, 12), (12, 13), (11, 13)],
        "src long, dst long",
    )
    lbl = spark.createDataFrame(
        [(v, v // 10) for v in (1, 2, 3, 11, 12, 13)], "vertex long, label long"
    )
    assert community_modularity(two, lbl).collect()[0]["modularity_r"] == 0.5
    # everything in ONE community: Q = 1 - 1 = 0
    one = spark.createDataFrame([(v, 0) for v in (1, 2, 3, 11, 12, 13)],
                                "vertex long, label long")
    assert community_modularity(two, one).collect()[0]["modularity_r"] == 0.0


def test_component_sizes(spark):
    from paralleltrianglecounting_spark.operators.components import (
        component_sizes,
    )

    # two triangles + an isolated edge: sizes 3, 3, 2 keyed by min id
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (11, 12), (12, 13), (11, 13), (50, 51)],
        "src long, dst long",
    )
    got = {r["component"]: r["n_vertices"] for r in component_sizes(df).collect()}
    assert got == {1: 3, 11: 3, 50: 2}


def test_order_chain_graph_deep_bfs(spark, sf_tiny):
    """The deep-BFS gate's fixture (VERDICT r03 #3): the order-chain
    graph is a disjoint union of per-customer paths, so multi-hop BFS
    runs one genuine superstep per hop and the cap binds late (the
    settled set keeps growing when the cap is raised), unlike the
    dense co-occurrence graph that saturates at hop 2."""
    from paralleltrianglecounting_spark.operators.bfs import bfs_run
    from paralleltrianglecounting_spark.operators.degrees import degrees
    from paralleltrianglecounting_spark.sources.edges import order_chain_graph

    g = order_chain_graph(spark, sf_tiny).cache()
    # paths: no vertex has degree > 2
    adj = _adj(g.collect())
    assert max(len(v) for v in adj.values()) <= 2
    seeds = degrees(g).select("vertex").orderBy("vertex").limit(4)
    seed_ids = [r.vertex for r in seeds.collect()]

    res = bfs_run(g, seeds, max_hops=5)
    got = {(r.vertex, r.dist) for r in res.state.collect()}
    want = set(_bfs_oracle(adj, seed_ids, 5).items())
    assert got == want
    # a real multi-round frontier: >= 4 supersteps actually settled rows
    levels = {d for _, d in got}
    assert {0, 1, 2, 3, 4} <= levels
    # the cap binds AFTER round 3: raising it settles strictly more
    more = bfs_run(g, seeds, max_hops=6).state.count()
    assert more > len(got)
    g.unpersist()


def test_diameter_double_sweep_exact_on_paths(spark):
    from paralleltrianglecounting_spark.operators.bfs import diameter_estimate

    # path 0-1-...-9: double sweep is exact on trees (diameter 9), even
    # though the deterministic start (vertex 0) is an endpoint here;
    # verify the midpoint-start case with a relabeled path where the
    # smallest id sits in the middle
    path = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(path, "src long, dst long")
    r = diameter_estimate(df, max_hops=16).collect()[0]
    assert (r.start_vertex, r.diameter_lb) == (0, 9)
    # midpoint start: ids 0 at center, arms 1..5 and 6..10
    arms = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
            (0, 6), (6, 7), (7, 8), (8, 9), (9, 10)]
    df2 = spark.createDataFrame(arms, "src long, dst long")
    r2 = diameter_estimate(df2, max_hops=16).collect()[0]
    # sweep 1 from 0 finds an arm tip (5, tie-break smallest id);
    # sweep 2 from 5 crosses the center -> true diameter 10
    assert (r2.far_vertex, r2.diameter_lb) == (5, 10)


def test_diameter_cap_binds(spark):
    from paralleltrianglecounting_spark.operators.bfs import diameter_estimate

    path = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(path, "src long, dst long")
    r = diameter_estimate(df, max_hops=4).collect()[0]
    assert r.diameter_lb == 4  # both sweeps truncated at the cap


def test_ego_net_induced_subgraph_semantics(spark):
    from paralleltrianglecounting_spark.operators.bfs import ego_net

    # two components: a triangle 0-1-2 with a tail 2-3-4, plus 10-11
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (10, 11)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {(r.src, r.dst) for r in ego_net(df, [0], hops=1).collect()}
    # 1-ball of 0 = {0,1,2}; induced edges include 1-2 (both endpoints
    # in the ball) but not 2-3 (3 outside)
    assert got == {(0, 1), (0, 2), (1, 2)}
    got2 = {(r.src, r.dst) for r in ego_net(df, [0], hops=2).collect()}
    assert got2 == {(0, 1), (0, 2), (1, 2), (2, 3)}
    # disconnected seed: only its own component's ball
    got3 = {(r.src, r.dst) for r in ego_net(df, [10], hops=3).collect()}
    assert got3 == {(10, 11)}
