"""PageRank / connected components / label propagation vs sequential
NumPy oracles, plus superstep checkpoint + resume semantics."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.components import connected_components
from paralleltrianglecounting_spark.operators.labelprop import label_propagation
from paralleltrianglecounting_spark.operators.pagerank import pagerank, pagerank_run
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph
from tests.oracles import (
    components_oracle,
    label_propagation_oracle,
    pagerank_oracle,
)


def _local_edges(df):
    return [(r.src, r.dst) for r in df.collect()]


def test_pagerank_matches_oracle(spark):
    edges = planted_triangles(spark, num_nodes=150, num_triangles=80, seed=13).cache()
    local = _local_edges(edges)
    want = pagerank_oracle(local, damping=0.85, iterations=10)
    got = {r.vertex: r.rank for r in pagerank(edges, iterations=10).collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # ranks are a probability distribution over vertices
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_on_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100")).cache()
    local = _local_edges(edges)
    want = pagerank_oracle(local, iterations=15)
    got = {r.vertex: r.rank for r in pagerank(edges, iterations=15).collect()}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_connected_components_matches_union_find(spark):
    # disconnected structure: several planted clumps with disjoint id ranges
    e1 = planted_triangles(spark, num_nodes=40, num_triangles=25, seed=1)
    e2 = planted_triangles(spark, num_nodes=40, num_triangles=25, seed=2).select(
        (F.col("src") + 1000).alias("src"), (F.col("dst") + 1000).alias("dst")
    )
    chain = spark.createDataFrame(
        [(5000 + i, 5000 + i + 1) for i in range(30)], "src long, dst long"
    )
    edges = e1.unionByName(e2).unionByName(chain).cache()
    local = _local_edges(edges)
    want = components_oracle(local)
    got = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert got == want
    assert len(set(got.values())) == len(set(want.values()))


def test_components_on_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_11")).cache()
    local = _local_edges(edges)
    got = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert got == components_oracle(local)


def test_label_propagation_matches_oracle(spark):
    edges = planted_triangles(spark, num_nodes=60, num_triangles=35, seed=21).cache()
    local = _local_edges(edges)
    want = label_propagation_oracle(local, iterations=5)
    got = {r.vertex: r.label for r in label_propagation(edges, iterations=5).collect()}
    assert got == want


def test_checkpoint_and_resume(spark, tmp_path):
    """Kill-and-resume: run 4 iterations, then rerun asking for 8 with the
    same checkpoint dir — the first 4 must load from disk and the final
    state must equal an uninterrupted 8-iteration run."""
    edges = planted_triangles(spark, num_nodes=100, num_triangles=50, seed=31).cache()
    ck = str(tmp_path / "ck")

    r1 = pagerank_run(edges, iterations=4, checkpoint_dir=ck)
    assert r1.iterations == 4
    # manifests on disk with lineage + metrics
    it_dirs = sorted(os.listdir(os.path.join(ck, "pagerank")))
    assert len(it_dirs) == 4
    with open(os.path.join(ck, "pagerank", it_dirs[0], "manifest.json")) as f:
        m = json.load(f)
    assert m["rows"] > 0 and "partitions" in m and m["metrics"]["messages_sent"] > 0

    r2 = pagerank_run(edges, iterations=8, checkpoint_dir=ck, resume=True)
    assert r2.iterations == 8
    assert len(r2.metrics) == 8

    straight = pagerank(edges, iterations=8)
    a = {r.vertex: r.rank for r in r2.state.collect()}
    b = {r.vertex: r.rank for r in straight.collect()}
    assert a.keys() == b.keys()
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_components_converge_flag(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    from paralleltrianglecounting_spark.operators.components import components_run

    res = components_run(edges)
    assert res.converged
    got = {r.vertex: r.component for r in res.state.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_resumable_triangle_count(spark, tmp_path):
    """Chunked flagship: per-chunk metrics sum to the one-shot golden
    count, and a second run over the same checkpoint dir resumes from
    the completed chunks instead of recomputing them."""
    from paralleltrianglecounting_spark.operators.triangles import (
        resumable_total,
        triangle_count_resumable,
    )
    from paralleltrianglecounting_spark.sources.gfile import read_g_file
    from tests.conftest import reference_graph

    edges = read_g_file(spark, reference_graph("graph_100"))
    ck = str(tmp_path / "tri_ck")

    r1 = triangle_count_resumable(edges, chunks=4, checkpoint_dir=ck)
    assert r1.iterations == 4
    assert resumable_total(r1) == 373
    state = {tuple(r) for r in r1.state.collect()}
    assert len(state) == 4
    # every chunk reports its lineage-bearing metrics
    assert sum(r.edges_scanned for r in r1.state.collect()) == 600
    assert all(r.wedges_checked >= r.triangles_closed for r in r1.state.collect())

    # resume: all 4 chunks already complete -> no new supersteps run
    r2 = triangle_count_resumable(edges, chunks=4, checkpoint_dir=ck, resume=True)
    assert resumable_total(r2) == 373
    assert {tuple(r) for r in r2.state.collect()} == state
    assert len(r2.metrics) == 4


def test_superstep_topology_never_reexchanges(spark, tmp_path):
    """The r01 scale-killer, regression-proofed: the cached |E|-row
    topology must not re-exchange inside the superstep loop. Every
    manifest records the superstep's planned ENSURE_REQUIREMENTS
    shuffle count — with the topology pre-partitioned on the join key
    it is exactly 1 (the partial→final aggregate); a re-exchange of the
    edge side would make it 2+."""
    edges = planted_triangles(spark, num_nodes=120, num_triangles=60, seed=41).cache()
    ck = str(tmp_path / "ck_px")
    res = pagerank_run(edges, iterations=3, checkpoint_dir=ck)
    assert res.iterations == 3
    for m in res.metrics:
        assert m["metrics"]["shuffle_exchanges"] == 1, m


def test_superstep_join_shuffles_only_rank_side_without_broadcast(spark):
    """100 TB shape: with broadcast disabled (a 10^9-vertex rank state
    cannot broadcast), the superstep join must exchange ONLY the |V|-row
    rank side — the cached topology's HashPartitioning(src) satisfies
    the join requirement. Planned shuffles: rank side + final agg = 2;
    an edge-side re-exchange would make it 3."""
    from paralleltrianglecounting_spark.operators.degrees import degrees
    from paralleltrianglecounting_spark.operators.pagerank import message_topology
    from paralleltrianglecounting_spark.plans.lint import (
        count_ensure_exchanges,
        physical_plan,
    )

    edges = planted_triangles(spark, num_nodes=100, num_triangles=50, seed=43).cache()
    deg = degrees(edges).persist()
    n = deg.count()
    adj = message_topology(edges, deg).persist()
    adj.count()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        state = deg.select(
            "vertex", F.lit(1.0 / n).alias("rank")
        ).localCheckpoint(eager=True)
        ranks_src = state.select(F.col("vertex").alias("src"), "rank")
        msgs = adj.join(ranks_src, "src").select(
            F.col("dst").alias("vertex"),
            (F.col("rank") / F.col("degree")).alias("contrib"),
        )
        new_rank = msgs.groupBy("vertex").agg(
            ((1.0 - 0.85) / n + 0.85 * F.sum("contrib")).alias("rank")
        )
        new_rank.collect()
        assert count_ensure_exchanges(new_rank) == 2, physical_plan(new_rank)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        adj.unpersist()
        deg.unpersist()


def test_lpa_and_cc_steady_state_exchange_budget(spark):
    """Pin the documented per-superstep shuffle budgets (recorded in
    every manifest): LPA = 2 exchanges (the map-side-combined message
    count and the small counted-table argmax — the cached topology and
    broadcast state move nothing; r03 traded mode()'s single exchange
    for two codegen'd hash aggs, see operators/labelprop.py), CC = 3
    per round (large-star join side, small-star repartition shared by
    its agg+join, small-star distinct). The first superstep additionally
    carries the init-state/base-derivation lineage and is exempt."""
    from paralleltrianglecounting_spark.operators.components import components_run
    from paralleltrianglecounting_spark.operators.labelprop import (
        label_propagation_run,
    )

    edges = planted_triangles(spark, num_nodes=120, num_triangles=60, seed=41).cache()
    lpa = label_propagation_run(edges, iterations=3, detect_stability=False)
    assert [m["metrics"]["shuffle_exchanges"] for m in lpa.metrics][1:] == [2, 2]
    cc = components_run(edges)
    steady = [m["metrics"]["shuffle_exchanges"] for m in cc.metrics][1:]
    assert steady and all(n == 3 for n in steady), steady


def test_lpa_fixed_iterations_output_identical(spark):
    """detect_stability=False (fingerprint job skipped) must return the
    byte-identical labeling for the same iteration count."""
    edges = planted_triangles(spark, num_nodes=60, num_triangles=30, seed=47).cache()
    a = sorted(
        map(tuple, label_propagation(edges, iterations=3).collect())
    )
    b = sorted(
        map(
            tuple,
            label_propagation(edges, iterations=3, detect_stability=False).collect(),
        )
    )
    assert a == b


def test_pagerank_to_convergence(spark):
    """tol mode: run until max |Δrank| < tol, match the NumPy oracle run
    to its own fixpoint within 1e-6 per vertex (north_star contract)."""
    from paralleltrianglecounting_spark.operators.pagerank import pagerank_run
    from paralleltrianglecounting_spark.sources.gfile import read_g_file
    from tests.conftest import reference_graph
    from tests.oracles import pagerank_oracle

    edges_df = read_g_file(spark, reference_graph("graph_100"))
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]

    res = pagerank_run(edges_df, iterations=100, tol=1e-9)
    assert res.converged
    assert res.iterations < 100  # actually stopped on tol, not the cap
    got = {r["vertex"]: r["rank"] for r in res.state.collect()}
    want = pagerank_oracle(edges, iterations=200)  # oracle far past fixpoint
    assert set(got) == set(want)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-6)


def test_resume_refuses_mismatched_graph_checkpoints(spark, tmp_path):
    """VERDICT r02 #9: resume trusts whatever iter_* dirs exist — now
    every manifest is stamped with a run identity (init-state
    fingerprint, or the edge-table fingerprint for input-independent
    inits) and a resume over a DIFFERENT graph's checkpoints raises
    instead of silently continuing the wrong trajectory."""
    import pytest as _pytest

    from paralleltrianglecounting_spark.operators.triangles import (
        triangle_count_resumable,
    )

    g1 = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    g2 = spark.createDataFrame([(1, 2), (2, 4), (1, 4)], "src long, dst long")
    ck = str(tmp_path / "ck")

    # pagerank: init state (uniform over the vertex set) differs per graph
    pagerank_run(g1, iterations=2, checkpoint_dir=ck)
    with _pytest.raises(ValueError, match="different graph"):
        pagerank_run(g2, iterations=2, checkpoint_dir=ck, resume=True)
    # same graph resumes fine
    r = pagerank_run(g1, iterations=3, checkpoint_dir=ck, resume=True)
    assert r.iterations == 3

    # resumable triangle count: init is an EMPTY metrics table, so the
    # identity comes from the edge-table fingerprint (+ chunk count)
    ck2 = str(tmp_path / "ck2")
    triangle_count_resumable(g1, chunks=2, checkpoint_dir=ck2)
    with _pytest.raises(ValueError, match="different graph"):
        triangle_count_resumable(g2, chunks=2, checkpoint_dir=ck2, resume=True)
    with _pytest.raises(ValueError, match="different graph"):
        # same edges, different chunking: per-chunk state not continuable
        triangle_count_resumable(g1, chunks=4, checkpoint_dir=ck2, resume=True)
    res = triangle_count_resumable(g1, chunks=2, checkpoint_dir=ck2, resume=True)
    assert res.state.agg(F.sum("triangles_closed")).collect()[0][0] == 1


def test_personalized_pagerank_matches_oracle(spark):
    from paralleltrianglecounting_spark.operators.pagerank import personalized_pagerank
    from tests.oracles import personalized_pagerank_oracle

    edges = planted_triangles(spark, num_nodes=150, num_triangles=80, seed=29).cache()
    local = _local_edges(edges)
    seeds = sorted({v for e in local for v in e})[:8]
    want = personalized_pagerank_oracle(local, seeds, damping=0.85, iterations=10)
    got = {
        r.vertex: r.rank
        for r in personalized_pagerank(edges, seeds, iterations=10).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # total mass stays a distribution (no dangling vertices to leak it)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # mass concentrates near the seeds: every seed outranks the global
    # uniform share
    for s in seeds:
        assert got[s] > 1.0 / len(want)


def test_k_core_matches_peeling_oracle(spark):
    from paralleltrianglecounting_spark.operators.kcore import k_core, k_core_run
    from tests.oracles import k_core_oracle

    edges = planted_triangles(spark, num_nodes=120, num_triangles=90, seed=31).cache()
    local = _local_edges(edges)
    for k in (2, 3, 4):
        want = k_core_oracle(local, k)
        got = {r.vertex for r in k_core(edges, k=k).collect()}
        assert got == want, f"k={k}"
    # triangle corners always survive the 2-core; a k beyond the max
    # degree peels everything
    assert k_core(edges, k=10_000).count() == 0
    # the gate's fixed-unroll oracle is sound only while the engine
    # converges within it — pin the bound on the gate tier's graph
    from paralleltrianglecounting_spark.sources.edges import part_graph
    import __spark_entry__ as entry

    res = k_core_run(part_graph(spark, "/root/testdata/sf0.001"), k=entry.KCORE_K)
    assert res.converged and res.iterations < entry.KCORE_UNROLL


def test_k_truss_matches_peeling_oracle(spark):
    """Synchronous k-truss vs sequential support peeling on graph_100,
    across the whole interesting k range (3-truss down to collapse)."""
    from collections import defaultdict

    from paralleltrianglecounting_spark.operators.ktruss import k_truss
    from paralleltrianglecounting_spark.sources.gfile import read_g_file
    from tests.conftest import reference_graph

    edges_df = read_g_file(spark, reference_graph("graph_100"))
    E0 = {(r["src"], r["dst"]) for r in edges_df.collect()}

    def peel(k):
        E = set(E0)
        while True:
            adj = defaultdict(set)
            for u, v in E:
                adj[u].add(v)
                adj[v].add(u)
            keep = {(u, v) for u, v in E if len(adj[u] & adj[v]) >= k - 2}
            if keep == E:
                return E
            E = keep

    for k in (3, 4, 5, 9):
        want = peel(k)
        got = {(r["src"], r["dst"]) for r in k_truss(edges_df, k=k).collect()}
        assert got == want, f"k={k}: {len(got)} vs {len(want)}"
    # the covered range includes real strict subgraphs (531- and
    # 126-edge trusses) and the total-collapse regime (5-truss empty)
    assert len(peel(3)) == 531 and len(peel(4)) == 126 and len(peel(5)) == 0


def test_k_truss_edge_cases(spark):
    import pytest as _pytest

    from paralleltrianglecounting_spark.operators.ktruss import (
        edge_support,
        k_truss,
    )

    # a triangle is its own 3-truss; a path has an empty 3-truss
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    assert {(r["src"], r["dst"]) for r in k_truss(tri, k=3).collect()} == {
        (1, 2),
        (2, 3),
        (1, 3),
    }
    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert k_truss(path, k=3).count() == 0
    with _pytest.raises(ValueError):
        k_truss(tri, k=1)
    # support of every triangle edge is 1; of a pendant edge 0
    pend = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    sup = {(r["src"], r["dst"]): r["support"] for r in edge_support(pend).collect()}
    assert sup == {(1, 2): 1, (2, 3): 1, (1, 3): 1, (3, 4): 0}


def test_k_truss_and_bfs_resume_from_checkpoint(spark, tmp_path):
    """A run capped mid-cascade resumes from its checkpoints (not from
    scratch) and lands on the identical fixpoint — the chunked-launch
    restartability contract extended to the two new supersteps."""
    from paralleltrianglecounting_spark.operators.bfs import bfs_distances
    from paralleltrianglecounting_spark.operators.ktruss import k_truss, k_truss_run
    from paralleltrianglecounting_spark.sources.gfile import read_g_file
    from tests.conftest import reference_graph

    edges = read_g_file(spark, reference_graph("graph_100"))
    want = {(r["src"], r["dst"]) for r in k_truss(edges, k=4).collect()}

    ck = str(tmp_path / "truss_ck")
    capped = k_truss_run(edges, k=4, checkpoint_dir=ck, max_iterations=2)
    assert not capped.converged
    resumed = k_truss_run(edges, k=4, checkpoint_dir=ck, max_iterations=50)
    assert resumed.converged
    # resumed run starts past the capped run's last complete iteration
    assert min(m["iteration"] for m in resumed.metrics if "iteration" in m) >= 0
    got = {(r["src"], r["dst"]) for r in resumed.state.collect()}
    assert got == want

    ck2 = str(tmp_path / "bfs_ck")
    seeds = [0, 1, 2]
    want_d = {
        (r["vertex"], r["dist"])
        for r in bfs_distances(edges, seeds, max_hops=6).collect()
    }
    part = bfs_distances(edges, seeds, max_hops=1, checkpoint_dir=ck2)
    assert part.count() < len(want_d)
    full = bfs_distances(edges, seeds, max_hops=6, checkpoint_dir=ck2)
    assert {(r["vertex"], r["dist"]) for r in full.collect()} == want_d


def test_personalized_pagerank_keeps_off_graph_seeds(spark):
    """A seed with no incident edge keeps its teleport share instead of
    silently vanishing (ADVICE r03 #3): it appears at exactly
    (1-d)/|S| every iteration >= 1, receives nothing, sends nothing —
    same keep-unknown-seeds semantics as bfs_distances."""
    from paralleltrianglecounting_spark.operators.pagerank import personalized_pagerank
    from tests.oracles import personalized_pagerank_oracle

    edges = planted_triangles(spark, num_nodes=60, num_triangles=25, seed=7)
    local = _local_edges(edges)
    on = sorted({v for e in local for v in e})[:3]
    seeds = on + [10_000_001]  # off-graph seed
    want = personalized_pagerank_oracle(local, seeds, damping=0.85, iterations=6)
    got = {
        r.vertex: r.rank
        for r in personalized_pagerank(edges, seeds, iterations=6).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert got[10_000_001] == pytest.approx((1 - 0.85) / len(seeds), abs=1e-15)


def test_personalized_pagerank_salted_matches_unsalted(spark):
    """hub_threshold/n_salts plumbed through PPR (VERDICT r03 #4): the
    salted message join is value-identical, not just shape-identical."""
    from paralleltrianglecounting_spark.operators.pagerank import personalized_pagerank

    # star + triangles: vertex 0 is a hub over the salt threshold
    hub = [(0, i) for i in range(1, 40)]
    tris = [(1, 2), (2, 3), (1, 3), (5, 6)]
    edges = spark.createDataFrame(hub + tris, "src long, dst long")
    seeds = [0, 1, 5]
    plain = {
        r.vertex: r.rank
        for r in personalized_pagerank(edges, seeds, iterations=5).collect()
    }
    salted = {
        r.vertex: r.rank
        for r in personalized_pagerank(
            edges, seeds, iterations=5, hub_threshold=10, n_salts=8
        ).collect()
    }
    assert set(plain) == set(salted)
    for v, r in plain.items():
        assert salted[v] == pytest.approx(r, abs=1e-12)


def test_bfs_resume_refuses_other_graphs_checkpoints(spark, tmp_path):
    """BFS's init state is the seed set alone, so the runner's default
    init-derived identity cannot catch a graph switch — bfs_run must
    stamp an edge-table fingerprint identity (ADVICE r03 #1)."""
    import pytest as _pytest

    from paralleltrianglecounting_spark.operators.bfs import bfs_distances

    g1 = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    g2 = spark.createDataFrame([(0, 5), (5, 6), (6, 7)], "src long, dst long")
    ck = str(tmp_path / "bfs_identity_ck")
    bfs_distances(g1, [0], max_hops=1, checkpoint_dir=ck)
    with _pytest.raises(ValueError, match="different graph"):
        bfs_distances(g2, [0], max_hops=3, checkpoint_dir=ck, resume=True)
    # same graph, larger cap: resume is allowed and completes the walk
    d = {
        r.vertex: r.dist
        for r in bfs_distances(
            g1, [0], max_hops=5, checkpoint_dir=ck, resume=True
        ).collect()
    }
    assert d == {0: 0, 1: 1, 2: 2, 3: 3}


def test_k_truss_domino_cascade_incremental_matches_full(spark):
    """Deep-cascade fixture (VERDICT r03 #1): the domino strip peels one
    domino per end per round at k=4. Incremental (support-delta) peeling
    must land on the identical fixpoint as full re-enumeration AND as
    the sequential oracle, across a genuinely multi-round cascade; the
    fixpoint supports must be the exact in-truss triangle counts."""
    from collections import defaultdict

    from paralleltrianglecounting_spark.operators.ktruss import k_truss, k_truss_run
    from paralleltrianglecounting_spark.sources.planted import domino_truss_graph

    n = 12
    g = domino_truss_graph(spark, n)
    E0 = {(r.src, r.dst) for r in g.collect()}
    assert len(E0) == 7 * n + 1

    def peel(k):
        E = set(E0)
        while True:
            adj = defaultdict(set)
            for u, v in E:
                adj[u].add(v)
                adj[v].add(u)
            keep = {(u, v) for u, v in E if len(adj[u] & adj[v]) >= k - 2}
            if keep == E:
                return E
            E = keep

    want = peel(4)
    assert len(want) == 6 * n  # cliques + long edges; every path edge peels
    res = k_truss_run(g, k=4)
    got = {(r.src, r.dst) for r in res.state.select("src", "dst").collect()}
    assert got == want
    # a real domino: two ends per round -> at least ~n/2 rounds
    assert res.iterations >= n // 2
    # fixpoint supports = exact in-subgraph triangle counts
    sup = {(r.src, r.dst): r.support for r in res.state.collect()}
    adj = defaultdict(set)
    for u, v in sup:
        adj[u].add(v)
        adj[v].add(u)
    assert all(s == len(adj[u] & adj[v]) for (u, v), s in sup.items())
    # full-recount twin reaches the same fixpoint
    got_full = {
        (r.src, r.dst) for r in k_truss(g, k=4, incremental=False).collect()
    }
    assert got_full == want


def test_weighted_pagerank_matches_numpy_oracle(spark):
    from paralleltrianglecounting_spark.operators.pagerank import weighted_pagerank
    from tests.oracles import weighted_pagerank_oracle

    wedges = [(0, 1, 3), (0, 2, 1), (1, 2, 5), (2, 3, 2), (3, 4, 1), (1, 4, 4)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight long")
    got = {r.vertex: r.rank for r in weighted_pagerank(df, iterations=12).collect()}
    want = weighted_pagerank_oracle(wedges, iterations=12)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    # rank mass is conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_weighted_pagerank_with_unit_weights_equals_plain(spark):
    from paralleltrianglecounting_spark.operators.pagerank import (
        pagerank,
        weighted_pagerank,
    )
    from paralleltrianglecounting_spark.sources.edges import part_graph

    from tests.conftest import TESTDATA

    edges = part_graph(spark, f"{TESTDATA}/sf0.001")
    unit = edges.select("src", "dst", F.lit(1).cast("long").alias("weight"))
    plain = {r.vertex: r.rank for r in pagerank(edges, iterations=5).collect()}
    weighted = {
        r.vertex: r.rank for r in weighted_pagerank(unit, iterations=5).collect()
    }
    assert set(plain) == set(weighted)
    for v in plain:
        assert weighted[v] == pytest.approx(plain[v], abs=1e-12), v


def test_weighted_cooccurrence_weight_semantics(spark):
    from paralleltrianglecounting_spark.sources.edges import (
        cooccurrence_edges,
        weighted_cooccurrence_edges,
    )

    rows = [("c1", 1), ("c1", 2), ("c2", 1), ("c2", 2), ("c3", 1), ("c3", 3),
            ("c1", 1)]  # duplicate membership must not inflate the weight
    df = spark.createDataFrame(rows, "c string, e long")
    w = {(r.src, r.dst): r.weight
         for r in weighted_cooccurrence_edges(df, "c", "e").collect()}
    assert w == {(1, 2): 2, (1, 3): 1}
    # unweighted projection = weighted projection's key set
    uw = {(r.src, r.dst) for r in cooccurrence_edges(df, "c", "e").collect()}
    assert uw == set(w)


# ---------------------------------------------------- seeded LPA


def py_seeded_lpa(edges, seeds, iterations):
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lbl = {v: seeds.get(v) for v in adj}
    for _ in range(iterations):
        new = {}
        for v in adj:
            votes: dict[int, int] = {}
            for u in adj[v]:
                if lbl[u] is not None:
                    votes[lbl[u]] = votes.get(lbl[u], 0) + 1
            if v in seeds:
                new[v] = seeds[v]
            elif votes:
                new[v] = min(
                    (l for l in votes), key=lambda l: (-votes[l], l)
                )
            else:
                new[v] = None
        lbl = new
    return {v: l for v, l in lbl.items() if l is not None}


def test_seeded_lpa_matches_sequential(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.labelprop import (
        seeded_label_propagation,
    )
    from paralleltrianglecounting_spark.sources.edges import part_graph

    edges = part_graph(spark, sf_tiny)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    vs = sorted({x for e in pairs for x in e})[:6]
    seeds = {v: v for v in vs}
    sdf = spark.createDataFrame(
        [(v, v) for v in vs], "vertex long, label long"
    )
    got = {
        r.vertex: r.label
        for r in seeded_label_propagation(
            edges, sdf, iterations=3, detect_stability=False
        ).collect()
    }
    assert got == py_seeded_lpa(pairs, seeds, 3)


def test_seeded_lpa_clamps_and_waves(spark):
    from paralleltrianglecounting_spark.operators.labelprop import (
        seeded_label_propagation,
    )

    # path 0-1-2-3-4-5 with seeds 0 -> 100, 5 -> 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(0, 100), (5, 200)], "vertex long, label long"
    )
    one = {
        r.vertex: r.label
        for r in seeded_label_propagation(
            edges, seeds, iterations=1, detect_stability=False
        ).collect()
    }
    # one hop: only seeds + their neighbors are labeled; seeds clamped
    assert one == {0: 100, 1: 100, 4: 200, 5: 200}
    three = {
        r.vertex: r.label
        for r in seeded_label_propagation(
            edges, seeds, iterations=3, detect_stability=False
        ).collect()
    }
    # hand-traced synchronous trajectory: iter2 labels the middle
    # (2<-100, 3<-200), iter3 re-votes 2 and 3 with both neighbors
    # labeled -> each ties 1-1 and takes the smaller label, 100
    assert three == {0: 100, 1: 100, 2: 100, 3: 100, 4: 200, 5: 200}


def test_spam_mass_matches_twin_and_semantics(spark):
    from paralleltrianglecounting_spark.operators.pagerank import spam_mass
    from tests.oracles import (
        pagerank_oracle,
        personalized_pagerank_oracle,
    )

    edges = planted_triangles(spark, num_nodes=120, num_triangles=60, seed=31).cache()
    local = _local_edges(edges)
    seeds = sorted({v for e in local for v in e})[:6]
    pr = pagerank_oracle(local, damping=0.85, iterations=10)
    tr = personalized_pagerank_oracle(local, seeds, damping=0.85, iterations=10)
    got = {
        r.vertex: (r.rank, r.trusted_rank, r.mass)
        for r in spam_mass(edges, seeds, iterations=10).collect()
    }
    assert set(got) == set(pr)
    for v in pr:
        rank, trusted, mass = got[v]
        assert rank == pytest.approx(pr[v], abs=1e-9)
        assert trusted == pytest.approx(tr[v], abs=1e-9)
        assert mass == pytest.approx((pr[v] - tr[v]) / pr[v], abs=1e-9)
    # trusted seeds get negative/low mass; the vertex FARTHEST from the
    # trust (max mass) must be a non-seed
    worst = max(got, key=lambda v: got[v][2])
    assert worst not in seeds
    # mass is bounded above by 1 (trustrank is non-negative)
    assert all(m <= 1.0 + 1e-12 for _, _, m in got.values())
