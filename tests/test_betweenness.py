"""k-source depth-bounded Brandes betweenness vs a sequential oracle.

The contract gate proves value-exactness vs the unrolled DuckDB twin;
these tests pin the semantics against an independent pure-Python
Brandes (level-synchronous, same source set and depth bound), including
the cases the dense gate graph can't exercise: a path graph where the
depth bound *binds*, and the undirected double-count convention.
"""

from __future__ import annotations

import pytest

from paralleltrianglecounting_spark.operators.betweenness import betweenness
from paralleltrianglecounting_spark.sources.edges import part_graph


def py_betweenness(edges, n_sources: int, max_depth: int) -> dict[int, float]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    bc = {v: 0.0 for v in verts}
    for s in verts[:n_sources]:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for d in range(1, max_depth + 1):
            nxt: dict[int, int] = {}
            for v in levels[-1]:
                for w in adj[v]:
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[v]
            for w, c in nxt.items():
                dist[w] = d
                sigma[w] = c
            levels.append(sorted(nxt))
        delta = {v: 0.0 for v in dist}
        for d in range(len(levels) - 1, 0, -1):
            for v in levels[d - 1]:
                for w in adj[v]:
                    if dist.get(w) == d:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        for v, dl in delta.items():
            if v != s:
                bc[v] += dl
    return bc


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _check(spark, pairs, n_sources, max_depth):
    got = {
        r.vertex: r.bc_r
        for r in betweenness(
            _edges_df(spark, pairs), n_sources=n_sources, max_depth=max_depth
        ).collect()
    }
    want = py_betweenness(pairs, n_sources, max_depth)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-7), v
    return got


def test_betweenness_path_graph_depth_bound_binds(spark):
    # path 0-1-2-3-4-5: from source 0 with depth 3, vertices 4,5 are
    # outside the DAG, so 3 gets no downstream dependency from them
    pairs = [(i, i + 1) for i in range(5)]
    bounded = _check(spark, pairs, n_sources=1, max_depth=3)
    full = _check(spark, pairs, n_sources=1, max_depth=5)
    assert bounded[1] < full[1]  # the bound visibly truncates
    # full single-source path: delta(v) = #descendants below v
    assert full[1] == pytest.approx(4.0)
    assert full[4] == pytest.approx(1.0)
    assert bounded[5] == 0.0


def test_betweenness_diamond_splits_dependency(spark):
    # 0-1, 0-2, 1-3, 2-3: two shortest paths 0->3; 1 and 2 each carry
    # sigma ratio 1/2
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _check(spark, pairs, n_sources=1, max_depth=3)
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.5)
    assert got[3] == 0.0


def test_betweenness_matches_oracle_on_cooccurrence_graph(spark, sf_tiny):
    edges = part_graph(spark, sf_tiny)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = {
        r.vertex: r.bc_r
        for r in betweenness(edges, n_sources=6, max_depth=3).collect()
    }
    want = py_betweenness(pairs, n_sources=6, max_depth=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-7), v
    assert max(want.values()) > 0  # non-degenerate


def test_betweenness_rejects_bad_depth(spark):
    with pytest.raises(ValueError, match=">= 1"):
        betweenness(_edges_df(spark, [(0, 1)]), max_depth=0)


# ---------------------------------------------------------- sssp


def _dijkstra(wedges, seeds):
    import heapq

    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in wedges:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {s: 0 for s in seeds}
    pq = [(0, s) for s in seeds]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_converges_to_dijkstra_on_weighted_cooccurrence(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.sssp import sssp
    from paralleltrianglecounting_spark.sources.edges import weighted_part_graph

    wpg = weighted_part_graph(spark, sf_tiny)
    wedges = [(r.src, r.dst, r.weight) for r in wpg.collect()]
    seeds = sorted({u for u, _, _ in wedges} | {v for _, v, _ in wedges})[:4]
    # iterations far above the hop depth -> full SSSP fixpoint
    got = {r.vertex: r.dist for r in sssp(wpg, n_seeds=4, iterations=12).collect()}
    assert got == _dijkstra(wedges, seeds)


def test_sssp_hop_bound_prefers_heavier_shorter_path(spark):
    from paralleltrianglecounting_spark.operators.sssp import sssp

    # 0 -10- 9 (1 hop, weight 10) vs 0-1-2-3-9 (4 hops, total 4):
    # the light path needs 4 relaxation rounds
    wedges = [(0, 9, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 9, 1)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight long")
    bounded = {r.vertex: r.dist
               for r in sssp(df, n_seeds=1, iterations=2).collect()}
    full = {r.vertex: r.dist
            for r in sssp(df, n_seeds=1, iterations=6).collect()}
    assert bounded[9] == 10  # within 2 hops the heavy edge wins
    assert full[9] == 4      # the 4-hop light path at the fixpoint
    assert bounded[3] == 11  # within 2 hops only the 0-9-3 detour reaches 3
    assert full[3] == 3


# ---------------------------------------------------- harmonic


def py_harmonic(edges, n_sources, max_depth):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    h = {v: 0.0 for v in verts}
    for s in verts[:n_sources]:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, max_depth + 1):
            nxt = sorted(
                {w for v in frontier for w in adj[v] if w not in dist}
            )
            for w in nxt:
                dist[w] = d
                h[w] += 1.0 / d
            frontier = nxt
    return h


def test_harmonic_centrality_matches_sequential(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.betweenness import (
        harmonic_centrality,
    )

    edges = part_graph(spark, sf_tiny)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = {
        r.vertex: r.harmonic_r
        for r in harmonic_centrality(edges, n_sources=6, max_depth=3).collect()
    }
    want = py_harmonic(pairs, n_sources=6, max_depth=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-7), v


def test_harmonic_centrality_star(spark):
    from paralleltrianglecounting_spark.operators.betweenness import (
        harmonic_centrality,
    )

    # star: hub 0 with leaves 1..5; pivots {0, 1, 2, 3}
    pairs = [(0, i) for i in range(1, 6)]
    got = {
        r.vertex: r.harmonic_r
        for r in harmonic_centrality(
            _edges_df(spark, pairs), n_sources=4, max_depth=3
        ).collect()
    }
    # hub: reached at d=1 by pivots 1,2,3 -> 3.0
    assert got[0] == pytest.approx(3.0)
    # leaf 1: d=1 from hub pivot, d=2 from pivots 2,3 -> 1 + 2*0.5 = 2.0
    assert got[1] == pytest.approx(2.0)
    # leaf 5 (not a pivot): d=1 from 0, d=2 from 1,2,3 -> 1 + 3*0.5 = 2.5
    assert got[5] == pytest.approx(2.5)


# ---------------------------------------------------- closeness


def py_closeness(edges, n_sources, max_depth):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    n = {v: 0 for v in verts}
    sd = {v: 0 for v in verts}
    for s in verts[:n_sources]:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, max_depth + 1):
            nxt = sorted(
                {w for v in frontier for w in adj[v] if w not in dist}
            )
            for w in nxt:
                dist[w] = d
                n[w] += 1
                sd[w] += d
            frontier = nxt
    return {v: (n[v], sd[v], n[v] / sd[v] if sd[v] else 0.0) for v in verts}


def test_closeness_matches_sequential(spark, sf_tiny):
    from paralleltrianglecounting_spark.operators.betweenness import (
        closeness_centrality,
    )

    edges = part_graph(spark, sf_tiny)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = {
        r.vertex: (r.n_reached, r.sum_dist, r.closeness_r)
        for r in closeness_centrality(
            edges, n_sources=6, max_depth=3
        ).collect()
    }
    want = py_closeness(pairs, n_sources=6, max_depth=3)
    assert set(got) == set(want)
    for v, (n, sd, c) in want.items():
        assert got[v][0] == n and got[v][1] == sd, v
        assert got[v][2] == pytest.approx(c, abs=5e-7), v


def test_closeness_star(spark):
    from paralleltrianglecounting_spark.operators.betweenness import (
        closeness_centrality,
    )

    # star: hub 0 with leaves 1..5; pivots {0, 1, 2, 3}
    pairs = [(0, i) for i in range(1, 6)]
    got = {
        r.vertex: (r.n_reached, r.sum_dist, r.closeness_r)
        for r in closeness_centrality(
            _edges_df(spark, pairs), n_sources=4, max_depth=3
        ).collect()
    }
    # hub: reached at d=1 by pivots 1,2,3
    assert got[0] == (3, 3, pytest.approx(1.0))
    # leaf 1 (a pivot): d=1 from hub pivot, d=2 from pivots 2,3
    assert got[1] == (3, 5, pytest.approx(0.6))
    # leaf 5 (not a pivot): d=1 from 0, d=2 from 1,2,3
    assert got[5] == (4, 7, pytest.approx(4 / 7))


# ------------------------------------------- frontier lifecycle


def test_betweenness_bounded_cached_frontiers_deep_chain(spark, monkeypatch):
    """VERDICT r04 #5: the per-wave pin/release discipline keeps the
    number of cached RDDs CONSTANT in depth — at most two waves of
    state live at once — instead of one persisted frontier per level.
    Spied at every superstep checkpoint on a max_depth=8 run (2x8
    waves); also pins value-correctness vs the sequential oracle at
    that depth."""
    from paralleltrianglecounting_spark.plans import superstep as ss

    sc = spark.sparkContext._jsc.sc()
    base_id = max(
        [info.id() for info in sc.getRDDStorageInfo()], default=-1
    )
    counts: list[int] = []
    orig = ss.SuperstepRunner._checkpoint

    def spy(self, df, i, metrics):
        out = orig(self, df, i, metrics)
        # count only RDDs cached by THIS run (ids above the session
        # baseline) — earlier tests' blocks being async-cleaned must
        # not skew the reading
        counts.append(
            sum(1 for info in sc.getRDDStorageInfo() if info.id() > base_id)
        )
        return out

    monkeypatch.setattr(ss.SuperstepRunner, "_checkpoint", spy)

    pairs = [(i, i + 1) for i in range(20)]  # path: 8 full waves
    got = {
        r.vertex: r.bc_r
        for r in betweenness(
            _edges_df(spark, pairs), n_sources=2, max_depth=8
        ).collect()
    }
    want = py_betweenness(pairs, n_sources=2, max_depth=8)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-7), v

    assert len(counts) >= 14  # 8 forward + >=7 backward waves spied
    # The run's cached-RDD count must be CONSTANT in wave index, never
    # one-pinned-frontier-per-level. Steady sets: forward holds
    # {topology, verts, prev wave, new wave} = 4; backward additionally
    # keeps the (single) accumulated forward state it reads every wave
    # = 5. At most TWO waves of superstep state are ever live. Without
    # release_prev this list reads 4,5,6,7,... instead.
    assert max(counts) <= 5, counts
    assert counts[-1] <= 5 and counts[-1] >= counts[-2] - 1, counts
    # constant across the deep tail: the last 5 backward waves all see
    # the identical cached set
    assert len(set(counts[-5:])) == 1, counts


def test_betweenness_checkpointed_run_resumable_and_exact(spark, tmp_path):
    """With a checkpoint_dir both phases write per-wave parquet states +
    manifests (iteration, rows, lineage); a resumed run refuses a
    different graph's checkpoints and reuses its own."""
    import os

    pairs = [(i, i + 1) for i in range(9)] + [(0, 5)]
    ck = str(tmp_path / "bc_ck")
    got = {
        r.vertex: r.bc_r
        for r in betweenness(
            _edges_df(spark, pairs), n_sources=3, max_depth=4,
            checkpoint_dir=ck,
        ).collect()
    }
    want = py_betweenness(pairs, n_sources=3, max_depth=4)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=5e-7), v
    # both phases checkpointed with manifests
    fw = sorted(os.listdir(os.path.join(ck, "brandes_forward")))
    bw = sorted(os.listdir(os.path.join(ck, "brandes_backward")))
    assert fw and bw
    assert all(
        os.path.exists(os.path.join(ck, "brandes_forward", d, "manifest.json"))
        for d in fw
    )
    # identical rerun resumes and lands on the same answer
    again = {
        r.vertex: r.bc_r
        for r in betweenness(
            _edges_df(spark, pairs), n_sources=3, max_depth=4,
            checkpoint_dir=ck,
        ).collect()
    }
    assert again == got
    # a different graph against the same checkpoints is REFUSED
    other = [(i, i + 2) for i in range(12)]
    with pytest.raises(ValueError, match="refusing to resume"):
        betweenness(
            _edges_df(spark, other), n_sources=3, max_depth=4,
            checkpoint_dir=ck,
        ).collect()
