"""Triangle counting: golden parity with the reference's published
outputs, NumPy oracle agreement, cross-strategy agreement, and the edge
cases the reference mishandles (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.triangles import (
    clustering_coefficient,
    triangle_count,
    triangle_triples,
    triangles_per_vertex,
)
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph
from tests.oracles import (
    triangle_count_brute,
    triangle_count_trace,
    triangles_per_vertex_oracle,
)

# 'csr' auto-routes by the size gate (broadcast kernel under it, the
# join-based kernel above); both forced routes are exercised explicitly
STRATEGIES = ["intersect", "csr", "csr_bcast", "csr_join", "wedge"]

# golden values recounted from the reference's own bundled graphs and
# matching its published screenshots/CSV (SURVEY.md §5, FIXTURES.md §3)
GOLDEN = {"graph_11": 4, "graph_100": 373, "graph_10k": 20299}


@pytest.mark.parametrize("name,want", sorted(GOLDEN.items()))
@pytest.mark.parametrize("strategy", STRATEGIES)
def test_golden_parity(spark, name, want, strategy):
    edges = read_g_file(spark, reference_graph(name))
    got = triangle_count(edges, strategy=strategy).collect()[0]["triangles"]
    assert got == want


def test_header_is_ignored(spark):
    """graph_11 declares 11 vertices but contains id 11 — the reference's
    matrix loader writes out of bounds (utils/utils.cpp:25); we derive the
    vertex set from edges."""
    from paralleltrianglecounting_spark.operators.degrees import vertices

    edges = read_g_file(spark, reference_graph("graph_11"))
    assert vertices(edges).count() == 12
    assert edges.count() == 23


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_planted_matches_numpy_oracle(spark, strategy):
    edges = planted_triangles(spark, num_nodes=200, num_triangles=120, seed=7).cache()
    local = [(r.src, r.dst) for r in edges.collect()]
    want = triangle_count_trace(local)
    assert want >= 1
    got = triangle_count(edges, strategy=strategy).collect()[0]["triangles"]
    assert got == want


def test_tiny_brute_force_agreement(spark):
    edges = planted_triangles(spark, num_nodes=20, num_triangles=8, seed=3).cache()
    local = [(r.src, r.dst) for r in edges.collect()]
    assert triangle_count_brute(local) == triangle_count_trace(local)
    got = triangle_count(edges).collect()[0]["triangles"]
    assert got == triangle_count_brute(local)


def test_self_loops_and_duplicates_rejected(spark):
    raw = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (1, 2)], "u long, v long"
    )
    edges = canonicalize_edges(raw, "u", "v")
    assert edges.count() == 3
    assert triangle_count(edges).collect()[0]["triangles"] == 1


def test_id_renaming_invariance(spark):
    """Vertex-id relabeling must not change the count (rank ties break on
    id, but the count is invariant to any strict total order)."""
    e1 = planted_triangles(spark, num_nodes=100, num_triangles=60, seed=11).cache()
    shift = e1.select(
        (F.col("src") * 7919 + 13).alias("src"), (F.col("dst") * 7919 + 13).alias("dst")
    )
    e2 = canonicalize_edges(shift)
    c1 = triangle_count(e1).collect()[0]["triangles"]
    c2 = triangle_count(e2).collect()[0]["triangles"]
    assert c1 == c2


def test_per_vertex_counts(spark):
    edges = planted_triangles(spark, num_nodes=60, num_triangles=30, seed=5).cache()
    local = [(r.src, r.dst) for r in edges.collect()]
    want = triangles_per_vertex_oracle(local)
    for strategy in ["intersect", "csr"]:
        got = {
            r.vertex: r.triangles
            for r in triangles_per_vertex(edges, strategy=strategy).collect()
        }
        assert got == want


def test_triples_unique_and_complete(spark):
    edges = planted_triangles(spark, num_nodes=80, num_triangles=40, seed=9).cache()
    local = [(r.src, r.dst) for r in edges.collect()]
    triples = triangle_triples(edges).collect()
    as_sets = [frozenset((t.a, t.b, t.c)) for t in triples]
    assert len(as_sets) == len(set(as_sets))  # each triangle exactly once
    assert len(as_sets) == triangle_count_trace(local)
    es = {(u, v) for u, v in local}
    for t in as_sets:
        a, b, c = sorted(t)
        assert (a, b) in es and (b, c) in es and (a, c) in es


def test_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert triangle_count(edges).collect()[0]["triangles"] == 0


def test_clustering_coefficient(spark):
    # K3 plus a pendant vertex: coeff 1.0 for triangle corners with deg 2,
    # 1/3 for the corner with the pendant (deg 3, 1 triangle), 0 pendant.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {r.vertex: r.coeff for r in clustering_coefficient(edges).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(1.0)
    assert got[3] == pytest.approx(1 / 3)
    assert got[4] == 0.0


def test_replicated_multiplies_invariants(spark):
    """The scaling bench's scale-up (sources.edges.replicated) must
    multiply every exact invariant by the copy count."""
    from paralleltrianglecounting_spark.sources.edges import replicated

    edges = read_g_file(spark, reference_graph("graph_100"))
    big = replicated(edges, 3)
    assert big.count() == 3 * 600
    assert triangle_count(big).collect()[0]["triangles"] == 3 * 373
    # copies are vertex-disjoint: id ranges do not overlap
    assert big.select("src").union(big.select("dst")).distinct().count() == 3 * 100


def test_compact_id_probe_memoized_across_recreated_dataframes(spark, tmp_path):
    """VERDICT r02 #10: the int32-fits probe is keyed on the analyzed
    plan's semanticHash, so re-creating a DataFrame over the same table
    (or aliasing it) reuses the probe instead of re-running the agg job
    — and semantically different plans do NOT share a memo entry."""
    from paralleltrianglecounting_spark.operators import triangles as tri_mod

    p = str(tmp_path / "edges.parquet")
    spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long").write.parquet(p)

    tri_mod._EDGE_STATS_CACHE.clear()
    df1 = spark.read.parquet(p)
    assert tri_mod._use_compact_ids(df1, None) is True
    assert len(tri_mod._EDGE_STATS_CACHE) == 1

    # a re-created handle over the same table hits the cache: poison the
    # probe so any re-run would blow up
    df2 = spark.read.parquet(p)
    assert tri_mod._plan_key(df1) == tri_mod._plan_key(df2)
    orig_agg = type(df2).agg
    try:
        type(df2).agg = lambda *a, **k: (_ for _ in ()).throw(AssertionError("re-probed"))
        assert tri_mod._use_compact_ids(df2, None) is True
        assert tri_mod._use_compact_ids(df2.alias("z"), None) is True
    finally:
        type(df2).agg = orig_agg

    # a different plan (filter applied) gets its own probe
    df3 = df1.where(F.col("src") > 0)
    assert tri_mod._plan_key(df3) != tri_mod._plan_key(df1)
    assert tri_mod._use_compact_ids(df3, None) is True
    assert len(tri_mod._EDGE_STATS_CACHE) == 2
    tri_mod._EDGE_STATS_CACHE.clear()


def test_auto_strategy_picks_by_cost_probe(spark, monkeypatch):
    """strategy='auto': small graphs route to the broadcast-CSR kernel
    (measured fastest at every under-gate scale); past the small-graph
    margin the degree-derived cost probe picks wedge in the W≈0 regime
    (star orientation — no vertex has two out-neighbors, nothing to
    shuffle) and intersect on dense graphs (W/I well above the
    crossover). The count is unchanged on every route."""
    from paralleltrianglecounting_spark.operators import triangles as tri_mod
    from paralleltrianglecounting_spark.operators.triangles import (
        choose_strategy,
        strategy_cost_estimate,
    )

    star = spark.createDataFrame([(0, i) for i in range(1, 51)], "src long, dst long")
    dense = read_g_file(spark, reference_graph("graph_100"))

    # under the small-graph margin both route to the broadcast kernel
    assert choose_strategy(star) == "csr_bcast"
    assert choose_strategy(dense) == "csr_bcast"
    assert triangle_count(star, strategy="auto").collect()[0]["triangles"] == 0
    assert triangle_count(dense, strategy="auto").collect()[0]["triangles"] == 373

    # past the margin (gate forced to 0) the cost probe decides:
    # star -> every pendant has d+=1, hub d+=0 -> W=0 -> wedge;
    # dense graph_100 -> W/I far above the crossover -> intersect
    monkeypatch.setattr(tri_mod, "CSR_BROADCAST_MAX_EDGES", 0)
    est = strategy_cost_estimate(star)
    assert est["wedge_rows"] == 0 and est["intersect_elems"] > 0
    assert choose_strategy(star) == "wedge"
    assert triangle_count(star, strategy="auto").collect()[0]["triangles"] == 0
    est = strategy_cost_estimate(dense)
    assert est["wedge_rows"] > tri_mod.AUTO_WEDGE_RATIO * est["intersect_elems"]
    assert choose_strategy(dense) == "intersect"
    assert triangle_count(dense, strategy="auto").collect()[0]["triangles"] == 373

    # wedge-sparse WITH triangles (W > 0 but W/I under the crossover):
    # long chains keep almost every d+ at 1, the planted triangles are
    # the only two-out-neighbor vertices — auto must pick wedge AND
    # still count exactly
    chain = [(i, i + 1) for i in range(300)]
    tris = []
    for k in range(5):
        a = 1000 + 3 * k
        tris += [(a, a + 1), (a + 1, a + 2), (a, a + 2)]
    sparse = spark.createDataFrame(chain + tris, "src long, dst long")
    est = strategy_cost_estimate(sparse)
    assert 0 < est["wedge_rows"] < tri_mod.AUTO_WEDGE_RATIO * est["intersect_elems"]
    assert choose_strategy(sparse) == "wedge"
    assert triangle_count(sparse, strategy="auto").collect()[0]["triangles"] == 5


def test_csr_gate_routes_to_join_kernel(spark, monkeypatch):
    """With the broadcast size gate forced to 0 the 'csr' strategy must
    take the join-based partition-local kernel and still match golden —
    the same plan-switch a broadcast hash join makes past its
    threshold."""
    from paralleltrianglecounting_spark.operators import triangles as tri_mod

    edges = read_g_file(spark, reference_graph("graph_100"))
    assert tri_mod._route_csr(edges, "csr") == "csr_bcast"
    monkeypatch.setattr(tri_mod, "CSR_BROADCAST_MAX_EDGES", 0)
    assert tri_mod._route_csr(edges, "csr") == "csr_join"
    assert triangle_count(edges, strategy="csr").collect()[0]["triangles"] == 373


def test_csr_bcast_triples_and_per_edge(spark):
    """The broadcast kernel's 'edges' and 'triples' modes agree with the
    join-based route row-for-row (keyed comparison, never positional)."""
    from paralleltrianglecounting_spark.operators.triangles import (
        edge_triangle_counts,
    )

    edges = read_g_file(spark, reference_graph("graph_100"))
    b = {
        (r["src"], r["dst"]): r["tri_cnt"]
        for r in edge_triangle_counts(edges, strategy="csr_bcast").collect()
        if r["tri_cnt"] > 0
    }
    j = {
        (r["src"], r["dst"]): r["tri_cnt"]
        for r in edge_triangle_counts(edges, strategy="csr_join").collect()
        if r["tri_cnt"] > 0
    }
    assert b == j and sum(b.values()) == 373
    tb = {tuple(r) for r in triangle_triples(edges, strategy="csr_bcast").collect()}
    tj = {tuple(r) for r in triangle_triples(edges, strategy="csr_join").collect()}
    assert tb == tj and len(tb) == 373


def test_orient_arrays_matches_spark_orientation(spark):
    """The driver-side NumPy orientation used by the broadcast-CSR
    regime applies the identical (degree, id) total order as
    orient_edges — per-edge equality, not just count equality."""
    import numpy as np

    from paralleltrianglecounting_spark.operators.csr import orient_arrays
    from paralleltrianglecounting_spark.operators.orientation import orient_edges

    edges = read_g_file(spark, reference_graph("graph_100"))
    want = {(r["src"], r["dst"]) for r in orient_edges(edges).collect()}
    tbl = edges.select("src", "dst").toArrow()
    s, d = orient_arrays(
        tbl.column("src").to_numpy(zero_copy_only=False),
        tbl.column("dst").to_numpy(zero_copy_only=False),
    )
    assert {(int(a), int(b)) for a, b in zip(s, d)} == want


def test_approx_triangle_count_deterministic_and_converging(spark):
    """DOULION hash-sampled estimate: q=1 degenerates to the exact
    count; lower q stays within sampling error; the sample is a pure
    function of the input so every value is golden-pinned (the same
    determinism the DuckDB gate relies on)."""
    from paralleltrianglecounting_spark.operators.triangles import (
        approx_triangle_count,
    )

    edges = read_g_file(spark, reference_graph("graph_10k"))
    want = {
        (1, 1): (20299, 59965, 20299.0),
        (1, 2): (2576, 30111, 20608.0),
        (1, 4): (334, 15205, 21376.0),
    }
    for (num, den), (st, se, est) in want.items():
        r = approx_triangle_count(edges, num, den).collect()[0]
        assert (r["sample_triangles"], r["sampled_edges"], r["triangles_est"]) == (
            st,
            se,
            est,
        ), (num, den)
        assert r["triangles_est"] == round(st * (den / num) ** 3, 4)
    # q=1/2 and 1/4 estimates bracket the truth within ~6%
    assert abs(20608.0 - 20299) / 20299 < 0.06
    assert abs(21376.0 - 20299) / 20299 < 0.06

    with pytest.raises(ValueError):
        approx_triangle_count(edges, 0, 4)
    with pytest.raises(ValueError):
        approx_triangle_count(edges, 5, 4)


def test_per_edge_row_universe_identical_across_strategies(spark):
    """edge_triangle_counts returns EVERY oriented edge (zeros included)
    under every strategy — 'auto' may change the plan but never the
    output rows (ADVICE r03 #2: the wedge route used to emit only
    tri_cnt > 0 edges)."""
    from paralleltrianglecounting_spark.operators.triangles import (
        edge_triangle_counts,
    )

    # triangle + pendant edge + isolated edge: two triangle-free edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (8, 9)], "src long, dst long"
    )
    results = {
        s: {
            (r.src, r.dst): r.tri_cnt
            for r in edge_triangle_counts(edges, strategy=s).collect()
        }
        for s in ("intersect", "wedge", "csr_bcast", "csr_join")
    }
    base = results["intersect"]
    # each triangle closes at exactly ONE oriented edge; the other four
    # oriented edges must still appear with tri_cnt 0
    assert len(base) == 5 and sorted(base.values()) == [0, 0, 0, 0, 1]
    for s, got in results.items():
        assert got == base, f"strategy {s} changed the row universe"


def test_stats_memo_invalidated_by_appended_files(spark, tmp_path):
    """An append that adds a part file must invalidate the memoized
    stats probe (ADVICE r03 #5): post-append ids above 2^31 must flip
    the compact-id auto-detect off, not ride a stale int32 decision."""
    from paralleltrianglecounting_spark.operators.triangles import (
        _edge_stats,
        _use_compact_ids,
    )

    path = str(tmp_path / "append_edges")
    spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long").write.parquet(path)
    first = spark.read.parquet(path)
    assert _edge_stats(first) == (2, 1, 3)
    assert _use_compact_ids(first, None) is True

    big = 1 << 40
    spark.createDataFrame([(big, big + 1)], "src long, dst long").write.mode(
        "append"
    ).parquet(path)
    again = spark.read.parquet(path)
    n, lo, hi = _edge_stats(again)
    assert n == 3 and hi == big + 1
    assert _use_compact_ids(again, None) is False
