"""Borůvka minimum spanning forest: exact agreement with a sequential
Kruskal twin (the MSF is unique under the (weight, src, dst) strict
total order), forest invariants, determinism across parallelism,
long-parent-chain pointer jumping, and checkpoint/resume."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.msf import (
    minimum_spanning_forest,
    msf_run,
)
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph
from tests.oracles import components_oracle


def _w(u: int, v: int) -> int:
    return int(hashlib.md5(f"{u}:{v}".encode()).hexdigest()[:6], 16)


def kruskal(weighted):
    """The unique MSF under the (w, src, dst) total order."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    picked = set()
    for w, s, d in sorted((w, s, d) for s, d, w in weighted):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            picked.add((s, d, w))
    return picked


def _wdf(spark, weighted):
    return spark.createDataFrame(weighted, "src long, dst long, weight long")


def _collect_forest(df) -> set:
    return {(r.src, r.dst, r.weight) for r in df.collect()}


def test_msf_equals_kruskal_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100")).withColumn(
        "weight", F.lit(1)
    )
    pairs = [(r.src, r.dst, 1) for r in edges.select("src", "dst").collect()]
    assert _collect_forest(minimum_spanning_forest(edges)) == kruskal(pairs)


def test_msf_weighted_planted(spark):
    base = canonicalize_edges(
        planted_triangles(spark, num_nodes=120, num_triangles=80, seed=11)
    )
    pairs = [(r.src, r.dst, _w(r.src, r.dst)) for r in base.collect()]
    forest = _collect_forest(minimum_spanning_forest(_wdf(spark, pairs)))
    want = kruskal(pairs)
    assert forest == want
    # forest invariants: |MSF| = |V| - #components, and total weight
    # matches the sequential optimum
    comp = components_oracle([(s, d) for s, d, _ in pairs])
    n_comp = len(set(comp.values()))
    assert len(forest) == len(comp) - n_comp
    assert sum(w for _, _, w in forest) == sum(w for _, _, w in want)


def test_msf_long_chain_pointer_jumping(spark):
    # a path with monotonically increasing weights makes every interior
    # component choose its LEFT edge in round 1 — one parent chain of
    # length |V|, the pointer-jumping worst case
    n = 64
    pairs = [(i, i + 1, 10 + i) for i in range(n - 1)]
    res = msf_run(_wdf(spark, pairs))
    assert res.converged
    forest = {
        (r.a, r.b, r.w)
        for r in res.state.where("mround >= 1").collect()
    }
    assert forest == {(s, d, w) for s, d, w in pairs}  # a tree IS its MSF


def test_msf_deterministic_across_parallelism(spark):
    base = canonicalize_edges(
        planted_triangles(spark, num_nodes=80, num_triangles=60, seed=3)
    )
    pairs = [(r.src, r.dst, _w(r.src, r.dst)) for r in base.collect()]
    one = _collect_forest(minimum_spanning_forest(_wdf(spark, pairs).repartition(1)))
    many = _collect_forest(
        minimum_spanning_forest(_wdf(spark, pairs).repartition(16))
    )
    assert one == many


def test_msf_max_rounds_raises(spark):
    with pytest.raises(RuntimeError):
        minimum_spanning_forest(_wdf(spark, [(0, 1, 5), (2, 3, 7)]), max_rounds=0)


def test_msf_checkpoint_resume(spark, tmp_path):
    base = canonicalize_edges(
        planted_triangles(spark, num_nodes=50, num_triangles=30, seed=7)
    )
    pairs = [(r.src, r.dst, _w(r.src, r.dst)) for r in base.collect()]
    wdf = _wdf(spark, pairs)
    ck = str(tmp_path / "msf")
    full = msf_run(wdf, checkpoint_dir=ck)
    assert full.converged
    want = sorted(
        (r.a, r.b, r.w, r.mround) for r in full.state.where("mround >= 1").collect()
    )
    # resuming from the completed checkpoints replays no supersteps
    again = msf_run(wdf, checkpoint_dir=ck)
    got = sorted(
        (r.a, r.b, r.w, r.mround) for r in again.state.where("mround >= 1").collect()
    )
    assert got == want
    # a different graph's resume against the same dir must refuse
    other = _wdf(spark, [(s, d, w + 1) for s, d, w in pairs])
    with pytest.raises(ValueError):
        msf_run(other, checkpoint_dir=ck)


def test_msf_gate_unroll_sufficient(spark, sf_tiny):
    """The oracle unrolls MSF_UNROLL rounds; the engine must converge
    within that depth on the gate-shaped graph (fixpoint rounds are
    idempotent, so deeper unrolls stay exact)."""
    import __spark_entry__ as entry
    from paralleltrianglecounting_spark.sources.edges import weighted_part_graph

    res = msf_run(weighted_part_graph(spark, sf_tiny))
    assert res.converged
    assert res.iterations <= entry.MSF_UNROLL


def test_single_linkage_identity_and_brute(spark):
    """The single-linkage identity: clusters from the under-threshold
    FOREST edges equal connected components of the under-threshold
    FULL subgraph (engine-vs-engine), and both match a union-find
    twin, across several thresholds of a planted weighted graph."""
    from paralleltrianglecounting_spark.operators.components import (
        connected_components,
    )
    from paralleltrianglecounting_spark.operators.msf import (
        single_linkage_clusters,
    )

    base = canonicalize_edges(
        planted_triangles(spark, num_nodes=100, num_triangles=70, seed=13)
    )
    pairs = [(r.src, r.dst, _w(r.src, r.dst) % 7 + 1) for r in base.collect()]
    wdf = _wdf(spark, pairs)
    all_v = sorted({v for s, d, _ in pairs for v in (s, d)})
    for t in (0, 2, 4, 7):
        got = {r.vertex: r.cluster for r in
               single_linkage_clusters(wdf, t).collect()}
        # full-subgraph components, via the engine's CC operator
        sub = wdf.where(F.col("weight") <= t).select("src", "dst")
        full = {r.vertex: r.component for r in connected_components(sub).collect()}
        want_full = {v: full.get(v, v) for v in all_v}
        assert got == want_full
        # union-find twin
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, d, w in pairs:
            if w <= t:
                rs, rd = find(s), find(d)
                if rs != rd:
                    parent[rs] = rd
        label = {}
        for v in all_v:
            r = find(v)
            label.setdefault(r, []).append(v)
        want = {v: min(vs) for r, vs in label.items() for v in vs}
        assert got == want
