"""Full core decomposition (h-index fixpoint): sequential-peel twin,
k-core cross-consistency, structural invariants, determinism."""

from __future__ import annotations

from collections import defaultdict

from paralleltrianglecounting_spark.operators.degrees import degrees
from paralleltrianglecounting_spark.operators.kcore import core_numbers, k_core
from paralleltrianglecounting_spark.sources.edges import canonicalize_edges
from paralleltrianglecounting_spark.sources.gfile import read_g_file
from paralleltrianglecounting_spark.sources.planted import planted_triangles
from tests.conftest import reference_graph


def py_coreness(pairs):
    """Sequential min-degree peeling — the textbook definition."""
    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    live = {v: set(n) for v, n in adj.items()}
    core = {}
    k = 1
    while live:
        changed = True
        while changed:
            drop = [v for v, n in live.items() if len(n) < k]
            changed = bool(drop)
            for v in drop:
                core[v] = k - 1
                for u in live[v]:
                    live[u].discard(v)
                del live[v]
        k += 1
    return core


def _collect(df):
    return {r.vertex: r.coreness for r in df.collect()}


def test_coreness_matches_peel_reference_graph(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    pairs = [(r.src, r.dst) for r in edges.collect()]
    assert _collect(core_numbers(edges)) == py_coreness(pairs)


def test_coreness_matches_peel_planted(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=120, num_triangles=90, seed=11)
    )
    pairs = [(r.src, r.dst) for r in edges.collect()]
    assert _collect(core_numbers(edges)) == py_coreness(pairs)


def test_coreness_consistent_with_k_core(spark):
    # coreness(v) >= k  <=>  v in k-core(k)
    edges = read_g_file(spark, reference_graph("graph_100"))
    cn = _collect(core_numbers(edges))
    for k in (1, 2, 4, 8):
        kc = {r.vertex for r in k_core(edges, k=k).collect()}
        assert kc == {v for v, c in cn.items() if c >= k}


def test_coreness_bounded_by_degree_and_known_shapes(spark):
    # path: all coreness 1; triangle with a pendant: 2,2,2,1
    pairs = [(0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    assert _collect(core_numbers(df)) == {0: 1, 1: 1, 2: 1, 3: 1}
    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 9)], "src long, dst long"
    )
    assert _collect(core_numbers(tri)) == {0: 2, 1: 2, 2: 2, 9: 1}
    edges = read_g_file(spark, reference_graph("graph_100"))
    cn = _collect(core_numbers(edges))
    deg = {r.vertex: r.degree for r in degrees(edges).collect()}
    assert all(cn[v] <= deg[v] for v in cn)


def test_coreness_deterministic_across_parallelism(spark):
    edges = canonicalize_edges(
        planted_triangles(spark, num_nodes=80, num_triangles=50, seed=4)
    )
    a = _collect(core_numbers(edges.repartition(1)))
    b = _collect(core_numbers(edges.repartition(16)))
    assert a == b


# ---------------- weighted s-core ----------------

from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.kcore import s_core


def py_s_core(wtriples, s):
    """Sequential weighted peeling — the textbook s-core definition
    (delete any vertex with strength < s until none remains)."""
    live = {(u, v): w for u, v, w in wtriples if u != v}
    while True:
        st = defaultdict(int)
        for (u, v), w in live.items():
            st[u] += w
            st[v] += w
        drop = {v for v, sv in st.items() if sv < s}
        if not drop:
            break
        live = {e: w for e, w in live.items()
                if e[0] not in drop and e[1] not in drop}
    out = set()
    for u, v in live:
        out.add(u)
        out.add(v)
    return out


def _mkw(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in triples],
        "src long, dst long, weight long",
    )


def test_s_core_hand_cascade(spark):
    # 0-1-2 heavy triangle (w=5 each, strength 10); pendant 3 hangs off
    # 2 with w=4. s=8: 3 peels first (strength 4), which drops nothing
    # else (triangle strengths stay 10) -> core {0,1,2}. s=11: everything
    # cascades away.
    triples = [(0, 1, 5), (1, 2, 5), (0, 2, 5), (2, 3, 4)]
    got = {r.vertex for r in s_core(_mkw(spark, triples), s=8).collect()}
    assert got == {0, 1, 2} == py_s_core(triples, 8)
    assert s_core(_mkw(spark, triples), s=11).count() == 0


def test_s_core_unit_weights_equal_k_core(spark):
    edges = read_g_file(spark, reference_graph("graph_100"))
    w = edges.select("src", "dst", F.lit(1).cast("long").alias("weight"))
    for k in (3, 5):
        assert (
            {r.vertex for r in s_core(w, s=k).collect()}
            == {r.vertex for r in k_core(edges, k=k).collect()}
        )


def test_s_core_fuzz_matches_sequential_peel(spark):
    import random

    rng = random.Random(17)
    triples = []
    seen = set()
    for _ in range(300):
        u, v = rng.randrange(40), rng.randrange(40)
        if u == v:
            continue
        e = (min(u, v), max(u, v))
        if e in seen:
            continue
        seen.add(e)
        triples.append((e[0], e[1], rng.randrange(1, 6)))
    for s in (5, 12, 25):
        got = {r.vertex for r in s_core(_mkw(spark, triples), s=s).collect()}
        assert got == py_s_core(triples, s), f"s={s}"


def test_s_core_gate_depth_stays_under_unroll(spark):
    """Cheap early guard (the KCORE_UNROLL convention): the gate-tier
    oracle unrolls S_CORE_UNROLL rounds, so the engine's measured peel
    depth on the gate constants must stay strictly below it (bigger
    tiers are retuned by tools/correctness_sf.py's depth probe)."""
    import __spark_entry__ as entry
    from paralleltrianglecounting_spark.operators.kcore import s_core_run
    from paralleltrianglecounting_spark.sources.edges import weighted_part_graph

    res = s_core_run(
        weighted_part_graph(spark, "/root/testdata/sf0.001"), s=entry.S_CORE_S
    )
    assert res.converged and res.iterations < entry.S_CORE_UNROLL


def test_s_core_bidirected_input_equals_canonical(spark):
    """Duplicate (u,v,w)/(v,u,w) rows — the representation k_core
    tolerates — must collapse to one edge, not double every strength."""
    triples = [(0, 1, 5), (1, 2, 5), (0, 2, 5), (2, 3, 4)]
    bidir = triples + [(b, a, w) for a, b, w in triples]
    got_c = {r.vertex for r in s_core(_mkw(spark, triples), s=8).collect()}
    got_b = {r.vertex for r in s_core(_mkw(spark, bidir), s=8).collect()}
    assert got_c == got_b == {0, 1, 2}
