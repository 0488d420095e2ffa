"""Bipartite motifs (butterflies), DAG topological levels, and
document chunking: brute-force twins, hand cases, invariants, edge
cases, and determinism across parallelism."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.bipartite import bipartite_motifs
from paralleltrianglecounting_spark.operators.dag import topological_levels
from paralleltrianglecounting_spark.operators.text import chunk_documents


# --- bipartite motifs ------------------------------------------------------


def brute_butterflies(inc):
    """Count K_{2,2} by enumeration over entity pairs."""
    from collections import defaultdict

    ent_containers = defaultdict(set)
    for c, e in inc:
        ent_containers[e].add(c)
    total = 0
    for u, v in itertools.combinations(sorted(ent_containers), 2):
        co = len(ent_containers[u] & ent_containers[v])
        total += co * (co - 1) // 2
    return total


def _inc_df(spark, inc):
    return spark.createDataFrame(
        [(str(c), int(e)) for c, e in inc], "c string, e long"
    )


def test_butterflies_hand_case(spark):
    # two containers sharing entities {1,2} -> exactly one butterfly;
    # a third container with {1,3} adds wedges but no butterfly
    inc = [("a", 1), ("a", 2), ("b", 1), ("b", 2), ("c", 1), ("c", 3)]
    row = bipartite_motifs(_inc_df(spark, inc), "c", "e").collect()[0]
    assert row.butterflies == 1
    # left wedges: C(2,2)=1 per container with 2 entities, 3 containers
    assert row.left_wedges == 3
    # right wedges: entity 1 in 3 containers C(3,2)=3, entity 2 in 2 -> 1
    assert row.right_wedges == 4
    assert row.containers == 3 and row.entities == 3


def test_butterflies_brute_force_random(spark):
    import random

    rng = random.Random(7)
    inc = {(f"c{rng.randrange(12)}", rng.randrange(20)) for _ in range(120)}
    inc = sorted(inc)
    row = bipartite_motifs(_inc_df(spark, inc), "c", "e").collect()[0]
    assert row.butterflies == brute_butterflies(inc)


def test_butterflies_container_cap(spark):
    # a hub container above the cap contributes nothing
    hub = [("hub", e) for e in range(10)]
    small = [("s1", 1), ("s1", 2), ("s2", 1), ("s2", 2)]
    full = bipartite_motifs(_inc_df(spark, hub + small), "c", "e").collect()[0]
    capped = bipartite_motifs(
        _inc_df(spark, hub + small), "c", "e", max_container_size=4
    ).collect()[0]
    assert full.butterflies == brute_butterflies(hub + small)
    assert capped.butterflies == brute_butterflies(small)


def test_butterflies_duplicate_incidence_rows_ignored(spark):
    inc = [("a", 1), ("a", 2), ("b", 1), ("b", 2)]
    dup = inc + inc + [("a", 1)]
    row = bipartite_motifs(_inc_df(spark, dup), "c", "e").collect()[0]
    assert row.butterflies == 1 and row.left_wedges == 2


# --- topological levels ----------------------------------------------------


def py_topo_levels(pairs):
    """Longest-path layering by sequential Kahn rounds."""
    verts = {u for e in pairs for u in e}
    level: dict[int, int] = {}
    r = 0
    live = set(verts)
    while live:
        blocked = {v for u, v in pairs if u in live}
        now = live - blocked
        if not now:
            raise RuntimeError("cycle")
        for v in now:
            level[v] = r
        live -= now
        pairs = [(u, v) for u, v in pairs if u not in now]
        r += 1
    return level


def _dag_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "src long, dst long"
    )


def test_topo_diamond_and_multi_pred(spark):
    # diamond a->b, a->c, b->d, c->d plus a shortcut a->d:
    # longest path to d is 2 regardless of the shortcut
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)]
    got = {
        (r.vertex, r.level)
        for r in topological_levels(_dag_df(spark, pairs)).collect()
    }
    assert got == {(0, 0), (1, 1), (2, 1), (3, 2)}
    assert got == set(py_topo_levels(pairs).items())


def test_topo_longest_path_semantics(spark):
    # a->b->c with direct a->c: c settles at 2 (longest), not 1
    pairs = [(10, 11), (11, 12), (10, 12)]
    got = dict(
        (r.vertex, r.level)
        for r in topological_levels(_dag_df(spark, pairs)).collect()
    )
    assert got == {10: 0, 11: 1, 12: 2}


def test_topo_random_dag_matches_twin(spark):
    import random

    rng = random.Random(23)
    # random DAG: edges only from lower to higher id -> acyclic
    pairs = {
        (a, b)
        for _ in range(150)
        for a, b in [sorted(rng.sample(range(40), 2))]
    }
    pairs = sorted(pairs)
    got = dict(
        (r.vertex, r.level)
        for r in topological_levels(_dag_df(spark, pairs)).collect()
    )
    assert got == py_topo_levels(pairs)


def test_topo_cycle_raises(spark):
    with pytest.raises(RuntimeError, match="cycle"):
        topological_levels(_dag_df(spark, [(1, 2), (2, 3), (3, 1)]))


def test_topo_deterministic_across_parallelism(spark):
    pairs = [(i, i + 1) for i in range(20)] + [(0, 21), (21, 10)]
    base = _dag_df(spark, pairs)
    a = sorted(
        (r.vertex, r.level)
        for r in topological_levels(base.repartition(1)).collect()
    )
    b = sorted(
        (r.vertex, r.level)
        for r in topological_levels(base.repartition(16)).collect()
    )
    assert a == b


def test_topo_max_rounds_raises(spark):
    pairs = [(i, i + 1) for i in range(10)]
    with pytest.raises(RuntimeError, match="max_rounds"):
        topological_levels(_dag_df(spark, pairs), max_rounds=3)


# --- document chunking -----------------------------------------------------


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunks_hand_case(spark):
    # 5 tokens, chunk 3, overlap 1 -> stride 2 -> starts 0,2,4
    docs = _docs_df(spark, ["t1 t2  t3\tt4\nt5"])
    got = sorted(
        (r.chunk_id, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_size=3, overlap=1).collect()
    )
    assert got == [
        (0, 3, "t1 t2 t3"),
        (1, 3, "t3 t4 t5"),
        (2, 1, "t5"),
    ]


def test_chunks_empty_and_whitespace_docs(spark):
    docs = _docs_df(spark, ["", "   \t\n  ", "one"])
    got = chunk_documents(docs, chunk_size=4, overlap=0).collect()
    assert [(r.doc_id, r.chunk_id, r.chunk_text) for r in got] == [(2, 0, "one")]


def test_chunks_zero_overlap_partitions_tokens(spark):
    # with overlap=0 the chunks partition the token stream exactly
    text = " ".join(f"w{i}" for i in range(17))
    docs = _docs_df(spark, [text])
    rows = sorted(
        chunk_documents(docs, chunk_size=5, overlap=0).collect(),
        key=lambda r: r.chunk_id,
    )
    rebuilt = " ".join(r.chunk_text for r in rows)
    assert rebuilt == text
    assert [r.n_chunk_tokens for r in rows] == [5, 5, 5, 2]


def test_chunks_overlap_prefix_property(spark):
    # consecutive chunks share exactly `overlap` tokens at the seam
    text = " ".join(f"w{i}" for i in range(30))
    rows = sorted(
        chunk_documents(
            _docs_df(spark, [text]), chunk_size=8, overlap=3
        ).collect(),
        key=lambda r: r.chunk_id,
    )
    for a, b in zip(rows, rows[1:]):
        ta, tb = a.chunk_text.split(" "), b.chunk_text.split(" ")
        if len(ta) == 8:
            assert ta[-3:] == tb[:3]


def test_chunks_param_validation(spark):
    docs = _docs_df(spark, ["a b c"])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=4, overlap=4)


# ---------------------------------------------------------------- projection_cost


def _brute_projection_cost(inc):
    from collections import defaultdict

    cdeg = defaultdict(int)
    for c, e in set(inc):
        cdeg[c] += 1
    buckets = defaultdict(lambda: [0, 0, 0])
    for d in cdeg.values():
        b = d.bit_length() - 1  # floor(log2 d)
        buckets[b][0] += 1
        buckets[b][1] += d
        buckets[b][2] += d * (d - 1) // 2
    return {b: tuple(v) for b, v in buckets.items()}


def test_projection_cost_matches_brute(spark):
    import random

    from paralleltrianglecounting_spark.operators.bipartite import (
        projection_cost,
    )

    rng = random.Random(11)
    inc = [(rng.randrange(25), rng.randrange(60)) for _ in range(300)]
    got = {
        r.bucket: (r.containers, r.incidences, r.proj_pairs)
        for r in projection_cost(_inc_df(spark, inc), "c", "e").collect()
    }
    assert got == _brute_projection_cost(inc)


def test_projection_cost_totals_match_motifs(spark):
    """Σ proj_pairs over buckets == left_wedges from bipartite_motifs
    (both count the projection's pre-dedup pair emissions), and
    Σ containers/incidences match the motif scalars."""
    import random

    from paralleltrianglecounting_spark.operators.bipartite import (
        projection_cost,
    )

    rng = random.Random(3)
    inc = [(rng.randrange(15), rng.randrange(40)) for _ in range(200)]
    pc = projection_cost(_inc_df(spark, inc), "c", "e").collect()
    m = bipartite_motifs(_inc_df(spark, inc), "c", "e").collect()[0]
    assert sum(r.proj_pairs for r in pc) == m.left_wedges
    assert sum(r.containers for r in pc) == m.containers
    # duplicate rows in the raw incidence are ignored (distinct first)
    dup = projection_cost(_inc_df(spark, inc + inc), "c", "e").collect()
    assert sorted(map(tuple, dup)) == sorted(map(tuple, pc))


def test_projection_cost_hub_bucket_visible(spark):
    """A single hub container lands alone in the top bucket with its
    quadratic pair count — the signal the audit exists to surface."""
    from paralleltrianglecounting_spark.operators.bipartite import (
        projection_cost,
    )

    inc = [("hub", e) for e in range(64)] + [("tiny", 0), ("tiny", 1)]
    got = {
        r.bucket: (r.containers, r.incidences, r.proj_pairs)
        for r in projection_cost(_inc_df(spark, inc), "c", "e").collect()
    }
    assert got == {6: (1, 64, 64 * 63 // 2), 1: (1, 2, 1)}
