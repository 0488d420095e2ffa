"""SALSA (Lempel & Moran 2000): pure-Python twin, exact mass
conservation, side semantics, parallelism determinism."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.hits import salsa


def _py_salsa(edges: list[tuple[int, int]], iterations: int):
    outd: dict[int, int] = {}
    ind: dict[int, int] = {}
    for u, v in edges:
        outd[u] = outd.get(u, 0) + 1
        ind[v] = ind.get(v, 0) + 1
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    auth = {v: 1.0 / len(ind) for v in ind}
    for _ in range(iterations):
        hub: dict[int, float] = {}
        for u, v in edges:
            hub[u] = hub.get(u, 0.0) + auth.get(v, 0.0) / ind[v]
        nxt: dict[int, float] = {}
        for u, v in edges:
            nxt[v] = nxt.get(v, 0.0) + hub.get(u, 0.0) / outd[u]
        auth = nxt
    hub = {}
    for u, v in edges:
        hub[u] = hub.get(u, 0.0) + auth.get(v, 0.0) / ind[v]
    return {
        w: (hub.get(w, 0.0), auth.get(w, 0.0)) for w in verts
    }


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_salsa_twin_random_digraphs(spark):
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        edges = sorted(
            {
                (rng.randrange(20), rng.randrange(20))
                for _ in range(60)
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        want = _py_salsa(edges, 4)
        got = {
            r["vertex"]: (r["hub"], r["auth"])
            for r in salsa(_df(spark, edges), iterations=4).collect()
        }
        assert set(got) == set(want)
        for w in want:
            assert got[w][0] == pytest.approx(want[w][0], abs=1e-12)
            assert got[w][1] == pytest.approx(want[w][1], abs=1e-12)


def test_salsa_mass_conservation_and_sides(spark):
    # star in + chain out: 1->3, 2->3, 3->4
    edges = [(1, 3), (2, 3), (3, 4)]
    rows = {r["vertex"]: r for r in salsa(_df(spark, edges), iterations=6).collect()}
    s_auth = sum(r["auth"] for r in rows.values())
    s_hub = sum(r["hub"] for r in rows.values())
    assert s_auth == pytest.approx(1.0, abs=1e-12)
    assert s_hub == pytest.approx(1.0, abs=1e-12)
    # vertex 4 has no out-edges: pure authority; 1 and 2: pure hubs
    assert rows[4]["hub"] == 0.0 and rows[4]["auth"] > 0
    assert rows[1]["auth"] == 0.0 and rows[1]["hub"] > 0
    assert rows[2]["auth"] == 0.0 and rows[2]["hub"] > 0


def test_salsa_parallelism_determinism(spark):
    rng = random.Random(3)
    edges = [(u, v) for u, v in {(rng.randrange(30), rng.randrange(30)) for _ in range(120)} if u != v]
    df1 = _df(spark, edges).repartition(1)
    df16 = _df(spark, edges).repartition(16)
    r1 = {r["vertex"]: (round(r["hub"], 9), round(r["auth"], 9)) for r in salsa(df1, 3).collect()}
    r16 = {r["vertex"]: (round(r["hub"], 9), round(r["auth"], 9)) for r in salsa(df16, 3).collect()}
    assert r1 == r16


def test_salsa_empty(spark):
    out = salsa(_df(spark, []), iterations=3)
    assert out.count() == 0
