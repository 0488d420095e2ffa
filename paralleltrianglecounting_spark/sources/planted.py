"""Planted-triangle synthetic graph generator — SURVEY.md §2.1 S4.

Same semantics as the reference generator
(``graph_generator/generate_graph.py:5-33``): sample 3 distinct vertex
ids per planted triangle, emit the 3 canonical edges, dedup globally.
But distributed and *hash-deterministic*: the reference uses Python
``random`` on one core; here every vertex id is a pure function of
(seed, triangle index) via ``xxhash64``, so any partitioning/ordering
yields the identical edge set — no driver-side RNG, no collect.

Distinctness of the 3 corners is by construction (offset tricks), not
rejection sampling: b ≠ a by a 1..n-1 offset; c is drawn from n-2
slots and shifted past both a and b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def planted_triangles(
    spark: SparkSession, num_nodes: int, num_triangles: int, seed: int = 42
) -> DataFrame:
    """Canonical edge table [src, dst] of ``num_triangles`` planted
    triangles over ids ``0..num_nodes-1`` (plus any accidental triangles
    formed by edge sharing, exactly as in the reference)."""
    if num_nodes < 3:
        raise ValueError("need at least 3 vertices to plant a triangle")
    t = spark.range(num_triangles)
    h = lambda k: F.abs(F.xxhash64(F.lit(seed), F.lit(k), F.col("id")))  # noqa: E731
    df = t.withColumn("a", h(1) % num_nodes)
    df = df.withColumn("b", (F.col("a") + 1 + h(2) % (num_nodes - 1)) % num_nodes)
    lo = F.least("a", "b")
    hi = F.greatest("a", "b")
    c0 = h(3) % (num_nodes - 2)
    c1 = F.when(c0 >= lo, c0 + 1).otherwise(c0)
    c2 = F.when(c1 >= hi, c1 + 1).otherwise(c1)
    df = df.select("a", "b", c2.alias("c"))
    edges = df.select(
        F.explode(
            F.array(
                F.struct(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")),
                F.struct(F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst")),
                F.struct(F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return edges.distinct()


def domino_truss_graph(
    spark: SparkSession, n_links: int, q_base: int = 1_000_000
) -> DataFrame:
    """Deep-cascade fixture for k-truss peeling at k=4: a 'domino strip'
    whose 4-truss peel takes Θ(n_links) synchronous rounds with an O(1)
    frontier per round — the worst case for per-round full re-enumeration
    and the showcase for the incremental (support-delta) peel.

    Construction (all analysis at k=4, i.e. survive iff support ≥ 2):

    - strip vertices ``p_0..p_{n+1}``: path edges ``e_i = (p_i, p_{i+1})``
      and long edges ``l_i = (p_i, p_{i+2})`` — strip triangles
      ``C_i = {p_i, p_{i+1}, p_{i+2}}``;
    - per i, a reinforcing 4-clique ``{p_i, p_{i+2}, q_i, q'_i}`` on two
      fresh vertices: every clique edge has support 2 within the clique
      (stable forever) and lifts ``l_i`` to support 3.

    Initial supports: interior ``e_i`` = 2 ({p_{i-1}, p_{i+2}} — the q's
    touch p_i and p_{i+2} only), terminal ``e_0``/``e_n`` = 1. Round 1
    drops the two terminal edges, destroying C_0 and C_{n-1}; that
    decrements e_1 and e_{n-1} to 1, which drop in round 2, and so on —
    two dominoes per round meeting in the middle (≈ n/2 rounds), while
    every l_i bottoms out at support 2 and every clique survives. The
    4-truss is exactly the cliques + the l edges.

    Deterministic, driver-side small (7·n_links + 1 edges) — a
    test/bench fixture, not a data source. ``q_base`` must exceed
    n_links + 1.
    """
    if n_links < 2:
        raise ValueError("need n_links >= 2 for a cascade")
    if q_base <= n_links + 1:
        raise ValueError("q_base must exceed the strip id range")
    rows: list[tuple[int, int]] = []
    for i in range(n_links + 1):
        rows.append((i, i + 1))  # e_i
    for i in range(n_links):
        q1, q2 = q_base + 2 * i, q_base + 2 * i + 1
        rows.append((i, i + 2))  # l_i
        # 4-clique {p_i, p_{i+2}, q1, q2} minus l_i (already added)
        rows += [(i, q1), (i, q2), (i + 2, q1), (i + 2, q2), (q1, q2)]
    return spark.createDataFrame(rows, "src long, dst long")
