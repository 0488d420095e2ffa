"""k-clique counting — the natural motif family above the reference's
triangle kernel, using the same degree-ordered forward machinery
(reference rank orientation: ``CV_PROGRAM/utils.cpp``; SURVEY.md §3.1).

Ordered enumeration (the kClist scheme, Danisch–Balalau–Sozio 2018,
"Listing k-cliques in Sparse Real-World Graphs"): rank every vertex by
(degree, id); each k-clique {v₁<…<v_k in rank order} is generated
exactly once from its lowest-ranked edge (v₁, v₂) — the remaining
k-2 vertices are picked greedily from the shrinking candidate set
``cand = N⁺(v₁) ∩ N⁺(v₂) ∩ … ∩ N⁺(v_i)``. Because N⁺ contains only
higher-ranked neighbors, picking any c ∈ cand and intersecting with
N⁺(c) automatically keeps rank order — uniqueness needs no distinct
and no position filter.

As DataFrame supersteps: the level-0 state is one row per oriented
edge carrying ``cand``; each further level explodes one candidate,
joins the adjacency once, and intersects; the final level is a
partial+final sum of ``size(cand)`` (the last vertex is never
materialized). k=3 degenerates to the intersect triangle strategy;
k=4 is one explode level.

Scale shape: (k-2) shuffle equi-joins against the N⁺ adjacency plus
one global sum. Every array is an N⁺ list, bounded O(√E) by the
orientation property, and ``cand`` only shrinks — the row count at
level i is the number of (i+2)-cliques, exactly the kClist work bound.
A ``size(cand) >= remaining`` prune drops dead branches before each
explode. No Python anywhere; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.adjacency import oriented_adjacency
from paralleltrianglecounting_spark.operators.orientation import orient_edges


def kclique_count(edges: DataFrame, k: int, out_col: str | None = None) -> DataFrame:
    """[``out_col`` or ``k{k}_count``] — the exact number of k-cliques
    (k >= 3) in the undirected simple graph given by canonical
    ``[src, dst]`` edges."""
    if k < 3:
        raise ValueError(f"kclique_count needs k >= 3, got {k}")
    out_col = out_col or f"k{k}_count"
    oriented = orient_edges(edges)
    adj = oriented_adjacency(oriented)

    def n_of(col: str, alias: str) -> DataFrame:
        return adj.select(
            F.col("vertex").alias(col), F.col("neighbors").alias(alias)
        )

    # inner joins are sum-safe: an endpoint with no N⁺ row closes nothing
    state = (
        oriented.join(n_of("src", "n_src"), "src")
        .join(n_of("dst", "n_dst"), "dst")
        .select(F.array_intersect("n_src", "n_dst").alias("cand"))
    )
    for level in range(k - 3):
        remaining = k - 2 - level  # vertices still to pick from cand
        state = (
            state.where(F.size("cand") >= remaining)
            .select("cand", F.explode("cand").alias("c"))
            .join(n_of("c", "n_c"), "c")
            .select(F.array_intersect("cand", "n_c").alias("cand"))
        )
    return state.select(F.size("cand").cast("long").alias("k")).agg(
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias(out_col)
    )


def k4_count(edges: DataFrame) -> DataFrame:
    """[k4_count] — the exact number of 4-cliques in the undirected
    simple graph given by canonical ``[src, dst]`` edges."""
    return kclique_count(edges, 4, out_col="k4_count")
