"""4-clique (K4) counting — the natural next motif after the
reference's triangle kernel, using the same degree-ordered forward
machinery (reference rank orientation: ``CV_PROGRAM/utils.cpp``;
SURVEY.md §3.1).

Ordered enumeration (the kClist scheme specialized to k=4): rank every
vertex by (degree, id); each K4 {w<x<y<z in rank order} is generated
exactly once from its lowest-ranked edge (w,x) — the closing pair
(y, z) must satisfy y ∈ N⁺(w)∩N⁺(x) and z ∈ N⁺(w)∩N⁺(x)∩N⁺(y).
So: per oriented edge, intersect the two N⁺ arrays once (``ab``),
explode the candidate third corners c ∈ ab, attach N⁺(c), and sum
|ab ∩ N⁺(c)|. Uniqueness needs no distinct: rank order fixes the
generator.

Scale shape: three shuffle equi-joins against the N⁺ adjacency plus
one partial+final sum. Every array is an N⁺ list, bounded O(√E) by
the orientation property, and ``ab`` (carried through the explode
instead of the two parent arrays) is bounded by the edge's triangle
count — the same payload discipline as ``edge_triangle_counts``. No
Python anywhere; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.adjacency import oriented_adjacency
from paralleltrianglecounting_spark.operators.orientation import orient_edges


def k4_count(edges: DataFrame) -> DataFrame:
    """[k4_count] — the exact number of 4-cliques in the undirected
    simple graph given by canonical ``[src, dst]`` edges."""
    oriented = orient_edges(edges)
    adj = oriented_adjacency(oriented)
    pairs = (
        oriented
        .join(adj.select(F.col("vertex").alias("src"), F.col("neighbors").alias("n_src")), "src")
        .join(adj.select(F.col("vertex").alias("dst"), F.col("neighbors").alias("n_dst")), "dst")
    )
    # inner joins are sum-safe: an endpoint with no N⁺ row closes nothing
    tri = (
        pairs.select(F.array_intersect("n_src", "n_dst").alias("ab"))
        # a K4 needs ≥2 common upper neighbors (both c and d live in ab)
        .where(F.size("ab") >= 2)
        .select("ab", F.explode("ab").alias("c"))
    )
    closed = tri.join(
        adj.select(F.col("vertex").alias("c"), F.col("neighbors").alias("n_c")), "c"
    ).select(F.size(F.array_intersect("ab", "n_c")).alias("k"))
    return closed.agg(
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("k4_count")
    )
