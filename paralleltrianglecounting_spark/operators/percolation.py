"""Clique-percolation communities (CPM, k = 3) — Palla, Derényi,
Farkas & Vicsek, "Uncovering the overlapping community structure of
complex networks in nature and society" (Nature 435, 2005).

A k = 3 CPM community is a connected component of the *triangle
adjacency graph*: triangles are nodes, adjacent iff they share an edge
(k − 1 = 2 vertices); a vertex belongs to every community containing a
triangle it sits in — communities OVERLAP, which is the method's point
and what disqualifies flat labelings (LPA, modularity) from expressing
it. Vertices in no triangle belong to no community.

Spark-first shape, built entirely from operators this engine already
has (the reference's triangle enumeration is the substrate —
``CV_PROGRAM/orchestrator.cpp`` computes the count; CPM is the natural
"what do the triangles form" follow-up):

1. ``triangle_triples`` (the rank-oriented enumerator — never a 3-way
   nested self-join) → id-sorted triples, one row per triangle.
2. A portable 56-bit triangle id: ``hash56(x:y:z)`` — the SAME
   md5-derived integer on Spark and DuckDB, so the oracle assigns
   byte-identical node ids (and even a birthday collision, ~|T|²/2⁵⁷,
   would merge the same two nodes in both engines — the gate stays
   exact by construction).
3. **Star-reduction instead of the quadratic pair join**: an edge
   shared by t triangles would emit t² adjacency pairs; connectivity
   only needs each incident triangle linked to the group's MINIMUM tid
   (t − 1 rows, a plain hash agg + join). Same connectivity, linear
   cost — the projection_cost lesson applied to the triangle overlay.
4. ``connected_components`` (large-/small-star) over the reduced pair
   set — the FOURTH cross-domain reuse of the CC superstep operator
   (after dedup_clusters, single_linkage_clusters, winnow_dup_clusters).
5. Explode each triangle's vertices against its component label,
   distinct → overlapping memberships; one hash agg for member counts.

Community id = min triangle-hash in the component (deterministic,
engine-portable; NOT re-labeled by min vertex, which could alias two
distinct overlapping communities sharing their smallest vertex).

100 TB shape: triangle enumeration dominates exactly as in counting;
the overlay adds one |3T|-row hash agg, one join, and a CC whose input
is ≤ |3T| rows. No step is quadratic in any degree or bucket size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.components import connected_components
from paralleltrianglecounting_spark.operators.text import hash56
from paralleltrianglecounting_spark.operators.triangles import triangle_triples
from paralleltrianglecounting_spark.plans.superstep import local_pin


def triangle_overlay(edges: DataFrame) -> DataFrame:
    """[x, y, z, tid]: id-sorted triangles with the portable 56-bit id."""
    t3 = triangle_triples(edges)
    srt = F.array_sort(F.array("a", "b", "c"))
    tri = t3.select(
        srt.getItem(0).alias("x"), srt.getItem(1).alias("y"), srt.getItem(2).alias("z")
    )
    return tri.select(
        "x", "y", "z", hash56(F.concat_ws(":", "x", "y", "z")).alias("tid")
    )


def _star_reduced_pairs(trid: DataFrame) -> DataFrame:
    """[src, dst]: each triangle linked to the minimum tid of every
    edge-sharing group it belongs to — connectivity-equivalent to the
    full (quadratic) triangle-adjacency relation, linear rows."""
    tedge = (
        trid.select(F.col("x").alias("eu"), F.col("y").alias("ev"), "tid")
        .unionAll(trid.select(F.col("x").alias("eu"), F.col("z").alias("ev"), "tid"))
        .unionAll(trid.select(F.col("y").alias("eu"), F.col("z").alias("ev"), "tid"))
    )
    roots = tedge.groupBy("eu", "ev").agg(F.min("tid").alias("root"))
    return (
        tedge.join(roots, ["eu", "ev"])
        .where(F.col("tid") != F.col("root"))
        .select(F.col("tid").alias("src"), F.col("root").alias("dst"))
    )


def clique_percolation(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """[vertex, community, n_members] — one row per overlapping
    membership: ``vertex`` belongs to k=3 CPM community ``community``
    (= min triangle-hash56 in the percolation cluster), which spans
    ``n_members`` distinct vertices. Vertices outside every triangle
    emit no rows (CPM is defined on the clique overlay only)."""
    # pin the enumerated overlay ONCE: the CC superstep fingerprints,
    # checkpoints, and re-reads its input, and the final labeling joins
    # the overlay again — without the pin each of those actions re-runs
    # the full triangle enumeration (measured 176 s for a 4-round CC
    # over 555 pairs at sf0.01; ~12 s pinned)
    trid = local_pin(triangle_overlay(edges))
    comp = connected_components(
        _star_reduced_pairs(trid), max_iterations=max_iterations
    ).withColumnRenamed("vertex", "tid")
    # isolated triangles (no shared edge) never enter the pair set:
    # they are their own single-triangle community
    labeled = trid.join(comp, "tid", "left").select(
        "x", "y", "z", F.coalesce("component", "tid").alias("community")
    )
    memb = labeled.select(
        F.explode(F.array("x", "y", "z")).alias("vertex"), "community"
    ).distinct()
    sizes = memb.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return memb.join(sizes, "community").select("vertex", "community", "n_members")
