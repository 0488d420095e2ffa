"""Degree-rank edge orientation — the one "optimizer rule" the engine
owns (SURVEY.md §4).

The reference sorts vertices by degree descending and keeps each
undirected edge only in the low-rank→high-rank direction
(``sequential_node_it/seq_node_it_v1.cpp:71-73`` comparator, ``:108``
predicate; swap at ``sequential_edge_it/seq_edge_it_v1.cpp:149-151``).
This bounds intersection work by O(E^1.5) instead of Σ d(u)·d(v), and —
critically for Spark — bounds the *oriented out-degree* of every vertex
by O(√E), which is the built-in skew cap for hub vertices: a vertex with
a million neighbors keeps only its ≤√E higher-rank ones in N⁺.

Rank = lexicographic order of ``struct(degree, vertex_id)`` — a strict
deterministic total order (ties on degree broken by id; the reference's
unstable ``std::sort`` breaks them arbitrarily, and the count is
invariant to tie order). No global sort, no window: each edge is
oriented by one local struct comparison after a join with the degree
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import degrees


def orient_edges(
    edges: DataFrame,
    deg: DataFrame | None = None,
    broadcast_degrees: bool = True,
) -> DataFrame:
    """Orient a canonical edge table low-rank→high-rank.

    Returns [src, dst, src_rank, dst_rank] where rank columns are the
    orderable ``struct(deg, vid)`` and ``src_rank < dst_rank`` holds on
    every row. Ranks are carried so downstream closing-vertex filters
    (P3) need no extra join — the Spark analog of the reference's dense
    ``h_ranks`` array (``cuda_edge_it/cuda_edge_it_v1.cu:204-209``),
    built once rather than per-thread (the reference rebuilds the rank
    map in every thread, ``parallel_edge_it_manual_threads_v2.cpp:131-135``).

    The degree table has |V| rows of two longs — broadcast by default
    (on a 1000-executor cluster a 10^9-vertex degree table stops being
    broadcastable; pass ``broadcast_degrees=False`` and the two lookups
    become shuffle joins on vertex id, both pruned to two columns).
    """
    deg = deg if deg is not None else degrees(edges)
    d = deg.select(
        F.col("vertex"),
        F.struct(F.col("degree").alias("deg"), F.col("vertex").alias("vid")).alias("rank"),
    )
    if broadcast_degrees:
        d = F.broadcast(d)
    ds = d.select(F.col("vertex").alias("src"), F.col("rank").alias("_r_src"))
    dd = d.select(F.col("vertex").alias("dst"), F.col("rank").alias("_r_dst"))
    with_ranks = edges.join(ds, "src").join(dd, "dst")
    low_first = F.col("_r_src") < F.col("_r_dst")
    return with_ranks.select(
        F.when(low_first, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(low_first, F.col("dst")).otherwise(F.col("src")).alias("dst"),
        F.when(low_first, F.col("_r_src")).otherwise(F.col("_r_dst")).alias("src_rank"),
        F.when(low_first, F.col("_r_dst")).otherwise(F.col("_r_src")).alias("dst_rank"),
    )
