"""Adjacency-list construction — SURVEY.md §2.1 S2/S3, §2.4 A5.

The reference's map-of-vectors (``utils/utils.cpp:40-64``) becomes a
DataFrame of sorted neighbor arrays; its CSR conversion
(``convertToCRS``, ``utils/utils.cpp:68-102``) has a direct physical
analog here for free: an Arrow/Parquet *list column* IS CSR — the flat
child values array is ``col_idx`` and the list offsets are ``row_ptr``.
``sorted_csr_batches`` exposes exactly that view to vectorized kernels.

Sortedness is enforced by construction (``sort_array``) — the reference
once shipped a merge kernel over *unsorted* CSR
(``cuda_node_it/cuda_node_it_v2.cu:229`` calls ``convertToCRS`` without
``sortNeighbors``) and was saved only by accidentally-sorted inputs;
here the invariant lives in the operator, not the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.sources.edges import bidirected


def adjacency(edges: DataFrame) -> DataFrame:
    """Full adjacency: [vertex, neighbors: sorted array<long>] with both
    directions (the reference inserts u→v and v→u, ``utils/utils.cpp:58-59``)."""
    return (
        bidirected(edges)
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.sort_array(F.collect_list("dst")).alias("neighbors"))
    )


def oriented_adjacency(oriented: DataFrame) -> DataFrame:
    """N⁺ adjacency over degree-oriented edges: for each vertex, the
    sorted array of its *higher-rank* neighbors.

    This is the static reformulation of the forward algorithm's mutable
    ``A[t]`` sets (SURVEY.md §3.1): with edges pre-oriented, the
    closing-vertex rank filter (P3) is free — every member of N⁺ already
    ranks higher than the list owner.

    Skew: |N⁺(v)| ≤ O(√E) by the orientation property, so no collected
    array explodes even for hub vertices — the orientation is itself the
    salting strategy for this aggregate.
    """
    return (
        oriented.groupBy(F.col("src").alias("vertex"))
        .agg(F.sort_array(F.collect_list("dst")).alias("neighbors"))
    )
