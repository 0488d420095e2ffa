"""Shared column expressions.

The reference's entire scalar-function surface is integer ``min``/``max``
(edge canonicalization, ``sequential_edge_it/seq_edge_it_v1.cpp:31-32``),
a hash combine (``:37``) and a ``1/6`` scaling factor
(``sequential_node_it/seq_node_it_v1.cpp:147``). Those map to
``least``/``greatest``/``xxhash64`` plus plain arithmetic; everything here
is a pure JVM-side Column expression — no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonical_edge",
    "vertex_id",
    "rank_struct",
    "content_sha256",
]


def canonical_edge(u: Column, v: Column) -> tuple[Column, Column]:
    """Undirected edge as ``(min, max)`` — the reference generator's
    ``tuple(sorted((u, v)))`` (``graph_generator/generate_graph.py:23``)."""
    return F.least(u, v), F.greatest(u, v)


def vertex_id(*cols: Column | str) -> Column:
    """Stable 64-bit vertex id from entity key columns via ``xxhash64``.

    Used when vertices come from string keys (repo names, paths); natural
    integer keys are used directly when available.
    """
    return F.xxhash64(*cols)


def rank_struct(degree: Column, vid: Column) -> Column:
    """The degree-ordering rank as an orderable struct ``(degree, id)``.

    The reference sorts vertices by degree descending and breaks ties
    arbitrarily (``sequential_node_it/seq_node_it_v1.cpp:71-73`` —
    unstable ``std::sort``); the triangle count is invariant to tie
    order, so any strict total order works. Comparing this struct
    lexicographically gives a deterministic total order with NO global
    sort and NO single-partition window — each comparison is local to
    the row.
    """
    return F.struct(degree.alias("deg"), vid.alias("vid"))


def content_sha256(content: Column) -> Column:
    """Per-row invariant hash (input_hint: sha256(content) equality)."""
    return F.sha2(content, 256)
