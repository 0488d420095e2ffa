"""Per-vertex degree — SURVEY.md §2.4 A1.

Reference counts 1s per matrix row (``sequential_node_it/seq_node_it_v1.cpp:61-68``)
or takes adjacency-vector sizes. Relationally: each canonical edge
contributes one degree to each endpoint, so the plan is a union of the
two endpoint projections and a hash aggregate. Spark runs it
partial+final (map-side combine), the direct analog of the reference's
OpenMP ``reduction(+:...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """[vertex: long, degree: long] from a canonical edge table.

    One shuffle on vertex id. Isolated vertices (degree 0) by definition
    do not appear in an edge table and so do not appear here; callers
    that need the full vertex universe join against their vertex source.
    """
    ends = edges.select(F.col("src").alias("vertex")).unionAll(
        edges.select(F.col("dst").alias("vertex"))
    )
    return ends.groupBy("vertex").agg(F.count("*").alias("degree"))


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertex set, derived from edges — never from a declared
    header count (the reference's header-trusting out-of-bounds bug,
    ``utils/utils.cpp:25`` + ``graph_file/graph_11.g``, SURVEY.md §1.1)."""
    return (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """[degree: long, n_vertices: long] — the degree distribution, the
    first diagnostic any link-graph analysis runs (power-law check, hub
    threshold selection for ``operators.skew``, join-strategy sizing).
    Two chained hash aggregates, both partial+final; the second groups
    ~|V| rows down to the number of distinct degrees (O(√E))."""
    return (
        degrees(edges)
        .groupBy("degree")
        .agg(F.count("*").alias("n_vertices"))
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """[assortativity_r] — the degree-assortativity coefficient:
    Pearson correlation of (deg(u), deg(v)) over the BIDIRECTED edge
    list (each undirected edge contributes both orientations, the
    standard Newman 2002 convention, which makes the measure symmetric
    without a half-weight correction). Negative on hub-and-spoke link
    graphs (hubs attach to leaves), positive on social-style graphs.

    Plan: two broadcast-able degree lookups on the bidirected view,
    then one codegen'd corr aggregate — a single pass, no shuffle
    beyond the degree table itself. Pearson r is invariant to the
    sample/population variance convention (the 1/(n-1) cancels), so
    the DuckDB ``corr`` oracle matches bit-for-bit up to float
    summation order (rounded to 6)."""
    from paralleltrianglecounting_spark.sources.edges import bidirected

    deg = degrees(edges)
    du = deg.select(F.col("vertex").alias("src"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("vertex").alias("dst"), F.col("degree").alias("_dv"))
    return (
        bidirected(edges)
        .join(du, "src")
        .join(dv, "dst")
        .agg(F.round(F.corr("_du", "_dv"), 6).alias("assortativity_r"))
    )
