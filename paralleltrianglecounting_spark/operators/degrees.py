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


def rich_club(edges: DataFrame, ks: list[int]) -> DataFrame:
    """[k, n_rich, e_rich, phi_r] — the rich-club coefficient per
    degree threshold k: with R_k = vertices of degree > k,
    φ(k) = 2·|E(R_k)| / (|R_k|·(|R_k|−1)) — how densely the hubs
    interconnect (Colizza et al. 2006). φ(k) is NULL when |R_k| < 2.

    Plan: ONE pass over the edge table (two degree lookups + a hash agg
    on the per-edge minimum endpoint degree), after which everything is
    suffix sums over two histogram-sized tables: |R_k| and |E(R_k)| are
    both "count where degree/min-degree > k", i.e. range joins of the
    ~O(√E)-row histograms against the |ks|-row threshold list. No per-k
    pass over the edges, so probing 50 thresholds costs the same as
    probing one — the property that matters when |E| is 10^12."""
    deg = degrees(edges)
    du = deg.select(F.col("vertex").alias("src"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("vertex").alias("dst"), F.col("degree").alias("_dv"))
    # histogram of per-edge min endpoint degree (canonical edges: each
    # undirected edge counted once)
    edge_hist = (
        edges.join(du, "src")
        .join(dv, "dst")
        .select(F.least("_du", "_dv").alias("m"))
        .groupBy("m")
        .agg(F.count("*").alias("cnt"))
    )
    vert_hist = degree_histogram(edges)
    spark = edges.sparkSession
    ks_df = spark.createDataFrame([(int(k),) for k in sorted(set(ks))], "k long")
    n_rich = (
        ks_df.join(vert_hist, vert_hist["degree"] > ks_df["k"])
        .groupBy("k")
        .agg(F.sum("n_vertices").alias("n_rich"))
    )
    e_rich = (
        ks_df.join(edge_hist, edge_hist["m"] > ks_df["k"])
        .groupBy("k")
        .agg(F.sum("cnt").alias("e_rich"))
    )
    n_c = F.coalesce("n_rich", F.lit(0))
    e_c = F.coalesce("e_rich", F.lit(0))
    # explicit |R_k| >= 2 guard: ANSI mode raises on /0, and the NULL
    # must be the same NULL the oracle's CASE produces
    phi = F.when(
        n_c >= 2, F.round(2.0 * e_c / (n_c * (n_c - 1)), 6)
    ).otherwise(F.lit(None).cast("double"))
    return (
        ks_df.join(n_rich, "k", "left")
        .join(e_rich, "k", "left")
        .select("k", n_c.alias("n_rich"), e_c.alias("e_rich"), phi.alias("phi_r"))
    )


def graph_summary(edges: DataFrame) -> DataFrame:
    """One row [n_vertices, n_edges, min_degree, max_degree,
    avg_degree_r, density_r]: the global shape statistics every graph
    job logs before choosing strategy knobs (broadcast gates, salting
    thresholds, unroll depths) — the 'describe' of an edge table.

    100 TB shape: one degree hash agg (map-side combined) feeding one
    scalar aggregate — two exchanges total, both carrying ~|V| then 1
    row; avg/density are derived driver-free from the same pass."""
    d = degrees(edges)
    return d.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        (F.sum("degree") / 2).cast("long").alias("n_edges"),
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
        F.round(F.sum("degree") / F.count(F.lit(1)), 6).alias("avg_degree_r"),
        F.round(
            F.sum("degree")
            / (F.count(F.lit(1)) * (F.count(F.lit(1)) - F.lit(1))),
            6,
        ).alias("density_r"),
    )
