"""Web bowtie decomposition (Broder et al., "Graph structure in the
web", WWW 2000) — THE structural census of a crawled link graph:
classify every vertex relative to the largest strongly connected
component as

    CORE          — member of the largest SCC
    IN            — reaches the CORE but is not in it
    OUT           — reachable from the CORE but not in it
    TENDRIL       — in the CORE's weakly connected component, neither
                    reaches nor is reached by it (Broder's tendrils
                    AND tubes — tubes, IN→OUT paths bypassing the
                    core, are a subclass of this bucket here)
    DISCONNECTED  — in some other weak component

IN and OUT are disjoint by construction: a vertex that both reaches
and is reached by the CORE is strongly connected to it and would be in
the SCC.

Spark shape — the operator is pure composition of the engine's
existing iterative kernels, sharing all their scale properties
(pre-partitioned topologies, per-round pinned state, no driver
collects beyond scalar probes):

  1. ``strongly_connected_components`` → per-vertex SCC id;
  2. largest SCC chosen by one (count, id) aggregate — ties broken to
     the smallest SCC id, deterministic; the winner rides a 1-row
     broadcast crossJoin, never a driver round-trip;
  3. OUT = directed BFS from the CORE member set over src→dst edges;
     IN = the same over reversed edges (``bfs_run(directed=True)``) —
     hop-bounded by ``max_hops``, so a pathological depth is a loud
     truncation knob, not a hang;
  4. the CORE's weak component = ``connected_components`` label joined
     through any core member (they all share one);
  5. one |V|-row classification select.

At 100 TB the cost is dominated by the SCC decomposition itself; the
two reachability sweeps are plain frontier BFS (each edge crosses a
shuffle once per hop it is on the frontier boundary), and the census
output is |V| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.bfs import bfs_run
from paralleltrianglecounting_spark.operators.components import (
    connected_components,
)
from paralleltrianglecounting_spark.operators.scc import (
    strongly_connected_components,
)

__all__ = ["bowtie_structure"]


def bowtie_structure(
    edges: DataFrame,
    max_hops: int = 64,
    max_rounds: int = 100,
) -> DataFrame:
    """[vertex, region] — the Broder bowtie census of the directed
    edge table; ``region`` ∈ {CORE, IN, OUT, TENDRIL, DISCONNECTED}.

    ``max_hops`` bounds each reachability sweep (vertices beyond it
    classify as TENDRIL/DISCONNECTED — the BFS cap contract);
    ``max_rounds`` passes through to the SCC decomposition."""
    scc = strongly_connected_components(edges, max_rounds=max_rounds)

    # largest SCC, ties to the smallest id: one aggregate over the
    # |V|-row scc table, result is a 1-row broadcast
    best = (
        scc.groupBy("scc")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.max(F.struct(F.col("_n"), (-F.col("scc")).alias("_negid"))).alias(
                "_b"
            )
        )
        .select((-F.col("_b._negid")).alias("_core_id"))
    )
    core = (
        scc.crossJoin(F.broadcast(best))
        .where(F.col("scc") == F.col("_core_id"))
        .select("vertex")
    )

    fwd = bfs_run(edges, core, max_hops=max_hops, directed=True).state.select(
        "vertex"
    )
    rev_edges = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    bwd = bfs_run(
        rev_edges, core, max_hops=max_hops, directed=True
    ).state.select("vertex")

    wcc = connected_components(edges)
    core_wcc = (
        wcc.join(core, "vertex")
        .agg(F.min("component").alias("_core_wcc"))
    )

    return (
        wcc.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(core_wcc))
        .join(scc, "vertex")
        .join(fwd.withColumn("_out", F.lit(True)), "vertex", "left")
        .join(bwd.withColumn("_in", F.lit(True)), "vertex", "left")
        .select(
            "vertex",
            F.when(F.col("scc") == F.col("_core_id"), F.lit("CORE"))
            .when(F.col("_in"), F.lit("IN"))
            .when(F.col("_out"), F.lit("OUT"))
            .when(
                F.col("component") == F.col("_core_wcc"), F.lit("TENDRIL")
            )
            .otherwise(F.lit("DISCONNECTED"))
            .alias("region"),
        )
    )
