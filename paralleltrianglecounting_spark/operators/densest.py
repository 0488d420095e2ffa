"""Densest subgraph — synchronous (1+ε) greedy peeling.

Charikar's greedy 2-approximation, in the synchronous batch form of
Bahmani–Kumar–Vassilvitskii (VLDB 2012): repeatedly delete EVERY
vertex whose degree is at most 2(1+ε)·ρ (ρ = |E|/|V|, so 2ρ is the
average degree) and remember the intermediate subgraph of maximum
density; the best one is within 2(1+ε) of the optimum. Each round
removes at least an ε/(1+ε) fraction of the surviving vertices, so
rounds are O(log_{1+ε} |V|) — the reason this is THE MapReduce-era
densest-subgraph algorithm and sequential Charikar (one vertex per
round) is not.

Fully deterministic: no ranks, no randomness — the surviving vertex
set per round is a pure function of the edge set, which is what makes
the gate value-exact against an unrolled DuckDB twin. Densities are
compared as IEEE doubles (|E| and |V| are integers < 2^53, and a
correctly-rounded double division of the same integers is bit-equal in
both engines), ties broken toward the EARLIEST round.

Plan per round: one degree aggregate (map-side combinable) + two
left-semi joins filtering the edge set to surviving endpoints (the
k-core round shape, operators/kcore.py) + two scalar count probes for
the density ledger; the edge set is eagerly truncated so no lineage
accumulates. At 100 TB each round is one pass over the SHRINKING edge
set — geometric, so the whole peel costs O(1) full passes, and the
best subgraph is retained as its (small) checkpointed vertex set, not
recomputed. Rounds are cheap to re-run from the start, which is why
this driver loop does not carry the superstep checkpoint machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import degrees

__all__ = ["densest_subgraph", "densest_subgraph_run"]


def densest_subgraph(
    edges: DataFrame, epsilon: float = 0.5, max_rounds: int = 64
) -> DataFrame:
    """[vertex] — the vertex set of the densest intermediate subgraph
    found by (1+ε) greedy peeling (density within 2(1+ε) of optimal)."""
    verts, _, _ = densest_subgraph_run(edges, epsilon, max_rounds)
    return verts


def densest_subgraph_run(
    edges: DataFrame, epsilon: float = 0.5, max_rounds: int = 64
) -> tuple[DataFrame, float, int]:
    """Returns (vertex DataFrame, best density, best round index).

    Raises ``RuntimeError`` if the peel does not empty the graph within
    ``max_rounds`` (the density ledger would be incomplete — never
    report a possibly-non-maximal subgraph silently)."""
    spark = edges.sparkSession
    cur = edges.select("src", "dst").localCheckpoint(eager=True)
    best_verts: DataFrame | None = None
    best_d = -1.0
    best_round = -1
    for r in range(max_rounds):
        e_cnt = cur.count()
        if e_cnt == 0:
            if best_verts is None:
                empty = spark.createDataFrame([], "vertex long")
                return empty, 0.0, 0
            return best_verts, best_d, best_round
        verts = (
            cur.select(F.col("src").alias("vertex"))
            .unionByName(cur.select(F.col("dst").alias("vertex")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        v_cnt = verts.count()
        d = e_cnt / v_cnt  # IEEE double, bit-equal to the oracle's
        if d > best_d:  # strict: ties keep the earliest round
            best_d, best_round, best_verts = d, r, verts
        thr = 2.0 * (1.0 + epsilon) * d
        keep = degrees(cur).filter(F.col("degree") > thr).select("vertex")
        cur = (
            cur.join(keep.withColumnRenamed("vertex", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("vertex", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"densest-subgraph peel did not empty the graph in {max_rounds} "
        "rounds; raise max_rounds (rounds are O(log |V|) at fixed ε)"
    )
