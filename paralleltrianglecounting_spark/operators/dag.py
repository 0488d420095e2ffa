"""DAG layering — longest-path topological levels via synchronous Kahn
rounds.

``level(v)`` = length of the longest directed path ending at ``v``
(sources are level 0) — the layered topological sort: round r settles
exactly the vertices all of whose in-neighbors settled in rounds < r,
i.e. the vertices with no incoming edge from a still-live vertex. The
level assignment is a pure function of the edge set (no ranks, no
randomness), so any parallelism reproduces it bit-for-bit, and a
DuckDB twin can replay it either closed-form (disjoint paths: level =
position in chain) or by unrolling the rounds.

Termination doubles as cycle detection: in a DAG every round settles at
least one vertex (some live vertex has all preds settled — take the
head of a longest live path); a round that settles nothing means every
live vertex has a live predecessor, i.e. a directed cycle, and the
operator RAISES rather than silently emitting a partial layering.

Plan per round, over the SHRINKING live set: one left-anti join
(live = verts − settled), one distinct-projected join probe (blocked =
dsts of edges whose src is live), one left-anti (settle = live −
blocked); state is eagerly truncated per round (the densest-subgraph
pattern — rounds = DAG depth, each a pure function of small state, so
the superstep checkpoint machinery is unnecessary). At 100 TB: rounds
= depth of the DAG (long chains are the worst case and the honest
cost — layering IS a sequential dependency), per-round cost shrinks
with the live frontier because settled vertices' out-edges stop
mattering once their dsts settle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import vertices

__all__ = ["topological_levels"]


def topological_levels(edges: DataFrame, max_rounds: int = 256) -> DataFrame:
    """[vertex, level] for a DIRECTED edge table [src, dst] (src → dst).

    Raises ``RuntimeError`` on a directed cycle (a round that settles no
    vertex) or if the DAG is deeper than ``max_rounds``.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    live = vertices(e).localCheckpoint(eager=True)
    settled: DataFrame | None = None
    for r in range(max_rounds):
        n_live = live.count()
        if n_live == 0:
            break
        # blocked = vertices still waiting on a live in-neighbor
        blocked = (
            e.join(live.withColumnRenamed("vertex", "src"), "src", "left_semi")
            .select(F.col("dst").alias("vertex"))
            .distinct()
        )
        now = live.join(blocked, "vertex", "left_anti").select(
            "vertex", F.lit(r).cast("long").alias("level")
        )
        now = now.localCheckpoint(eager=True)
        if now.count() == 0:
            raise RuntimeError(
                "topological_levels: no vertex settled in round "
                f"{r} with {n_live} live — the graph has a directed cycle"
            )
        settled = now if settled is None else settled.unionByName(now)
        live = live.join(now, "vertex", "left_anti").localCheckpoint(eager=True)
        # an edge blocks only while its src is live — edges out of
        # just-settled vertices are dead, drop them so the per-round
        # probe scans the shrinking frontier, not the full edge set
        e = e.join(
            now.withColumnRenamed("vertex", "src"), "src", "left_anti"
        ).localCheckpoint(eager=True)
    else:
        raise RuntimeError(
            f"topological_levels: DAG deeper than max_rounds={max_rounds}"
        )
    if settled is None:
        return spark.createDataFrame([], "vertex long, level long")
    return settled
