"""Weighted shortest paths — multi-source, hop-bounded Bellman–Ford
as synchronous min-plus supersteps.

Semantics (fixed, oracle-checked): ``dist(v)`` = the minimum total
weight over paths from the seed set to ``v`` using at most
``iterations`` edges — the hop-bounded contract that makes the query
SQL-unrollable exactly (the same cap-is-part-of-the-semantics move as
``bfs_distances``). Min-plus relaxation is monotone and idempotent at
its fixpoint, so with ``iterations`` ≥ the weighted graph's hop depth
this IS the full SSSP answer, and the engine may stop early at the
fixpoint without changing the result.

Plan per superstep: ONE equi-join of the dist state against the cached
hash-partitioned bidirected weighted topology (the pagerank exchange
contract — the |E|-row side never re-shuffles), then one min hash agg
over (old state ∪ relaxed candidates). Distances stay integral
(BIGINT) for integral weights — the gate is hash-exact, no float
rounding anywhere.

Scale shape at 100 TB: state is ≤ |V| rows; the per-round message
volume is bounded by |E|; map-side partial min combines shrink the
candidate stream before the exchange. Deep weighted diameters pay one
round per hop — the standard distributed trade (delta-stepping buckets
are the published refinement; this engine takes the synchronous
variant for determinism and oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepRunner,
    table_identity,
)

__all__ = ["sssp"]


def sssp(
    wedges: DataFrame,
    n_seeds: int = 4,
    iterations: int = 6,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> DataFrame:
    """[vertex, dist]: hop-bounded weighted shortest distance from the
    ``n_seeds`` smallest non-isolated vertex ids. Vertices unreachable
    within ``iterations`` hops are absent (reachability-within-k IS the
    query, as in bfs_distances)."""
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    spark = wedges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bidir = (
        wedges.select("src", "dst", "weight")
        .unionByName(
            wedges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        .repartition(n_parts, "src")
        .persist()
    )
    seeds = (
        bidir.select(F.col("src").alias("vertex"))
        .distinct()
        .orderBy("vertex")
        .limit(n_seeds)
    )
    init = seeds.select("vertex", F.lit(0).cast("long").alias("dist"))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        relaxed = (
            state.join(bidir, state["vertex"] == bidir["src"])
            .select(
                F.col("dst").alias("vertex"),
                (F.col("dist") + F.col("weight")).alias("dist"),
            )
        )
        new_state = (
            state.select("vertex", "dist")
            .unionByName(relaxed)
            .groupBy("vertex")
            .agg(F.min("dist").alias("dist"))
        )
        return new_state, {}

    # seeds are derived from the edge table, but two different graphs
    # can share their smallest ids — when checkpointing, the identity
    # must name the weighted edge table itself (the bfs_run rule for
    # input-underdetermined init states)
    identity = None
    if checkpoint_dir is not None:
        identity = table_identity(
            wedges.select("src", "dst", "weight"),
            "src",
            "dst",
            "weight",
            tag="wedges",
        )
    runner = SuperstepRunner(
        spark,
        name="sssp",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
        identity=identity,
    )
    result = runner.run(init, step, stop_when_stable=True, resume=resume)
    bidir.unpersist()
    return result.state
