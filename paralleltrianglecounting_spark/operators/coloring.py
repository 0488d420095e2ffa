"""Greedy graph coloring — deterministic Jones–Plassmann rounds.

Jones–Plassmann (1993), the standard distributed coloring scheme:
each round, every uncolored vertex whose rank is a strict local
minimum among its UNCOLORED neighbors takes the smallest color not
used by its already-colored neighbors. The per-round winners form an
independent set, so no two vertices ever race on a color; ranking by
the engine-portable per-vertex hash (operators/mis.py) makes the
coloring deterministic at any parallelism — a 1000-executor run
reproduces a 32-thread run color-for-color. The result is a proper
greedy coloring with at most degeneracy+1 … Δ+1 colors (exact count is
rank-order dependent, as for any greedy scheme).

State (superstep runner — lineage truncation, checkpoint/resume,
per-partition metrics shared with pagerank/matching/mis):
``[v, color]`` with ``color = -1`` uncolored. One round =

1. per-vertex min UNCOLORED-neighbor rank: the mis.py hash agg over
   the live-live incidence (two left-semi joins);
2. winners = live vertices below that min (no live neighbor → NULL
   min → wins unconditionally);
3. smallest missing color: the colored-neighbor color set is one
   ``collect_set`` hash agg over the live⋈colored incidence, and the
   minimum absent value is ``array_min(array_except(sequence(0,
   size(used)), used))`` — the candidate range is bounded by the USED
   set's size (≤ colored-degree), never by the raw degree, so a
   10^8-degree hub with 40 distinct neighbor colors scans 41 slots;
4. winners flip to their color; everyone else carries over.

Progress: the globally min-ranked live vertex always wins, so rounds
terminate; expected O(log n) rounds with hash ranks (same analysis as
Luby). A live-empty round is a no-op → the runner's exact fingerprint
check stops the loop, and the same idempotence lets the DuckDB gate
unroll a fixed generous round count behind a loud guard.

Scale shape at 100 TB: two left-semi joins + two hash aggs per round
over the shrinking live set; state is |V| rows flat; per-round union
partition growth bounded by coalesce (the operators/mis.py lesson).
No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.mis import _vertex_rank
from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepResult,
    SuperstepRunner,
)
from paralleltrianglecounting_spark.sources.edges import bidirected

__all__ = ["greedy_coloring", "coloring_run"]


def greedy_coloring(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 128,
    resume: bool = True,
) -> DataFrame:
    """[vertex, color] — the deterministic Jones–Plassmann greedy
    coloring (colors 0-based; adjacent vertices always differ).

    Raises ``RuntimeError`` if ``max_rounds`` is hit with uncolored
    vertices remaining (a partial coloring is never returned
    silently)."""
    res = coloring_run(edges, checkpoint_dir, max_rounds, resume)
    if not res.converged:
        raise RuntimeError(
            f"Jones–Plassmann did not converge within {max_rounds} rounds; "
            "raise max_rounds (expected rounds are O(log |V|))"
        )
    return res.state.select(F.col("v").alias("vertex"), "color")


def coloring_run(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 128,
    resume: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bidir = bidirected(edges).repartition(n_parts, "src").persist()
    bidir.count()

    init = (
        bidir.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.lit(-1).cast("int").alias("color"))
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        colored = state.filter(F.col("color") >= 0)
        live = state.filter(F.col("color") == -1).select("v")
        nmin = (
            bidir.join(live.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(live.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .select(
                F.col("src").alias("v"),
                F.struct(
                    _vertex_rank(F.col("dst")).alias("h"), F.col("dst").alias("u")
                ).alias("nr"),
            )
            .groupBy("v")
            .agg(F.min("nr").alias("m"))
        )
        winners = (
            live.join(nmin, "v", "left")
            .filter(
                F.col("m").isNull()
                | (
                    F.struct(_vertex_rank(F.col("v")).alias("h"), F.col("v").alias("u"))
                    < F.col("m")
                )
            )
            .select("v")
            .localCheckpoint(eager=True)  # referenced thrice below
        )
        used = (
            bidir.join(winners.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(
                colored.select(F.col("v").alias("dst"), F.col("color").alias("nc")),
                "dst",
            )
            .groupBy(F.col("src").alias("v"))
            .agg(F.collect_set("nc").alias("used"))
        )
        used_set = F.coalesce(F.col("used"), F.array().cast("array<int>"))
        newly = winners.join(used, "v", "left").select(
            "v",
            F.array_min(
                F.array_except(F.sequence(F.lit(0), F.size(used_set)), used_set)
            )
            .cast("int")
            .alias("color"),
        )
        new_state = (
            colored.unionByName(newly)
            .unionByName(
                live.join(winners, "v", "left_anti").select(
                    "v", F.lit(-1).cast("int").alias("color")
                )
            )
            .coalesce(n_parts)  # bound union partition growth (mis.py)
        )
        return new_state, {}

    runner = SuperstepRunner(
        spark,
        name="coloring",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_rounds,
    )
    result = runner.run(init, step, stop_when_stable=True, resume=resume)
    bidir.unpersist()
    return result
