"""Maximal independent set — deterministic Luby rounds.

Luby's algorithm (1986), the canonical distributed symmetry-breaking
primitive: each round, every live vertex whose rank is a strict local
minimum among its live neighbors joins the set; its neighbors are
excluded; repeat until no live vertex remains. Ranking by a per-vertex
hash (the maximal-matching move, operators/matching.py) makes the run
deterministic at any parallelism while behaving like the random ranks
Luby's O(log n)-round analysis assumes. The result is a maximal
independent set: no two members adjacent, every non-member adjacent to
a member.

State (one superstep-runner DataFrame — lineage truncation, checkpoint
/ resume, per-partition lineage metrics shared with pagerank/matching):
``[v, mround]`` with ``mround = 0`` live, ``mround = r > 0`` joined in
round r, ``mround = -1`` excluded. One round =

1. live incidence: the bidirected edge view filtered to live-live
   pairs (two left-semi joins against the |live|-row set);
2. per-vertex min live-neighbor rank: ONE codegen hash agg
   ``min(struct(h, v))`` — no window;
3. a vertex joins iff its own rank is below that min (vertices with NO
   live neighbor have a NULL min and join unconditionally — isolated
   vertices are always members of a maximal set);
4. neighbors of new members flip to excluded (one left-semi join).

Progress guarantee: the globally minimum-ranked live vertex always
joins, so each round settles at least one vertex; with hash ranks the
expected round count is O(log n). A round over a live-empty state is a
no-op, so the runner's exact fingerprint check detects the fixpoint —
the idempotence that lets the DuckDB gate unroll a fixed generous
round count behind a loud empty-result-if-unconverged guard.

Scale shape at 100 TB: per round two left-semi joins of the edge table
against the shrinking live set plus one map-side-combinable hash agg;
nothing graph-sized is broadcast; the state is |V| rows flat. No
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepResult,
    SuperstepRunner,
)
from paralleltrianglecounting_spark.sources.edges import bidirected

__all__ = ["maximal_independent_set", "mis_run"]


def _vertex_rank(v):
    """Engine-portable 56-bit vertex hash (md5-prefix; DuckDB computes
    the identical value)."""
    return F.conv(F.substring(F.md5(v.cast("string")), 1, 14), 16, 10).cast("long")


def maximal_independent_set(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 64,
    resume: bool = True,
) -> DataFrame:
    """[vertex, mround] — the members of the deterministic Luby MIS and
    the round (1-based) that admitted each.

    Raises ``RuntimeError`` if ``max_rounds`` is hit with live vertices
    remaining (a partial set is never returned silently)."""
    res = mis_run(edges, checkpoint_dir, max_rounds, resume)
    if not res.converged:
        raise RuntimeError(
            f"Luby MIS did not converge within {max_rounds} rounds; "
            "raise max_rounds (expected rounds are O(log |V|))"
        )
    return res.state.filter(F.col("mround") >= 1).select(
        F.col("v").alias("vertex"), "mround"
    )


def mis_run(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 64,
    resume: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bidir = bidirected(edges).repartition(n_parts, "src").persist()
    bidir.count()

    init = (
        bidir.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.lit(0).alias("mround"))
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        settled = state.filter(F.col("mround") != 0)
        live = state.filter(F.col("mround") == 0).select("v")
        ledges = bidir.join(
            live.withColumnRenamed("v", "src"), "src", "left_semi"
        ).join(live.withColumnRenamed("v", "dst"), "dst", "left_semi")
        # min live-neighbor rank per live vertex (struct: strict total
        # order even under hash collisions)
        nmin = (
            ledges.select(
                F.col("src").alias("v"),
                F.struct(_vertex_rank(F.col("dst")).alias("h"), F.col("dst").alias("u")).alias("nr"),
            )
            .groupBy("v")
            .agg(F.min("nr").alias("m"))
        )
        cand = live.join(nmin, "v", "left").select(
            "v",
            (
                F.col("m").isNull()
                | (
                    F.struct(_vertex_rank(F.col("v")).alias("h"), F.col("v").alias("u"))
                    < F.col("m")
                )
            ).alias("joins"),
        )
        # referenced three times (own union branch, the exclusion
        # semi-join, the survivor anti-join) and tiny — materialize it
        # once so the live-incidence subtree runs once per round, not
        # three times
        new_members = cand.filter("joins").select("v").localCheckpoint(eager=True)
        excluded = (
            live.join(new_members, "v", "left_anti")
            .join(
                bidir.join(
                    new_members.withColumnRenamed("v", "src"), "src", "left_semi"
                ).select(F.col("dst").alias("v")),
                "v",
                "left_semi",
            )
        )
        new_state = (
            settled.unionByName(new_members.select("v", F.lit(i + 1).alias("mround")))
            .unionByName(excluded.select("v", F.lit(-1).alias("mround")))
            .unionByName(
                live.join(new_members, "v", "left_anti")
                .join(excluded, "v", "left_anti")
                .select("v", F.lit(0).alias("mround"))
            )
        )
        # the union's output partition count is the SUM of its branches'
        # (and localCheckpoint preserves it), so without this bound the
        # state gains ~3·n_parts partitions per round and late rounds
        # drown in empty-task scheduling — measured 46 s/round by round
        # 8 at sf0.01, 1 s/round with the bound
        return new_state.coalesce(n_parts), {}

    runner = SuperstepRunner(
        spark,
        name="mis",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_rounds,
    )
    result = runner.run(init, step, stop_when_stable=True, resume=resume)
    bidir.unpersist()
    return result
