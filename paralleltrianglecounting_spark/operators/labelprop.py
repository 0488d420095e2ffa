"""Synchronous label propagation (north-star extension).

Semantics (fixed, deterministic, oracle-checked): every vertex starts
labeled with its own id; each superstep every vertex simultaneously
adopts the most frequent label among its neighbors, ties broken by the
smallest label. Synchronous + deterministic tie-break makes the
trajectory a pure function of the edge set — reproducible across
partitionings and unrollable to SQL for the DuckDB gate. (Classic
async LPA is run-order dependent; an engine whose results change
between runs can't be correctness-gated, so the synchronous variant is
the contract here. Bipartite-ish structures may oscillate rather than
converge — the iteration cap is part of the semantics.)

Plan per superstep: labels ⋈ bidirected edges (shuffle on src) →
count by (vertex, label) (hash agg) → per-vertex argmax via one more
aggregate on ``max(struct(cnt, -label))`` — NO window function, no
single-partition sort; three shuffles on vertex id per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import vertices
from paralleltrianglecounting_spark.plans.superstep import SuperstepResult, SuperstepRunner
from paralleltrianglecounting_spark.sources.edges import bidirected


def label_propagation(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> DataFrame:
    """[vertex, label] after ``iterations`` synchronous supersteps (or
    earlier if the labeling stabilizes)."""
    return label_propagation_run(edges, iterations, checkpoint_dir, resume).state


def label_propagation_run(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    adj = bidirected(edges).persist()
    n_msgs = adj.count()
    init = vertices(edges).select("vertex", F.col("vertex").alias("label"))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        neighbor_labels = adj.join(
            state.withColumnRenamed("vertex", "src"), "src"
        ).select(F.col("dst").alias("vertex"), "label")
        counts = neighbor_labels.groupBy("vertex", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # argmax(cnt), ties -> min(label): lexicographic max of (cnt, -label)
        new_labels = counts.groupBy("vertex").agg(
            (-F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg")))["neg"]).alias(
                "label"
            )
        )
        return new_labels, {"messages_sent": n_msgs}

    runner = SuperstepRunner(
        spark,
        name="label_propagation",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
    )
    result = runner.run(init, step, stop_when_stable=True, resume=resume)
    adj.unpersist()
    return result
