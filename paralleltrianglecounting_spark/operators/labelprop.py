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

Plan per superstep: labels ⋈ the cached bidirected topology (persisted
ALREADY HASH-PARTITIONED on src, so the |E|-row edge side never
re-exchanges — only the |V|-row label state moves; same rationale as
``operators/pagerank.py``) → one ``mode(label, deterministic=True)``
aggregate per vertex (greatest frequency, ties -> smallest label —
exactly the contract's tie-break) — NO window function, no
single-partition sort, and a single exchange of the message stream
where the count-then-argmax formulation paid two.

``detect_stability=False`` (the fixed-iteration contract, e.g. the
driver gate's exact-3-superstep oracle) skips the per-superstep
fingerprint job entirely: the synchronous step function is idempotent
at a fixpoint, so running the remaining iterations on a stabilized
labeling returns the identical table — the check is purely an
early-exit optimization, never a semantics change.
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
    detect_stability: bool = True,
) -> DataFrame:
    """[vertex, label] after ``iterations`` synchronous supersteps (or
    earlier if the labeling stabilizes and ``detect_stability`` is on)."""
    return label_propagation_run(
        edges, iterations, checkpoint_dir, resume, detect_stability
    ).state


def label_propagation_run(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    detect_stability: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = bidirected(edges).repartition(n_parts, "src").persist()
    n_msgs = adj.count()
    init = vertices(edges).select("vertex", F.col("vertex").alias("label"))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        neighbor_labels = adj.join(
            state.withColumnRenamed("vertex", "src"), "src"
        ).select(F.col("dst").alias("vertex"), "label")
        # argmax(count), ties -> min(label), in ONE aggregation:
        # deterministic mode() implements exactly this tie-break
        # ("smallest value among the most frequent"), replacing the
        # former count-by-(vertex,label) + argmax pair — one exchange of
        # the 2|E|-row message stream per superstep instead of two
        # (verified value-identical to the two-agg plan and the oracle)
        new_labels = neighbor_labels.groupBy("vertex").agg(
            F.mode("label", True).alias("label")
        )
        return new_labels, {"messages_sent": n_msgs}

    runner = SuperstepRunner(
        spark,
        name="label_propagation",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
    )
    result = runner.run(init, step, stop_when_stable=detect_stability, resume=resume)
    adj.unpersist()
    return result
