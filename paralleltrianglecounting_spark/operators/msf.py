"""Minimum spanning forest by distributed Borůvka (north-star extension).

Borůvka (1926) is THE distributed MST algorithm — every component
selects its minimum-weight outgoing edge, selected edges merge
components, repeat; component count at least halves per round, so
rounds ≤ ⌈log₂|V|⌉. With edge weights made a strict total order (ties
broken by the canonical ``(src, dst)`` pair) the minimum spanning
forest is UNIQUE, which is what lets a DuckDB oracle and a sequential
Kruskal twin reproduce the engine's edge set exactly, and makes the
run deterministic at any parallelism.

State (one superstep-runner DataFrame, so lineage truncation /
checkpoint / resume / per-partition lineage metrics come from the same
machinery as pagerank and maximal_matching): ``[a, b, w, mround]`` —

- ``mround = -1``: a label row, ``a`` = vertex, ``b`` = its component;
- ``mround = r ≥ 1``: a forest edge ``(a=src, b=dst, w=weight)``
  selected in round r.

One round =

1. re-key the static weighted edge table through the label rows (two
   equi-joins on vertex id) and keep inter-component edges;
2. per-component argmin over the 2·|live| incidence view: ONE codegen
   hash agg ``min(struct(w, src, dst, other))`` — no window;
3. parent pointers: each component points at the component its chosen
   edge reaches. With a strict total order, every cycle in that choice
   graph is a mutual 2-cycle over the SAME edge (a longer cycle would
   need strictly decreasing weights around a loop); the 2-cycle is
   broken by rooting its smaller component id. Components with no
   outgoing edge root themselves;
4. pointer jumping ``p ← p∘p`` unrolled ``⌈log₂|V|⌉`` times — chains
   are at most |V| long, so that depth is provably sufficient, no
   driver probe per jump. Each jump is a self-join of the ≤|C|-row
   parent table (AQE broadcasts it while it measures small);
5. labels re-key through the resolved roots; the chosen edges join the
   forest rows stamped with the round number.

Termination: when no inter-component edge remains, the round is a
no-op and the runner's exact state-fingerprint check stops the loop —
the same idempotence that lets the DuckDB gate unroll a fixed generous
round count with a loud empty-result-if-unconverged guard and still
match the run-to-fixpoint engine exactly.

Scale shape at 100 TB: per round, two equi-joins of the |E|-row edge
table against the |V|-row label table (AQE may broadcast the label
side; at 10^12-edge scale both are shuffle hash joins on vertex id —
the connected-components join shape), one hash agg with map-side
partial combine, and ⌈log₂|V|⌉ self-joins of a table that never
exceeds the component count (shrinking at least geometrically).
Nothing is broadcast that scales with |E|; the state holds |V| label
rows plus the ≤|V|−1 forest rows; lineage is truncated every
superstep. No Python anywhere.

Reference parity: the reference repo has no MSF, but this is the same
"superstep over an edge table" family as its triangle/CC kernels
(reference CV_PROGRAM/orchestrator.cpp drives rounds the same way);
included because a link-graph engine at corpus scale needs a
forest/clustering primitive (single-linkage clustering = MSF).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepResult,
    SuperstepRunner,
    table_identity,
)

__all__ = ["minimum_spanning_forest", "msf_run", "single_linkage_clusters"]

_STATE_SCHEMA = "a long, b long, w long, mround int"


def minimum_spanning_forest(
    wedges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 32,
    resume: bool = True,
) -> DataFrame:
    """[src, dst, weight, mround] — the unique minimum spanning forest
    of the weighted edge table under the strict total order
    ``(weight, src, dst)``; ``mround`` is the Borůvka round (1-based)
    that selected the edge.

    Raises ``RuntimeError`` if ``max_rounds`` is hit before the
    component structure stabilizes (a partial forest is never
    returned silently)."""
    res = msf_run(wedges, checkpoint_dir, max_rounds, resume)
    if not res.converged:
        raise RuntimeError(
            f"Borůvka did not converge within {max_rounds} rounds; "
            "raise max_rounds (component count at least halves per "
            "round, so ⌈log₂|V|⌉ always suffices)"
        )
    return res.state.filter(F.col("mround") >= 1).select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        F.col("w").alias("weight"),
        "mround",
    )


def single_linkage_clusters(
    wedges: DataFrame, threshold, max_rounds: int = 32
) -> DataFrame:
    """[vertex, cluster] — single-linkage clustering at distance
    ``threshold``: two vertices share a cluster iff a path of edges
    with weight ≤ threshold connects them. Cluster id = min member id
    (the connected-components convention); vertices with no
    under-threshold edge are singletons.

    The classic identity makes this an MSF corollary: components of
    {e : w(e) ≤ t} equal components of {e ∈ MSF : w(e) ≤ t}, so the
    engine runs connected components over AT MOST |V|−1 forest edges
    instead of the full threshold subgraph — the dendrogram-cut shape
    that matters when the near-duplicate distance graph has 10^12
    candidate edges but clusters are wanted at many thresholds: pay
    Borůvka once, then every cut is a CC over a forest. (The DuckDB
    gate deliberately takes the OTHER route — min-label propagation
    over the full threshold subgraph — so the gate cross-checks the
    identity itself, not a re-derivation of the engine's plan.)"""
    from paralleltrianglecounting_spark.operators.components import (
        connected_components,
    )

    forest = minimum_spanning_forest(wedges, max_rounds=max_rounds)
    cut = forest.filter(F.col("weight") <= threshold).select("src", "dst")
    labels = connected_components(cut)
    verts = (
        wedges.select(F.col("src").alias("vertex"))
        .unionByName(wedges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    return verts.join(labels, "vertex", "left").select(
        "vertex", F.coalesce("component", "vertex").alias("cluster")
    )


def msf_run(
    wedges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 32,
    resume: bool = True,
) -> SuperstepResult:
    spark = wedges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        wedges.select("src", "dst", F.col("weight").cast("long").alias("w"))
        .repartition(n_parts, "src")
        .persist()
    )
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    n_vertices = verts.count()  # also materializes the edge cache
    if n_vertices == 0:
        empty = spark.createDataFrame([], _STATE_SCHEMA)
        return SuperstepResult(state=empty, iterations=0, converged=True)
    # chains in the choice graph are at most |V| long, so ⌈log₂|V|⌉
    # doubling jumps provably resolve every root — no per-jump probe
    n_jumps = max(1, math.ceil(math.log2(n_vertices)))

    init = verts.select(
        F.col("v").alias("a"),
        F.col("v").alias("b"),
        F.lit(None).cast("long").alias("w"),
        F.lit(-1).alias("mround"),
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        labels = state.filter(F.col("mround") == -1).select(
            F.col("a").alias("v"), F.col("b").alias("comp")
        )
        forest = state.filter(F.col("mround") >= 1)

        live = (
            edges.join(
                labels.select(F.col("v").alias("src"), F.col("comp").alias("cu")),
                "src",
            )
            .join(
                labels.select(F.col("v").alias("dst"), F.col("comp").alias("cv")),
                "dst",
            )
            .filter(F.col("cu") != F.col("cv"))
        )
        inc = live.select(
            F.col("cu").alias("comp"), F.col("cv").alias("other"), "w", "src", "dst"
        ).unionByName(
            live.select(
                F.col("cv").alias("comp"), F.col("cu").alias("other"), "w", "src", "dst"
            )
        )
        # referenced three times below (twin view, parent build, forest
        # rows), and its subtree is the round's only full pass over the
        # edge table — materialize the ≤|C|-row result once so neither
        # the pointer-jump base nor the state build re-runs the re-key
        chosen = (
            inc.groupBy("comp")
            .agg(F.min(F.struct("w", "src", "dst", "other")).alias("m"))
            .select("comp", "m.w", "m.src", "m.dst", "m.other")
            .localCheckpoint(eager=True)
        )

        # mutual 2-cycle (both endpoints chose the same edge): root at
        # the smaller component id; everyone else follows their choice
        twin = chosen.select(
            F.col("comp").alias("t_comp"),
            F.col("other").alias("t_other"),
            F.col("src").alias("t_src"),
            F.col("dst").alias("t_dst"),
        )
        par_chosen = chosen.join(
            twin,
            (F.col("t_comp") == F.col("other"))
            & (F.col("t_other") == F.col("comp"))
            & (F.col("t_src") == F.col("src"))
            & (F.col("t_dst") == F.col("dst")),
            "left",
        ).select(
            "comp",
            F.when(
                F.col("t_comp").isNotNull() & (F.col("comp") < F.col("other")),
                F.col("comp"),
            )
            .otherwise(F.col("other"))
            .alias("parent"),
        )
        comps = labels.select("comp").distinct()
        # pointer jumping by doubling: p ← p∘p. Each jump references p
        # TWICE, so without truncation the logical plan would hold 2^J
        # copies of the chosen-edge subtree and Catalyst's optimizer
        # time blows up exponentially (measured: graph_100 hung at
        # J=7). Each jump therefore eagerly truncates the ≤|C|-row
        # parent table — the standard pointer-jumping materialization —
        # and the loop exits as soon as a jump is a no-op (typical
        # depth is tiny; ⌈log₂|V|⌉ is the provable worst case).
        p = (
            comps.join(par_chosen, "comp", "left")
            .select("comp", F.coalesce("parent", "comp").alias("parent"))
            .localCheckpoint(eager=True)
        )
        for _ in range(n_jumps):
            nxt = p.select(F.col("comp").alias("j_comp"), F.col("parent").alias("j_parent"))
            p2 = (
                p.join(nxt, p["parent"] == nxt["j_comp"])
                .select("comp", F.col("j_parent").alias("parent"))
                .localCheckpoint(eager=True)
            )
            changed = (
                p2.withColumnRenamed("parent", "p2")
                .join(p, "comp")
                .filter(F.col("p2") != F.col("parent"))
                .limit(1)
                .count()
            )
            p = p2
            if changed == 0:
                break

        new_labels = (
            labels.join(p, "comp")
            .select(
                F.col("v").alias("a"),
                F.col("parent").alias("b"),
                F.lit(None).cast("long").alias("w"),
                F.lit(-1).alias("mround"),
            )
        )
        new_forest = (
            chosen.select("src", "dst", "w")
            .distinct()
            .select(
                F.col("src").alias("a"),
                F.col("dst").alias("b"),
                "w",
                F.lit(i + 1).alias("mround"),
            )
        )
        new_state = new_labels.unionByName(forest).unionByName(new_forest)
        # bound the union's partition growth (see operators/mis.py) —
        # without it each round adds its branches' partitions to the
        # checkpointed state and late rounds pay empty-task scheduling
        return new_state.coalesce(n_parts), {"jumps": n_jumps, "vertices": n_vertices}

    identity = None
    if checkpoint_dir is not None:
        identity = table_identity(
            edges.select("src", "dst", "w"), "src", "dst", "w", tag="msf"
        )
    runner = SuperstepRunner(
        spark,
        name="msf",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_rounds,
        identity=identity,
    )
    result = runner.run(init, step, stop_when_stable=True, resume=resume)
    edges.unpersist()
    return result
