"""k-core decomposition by iterative peeling (north-star extension).

The k-core of a graph is the maximal subgraph in which every vertex has
degree ≥ k — the standard link-graph density primitive (web-spam core
extraction, community seeding, graph degeneracy). Peeling computes it:
repeatedly delete every vertex whose current degree is < k until none
remains; deletion order does not matter (the k-core is unique), so the
synchronous delete-all-underdegree-vertices round used here reaches the
same fixpoint as sequential peeling.

Superstep formulation (plans/superstep.py): state = the canonical
``[src, dst]`` edge set of the surviving subgraph. One round =

1. degree per vertex over the surviving edges (one hash aggregate with
   map-side partial combine — the 2|E|-row bidirected view moves ~|V|
   rows),
2. ``keep`` = vertices with degree ≥ k (|V|-row, small),
3. two left-semi joins filter the edge set to rows whose BOTH
   endpoints survive (AQE broadcasts ``keep`` when it fits, which at
   bench scale it always does — then the round moves only the
   aggregate's ~|V| rows).

Rounds are O(peel depth) — worst case O(|V|) on a path, in practice a
handful; each round costs O(|E_surviving|) and the edge set only
shrinks. Convergence = state fingerprint stable (the runner's exact
check); at the fixpoint every surviving endpoint has degree ≥ k by
construction, so the answer is simply the surviving vertex set.

Peeling is idempotent at the fixpoint (an extra round is a no-op),
which is what lets the DuckDB gate unroll a fixed generous round count
and still match the run-to-fixpoint engine exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import SuperstepResult, SuperstepRunner
from paralleltrianglecounting_spark.sources.edges import bidirected


def k_core(
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    max_iterations: int = 100,
    resume: bool = True,
) -> DataFrame:
    """[vertex] — the vertices of the k-core (k ≥ 1; an edge table has
    no isolated vertices, so the 0-core equals the 1-core's domain)."""
    return k_core_run(edges, k, checkpoint_dir, max_iterations, resume).state


def k_core_run(
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    max_iterations: int = 100,
    resume: bool = True,
) -> SuperstepResult:
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = edges.sparkSession
    base = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        deg = (
            bidirected(state)
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.where(F.col("degree") >= k).select("vertex")
        survived = state.join(
            keep.withColumnRenamed("vertex", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("vertex", "dst"), "dst", "left_semi")
        return survived.select("src", "dst"), {"k": k, "round": i}

    runner = SuperstepRunner(
        spark,
        name=f"k_core_{k}",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_iterations,
    )
    result = runner.run(base, step, stop_when_stable=True, resume=resume)

    core_edges = result.state
    members = (
        bidirected(core_edges)
        .select(F.col("src").alias("vertex"))
        .distinct()
    )
    return SuperstepResult(
        state=members,
        iterations=result.iterations,
        converged=result.converged,
        metrics=result.metrics,
    )


def s_core(
    wedges: DataFrame,
    s: int,
    checkpoint_dir: str | None = None,
    max_iterations: int = 100,
    resume: bool = True,
) -> DataFrame:
    """[vertex] — the s-core of a WEIGHTED graph: the maximal subgraph
    in which every vertex has strength (sum of incident edge weights)
    ≥ s — the weighted generalization of the k-core (Eidsaa & Almaas,
    "s-core network decomposition", Phys. Rev. E 88, 2013). With unit
    weights it IS the k-core (pytested). Same synchronous
    delete-all-understrength peel as ``k_core`` — the s-core is unique,
    so deletion order does not matter and the fixpoint matches
    sequential peeling; integral weights keep the gate hash-exact.

    100 TB shape: identical to k_core — one map-side-combined SUM hash
    agg over the surviving bidirected edges per round plus two
    left-semi joins (AQE broadcasts the keep set); the weight column
    rides the state, never re-joined."""
    return s_core_run(wedges, s, checkpoint_dir, max_iterations, resume).state


def s_core_run(
    wedges: DataFrame,
    s: int,
    checkpoint_dir: str | None = None,
    max_iterations: int = 100,
    resume: bool = True,
) -> SuperstepResult:
    if s < 1:
        raise ValueError(f"s must be >= 1, got {s}")
    spark = wedges.sparkSession
    # canonicalize THEN distinct THEN sum: duplicate (src, dst, weight)
    # rows — in particular the (u,v,w)/(v,u,w) pair of a bidirected
    # table, the representation the k_core sibling tolerates via its
    # .distinct() — collapse to ONE edge before weights aggregate, so
    # unit-weight s_core equals k_core on any input k_core accepts
    # (pytested on a bidirected table). Genuine parallel edges with
    # DIFFERENT weights still sum.
    base = (
        wedges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .distinct()
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        strength = (
            state.select(F.col("src").alias("vertex"), "weight")
            .unionAll(state.select(F.col("dst").alias("vertex"), "weight"))
            .groupBy("vertex")
            .agg(F.sum("weight").alias("strength"))
        )
        keep = strength.where(F.col("strength") >= s).select("vertex")
        survived = state.join(
            keep.withColumnRenamed("vertex", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("vertex", "dst"), "dst", "left_semi")
        return survived.select("src", "dst", "weight"), {"s": s, "round": i}

    runner = SuperstepRunner(
        spark,
        name=f"s_core_{s}",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_iterations,
    )
    result = runner.run(base, step, stop_when_stable=True, resume=resume)

    members = (
        result.state.select(F.col("src").alias("vertex"))
        .unionAll(result.state.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    return SuperstepResult(
        state=members,
        iterations=result.iterations,
        converged=result.converged,
        metrics=result.metrics,
    )


def core_numbers(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_iterations: int = 500,
    resume: bool = True,
) -> DataFrame:
    """[vertex, coreness] — the FULL core decomposition in one job."""
    return core_numbers_run(
        edges, checkpoint_dir, max_iterations, resume
    ).state


def core_numbers_run(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_iterations: int = 500,
    resume: bool = True,
) -> SuperstepResult:
    """Per-vertex coreness by the h-index fixpoint iteration (Lü, Zhou,
    Zhang, Stanley, "The H-index of a network node and its relation to
    degree and coreness", PNAS 2016): init h = degree; each round

        h'(v) = H-index of { h(u) : u ∈ N(v) }
              = max over the desc-sorted neighbor values h_(1) ≥ h_(2) …
                of min(i, h_(i))

    The iterates decrease monotonically to the coreness, so running to
    the exact fixpoint (the SuperstepRunner's state-fingerprint
    stability check) yields the same answer as sequential min-degree
    peeling — but in O(convergence depth) synchronous rounds instead of
    O(Σ per-k peel rounds), with NO data-dependent control flow inside
    a round: one plan shape, all-integer arithmetic, gateable
    hash-exact against an unrolled SQL twin.

    Plan per round: one equi-join of the |V|-row h state against the
    cached pre-hash-partitioned bidirected topology (zero topology
    re-exchange — the pagerank treatment) → per-vertex H-index via a
    rank window partitioned by vertex (never single-partition) + one
    max(least(rank, h)) hash agg. At 100 TB the window sorts each
    vertex's neighbor values; lists are O(√E)-ish after the first
    rounds because h caps at degree and shrinks monotonically.

    vs k_core: the fixed-k peel answers "is v in the k-core" for ONE
    k; this answers it for every k at once (coreness(v) ≥ k ⇔ v ∈
    k-core — pytest-pinned cross-check).
    """
    from pyspark.sql import Window

    spark = edges.sparkSession
    base = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    topo = bidirected(base).repartition(n_parts, "src").persist()
    topo.count()

    init = (
        topo.groupBy(F.col("src").alias("vertex"))
        .agg(F.count(F.lit(1)).cast("long").alias("coreness"))
    )

    w = Window.partitionBy("vertex").orderBy(
        F.col("_h").desc(), F.col("_u").asc()
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        nbr = topo.join(
            state.select(
                F.col("vertex").alias("src"), F.col("coreness").alias("_h")
            ),
            "src",
        ).select(F.col("dst").alias("vertex"), F.col("src").alias("_u"), "_h")
        ranked = nbr.withColumn("_rank", F.row_number().over(w))
        new_h = ranked.groupBy("vertex").agg(
            F.max(F.least(F.col("_rank").cast("long"), F.col("_h"))).alias(
                "coreness"
            )
        )
        return new_h, {}

    runner = SuperstepRunner(
        spark,
        name="core_numbers",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_iterations,
    )
    result = runner.run(init, step, stop_when_stable=True, resume=resume)
    topo.unpersist()
    if not result.converged:
        raise RuntimeError(
            f"core_numbers did not reach the h-index fixpoint in "
            f"{max_iterations} rounds"
        )
    return result
