"""Multi-source BFS hop distances (north-star extension).

Classic link-graph primitive (seed-set reachability, crawl-frontier
radius, spam-distance features). Given a seed vertex set, computes the
minimum hop count from any seed to every vertex reachable within
``max_hops`` — the relational formulation of the reference's
per-vertex adjacency walks, run as synchronous frontier supersteps
(the moral sibling of its chunked kernel launches,
``cuda_edge_it/cuda_edge_it_v1_1.cu:236-262``: bounded work units with
a barrier between).

Superstep formulation (plans/superstep.py): state = settled
``[vertex, dist]`` rows (dist = BFS level, monotone). One round =

1. ``frontier`` = state rows settled in the previous round (dist = i —
   a filter on the checkpointed state, no extra lineage),
2. expand: one equi-join frontier ⋈ bidirected topology — the
   topology is persisted ALREADY HASH-PARTITIONED on the join key, so
   the |E|-row side never re-exchanges across rounds (same one-
   exchange-per-iteration plan as pagerank's message topology),
3. ``left_anti`` against settled vertices (BFS visits each vertex
   once; the anti join is the distributed visited-set),
4. union the new level in with dist = i + 1.

Rounds are O(min(max_hops, eccentricity of the seed set)); each round
moves O(|frontier-adjacent edges|) rows. The hop cap is part of the
query semantics (both the engine and the DuckDB oracle bound the
recursion by the same ``max_hops``), which keeps the oracle's
recursive CTE finite on cyclic graphs. Unreached vertices are absent
from the output, not NULL rows — reachability is the query.

Convergence: when a round settles no new vertex the state fingerprint
is stable and the runner stops, so ``max_hops`` larger than the true
eccentricity costs only the empty final round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepResult,
    SuperstepRunner,
    table_identity,
)
from paralleltrianglecounting_spark.sources.edges import bidirected


def bfs_distances(
    edges: DataFrame,
    seeds,
    max_hops: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    directed: bool = False,
) -> DataFrame:
    """[vertex, dist] — min hops from any seed, for every vertex within
    ``max_hops`` of the seed set (seeds themselves at dist 0).

    ``seeds``: a list of vertex ids or a DataFrame with a ``vertex``
    column. Seed ids not present in the edge table still appear at
    dist 0 (a seed is trivially reachable from itself) but expand to
    nothing. ``directed=True`` follows edges src→dst only (forward
    reachability; pass reversed edges for backward)."""
    return bfs_run(
        edges, seeds, max_hops, checkpoint_dir, resume, directed
    ).state


def bfs_run(
    edges: DataFrame,
    seeds,
    max_hops: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    directed: bool = False,
) -> SuperstepResult:
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    spark = edges.sparkSession
    if isinstance(seeds, DataFrame):
        seed_df = seeds.select("vertex").distinct()
    else:
        seed_df = spark.createDataFrame(
            [(int(s),) for s in seeds], "vertex long"
        ).distinct()

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        ).distinct()
        if directed
        else bidirected(edges)
    )
    topo = (
        base.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .repartition(n_parts, "u")
        .persist()
    )

    init = seed_df.select("vertex", F.lit(0).cast("int").alias("dist"))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("dist") == i).select(
            F.col("vertex").alias("u")
        )
        new = (
            topo.join(frontier, "u")
            .select(F.col("v").alias("vertex"))
            .distinct()
            .join(state.select("vertex"), "vertex", "left_anti")
            .select("vertex", F.lit(i + 1).cast("int").alias("dist"))
        )
        return state.unionByName(new), {"level": i + 1}

    # the runner's default identity derives from the init state, which
    # here is the SEED SET only (graph-independent): resuming the same
    # seeds against a different graph's checkpoint_dir must be refused,
    # so the identity names the edge table too (ADVICE r03 #1). Only
    # paid when checkpointing.
    identity = None
    if checkpoint_dir is not None:
        identity = (
            table_identity(edges.select("src", "dst"), "src", "dst", tag="edges")
            + "|"
            + table_identity(seed_df, "vertex", tag="seeds")
            + ("|directed" if directed else "")
        )
        # max_hops is deliberately NOT part of the identity: resuming
        # with a larger cap from a capped run's checkpoints is the
        # restartability contract, not a different computation

    runner = SuperstepRunner(
        spark,
        name="bfs",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_hops,
        identity=identity,
    )
    try:
        result = runner.run(init, step, stop_when_stable=True, resume=resume)
    finally:
        topo.unpersist()
    return result


def diameter_estimate(edges: DataFrame, max_hops: int = 16) -> DataFrame:
    """[start_vertex, far_vertex, diameter_lb]: the double-sweep
    diameter lower bound (Magnien–Latapy–Habib) — BFS from a
    deterministic start (the smallest non-isolated vertex id), hop to
    the farthest vertex found (ties -> smallest id), BFS again from
    there; the second eccentricity is the bound. Exact on trees, within
    a small factor in practice on real graphs, and the standard cheap
    probe before committing to an exact-diameter sweep.

    Hops are capped at ``max_hops`` per sweep (the bfs_distances cap
    contract); if the cap binds, the bound is over the capped ball.
    Two scalar driver probes (one row each) pick the sweep endpoints —
    the same size class as pagerank's convergence probe, never a
    dataset collect. Cost: 2 multi-source-BFS runs = O(diameter)
    supersteps over the one persisted topology each.
    """
    from pyspark.sql import functions as F

    bidir = bidirected(edges)
    start = bidir.agg(F.min("src").alias("v")).collect()[0]["v"]
    if start is None:
        return edges.sparkSession.createDataFrame(
            [], "start_vertex long, far_vertex long, diameter_lb long"
        )
    d1 = bfs_distances(edges, [int(start)], max_hops=max_hops)
    far = (
        d1.orderBy(F.col("dist").desc(), F.col("vertex").asc())
        .limit(1)
        .collect()[0]["vertex"]
    )
    d2 = bfs_distances(edges, [int(far)], max_hops=max_hops)
    return d2.agg(
        F.lit(int(start)).alias("start_vertex"),
        F.lit(int(far)).alias("far_vertex"),
        F.max("dist").alias("diameter_lb"),
    )


def ego_net(
    edges: DataFrame,
    seeds,
    hops: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """[src, dst]: the induced subgraph on the ``hops``-ball around the
    seed set — every edge whose BOTH endpoints lie within ``hops`` of a
    seed. The debugging/sampling primitive: extract a tractable
    neighborhood of a suspicious vertex, or cut training subgraphs
    around labeled seeds.

    Plan: one capped multi-source BFS for the ball membership, then the
    edge table LEFT SEMI joins against the ball on each endpoint — two
    semi-joins, no row widening, edge payload columns never duplicated.
    At 100 TB the ball table is the small side: for typical hop radii
    it broadcasts, making both semi-joins map-side.
    """
    ball = bfs_distances(edges, seeds, max_hops=hops,
                         checkpoint_dir=checkpoint_dir).select("vertex")
    e = edges.select("src", "dst")
    return (
        e.join(ball.withColumnRenamed("vertex", "src"), "src", "left_semi")
        .join(ball.withColumnRenamed("vertex", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )
