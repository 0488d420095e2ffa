"""k-truss decomposition by iterative support peeling (north-star
extension).

The k-truss is the maximal subgraph in which every edge participates in
at least k-2 triangles — the edge-analog of the k-core and the standard
stronger community/density primitive (cohesive-subgraph mining, spam
link-farm extraction). Like the k-core it is unique, and synchronous
delete-all-weak-edges rounds reach the same fixpoint as sequential
peeling, so the DuckDB gate can unroll a fixed generous round count and
still match the run-to-fixpoint engine exactly (idempotent at the
fixpoint: one extra round drops nothing).

Two formulations share the state contract of plans/superstep.py:

**Incremental (default — VERDICT r03 top item).** State = the support
table ``[src, dst, support]`` of the surviving subgraph, where support
is the triangle count of the edge WITHIN the surviving subgraph. The
full rank-oriented triangle enumeration (O(E^1.5)) runs exactly once,
to seed the supports. Each round then:

1. splits the state into the drop frontier D (support < k-2) and the
   survivors;
2. enumerates only the DESTROYED triangles — for each dropped edge
   (u,v), the common neighbors of u and v in the pre-drop graph, via
   an adjacency built solely for D's endpoints (one linear semi-join
   scan of the state + intersection work proportional to the frontier's
   incident neighborhoods, NOT a global re-enumeration);
3. canonicalizes + dedups the destroyed triples (a triangle with 2-3
   frontier edges is found once per such edge), explodes them into
   their 3 canonical edges in one generator, and decrements the
   surviving edges' supports by their destroyed-triangle counts.

Late rounds therefore cost ∝ the frontier's neighborhood (plus one
linear scan), not ∝ |E|^1.5 — the standard distributed mitigation for
deep peel cascades. Invariant maintained: after every round, support =
exact in-subgraph triangle count (each destroyed triangle decrements
each of its surviving edges exactly once; a dropped edge's own row is
discarded rather than decremented).

**Full recount (``incremental=False``).** The r03 formulation kept for
A/B measurement (tools/ktruss_rounds.py): state = the surviving edge
set; every round re-enumerates all surviving triangles and re-filters.
O(E_surviving^1.5) per round × peel depth.

Both reach the same unique fixpoint; the convergence check is the
runner's state fingerprint (an empty frontier leaves the state
bit-identical). The gate (``k_truss`` in __spark_entry__.py) and the
sequential-peeling pytest cover the incremental default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepResult,
    SuperstepRunner,
)
from paralleltrianglecounting_spark.sources.edges import bidirected


def edge_support(edges: DataFrame, strategy: str = "auto") -> DataFrame:
    """[src, dst, support] per canonical edge: the number of triangles
    through the edge (= |N(src) ∩ N(dst)|). Edges in no triangle get
    support 0."""
    from paralleltrianglecounting_spark.operators.triangles import triangle_triples

    tri = triangle_triples(edges, strategy=strategy)
    pairs = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                ),
                F.struct(
                    F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")
                ),
                F.struct(
                    F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    sup = pairs.groupBy("u", "v").agg(F.count("*").alias("support"))
    return (
        edges.select("src", "dst")
        .join(
            sup,
            (F.col("src") == F.col("u")) & (F.col("dst") == F.col("v")),
            "left",
        )
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support"),
        )
    )


def _destroyed_decrements(state: DataFrame, k: int) -> DataFrame:
    """[src, dst, _dec]: per SURVIVING edge, how many of its triangles
    die when this round's frontier (support < k-2) drops.

    Frontier-proportional: the adjacency is built only for the dropped
    edges' endpoints (the semi-join scans the state once — linear — but
    the collect_list / intersection / dedup work is all ∝ the frontier's
    incident neighborhoods)."""
    weak = state.where(F.col("support") < k - 2).select("src", "dst")
    # full pre-drop neighborhoods of the frontier's endpoints
    touched = weak.select(
        F.explode(F.array("src", "dst")).alias("u")
    ).distinct()
    nbrs = bidirected(state.select("src", "dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    adj = (
        nbrs.join(touched, "u", "left_semi")
        .groupBy("u")
        .agg(F.sort_array(F.collect_list("v")).alias("nbr"))
    )
    # destroyed triangles: common neighbors of each dropped edge's
    # endpoints in the pre-drop graph; dedup by canonical triple (a
    # triangle with 2-3 frontier edges is enumerated once per one)
    destroyed = (
        weak.join(
            adj.select(F.col("u").alias("src"), F.col("nbr").alias("_n_src")), "src"
        )
        .join(adj.select(F.col("u").alias("dst"), F.col("nbr").alias("_n_dst")), "dst")
        .select(
            "src", "dst", F.explode(F.array_intersect("_n_src", "_n_dst")).alias("w")
        )
        .select(F.array_sort(F.array("src", "dst", "w")).alias("t"))
        .distinct()
    )
    # one generator explode (not a 3-way union — union branches would
    # re-enumerate; the r02 triangles_per_vertex lesson)
    dec_edges = destroyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.element_at("t", 1).alias("src"),
                    F.element_at("t", 2).alias("dst"),
                ),
                F.struct(
                    F.element_at("t", 1).alias("src"),
                    F.element_at("t", 3).alias("dst"),
                ),
                F.struct(
                    F.element_at("t", 2).alias("src"),
                    F.element_at("t", 3).alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return dec_edges.groupBy("src", "dst").agg(F.count("*").alias("_dec"))


def k_truss(
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    max_iterations: int = 100,
    resume: bool = True,
    incremental: bool = True,
) -> DataFrame:
    """[src, dst] — the canonical edge set of the k-truss (k ≥ 2; the
    2-truss is the whole graph since every edge has support ≥ 0)."""
    return k_truss_run(
        edges, k, checkpoint_dir, max_iterations, resume, incremental
    ).state.select("src", "dst")


def k_truss_run(
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    max_iterations: int = 100,
    resume: bool = True,
    incremental: bool = True,
) -> SuperstepResult:
    """Run the peel to its fixpoint. Incremental state:
    ``[src, dst, support]`` (select src, dst for the edge set — or read
    the supports directly: at the fixpoint they are the exact
    in-truss triangle counts). Full-recount state: ``[src, dst]``."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    spark = edges.sparkSession
    base = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )

    init_cache = None
    if incremental:
        # the ONE full O(E^1.5) enumeration — persisted because the
        # runner touches the init plan up to three times before round 0's
        # checkpoint replaces it (identity + convergence fingerprints,
        # then the round-0 state build); without the persist each action
        # re-ran the whole enumeration
        init_cache = edge_support(base).persist()
        init = init_cache

        def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
            dec = _destroyed_decrements(state, k)
            survived = (
                state.where(F.col("support") >= k - 2)
                .join(dec, ["src", "dst"], "left")
                .select(
                    "src",
                    "dst",
                    (F.col("support") - F.coalesce(F.col("_dec"), F.lit(0)))
                    .cast("long")
                    .alias("support"),
                )
            )
            return survived, {"k": k, "round": i, "mode": "incremental"}

    else:
        init = base

        def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
            survived = (
                edge_support(state)
                .where(F.col("support") >= k - 2)
                .select("src", "dst")
            )
            return survived, {"k": k, "round": i, "mode": "full_recount"}

    runner = SuperstepRunner(
        spark,
        name=f"k_truss_{k}",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_iterations,
    )
    try:
        return runner.run(init, step, stop_when_stable=True, resume=resume)
    finally:
        if init_cache is not None:
            init_cache.unpersist()
