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

Superstep formulation (plans/superstep.py): state = the canonical
``[src, dst]`` edge set of the surviving subgraph. One round =

1. enumerate the surviving subgraph's triangles with the rank-oriented
   machinery (``triangle_triples`` — each triangle exactly once, work
   O(E_surviving^1.5)),
2. per-edge support: explode each triple into its 3 canonical edges in
   ONE generator and hash-aggregate on the edge key (same plan shape
   as ``edge_jaccard``),
3. left-semi the state against edges with support ≥ k-2 via an inner
   join on the aggregated support table (AQE broadcasts it when small).

Rounds are O(peel depth); the triangle enumeration per round is the
honest cost — supports change as edges drop, so they must be
recomputed (there is no sound incremental shortcut without keeping
per-triangle state of the same size). The edge set only shrinks, so
rounds get cheaper as the cascade proceeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepResult,
    SuperstepRunner,
)


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


def k_truss(
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    max_iterations: int = 100,
    resume: bool = True,
) -> DataFrame:
    """[src, dst] — the canonical edge set of the k-truss (k ≥ 2; the
    2-truss is the whole graph since every edge has support ≥ 0)."""
    return k_truss_run(edges, k, checkpoint_dir, max_iterations, resume).state


def k_truss_run(
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    max_iterations: int = 100,
    resume: bool = True,
) -> SuperstepResult:
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

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        survived = (
            edge_support(state)
            .where(F.col("support") >= k - 2)
            .select("src", "dst")
        )
        return survived, {"k": k, "round": i}

    runner = SuperstepRunner(
        spark,
        name=f"k_truss_{k}",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_iterations,
    )
    return runner.run(base, step, stop_when_stable=True, resume=resume)
