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

import os

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


# θ-state broadcast gate for the truss decomposition: under this many
# edges the per-round θ table (|E| rows × 3 longs ≈ 24 B/row, so the
# default is ~100 MB broadcast) rides a broadcast hash join into the
# cached incidence — the round is then ZERO-shuffle on the
# 3·|triangles|-row side. Over the gate the shuffle plan runs instead
# (incidence pre-partitioned on its first join key so one of the two
# θ joins reuses the cached layout). Same answer either way
# (pytest-pinned); env-tunable like CSR_BROADCAST_MAX_EDGES.
THETA_BROADCAST_MAX_EDGES = int(
    os.environ.get("SPARK_GRAFT_THETA_BROADCAST_MAX_EDGES", str(4_000_000))
)


def truss_numbers(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_iterations: int = 500,
    resume: bool = True,
    broadcast_theta: bool | None = None,
) -> DataFrame:
    """[src, dst, trussness] — the FULL truss decomposition in one job:
    trussness(e) = the maximum k such that e belongs to the k-truss
    (triangle-free edges get the trivial 2)."""
    return truss_numbers_run(
        edges, checkpoint_dir, max_iterations, resume, broadcast_theta
    ).state.select(
        "src", "dst", (F.col("theta") + F.lit(2)).alias("trussness")
    )


def truss_numbers_run(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_iterations: int = 500,
    resume: bool = True,
    broadcast_theta: bool | None = None,
) -> SuperstepResult:
    """Per-edge trussness by the LOCAL h-index support iteration — the
    edge-level analog of ``kcore.core_numbers`` (the nucleus-decomposition
    local iteration of Sariyüce–Seshadhri–Pinar, WWW 2017 / the
    Lü et al. h-index fixpoint lifted from vertices to edges):

        init  θ(e) = support(e)  (triangle count of e)
        round θ'(e) = H-index over the triangles t ∋ e of
                      min(θ(e₁), θ(e₂))   (e₁, e₂ = t's other edges)

    The iterates decrease monotonically to θ(e) = truss(e) − 2, the
    same fixpoint as sequential min-support peeling (pytest-pinned) —
    in O(convergence depth) synchronous rounds (measured 24 at sf0.01)
    with ONE uniform plan per round, vs a peel whose round count is
    Σ per-k cascade depths and whose per-round work is frontier-
    dependent. The expensive object — the triangle→edge incidence —
    is enumerated ONCE (the same rank-oriented O(E^1.5) pass k_truss
    seeds from) and cached; every round after that touches only
    |incidence| = 3·|triangles| rows.

    Plan per round: two equi-joins attaching the partner edges' θ to
    the cached incidence (the |E|-row state is the small side of both)
    → least(θ₁, θ₂) → per-edge H-index via one rank window partitioned
    by edge + one max(least(rank, val)) hash agg → left join onto the
    edge universe (triangle-free edges hold θ = 0). All-integer,
    deterministic at any parallelism, gateable hash-exact against an
    unrolled SQL twin with the standard loud fixpoint guard.

    Two physical regimes behind ``THETA_BROADCAST_MAX_EDGES`` (same
    answer, pytest-pinned):

    - **under the gate** (default ≤4 M edges ≈ 100 MB θ payload): θ
      BROADCASTS into both partner joins and the incidence is cached
      pre-partitioned on the WINDOW key (su, du), so a round moves
      ZERO bytes of the 3·|triangles|-row incidence through a shuffle
      — broadcast hash joins preserve the streamed side's
      partitioning, the window sorts partition-locally, and the agg
      reuses the clustering. Measured 9.2× per-round vs the shuffle
      plan at sf0.01 (24 rounds: 1357 s → 148 s end-to-end).
    - **over the gate** (the 100 TB path): shuffle hash joins with the
      incidence pre-partitioned on the FIRST join key (s1, d1), so
      join 1 reuses the cached layout and only join 2 + the window
      re-exchange the big side — 2 incidence-sized shuffles per round,
      never 3, and the θ state (the |E|-row side) is always the
      shuffled-small side.
    """
    from pyspark.sql import Window

    from paralleltrianglecounting_spark.operators.triangles import (
        triangle_triples,
    )

    spark = edges.sparkSession
    base = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .persist()
    )
    base.count()

    tri = triangle_triples(base)
    # canonical edge ids per corner pair; one incidence row per
    # (edge, triangle) carrying the triangle's OTHER two edges
    def _canon(x, y, s, d):
        return [F.least(x, y).alias(s), F.greatest(x, y).alias(d)]

    inc = None
    for me, p1, p2 in (
        (("a", "b"), ("a", "c"), ("b", "c")),
        (("a", "c"), ("a", "b"), ("b", "c")),
        (("b", "c"), ("a", "b"), ("a", "c")),
    ):
        part = tri.select(
            *_canon(F.col(me[0]), F.col(me[1]), "su", "du"),
            *_canon(F.col(p1[0]), F.col(p1[1]), "s1", "d1"),
            *_canon(F.col(p2[0]), F.col(p2[1]), "s2", "d2"),
        )
        inc = part if inc is None else inc.unionByName(part)
    if broadcast_theta is None:
        broadcast_theta = base.count() <= THETA_BROADCAST_MAX_EDGES
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # broadcast regime: cluster on the WINDOW key so the round is
    # shuffle-free; shuffle regime: cluster on join 1's key so the
    # cached layout feeds one of the two θ joins directly
    inc_keys = ("su", "du") if broadcast_theta else ("s1", "d1")
    inc = inc.repartition(n_parts, *inc_keys).persist()
    n_inc = inc.count()
    _maybe_bcast = F.broadcast if broadcast_theta else (lambda df: df)

    init = base.join(
        inc.groupBy(F.col("su").alias("src"), F.col("du").alias("dst")).agg(
            F.count(F.lit(1)).alias("theta")
        ),
        ["src", "dst"],
        "left",
    ).select(
        "src", "dst", F.coalesce(F.col("theta"), F.lit(0)).cast("long").alias("theta")
    )

    w = Window.partitionBy("su", "du").orderBy(
        F.col("val").desc(), F.col("s1").asc(), F.col("d1").asc()
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        p1 = state.select(
            F.col("src").alias("s1"), F.col("dst").alias("d1"),
            F.col("theta").alias("_t1"),
        )
        p2 = state.select(
            F.col("src").alias("s2"), F.col("dst").alias("d2"),
            F.col("theta").alias("_t2"),
        )
        vals = (
            inc.join(_maybe_bcast(p1), ["s1", "d1"])
            .join(_maybe_bcast(p2), ["s2", "d2"])
            .select(
                "su", "du", "s1", "d1",
                F.least(F.col("_t1"), F.col("_t2")).alias("val"),
            )
        )
        hind = (
            vals.withColumn("_rank", F.row_number().over(w))
            .groupBy(F.col("su").alias("src"), F.col("du").alias("dst"))
            .agg(
                F.max(
                    F.least(F.col("_rank").cast("long"), F.col("val"))
                ).alias("theta")
            )
        )
        new = base.join(_maybe_bcast(hind), ["src", "dst"], "left").select(
            "src", "dst",
            F.coalesce(F.col("theta"), F.lit(0)).cast("long").alias("theta"),
        )
        return new, {"incidence_rows": n_inc}

    runner = SuperstepRunner(
        spark,
        name="truss_numbers",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_iterations,
    )
    result = runner.run(init, step, stop_when_stable=True, resume=resume)
    inc.unpersist()
    base.unpersist()
    if not result.converged:
        raise RuntimeError(
            f"truss_numbers did not reach the h-index fixpoint in "
            f"{max_iterations} rounds"
        )
    return result
