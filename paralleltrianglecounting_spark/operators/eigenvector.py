"""Eigenvector centrality by power iteration (north-star extension).

x_{k}(v) = Σ_{u∼v} x_{k-1}(u) from x_0 ≡ 1 over the bidirected
topology: after k steps x_k(v) is exactly the number of length-k walks
ending at v — an INTEGER — and x_k/‖x_k‖₁ converges to the principal
eigenvector of the adjacency matrix (Bonacich centrality). The engine
keeps the iteration UNNORMALIZED and divides by the L1 norm once at
the end: scaling never changes the direction, and integer-valued
iterates are what make the gate bit-identical across engines — every
partial sum of positive integers below 2^53 is EXACT in a double
regardless of summation order, so Spark's partial/final aggregation
and DuckDB's serial sum produce the same doubles, and the single final
division is deterministic. The operator measures max|x| and the norm
after the run and RAISES if either crossed 2^53 (at that point
exactness — and the gate — would silently degrade; measured headroom:
the gate graphs cross at k=6-8, so the contract runs k=5).

``normalize_each=True`` trades that exactness for unbounded iteration
depth: each superstep divides by the running L1 norm (a 1-row
aggregate attached by crossJoin — the hits.py scalar pattern, never a
driver collect). Final scores are identical up to float rounding
(pytest pins 1e-9 agreement); use it when iterating to convergence.

Plan per superstep: ONE join of the |V|-row score state against the
bidirected topology persisted pre-hash-partitioned on the join key
(the pagerank lesson — zero re-exchange of the |E|-row side), then one
hash agg with map-side partial combine. Lineage is truncated by the
SuperstepRunner; checkpoint/resume/lineage metrics inherited.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import SuperstepResult, SuperstepRunner
from paralleltrianglecounting_spark.sources.edges import bidirected

__all__ = ["eigenvector_centrality", "eigenvector_run", "katz_centrality"]

_EXACT_BOUND = float(1 << 53)


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.05,
    iterations: int = 4,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> DataFrame:
    """K-truncated Katz centrality: [vertex, walks, score_r] with
    score_r = round(Σ_{k=1..K} α^k · walks_k(v), 6) — walks_k(v) the
    exact number of length-k walks ending at v (Katz 1953; the
    attenuated-walk generalization of eigenvector centrality, defined
    for the infinite sum when α < 1/λ_max; the engine computes the
    K-step truncation, which is the checkable quantity).

    Cross-engine exactness, same recipe as eigenvector/PMI/BM25: the
    walk counts are INTEGERS kept below 2^53 (loud raise past it), the
    α^k factors are Python-computed double literals shared verbatim
    with the oracle SQL, and the accumulator is built in ONE fixed
    association order — acc_k = acc_{k-1} + walks_k·α^k, which is
    exactly how the unrolled oracle's left-to-right ``x1*a1 + x2*a2 +
    …`` chain parses — so every per-vertex double is bit-identical in
    both engines before the 6-dp round.

    Plan per superstep: the eigenvector plan plus one |V|-row left
    join carrying the accumulator (state is [vertex, x, acc]; the
    |E|-row topology side is persisted pre-hash-partitioned and never
    re-exchanges). ``walks`` rides along for integer auditability."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"katz_centrality: alpha must be in (0,1), got {alpha}")
    if iterations < 1:
        raise ValueError("katz_centrality: iterations must be >= 1")
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = bidirected(edges).repartition(n_parts, "src").persist()
    adj.count()
    init = (
        adj.select(F.col("src").alias("vertex"))
        .distinct()
        .select(
            "vertex", F.lit(1.0).alias("x"), F.lit(0.0).alias("acc")
        )
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        a_k = F.lit(alpha ** (i + 1))  # exact double literal, hop i+1
        msgs = state.select(F.col("vertex").alias("src"), "x").join(adj, "src")
        new_x = msgs.groupBy(F.col("dst").alias("vertex")).agg(
            F.sum("x").alias("_nx")
        )
        new = (
            state.select("vertex", "acc")
            .join(new_x, "vertex", "left")
            .select(
                "vertex",
                F.coalesce(F.col("_nx"), F.lit(0.0)).alias("x"),
                (
                    F.col("acc")
                    + F.coalesce(F.col("_nx"), F.lit(0.0)) * a_k
                ).alias("acc"),
            )
        )
        return new, {}

    runner = SuperstepRunner(
        spark,
        name="katz",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
    )
    result = runner.run(init, step, stop_when_stable=False, resume=resume)
    state = result.state
    probe = state.agg(
        F.max(F.abs(F.col("x"))).alias("mx"), F.sum("x").alias("sx")
    ).collect()[0]
    if probe["mx"] is not None and (
        float(probe["mx"]) >= _EXACT_BOUND or float(probe["sx"]) >= _EXACT_BOUND
    ):
        raise RuntimeError(
            f"walk counts crossed 2^53 after {iterations} iterations "
            "(no longer integer-exact in a double); reduce iterations"
        )
    adj.unpersist()
    return state.select(
        "vertex",
        F.col("x").alias("walks"),
        F.round(F.col("acc"), 6).alias("score_r"),
    )


def eigenvector_centrality(
    edges: DataFrame,
    iterations: int = 5,
    normalize_each: bool = False,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> DataFrame:
    """[vertex, walks, score_r] — ``walks`` is the exact length-k walk
    count ending at the vertex (integer-valued; NULL-free), ``score_r``
    the L1-normalized centrality rounded to 6 dp. With
    ``normalize_each=True``, ``walks`` carries the running normalized
    score instead of an integer."""
    res = eigenvector_run(edges, iterations, normalize_each, checkpoint_dir, resume)
    state = res.state
    if not normalize_each:
        # loud exactness guard: one tiny agg over |V| rows
        probe = state.agg(
            F.max(F.abs(F.col("x"))).alias("mx"), F.sum("x").alias("sx")
        ).collect()[0]
        if probe["mx"] is not None and (
            float(probe["mx"]) >= _EXACT_BOUND or float(probe["sx"]) >= _EXACT_BOUND
        ):
            raise RuntimeError(
                f"walk counts crossed 2^53 after {iterations} iterations "
                "(no longer integer-exact in a double); reduce iterations "
                "or use normalize_each=True"
            )
    norm = state.agg(F.sum("x").alias("_n"))
    return (
        state.crossJoin(norm)
        .select(
            "vertex",
            F.col("x").alias("walks"),
            F.round(F.col("x") / F.col("_n"), 6).alias("score_r"),
        )
    )


def eigenvector_run(
    edges: DataFrame,
    iterations: int = 5,
    normalize_each: bool = False,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = bidirected(edges).repartition(n_parts, "src").persist()
    adj.count()
    init = (
        adj.select(F.col("src").alias("vertex"))
        .distinct()
        .select("vertex", F.lit(1.0).alias("x"))
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        msgs = state.select(F.col("vertex").alias("src"), "x").join(adj, "src")
        new = msgs.groupBy(F.col("dst").alias("vertex")).agg(F.sum("x").alias("x"))
        if normalize_each:
            norm = new.agg(F.sum("x").alias("_n"))
            new = new.crossJoin(norm).select(
                "vertex", (F.col("x") / F.col("_n")).alias("x")
            )
        return new, {}

    runner = SuperstepRunner(
        spark,
        name="eigenvector",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
    )
    result = runner.run(init, step, stop_when_stable=False, resume=resume)
    adj.unpersist()
    return result
