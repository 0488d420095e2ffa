"""HITS (hubs & authorities) by synchronous power iteration
(Kleinberg, JACM'99) — north-star extension alongside pagerank.

Semantics (fixed, oracle-checked): DIRECTED edges src→dst, init
hub₀ = 1 on every vertex; each iteration

    auth_i(v) = Σ_{(u,v)∈E} hub_{i-1}(u),  then L1-normalized
    hub_i(u)  = Σ_{(u,v)∈E} auth_i(v),     then L1-normalized

Vertices with no in-edges hold authority 0 (and symmetrically for
hubs) but stay in the output universe. L1 normalization (÷ Σ) is used
instead of the textbook L2 so the recurrence is exactly SQL-unrollable
for the DuckDB gate (no sqrt in the fixpoint); the two normalizations
yield identical score *ratios* and identical rankings.

Plan per half-step: ONE join of the |V|-row score state against a
cached topology pre-hash-partitioned on that half-step's join key —
``adj_src`` (partitioned on src) feeds the authority pass, ``adj_dst``
(partitioned on dst) feeds the hub pass — so no superstep re-exchanges
the |E|-row side (the pagerank lesson, operators/pagerank.py). The
normalizer is a 1-row aggregate attached by crossJoin (scalar×frame,
broadcast nested loop — the triangles.py:658 pattern), never a
driver-side collect. The hub pass's plan contains the auth subtree
once more (auth feeds both the new state and the hub messages); the
SuperstepRunner persists each state, so the duplication is bounded to
one extra |E|-join per iteration, never compounding across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import vertices
from paralleltrianglecounting_spark.plans.superstep import SuperstepResult, SuperstepRunner


def hits(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> DataFrame:
    """[vertex, hub, auth] after ``iterations`` synchronous HITS
    supersteps over the directed edge table."""
    return hits_run(edges, iterations, checkpoint_dir, resume).state


def hits_run(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = vertices(edges).persist()
    n = verts.count()
    if n == 0:
        empty = spark.createDataFrame([], "vertex long, hub double, auth double")
        return SuperstepResult(state=empty, iterations=0, converged=True)
    adj_src = edges.select("src", "dst").repartition(n_parts, "src").persist()
    adj_dst = edges.select("src", "dst").repartition(n_parts, "dst").persist()
    edge_count = adj_src.count()
    adj_dst.count()

    init = verts.select(
        "vertex", F.lit(1.0).alias("hub"), F.lit(1.0 / n).alias("auth")
    )

    def _normalized(raw: DataFrame, col: str) -> DataFrame:
        # full vertex universe with zeros, then ÷ Σ via a 1-row
        # crossJoin (scalar normalizer stays in the plan — no collect)
        full = (
            verts.join(raw, "vertex", "left")
            .select("vertex", F.coalesce(F.col("_raw"), F.lit(0.0)).alias("_raw"))
        )
        tot = full.agg(F.sum("_raw").alias("_tot"))
        return full.crossJoin(tot).select(
            "vertex", (F.col("_raw") / F.col("_tot")).alias(col)
        )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        hub_msgs = (
            adj_src.join(state.select(F.col("vertex").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("hub").alias("_raw"))
        )
        auth = _normalized(hub_msgs, "auth")
        auth_msgs = (
            adj_dst.join(auth.select(F.col("vertex").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum("auth").alias("_raw"))
        )
        hub = _normalized(auth_msgs, "hub")
        new_state = verts.join(hub, "vertex").join(auth, "vertex")
        return new_state, {"messages_sent": 2 * edge_count, "vertices": n}

    runner = SuperstepRunner(
        spark,
        name="hits",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
    )
    result = runner.run(init, step, stop_when_stable=False, resume=resume)
    verts.unpersist()
    adj_src.unpersist()
    adj_dst.unpersist()
    return result


def salsa(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> DataFrame:
    """[vertex, hub, auth] after ``iterations`` synchronous SALSA
    supersteps (Lempel & Moran, WWW 2000) over the directed edge table
    — the stochastic sibling of HITS: instead of raw sums, every
    message is degree-normalized, so the iteration is a random walk on
    the bipartite hub/authority view and mass is conserved EXACTLY
    (no normalization step at all — the property that makes SALSA
    robust to the tightly-knit-community effect that inflates HITS):

        hub_i(u)  = Σ_{(u,v)∈E} auth_{i-1}(v) / indeg(v)
        auth_i(v) = Σ_{(u,v)∈E} hub_i(u)      / outdeg(u)

    init auth₀ = 1/|A| on the authority side A = {v : indeg(v) ≥ 1}.
    Σ hub_i = Σ auth_i = 1 at every i by construction (each auth share
    splits across exactly indeg in-edges, each hub share across
    exactly outdeg out-edges). Vertices outside a side hold 0 there
    but stay in the output universe. The returned ``auth`` is
    auth_iterations; the returned ``hub`` is the hub view OF that
    settled authority vector (Σ auth_N(v)/indeg(v) over out-edges) —
    the pair describes one consistent walk state.

    Plan per half-step (the hits/pagerank layout): ONE join of the
    |V|-row score state against a cached topology pre-hash-partitioned
    on that half-step's join key, with the divisor degree attached to
    the topology ONCE at build time — no per-superstep degree join.
    No collect anywhere; the state is |V| rows."""
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = vertices(edges).persist()
    if verts.count() == 0:
        verts.unpersist()
        return spark.createDataFrame([], "vertex long, hub double, auth double")
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("indeg"))
    topo = (
        edges.select("src", "dst")
        .join(outdeg, "src")
        .join(indeg, "dst")
    )
    # divisor degrees ride the topology; one partitioned copy per half-step
    adj_dst = topo.repartition(n_parts, "dst").persist()  # reads auth(dst)
    adj_src = topo.repartition(n_parts, "src").persist()  # reads hub(src)
    edge_count = adj_dst.count()
    adj_src.count()
    n_auth = indeg.count()

    init = verts.join(
        indeg.select(F.col("dst").alias("vertex")), "vertex", "left_semi"
    ).select("vertex", F.lit(1.0 / n_auth).alias("auth"))

    def step(state: DataFrame, i: int):
        hub = (
            adj_dst.join(
                state.select(F.col("vertex").alias("dst"), "auth"), "dst"
            )
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum(F.col("auth") / F.col("indeg")).alias("hub"))
        )
        auth = (
            adj_src.join(
                hub.select(F.col("vertex").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("hub") / F.col("outdeg")).alias("auth"))
        )
        return auth, {"messages_sent": 2 * edge_count}

    from paralleltrianglecounting_spark.plans.superstep import SuperstepRunner

    runner = SuperstepRunner(
        spark,
        name="salsa",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
    )
    result = runner.run(init, step, stop_when_stable=False, resume=resume)
    # final hub pass off the settled auth vector, then the full universe
    final_hub = (
        adj_dst.join(
            result.state.select(F.col("vertex").alias("dst"), "auth"), "dst"
        )
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.sum(F.col("auth") / F.col("indeg")).alias("hub"))
    )
    out = (
        verts.join(final_hub, "vertex", "left")
        .join(result.state, "vertex", "left")
        .select(
            "vertex",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
        )
    )
    verts.unpersist()
    adj_dst.unpersist()
    adj_src.unpersist()
    return out
