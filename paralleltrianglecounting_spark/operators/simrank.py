"""SimRank structural similarity (Jeh–Widom, KDD 2002) over an
explicit candidate core.

    s(a,a) = 1
    s(a,b) = C / (|N(a)|·|N(b)|) · Σ_{i∈N(a), j∈N(b)} s(i,j)

computed by the textbook synchronous iteration from s₀ = identity.

All-pairs SimRank is intrinsically quadratic — O(|V|²) state and
O(Σ_{a,b}|N(a)||N(b)|) = O((Σdeg)²) work per iteration — so there is
NO partition strategy that makes the full web graph affordable; the
production shapes are (a) this operator over an explicit candidate
core (the analysis set: a community, a domain's hosts, the dense
core), or (b) Monte-Carlo random-walk-with-restart sampling when only
point queries are needed. The operator therefore takes the core as a
first-class budget: the induced subgraph on the top ``n_core``
vertices by (degree desc, id asc) — deterministic, skew-aligned (hubs
are exactly the vertices whose similarities an analyst asks about).

Spark shape per iteration: two equi-joins against the (broadcastable,
core-sized) adjacency pair list fan s_k(i,j) out to (a, b) wedge
endpoints, then ONE codegen hash agg sums contributions — the same
join-propagate-aggregate skeleton as pagerank, on pair keys. The
final values are rounded to 6 dp for the gate (the module-wide
iterative-gate contract: double sums are order-sensitive in the last
bits, the 6-dp projection is engine-portable — pagerank/eigenvector
set the precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["simrank", "SIMRANK_C", "SIMRANK_ITERS", "SIMRANK_CORE"]

SIMRANK_C = 0.8
SIMRANK_ITERS = 3
SIMRANK_CORE = 60


def _core_edges(edges: DataFrame, n_core: int) -> DataFrame:
    """Induced undirected edge list (both directions) on the top
    ``n_core`` vertices by (degree desc, id asc)."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    bidir = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = bidir.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    core = (
        deg.orderBy(F.desc("degree"), F.asc("src"))
        .limit(n_core)
        .select(F.col("src").alias("v"))
    )
    return (
        bidir.join(F.broadcast(core).withColumnRenamed("v", "src"), "src")
        .join(F.broadcast(core).withColumnRenamed("v", "dst"), "dst")
        .select("src", "dst")
    )


def simrank(
    edges: DataFrame,
    c: float = SIMRANK_C,
    iterations: int = SIMRANK_ITERS,
    n_core: int = SIMRANK_CORE,
    min_sim: float = 1e-6,
) -> DataFrame:
    """[a, b, sim_r]: SimRank scores after ``iterations`` synchronous
    rounds on the induced top-``n_core`` core, for unordered pairs
    a < b with round(sim, 6) >= ``min_sim`` (the identity diagonal and
    zero pairs are omitted — they carry no information and the pruning
    keeps the output ∝ structurally-similar pairs, not |core|²).

    The pair-state table is persisted per round with lineage truncated
    by eager checkpointing being unnecessary at core scale — state is
    ≤ n_core² rows and the iteration count is a constant; the two
    fan-out joins broadcast the core adjacency."""
    adj = _core_edges(edges, n_core)
    adj.persist()
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    deg.persist()
    # s_0 = identity over core vertices
    s = deg.select(
        F.col("src").alias("i"), F.col("src").alias("j"), F.lit(1.0).alias("s")
    )
    a_in = F.broadcast(adj.select(F.col("src").alias("a"), F.col("dst").alias("i")))
    b_in = F.broadcast(adj.select(F.col("src").alias("b"), F.col("dst").alias("j")))
    for _ in range(iterations):
        contrib = (
            s.join(a_in, "i")
            .join(b_in, "j")
            .where(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("t"))
        )
        nxt = (
            contrib.join(
                F.broadcast(deg.select(F.col("src").alias("a"), F.col("d").alias("da"))),
                "a",
            )
            .join(
                F.broadcast(deg.select(F.col("src").alias("b"), F.col("d").alias("db"))),
                "b",
            )
            .select(
                F.col("a").alias("i"),
                F.col("b").alias("j"),
                (F.lit(c) * F.col("t") / (F.col("da") * F.col("db"))).alias("s"),
            )
        )
        diag = deg.select(
            F.col("src").alias("i"), F.col("src").alias("j"), F.lit(1.0).alias("s")
        )
        s = nxt.unionAll(diag).localCheckpoint(eager=False)
    out = (
        s.where(F.col("i") < F.col("j"))
        .select(
            F.col("i").alias("a"),
            F.col("j").alias("b"),
            F.round(F.col("s"), 6).alias("sim_r"),
        )
        .where(F.col("sim_r") >= min_sim)
    )
    return out
