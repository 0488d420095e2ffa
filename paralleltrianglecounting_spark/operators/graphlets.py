"""Connected 3- and 4-node graphlet census — wedge, triangle, claw
(K1,3), path P4, paw (tailed triangle), cycle C4, diamond, and K4 —
both SUBGRAPH counts (non-induced) and INDUCED counts, exactly.

This is the graph-mining workhorse census (Pržulj graphlets; the PGD /
ORCA counting literature): instead of enumerating O(|V|⁴) subsets, every
non-induced count reduces to aggregates over quantities the engine
already materializes at scale —

    wedge    W  = Σ_v C(d_v, 2)                 (degree table)
    triangle T  = rank-oriented enumeration      (the flagship kernel)
    claw        = Σ_v C(d_v, 3)                  (degree table)
    p4          = Σ_{uv∈E}(d_u−1)(d_v−1) − 3T    (edge ⋈ degree)
    paw         = Σ_v t_v·(d_v−2)                (per-vertex triangles)
    c4          = ½ Σ_pairs C(λ, 2)              (wedge-pair codegrees)
    diamond     = Σ_e C(sup_e, 2)                (per-edge triangle support)
    k4          = kClist on rank-oriented N⁺

and the induced counts follow by Möbius inversion over the containment
matrix (K4 ⊃ 6 diamonds ⊃ … — constants verified by the brute-force
pytest twin):

    I_wedge   = W − 3T            I_c4      = c4 − D + 3·K4
    I_claw    = claw − paw + 2D − 4·K4
    I_p4      = p4 − 2·paw − 4·c4 + 6D − 12·K4
    I_paw     = paw − 4D + 12·K4  I_diamond = D − 6·K4

100 TB shape: five independent aggregate pipelines (degree closed
forms are one hash agg each; paw is a |V|-row join; diamond is one agg
over the triangle→edge incidence the k-truss path already builds; c4
and k4 are the gated square/clique kernels), then eight 1-row
crossJoins. ANSI arithmetic: a hub degree past ~2.1e6 overflows
C(d,3)·int64 LOUDLY rather than wrapping (same contract as the
dyad-census closed forms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.cliques import k4_count
from paralleltrianglecounting_spark.operators.degrees import degrees
from paralleltrianglecounting_spark.operators.linkpred import square_count
from paralleltrianglecounting_spark.operators.triangles import triangle_triples

__all__ = ["graphlet_census"]

_GRAPHLETS = [
    "wedge",
    "triangle",
    "claw",
    "p4",
    "paw",
    "c4",
    "diamond",
    "k4",
]


def graphlet_census(edges: DataFrame) -> DataFrame:
    """[graphlet, n_subgraphs, n_induced]: one row per connected 3-/4-
    node class, exact. ``n_subgraphs`` counts copies as subgraphs
    (extra edges allowed among the chosen vertices); ``n_induced``
    counts vertex sets whose induced graph IS the class."""
    deg = degrees(edges)
    # ONE triangle enumeration feeds T, t_v, and sup_e — the dominant
    # kernel is paid once (persisted), not three times
    tr = triangle_triples(edges)
    tr.persist()
    deg.persist()
    dsum = deg.agg(
        F.sum(F.expr("degree * (degree - 1) div 2")).alias("w"),
        F.sum(
            F.expr("degree * (degree - 1) * (degree - 2) div 6")
        ).alias("claw"),
    )
    tri = tr.agg(F.count(F.lit(1)).alias("t"))
    # p4 (non-induced): Σ over edges (d_u − 1)(d_v − 1), minus 3T for
    # the closed walks that double back through a triangle edge
    du = deg.select(F.col("vertex").alias("src"), F.col("degree").alias("du"))
    dv = deg.select(F.col("vertex").alias("dst"), F.col("degree").alias("dv"))
    p4raw = (
        edges.join(du, "src")
        .join(dv, "dst")
        .agg(F.sum((F.col("du") - 1) * (F.col("dv") - 1)).alias("p4raw"))
    )
    tpv = (
        tr.select(F.explode(F.array("a", "b", "c")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    paw = tpv.join(deg, "vertex").agg(
        F.sum(F.col("triangles") * (F.col("degree") - 2)).alias("paw")
    )
    # diamond: per-edge triangle support from the triple incidence
    # (ALL three edges of every triangle — the k-truss support, not the
    # oriented tri_cnt, which sees only the higher-rank closing vertex)
    inc = (
        tr.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("a", "b").alias("u"),
                        F.greatest("a", "b").alias("v"),
                    ),
                    F.struct(
                        F.least("a", "c").alias("u"),
                        F.greatest("a", "c").alias("v"),
                    ),
                    F.struct(
                        F.least("b", "c").alias("u"),
                        F.greatest("b", "c").alias("v"),
                    ),
                )
            ).alias("e")
        )
        .groupBy("e")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    diamond = inc.agg(
        F.sum(F.expr("sup * (sup - 1) div 2")).alias("dia")
    )
    c4 = square_count(edges).select(F.col("squares").alias("c4"))
    k4 = k4_count(edges).select(F.col("k4_count").alias("k4"))
    s = (
        dsum.crossJoin(tri)
        .crossJoin(p4raw)
        .crossJoin(paw)
        .crossJoin(diamond)
        .crossJoin(c4)
        .crossJoin(k4)
        .select(
            F.coalesce("w", F.lit(0)).alias("w"),
            F.coalesce("claw", F.lit(0)).alias("claw"),
            F.col("t"),
            (F.coalesce("p4raw", F.lit(0)) - 3 * F.col("t")).alias("p4"),
            F.coalesce("paw", F.lit(0)).alias("paw"),
            F.coalesce("dia", F.lit(0)).alias("dia"),
            F.col("c4"),
            F.col("k4"),
        )
    )
    rows = s.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("wedge").alias("graphlet"),
                    F.col("w").alias("n_subgraphs"),
                    (F.col("w") - 3 * F.col("t")).alias("n_induced"),
                ),
                F.struct(
                    F.lit("triangle").alias("graphlet"),
                    F.col("t").alias("n_subgraphs"),
                    F.col("t").alias("n_induced"),
                ),
                F.struct(
                    F.lit("claw").alias("graphlet"),
                    F.col("claw").alias("n_subgraphs"),
                    (
                        F.col("claw")
                        - F.col("paw")
                        + 2 * F.col("dia")
                        - 4 * F.col("k4")
                    ).alias("n_induced"),
                ),
                F.struct(
                    F.lit("p4").alias("graphlet"),
                    F.col("p4").alias("n_subgraphs"),
                    (
                        F.col("p4")
                        - 2 * F.col("paw")
                        - 4 * F.col("c4")
                        + 6 * F.col("dia")
                        - 12 * F.col("k4")
                    ).alias("n_induced"),
                ),
                F.struct(
                    F.lit("paw").alias("graphlet"),
                    F.col("paw").alias("n_subgraphs"),
                    (
                        F.col("paw") - 4 * F.col("dia") + 12 * F.col("k4")
                    ).alias("n_induced"),
                ),
                F.struct(
                    F.lit("c4").alias("graphlet"),
                    F.col("c4").alias("n_subgraphs"),
                    (
                        F.col("c4") - F.col("dia") + 3 * F.col("k4")
                    ).alias("n_induced"),
                ),
                F.struct(
                    F.lit("diamond").alias("graphlet"),
                    F.col("dia").alias("n_subgraphs"),
                    (F.col("dia") - 6 * F.col("k4")).alias("n_induced"),
                ),
                F.struct(
                    F.lit("k4").alias("graphlet"),
                    F.col("k4").alias("n_subgraphs"),
                    F.col("k4").alias("n_induced"),
                ),
            )
        ).alias("g")
    ).select("g.graphlet", "g.n_subgraphs", "g.n_induced")
    return rows
