"""Null-model / distribution-fit analytics over the degree sequence.

The reference engine's outputs (triangle counts, degrees) are raw
measurements; these operators answer the two questions a link-graph
analyst asks NEXT: "is the degree distribution heavy-tailed, and with
what exponent?" (the power-law MLE of Clauset–Shalizi–Newman, SIAM
Review 2009) and "is the observed triangle count MORE than the degree
sequence alone explains?" (the configuration-model expectation, Newman,
SIAM Review 2003 §4.2 — the standard motif-significance null).

Both are one-scan aggregates over tables the engine already maintains:
the degree histogram (O(distinct degrees) rows after two hash aggs)
and the flagship triangle count. Nothing here adds a join over edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import degree_histogram, degrees
from paralleltrianglecounting_spark.operators.triangles import triangle_count


def powerlaw_alpha(edges: DataFrame, d_min: int = 5) -> DataFrame:
    """One row [d_min, n_tail, alpha_r] — the discrete power-law
    exponent MLE over vertices with degree ≥ ``d_min``:

        α = 1 + n · ( Σ_{d_i ≥ d_min} ln(d_i / (d_min − 1/2)) )⁻¹

    (Clauset–Shalizi–Newman eq. 3.7, the standard ``plfit`` estimator;
    ``d_min`` is a caller knob here — full KS-minimizing d_min
    selection is a driver loop over this same aggregate). ``alpha_r``
    is NULL when the tail is empty or constant-at-d_min-free — loud,
    never a fabricated exponent.

    Plan shape: the float ln runs over the HISTOGRAM (one row per
    distinct degree — O(√E) rows), not per vertex, so the sum has few
    terms at any corpus size and the 6-dp round absorbs reassociation.
    Two chained hash aggs + one 1-row aggregate; no joins."""
    if d_min < 2:
        # ln(d/(d_min - 1/2)) needs d_min - 0.5 > 0 and the MLE is
        # degenerate at d_min = 1 anyway (every vertex is tail)
        raise ValueError(f"d_min must be >= 2, got {d_min}")
    hist = degree_histogram(edges).where(F.col("degree") >= d_min)
    ln_sum = F.sum(
        F.col("n_vertices")
        * F.log(F.col("degree").cast("double") / F.lit(d_min - 0.5))
    )
    agg = hist.agg(
        F.coalesce(F.sum("n_vertices"), F.lit(0)).cast("long").alias("n_tail"),
        ln_sum.alias("_s"),
    )
    return agg.select(
        F.lit(d_min).cast("long").alias("d_min"),
        "n_tail",
        F.when(
            F.col("_s") > 0,
            F.round(F.lit(1.0) + F.col("n_tail") / F.col("_s"), 6),
        ).alias("alpha_r"),
    )


def triangle_significance(edges: DataFrame) -> DataFrame:
    """One row [triangles, expected_r, ratio_r] — the observed global
    triangle count against its configuration-model expectation

        E[T] = (Σ d(d−1))³ / (6 · (Σ d)³)

    (Newman: with r = Σd(d−1)/Σd the mean excess degree ×
    branching factor, E[T] = r³/6). ratio_r ≫ 1 is the classical
    "real networks are clustered beyond their degree sequence" signal;
    ≈ 1 means the triangles are explained by hubs alone.

    Exactness contract: S₁ = Σd and S₂ = Σd(d−1) are exact int64
    (overflow when Σ d(d−1) ≥ 2⁶³ ≈ 9.2e18 — a graph with 10⁹ vertices
    of degree 10⁵, far past any gate tier; the cube is computed in
    double). The float tail is ONE division r = S₂/S₁ and the fixed
    association ((r·r)·r)/6, written identically in the oracle —
    bit-identical before the 6-dp round.

    Plan: one degree aggregate (1 row) × the flagship triangle count
    (1 row) — the crossJoin is 1×1."""
    s = degrees(edges).agg(
        F.coalesce(F.sum("degree"), F.lit(0)).cast("long").alias("_s1"),
        F.coalesce(F.sum(F.expr("degree * (degree - 1)")), F.lit(0))
        .cast("long")
        .alias("_s2"),
    )
    r = F.col("_s2").cast("double") / F.col("_s1")
    expected = r * r * r / F.lit(6.0)
    return s.crossJoin(triangle_count(edges)).select(
        "triangles",
        F.when(F.col("_s1") > 0, F.round(expected, 6)).alias("expected_r"),
        F.when(
            (F.col("_s1") > 0) & (F.col("_s2") > 0),
            F.round(F.col("triangles") / (r * r * r / F.lit(6.0)), 6),
        ).alias("ratio_r"),
    )
