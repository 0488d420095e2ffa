"""Bipartite motif counting — butterflies and wedges on the
(container, entity) incidence the link graph is projected FROM.

The production edge table (BASELINE.json input_hint) is a bipartite
projection: repos linked because they share a path. Projections lose
multiplicity structure; the standard motif that measures bipartite
cohesion *before* projecting is the **butterfly** (the K_{2,2} — two
containers sharing the same two entities), the bipartite analog of the
triangle (Sanei-Mehri, Sariyüce, Tirthapura, "Butterfly Counting in
Bipartite Networks", KDD 2018). Exact global counts via wedge
aggregation:

    butterflies  = Σ_{entity pairs (u,v)}  C(codeg(u,v), 2)
    left_wedges  = Σ_{containers c}        C(deg(c), 2)   (entity pairs sharing c)
    right_wedges = Σ_{entities e}          C(deg(e), 2)   (container pairs sharing e)

where codeg(u,v) = number of shared containers — exactly the ``weight``
column of the weighted projection, so the butterfly sum rides the same
single co-occurrence join + count aggregate the engine already uses for
``weighted_cooccurrence_edges``, followed by one global sum. The wedge
sums are two degree aggregates. No new shuffle shapes.

Scale: the wedge-aggregation plan is the exact-counting baseline of the
KDD'18 paper; its cost is the weighted-projection size (Σ_c C(|c|,2)
wedges, all map-side pre-aggregated by the count agg). Hub containers
are the quadratic term — the same ``max_container_size`` cap used for
the projection applies here, and dropped containers are an audited,
not silent, exclusion (the cap is a caller decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bipartite_motifs", "projection_cost"]


def projection_cost(
    incidence: DataFrame, container: str, entity: str
) -> DataFrame:
    """Projection-cost audit: per log2 container-size bucket,
    [bucket, containers, incidences, proj_pairs] — the query a 100 TB
    pipeline runs BEFORE deciding projection vs projection-free
    (bipartite_components) and before picking ``max_container_size``:
    ``proj_pairs = Σ C(d, 2)`` per bucket is exactly the number of
    co-occurrence pairs that bucket's containers would emit, so the
    quadratic hub tail is visible (and cap-able) ahead of time instead
    of discovered as a dead executor.

    Engine-portability: bucket = floor(log2(d)) computed as
    ``length(bin(d)) - 1`` — integer/string ops only, identical in
    Spark and DuckDB (a float log2 at an exact power of two is an
    engine lottery). All other columns are LONG arithmetic
    (``d*(d-1) div 2`` is exact where a double sum silently degrades
    past 2^53). Cost: one distinct + one count agg + one 2-level
    reaggregate — linear, two shuffles, no joins."""
    pairs = incidence.select(
        F.col(container).alias("_c"), F.col(entity).alias("_e")
    ).distinct()
    cdeg = pairs.groupBy("_c").agg(F.count("*").alias("d"))
    return (
        cdeg.select(
            (F.length(F.bin(F.col("d"))) - F.lit(1))
            .cast("int")
            .alias("bucket"),
            "d",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("containers"),
            F.sum("d").alias("incidences"),
            F.sum(F.expr("d * (d - 1L) div 2")).alias("proj_pairs"),
        )
    )


def bipartite_motifs(
    incidence: DataFrame,
    container: str,
    entity: str,
    max_container_size: int | None = None,
) -> DataFrame:
    """One row: [butterflies, left_wedges, right_wedges, containers,
    entities] — exact bipartite motif counts of the distinct
    (container, entity) incidence.

    ``left_wedges`` counts wedges centered on a container (pairs of
    entities it links — the projection's edge multiset size before
    dedup); ``right_wedges`` the mirror. ``butterflies`` counts
    K_{2,2}s once each.
    """
    from paralleltrianglecounting_spark.sources.edges import (
        weighted_cooccurrence_edges,
    )

    pairs = incidence.select(
        F.col(container).alias("_c"), F.col(entity).cast("long").alias("_e")
    ).distinct()
    wproj = weighted_cooccurrence_edges(
        incidence, container, entity, max_container_size
    )
    # C(w,2) per entity pair, summed — LONG arithmetic end to end
    # (w·(w−1) is even, so `div 2` is exact; a double sum would silently
    # lose integer exactness past 2^53 at corpus scale)
    bf = wproj.agg(
        F.sum(F.expr("weight * (weight - 1L) div 2")).alias("butterflies")
    )
    cdeg = pairs.groupBy("_c").agg(F.count("*").alias("d"))
    edeg = pairs.groupBy("_e").agg(F.count("*").alias("d"))
    lw = cdeg.agg(
        F.sum(F.expr("d * (d - 1L) div 2")).alias("left_wedges"),
        F.count("*").alias("containers"),
    )
    rw = edeg.agg(
        F.sum(F.expr("d * (d - 1L) div 2")).alias("right_wedges"),
        F.count("*").alias("entities"),
    )
    # three 1-row aggregates — scalar×scalar crossJoins, never data-sized
    return (
        bf.crossJoin(lw)
        .crossJoin(rw)
        .select("butterflies", "left_wedges", "right_wedges", "containers", "entities")
    )


def item_cosine_topk(
    incidence: DataFrame,
    container: str,
    entity: str,
    k: int = 100,
    max_container_size: int | None = None,
) -> DataFrame:
    """[u, v, strength, cosine_r] — the k most cosine-similar entity
    pairs over the bipartite incidence: cosine(u, v) =
    |C(u) ∩ C(v)| / sqrt(|C(u)| · |C(v)|) where C(x) is x's container
    set — the classical item–item similarity of collaborative
    filtering (Sarwar et al., WWW 2001) and the degree-normalized
    refinement of raw co-occurrence strength (a hub entity no longer
    dominates just by being everywhere). ``u < v``; ordering
    (cosine_r DESC, u, v) is total, so the top-k frontier is
    deterministic and engine-portable.

    Float portability: strength and both degrees are exact-in-double
    integers; sqrt and division are IEEE correctly-rounded, so the
    double is bit-identical across engines before the 6-dp round.

    Plan shape at 100 TB: one distinct + one entity-degree hash agg +
    the container-apex self-join + one pair hash agg + one degree
    re-join + TakeOrderedAndProject. The apex fan-out is the same
    quadratic hub tail every projection pays — ``max_container_size``
    caps it BEFORE the join (audit the tail first with
    ``projection_cost``)."""
    pairs = incidence.select(
        F.col(container).alias("_c"), F.col(entity).cast("long").alias("_e")
    ).distinct()
    if max_container_size is not None:
        sizes = pairs.groupBy("_c").agg(F.count("*").alias("_n"))
        keep = sizes.where(F.col("_n") <= max_container_size).select("_c")
        pairs = pairs.join(keep, "_c", "left_semi")
    deg = pairs.groupBy("_e").agg(F.count(F.lit(1)).alias("_d"))
    a = pairs.alias("a")
    b = pairs.alias("b")
    joint = (
        a.join(
            b,
            (F.col("a._c") == F.col("b._c")) & (F.col("a._e") < F.col("b._e")),
        )
        .groupBy(F.col("a._e").alias("u"), F.col("b._e").alias("v"))
        .agg(F.count(F.lit(1)).alias("strength"))
    )
    du = deg.select(F.col("_e").alias("u"), F.col("_d").alias("_du"))
    dv = deg.select(F.col("_e").alias("v"), F.col("_d").alias("_dv"))
    return (
        joint.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "strength",
            F.round(
                F.col("strength") / F.sqrt(F.col("_du") * F.col("_dv")), 6
            ).alias("cosine_r"),
        )
        .orderBy(F.col("cosine_r").desc(), F.col("u").asc(), F.col("v").asc())
        .limit(k)
    )
