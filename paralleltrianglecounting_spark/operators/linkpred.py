"""Neighborhood-pair analytics: co-neighbor counting, 4-cycle (square)
counting, link prediction, and h-hop neighborhood size.

The reference engine counts 3-cycles (triangles) on a co-occurrence
graph (``CV_PROGRAM/orchestrator.cpp``); these operators are the
canonical next questions asked of the same graph — "how many 4-cycles?"
(rectangle counting, the bipartite analog of triangle counting),
"which non-edges are most likely to close?" (classic link prediction:
common neighbors / Adamic–Adar / preferential attachment,
Liben-Nowell & Kleinberg, CIKM'03), and "how big is each vertex's
2-hop ball?" (the first step of the neighborhood function / effective
diameter, Palmer et al. ANF, KDD'02).

All of them sit on one substrate: the wedge-pair table
``λ(u,v) = |N(u) ∩ N(v)|`` for unordered pairs {u,v}, produced by ONE
self-join of the bidirected adjacency on the apex key and ONE hash
aggregate on the endpoint pair. The generator emits Σ_z C(deg(z), 2)
rows — hub-quadratic, the irreducible cost of wedge enumeration. At
100 TB the mitigation is the same cap-plus-audit contract the dedup
operators use (``NGRAM_MAX_BLOCK``/``SIMHASH_MAX_BUCKET``):
``max_apex_degree`` excludes hub apexes from the generator (making the
counts a documented underestimate) and ``oversized_apexes`` surfaces
exactly what the cap dropped — never a silent truncation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import degrees
from paralleltrianglecounting_spark.sources.edges import bidirected


def oversized_apexes(edges: DataFrame, max_apex_degree: int) -> DataFrame:
    """[vertex, degree] — apexes the ``max_apex_degree`` cap excludes
    from wedge-pair enumeration. The audit twin of the cap: a capped
    run is an underestimate over exactly these vertices' wedges."""
    deg = degrees(edges)
    return deg.filter(F.col("degree") > max_apex_degree).select("vertex", "degree")


def _apex_view(edges: DataFrame, max_apex_degree: int | None) -> DataFrame:
    """Bidirected adjacency annotated with the apex degree:
    [z, n, z_degree]. The degree rides along so Adamic–Adar needs no
    second per-wedge join; the optional cap is a left-semi filter on
    the apex key (hub rows never enter the quadratic generator)."""
    deg = degrees(edges)
    bid = bidirected(edges).select(F.col("src").alias("z"), F.col("dst").alias("n"))
    view = bid.join(
        deg.select(F.col("vertex").alias("z"), F.col("degree").alias("z_degree")), "z"
    )
    if max_apex_degree is not None:
        keep = deg.filter(F.col("degree") <= max_apex_degree).select(
            F.col("vertex").alias("z")
        )
        view = view.join(keep, "z", "left_semi")
    return view


def wedge_pair_counts(
    edges: DataFrame, max_apex_degree: int | None = None
) -> DataFrame:
    """[u, v, codeg] — for each unordered pair {u, v} (u < v) with at
    least one common neighbor, the shared-neighborhood size
    λ(u,v) = |N(u) ∩ N(v)|.

    Plan: self-join of the bidirected adjacency on the apex key z
    (each wedge u—z—v emitted once via n1 < n2), hash aggregate on the
    endpoint pair — both sides partial+final. Pairs with λ = 0 do not
    appear (they are the complement — quadratic in |V| and never
    materialized)."""
    view = _apex_view(edges, max_apex_degree).select("z", "n")
    w1 = view.alias("w1")
    w2 = view.alias("w2")
    return (
        w1.join(
            w2,
            (F.col("w1.z") == F.col("w2.z")) & (F.col("w1.n") < F.col("w2.n")),
        )
        .groupBy(F.col("w1.n").alias("u"), F.col("w2.n").alias("v"))
        .agg(F.count("*").alias("codeg"))
    )


def square_count(edges: DataFrame, max_apex_degree: int | None = None) -> DataFrame:
    """[squares: long] — the number of 4-cycles (C4 subgraphs, chords
    allowed) in the undirected graph.

    Every 4-cycle u—a—w—b—u is determined by its two diagonal pairs
    {u,w} and {a,b}; choosing 2 common neighbors of a pair closes one
    square, and each square is produced by exactly its 2 diagonals, so

        squares = (1/2) Σ_{u<v} C(λ(u,v), 2)

    — one aggregate over the wedge-pair table (K4 check: 6 pairs × C(2,2)
    / 2 = 3 ✓). λ ≤ max degree, so λ·(λ−1) stays far inside int64 on any
    real graph; the global sum is a single partial+final agg, and the
    ÷2 is exact (each square contributes exactly 2)."""
    wp = wedge_pair_counts(edges, max_apex_degree)
    return wp.agg(
        (F.sum(F.expr("codeg * (codeg - 1) div 2")) / 2)
        .cast("long")
        .alias("squares")
    )


def link_prediction_topk(
    edges: DataFrame,
    k: int = 100,
    max_apex_degree: int | None = None,
) -> DataFrame:
    """[u, v, common_neighbors, adamic_adar_r, pref_attach] — the k
    non-adjacent vertex pairs most likely to close, by the three
    classical neighborhood link-prediction scores
    (Liben-Nowell & Kleinberg, CIKM'03):

    - common_neighbors = λ(u,v)                       (integer, exact)
    - Adamic–Adar      = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z)  (rounded 6 dp)
    - preferential attachment = deg(u) · deg(v)       (integer, exact)

    A wedge apex has ≥ 2 distinct neighbors, so ln(deg z) ≥ ln 2 > 0 —
    no division guard needed. Candidates are only pairs with ≥ 1 common
    neighbor (the standard candidate universe: a zero-common-neighbor
    pair scores 0 on CN/AA and is not a meaningful prediction), minus
    existing edges via one left-anti join against the canonical edge
    table. Ordering is (adamic_adar_r DESC, u, v) — the tie-break runs
    on the ROUNDED score so the top-k frontier is deterministic and
    engine-portable. Spark executes the global top-k as
    TakeOrderedAndProject (per-partition heaps, no full sort)."""
    view = _apex_view(edges, max_apex_degree)
    w1 = view.alias("w1")
    w2 = view.select("z", "n").alias("w2")
    scored = (
        w1.join(
            w2,
            (F.col("w1.z") == F.col("w2.z")) & (F.col("w1.n") < F.col("w2.n")),
        )
        .groupBy(F.col("w1.n").alias("u"), F.col("w2.n").alias("v"))
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log(F.col("w1.z_degree"))).alias("_aa"),
        )
    )
    non_edges = scored.join(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    deg = degrees(edges)
    du = deg.select(F.col("vertex").alias("u"), F.col("degree").alias("_deg_u"))
    dv = deg.select(F.col("vertex").alias("v"), F.col("degree").alias("_deg_v"))
    return (
        non_edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            "common_neighbors",
            F.round(F.col("_aa"), 6).alias("adamic_adar_r"),
            (F.col("_deg_u") * F.col("_deg_v")).cast("long").alias("pref_attach"),
        )
        .orderBy(F.desc("adamic_adar_r"), "u", "v")
        .limit(k)
    )


def neighborhood_size(
    edges: DataFrame,
    hops: int = 2,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """[vertex, ball] — |{w ≠ v : dist(v, w) ≤ hops}| per vertex: the
    h-hop neighborhood function N(v, h) of Palmer et al. (ANF, KDD'02),
    whose growth curve gives the effective diameter.

    Exact path (the gate): expand the bidirected pair set hop by hop
    with a distinct between rounds (the distinct bounds each round's
    input by the ball, not the walk count), then one count per source.
    The pair stream is Σ_v |ball(v)| rows — hub-quadratic at h = 2,
    genuinely materialized; this is the exact-semantics tier.

    ``approx=True`` is the scale tier: ``approx_count_distinct``
    (HyperLogLog++) replaces the distinct+count, so the h-hop pair
    stream is folded into fixed-size HLL sketches by the map-side
    partial aggregate — the exchange carries one sketch per vertex
    instead of the distinct pair stream, and no distinct shuffle runs
    at all. Standard error ``rsd`` (default 5%); bounded-error twin
    test in tests/test_linkpred_hits.py."""
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    bid = bidirected(edges).select(F.col("src").alias("u"), F.col("dst").alias("w"))
    reach = bid
    for i in range(hops - 1):
        nxt = reach.join(
            bid.select(F.col("u").alias("w"), F.col("w").alias("w2")), "w"
        ).select("u", F.col("w2").alias("w"))
        reach = reach.unionByName(nxt)
        if i < hops - 2:
            # distinct between rounds: the NEXT expansion's join input
            # must be the ball so far, not the (exponentially larger)
            # walk multiset. The final round skips it — count_distinct
            # and the HLL sketch both dedup inside the aggregate, so a
            # trailing distinct would just add a full pair shuffle.
            reach = reach.distinct()
    reach = reach.filter(F.col("u") != F.col("w"))
    counter: Column = (
        F.approx_count_distinct("w", rsd) if approx else F.count_distinct("w")
    )
    return reach.groupBy(F.col("u").alias("vertex")).agg(
        counter.cast("long").alias("ball")
    )


def link_prediction_jaccard(
    edges: DataFrame,
    k: int = 100,
    max_apex_degree: int | None = None,
) -> DataFrame:
    """[u, v, common_neighbors, jaccard_r] — the k non-adjacent pairs
    with the highest neighborhood Jaccard |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
    (Liben-Nowell & Kleinberg's third classical score, complementing
    the Adamic–Adar ranking of ``link_prediction_topk``; the two
    rankings genuinely differ — Jaccard punishes high-degree endpoints
    that AA rewards through many low-information shared hubs). For a
    NON-edge, u ∉ N(v) and v ∉ N(u), so the union is exactly
    deg(u) + deg(v) − λ with no self-correction (unlike
    ``edge_jaccard``'s −2). λ ≥ 1 on every candidate, so the
    denominator is positive.

    Ordering runs on the 6-dp ROUNDED score with (u, v) tie-break —
    the deterministic engine-portable frontier — executed as
    TakeOrderedAndProject. Plan: the shared wedge-pair aggregate +
    one left-anti join against the edge table + two broadcast-able
    degree lookups; identical scale shape to the AA variant."""
    wp = wedge_pair_counts(edges, max_apex_degree)
    non_edges = wp.join(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    deg = degrees(edges)
    du = deg.select(F.col("vertex").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("vertex").alias("v"), F.col("degree").alias("_dv"))
    return (
        non_edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            F.col("codeg").cast("long").alias("common_neighbors"),
            F.round(
                F.col("codeg") / (F.col("_du") + F.col("_dv") - F.col("codeg")),
                6,
            ).alias("jaccard_r"),
        )
        .orderBy(F.desc("jaccard_r"), "u", "v")
        .limit(k)
    )


def co_citation_topk(
    dedges: DataFrame, k: int = 100, mode: str = "cocitation"
) -> DataFrame:
    """[u, v, strength] — the k strongest vertex pairs by co-citation
    (number of shared IN-neighbors: pages that cite both — Small 1973)
    or bibliographic coupling (shared OUT-neighbors: pages both cite —
    Kessler 1963), the two classical directed-graph similarity signals
    SALSA/HITS build on. ``u < v``; ordering (strength DESC, u, v) is
    total, so the top-k frontier is deterministic.

    Plan shape at 100 TB: one self-join of the directed edge table on
    the shared endpoint (the apex) + one map-side-combinable hash agg
    + TakeOrderedAndProject. The apex fan-out is the co-occurrence
    projection's quadratic hub tail — on a web corpus the apex is a
    page's out-link list (bounded by page size) for co-citation, so
    the blowup is the benign direction; for coupling over hub
    authorities cap the apex first (the projection_cost audit makes
    the tail visible ahead of time)."""
    if mode == "cocitation":
        apex, end = "src", "dst"
    elif mode == "coupling":
        apex, end = "dst", "src"
    else:
        raise ValueError(f"mode must be cocitation|coupling, got {mode!r}")
    a = dedges.select(F.col(apex).alias("z"), F.col(end).alias("n"))
    w1 = a.alias("w1")
    w2 = a.alias("w2")
    return (
        w1.join(w2, (F.col("w1.z") == F.col("w2.z")) & (F.col("w1.n") < F.col("w2.n")))
        .groupBy(F.col("w1.n").alias("u"), F.col("w2.n").alias("v"))
        .agg(F.count(F.lit(1)).alias("strength"))
        .orderBy(F.col("strength").desc(), F.col("u").asc(), F.col("v").asc())
        .limit(k)
    )
