"""Directed triangle motif census (closed-triad census).

The reference engine counts UNDIRECTED triangles
(``CV_PROGRAM/orchestrator.cpp``); on a digraph the canonical next
question is *which kind* of triangle: the Davis–Leinhardt triad census
restricted to the 7 closed (triangle) classes — ``030T`` transitive,
``030C`` cyclic, ``120D``/``120U``/``120C`` (one mutual dyad; the two
asymmetric arcs both leave / both enter / pass through the third
vertex), ``210`` (two mutual dyads), ``300`` (all three mutual).
Holland & Leinhardt (1970) naming; the open classes (dyads, nulls)
need O(|V|³) triples and are derivable from degree/dyad counts, so
only the closed classes are enumerated.

Plan shape at 100 TB: one distinct + one (lo, hi) hash agg to fold
each directed edge pair into a 2-bit direction code, one undirected
triangle enumeration (the engine's own rank-oriented kernel — never a
3-way nested self-join), then THREE hash equi-joins attaching the
codes of the triangle's three sides, one CASE classification (pure
codegen), one 7-group hash agg. Triangle enumeration dominates,
exactly as in plain counting; the census adds only |T| join probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.triangles import triangle_triples

#: the 7 closed-triad classes, census row universe (zero counts kept)
TRIAD_CLASSES = ["030C", "030T", "120C", "120D", "120U", "210", "300"]


def coded_edges(dedges: DataFrame) -> DataFrame:
    """[lo, hi, code] — each undirected support edge of the digraph with
    a 2-bit direction code: 1 = lo→hi only, 2 = hi→lo only, 3 = both
    (mutual dyad). Input rows are dedup'd here (codes are set-valued:
    multiplicity must not leak into the bits); self-loops dropped."""
    d = dedges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    return d.groupBy(
        F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
    ).agg(
        (
            F.max(F.when(F.col("src") < F.col("dst"), 1).otherwise(0))
            + 2 * F.max(F.when(F.col("src") > F.col("dst"), 1).otherwise(0))
        ).alias("code")
    )


def _classify(a, b, c):
    """Triad class from the direction codes of sides (u,v), (v,w), (u,w)
    of an id-sorted triangle u < v < w. Identical CASE logic is inlined
    in the DuckDB oracle — the classification must be engine-portable.

    m = #mutual sides. m=3 → 300; m=2 → 210. m=1: let z be the vertex
    off the mutual dyad; count z's out-arcs among the two asymmetric
    sides: 2 → 120D, 0 → 120U, 1 → 120C. m=0: cyclic iff the codes are
    (1,1,2) or (2,2,1) — the only two orientations closing a directed
    3-cycle — else transitive."""
    m = (
        F.when(a == 3, 1).otherwise(0)
        + F.when(b == 3, 1).otherwise(0)
        + F.when(c == 3, 1).otherwise(0)
    )

    def _sub(z_out):
        return (
            F.when(z_out == 2, F.lit("120D"))
            .when(z_out == 0, F.lit("120U"))
            .otherwise(F.lit("120C"))
        )

    zb = F.when(b == 2, 1).otherwise(0)
    zc = F.when(c == 2, 1).otherwise(0)
    za1 = F.when(a == 1, 1).otherwise(0)
    zc1 = F.when(c == 1, 1).otherwise(0)
    za2 = F.when(a == 2, 1).otherwise(0)
    zb1 = F.when(b == 1, 1).otherwise(0)
    return (
        F.when(m == 3, F.lit("300"))
        .when(m == 2, F.lit("210"))
        .when(a == 3, _sub(zb + zc))  # mutual {u,v}, z = w: w→v iff b=2, w→u iff c=2
        .when(b == 3, _sub(za1 + zc1))  # mutual {v,w}, z = u: u→v iff a=1, u→w iff c=1
        .when(c == 3, _sub(za2 + zb1))  # mutual {u,w}, z = v: v→u iff a=2, v→w iff b=1
        .when(
            ((a == 1) & (b == 1) & (c == 2)) | ((a == 2) & (b == 2) & (c == 1)),
            F.lit("030C"),
        )
        .otherwise(F.lit("030T"))
    )


def triad_census(dedges: DataFrame, strategy: str = "auto") -> DataFrame:
    """[triad_class, triads] — counts of the 7 closed-triad classes over
    the directed edge table; every class present (zeros kept) so the
    output schema/universe is data-independent. Σ triads equals the
    undirected triangle count of the support graph (pytest-pinned).

    ``strategy`` is passed to the engine's own triangle enumerator
    (``triangle_triples``): the census never re-derives enumeration."""
    ce = coded_edges(dedges)
    und = ce.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
    t3 = triangle_triples(und, strategy=strategy)
    # id-sort the triple: (a, b) is the oriented edge (a < b already),
    # c is the closing vertex and can fall anywhere in the id order.
    srt = F.array_sort(F.array("a", "b", "c"))
    tri = t3.select(
        srt.getItem(0).alias("u"), srt.getItem(1).alias("v"), srt.getItem(2).alias("w")
    )
    uv = ce.select(F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("code").alias("cuv"))
    vw = ce.select(F.col("lo").alias("v"), F.col("hi").alias("w"), F.col("code").alias("cvw"))
    uw = ce.select(F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("code").alias("cuw"))
    coded = tri.join(uv, ["u", "v"]).join(vw, ["v", "w"]).join(uw, ["u", "w"])
    counted = coded.select(
        _classify(F.col("cuv"), F.col("cvw"), F.col("cuw")).alias("triad_class")
    ).groupBy("triad_class").agg(F.count(F.lit(1)).alias("_n"))
    spark = dedges.sparkSession
    universe = spark.createDataFrame(
        [(t,) for t in TRIAD_CLASSES], "triad_class string"
    )
    return (
        universe.join(counted, "triad_class", "left")
        .select(
            "triad_class",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("triads"),
        )
        .orderBy("triad_class")
    )


def weighted_triangle_intensity(wedges: DataFrame) -> DataFrame:
    """One row [triangles, intensity] over a canonical weighted edge
    table [src, dst, weight] (src < dst, integer weights):
    ``intensity = Σ_triangles w(a,b) · w(b,c) · w(a,c)`` — the exact
    integer product form underlying Onnela et al.'s weighted clustering
    (Phys. Rev. E 71, 065103: their per-triangle term is the cube root
    of this product over normalized weights; the raw product sum keeps
    the metric in exact int64 arithmetic, so the gate needs no float
    epsilon). A pair sharing many containers contributes
    multiplicatively — triangles between strongly-tied pairs dominate,
    which is the point of weighting.

    Overflow contract: per-triangle product and the running sum must
    fit int64 — Σ w1·w2·w3 ≤ |T| · max_w³, so max_w ≤ 10^4 is safe up
    to 10^6 triangles and max_w ≤ 10² up to 10^12; co-occurrence
    weights (shared-container counts) sit far below either. Callers
    with heavy-tailed weights should bucket or cap first.

    Plan shape at 100 TB: identical to :func:`triad_census` — the
    engine's rank-oriented enumeration + three hash joins attaching
    side weights + one scalar agg. Nothing new shuffles."""
    we = wedges.select("src", "dst", F.col("weight").cast("long").alias("w"))
    und = we.select("src", "dst")
    t3 = triangle_triples(und)
    srt = F.array_sort(F.array("a", "b", "c"))
    tri = t3.select(
        srt.getItem(0).alias("u"), srt.getItem(1).alias("v"), srt.getItem(2).alias("w3")
    )
    uv = we.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("w").alias("wuv"))
    vw = we.select(F.col("src").alias("v"), F.col("dst").alias("w3"), F.col("w").alias("wvw"))
    uw = we.select(F.col("src").alias("u"), F.col("dst").alias("w3"), F.col("w").alias("wuw"))
    coded = tri.join(uv, ["u", "v"]).join(vw, ["v", "w3"]).join(uw, ["u", "w3"])
    return coded.agg(
        F.count(F.lit(1)).alias("triangles"),
        F.coalesce(
            F.sum(F.col("wuv") * F.col("wvw") * F.col("wuw")), F.lit(0)
        ).alias("intensity"),
    )
