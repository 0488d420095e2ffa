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


#: the full Holland–Leinhardt universe (16 isomorphism classes)
FULL_TRIAD_CLASSES = [
    "003", "012", "021C", "021D", "021U", "030C", "030T", "102",
    "111D", "111U", "120C", "120D", "120U", "201", "210", "300",
]

#: (mutual, asymmetric) dyad composition of each CONNECTED class —
#: the inclusion–exclusion constants for the 012/102 closed forms
_CLASS_DYADS = {
    "021C": (0, 2), "021D": (0, 2), "021U": (0, 2),
    "111D": (1, 1), "111U": (1, 1), "201": (2, 0),
    "030C": (0, 3), "030T": (0, 3),
    "120C": (1, 2), "120D": (1, 2), "120U": (1, 2),
    "210": (2, 1), "300": (3, 0),
}


def dyad_census(dedges: DataFrame) -> DataFrame:
    """One row [n_vertices, mutual, asym, null_dyads] — the
    Holland–Leinhardt M-A-N dyad census: mutual pairs (arcs both
    ways), asymmetric pairs (one arc), and null pairs (no arc, by
    C(n,2) subtraction — never materialized). The vertex universe is
    the SUPPORT vertices (endpoints of a non-loop arc); self-loops are
    not dyads and are dropped, as in :func:`coded_edges`.

    One dedup + one (lo, hi) hash agg + two 1-row aggregates. The
    C(n,2) term runs in ANSI int64 — overflow past n ≈ 4.3e9 raises
    loudly rather than wrapping."""
    ce = coded_edges(dedges)
    verts = (
        ce.select(F.col("lo").alias("v"))
        .unionAll(ce.select(F.col("hi").alias("v")))
        .distinct()
    )
    nv = verts.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    ma = ce.agg(
        F.coalesce(F.sum(F.when(F.col("code") == 3, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("mutual"),
        F.coalesce(F.sum(F.when(F.col("code") != 3, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("asym"),
    )
    return nv.crossJoin(ma).select(
        "n_vertices",
        "mutual",
        "asym",
        (
            F.expr("n_vertices * (n_vertices - 1) div 2")
            - F.col("mutual")
            - F.col("asym")
        )
        .cast("long")
        .alias("null_dyads"),
    )


def full_triad_census(dedges: DataFrame, strategy: str = "auto") -> DataFrame:
    """[triad_class, triads] over ALL 16 Holland–Leinhardt classes —
    the complete triad census of a digraph, never touching the
    O(|V|³) triple space:

    - the 7 closed (triangle) classes come from :func:`triad_census`
      (the engine's rank-oriented enumeration);
    - the 6 open CONNECTED classes (021D/021U/021C one-apex dyad
      pairs, 111D/111U, 201) are support WEDGES whose closing pair is
      null: one apex self-join of the per-vertex dyad-state incidence
      + one anti-join against the coded edge set + a CASE — each such
      triple has exactly 2 non-null dyads, so exactly one wedge emits
      it (no dedup);
    - 012, 102, 003 are CLOSED FORMS: every triple containing a given
      dyad either has its other two dyads null (class 012/102) or is
      one of the counted connected triples, so
          012 = A·(n−2) − Σ counted·a(class)
          102 = M·(n−2) − Σ counted·m(class)
          003 = C(n,3) − everything else
      with (m, a) the per-class dyad composition (``_CLASS_DYADS``)
      and M/A/n from :func:`dyad_census` — pure 1-row integer
      arithmetic (ANSI: overflow raises; C(n,3) fits int64 to
      n ≈ 3.8e6 — past that the null-heavy classes are reported by
      the dyad census instead).

    Class naming (Wikipedia/statnet convention, pinned by the brute
    permutation-canonical twin in tests): 021D = out-star A←B→C,
    021U = in-star, 021C = chain; 111U = mutual pair pointing OUT at
    the third (0↔1→2), 111D = third pointing IN (0↔1←2); D/U for 120
    follows the off-mutual vertex's arcs exactly as in the closed
    census."""
    closed = triad_census(dedges, strategy=strategy)
    ce = coded_edges(dedges)
    # per-vertex dyad-state incidence: how vertex z sees each partner
    s_lo = (
        F.when(F.col("code") == 3, F.lit("m"))
        .when(F.col("code") == 1, F.lit("out"))
        .otherwise(F.lit("in"))
    )
    s_hi = (
        F.when(F.col("code") == 3, F.lit("m"))
        .when(F.col("code") == 2, F.lit("out"))
        .otherwise(F.lit("in"))
    )
    inc = ce.select(
        F.col("lo").alias("z"), F.col("hi").alias("o"), s_lo.alias("s")
    ).unionAll(
        ce.select(F.col("hi").alias("z"), F.col("lo").alias("o"), s_hi.alias("s"))
    )
    w1 = inc.alias("w1")
    w2 = inc.alias("w2")
    wedges = w1.join(
        w2, (F.col("w1.z") == F.col("w2.z")) & (F.col("w1.o") < F.col("w2.o"))
    ).select(
        F.col("w1.o").alias("lo"),
        F.col("w2.o").alias("hi"),
        F.col("w1.s").alias("s1"),
        F.col("w2.s").alias("s2"),
    )
    open_wedges = wedges.join(
        ce.select("lo", "hi"), ["lo", "hi"], "left_anti"
    )
    nm = F.when(F.col("s1") == "m", 1).otherwise(0) + F.when(
        F.col("s2") == "m", 1
    ).otherwise(0)
    asym_s = F.when(F.col("s1") == "m", F.col("s2")).otherwise(F.col("s1"))
    open_cls = (
        F.when(nm == 2, F.lit("201"))
        .when(nm == 1, F.when(asym_s == "out", F.lit("111U")).otherwise(F.lit("111D")))
        .when((F.col("s1") == "out") & (F.col("s2") == "out"), F.lit("021D"))
        .when((F.col("s1") == "in") & (F.col("s2") == "in"), F.lit("021U"))
        .otherwise(F.lit("021C"))
    )
    open_counts = (
        open_wedges.select(open_cls.alias("triad_class"))
        .groupBy("triad_class")
        .agg(F.count(F.lit(1)).cast("long").alias("triads"))
    )
    spark = dedges.sparkSession
    conn = closed.select("triad_class", "triads").unionAll(
        open_counts.select("triad_class", "triads")
    )
    comp = spark.createDataFrame(
        [(k, m, a) for k, (m, a) in sorted(_CLASS_DYADS.items())],
        "triad_class string, m long, a long",
    )
    sums = conn.join(F.broadcast(comp), "triad_class").agg(
        F.coalesce(F.sum(F.col("triads") * F.col("m")), F.lit(0)).alias("_sm"),
        F.coalesce(F.sum(F.col("triads") * F.col("a")), F.lit(0)).alias("_sa"),
        F.coalesce(F.sum("triads"), F.lit(0)).alias("_stot"),
    )
    d = dyad_census(dedges)
    c012 = F.col("asym") * (F.col("n_vertices") - 2) - F.col("_sa")
    c102 = F.col("mutual") * (F.col("n_vertices") - 2) - F.col("_sm")
    c3 = F.expr(
        "(n_vertices * (n_vertices - 1) div 2) * (n_vertices - 2) div 3"
    )
    derived = (
        d.crossJoin(sums)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("012").alias("triad_class"),
                        c012.cast("long").alias("triads"),
                    ),
                    F.struct(
                        F.lit("102").alias("triad_class"),
                        c102.cast("long").alias("triads"),
                    ),
                    F.struct(
                        F.lit("003").alias("triad_class"),
                        (c3 - F.col("_stot") - c012 - c102)
                        .cast("long")
                        .alias("triads"),
                    ),
                )
            ).alias("r")
        )
        .select("r.triad_class", "r.triads")
    )
    universe = spark.createDataFrame(
        [(t,) for t in FULL_TRIAD_CLASSES], "triad_class string"
    )
    counted = conn.unionAll(derived)
    return (
        universe.join(counted, "triad_class", "left")
        .groupBy("triad_class")
        .agg(F.coalesce(F.sum("triads"), F.lit(0)).cast("long").alias("triads"))
        .orderBy("triad_class")
    )
