"""Strongly connected components by FW-BW coloring with trim
(north-star extension — the directed-graph counterpart of
``operators/components.py``).

Algorithm: the coloring SCC decomposition (Orzan 2004; the Multistep
method of Slota–Rajamanickam–Madduri, IPDPS 2014 — trim + forward
min-label coloring + backward reach), the standard label-propagation
SCC for Pregel-style engines. Tarjan/Kosaraju DFS orders are
inherently sequential; coloring re-expresses the decomposition as
min-aggregates and frontier joins, exactly the shapes this engine
already runs for connected components and BFS.

One outer superstep over the surviving subgraph =

1. **trim** (to fixpoint, capped): a vertex with in-degree 0 or
   out-degree 0 cannot lie on a directed cycle, so it is a singleton
   SCC — settle it and drop its edges. Iterating consumes DAG-like
   periphery (chains, tendrils) without ever running the quadratic
   phases on it; on real web corpora trim removes the majority of
   vertices (Slota et al. measure 60-95%).
2. **color** (forward min-label to fixpoint): color(v) = min vertex id
   that reaches v in the surviving subgraph, computed by iterated
   ``min`` propagation along edge direction — the directed analog of
   min-label CC. Monotone decreasing, so the changed-row count is an
   exact convergence probe.
3. **backward reach within color**: for each color root r (color(r) =
   r), the SCC of r is exactly {v : color(v) = r and v reaches r},
   because color(v) = r certifies r→v and the backward frontier
   certifies v→r; membership of SCC(r) in r's color class is an
   invariant (mutually-reachable vertices have identical reacher
   sets). A reverse-direction frontier BFS seeded at all roots
   simultaneously, restricted to same-color vertices, settles every
   root's full SCC in one pass.
4. **shrink**: drop settled vertices' edges. Removing a whole SCC
   never splits or merges another (every SCC is wholly inside or
   disjoint from the removed set), so the remaining subgraph's SCCs
   are exactly the remaining original SCCs; vertices left with no
   surviving edges are therefore singletons and settle immediately.

Every phase is min/set-algebraic — deterministic at any parallelism —
and each outer round settles at least every color root's SCC, so the
loop terminates. Worst-case outer depth is linear (a long path of
2-cycles), like every coloring-family SCC; on link graphs (one giant
SCC + shallow DAG periphery) trim + one or two colorings finish it.

State (superstep runner — checkpoint/resume/lineage for free):
``[a, b, tag]`` — tag 0: surviving edge (a=src, b=dst); tag 1: settled
assignment (a=vertex, b=scc id = min member id).

Scale shape at 100 TB: per color hop, ONE equi-join of the |V|-row
color table against the surviving edge table persisted ALREADY
HASH-PARTITIONED on src (the pagerank layout — the |E|-row side never
re-exchanges inside the fixpoint) + one map-side-combined min agg;
backward hops join the frontier against a dst-partitioned twin.
Frontiers and color tables are O(|V|); nothing driver-side but scalar
convergence probes. Inner lineage is truncated by an EAGER
localCheckpoint every hop: the trim step references the surviving
edge set ~5× (have_in, have_out, the vertex diff, both anti-joins)
and backward reach references the settled set twice, so an
untruncated plan tree grows EXPONENTIALLY in hops (5^h nodes — the
JVM OOMs stringifying it long before data is a problem). Each hop
already pays a materializing count, so eager truncation adds no job —
it replaces persist with the runner's own per-superstep pattern.
No Python rows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import vertices
from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepResult,
    SuperstepRunner,
)

__all__ = [
    "strongly_connected_components",
    "scc_run",
    "condensation",
    "reciprocity",
]

_STATE_SCHEMA = "a long, b long, tag int"


def _pin(df: DataFrame) -> DataFrame:
    """Materialize + cache + CUT LINEAGE + reset plan stats — the
    per-hop state treatment of every inner fixpoint here. persist()
    alone is not enough: it caches rows but keeps the full logical
    plan, and these loops reference their state multiple times per hop
    (trim: 5×), so the plan TREE grows exponentially in hops; and a
    bare localCheckpoint carries the round's estimated sizeInBytes
    into the new leaf, compounding it hop over hop (see
    plans/superstep.py local_pin for the measured blowup)."""
    from paralleltrianglecounting_spark.plans.superstep import local_pin

    return local_pin(df)


def strongly_connected_components(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 100,
    max_hops: int = 10_000,
    max_trim_hops: int = 20,
    resume: bool = True,
) -> DataFrame:
    """[vertex, scc] — strongly connected component id per vertex of
    the directed edge table, scc = min member id (the CC convention).
    Self-loops are ignored (they never change SCC membership).

    Raises ``RuntimeError`` if ``max_rounds`` outer rounds don't settle
    every vertex — a partial decomposition is never returned silently.
    """
    res = scc_run(
        edges, checkpoint_dir, max_rounds, max_hops, max_trim_hops, resume
    )
    if not res.converged:
        raise RuntimeError(
            f"SCC coloring did not settle every vertex within "
            f"{max_rounds} outer rounds; raise max_rounds (depth is "
            "bounded by the longest chain of SCCs)"
        )
    return res.state.where(F.col("tag") == 1).select(
        F.col("a").alias("vertex"), F.col("b").alias("scc")
    )


def condensation(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """[src_scc, dst_scc] — the SCC quotient digraph (the condensation):
    every vertex re-keyed to its SCC id, self-loops (intra-SCC edges)
    dropped, parallel quotient edges deduped. Always a DAG, so the
    output composes directly with ``operators.dag.topological_levels``
    — the classic web-graph "bowtie" pipeline (SCC → condensation →
    layering).

    Plan: the SCC run, then two equi-joins re-keying src and dst
    through the |V|-row assignment (the small side of both) + one
    distinct. Linear beyond the SCC itself."""
    scc = strongly_connected_components(edges, checkpoint_dir, max_rounds)
    e = edges.where(F.col("src") != F.col("dst")).select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    return (
        e.join(
            scc.select(F.col("vertex").alias("src"), F.col("scc").alias("src_scc")),
            "src",
        )
        .join(
            scc.select(F.col("vertex").alias("dst"), F.col("scc").alias("dst_scc")),
            "dst",
        )
        .where(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .distinct()
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """One row [n_edges, n_reciprocal, reciprocity_r] — the fraction of
    distinct non-self directed edges whose reverse edge also exists
    (the first-order symmetry diagnostic of any directed link graph:
    follows-graphs sit near 0.5, citation DAGs near 0, crawl graphs in
    between). ONE pass: distinct → left join against the reversed key
    carrying a marker → one scalar aggregate counting both totals —
    no driver round-trip, no second scan."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("_r")
    )
    return (
        e.join(rev, ["src", "dst"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.count("_r").alias("n_reciprocal"),
        )
        .select(
            "n_edges",
            "n_reciprocal",
            F.round(
                F.col("n_reciprocal") / F.nullif(F.col("n_edges"), F.lit(0)), 6
            ).alias("reciprocity_r"),
        )
    )


def _fixpoint_colors(
    fwd: DataFrame, verts: DataFrame, max_hops: int
) -> tuple[DataFrame, int]:
    """color(v) = min vertex id reaching v in the subgraph ``fwd``
    (persisted pre-partitioned on src). Returns (colors, hops)."""
    colors = _pin(verts.select("vertex", F.col("vertex").alias("color")))
    hops = 0
    while hops < max_hops:
        incoming = (
            fwd.join(
                colors.select(F.col("vertex").alias("src"), "color"), "src"
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("color").alias("_in"))
        )
        nxt = _pin(
            colors.join(incoming, "vertex", "left").select(
                "vertex",
                F.least(F.col("color"), F.coalesce("_in", "color")).alias(
                    "color"
                ),
                (F.coalesce("_in", "color") < F.col("color")).alias("_chg"),
            )
        )
        changed = nxt.where(F.col("_chg")).count()
        colors = nxt.select("vertex", "color")
        hops += 1
        if changed == 0:
            return colors, hops
    raise RuntimeError(
        f"SCC color propagation exceeded max_hops={max_hops}"
    )


def _backward_reach(
    bwd: DataFrame, colors: DataFrame, max_hops: int
) -> tuple[DataFrame, int]:
    """{v : color(v) = r, v reaches its color root r} via a reverse
    frontier BFS seeded at all roots at once, restricted to each
    root's color class. Returns ([vertex, color], hops)."""
    reached = _pin(colors.where(F.col("vertex") == F.col("color")))
    frontier = reached
    hops = 0
    while hops < max_hops:
        step_in = (
            bwd.join(
                frontier.select(F.col("vertex").alias("dst"), "color"), "dst"
            )
            .select(F.col("src").alias("vertex"), "color")
            .distinct()
        )
        # stay inside the color class, drop already-settled vertices
        nxt = _pin(
            step_in.join(colors, ["vertex", "color"], "left_semi").join(
                reached, ["vertex", "color"], "left_anti"
            )
        )
        if nxt.count() == 0:
            return reached, hops
        reached = _pin(reached.unionByName(nxt))
        frontier = nxt
        hops += 1
    raise RuntimeError(f"SCC backward reach exceeded max_hops={max_hops}")


def scc_run(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 100,
    max_hops: int = 10_000,
    max_trim_hops: int = 20,
    resume: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    init = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.col("src").cast("long").alias("a"),
            F.col("dst").cast("long").alias("b"),
        )
        .distinct()
        .select("a", "b", F.lit(0).alias("tag"))
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        live = state.where(F.col("tag") == 0).select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        )
        settled = state.where(F.col("tag") == 1)
        new_rows: list[DataFrame] = []

        # --- trim to (capped) fixpoint: in-deg 0 or out-deg 0 -> singleton
        cur = _pin(live.repartition(n_parts, "src"))
        n_edges = cur.count()
        trim_hops = 0
        while n_edges and trim_hops < max_trim_hops:
            have_in = cur.select(F.col("dst").alias("vertex")).distinct()
            have_out = cur.select(F.col("src").alias("vertex")).distinct()
            dead = _pin(
                vertices(cur).join(
                    have_in.join(have_out, "vertex", "left_semi"),
                    "vertex",
                    "left_anti",
                )
            )
            shrunk = _pin(
                cur.join(
                    dead.select(F.col("vertex").alias("src")), "src", "left_anti"
                )
                .join(
                    dead.select(F.col("vertex").alias("dst")), "dst", "left_anti"
                )
                .repartition(n_parts, "src")
            )
            n_after = shrunk.count()
            if n_after == n_edges:
                break
            # settle every vertex that LEFT the subgraph this hop — the
            # degree-0 dead AND any vertex whose last edges died with
            # them (a trim hop never removes a cycle edge, so a
            # vanished vertex is provably a singleton SCC)
            gone = vertices(cur).join(vertices(shrunk), "vertex", "left_anti")
            new_rows.append(
                gone.select(
                    F.col("vertex").alias("a"),
                    F.col("vertex").alias("b"),
                    F.lit(1).alias("tag"),
                )
            )
            cur = shrunk
            n_edges = n_after
            trim_hops += 1

        color_hops = reach_hops = 0
        if n_edges:
            verts = vertices(cur)
            colors, color_hops = _fixpoint_colors(cur, verts, max_hops)
            bwd = _pin(cur.repartition(n_parts, "dst"))
            done, reach_hops = _backward_reach(bwd, colors, max_hops)
            new_rows.append(
                done.select(
                    F.col("vertex").alias("a"),
                    F.col("color").alias("b"),
                    F.lit(1).alias("tag"),
                )
            )
            gone = done.select("vertex")
            survivors = cur.join(
                gone.select(F.col("vertex").alias("src")), "src", "left_anti"
            ).join(gone.select(F.col("vertex").alias("dst")), "dst", "left_anti")
            # vertices whose every edge died with the settled SCCs are
            # singletons in the remaining subgraph (SCC removal never
            # splits another component)
            lonely = (
                verts.join(gone, "vertex", "left_anti")
                .join(vertices(survivors), "vertex", "left_anti")
            )
            new_rows.append(
                lonely.select(
                    F.col("vertex").alias("a"),
                    F.col("vertex").alias("b"),
                    F.lit(1).alias("tag"),
                )
            )
            new_rows.append(
                survivors.select("src", "dst").select(
                    F.col("src").alias("a"),
                    F.col("dst").alias("b"),
                    F.lit(0).alias("tag"),
                )
            )

        out = settled.select("a", "b", "tag")
        for df in new_rows:
            out = out.unionByName(df)
        return out, {
            "trim_hops": trim_hops,
            "color_hops": color_hops,
            "reach_hops": reach_hops,
            "edges_entering_round": n_edges,
        }

    runner = SuperstepRunner(
        spark,
        name="scc",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_rounds,
    )
    return runner.run(init, step, stop_when_stable=True, resume=resume)
