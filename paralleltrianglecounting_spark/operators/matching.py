"""Maximal matching — deterministic locally-dominant edge selection.

The classic distributed matching scheme (Israeli–Itai 1986 family;
"local dominance": an edge joins the matching iff it is the best-ranked
live edge at BOTH endpoints). Ranking by a per-edge hash makes the run
deterministic at any parallelism — the same move as the engine's
DOULION sampling and dataset splits — and behaves like the random
ranks the O(log n)-round analyses assume. The result is a *maximal*
matching (no augmenting single edge exists), the standard building
block for graph coarsening / multilevel partitioning in large-graph
pipelines; it 2-approximates maximum matching.

State (one superstep-runner DataFrame, so lineage truncation /
checkpoint / resume / per-partition lineage metrics come from the same
machinery as pagerank and k-core): ``[src, dst, w, mround]`` with
``mround = 0`` for live edges and ``mround = r > 0`` for edges matched
in round r. One round =

1. incidence view (2·|live| rows): each live edge under both
   endpoints, carrying its rank ``(w, src, dst)`` (hash first,
   endpoints break hash ties — a strict total order);
2. per-vertex argmin: ONE codegen hash agg ``min(struct(w, src,
   dst))`` — no window;
3. an edge is matched iff both endpoints picked it: two equi-joins of
   the live set against the |V|-row pick table;
4. drop every edge incident to a matched vertex: two left-anti joins
   against the matched-vertex set.

Progress guarantee: the globally minimum-ranked live edge is picked by
both its endpoints every round, so each round matches at least one
edge and the loop terminates; with hash ranks the expected round count
is O(log |E|). A round over a live-empty state is a no-op, so the
runner's exact fingerprint check detects the fixpoint — and the same
idempotence is what lets the DuckDB gate unroll a fixed generous round
count with a loud empty-result-if-unconverged guard and still match
the run-to-fixpoint engine exactly.

Scale shape at 100 TB: every step is an equi-join or hash agg on
vertex keys; nothing is broadcast that scales with the graph (AQE
broadcasts the pick/matched-vertex tables only while they measure
small); the live set only shrinks; lineage is truncated every
superstep. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.plans.superstep import (
    SuperstepResult,
    SuperstepRunner,
)

__all__ = ["coarsen_graph", "maximal_matching", "maximal_matching_run"]


def _edge_rank(src, dst):
    """Engine-portable 56-bit edge hash (same md5-prefix trick as the
    DOULION sampler / hash splits — DuckDB computes the identical
    value)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(src.cast("string"), F.lit(":"), dst.cast("string"))
            ),
            1,
            14,
        ),
        16,
        10,
    ).cast("long")


def maximal_matching(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 64,
    resume: bool = True,
) -> DataFrame:
    """[src, dst, mround] — a deterministic maximal matching of the
    undirected simple graph: no vertex appears twice, and every
    non-matched edge has a matched endpoint. ``mround`` records the
    round each edge was selected (audit/coarsening-level handle).

    Raises ``RuntimeError`` if ``max_rounds`` is hit with live edges
    remaining (loud, never a silently partial matching).
    """
    res = maximal_matching_run(edges, checkpoint_dir, max_rounds, resume)
    if not res.converged:
        raise RuntimeError(
            f"maximal_matching did not converge in {res.iterations} rounds"
        )
    return res.state.where(F.col("mround") > 0).select("src", "dst", "mround")


def vertex_cover(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 64,
    resume: bool = True,
) -> DataFrame:
    """[vertex] — a 2-approximate minimum vertex cover: the endpoints
    of the deterministic maximal matching (Gavril/Yannakakis — every
    edge has a matched endpoint by maximality, and any cover must take
    ≥1 endpoint per matched edge, so |cover| ≤ 2·OPT). Inherits the
    matching's determinism at any parallelism and its checkpoint/resume;
    the marginal cost over the matching is one projection + distinct."""
    m = maximal_matching(edges, checkpoint_dir, max_rounds, resume)
    return (
        m.select(F.col("src").alias("vertex"))
        .unionByName(m.select(F.col("dst").alias("vertex")))
        .distinct()
    )


def maximal_matching_run(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_rounds: int = 64,
    resume: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    init = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .select(
            "src",
            "dst",
            _edge_rank(F.col("src"), F.col("dst")).alias("w"),
            F.lit(0).cast("int").alias("mround"),
        )
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        live = state.where(F.col("mround") == 0)
        done = state.where(F.col("mround") > 0)
        inc = live.select(F.col("src").alias("v"), "w", "src", "dst").unionByName(
            live.select(F.col("dst").alias("v"), "w", "src", "dst")
        )
        pick = (
            inc.groupBy("v")
            .agg(F.min(F.struct("w", "src", "dst")).alias("b"))
            .select(
                "v",
                F.col("b.src").alias("psrc"),
                F.col("b.dst").alias("pdst"),
            )
        )
        ps = pick.select(
            F.col("v").alias("sv"),
            F.col("psrc").alias("ssrc"),
            F.col("pdst").alias("sdst"),
        )
        pd_ = pick.select(
            F.col("v").alias("dv"),
            F.col("psrc").alias("dsrc"),
            F.col("pdst").alias("ddst"),
        )
        m = (
            live.join(
                ps,
                (F.col("sv") == F.col("src"))
                & (F.col("ssrc") == F.col("src"))
                & (F.col("sdst") == F.col("dst")),
            )
            .join(
                pd_,
                (F.col("dv") == F.col("dst"))
                & (F.col("dsrc") == F.col("src"))
                & (F.col("ddst") == F.col("dst")),
            )
            .select("src", "dst", "w", F.lit(i + 1).cast("int").alias("mround"))
        )
        mverts = m.select(F.col("src").alias("mv")).unionByName(
            m.select(F.col("dst").alias("mv"))
        )
        surv = live.join(mverts, live["src"] == mverts["mv"], "left_anti").join(
            mverts, live["dst"] == mverts["mv"], "left_anti"
        )
        # bound the union's partition growth (see operators/mis.py) —
        # the checkpointed state otherwise gains its branches' partition
        # counts every round and late rounds pay empty-task scheduling
        new_state = done.unionByName(m).unionByName(surv).coalesce(n_parts)
        return new_state, {"round": i + 1}

    runner = SuperstepRunner(
        spark, "maximal_matching", checkpoint_dir, max_iterations=max_rounds
    )
    return runner.run(init, step, resume=resume)


def coarsen_graph(
    edges: DataFrame,
    matching: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """[src, dst, weight] — one level of matching contraction, the
    multilevel-partitioning / graph-coarsening primitive (Karypis &
    Kumar's METIS scheme, heavy-edge matching replaced by the
    deterministic hash-ranked matching): each matched pair collapses
    onto its lower endpoint, every parent edge re-keys through the
    representative map, self-loops (contracted pairs) drop, and
    parallel edges merge with an exact multiplicity ``weight``. The
    output is again a canonical weighted edge table — iterable, and
    directly consumable by ``weighted_pagerank``/``sssp``.

    A maximal matching contracts ≥ the matched-vertex half of every
    dense region, so levels shrink geometrically on real graphs.

    Plan shape: the matching (supersteps above) + two left equi-joins
    against the |matched|-row map + one hash agg. Nothing new moves at
    100 TB beyond one extra pass over the edge table.
    """
    base = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    m = (
        matching
        if matching is not None
        else maximal_matching(edges, checkpoint_dir=checkpoint_dir)
    )
    # canonical matched pairs have src < dst: dst re-keys onto src
    map_t = m.select(F.col("dst").alias("vertex"), F.col("src").alias("rep"))
    ms = map_t.select(F.col("vertex").alias("sv"), F.col("rep").alias("srep"))
    md = map_t.select(F.col("vertex").alias("dv"), F.col("rep").alias("drep"))
    remapped = (
        base.join(ms, base["src"] == ms["sv"], "left")
        .join(md, base["dst"] == md["dv"], "left")
        .select(
            F.coalesce(F.col("srep"), F.col("src")).alias("s"),
            F.coalesce(F.col("drep"), F.col("dst")).alias("d"),
        )
    )
    return (
        remapped.where(F.col("s") != F.col("d"))
        .select(
            F.least("s", "d").alias("src"), F.greatest("s", "d").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
