"""Betweenness centrality — k-source, depth-bounded Brandes.

Exact betweenness is one SSSP + dependency accumulation per vertex
(Brandes 2001) — quadratic at web scale. The published scale path is
*source sampling* (Brandes & Pich 2007: pivots approximate the full sum
within tight error) plus a *depth bound* (k-bounded betweenness): this
operator computes the exact Brandes dependency sums restricted to a
deterministic source set and BFS DAGs truncated at ``max_depth``.

Both phases are synchronous level supersteps over DataFrames:

- **forward** (per level): frontier ⋈ bidirected edges → new frontier,
  ``sigma = SUM(sigma of predecessors)`` per (source, vertex), settled
  vertices excluded by a left-anti join — the multi-source BFS plan
  shape (bfs.py) carrying a path-count aggregate;
- **backward** (per level, deepest first): level_d ⋈ edges ⋈ level_{d+1}
  with ``contrib = sigma_v / sigma_w * (1 + delta_w)``, summed per
  (source, vertex) — one equi-join pair and one hash agg per level.

Scale shape at 100 TB: state is O(k·|V|) rows for k sources (never
|V|²); every join is an equi-join on vertex keys against the one
persisted hash-partitioned edge table (exchange reused across all
2·max_depth supersteps); per-level frontiers are persisted because the
backward pass re-reads each one (they stay cached until the caller's
action completes — a long pipeline should checkpoint + unpersist per
wave via the superstep runner). Undirected double-counting convention: each ordered
pair contributes once per direction (the raw Brandes sum; halve
downstream if the 1/2-normalized variant is wanted — documented rather
than hidden in the rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.sources.edges import bidirected

__all__ = ["betweenness", "closeness_centrality", "harmonic_centrality"]


def _forward_levels(
    bidir: DataFrame, sources: DataFrame, max_depth: int
) -> list[DataFrame]:
    """Per-level multi-source BFS frontiers carrying path counts:
    ``levels[d]`` = [s, v, sigma] for vertices first reached at depth
    ``d`` from source ``s``. Level 0 is the sources themselves. Each
    frontier is persisted (callers re-read them) — one frontier join +
    one left-anti settled check + one sigma hash agg per level."""
    level0 = sources.select(
        F.col("vertex").alias("s"),
        F.col("vertex").alias("v"),
        F.lit(1).cast("long").alias("sigma"),
    ).persist()
    levels = [level0]
    settled = level0.select("s", "v")
    for _ in range(max_depth):
        frontier = (
            levels[-1]
            .join(bidir, levels[-1]["v"] == bidir["src"])
            .select("s", F.col("dst").alias("v"), "sigma")
            .join(settled, ["s", "v"], "left_anti")
            .groupBy("s", "v")
            .agg(F.sum("sigma").alias("sigma"))
            .persist()
        )
        levels.append(frontier)
        settled = settled.unionByName(frontier.select("s", "v"))
    return levels


def harmonic_centrality(
    edges: DataFrame,
    n_sources: int = 4,
    max_depth: int = 3,
) -> DataFrame:
    """[vertex, harmonic_r]: pivot-based harmonic centrality —
    ``Σ_{pivots s ≠ v reaching v within max_depth} 1/dist(s, v)``,
    rounded to 6 dp, pivots = the ``n_sources`` smallest non-isolated
    vertex ids (Boldi–Vigna's axiomatically-preferred closeness
    variant; the pivot-sample + radius bound is the same published
    scale move as betweenness'). Every non-isolated vertex gets a row
    (0.0 when no pivot reaches it).

    Reuses the betweenness forward supersteps (the level index IS the
    distance); cost is the forward phase alone — no backward pass.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bidir = bidirected(edges).repartition(n_part, "src").persist()
    verts = bidir.select(F.col("src").alias("vertex")).distinct()
    sources = verts.orderBy("vertex").limit(n_sources)
    levels = _forward_levels(bidir, sources, max_depth)

    acc = None
    for d, lvl in enumerate(levels[1:], start=1):
        part = lvl.select("v", (F.lit(1.0) / d).alias("inv_d"))
        acc = part if acc is None else acc.unionByName(part)
    summed = acc.groupBy("v").agg(F.sum("inv_d").alias("h"))
    return (
        verts.join(summed, verts["vertex"] == summed["v"], "left")
        .select(
            "vertex",
            F.round(F.coalesce(F.col("h"), F.lit(0.0)), 6).alias("harmonic_r"),
        )
    )


def closeness_centrality(
    edges: DataFrame,
    n_sources: int = 4,
    max_depth: int = 3,
) -> DataFrame:
    """[vertex, n_reached, sum_dist, closeness_r]: pivot-based
    depth-bounded closeness — over the pivots ``s ≠ v`` that reach
    ``v`` within ``max_depth``, ``n_reached / Σ dist(s, v)`` (0.0 when
    no pivot reaches ``v``), rounded to 6 dp, pivots = the
    ``n_sources`` smallest non-isolated vertex ids. Dividing by the
    per-vertex reach count (not a global n-1) is the standard
    pivot-sample correction — otherwise fringe vertices reached by few
    pivots would be spuriously penalized. The exact integer
    ``n_reached`` / ``sum_dist`` columns are carried alongside so the
    ratio is auditable.

    Shares the betweenness/harmonic forward supersteps (the level
    index IS the distance); cost is the forward phase alone.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bidir = bidirected(edges).repartition(n_part, "src").persist()
    verts = bidir.select(F.col("src").alias("vertex")).distinct()
    sources = verts.orderBy("vertex").limit(n_sources)
    levels = _forward_levels(bidir, sources, max_depth)

    acc = None
    for d, lvl in enumerate(levels[1:], start=1):
        part = lvl.select("v", F.lit(d).cast("long").alias("d"))
        acc = part if acc is None else acc.unionByName(part)
    summed = acc.groupBy("v").agg(
        F.count("d").alias("n"), F.sum("d").alias("sd")
    )
    return (
        verts.join(summed, verts["vertex"] == summed["v"], "left")
        .select(
            "vertex",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_reached"),
            F.coalesce(F.col("sd"), F.lit(0)).cast("long").alias("sum_dist"),
            F.round(
                F.coalesce(
                    F.col("n").cast("double") / F.col("sd"), F.lit(0.0)
                ),
                6,
            ).alias("closeness_r"),
        )
    )


def betweenness(
    edges: DataFrame,
    n_sources: int = 4,
    max_depth: int = 3,
) -> DataFrame:
    """[vertex, bc_r]: depth-bounded Brandes dependency sums from the
    ``n_sources`` smallest non-isolated vertex ids (deterministic pivot
    set), rounded to 6 dp. Every non-isolated vertex gets a row
    (0.0 when it lies on no counted shortest path). Sources themselves
    accumulate dependencies from *other* sources' DAGs but never from
    their own (Brandes excludes the source endpoint).
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bidir = bidirected(edges).repartition(n_part, "src").persist()
    verts = bidir.select(F.col("src").alias("vertex")).distinct()
    sources = verts.orderBy("vertex").limit(n_sources)

    # ---- forward: per-level frontiers with path counts -------------
    levels = _forward_levels(bidir, sources, max_depth)

    # ---- backward: dependency accumulation, deepest level first ----
    deltas = [
        levels[-1].select("s", "v", "sigma", F.lit(0.0).alias("delta"))
    ]
    for d in range(max_depth - 1, 0, -1):
        succ = deltas[-1].select(
            F.col("s").alias("ws"),
            F.col("v").alias("w"),
            F.col("sigma").alias("w_sigma"),
            F.col("delta").alias("w_delta"),
        )
        cur = (
            levels[d]
            .join(bidir, levels[d]["v"] == bidir["src"], "left")
            .join(
                succ,
                (F.col("s") == F.col("ws")) & (F.col("dst") == F.col("w")),
                "left",
            )
            .groupBy("s", "v", "sigma")
            .agg(
                F.coalesce(
                    F.sum(
                        F.col("sigma")
                        / F.col("w_sigma")
                        * (F.lit(1.0) + F.col("w_delta"))
                    ),
                    F.lit(0.0),
                ).alias("delta")
            )
            .persist()
        )
        deltas.append(cur)

    acc = deltas[0]
    for d in deltas[1:]:
        acc = acc.unionByName(d)
    bc = acc.groupBy("v").agg(F.sum("delta").alias("bc"))
    out = (
        verts.join(bc, verts["vertex"] == bc["v"], "left")
        .select("vertex", F.round(F.coalesce(F.col("bc"), F.lit(0.0)), 6).alias("bc_r"))
    )
    return out
