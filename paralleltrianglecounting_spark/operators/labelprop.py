"""Synchronous label propagation (north-star extension).

Semantics (fixed, deterministic, oracle-checked): every vertex starts
labeled with its own id; each superstep every vertex simultaneously
adopts the most frequent label among its neighbors, ties broken by the
smallest label. Synchronous + deterministic tie-break makes the
trajectory a pure function of the edge set — reproducible across
partitionings and unrollable to SQL for the DuckDB gate. (Classic
async LPA is run-order dependent; an engine whose results change
between runs can't be correctness-gated, so the synchronous variant is
the contract here. Bipartite-ish structures may oscillate rather than
converge — the iteration cap is part of the semantics.)

Plan per superstep: labels ⋈ the cached bidirected topology (persisted
ALREADY HASH-PARTITIONED on src, so the |E|-row edge side never
re-exchanges — only the |V|-row label state moves; same rationale as
``operators/pagerank.py``) → count by (vertex, label) → argmax via
``max(struct(cnt, -label))`` (greatest frequency, ties -> smallest
label — exactly the contract's tie-break), NO window function, no
single-partition sort. Both aggregates are whole-stage-codegen hash
aggs over UnsafeRows; the 2|E|-row message stream partial-combines
map-side before its one big exchange, and the second agg moves only
the counted (≤ |V|·distinct-labels)-row table. (r02 fused these into
one deterministic ``mode()`` — fewer exchanges on paper, but its
partial state is the same label→count map in boxed-object form, and
the interpreted ObjectHashAggregate measured 3× slower with bimodal
GC stalls at 38 M messages; see R3_NOTES.md.)

``detect_stability=False`` (the fixed-iteration contract, e.g. the
driver gate's exact-3-superstep oracle) skips the per-superstep
fingerprint job entirely: the synchronous step function is idempotent
at a fixpoint, so running the remaining iterations on a stabilized
labeling returns the identical table — the check is purely an
early-exit optimization, never a semantics change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.degrees import vertices
from paralleltrianglecounting_spark.plans.superstep import SuperstepResult, SuperstepRunner
from paralleltrianglecounting_spark.sources.edges import bidirected


def label_propagation(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    detect_stability: bool = True,
) -> DataFrame:
    """[vertex, label] after ``iterations`` synchronous supersteps (or
    earlier if the labeling stabilizes and ``detect_stability`` is on)."""
    return label_propagation_run(
        edges, iterations, checkpoint_dir, resume, detect_stability
    ).state


def label_propagation_run(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    detect_stability: bool = True,
) -> SuperstepResult:
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = bidirected(edges).repartition(n_parts, "src").persist()
    n_msgs = adj.count()
    init = vertices(edges).select("vertex", F.col("vertex").alias("label"))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        neighbor_labels = adj.join(
            state.withColumnRenamed("vertex", "src"), "src"
        ).select(F.col("dst").alias("vertex"), "label")
        # argmax(count), ties -> min(label), as TWO codegen'd hash
        # aggregations. The r02 single-agg deterministic mode() moved no
        # less data (its partial state IS the per-key label→count map,
        # the same bytes the count-by-pair partial combine ships) but
        # ran as an interpreted ObjectHashAggregate building a boxed
        # counter map per vertex — measured 3× slower and bimodally
        # GC-bound at 38 M messages. count()+max(struct) stay inside
        # whole-stage codegen on UnsafeRows: the (vertex,label) count
        # partial-combines map-side (≤ |V|·labels rows move), and the
        # argmax shuffles only the already-small counted table.
        # max(struct(cnt, -label)) is exactly "greatest frequency, ties
        # → smallest label" (verified value-identical to mode() and the
        # unrolled-SQL oracle).
        counted = neighbor_labels.groupBy("vertex", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        new_labels = counted.groupBy("vertex").agg(
            (-F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))["nl"]).alias(
                "label"
            )
        )
        return new_labels, {"messages_sent": n_msgs}

    runner = SuperstepRunner(
        spark,
        name="label_propagation",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
    )
    result = runner.run(init, step, stop_when_stable=detect_stability, resume=resume)
    adj.unpersist()
    return result


def community_modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """[modularity_r] — Newman modularity Q of a vertex partition over
    the undirected graph: Q = Σ_c (e_c/m − (d_c/2m)²) with m = |E|,
    e_c = intra-community edge count, d_c = total degree of community c.
    The standard objective for judging LPA/community output quality.

    Plan: two label lookups on the canonical edge table (same-label
    filter → one small hash agg per community), one degree⋈label agg,
    then a single-row combine — everything past the label join is
    O(#communities). ``labels``: [vertex, label] (e.g. the output of
    ``label_propagation``)."""
    from paralleltrianglecounting_spark.operators.degrees import degrees

    lu = labels.select(F.col("vertex").alias("src"), F.col("label").alias("_lu"))
    lv = labels.select(F.col("vertex").alias("dst"), F.col("label").alias("_lv"))
    m = edges.count()
    if m == 0:
        spark = edges.sparkSession
        return spark.createDataFrame([(0.0,)], "modularity_r double")
    intra = (
        edges.join(lu, "src")
        .join(lv, "dst")
        .where(F.col("_lu") == F.col("_lv"))
        .groupBy(F.col("_lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    deg_c = (
        degrees(edges)
        .join(labels, "vertex")
        .groupBy("label")
        .agg(F.sum("degree").alias("d_c"))
    )
    per_c = deg_c.join(intra, "label", "left").select(
        (
            F.coalesce(F.col("e_c"), F.lit(0)).cast("double") / F.lit(float(m))
            - (F.col("d_c").cast("double") / F.lit(2.0 * m)) ** 2
        ).alias("q_c")
    )
    return per_c.agg(F.round(F.sum("q_c"), 6).alias("modularity_r"))


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    detect_stability: bool = True,
) -> DataFrame:
    """[vertex, label] — semi-supervised label propagation: ``seeds``
    ([vertex, label]) are clamped every superstep; every other vertex
    simultaneously adopts the most frequent label among its *labeled*
    neighbors (ties -> smallest label), starting unlabeled. Vertices no
    label wave has reached yet are omitted from the output (the labeled
    frontier grows one hop per superstep), so the result is the
    seed-community assignment of everything within ``iterations`` hops
    of a seed — the classic seed-expansion community/classification
    primitive (Zhu–Ghahramani label spreading, majority-vote form).

    Same synchronous-deterministic contract, plan shape (one join
    against the pre-partitioned bidirected topology + two codegen hash
    aggs per superstep), and superstep runner (lineage truncation /
    checkpoint / resume) as ``label_propagation``; the only extra work
    is the |seeds|-row clamp join.
    """
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = bidirected(edges).repartition(n_parts, "src").persist()
    n_msgs = adj.count()
    verts = vertices(edges)
    s = seeds.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("label").cast("long").alias("slabel"),
    )
    init = verts.join(s, "vertex", "left").select(
        "vertex", F.col("slabel").alias("label")
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        labeled = state.where(F.col("label").isNotNull()).withColumnRenamed(
            "vertex", "src"
        )
        neighbor_labels = adj.join(labeled, "src").select(
            F.col("dst").alias("vertex"), "label"
        )
        counted = neighbor_labels.groupBy("vertex", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        cand = counted.groupBy("vertex").agg(
            (-F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))["nl"]).alias(
                "clabel"
            )
        )
        new = (
            verts.join(s, "vertex", "left")
            .join(cand, "vertex", "left")
            .select(
                "vertex",
                F.coalesce(F.col("slabel"), F.col("clabel")).alias("label"),
            )
        )
        return new, {"messages_sent": n_msgs}

    runner = SuperstepRunner(
        spark,
        name="seeded_label_propagation",
        checkpoint_dir=checkpoint_dir,
        max_iterations=iterations,
    )
    result = runner.run(init, step, stop_when_stable=detect_stability, resume=resume)
    adj.unpersist()
    return result.state.where(F.col("label").isNotNull())
