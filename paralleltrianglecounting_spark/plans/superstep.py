"""Checkpointed superstep runner for iterative graph algorithms.

The reference's moral ancestor is its chunked-kernel-launch pattern
(``cuda_edge_it/cuda_edge_it_v1_1.cu:236-262`` — bounded, restartable
work units); Spark adds two problems the reference never had:

1. **Lineage blow-up** — each PageRank/CC/LPA iteration stacks a join+agg
   onto the logical plan; after ~20 iterations analysis time dominates
   and failure recovery replays everything. Catalyst re-optimizes per
   iteration but cannot cut lineage. The runner truncates it every
   superstep: parquet round-trip when a checkpoint dir is given (also
   the resume point), ``localCheckpoint`` otherwise.
2. **Resumability** (north_rule) — any run must be restartable
   mid-iteration. Each superstep atomically persists state + a manifest
   (iteration number, row count, per-partition lineage, algorithm
   metrics like edges scanned / messages sent). ``run(resume=True)``
   scans for the latest complete superstep and continues from it; a
   killed run loses at most the in-flight iteration.

State contract: a superstep is a pure function
``step(state_df, i) -> (new_state_df, metrics_dict)`` — no mutable
driver state, so re-running iteration k from its checkpoint yields a
bit-identical trajectory (everything downstream is deterministic
DataFrame code).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def local_pin(df: DataFrame) -> DataFrame:
    """Materialize + cache + cut lineage + REPLACE PLAN STATISTICS with
    the measured size — the in-memory superstep truncation primitive.

    ``localCheckpoint`` alone is not enough: Spark's
    ``LogicalRDD.fromDataset`` carries the ORIGIN plan's ESTIMATED
    ``sizeInBytes`` into the checkpointed leaf, and the basic
    size-only join estimator MULTIPLIES the two sides' byte sizes. An
    iterative step that references its state twice (k-truss's two
    partner-θ joins) therefore SQUARES the leaf statistic every round
    — the digit count of the BigInteger doubles per round, and by
    round ~20 Catalyst spends minutes per round multiplying
    million-digit numbers inside plan estimation (measured on k-truss
    at sf0.01: 1 s → 358 s/round on a CONSTANT 1.2 M-row per-round
    plan, 482 s total; jstack shows the driver pinned in
    ``BigInteger.multiplyToomCook3``; 55 s total after this fix).

    Because the checkpoint is EAGER, the truth is available: the
    materialized blocks' byte size from the block manager. The leaf is
    rebuilt with that MEASURED ``sizeInBytes`` — every round starts
    from ground truth, so within-round estimates stay sane, genuinely
    small states keep auto-broadcasting (the CC/LPA fixture plans pin
    BroadcastHashJoin shapes that a stats-strip would degrade to
    SortMergeJoin), and nothing compounds across rounds. If any of the
    reflective surface is missing, falls back to the plain checkpoint
    (correct, just stats-poisoned) rather than failing the run.
    """
    ck = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    try:
        jvm = spark._jvm
        plan = ck._jdf.queryExecution().analyzed()
        rid = plan.rdd().id()
        size = 0
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
            if info.id() == rid:
                size = int(info.memSize()) + int(info.diskSize())
        if size <= 0:
            # blocks not visible (evicted/raced): conservative default
            stats_opt = jvm.scala.Option.empty()
        else:
            # py4j auto-converts any scala.math.BigInt crossing the
            # bridge into a Python int, so Statistics(sizeInBytes=...)
            # can never be constructed from Python directly (the ctor
            # then sees java.lang.Integer and py4j finds no overload).
            # Instead BORROW a genuine Statistics from a plan-only
            # Range(ceil(size/8)) node, whose computeStats is exactly
            # sizeInBytes = 8 * numElements — within 7 bytes of the
            # measured truth. Its rowCount=Some(size/8) is approximate
            # but inert: the default size-only estimator
            # (spark.sql.cbo.enabled=false) reads sizeInBytes alone.
            k = (size + 7) // 8
            stats = (
                spark.range(k)._jdf.queryExecution().optimizedPlan().stats()
            )
            stats_opt = jvm.scala.Option.apply(stats)
        fresh = plan.copy(
            plan.output(),
            plan.rdd(),
            plan.outputPartitioning(),
            plan.outputOrdering(),
            plan.isStreaming(),
            plan.stream(),
            spark._jsparkSession,
            stats_opt,
            jvm.scala.Option.empty(),
        )
        new_jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, fresh
        )
        return DataFrame(new_jdf, spark)
    except Exception:
        return ck


def release_pinned(df: DataFrame) -> None:
    """Free the cached blocks behind a ``local_pin``/``localCheckpoint``
    state the moment the NEXT superstep has been eagerly materialized.

    ``df.unpersist()`` goes through the SQL cache manager and does not
    touch the RDD blocks backing a LogicalRDD leaf; this reaches the
    leaf's RDD directly. Best-effort: a frame that is not a pinned leaf
    (parquet-backed state, the raw init frame) simply has no ``rdd()``
    and is left alone — correctness never depends on the release, only
    peak storage does."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _state_fingerprint(df: DataFrame) -> tuple[int, int]:
    """(row_count, order-insensitive content hash) — the cheap exact-ish
    convergence check: one aggregate, no join. xxhash64 over all columns,
    summed; a change that preserves both count and sum is a 2^-64 event."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: summing raw int64 hashes overflows under
        # ANSI mode (Spark 4 default); decimal(38,0) never will
        F.coalesce(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def table_identity(df: DataFrame, *cols: str, tag: str = "table") -> str:
    """Fingerprint identity string for a run's INPUT table (count +
    order-insensitive xxhash64 sum over ``cols``) — what algorithms whose
    init state is input-independent (or only partly input-dependent, like
    BFS whose init is the seed set alone) must pass as
    ``SuperstepRunner(identity=...)`` so a resume against a different
    graph's checkpoint_dir is refused (ADVICE r03 #1). One aggregate job,
    paid only on checkpointed runs."""
    cs = list(cols) or df.columns
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(*cs).cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return f"{tag}:{int(row['n'])}:{int(row['h'])}"


def _partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counts — the 'per-partition lineage' recorded in
    every superstep manifest (which partition contributed how many state
    rows; skew in this list is the first thing to read when an iteration
    slows down)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    return sorted(
        ({"partition": int(r["partition"]), "rows": int(r["rows"])} for r in rows),
        key=lambda d: d["partition"],
    )


class SuperstepRunner:
    def __init__(
        self,
        spark: SparkSession,
        name: str,
        checkpoint_dir: str | None = None,
        max_iterations: int = 30,
        record_lineage: bool = True,
        identity: str | None = None,
    ) -> None:
        """``identity``: a caller-supplied token naming the input this
        run iterates over (e.g. a fingerprint of the edge table). It is
        stamped into every manifest, and ``run(resume=True)`` REFUSES to
        continue from checkpoints stamped with a different identity —
        resuming pagerank over graph B from graph A's iter_* dirs would
        silently produce nonsense otherwise (VERDICT r02 #9). When not
        supplied, run() derives one from the init state's fingerprint
        (count + content hash + schema), which catches any graph switch
        whose init state differs; algorithms whose init state is
        input-independent (e.g. an empty metrics table) must pass an
        explicit identity."""
        self.spark = spark
        self.name = name
        self.dir = os.path.join(checkpoint_dir, name) if checkpoint_dir else None
        self.max_iterations = max_iterations
        self.record_lineage = record_lineage
        self.identity = identity

    # -- checkpoint layout: {dir}/iter_00003/state/*.parquet + manifest.json
    def _iter_dir(self, i: int) -> str:
        assert self.dir is not None
        return os.path.join(self.dir, f"iter_{i:05d}")

    def _manifest(self, i: int) -> dict:
        with open(os.path.join(self._iter_dir(i), "manifest.json")) as f:
            return json.load(f)

    def _complete_iterations(self) -> list[int]:
        if not self.dir or not os.path.isdir(self.dir):
            return []
        out = []
        for d in sorted(os.listdir(self.dir)):
            if d.startswith("iter_") and os.path.exists(
                os.path.join(self.dir, d, "manifest.json")
            ):
                out.append(int(d.split("_")[1]))
        return out

    def _checkpoint(self, df: DataFrame, i: int, metrics: dict) -> DataFrame:
        # record how many runtime shuffles this superstep PLANS
        # (ENSURE_REQUIREMENTS exchanges in the pre-execution plan;
        # cache-build REPARTITION shuffles excluded). This is an upper
        # bound on what physically runs: AQE re-optimization can only
        # REMOVE exchanges at runtime (e.g. SMJ→broadcast), never add
        # one — so a topology re-exchange regression always shows up
        # here the moment it is introduced
        from paralleltrianglecounting_spark.plans.lint import count_ensure_exchanges

        try:
            metrics["shuffle_exchanges"] = count_ensure_exchanges(df)
        except Exception:  # plan stringification must never fail a run
            pass
        if self.dir is None:
            # in-memory truncation only (tests / ad-hoc): cuts lineage,
            # not resumable across driver restarts.
            #
            # Deliberately EAGER even though a convergence probe follows
            # in the same superstep. The fused alternative (eager=False,
            # letting the probe's action compute + persist the state in
            # one job) was measured both ways: it wins 2.4x when rounds
            # are many and per-round data is small (cc at sf0.01 — the
            # per-job driver round-trip dominates), but loses ~30%
            # consistently on data-heavy rounds (cc on the 9.6 M-edge
            # replicated graph at 2 cores: 66-72 s eager vs 90-94 s
            # fused, interleaved fresh-JVM A/B) — and data-heavy is the
            # regime that models production data-per-core. Two cheap
            # jobs that each do one thing beat one job that computes,
            # caches, and aggregates in the same task.
            #
            # local_pin, not bare localCheckpoint: the checkpointed
            # leaf must not inherit the round's estimated sizeInBytes
            # or multi-reference steps square it every round (see
            # local_pin's docstring for the measured blowup).
            return local_pin(df)
        it_dir = self._iter_dir(i)
        state_dir = os.path.join(it_dir, "state")
        tmp = state_dir + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        reloaded_tmp = self.spark.read.parquet(tmp)
        manifest = {
            "algorithm": self.name,
            "iteration": i,
            "rows": reloaded_tmp.count(),
            "wall_time": time.time(),
            "metrics": metrics,
            "identity": self.identity,
        }
        if self.record_lineage:
            manifest["partitions"] = _partition_lineage(reloaded_tmp)
        # atomic publish: state dir rename, then manifest write marks done
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp, state_dir)
        with open(os.path.join(it_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return self.spark.read.parquet(state_dir)

    def run(
        self,
        init_state: DataFrame,
        step: Callable[[DataFrame, int], tuple[DataFrame, dict]],
        max_iterations: int | None = None,
        stop_when_stable: bool = True,
        resume: bool = True,
        stop_when: Callable[[DataFrame, DataFrame], bool] | None = None,
        release_prev: bool = False,
    ) -> SuperstepResult:
        """Iterate ``step`` from ``init_state`` (or the latest complete
        checkpoint when resuming) until the state fingerprint stabilizes
        or the iteration cap is hit.

        ``stop_when(prev_state, new_state) -> bool`` is an optional
        numeric convergence predicate evaluated after each superstep
        (e.g. PageRank's max-|Δrank| < tol); when it returns True the
        run stops converged. It composes with, and is checked before,
        the exact fingerprint check.

        ``release_prev``: free the previous superstep's pinned blocks as
        soon as the new state is materialized and the convergence
        predicates have read both. With in-memory truncation this bounds
        live cached state at <=2 supersteps regardless of iteration
        count (the betweenness per-level-frontier requirement); it is a
        no-op for parquet-checkpointed runs. Leave False for algorithms
        whose returned result still references intermediate states."""
        max_iterations = max_iterations or self.max_iterations
        metrics: list[dict] = []
        start_iter = 0
        state = init_state

        if self.dir and self.identity is None:
            # derive the run identity from the init state: one cheap
            # aggregate, only paid on checkpointed runs
            n, h = _state_fingerprint(init_state)
            self.identity = f"init:{n}:{h}:{','.join(init_state.columns)}"

        if resume and self.dir:
            done = self._complete_iterations()
            if done:
                stamped = self._manifest(done[0]).get("identity")
                if stamped is not None and stamped != self.identity:
                    raise ValueError(
                        f"refusing to resume '{self.name}' from {self.dir}: "
                        f"checkpoints are stamped identity={stamped!r} but this "
                        f"run's input has identity={self.identity!r} — these "
                        "are a different graph's checkpoints. Use a fresh "
                        "checkpoint_dir or resume=False."
                    )
            if done:
                last = done[-1]
                state = self.spark.read.parquet(
                    os.path.join(self._iter_dir(last), "state")
                )
                for i in done:
                    with open(os.path.join(self._iter_dir(i), "manifest.json")) as f:
                        metrics.append(json.load(f))
                start_iter = last + 1

        prev_fp = _state_fingerprint(state) if stop_when_stable else None
        converged = False
        i = start_iter
        while i < max_iterations:
            new_state, step_metrics = step(state, i)
            prev_state = state
            state = self._checkpoint(new_state, i, step_metrics)
            manifest = {"iteration": i, "metrics": step_metrics}
            stopped = stop_when is not None and stop_when(prev_state, state)
            if release_prev and prev_state is not init_state:
                # state is already eagerly materialized and stop_when has
                # read prev_state — its blocks are dead weight from here
                release_pinned(prev_state)
            if stopped:
                converged = True
                metrics.append(manifest if self.dir is None else self._manifest(i))
                i += 1
                break
            if stop_when_stable:
                fp = _state_fingerprint(state)
                manifest["rows"] = fp[0]  # reuse the convergence count
                if fp == prev_fp:
                    converged = True
                    metrics.append(manifest if self.dir is None else self._manifest(i))
                    i += 1
                    break
                prev_fp = fp
            metrics.append(manifest if self.dir is None else self._manifest(i))
            i += 1
        return SuperstepResult(state=state, iterations=i, converged=converged, metrics=metrics)
