"""Structured Streaming operators.

Three streaming shapes the engine supports:

- ``stream_windowed_events``: the canonical watermark + tumbling-window
  aggregation over an event stream (batch twin: the ``events_windowed``
  contract query — same logical plan, so batch results are the oracle
  for the stream);
- ``stream_exact_dedup``: custom *stateful* operator via
  ``applyInPandasWithState`` — first-seen exact dedup keyed on
  sha256(text), state maintained across micro-batches;
- ``stream_edge_counts``: incremental link-graph ingestion — new edge
  rows arrive as files, degrees maintained as a streaming aggregate.
  Exact incremental *triangle* counting needs the full adjacency as
  state and is intentionally out of scope (the north rule demands exact
  counts; REPT-style streaming approximation is explicitly excluded —
  SURVEY.md §2.7); the batch engine re-runs on the compacted table
  instead (the standard lambda split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
    ]
)


def stream_windowed_events(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    fmt: str = "json",
) -> DataFrame:
    """readStream(json/parquet files) → watermark → tumbling window agg.

    The watermark bounds state: late rows beyond it are dropped, windows
    older than it are finalized and evicted — the knob that keeps an
    unbounded stream's state finite on a real cluster.
    """
    reader = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 8)
    if fmt == "json":
        stream = reader.json(source_dir)
    elif fmt == "parquet":
        stream = reader.parquet(source_dir)
    else:
        raise ValueError(f"unsupported stream source format: {fmt!r}")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_events(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    fmt: str = "parquet",
) -> DataFrame:
    """Sliding-window twin of :func:`stream_windowed_events`: the same
    ``window(ts, window, slide)`` expression the batch
    ``sliding_window_counts`` uses, under readStream + watermark. Each
    event updates window/slide overlapping windows; the watermark
    finalizes and evicts windows as event time advances — overlapping
    windows multiply STATE, not input, so the watermark matters
    ``window/slide``× more than in the tumbling case."""
    reader = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 8)
    stream = reader.parquet(source_dir) if fmt == "parquet" else reader.json(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_user_sessions(
    spark: SparkSession,
    source_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming gap-based sessionization — Spark's NATIVE
    ``session_window(ts, gap)`` state merge under a watermark: each
    event extends (or opens) its user's session window; windows whose
    end (last event + gap) falls behind the watermark are finalized,
    EMITTED ONCE (append mode), and evicted. This is the true streaming
    twin of the batch ``sessionize`` operator (operators/stats.py) —
    the lag+running-sum form needs the whole history sorted per user;
    the session-window form holds only OPEN sessions as state.

    Semantics note, pinned by pytest (tests/test_session_stream.py):
    session_window's merge test is INCLUSIVE of the window end — an
    event exactly ``gap`` after the previous one merges, the same rule
    as the batch lag form's strictly-greater-than split — so the two
    twins agree everywhere, including the boundary (verified, not
    assumed from the half-open-interval docs).

    Returns the un-started aggregated stream: [user_id, session_start,
    session_end, n_events]. The caller picks sink/trigger; append mode
    requires the watermark, which bounds state to open sessions."""
    reader = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    stream = reader.parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id"),
            F.session_window("ts", f"{gap_minutes} minutes").alias("_sw"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])
_DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("text_sha", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ]
)


def stream_exact_dedup(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Streaming exact dedup via ``applyInPandasWithState`` — the custom
    *stateful* operator surface of the engine: emit each distinct
    ``sha256(text)`` exactly once (first ``doc_id`` wins within a batch
    by min), across ALL micro-batches.

    State = one boolean per sha, keyed by the sha — state volume is the
    distinct-document count, partitioned by Spark's state store across
    executors; the grouping key (text_sha) is the shuffle key, so each
    sha's decision is local to one state partition. This is the stream
    twin of the batch ``exact_duplicates`` contract query (first-seen
    semantics instead of group-counts, because a stream never sees "the
    whole group"). Processing-time semantics, no timeout: boilerplate
    shas live forever by design — dedup state must not expire.
    """
    import pandas as pd  # local import: workers ship the function

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    hashed = stream.select(F.sha2("text", 256).alias("text_sha"), "doc_id")

    def dedup(key, pdfs, state):
        first = None
        for pdf in pdfs:
            if len(pdf) and (first is None or pdf["doc_id"].min() < first):
                first = int(pdf["doc_id"].min())
        if state.exists or first is None:
            return iter(())
        state.update((True,))
        return iter([pd.DataFrame({"text_sha": [key[0]], "doc_id": [first]})])

    return hashed.groupBy("text_sha").applyInPandasWithState(
        dedup,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def edge_compaction_stream(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
):
    """Streaming half of the exact-triangle cadence (the lambda split
    SURVEY §2.7 documents): edge files stream in, get canonicalized
    (src<dst, self-loops dropped), and are appended to a compacted
    parquet edge table via ``foreachBatch``. The stream's checkpoint
    makes ingestion exactly-once at the file level; cross-batch
    duplicate *edges* are deduped at read time by the batch side
    (`compacted_edges`), so re-delivered rows cannot change any count.

    Returns the DataStreamWriter — caller starts it with
    ``.trigger(availableNow=True).start()`` for a cadence tick or a
    processing-time trigger for continuous ingestion.
    """
    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("sep", " ")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(source_dir)
    )
    canon = (
        stream.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
    )

    def append(batch_df: DataFrame, batch_id: int) -> None:
        # within-batch dedup keeps the table near-minimal; cross-batch
        # dedup is the reader's distinct() (idempotence beats dedup-state)
        batch_df.dropDuplicates(["src", "dst"]).write.mode("append").parquet(table_dir)

    return (
        canon.writeStream.foreachBatch(append)
        .option("checkpointLocation", checkpoint_dir)
    )


def incremental_triangle_stream(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    counts_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
):
    """EXACT incremental triangle maintenance under streaming ingestion
    — the streaming face of ``operators.delta.triangle_count_delta``.
    Each micro-batch counts only the triangles its edges CREATE
    (inclusion–exclusion over the delta; the accumulated graph is
    touched through |Δ| adjacency lookups, never recounted), appends
    the batch to the compacted edge table, and records
    ``(batch_id, new_triangles)``. Every triangle is counted exactly
    once — by the batch that delivers its last edge — so the running
    sum equals the exact batch count of the union at every tick,
    independent of how edges split across batches (pytest-pinned).

    Replay idempotence (foreachBatch offers at-least-once): the counts
    row is written BEFORE the edge append, keyed by batch_id, and the
    reader (:func:`incremental_triangle_total`) takes max() per
    batch_id. A replay before the append recomputes the identical
    count (same base); a replay after it sees its own edges in the
    base, where the delta's existing-edge drop yields 0 — max() keeps
    the original either way. Cross-batch duplicate edges are dropped
    by the same existing-edge rule, so redelivered rows cannot change
    any count.

    Returns the DataStreamWriter — caller starts it with
    ``.trigger(availableNow=True)`` for a bounded run or a
    processing-time trigger for continuous maintenance."""
    from paralleltrianglecounting_spark.operators.delta import triangle_count_delta

    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    canon = stream.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )

    def tick(batch_df: DataFrame, batch_id: int) -> None:
        batch_c = batch_df.dropDuplicates(["src", "dst"]).persist()
        base = compacted_edges(spark, table_dir)
        n_new = triangle_count_delta(base, batch_c).collect()[0]["new_triangles"]
        spark.createDataFrame(
            [(int(batch_id), int(n_new))], "batch_id long, new_triangles long"
        ).write.mode("append").parquet(counts_dir)
        batch_c.write.mode("append").parquet(table_dir)
        batch_c.unpersist()

    return canon.writeStream.foreachBatch(tick).option(
        "checkpointLocation", checkpoint_dir
    )


def incremental_triangle_total(spark: SparkSession, counts_dir: str) -> DataFrame:
    """[triangles] — the maintained exact total: max per batch_id (see
    the replay note on :func:`incremental_triangle_stream`), summed."""
    per_batch = (
        spark.read.parquet(counts_dir)
        .groupBy("batch_id")
        .agg(F.max("new_triangles").alias("n"))
    )
    return per_batch.agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("triangles"))


def compacted_edges(spark: SparkSession, table_dir: str) -> DataFrame:
    """Batch half of the cadence: the compacted table as a canonical
    edge set (cross-batch distinct). Feed this to the exact batch
    engine (triangle_count & co.) on every cadence tick — the north
    rule demands exact counts, and approximate streaming triangle
    counts are explicitly out of scope, so exact-batch-over-compacted
    IS the streaming answer, with the tick interval as the staleness
    knob.

    A tick that fires before any batch has been appended (empty source,
    cold start) sees no table directory yet — that is an empty edge
    set, not an error. The cold-start probe goes through the Hadoop
    FileSystem API (not ``os.path``): ``table_dir`` may be an hdfs://
    or s3:// URI on a cluster, where a local-filesystem check would
    misread a populated remote table as absent and silently report 0
    triangles — exactly the "compute nonsense quietly" failure the
    engine refuses elsewhere. Any error other than not-found
    propagates."""
    jvm = spark._jvm
    jsc = spark._jsc
    path = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(path):
        return spark.createDataFrame([], "src long, dst long")
    return spark.read.parquet(table_dir).distinct()


def stream_edge_counts(spark: SparkSession, source_dir: str) -> DataFrame:
    """readStream(csv edge files) → canonicalize → running degree counts
    (complete-mode aggregate). The streaming twin of operators.degrees."""
    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("sep", " ")
        .csv(source_dir)
    )
    canon = stream.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    ends = canon.select(F.col("src").alias("vertex")).union(
        canon.select(F.col("dst").alias("vertex"))
    )
    return ends.groupBy("vertex").agg(F.count(F.lit(1)).alias("degree"))


def stream_degrees(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """readStream(parquet canonical-edge files) → running per-vertex
    degrees (complete-mode aggregate) — the streaming twin of
    ``operators.degrees`` over an already-canonicalized edge table
    (``part_graph``'s output staged as files). Each trigger merges its
    partial counts into the streaming aggregation state, so a vertex
    whose edges arrive across many micro-batches accumulates exactly
    the batch answer; the contract gate replays the staged files in 3
    triggers and hash-compares against the batch ``degrees`` oracle.

    100 TB shape: one streaming hash aggregate keyed by vertex — state
    is |V| counters, input moves once; the canonical edge table means
    no cross-batch dedup state is needed (distinctness is established
    at staging time, the compaction lesson of ``edge_compaction_stream``)."""
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    ends = stream.select(F.col("src").alias("vertex")).union(
        stream.select(F.col("dst").alias("vertex"))
    )
    return ends.groupBy("vertex").agg(F.count(F.lit(1)).alias("degree"))


def _max_version_le(spark: SparkSession, state_dir: str, bound: int) -> int | None:
    """Largest ``v=<n>`` subdirectory of ``state_dir`` with n <= bound,
    via the Hadoop FS API (state may live on hdfs:// or s3:// — the
    compacted_edges lesson). None when no usable version exists."""
    jvm = spark._jvm
    jsc = spark._jsc
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(path):
        return None
    best = None
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                v = int(name[2:])
            except ValueError:
                continue
            if v <= bound and (best is None or v > best):
                best = v
    return best


def _prune_versions(spark: SparkSession, state_dir: str, keep_ge: int) -> None:
    """Delete ``v=<n>`` subdirectories with n < keep_ge. Idempotent (a
    replayed batch re-deletes already-gone dirs) and best-effort: a
    failed delete leaves extra versions, never missing ones."""
    jvm = spark._jvm
    jsc = spark._jsc
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(path):
        return
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                v = int(name[2:])
            except ValueError:
                continue
            if v < keep_ge:
                fs.delete(st.getPath(), True)


def incremental_cc_stream(
    spark: SparkSession,
    source_dir: str,
    labels_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    retain_versions: int = 2,
):
    """EXACT incremental connected components under streaming edge
    ingestion — the streaming face of
    ``operators.components.connected_components``. The maintained state
    is the vertex→label map (label = min vertex id of the component —
    the batch operator's contract); each micro-batch:

    1. relabels its edges' endpoints through the current map (an
       unknown endpoint is its own root — labels are ids of ALREADY
       SEEN vertices, so a new vertex id can never collide with one),
    2. runs the large-/small-star CC operator on the RESULTING root
       graph — |Δ| edges over component representatives, never the
       accumulated edge set (merging components is associative:
       min-of-mins is the global min, so quotient-then-solve equals
       solve-over-union),
    3. rewrites the map with merged labels and appends new vertices.

    Per-batch cost: one |state| map join + CC over |Δ| quotient edges
    — the accumulated GRAPH is never re-read, only the |V|-row label
    map, which is the irreducible state of maintained CC. At 100 TB
    the map lives partitioned on vertex and the rewrite is one
    co-partitioned join per batch.

    Replay idempotence (foreachBatch is at-least-once): state versions
    are written to ``labels_dir/v=<batch_id>`` with overwrite, and a
    tick reads the newest version ≤ batch_id−1 — a replayed batch
    recomputes its version from the same predecessor state,
    byte-identically (every step is deterministic), so redelivery can
    never double-merge or skip.

    Returns the DataStreamWriter; start with availableNow for a
    bounded run, a processing-time trigger for continuous maintenance.
    Read the maintained answer with :func:`incremental_cc_labels`.

    Lifecycle contract: ``labels_dir`` belongs to ONE stream lineage
    (one checkpoint_dir). Restarting from a FRESH checkpoint restarts
    batch ids at 0, and a reused labels_dir would then hold stale
    higher versions that the max-version reader prefers — pair a new
    checkpoint with a new (or emptied) labels_dir.

    Retention: after each successful snapshot write, versions older
    than the last ``retain_versions`` are deleted, so state storage
    and the per-tick version listing stay O(retain_versions) under a
    continuous trigger instead of growing with batch count.
    ``retain_versions`` must be >= 2: a replayed batch b (foreachBatch
    is at-least-once) reads version <= b-1, which must survive the
    prune that batch b itself ran before the crash.
    """
    if retain_versions < 2:
        raise ValueError(
            "retain_versions must be >= 2 to keep replayed batches "
            "able to read their predecessor state"
        )

    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    canon = stream.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    )

    def tick(batch_df: DataFrame, batch_id: int) -> None:
        from paralleltrianglecounting_spark.operators.components import (
            connected_components,
        )

        edges_b = batch_df.dropDuplicates(["src", "dst"]).persist()
        prev_v = _max_version_le(spark, labels_dir, int(batch_id) - 1)
        if prev_v is None:
            prev = spark.createDataFrame([], "vertex long, label long")
        else:
            prev = spark.read.parquet(f"{labels_dir}/v={prev_v}")
        # 1. endpoints → roots (unknown endpoint: its own root)
        lab_u = prev.withColumnsRenamed({"vertex": "src", "label": "_lu"})
        lab_v = prev.withColumnsRenamed({"vertex": "dst", "label": "_lv"})
        roots = (
            edges_b.join(lab_u, "src", "left")
            .join(lab_v, "dst", "left")
            .select(
                F.coalesce("_lu", F.col("src")).alias("src"),
                F.coalesce("_lv", F.col("dst")).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        # 2. CC over the quotient graph (|Δ| edges, not the union)
        merged = connected_components(roots).withColumnsRenamed(
            {"vertex": "_root", "component": "_new"}
        ).persist()
        # 3. rewrite the map; union in this batch's new vertices
        upd = (
            prev.join(merged, prev["label"] == merged["_root"], "left")
            .select("vertex", F.coalesce("_new", "label").alias("label"))
        )
        verts_b = (
            edges_b.select(F.col("src").alias("vertex"))
            .unionByName(edges_b.select(F.col("dst").alias("vertex")))
            .distinct()
        )
        new_verts = (
            verts_b.join(prev.select("vertex"), "vertex", "left_anti")
            .join(merged, F.col("vertex") == F.col("_root"), "left")
            .select("vertex", F.coalesce("_new", "vertex").alias("label"))
        )
        upd.unionByName(new_verts).write.mode("overwrite").parquet(
            f"{labels_dir}/v={int(batch_id)}"
        )
        _prune_versions(
            spark, labels_dir, int(batch_id) - int(retain_versions) + 1
        )
        merged.unpersist()
        edges_b.unpersist()

    return canon.writeStream.foreachBatch(tick).option(
        "checkpointLocation", checkpoint_dir
    )


def incremental_cc_labels(spark: SparkSession, labels_dir: str) -> DataFrame:
    """[vertex, component] — the maintained CC answer: the newest state
    version. Empty when no batch has committed yet (cold start is an
    empty graph, not an error)."""
    v = _max_version_le(spark, labels_dir, 2**62)
    if v is None:
        return spark.createDataFrame([], "vertex long, component long")
    return spark.read.parquet(f"{labels_dir}/v={v}").select(
        "vertex", F.col("label").alias("component")
    )
