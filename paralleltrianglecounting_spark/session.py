"""SparkSession factory for the link-graph engine.

Defaults are chosen for the shape of this workload — iterative graph
algorithms dominated by self-joins and aggregations on long vertex ids:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting);
- Arrow on (all Python-side compute is pandas/Arrow-vectorized — the
  engine bans row-at-a-time Python UDFs, see ``plans.lint``);
- explicit ``spark.sql.shuffle.partitions`` sized to the core count
  (2× with a floor of 16 at low core counts — see the in-function
  comment) rather than the 200 default; a real cluster sizes this by
  data volume per partition instead, and AQE coalesces down.

The reference hand-rolls its parallelism (std::thread chunking at
``parallel_edge_it_manual_threads_CPP/parallel_edge_it_manual_threads_v1.cpp:248-258``,
``#define NUM_THREADS`` sweeps); here the equivalent knobs are the master
thread count and shuffle partitioning, swept by ``bench.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# tmpfs is only a sane spill target when it has real headroom: shuffle
# spill happens exactly when memory is tight, and /dev/shm is RAM (capped
# at ~50% of it) — picking it on a small host turns a recoverable spill
# into ENOSPC/OOM pressure. Below this free-space floor we stay on disk.
_TMPFS_MIN_FREE_BYTES = 16 << 30


def _tmpfs_roomy(path: str, min_free: int = _TMPFS_MIN_FREE_BYTES) -> bool:
    if not (os.path.isdir(path) and os.access(path, os.W_OK)):
        return False
    try:
        st = os.statvfs(path)
    except OSError:
        return False
    return st.f_bavail * st.f_frsize >= min_free


def get_spark(
    app_name: str = "spark-link-graph",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for link-graph analytics.

    ``cores`` maps to ``local[N]``; on a real cluster the same code runs
    unchanged under ``spark-submit --py-files`` with executor settings
    supplied externally (the builder only sets SQL-level conf there).
    """
    cores = cores or DEFAULT_CPUS
    # Two regimes (r03 partition sweep + interleaved fresh-JVM A/B):
    # - Few cores: at exactly one task per core every stage is a single
    #   wave, so one skewed shuffle partition (e.g. a component root
    #   holding a star's whole edge set in connected components) stalls
    #   the stage with every other core idle. Two-plus waves let the
    #   scheduler rebalance around the straggler — measured 2× on cc at
    #   8 cores going 8→16 partitions.
    # - Many cores: once a single wave already has ≥32 partitions, skew
    #   is diluted by partition count itself and doubling partitions
    #   only adds per-task overhead (scheduling, codegen entry, shuffle
    #   merge fan-in) — measured 15-40% SLOWER on the flagship at 32
    #   cores going 32→64 partitions.
    # Hence: 2× cores with a floor of 16, capped at one-task-per-core
    # once that means ≥32 partitions. This is a LOCAL-mode heuristic;
    # a cluster deployment sizes shuffle partitions by data volume
    # (~128-256 MB per partition via maxPartitionBytes / AQE advisory
    # size), not by core count.
    shuffle_partitions = shuffle_partitions or min(
        max(2 * cores, 16), max(cores, 32)
    )
    # Under spark-submit (tools/submit.sh) the master comes from the
    # launcher via SPARK_GRAFT_MASTER so cluster managers (YARN/k8s/
    # standalone) work unchanged; standalone python runs default to
    # local[cores].
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize the per-batch Python round-trip in
        # the vectorized kernels (operators/csr.py); 32k rows × two ≤√E
        # neighbor arrays stays well under executor memory per task
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle/spill scratch space: tmpfs when available. On this sandbox
    # the root disk writes at ~470 MB/s and multi-GB shuffles inject tens
    # of seconds of I/O noise; a cluster deployment would point this at
    # executor-local NVMe instead (it is plain `spark.local.dir`).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and _tmpfs_roomy("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
