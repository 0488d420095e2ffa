"""Structured Streaming operators.

Two streaming shapes the engine supports:

- ``stream_windowed_events``: the canonical watermark + tumbling-window
  aggregation over an event stream (batch twin: the ``events_windowed``
  contract query — same logical plan, so batch results are the oracle
  for the stream);
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
) -> DataFrame:
    """readStream(json files) → watermark → tumbling window agg.

    The watermark bounds state: late rows beyond it are dropped, windows
    older than it are finalized and evicted — the knob that keeps an
    unbounded stream's state finite on a real cluster.
    """
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(source_dir)
    )
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
