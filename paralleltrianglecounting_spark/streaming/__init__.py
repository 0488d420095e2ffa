"""Structured Streaming layer: streaming edge ingestion and windowed
event aggregation (the reference has no streaming — SURVEY.md §2.7 —
this is a north-star-adjacent extension kept deliberately small)."""

from paralleltrianglecounting_spark.streaming.edge_stream import (  # noqa: F401
    compacted_edges,
    edge_compaction_stream,
    stream_edge_counts,
    stream_exact_dedup,
    stream_windowed_events,
)
