"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-vectorized
``mapInPandas`` stages.

The decode step itself is STUBBED (this container ships no image/audio
libraries): ``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder stands in so
the Spark-side plumbing — schema, batch shape, partitioning, UDF
signature — is real and testable end-to-end. Swapping in PIL/ffmpeg is
a one-function change; nothing in the plan moves.

Batch contract: each pandas batch carries the binary payloads of one
Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps
payload memory per worker); metadata stays in columns so filters on
width/height/duration push down to parquet *before* any payload is
deserialized (prune-then-decode, the only order that survives 100 TB of
media).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)

FEATURE_DIM = 8


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function
    of (seed, id) — stands in for a parquet/Iceberg table of blobs."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        (F.pmod(F.xxhash64(F.lit(seed + 1), "id"), F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.lit(seed + 2), "id"), F.lit(512)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.lit(seed + 3), "id"), F.lit(60000)) + 100).cast("int").alias("duration_ms"),
        # payload: sha-chain bytes, deterministic, 64-256 bytes
        F.to_binary(
            F.repeat(F.sha2(F.concat(F.lit(seed), F.col("id")), 256),
                     (F.pmod(F.xxhash64(F.lit(seed + 4), "id"), F.lit(4)) + 1).cast("int")),
            F.lit("hex"),
        ).alias("payload"),
    )
    return df


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: byte-histogram moments."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(dim)
    chunks = np.array_split(arr, dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    """The decode/feature-extract kernel for one Arrow batch.

    Real implementation would PIL-decode ``payload``, resize, and embed;
    that requires libraries absent from this container:
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decode needs PIL/torchaudio/ffmpeg — not "
            "available in this environment; pass fake=True for the "
            "deterministic stand-in decoder"
        )
    feats = [_fake_decode(p).tolist() for p in pdf["payload"]]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
            "feature": feats,
        }
    )


def extract_features(
    media: DataFrame,
    kinds: list[str] | None = None,
    fake: bool = True,
) -> DataFrame:
    """mapInPandas pipeline: metadata filter (pushed to the scan, before
    any payload read) → Arrow-batched decode → typed feature rows."""
    if kinds:
        media = media.where(F.col("kind").isin(kinds))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, fake=fake)

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode of each frame is the stubbed step). Pure column ops —
    the explode happens before any payload touch, so Spark can size
    partitions on row counts, not payload bytes."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_idx"),
        (F.col("duration_ms")).alias("duration_ms"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)
