"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-vectorized
``mapInPandas`` stages.

Decode support is layered (this container ships no image libraries):

- **real decode, dependency-free formats**: uncompressed 24-bit BMP and
  binary PPM (P6) are parsed in pure NumPy (``decode_bmp`` /
  ``decode_ppm``) — a genuine payload→pixels→features path proving the
  swap-in claim end-to-end (tests push real encoded bytes through
  ``extract_features(fake=False)``);
- **compressed formats** (PNG/JPEG/video): still STUBBED —
  ``NotImplementedError`` naming the missing library. Swapping in
  PIL/ffmpeg replaces one function (``_decode_image``); nothing in the
  plan moves;
- ``fake=True``: deterministic byte-histogram stand-in, for plumbing
  tests over payloads that aren't real images.

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


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-NumPy decode of an uncompressed 24-bit BMP → (H, W, 3)
    uint8 RGB. Handles bottom-up (positive height) and top-down
    (negative height) row order and the 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP decodes without PIL (got "
            f"bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_sz = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, row_sz * h, data_off).reshape(h, row_sz)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Inverse of ``decode_bmp`` (bottom-up, 24bpp) — the deterministic
    test-fixture writer; also handy as a sink for decoded frames."""
    h, w, _ = pixels.shape
    row_sz = (w * 3 + 3) & ~3
    img_sz = row_sz * h
    header = (
        b"BM"
        + (14 + 40 + img_sz).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (14 + 40).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + int(w).to_bytes(4, "little", signed=True)
        + int(h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + img_sz.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    body = np.zeros((h, row_sz), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + body.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-NumPy decode of a binary PPM (P6, maxval 255) → (H, W, 3)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <w> <h> <maxval> then a single whitespace, then raw RGB
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    # the single whitespace delimiter after maxval; tolerate CRLF
    # (a CRLF-writing tool means both bytes as the delimiter — reading
    # only the '\r' would shift the raster by one byte silently)
    if payload[i : i + 2] == b"\r\n":
        i += 2
    else:
        i += 1
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    return np.frombuffer(payload, np.uint8, w * h * 3, i).reshape(h, w, 3).copy()


def _decode_image(payload: bytes) -> np.ndarray:
    """Format dispatch for the real-decode path. PNG/JPEG would slot in
    here (PIL.Image.open) — absent from this container, so they raise
    with the library named rather than decoding garbage."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "payload is not BMP/PPM; decoding PNG/JPEG/video needs PIL/ffmpeg "
        "(not in this container) — swap _decode_image to add them"
    )


def _image_features(px: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real-pixel feature vector: per-channel means and stds, plus
    height and width — FEATURE_DIM (8) values, deterministic."""
    chan = px.reshape(-1, 3).astype(np.float64)
    return np.concatenate(
        [chan.mean(axis=0), chan.std(axis=0), [float(px.shape[0]), float(px.shape[1])]]
    )[:dim]


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    """The decode/feature-extract kernel for one Arrow batch: payload →
    pixels (``_decode_image``) → feature vector, or the deterministic
    byte-histogram stand-in when ``fake=True``."""
    if fake:
        feats = [_fake_decode(p).tolist() for p in pdf["payload"]]
    else:
        feats = [_image_features(_decode_image(p)).tolist() for p in pdf["payload"]]
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
