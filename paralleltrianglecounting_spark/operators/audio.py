"""Real audio decode for the formats expressible with stdlib + NumPy:
RIFF/WAVE containers carrying integer PCM (8/16/24/32-bit), IEEE float
(32/64-bit), and the two G.711 companded codecs (µ-law, A-law),
including WAVE_FORMAT_EXTENSIBLE headers.

This closes the last fake-decode modality (images got BMP/PPM/PNG/JPEG
in r03, video got MJPEG-AVI; audio had only the byte-histogram stand-in
in operators/multimodal.py). The same engine policy holds: every format
that CAN be decoded from the public spec with NumPy is decoded for
real; anything else (MP3, AAC, Vorbis, ADPCM) raises
``NotImplementedError`` naming the real library — decoding garbage
silently is the one behavior this engine refuses everywhere.

Format notes (public RIFF/WAVE + ITU-T G.711 specs): 'RIFF' <size>
'WAVE' { 'fmt ' <wFormatTag, nChannels, nSamplesPerSec, ...,
wBitsPerSample [, cbSize, ..., SubFormat GUID]> ... 'data' <frames> }.
Chunks are word-aligned (odd sizes padded one byte). Samples are
little-endian, channel-interleaved; 8-bit PCM is unsigned (offset 128),
wider PCM is signed. WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries the real
format code in the first two bytes of the 16-byte SubFormat GUID.
G.711 companding follows the ITU tables: µ-law is a biased log segment
code over a complemented byte; A-law XORs 0x55 and uses seven chord
segments (both reproduced here as vectorized NumPy, encode and decode).

Spark-side shape mirrors ``video_frame_features``: metadata prune
(kind == 'audio') BEFORE any payload byte moves, Arrow-batched
``mapInPandas`` decode, per-clip fixed-width feature rows. At 100 TB
the decode cost is ∝ bytes *kept* by the metadata filter; the feature
pass is one linear scan per clip (no FFT over the whole clip — the
spectral centroid runs on a bounded window).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# wFormatTag values from the public RIFF registry.
WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_EXTENSIBLE = 0xFFFE

_UNSUPPORTED = {
    0x0002: "MS ADPCM",
    0x0011: "IMA ADPCM",
    0x0055: "MP3",
    0x1610: "AAC",
    0x566F: "Vorbis",
}


# ---------------------------------------------------------------- G.711

def mulaw_decode(b: np.ndarray) -> np.ndarray:
    """µ-law byte → int16-range magnitude (ITU-T G.711). Vectorized."""
    u = (~b.astype(np.uint8)).astype(np.int32)
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 → µ-law byte (ITU-T G.711), vectorized twin of
    :func:`mulaw_decode` (decode(encode(x)) is the nearest segment
    level, |err| bounded by the segment step)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    # exponent = position of the highest set bit above bit 7
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    byte = ~(sign | (exp << 4) | mant) & 0xFF
    return byte.astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """A-law byte → int16-range magnitude (ITU-T G.711). Vectorized."""
    u = (b.astype(np.uint8) ^ 0x55).astype(np.int32)
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    # after the 0x55 XOR, bit 7 SET means positive (Sun g711.c convention)
    return np.where(sign != 0, mag, -mag).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 → A-law byte (ITU-T G.711), vectorized."""
    x = pcm.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), 32767)
    exp = (np.floor(np.log2(np.maximum(mag, 1))) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    byte = (sign | (exp << 4) | mant) ^ 0x55
    return byte.astype(np.uint8)


# ----------------------------------------------------------- WAV codec

def parse_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF walk of a WAVE payload → (samples, sample_rate).

    ``samples`` is float64 with shape (n_frames, n_channels), every
    format normalized to [-1, 1] (PCM by its full-scale divisor, G.711
    by 1/32768 after expansion, float passed through)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (RIFF/'WAVE' header missing)")
    fmt: dict | None = None
    data: bytes | None = None
    pos = 12
    end = len(payload)
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            fmt = {
                "tag": tag,
                "channels": int.from_bytes(body[2:4], "little"),
                "rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
            if tag == WAVE_FORMAT_EXTENSIBLE:
                if size < 40:
                    raise ValueError("EXTENSIBLE fmt chunk shorter than 40 bytes")
                # real format code = first 2 bytes of the SubFormat GUID
                fmt["tag"] = int.from_bytes(body[24:26], "little")
        elif fourcc == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt / data chunk")
    tag, ch, rate, bits = fmt["tag"], fmt["channels"], fmt["rate"], fmt["bits"]
    if ch < 1 or rate < 1:
        raise ValueError(f"invalid WAV fmt (channels={ch}, rate={rate})")

    if tag == WAVE_FORMAT_PCM:
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (raw.size // 3) * 3].reshape(-1, 3)
            # sign-extend 24-bit LE into int32 via the top byte
            x32 = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int8).astype(np.int32) << 16)
            )
            x = x32.astype(np.float64) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bit depth {bits} not supported")
    elif tag == WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"IEEE float bit depth {bits} not supported")
    elif tag == WAVE_FORMAT_MULAW:
        x = mulaw_decode(np.frombuffer(data, dtype=np.uint8)).astype(np.float64) / 32768.0
    elif tag == WAVE_FORMAT_ALAW:
        x = alaw_decode(np.frombuffer(data, dtype=np.uint8)).astype(np.float64) / 32768.0
    else:
        name = _UNSUPPORTED.get(tag, f"wFormatTag=0x{tag:04X}")
        raise NotImplementedError(
            f"WAV codec {name} needs a native decoder (ffmpeg/libsndfile, "
            "not in this container); PCM/float/µ-law/A-law decode here"
        )
    n = (x.size // ch) * ch
    return x[:n].reshape(-1, ch), rate


def encode_wav(
    samples: np.ndarray, rate: int, fmt: str = "pcm16"
) -> bytes:
    """Minimal WAVE writer — the deterministic test-fixture twin of
    :func:`parse_wav`. ``samples`` is float in [-1, 1], shape (n,) or
    (n, channels). ``fmt`` ∈ pcm8|pcm16|pcm24|pcm32|float32|float64|
    ulaw|alaw|extensible_pcm16 (the last exercises the 0xFFFE header
    path)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    flat = x.reshape(-1)
    extensible = fmt == "extensible_pcm16"
    key = "pcm16" if extensible else fmt
    if key == "pcm8":
        tag, bits = WAVE_FORMAT_PCM, 8
        body = (np.clip(np.round(flat * 128.0 + 128.0), 0, 255)).astype(np.uint8).tobytes()
    elif key == "pcm16":
        tag, bits = WAVE_FORMAT_PCM, 16
        body = np.clip(np.round(flat * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif key == "pcm24":
        tag, bits = WAVE_FORMAT_PCM, 24
        x32 = np.clip(np.round(flat * 8388608.0), -8388608, 8388607).astype(np.int32)
        b4 = x32.astype("<i4").view(np.uint8).reshape(-1, 4)
        body = b4[:, :3].tobytes()
    elif key == "pcm32":
        tag, bits = WAVE_FORMAT_PCM, 32
        body = np.clip(np.round(flat * 2147483648.0), -(2**31), 2**31 - 1).astype("<i4").tobytes()
    elif key == "float32":
        tag, bits = WAVE_FORMAT_IEEE_FLOAT, 32
        body = flat.astype("<f4").tobytes()
    elif key == "float64":
        tag, bits = WAVE_FORMAT_IEEE_FLOAT, 64
        body = flat.astype("<f8").tobytes()
    elif key == "ulaw":
        tag, bits = WAVE_FORMAT_MULAW, 8
        body = mulaw_encode(np.clip(np.round(flat * 32768.0), -32768, 32767)).tobytes()
    elif key == "alaw":
        tag, bits = WAVE_FORMAT_ALAW, 8
        body = alaw_encode(np.clip(np.round(flat * 32768.0), -32768, 32767)).tobytes()
    else:
        raise ValueError(f"unknown encode fmt {fmt!r}")

    block = ch * bits // 8
    if extensible:
        sub = WAVE_FORMAT_PCM.to_bytes(2, "little") + bytes.fromhex(
            "000000001000800000aa00389b71"
        )  # KSDATAFORMAT_SUBTYPE base GUID
        fmt_body = (
            WAVE_FORMAT_EXTENSIBLE.to_bytes(2, "little")
            + ch.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * block).to_bytes(4, "little")
            + block.to_bytes(2, "little")
            + bits.to_bytes(2, "little")
            + (22).to_bytes(2, "little")
            + bits.to_bytes(2, "little")      # valid bits
            + (0).to_bytes(4, "little")       # channel mask
            + sub
        )
    else:
        fmt_body = (
            tag.to_bytes(2, "little")
            + ch.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * block).to_bytes(4, "little")
            + block.to_bytes(2, "little")
            + bits.to_bytes(2, "little")
        )

    def chunk(fourcc: bytes, b: bytes) -> bytes:
        return fourcc + len(b).to_bytes(4, "little") + b + (b"\x00" if len(b) & 1 else b"")

    content = b"WAVE" + chunk(b"fmt ", fmt_body) + chunk(b"data", body)
    return b"RIFF" + len(content).to_bytes(4, "little") + content


# ------------------------------------------------------------ features

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_ms", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
        T.StructField("spectral_centroid_hz", T.DoubleType(), False),
        T.StructField("energy_envelope", T.ArrayType(T.DoubleType()), False),
    ]
)

_CENTROID_WINDOW = 1 << 14  # bounded FFT window: cost is O(1) per clip


def audio_features(samples: np.ndarray, rate: int, envelope_dim: int = 8) -> dict:
    """Per-clip summary features over decoded samples (float, (n, ch)).

    zero_crossing_rate is crossings per sample of the mono mix (a pure
    f-Hz sine gives ≈ 2f/rate); spectral_centroid is Σf·|X| / Σ|X| over
    one bounded rfft window from the clip start (cost independent of
    clip length); energy_envelope is the clip's RMS resampled to
    ``envelope_dim`` equal time buckets."""
    mono = samples.mean(axis=1)
    n = mono.size
    if n == 0:
        return {
            "rms": 0.0, "peak": 0.0, "zero_crossing_rate": 0.0,
            "spectral_centroid_hz": 0.0, "energy_envelope": [0.0] * envelope_dim,
        }
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / n
    win = mono[: min(n, _CENTROID_WINDOW)]
    spec = np.abs(np.fft.rfft(win))
    freqs = np.fft.rfftfreq(win.size, d=1.0 / rate)
    denom = float(spec.sum())
    centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
    env = [
        float(np.sqrt(np.mean(c * c))) if c.size else 0.0
        for c in np.array_split(mono, envelope_dim)
    ]
    return {
        "rms": rms, "peak": peak, "zero_crossing_rate": zcr,
        "spectral_centroid_hz": centroid, "energy_envelope": env,
    }


def audio_clip_features(media: DataFrame, envelope_dim: int = 8) -> DataFrame:
    """Decode WAV payloads and emit one fixed-width feature row per
    clip. Plan shape mirrors ``video_frame_features``: the metadata
    filter (kind == 'audio') prunes at the scan before any payload
    byte moves; decode + features run Arrow-batched in one
    ``mapInPandas`` pass (no per-row Python UDF)."""
    clips = media.where(F.col("kind") == "audio")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in AUDIO_FEATURE_SCHEMA.fields}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = parse_wav(bytes(payload))
                feats = audio_features(samples, rate, envelope_dim)
                out["media_id"].append(media_id)
                out["sample_rate"].append(rate)
                out["channels"].append(samples.shape[1])
                out["n_samples"].append(samples.shape[0])
                out["duration_ms"].append(samples.shape[0] * 1000.0 / rate)
                for k in ("rms", "peak", "zero_crossing_rate", "spectral_centroid_hz", "energy_envelope"):
                    out[k].append(feats[k])
            yield pd.DataFrame(out)

    return clips.mapInPandas(gen, AUDIO_FEATURE_SCHEMA)
