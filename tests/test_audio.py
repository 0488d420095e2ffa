"""Audio decode (operators/audio.py): WAV/PCM/float/G.711 codec tests
— golden bytes hand-assembled from the public RIFF + ITU-T G.711
specs, round-trips through the fixture-twin encoder, and the Spark
Arrow-batched feature path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.audio import (
    AUDIO_FEATURE_SCHEMA,
    alaw_decode,
    alaw_encode,
    audio_clip_features,
    audio_features,
    encode_wav,
    mulaw_decode,
    mulaw_encode,
    parse_wav,
)


def _sine(freq=440.0, rate=8000, secs=0.5, amp=0.5, ch=1):
    t = np.arange(int(rate * secs)) / rate
    x = amp * np.sin(2 * np.pi * freq * t)
    return np.tile(x[:, None], (1, ch)) if ch > 1 else x


# ------------------------------------------------------------ G.711

def test_mulaw_golden_and_symmetry():
    # 0xFF encodes silence; 0x7F is negative zero (ITU-T G.711 table).
    assert mulaw_decode(np.array([0xFF], np.uint8))[0] == 0
    assert mulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    # published µ-law extremes: positive bytes 0xFF..0x80, negative 0x7F..0x00
    assert mulaw_decode(np.array([0x80], np.uint8))[0] == 32124
    assert mulaw_decode(np.array([0x00], np.uint8))[0] == -32124
    assert mulaw_encode(np.array([0], np.int16))[0] == 0xFF
    # decode is odd-symmetric
    all_bytes = np.arange(256, dtype=np.uint8)
    dec = mulaw_decode(all_bytes)
    pos = dec[(all_bytes & 0x80) != 0]   # raw bit 7 set (0x80..0xFF) -> positive half
    assert pos.min() >= 0


def test_mulaw_roundtrip_quantization_bound():
    pcm = np.linspace(-32000, 32000, 4001).astype(np.int16)
    dec = mulaw_decode(mulaw_encode(pcm))
    # error bounded by half the largest segment step (2^7 * 8 = 1024)
    assert np.max(np.abs(dec.astype(int) - pcm.astype(int))) <= 1024
    # monotonic over the companding curve
    assert np.all(np.diff(dec.astype(int)) >= 0)


def test_alaw_golden_and_roundtrip():
    # A-law byte 0xD5 (= 0x80 ^ 0x55) is +8, 0x55 is -8 (G.711 table).
    assert alaw_decode(np.array([0xD5], np.uint8))[0] == 8
    assert alaw_decode(np.array([0x55], np.uint8))[0] == -8
    # max magnitude: 0xAA ^ 0x55 = 0xFF -> chord 7, mant 15 -> 32256? no:
    # ((15<<4)+0x108)<<6 = (240+264)<<6 = 32256
    assert alaw_decode(np.array([0xAA], np.uint8))[0] == 32256
    pcm = np.linspace(-32000, 32000, 4001).astype(np.int16)
    dec = alaw_decode(alaw_encode(pcm))
    assert np.max(np.abs(dec.astype(int) - pcm.astype(int))) <= 1024
    assert np.all(np.diff(dec.astype(int)) >= 0)


# --------------------------------------------------------- WAV codec

@pytest.mark.parametrize("fmt,tol", [
    ("pcm8", 1 / 128), ("pcm16", 1 / 32768), ("pcm24", 1 / 8388608),
    ("pcm32", 1e-9), ("float32", 1e-7), ("float64", 0.0),
    ("ulaw", 0.04), ("alaw", 0.04), ("extensible_pcm16", 1 / 32768),
])
def test_wav_roundtrip_all_formats(fmt, tol):
    x = _sine(freq=440, rate=8000, secs=0.25, ch=2)
    payload = encode_wav(x, 8000, fmt=fmt)
    got, rate = parse_wav(payload)
    assert rate == 8000
    assert got.shape == x.shape
    assert np.max(np.abs(got - x)) <= tol + 1e-12


def test_wav_handassembled_golden():
    # Hand-built 16-bit mono WAV, 4 samples — no encoder involved.
    samples = np.array([0, 16384, -16384, -32768], dtype="<i2")
    body = samples.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    wav = (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + len(body).to_bytes(4, "little") + body
    )
    got, rate = parse_wav(wav)
    assert rate == 8000
    np.testing.assert_allclose(
        got[:, 0], [0.0, 0.5, -0.5, -1.0], atol=1e-12
    )


def test_wav_odd_chunk_padding_and_unknown_chunks_skipped():
    # odd-size junk chunk before fmt/data must be word-align skipped
    inner = encode_wav(_sine(secs=0.01), 8000, fmt="ulaw")
    fmt_and_data = inner[12:]
    junk = b"JUNK" + (3).to_bytes(4, "little") + b"abc\x00"
    wav = b"RIFF" + (4 + len(junk) + len(fmt_and_data)).to_bytes(4, "little") + b"WAVE" + junk + fmt_and_data
    got, rate = parse_wav(wav)
    assert rate == 8000 and got.size > 0


def test_wav_unsupported_codec_refuses_naming_library():
    fmt = (
        (0x0055).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (0).to_bytes(2, "little")
    )
    wav = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + (0).to_bytes(4, "little")
    )
    with pytest.raises(NotImplementedError, match="MP3"):
        parse_wav(wav)
    with pytest.raises(ValueError):
        parse_wav(b"RIFF\x00\x00\x00\x00AVI fake")


# ---------------------------------------------------------- features

def test_audio_features_sine_physics():
    rate, freq = 8000, 1000.0
    x = _sine(freq=freq, rate=rate, secs=1.0, amp=0.5)
    f = audio_features(x[:, None], rate)
    # pure sine: rms = amp/sqrt(2), zcr = 2f/rate, centroid ~= f
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f["zero_crossing_rate"] - 2 * freq / rate) < 0.01
    assert abs(f["spectral_centroid_hz"] - freq) < 25.0
    assert abs(f["peak"] - 0.5) < 1e-6
    assert len(f["energy_envelope"]) == 8
    # constant-amplitude sine -> flat envelope
    env = np.array(f["energy_envelope"])
    assert env.std() / env.mean() < 0.05


def test_audio_clip_features_end_to_end(spark):
    rows = []
    for i, (freq, fmt) in enumerate(
        [(440.0, "pcm16"), (1000.0, "ulaw"), (2000.0, "float32")]
    ):
        payload = encode_wav(_sine(freq=freq, rate=8000, secs=0.3), 8000, fmt=fmt)
        rows.append((i, "audio", bytearray(payload)))
    rows.append((99, "image", bytearray(b"not-a-wav")))  # must be pruned
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = audio_clip_features(media).orderBy("media_id")
    assert out.schema == AUDIO_FEATURE_SCHEMA
    got = out.collect()
    assert [r.media_id for r in got] == [0, 1, 2]
    for r, freq in zip(got, [440.0, 1000.0, 2000.0]):
        assert r.sample_rate == 8000 and r.channels == 1
        assert abs(r.duration_ms - 300.0) < 1.0
        assert abs(r.spectral_centroid_hz - freq) < 40.0
        assert abs(r.zero_crossing_rate - 2 * freq / 8000) < 0.02
    # determinism across runs
    a = audio_clip_features(media).orderBy("media_id").collect()
    assert [row.rms for row in a] == [row.rms for row in got]


def test_audio_metadata_prune_before_decode(spark):
    # a corrupt payload behind kind != 'audio' must never be decoded
    media = spark.createDataFrame(
        [(1, "video", bytearray(b"garbage")),
         (2, "audio", bytearray(encode_wav(_sine(secs=0.05), 8000)))],
        "media_id long, kind string, payload binary",
    )
    assert audio_clip_features(media).count() == 1
