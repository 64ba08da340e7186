"""Tests for the from-scratch stdlib WAV/PCM codec (operators/wav.py) and
the real strict-mode audio path it unlocks.

As with the PNG suite, fixtures are produced by an INDEPENDENT writer —
the stdlib ``wave`` module — so the RIFF parser is checked against a
second implementation, not its own encoder.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from evm_archive_spark.operators import multimodal
from evm_archive_spark.operators.wav import (
    WavError,
    decode_wav,
    encode_wav,
    is_wav,
)


def stdlib_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Independent fixture writer via the stdlib wave module."""
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(samples.shape[1])
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    if bits == 16:
        w.writeframes(
            (np.clip(samples, -1, 1) * 32767).round().astype("<i2").tobytes()
        )
    else:
        w.writeframes(
            ((np.clip(samples, -1, 1) * 127).round() + 128)
            .astype(np.uint8)
            .tobytes()
        )
    w.close()
    return buf.getvalue()


def test_decode_matches_stdlib_writer_16bit_stereo():
    t = np.linspace(0, 1, 8000, endpoint=False)
    sig = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)], 1)
    rate, out = decode_wav(stdlib_wav(sig, 8000, 16))
    assert rate == 8000 and out.shape == (8000, 2)
    # 16-bit quantization: within 1 LSB of the source signal
    assert np.abs(out - sig).max() < 1.5 / 32768


def test_decode_8bit_unsigned_and_float32():
    sig = np.linspace(-1, 1, 256).reshape(-1, 1)
    rate, out = decode_wav(stdlib_wav(sig, 16000, 8))
    assert rate == 16000 and out.shape == (256, 1)
    assert np.abs(out - sig).max() < 1.5 / 128

    # hand-built IEEE-float WAV (format code 3)
    raw = sig.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, out = decode_wav(payload)
    assert rate == 44100
    assert np.allclose(out, sig, atol=1e-6)


def test_encode_decode_round_trip_and_extra_chunks():
    sig = np.sin(np.linspace(0, 20, 500)).reshape(-1, 2)
    rate, out = decode_wav(encode_wav(sig, 22050, 16))
    assert rate == 22050 and out.shape == sig.shape
    assert np.abs(out - sig).max() < 1.5 / 32768

    # a LIST metadata chunk between fmt and data must be skipped
    enc = encode_wav(sig, 22050, 16)
    fmt_at = enc.index(b"fmt ")
    data_at = enc.index(b"data")
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOxy"
    patched = enc[:data_at] + extra + enc[data_at:]
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    assert fmt_at < data_at
    rate2, out2 = decode_wav(patched)
    assert rate2 == 22050 and np.array_equal(out2, out)


def test_rejections():
    assert not is_wav(b"OggS....")
    with pytest.raises(WavError, match="RIFF"):
        decode_wav(b"not audio at all")
    # compressed format code (e.g. 85 = MP3-in-WAV) is out of scope
    fmt = struct.pack("<HHIIHH", 85, 2, 44100, 4000, 1, 0)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(WavError, match="unsupported audio format"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_features_strict_real_wav(spark):
    """Real strict-mode audio features: a 440 Hz tone's zero-crossing
    rate lands at ~2*f/rate ppm, silence has zero RMS, and non-WAV
    payloads raise in strict mode / fall back otherwise."""
    import pandas as pd

    t = np.linspace(0, 1, 8000, endpoint=False)
    tone = np.sin(2 * np.pi * 440 * t).reshape(-1, 1)
    silence = np.zeros((4000, 1))
    payloads = [stdlib_wav(tone, 8000, 16), stdlib_wav(silence, 8000, 16)]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1], "payload": payloads})
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.audio_features(df, strict=True).collect()
    }
    assert rows[0]["sample_rate"] == 8000
    assert rows[0]["n_channels"] == 1
    assert rows[0]["duration_ms"] == 1000
    # sine RMS = 1/sqrt(2) ~ 707107 ppm (16-bit quantization tolerance)
    assert abs(rows[0]["rms_ppm"] - 707_107) < 1000
    # 440 Hz over 8 kHz: 880 crossings / 7999 intervals ~ 110014 ppm
    assert abs(rows[0]["zcr_ppm"] - 110_014) < 2000
    assert rows[1]["duration_ms"] == 500 and rows[1]["rms_ppm"] == 0

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [9], "payload": [b"mp3 bytes"]})
    )
    with pytest.raises(Exception, match="NotImplementedError|WAV"):
        multimodal.audio_features(bad, strict=True).collect()
    fake = multimodal.audio_features(bad, strict=False).collect()
    assert len(fake) == 1 and fake[0]["sample_rate"] >= 8000


def test_wav_round_trip_property():
    """Hypothesis: arbitrary float signals survive encode -> decode
    within 1 LSB at 16-bit, any rate/channel count."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        frames=st.integers(1, 400),
        ch=st.integers(1, 3),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(frames, ch, rate, seed):
        sig = np.random.default_rng(seed).uniform(-1, 1, size=(frames, ch))
        r, out = decode_wav(encode_wav(sig, rate, 16))
        assert r == rate and out.shape == sig.shape
        assert np.abs(out - sig).max() < 1.5 / 32768

    check()


def test_audio_fingerprint_real_and_near_dup_join(spark):
    """The audio mirror of the image near-dup lane: real frame-energy
    fingerprints are gain-invariant (same take at half volume hashes
    identically), a lightly edited take lands within small Hamming
    distance, an unrelated take far; the banded join finds exactly the
    brute-force pairs."""
    import pandas as pd

    from evm_archive_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_duplicates,
    )

    rng = np.random.default_rng(19)
    t = np.arange(64 * 100) / 8000.0
    # structured energy envelope: loud/quiet alternating frame blocks
    env = np.repeat(rng.uniform(0.05, 1.0, 64), 100)
    base = (np.sin(2 * np.pi * 440 * t) * env).reshape(-1, 1)
    half = base * 0.5                       # gain change
    edited = base.copy()
    edited[:200] = 0.0                      # mute the first two frames
    other = (
        np.sin(2 * np.pi * 220 * t)
        * np.repeat(rng.uniform(0.05, 1.0, 64), 100)
    ).reshape(-1, 1)

    payloads = [
        encode_wav(base, 8000),
        encode_wav(half, 8000),
        encode_wav(edited, 8000),
        encode_wav(other, 8000, bits=8),
    ]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": range(4), "payload": payloads})
    )
    fps = {
        r["media_id"]: r["afp"]
        for r in audio_fingerprint(media, strict=True).collect()
    }
    mask = (1 << 64) - 1
    assert fps[0] == fps[1]  # gain-invariant
    ham_edit = bin((fps[0] ^ fps[2]) & mask).count("1")
    assert 1 <= ham_edit <= 4
    assert bin((fps[0] ^ fps[3]) & mask).count("1") > 8

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_duplicates(
            audio_fingerprint(media, strict=True), max_hamming=4
        ).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 2)] == ham_edit
    assert (0, 3) not in pairs and (1, 3) not in pairs

    # non-WAV at strict=False: deterministic fake, no failure; strict raises
    junk = spark.createDataFrame(
        pd.DataFrame({"media_id": [9], "payload": [b"mp3-ish bytes"]})
    )
    assert len(audio_fingerprint(junk, strict=False).collect()) == 1
    import pytest as _pytest

    with _pytest.raises(Exception, match="WAV"):
        audio_fingerprint(junk, strict=True).collect()
