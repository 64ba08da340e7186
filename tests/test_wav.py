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


def test_audio_vad_real_wav(spark):
    """Real strict-mode VAD over a constructed silence-tone-silence
    clip: frame boundaries land exactly (8 kHz, 20 ms -> 160-sample
    frames; 12 silent + 26 tone + 12 silent frames), so every output
    field is known in closed form.  Amplitude invariance: the same clip
    at half gain profiles identically (relative threshold)."""
    import pandas as pd

    rate, frame = 8000, 160
    tone_f = np.sin(
        2 * np.pi * 440 * np.arange(26 * frame) / rate
    ).reshape(-1, 1) * 0.8
    clip = np.concatenate(
        [np.zeros((12 * frame, 1)), tone_f, np.zeros((12 * frame, 1))]
    )
    payloads = [
        stdlib_wav(clip, rate, 16),
        stdlib_wav(clip * 0.5, rate, 16),
        stdlib_wav(np.zeros((10 * frame, 1)), rate, 16),  # all silence
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1, 2], "payload": payloads})
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.audio_vad(df, strict=True).collect()
    }
    for mid in (0, 1):  # gain-invariant
        r = rows[mid]
        assert r["n_frames"] == 50
        assert r["n_active"] == 26
        assert r["active_ppm"] == 26 * 1_000_000 // 50
        assert r["longest_run"] == 26
        assert r["leading_silence_ms"] == 240
        assert r["trailing_silence_ms"] == 240
    r = rows[2]
    assert r["n_frames"] == 10 and r["n_active"] == 0
    assert r["leading_silence_ms"] == 200
    assert r["trailing_silence_ms"] == 200

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [9], "payload": [b"opus bytes"]})
    )
    with pytest.raises(Exception, match="NotImplementedError|strict VAD"):
        multimodal.audio_vad(bad, strict=True).collect()
    # strict=False fake matches a python replay of the sha256 recipe
    import hashlib

    fake = multimodal.audio_vad(bad, strict=False).collect()[0]
    h = hashlib.sha256(b"opus bytes").digest()
    nf = 1 + int.from_bytes(h[0:2], "big") % 4096
    na = int.from_bytes(h[2:4], "big") % (nf + 1)
    assert fake["n_frames"] == nf and fake["n_active"] == na
    assert fake["active_ppm"] == na * 1_000_000 // nf
    assert fake["longest_run"] == (
        0 if na == 0 else 1 + int.from_bytes(h[4:6], "big") % na
    )
    assert fake["leading_silence_ms"] == 20 * (
        int.from_bytes(h[6:8], "big") % (nf - na + 1)
    )


def test_audio_vad_split_activity_runs(spark):
    """Two tone bursts separated by silence: longest_run reports the
    longer burst, not the total active count — pins the consecutive-run
    split logic."""
    import pandas as pd

    rate, frame = 8000, 160
    burst = lambda k: np.sin(  # noqa: E731
        2 * np.pi * 500 * np.arange(k * frame) / rate
    ).reshape(-1, 1)
    clip = np.concatenate(
        [
            burst(5),
            np.zeros((3 * frame, 1)),
            burst(9),
            np.zeros((2 * frame, 1)),
        ]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [stdlib_wav(clip, rate, 16)]})
    )
    r = multimodal.audio_vad(df, strict=True).collect()[0]
    assert r["n_frames"] == 19
    assert r["n_active"] == 14
    assert r["longest_run"] == 9
    assert r["leading_silence_ms"] == 0
    assert r["trailing_silence_ms"] == 40


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


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law, IMA ADPCM, and WAVE_FORMAT_EXTENSIBLE
# ---------------------------------------------------------------------------


def _wav_raw(fmt_chunk: bytes, data: bytes) -> bytes:
    """Independent minimal RIFF writer for arbitrary fmt/data chunks."""
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_g711_tables_match_audioop_reference():
    """All 256 mu-law and A-law codes vs the stdlib audioop reference
    implementation (an independent, long-shipped G.711 codec)."""
    import audioop

    from evm_archive_spark.operators.wav import _ALAW, _MULAW

    codes = bytes(range(256))
    ref_mu = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert np.array_equal(_MULAW, ref_mu)
    assert np.array_equal(_ALAW, ref_a)


def test_g711_known_spec_values_and_symmetry():
    from evm_archive_spark.operators.wav import _ALAW, _MULAW

    # published G.711 table anchors
    assert _MULAW[0x00] == -32124 and _MULAW[0x80] == 32124
    assert _MULAW[0xFF] == 0 and _MULAW[0x10] == -15996
    assert _ALAW[0x55] == -8 and _ALAW[0xD5] == 8
    assert _ALAW[0x2A] == -32256 and _ALAW[0xAA] == 32256
    # odd symmetry: flipping the sign bit negates the value
    for c in range(256):
        assert _MULAW[c] == -_MULAW[c ^ 0x80]
        assert _ALAW[c] == -_ALAW[c ^ 0x80]


def test_mulaw_alaw_wav_decode():
    import audioop

    rng = np.random.default_rng(61)
    codes = rng.integers(0, 256, 500, dtype=np.uint8).tobytes()
    for tag, conv in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        rate, out = decode_wav(_wav_raw(fmt, codes))
        assert rate == 8000 and out.shape == (500, 1)
        expect = np.frombuffer(conv(codes, 2), dtype="<i2") / 32768.0
        assert np.array_equal(out[:, 0], expect)
    # stereo mu-law: channel de-interleave
    fmt = struct.pack("<HHIIHH", 7, 2, 8000, 16000, 2, 8)
    rate, out = decode_wav(_wav_raw(fmt, codes))
    assert out.shape == (250, 2)
    expect = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2") / 32768.0
    assert np.array_equal(out, expect.reshape(-1, 2))


def _ima_encode_block(samples: list[int], pred: int, index: int):
    """Independent IMA ADPCM encoder (the public IMA algorithm): returns
    (nibbles, reconstructed) — reconstruction follows the spec decoder
    recurrence that any compliant encoder embeds."""
    STEPS = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ]
    ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]
    nibbles, recon = [], []
    for s in samples:
        step = STEPS[index]
        diff = s - pred
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        # reconstruct exactly as the decoder will
        d = step >> 3
        if nib & 1:
            d += step >> 2
        if nib & 2:
            d += step >> 1
        if nib & 4:
            d += step
        pred = pred - d if nib & 8 else pred + d
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + ADJ[nib & 7]))
        nibbles.append(nib)
        recon.append(pred)
    return nibbles, recon


def test_ima_adpcm_mono_and_stereo():
    rng = np.random.default_rng(67)
    t = np.arange(2048)
    sig = (6000 * np.sin(t / 20) + rng.integers(-200, 200, 2048)).astype(int)

    def build(channels):
        n_ch = len(channels)
        spb = 505  # samples per block: 1 header + 504 nibbles
        block_align = 4 * n_ch + (spb - 1) * n_ch // 2
        blocks = b""
        expect = [[] for _ in range(n_ch)]
        for start in range(0, len(channels[0]) - spb + 1, spb):
            block = b""
            payloads = []
            for c, ch in enumerate(channels):
                seg = [int(v) for v in ch[start : start + spb]]
                nibs, recon = _ima_encode_block(seg[1:], seg[0], 40)
                block += struct.pack("<hBB", seg[0], 40, 0)
                payloads.append(nibs)
                expect[c].extend([seg[0]] + recon)
            # interleave nibbles: 8 per channel per 4-byte word
            words = b""
            for w0 in range(0, spb - 1, 8):
                for c in range(n_ch):
                    chunk = payloads[c][w0 : w0 + 8] + [0] * 8
                    for i in range(0, 8, 2):
                        words += bytes([chunk[i] | (chunk[i + 1] << 4)])
            block += words
            assert len(block) == block_align
            blocks += block
        fmt = struct.pack(
            "<HHIIHHHH", 0x11, n_ch, 8000, 4055 * n_ch, block_align, 4, 2, spb
        )
        return _wav_raw(fmt, blocks), np.array(expect, dtype=np.float64).T

    raw, expect = build([sig])
    rate, out = decode_wav(raw)
    assert rate == 8000
    assert np.array_equal(out * 32768.0, expect)
    # lossy but faithful: reconstruction tracks the source
    n = len(expect)
    assert np.abs(out[:, 0] * 32768.0 - sig[:n]).max() < 2000

    raw2, expect2 = build([sig, (sig // 2)])
    _, out2 = decode_wav(raw2)
    assert out2.shape[1] == 2
    assert np.array_equal(out2 * 32768.0, expect2)


def test_wave_format_extensible_pcm():
    rng = np.random.default_rng(71)
    ints = rng.integers(-32768, 32768, (300, 2)).astype("<i2")
    guid = struct.pack("<H", 1) + bytes.fromhex("000000001000800000aa00389b71")
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 2, 16000, 64000, 4, 16, 22, 16, 3
    ) + guid
    rate, out = decode_wav(_wav_raw(fmt, ints.tobytes()))
    assert rate == 16000
    assert np.array_equal((out * 32768.0).astype("<i2"), ints)


def _pooled_g711_through_audio_features_strict(spark):
    """A mu-law telephony WAV through the strict audio path: real rate,
    duration, and features — the compressed-telephony corpus shape."""
    import audioop

    import pandas as pd

    from evm_archive_spark.operators import multimodal

    rng = np.random.default_rng(73)
    lin = (np.sin(np.arange(8000) / 5.0) * 20000).astype("<i2")
    codes = audioop.lin2ulaw(lin.tobytes(), 2)
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [_wav_raw(fmt, codes)]})
    )
    feats = multimodal.audio_features(df, strict=True).collect()[0]
    assert feats["sample_rate"] == 8000
    assert feats["n_channels"] == 1
    assert feats["duration_ms"] == 1000
    assert feats["rms_ppm"] > 100_000  # a loud signal, really decoded


def _pooled_resample_audio_strict_real(spark):
    """Linear-interp resample through the Spark path: exact against a
    numpy reference, rate/duration metadata correct, FLAC input accepted,
    and the stub path deterministic."""
    import pandas as pd

    from evm_archive_spark.operators import multimodal

    rng = np.random.default_rng(83)
    sig = rng.uniform(-0.9, 0.9, (800, 2))
    payload = encode_wav(sig, 8000, bits=16)

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [payload]})
    )
    out = multimodal.resample_audio(df, 16000, strict=True).collect()[0]
    assert out["meta"]["mime"] == "audio/wav"
    assert out["meta"]["sample_rate"] == 16000
    assert out["meta"]["n_frames"] == 1600

    rate2, got = decode_wav(bytes(out["payload"]))
    assert rate2 == 16000 and got.shape == (1600, 2)
    # numpy reference of the same recipe over the decoded 16-bit source
    _, src = decode_wav(payload)
    pos = np.arange(1600) * 8000 / 16000
    i0 = np.minimum(pos.astype(np.int64), 799)
    i1 = np.minimum(i0 + 1, 799)
    ref = src[i0] * (1 - (pos - i0))[:, None] + src[i1] * (pos - i0)[:, None]
    # output went through 16-bit quantization once
    assert np.abs(got - ref).max() < 1.5 / 32768

    # downsample halves the frame count
    down = multimodal.resample_audio(df, 4000, strict=True).collect()[0]
    assert down["meta"]["n_frames"] == 400

    # non-audio strict raises; stub path never fails and is deterministic
    junk = spark.createDataFrame(
        pd.DataFrame({"media_id": [9], "payload": [b"opus?"]})
    )
    with pytest.raises(Exception, match="WAV/PCM, FLAC and MP4/PCM"):
        multimodal.resample_audio(junk, 16000, strict=True).collect()
    a = multimodal.resample_audio(junk, 16000, strict=False).collect()[0]
    b2 = multimodal.resample_audio(junk, 16000, strict=False).collect()[0]
    assert bytes(a["payload"]) == bytes(b2["payload"])


def _pooled_spectral_features_known_signals(spark):
    """spectral_features against analytically-known signals: a pure
    tone's centroid/rolloff land on its frequency (within one FFT bin),
    seeded noise is spectrally flat and wide, silence zeroes out, and
    an MP4/PCM container yields the same numbers as the WAV of the
    same samples."""
    import struct as _struct

    import numpy as np

    from evm_archive_spark.operators.multimodal import spectral_features
    from evm_archive_spark.operators.wav import encode_wav

    rate = 8000
    t = np.arange(rate * 2) / rate
    tone = np.sin(2 * np.pi * 1000 * t)              # 1 kHz
    rng = np.random.default_rng(5)
    noise = rng.uniform(-0.9, 0.9, rate * 2)
    silence = np.zeros(rate)

    def wav(x):
        return bytearray(encode_wav(x.reshape(-1, 1), rate))

    pcm16 = (tone * 32767).round().astype("<i2")
    raw = pcm16.tobytes()
    fmt = _struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(raw)) + raw
    )
    tone_wav_exact = bytearray(b"RIFF" + _struct.pack("<I", len(body)) + body)

    from test_mp4 import mux_mp4

    tone_mp4 = bytearray(
        mux_mp4(audio=(b"sowt", 1, 16, rate, pcm16.tobytes()))
    )

    media = spark.createDataFrame(
        [
            (0, wav(tone)), (1, wav(noise)), (2, wav(silence)),
            (3, tone_wav_exact), (4, tone_mp4),
        ],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in spectral_features(media, strict=True).collect()
    }
    bin_hz = rate / 256
    assert abs(rows[0]["centroid_hz"] - 1000) <= bin_hz
    assert abs(rows[0]["rolloff85_hz"] - 1000) <= bin_hz
    assert rows[0]["bandwidth_hz"] < 200
    assert rows[0]["flatness_ppm"] < 50_000
    # flat wide noise
    assert rows[1]["flatness_ppm"] > 300_000
    assert rows[1]["bandwidth_hz"] > 800
    assert rows[1]["rolloff85_hz"] > 2500
    # silence: no live frames
    assert rows[2]["centroid_hz"] == 0 and rows[2]["n_frames"] == 31
    # container-independence: same PCM through WAV and MP4 agree exactly
    for c in ("centroid_hz", "rolloff85_hz", "bandwidth_hz",
              "flatness_ppm", "n_frames"):
        assert rows[3][c] == rows[4][c], c

    # strict rejects non-audio; non-strict fake is deterministic
    import pytest as _pytest

    junk = spark.createDataFrame(
        [(9, bytearray(b"not audio"))], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="WAV/PCM, FLAC and MP4/PCM"):
        spectral_features(junk, strict=True).collect()
    a = spectral_features(junk).collect()[0]
    b = spectral_features(junk).collect()[0]
    assert a == b


def _ms_adpcm_encode(channels, block_align=None, predictor=1):
    """Independent MS-ADPCM encoder (public spec): per-block headers
    (bpred u8, idelta i16, sample1 i16, sample2 i16 per channel) then
    greedy interleaved nibbles, reconstructing exactly as the decoder
    will.  Returns (fmt-extension samples_per_block, block_align,
    data bytes, reconstructed channels)."""
    COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232)]
    ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    n_ch = len(channels)
    n = len(channels[0])
    if block_align is None:
        block_align = 7 * n_ch + 128 * n_ch // 2
    spb = (block_align - 7 * n_ch) * 2 // n_ch + 2
    c1, c2 = COEFS[predictor]
    out = bytearray()
    recon = [[] for _ in range(n_ch)]
    for b0 in range(0, n, spb):
        blk = [ch[b0:b0 + spb] for ch in channels]
        m = len(blk[0])
        deltas = [400] * n_ch
        s2 = [int(blk[c][0]) for c in range(n_ch)]
        s1 = [int(blk[c][1]) if m > 1 else 0 for c in range(n_ch)]
        out += bytes([predictor] * n_ch)
        for c in range(n_ch):
            out += struct.pack("<h", deltas[c])
        for c in range(n_ch):
            out += struct.pack("<h", s1[c])
        for c in range(n_ch):
            out += struct.pack("<h", s2[c])
        for c in range(n_ch):
            recon[c].append(s2[c])
            if m > 1:
                recon[c].append(s1[c])
        hist = [[s2[c], s1[c]] for c in range(n_ch)]
        nibs = []
        for i in range(2, spb):
            for c in range(n_ch):
                target = int(blk[c][i]) if i < m else 0
                s = hist[c][-1] * c1 + hist[c][-2] * c2
                pred = -((-s) >> 8) if s < 0 else s >> 8
                nib = max(-8, min(7, round((target - pred)
                                           / deltas[c])))
                new = max(-32768, min(32767, pred + nib * deltas[c]))
                un = nib + 16 if nib < 0 else nib
                deltas[c] = max(16, (ADAPT[un] * deltas[c]) >> 8)
                hist[c] = [hist[c][-1], new]
                if i < m:
                    recon[c].append(new)
                nibs.append(un)
        for j in range(0, len(nibs), 2):
            hi = nibs[j]
            lo = nibs[j + 1] if j + 1 < len(nibs) else 0
            out += bytes([(hi << 4) | lo])
        pad = block_align - (7 * n_ch + (len(nibs) + 1) // 2)
        out += b"\x00" * pad
    return spb, block_align, bytes(out), recon


def _ms_adpcm_wav(channels, rate=8000, predictor=1):
    spb, align, data, recon = _ms_adpcm_encode(channels,
                                               predictor=predictor)
    n_ch = len(channels)
    fmt = struct.pack("<HHIIHHHH", 2, n_ch, rate, rate, align, 4,
                      2, spb)
    riff = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return (b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WAVE"
            + riff), recon


def test_ms_adpcm_negative_pred_pins():
    """Pinned blocks for predictors 3-6 (coefficient sums not
    256-divisible) with negative prediction sums: the spec's /256
    truncates toward zero, so a floor-shift (>> 8) decoder diverges on
    these.  Expected values computed by an independent straight-line
    transliteration of the spec (int(s/256)) — no code shared with
    either the decoder or the test encoder."""
    from evm_archive_spark.operators.wav import _decode_ms_adpcm

    expected = {
        3: [251, -173, -326, -375, -994, -602, -1124, 337, -2758, 746],
        4: [251, -173, -421, -482, -1083, -778, -1153, 250, -2496,
            390],
        5: [251, -173, -773, -1336, -2404, -2997, -3855, -3161, -5277,
            -4183],
        6: [251, -173, -751, -1081, -1606, -1242, -870, 1124, -221,
            1373],
    }
    for pred, want in expected.items():
        # mono block: predictor, delta=37, s1=-173, s2=251, 8 nibbles
        blk = bytes.fromhex(f"0{pred}250053fffb009f81e7a3")
        out = _decode_ms_adpcm(blk, 1, len(blk), 10)
        assert [int(v) for v in out[:, 0]] == want, pred


def test_ms_adpcm_mono_and_stereo():
    """MS-ADPCM (format 2): the decoder must reproduce the encoder's
    reconstruction EXACTLY (both sides integer state machines), and
    the reconstruction must track the source within the step size."""
    from evm_archive_spark.operators.wav import decode_wav

    rng = np.random.default_rng(71)
    t = np.arange(1100)
    sig = (7000 * np.sin(t / 25) + rng.integers(-300, 300, 1100)
           ).astype(int)
    for chans, pred in (([sig], 1), ([sig, (-sig // 2)], 0),
                        ([sig], 4)):
        wav, recon = _ms_adpcm_wav([list(c) for c in chans],
                                   predictor=pred)
        rate, out = decode_wav(wav)
        assert rate == 8000
        got = np.round(out * 32768).astype(int)
        # the final block zero-pads to a whole block; compare the
        # source-length prefix (real files truncate via `fact`)
        n = len(chans[0])
        assert got.shape[0] >= n and got.shape[1] == len(chans)
        for c in range(len(chans)):
            assert np.array_equal(got[:n, c], np.array(recon[c])), (
                pred, c)
        # fidelity: greedy ADPCM tracks a smooth-ish signal
        err = np.abs(got[:n, 0] - np.array(chans[0]))
        assert np.median(err) < 1200
    # bad predictor index is typed
    wav, _ = _ms_adpcm_wav([list(sig)])
    bad = bytearray(wav)
    i = bad.index(b"data") + 8
    bad[i] = 9
    import pytest as _pytest

    from evm_archive_spark.operators.wav import WavError

    with _pytest.raises(WavError, match="predictor"):
        decode_wav(bytes(bad))


def test_pcm24_and_float64():
    """24-bit packed PCM and float64 (r12): round-trip through our
    writer AND the stdlib wave module as the canonical 24-bit
    container pin."""
    import io
    import wave as stdwave

    rng = np.random.default_rng(24)
    x = (rng.random((300, 2)) * 2 - 1).astype(np.float64)
    b = encode_wav(x, 16000, bits=24)
    rate, out = decode_wav(b)
    assert rate == 16000 and out.shape == (300, 2)
    # encoder scales by 2^23-1, decoder divides by 2^23: half an LSB
    # of rounding plus one LSB of scale mismatch
    assert np.max(np.abs(out - x)) < 2 / 8388608
    # stdlib wave reads our 24-bit file...
    wf = stdwave.open(io.BytesIO(b))
    assert (wf.getsampwidth(), wf.getnchannels(),
            wf.getnframes()) == (3, 2, 300)
    frames = wf.readframes(300)
    # ...and writes one we read (byte-identical frames)
    buf = io.BytesIO()
    ww = stdwave.open(buf, "wb")
    ww.setnchannels(2)
    ww.setsampwidth(3)
    ww.setframerate(16000)
    ww.writeframes(frames)
    ww.close()
    rate2, out2 = decode_wav(buf.getvalue())
    assert rate2 == 16000 and np.array_equal(out, out2)
    # float64 (format 3, bits 64)
    raw = x.astype("<f8").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 2, 8000, 8000 * 16, 16, 64)
    wav64 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
             + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
             + b"data" + struct.pack("<I", len(raw)) + raw)
    rate3, out3 = decode_wav(wav64)
    assert rate3 == 8000 and np.array_equal(out3, x)
