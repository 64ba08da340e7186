"""AIFF/AIFF-C decoder (operators/aiff.py): writer round trips across
bit depths and AIFC compression types, the stdlib-aifc cross-pin both
directions, typed boundaries, and the audio-lane dispatch."""

from __future__ import annotations

import io
import struct
import warnings

import numpy as np
import pytest

from evm_archive_spark.operators.aiff import (
    AiffError,
    decode_aiff,
    encode_aiff,
    is_aiff,
)


def _sig(n=500, ch=2, seed=3):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.9, 0.9, (n, ch))


def test_roundtrip_bit_depths_and_aifc_types():
    s = _sig()
    for bits in (8, 16, 24, 32):
        b = encode_aiff(44100, s, bits=bits)
        assert is_aiff(b)
        rate, out = decode_aiff(b)
        assert rate == 44100 and out.shape == s.shape
        assert np.abs(out - s).max() <= 2.5 / (1 << (bits - 1)), bits
    for ctype, tol in ((b"sowt", 1 / 8192), (b"fl32", 1e-6)):
        b = encode_aiff(22050, s, ctype=ctype)
        rate, out = decode_aiff(b)
        assert rate == 22050 and np.abs(out - s).max() <= tol, ctype
    # mono 1-D input, zero frames
    b = encode_aiff(8000, s[:0, 0])
    rate, out = decode_aiff(b)
    assert (rate, out.shape) == (8000, (0, 1))


def test_stdlib_aifc_cross_pin_both_directions():
    warnings.filterwarnings("ignore", category=DeprecationWarning)
    import aifc

    s = _sig()
    # our writer -> aifc reader
    b = encode_aiff(8000, s, bits=16)
    f = aifc.open(io.BytesIO(b))
    assert (f.getframerate(), f.getnchannels(), f.getsampwidth(),
            f.getnframes()) == (8000, 2, 2, 500)
    theirs = np.frombuffer(f.readframes(500), dtype=">i2").reshape(
        500, 2)
    ours = (decode_aiff(b)[1] * 32768).astype(int)
    assert np.array_equal(theirs, ours)
    # aifc writer -> our reader
    buf = io.BytesIO()
    buf_close = buf.close
    buf.close = lambda: None                    # aifc closes the file
    w = aifc.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    pcm = (s[:, 0] * 32767).astype(">i2")
    w.writeframes(pcm.tobytes())
    w.close()
    data = buf.getvalue()
    buf_close()
    rate, out = decode_aiff(data)
    assert rate == 16000
    assert np.array_equal((out[:, 0] * 32768).astype(int),
                          pcm.astype(int))


def test_typed_boundaries():
    s = _sig(50, 1)
    good = encode_aiff(8000, s)
    # perceptual AIFC type is typed by name
    b = bytearray(encode_aiff(8000, s, ctype=b"sowt"))
    i = b.index(b"sowt")
    b[i:i + 4] = b"ima4"
    with pytest.raises(AiffError, match="ima4"):
        decode_aiff(bytes(b))
    # truncated sample data is typed
    with pytest.raises(AiffError, match="overruns|short"):
        decode_aiff(good[:-20])
    # non-finite 80-bit rate is typed
    b = bytearray(good)
    i = b.index(b"COMM") + 8 + 8
    struct.pack_into(">H", b, i, 0x7FFF)
    with pytest.raises(AiffError, match="rate"):
        decode_aiff(bytes(b))
    with pytest.raises(AiffError, match="not an AIFF"):
        decode_aiff(b"RIFFxxxxWAVE")
    # AiffError rides the WavError family (the catch-tuple contract)
    from evm_archive_spark.operators.wav import WavError

    assert issubclass(AiffError, WavError)


def test_audio_lane_dispatch():
    from evm_archive_spark.operators.multimodal import _audio_decoder

    s = _sig(100, 1)
    dec = _audio_decoder(encode_aiff(12000, s))
    assert dec is not None
    rate, out = dec()
    assert rate == 12000 and out.shape == (100, 1)
    assert _audio_decoder(b"not audio at all") is None


def test_fl64_aifc():
    """AIFC fl64 (r12) round-trips exactly (float64 is lossless for
    float64 samples)."""
    import numpy as np

    from evm_archive_spark.operators.aiff import decode_aiff, encode_aiff

    rng = np.random.default_rng(64)
    x = (rng.random((123, 2)) * 2 - 1).astype(np.float64)
    b = encode_aiff(48000, x, ctype=b"fl64")
    rate, out = decode_aiff(b)
    assert rate == 48000
    assert np.array_equal(out, x)
